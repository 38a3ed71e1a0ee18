"""Schema-pinned raw reads (sources/rawstore.py): a store mixing pre-r11
batches (files without ``prev_value``) with r11 batches must expose the
persisted ``prev_value`` for EVERY reader — and above all, compaction
must carry it through the rewrite instead of nulling the stored chain
(the r12 review's severest finding: default single-footer schema
inference typically inspects the OLDEST batch, hiding the column)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import maintenance
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.sources.rawstore import read_raw
from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest


def _add_legacy_batch(spark, store: str, batch_id: int, rows) -> None:
    """Hand-write a pre-r11-shaped batch: the same layout the old writer
    produced — data files WITHOUT the prev_value column — then commit it."""
    df = spark.createDataFrame(
        rows, "metric string, ts_ns long, value double, event_id long, "
        "delta_ns long",
    )
    (
        df.withColumn("ingest_batch", F.lit(batch_id))
        .withColumn(
            "ts_month",
            F.trunc(
                F.to_date(
                    F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
                ),
                "month",
            ),
        )
        .write.mode("append")
        .partitionBy("ingest_batch", "metric", "ts_month")
        .parquet(store_meta.raw_path(store))
    )
    store_meta.update_commit_marker(store, add={batch_id})


def test_read_raw_sees_prev_value_across_generations(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store_gen")
    src = samples(spark, sf_dir).orderBy("event_id").limit(300)
    StreamingIngest(spark, store, level_widths_ns=(W0,)).backfill(src)
    # a legacy batch whose dir name sorts FIRST (the footer default
    # inference typically inspects) — no prev_value column in its files
    _add_legacy_batch(
        spark, store, 0, [("legacy", 1, 1.0, 999, 0), ("legacy", 2, 2.0, 1000, 1)]
    )

    raw = read_raw(spark, store)
    assert "prev_value" in raw.columns
    # r11 rows keep their stored chain (>0 non-null by the backfill lag)
    n_real = raw.filter(
        (F.col("ingest_batch") != 0) & F.col("prev_value").isNotNull()
    ).count()
    assert n_real > 0, "pinned schema must surface stored prev_value"
    # legacy rows read as NULL (the under-count rule), never as garbage
    legacy = raw.filter(F.col("ingest_batch") == 0)
    assert legacy.count() == 2
    assert legacy.filter(F.col("prev_value").isNotNull()).count() == 0


def test_compaction_preserves_stored_prev_value(spark, sf_dir, tmp_path):
    """The destroyer scenario: compacting a mixed-generation store must
    not rewrite r11 rows with prev_value nulled by a legacy-footer
    schema inference."""
    store = str(tmp_path / "store_compact_gen")
    src = samples(spark, sf_dir).orderBy("event_id").limit(300)
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.backfill(src)
    _add_legacy_batch(spark, store, 0, [("legacy", 1, 1.0, 999, 0)])

    before = (
        read_raw(spark, store)
        .filter(F.col("prev_value").isNotNull())
        .count()
    )
    assert before > 0
    res = maintenance.compact_raw(spark, store, min_batches=2)
    assert res is not None, "two committed batches must compact"
    after = (
        read_raw(spark, store)
        .filter(F.col("prev_value").isNotNull())
        .count()
    )
    assert after == before, "compaction dropped stored prev_value rows"


def test_read_raw_day_partitioned_store(spark, sf_dir, tmp_path):
    """The pinned schema discovers the store's actual time partition
    column (ts_date) — pinning the wrong one would either error or
    null-poison the date-pruning filters."""
    store = str(tmp_path / "store_day")
    src = samples(spark, sf_dir).orderBy("event_id").limit(200)
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), raw_partition="day"
    ).backfill(src)
    raw = read_raw(spark, store)
    assert "ts_date" in raw.columns and "ts_month" not in raw.columns
    assert raw.count() > 0
    assert raw.filter(F.col("ts_date").isNull()).count() == 0
