"""Store consistency checker tests (operators/fsck.py): clean stores
audit green, injected level corruption is detected with examples, torn
batches are reported-not-flagged, retention boundaries are excluded, and
range-bounded audits stay exact."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import fsck, retention
from metricq_db_hta_spark.queries.hta_queries import W0, W1, samples
from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

DAY_NS = 86_400 * 1_000_000_000


@pytest.fixture(scope="module")
def fsck_store(spark, sf_dir, tmp_path_factory):
    """Two committed backfill batches with two aggregate levels and one
    histogram level — module-scoped; mutating tests copy it first."""
    store = str(tmp_path_factory.mktemp("fsck") / "store")
    src = samples(spark, sf_dir).orderBy("event_id").limit(600)
    ts = sorted(r[0] for r in src.select("ts_ns").collect())
    mid = ts[len(ts) // 2]
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0, W1), hist_widths_ns=(W0,)
    )
    svc.backfill(src.filter(F.col("ts_ns") <= mid))
    svc.backfill(src.filter(F.col("ts_ns") > mid))
    return store


def _copy(store: str, tmp_path) -> str:
    dst = str(tmp_path / "store_copy")
    shutil.copytree(store, dst)
    return dst


def test_clean_store_is_green(spark, fsck_store):
    rep = fsck.check_store(spark, fsck_store)
    assert rep.ok
    assert not rep.journal_pending and rep.uncommitted_batches == []
    tables = {r.table for r in rep.levels}
    assert tables == {f"level_{W0}", f"level_{W1}", f"hist_{W0}"}
    assert all(r.n_checked > 0 for r in rep.levels)


def test_detects_corrupted_level(spark, fsck_store, tmp_path):
    store = _copy(fsck_store, tmp_path)
    lp = os.path.join(store, f"level_{W0}")
    lv = spark.read.parquet(lp)
    first = lv.orderBy("metric", "bucket_start_ns").limit(1).collect()[0]
    corrupted = lv.withColumn(
        "count",
        F.when(
            (F.col("metric") == first["metric"])
            & (F.col("bucket_start_ns") == first["bucket_start_ns"]),
            F.col("count") + 1,
        ).otherwise(F.col("count")),
    )
    tmp_out = str(tmp_path / "corrupted_level")
    corrupted.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(lp)
    shutil.move(tmp_out, lp)

    rep = fsck.check_store(spark, store)
    assert not rep.ok
    bad = {r.table: r for r in rep.levels}
    assert bad[f"level_{W0}"].n_mismatched == 1
    ex = bad[f"level_{W0}"].examples[0]
    assert ex["metric"] == first["metric"]
    assert ex["s_count"] == ex["e_count"] + 1
    # the other tables are untouched and still green
    assert bad[f"level_{W1}"].ok and bad[f"hist_{W0}"].ok


def test_detects_missing_bucket(spark, fsck_store, tmp_path):
    store = _copy(fsck_store, tmp_path)
    lp = os.path.join(store, f"hist_{W0}")
    h = spark.read.parquet(lp)
    n = h.count()
    first = h.orderBy("metric", "bucket_start_ns", "bin").limit(1).collect()[0]
    pruned = h.filter(
        ~(
            (F.col("metric") == first["metric"])
            & (F.col("bucket_start_ns") == first["bucket_start_ns"])
            & (F.col("bin") == first["bin"])
        )
    )
    tmp_out = str(tmp_path / "pruned_hist")
    pruned.write.mode("overwrite").parquet(tmp_out)
    assert pruned.count() == n - 1
    shutil.rmtree(lp)
    shutil.move(tmp_out, lp)

    rep = fsck.check_store(spark, store)
    bad = {r.table: r for r in rep.levels}
    assert bad[f"hist_{W0}"].n_mismatched == 1  # expected-side-only row


def test_torn_batch_reported_not_flagged(spark, fsck_store, tmp_path):
    store = _copy(fsck_store, tmp_path)
    store_meta.update_commit_marker(store, add=set(), remove={-2})
    rep = fsck.check_store(spark, store)
    assert rep.uncommitted_batches == [-2]
    # the torn batch's touched buckets are excluded, the rest audit green
    assert rep.ok


def test_green_after_retention_boundary(spark, sf_dir, tmp_path):
    """After mid-history raw expiry (day-partitioned store so the floor
    lands inside the data), stored level buckets below the raw floor are
    out of audit scope (unverifiable by design — their raw is gone, their
    values kept full history), the per-metric boundary bucket is skipped,
    and everything above must still verify exactly."""
    store = str(tmp_path / "day_store")
    # time-bounded source: spans six days at ANY SF density, so the
    # mid-history floor below always lands inside the data (the
    # row-limited form expired everything at sf0.01 — soak finding)
    import datetime as _dt

    jan7 = int(
        _dt.datetime(2024, 1, 7, tzinfo=_dt.timezone.utc).timestamp()
    ) * 10**9
    src = samples(spark, sf_dir).filter(F.col("ts_ns") < jan7)
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0, W1), raw_partition="day"
    )
    svc.backfill(src)
    lo, hi = spark.read.parquet(os.path.join(store, "raw")).agg(
        F.min("ts_ns"), F.max("ts_ns")
    ).collect()[0]
    # floor lands mid-history: keep roughly the second half of the days
    retention.expire(
        store,
        retention.RetentionPolicy(raw_max_age_ns=(hi - lo) // 2),
        now_ns=hi,
    )
    floor = retention.raw_floor_ns(store)
    assert lo < floor < hi, "floor must land inside the data span"
    rep = fsck.check_store(spark, store)
    assert rep.ok, [(r.table, r.n_mismatched, r.examples) for r in rep.levels]
    assert all(r.n_checked > 0 for r in rep.levels)


def test_range_bounded_audit(spark, fsck_store):
    full = fsck.check_store(spark, fsck_store)
    ts = spark.read.parquet(os.path.join(fsck_store, "raw")).agg(
        F.min("ts_ns"), F.max("ts_ns")
    ).collect()[0]
    lo = ts[0] + (ts[1] - ts[0]) // 4
    hi = ts[0] + 3 * (ts[1] - ts[0]) // 4
    part = fsck.check_store(spark, fsck_store, start_ns=lo, end_ns=hi)
    assert part.ok
    by = {r.table: r for r in part.levels}
    byf = {r.table: r for r in full.levels}
    assert 0 < by[f"level_{W0}"].n_checked < byf[f"level_{W0}"].n_checked


def test_rebuild_repairs_corruption(spark, fsck_store, tmp_path):
    """Detector -> repairer round trip: corrupt a value AND plant an
    extra bucket; rebuild recomputes from raw, deletes the stored-only
    bucket, and the re-audit is green with the same raw untouched."""
    store = _copy(fsck_store, tmp_path)
    lp = os.path.join(store, f"level_{W0}")
    lv = spark.read.parquet(lp)
    first = lv.orderBy("metric", "bucket_start_ns").limit(1).collect()[0]
    phantom_ts = int(lv.agg(F.max("bucket_start_ns")).collect()[0][0]) + 50 * W0
    corrupted = lv.withColumn(
        "count",
        F.when(
            (F.col("metric") == first["metric"])
            & (F.col("bucket_start_ns") == first["bucket_start_ns"]),
            F.col("count") + 7,
        ).otherwise(F.col("count")),
    ).unionByName(
        lv.limit(1).withColumn(
            "bucket_start_ns", F.lit(phantom_ts).cast("long")
        )
    )
    tmp_out = str(tmp_path / "corrupt")
    corrupted.write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(lp)
    shutil.move(tmp_out, lp)
    # the corrupted copy is unpartitioned; re-partition it the way the
    # writer lays levels out so rebuild's partition overwrite applies
    flat = spark.read.parquet(lp)
    tmp2 = str(tmp_path / "relaid")
    (
        flat.withColumn(
            "bucket_month",
            F.trunc(
                F.to_date(F.timestamp_micros((F.col("bucket_start_ns") / 1000).cast("long"))),
                "month",
            ),
        )
        .repartition("metric", "bucket_month")
        .write.mode("overwrite")
        .partitionBy("metric", "bucket_month")
        .parquet(tmp2)
    )
    shutil.rmtree(lp)
    shutil.move(tmp2, lp)

    raw_before = spark.read.parquet(os.path.join(store, "raw")).count()
    rep = fsck.check_store(spark, store)
    assert not rep.ok
    assert {r.table: r.n_mismatched for r in rep.levels}[f"level_{W0}"] == 2

    rewritten = fsck.rebuild_levels(spark, store)
    assert rewritten[f"level_{W0}"] > 0
    rep2 = fsck.check_store(spark, store)
    assert rep2.ok, [(r.table, r.n_mismatched, r.examples) for r in rep2.levels]
    # raw untouched; the phantom bucket is gone from the level
    assert spark.read.parquet(os.path.join(store, "raw")).count() == raw_before
    assert (
        spark.read.parquet(lp)
        .filter(F.col("bucket_start_ns") == phantom_ts)
        .count()
        == 0
    )


def test_rebuild_preserves_pre_floor_history(spark, sf_dir, tmp_path):
    """Under raw retention the pre-floor level rows are the only copy of
    expired history: rebuild must leave them byte-identical while
    rewriting everything above the floor."""
    store = str(tmp_path / "store")
    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.backfill(src)  # January
    svc.backfill(
        src.select(
            "metric",
            (F.col("ts_ns") + 61 * DAY_NS).alias("ts_ns"),
            "value",
            (F.col("event_id") + 10**6).alias("event_id"),
        )
    )  # March
    retention.expire(
        store,
        retention.RetentionPolicy(raw_max_age_ns=121 * DAY_NS),  # floor Feb 1
        now_ns=_jun1(),
    )
    lp = os.path.join(store, f"level_{W0}")
    jan_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(lp)
        .filter(F.col("bucket_start_ns") < _feb1())
        .drop("bucket_month")
        .collect()
    )
    assert jan_rows, "pre-floor history must exist"
    fsck.rebuild_levels(spark, store)
    jan_after = sorted(
        tuple(r)
        for r in spark.read.parquet(lp)
        .filter(F.col("bucket_start_ns") < _feb1())
        .drop("bucket_month")
        .collect()
    )
    assert jan_after == jan_rows
    assert fsck.check_store(spark, store).ok


def _jun1() -> int:
    import datetime as dt

    return int(
        dt.datetime(2024, 6, 1, tzinfo=dt.timezone.utc).timestamp()
    ) * 10**9


def _feb1() -> int:
    import datetime as dt

    return int(
        dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc).timestamp()
    ) * 10**9
