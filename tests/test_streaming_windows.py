"""Streaming window + dedup semantics: run each operator as a real stream
(file source, availableNow) and check against the batch evaluation of the
same operator over the same rows.

Append-mode mechanics this test drives deliberately: a window is emitted
only after the watermark passes its end, and the watermark only advances
between microbatches. The input is therefore staged as three single-file
batches — real data, then a far-future "closer" event per key (advances
the watermark past every real window), then a second, later closer (the
batch in which the first closers' emissions actually flush). Closer
windows themselves stay open and are excluded by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.queries.hta_queries import samples
from metricq_db_hta_spark.streaming.ingest_stream import SAMPLE_SCHEMA
from metricq_db_hta_spark.streaming import windows as W

DAY_NS = 86_400_000_000_000


@pytest.fixture()
def stream_env(spark, sf_dir, tmp_path):
    src = samples(spark, sf_dir).select("metric", "ts_ns", "value", "event_id")
    max_ts = src.agg(F.max("ts_ns")).collect()[0][0]

    def closers(offset_days, eid):
        return src.select("metric").distinct().select(
            "metric",
            F.lit(max_ts + offset_days * DAY_NS).cast("long").alias("ts_ns"),
            F.lit(0.0).alias("value"),
            F.lit(eid).cast("long").alias("event_id"),
        )

    src.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "in" / "c1"))
    closers(30, 10_000_000).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in" / "c2")
    )
    closers(60, 10_000_001).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in" / "c3")
    )
    stream = (
        spark.readStream.schema(SAMPLE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in"))
    )
    return src, stream, tmp_path, max_ts


def _drain(df, tmp_path, name):
    out = str(tmp_path / f"out_{name}")
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / f"cp_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.exception():
        raise q.exception()
    return out


def _assert_stream_equals_batch(spark, streamed_path, batch_df, max_ts):
    got = spark.read.parquet(streamed_path)
    wcol = "window" if "window" in got.columns else "session_window"
    # keep only real-data windows (closer windows start after max_ts)
    got = got.filter(F.unix_micros(F.col(f"{wcol}.start")) * 1000 <= max_ts).drop(wcol)
    exp = batch_df.drop("window", "session_window")
    diff = got.exceptAll(exp).union(exp.exceptAll(got))
    assert diff.count() == 0, f"stream vs batch diff: {diff.take(5)}"


def test_tumbling_stream_matches_batch(spark, stream_env):
    src, stream, tmp, max_ts = stream_env
    out = _drain(W.tumbling_agg(stream), tmp, "tumble")
    _assert_stream_equals_batch(spark, out, W.tumbling_agg(src), max_ts)


def test_sliding_stream_matches_batch(spark, stream_env):
    src, stream, tmp, max_ts = stream_env
    out = _drain(W.sliding_agg(stream), tmp, "slide")
    _assert_stream_equals_batch(spark, out, W.sliding_agg(src), max_ts)


def test_session_stream_matches_batch(spark, stream_env):
    src, stream, tmp, max_ts = stream_env
    out = _drain(W.session_agg(stream, key="metric"), tmp, "session")
    _assert_stream_equals_batch(
        spark, out, W.session_agg(src, key="metric"), max_ts
    )


def test_stream_dedup_drops_exact_duplicates(spark, stream_env):
    src, stream, tmp, max_ts = stream_env
    # re-deliver 50 rows as an extra chunk within the watermark horizon
    src.limit(50).coalesce(1).write.mode("overwrite").parquet(
        str(tmp / "in" / "c1b")
    )
    out = _drain(W.stream_dedup(stream, watermark="90 days"), tmp, "dedup")
    got = spark.read.parquet(out).filter(F.col("ts_ns") <= max_ts)
    assert got.count() == src.count()


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream inner join (SURVEY §2 streaming surface): clicks
    stream joined to purchases stream of the same user within 24h after
    the click — the streaming form of rel_join_interval_overlap's
    predicate. Watermarks on both sides + the time-range condition are
    what bound the symmetric-hash-join state at scale (without them the
    join would buffer both streams forever); inner-join emission itself
    does not wait for the watermark, so one availableNow drain must
    reproduce the batch join exactly."""
    from metricq_db_hta_spark.queries.relational import events_df

    ev = events_df(spark, sf_dir).select(
        "event_id",
        F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purch"
    ev.filter(F.col("event_type") == "click").coalesce(1).write.parquet(
        str(clicks_dir / "c1")
    )
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.parquet(
        str(purch_dir / "c1")
    )
    schema = ev.schema

    def stream(d):
        return (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(d))
        )

    c = (
        stream(clicks_dir)
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        stream(purch_dir)
        .withWatermark("ts", "1 hour")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = c.join(
        p,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 24 HOURS")),
        "inner",
    ).select("click_id", "purchase_id", "user_id", "purchase_value")

    out_dir = str(tmp_path / "out")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None

    got = spark.read.parquet(out_dir)
    cb = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    pb = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    expect = cb.join(
        pb,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 24 HOURS")),
        "inner",
    ).select("click_id", "purchase_id", "user_id", "purchase_value")
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
