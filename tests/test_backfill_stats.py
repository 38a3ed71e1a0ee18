"""Backfill (A18) and stats (A14/A15) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import hta, ingest
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest
from metricq_db_hta_spark.streaming.stats import derived_rates


def test_backfill_equals_batch_pipeline(spark, sf_dir, tmp_path):
    src = samples(spark, sf_dir).limit(500)
    svc = StreamingIngest(spark, str(tmp_path / "store"), level_widths_ns=(W0,))
    svc.backfill(src)
    raw = spark.read.parquet(svc.raw_path)
    expect = ingest.ingest_batch(src)
    assert raw.count() == expect.count()
    lv = spark.read.parquet(svc.level_path(W0))
    direct = hta.level0(expect, W0)
    cols = ["metric", "bucket_start_ns", "count", "integral", "active_time"]
    diff = lv.select(*cols).exceptAll(direct.select(*cols))
    assert diff.count() == 0


def test_derived_rates_guarded_division(spark):
    rows = [
        ("write", 1_000_000_000, 500_000_000, 1024, False),
        ("write", 2_000_000_000, 1_500_000_000, 2048, True),
        ("read", 11_000_000_000, 100_000_000, 0, False),
    ]
    ops = spark.createDataFrame(
        rows, ["op_type", "ts_ns", "duration_ns", "bytes", "failed"]
    )
    out = {(r["op_type"], r["window_start_ns"]): r for r in derived_rates(ops).collect()}
    w = out[("write", 0)]
    assert w["completed"] == 2 and w["failures"] == 1
    assert w["request_rate"] == 0.2  # 2 ops / 10 s window
    assert w["utilization"] == 0.2  # 2 s busy / 10 s
    r = out[("read", 10_000_000_000)]
    assert r["data_rate"] == 0.0 and r["mean_latency_s"] == 0.1
