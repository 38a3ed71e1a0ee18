#!/usr/bin/env python
"""Benchmark runner: times the headline declared queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is fully materialized via a no-op sink (``format("noop")``) so
timing covers the whole plan without driver-collect overhead skewing large
results. A tiny warmup action first separates JVM/codegen warmup from the
measured queries.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    names = [n for n, s in REGISTRY.items() if s.bench]
    timings: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        # steady-state timing: the first (unmeasured) run absorbs one-off
        # session costs (codegen/JIT compilation, parquet footer reads,
        # broadcast machinery spin-up) that a long-lived engine pays once;
        # min of two measured runs damps scheduler noise
        runs: list[float] = []
        for measured in (False, True, True):
            # drop DataFrame caches so operators that cache intermediates
            # (LSH band keys) don't hand the measured run precomputed data
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            if measured:
                runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)

    # transparent baseline: the same declared oracle SQL on DuckDB over the
    # same parquet (this is the BASELINE.md comparison target)
    duck: dict[str, float] = {}
    try:
        import duckdb

        from metricq_db_hta_spark.sources.tables import TABLES

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for name in names:
            spec = REGISTRY[name]
            if spec.oracle is None:
                continue
            con.execute(spec.oracle).fetchall()  # warm
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            duck[name] = round(time.perf_counter() - t0, 3)
    except Exception:  # noqa: BLE001 — baseline is informational
        duck = {}

    # ingest throughput: the reference's headline operational number is
    # sustained samples/s into the HTA store (BASELINE.md: MetricQ sustains
    # O(100k) samples/s with this db as archival sink). Measure the full
    # chain A2-A6 (filters + stateful delta + raw write + level recompute)
    # via backfill into a throwaway store.
    ingest_rate = None
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from metricq_db_hta_spark.queries.hta_queries import W0, samples
        from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

        src = samples(spark, sf_dir)
        # sustained-throughput measurement: 10 time-preserving replicas
        # under distinct metric names (per-metric monotonicity intact) so
        # the fixed per-job cost amortizes the way it does in a long-lived
        # service; a small unmeasured backfill first compiles the pipeline
        # (same steady-state framing as the query warmup runs above)
        reps = 10
        big = src.crossJoin(spark.range(reps).withColumnRenamed("id", "rep")).select(
            F.concat_ws("_", "metric", "rep").alias("metric"),
            "ts_ns",
            "value",
            (F.col("event_id") * reps + F.col("rep")).alias("event_id"),
        )
        n = big.count()
        warm_store = tempfile.mkdtemp(prefix="bench_ingest_warm_")
        store = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            StreamingIngest(
                spark, warm_store, level_widths_ns=(W0, W0 * 10, W0 * 100)
            ).backfill(src.limit(2_000))
            svc = StreamingIngest(
                spark, store, level_widths_ns=(W0, W0 * 10, W0 * 100)
            )
            t0 = time.perf_counter()
            svc.backfill(big)
            ingest_rate = round(n / (time.perf_counter() - t0), 1)
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(warm_store, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — informational, but not silent
        print(f"ingest bench skipped: {e!r}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if ingest_rate is not None:
        out["ingest_samples_per_sec"] = ingest_rate
    if duck:
        out["duckdb_baseline"] = duck
        out["duckdb_total"] = round(sum(duck.values()), 3)
        out["ratio_vs_duckdb"] = round(total / max(sum(duck.values()), 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
