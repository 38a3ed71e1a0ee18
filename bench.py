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

    # resident (steady-state) mode: the engine's deployment story is a
    # long-lived serving session (plans/serve.py), where a query's plan is
    # built once and re-executed per request. Re-executing the SAME
    # DataFrame skips py4j plan construction and Catalyst analysis but
    # still runs the full physical pipeline every time (scan, joins,
    # shuffles, AQE re-planning, noop commit) — nothing is cached
    # (spark.catalog caches stay empty; min-of-5 after one unmeasured
    # run). This is the amortized per-query cost a resident service pays.
    resident: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        df = spec.spark(spark, sf_dir)
        runs = []
        for measured in (False, True, True, True, True, True):
            # same honesty rule as the cold loop: operators that cache()
            # intermediates recompute them every measured run
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            if measured:
                runs.append(time.perf_counter() - t0)
        resident[name] = round(min(runs), 3)
    resident_total = round(sum(resident.values()), 3)

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
            d_runs = []
            for _ in range(2):  # min-of-2: duck times vary ~2x run-to-run
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                d_runs.append(time.perf_counter() - t0)
            duck[name] = round(min(d_runs), 3)
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

    # per-query floor: the smallest *real* query shape — a parquet scan plus
    # one shuffled aggregation — built fresh each run like the headline
    # queries (plan construction, file listing, AQE stage sync, codegen,
    # noop commit all included). The headline total carries ~13x this;
    # DuckDB's equivalent floor is ~1 ms.
    from metricq_db_hta_spark.sources.tables import load_table

    floor_runs = []
    for m in (False, True, True):
        t0 = time.perf_counter()
        (
            load_table(spark, sf_dir, "region")
            .groupBy("r_regionkey")
            .count()
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        if m:
            floor_runs.append(time.perf_counter() - t0)
    spark_floor = round(min(floor_runs), 3)

    # scale-convergence evidence (BASELINE.md allows the nearest scale
    # factor): deterministic 10x replicas of lineitem/orders (~sf1) built
    # once in /tmp; the three heaviest relational queries race Spark vs
    # DuckDB at both scales. Spark grows sublinearly (floor-dominated);
    # DuckDB stays at ITS floor until well past sf1 — the honest reading is
    # a floor-vs-floor comparison, not a throughput gap (see SCALE.md §6).
    scaling: dict[str, dict] = {}
    try:
        if os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
            import duckdb

            from metricq_db_hta_spark.sources.tables import TABLES

            # v2: also replicates documents (letter-permuted text so the
            # replicas are NOT near-duplicates of each other — keeps the
            # near-dup graph density realistic instead of quadratic) and
            # events (distinct metric names per replica — preserves the
            # per-metric monotonic-timestamp contract)
            big_dir = "/tmp/metricq_bench_sf1_v2"
            os.makedirs(big_dir, exist_ok=True)
            gen = duckdb.connect()
            gen.execute(f"SET threads TO {os.cpu_count() or 8}")
            for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
                dst = os.path.join(big_dir, f"{t}.parquet")
                if not os.path.exists(dst):
                    gen.execute(
                        f"COPY (SELECT * REPLACE ({key} + r * 10000000 AS {key}) "
                        f"FROM read_parquet('{sf_dir}/{t}.parquet'), range(10) t(r)) "
                        f"TO '{dst}' (FORMAT PARQUET)"
                    )
            dst = os.path.join(big_dir, "documents.parquet")
            if not os.path.exists(dst):
                perms = [
                    "aeiounrst", "eiouanrts", "iouaesrtn", "ouaeitnrs",
                    "uaeiornst", "aeiourtsn", "eiouatsrn", "iouaentsr",
                    "ouaeisntr", "uaeiostrn",
                ]
                cases = " ".join(
                    f"WHEN {i} THEN translate(text, 'aeiounrst', '{p}')"
                    for i, p in enumerate(perms)
                )
                gen.execute(
                    f"COPY (SELECT * REPLACE (doc_id + r * 10000000 AS doc_id, "
                    f"CASE r {cases} END AS text) "
                    f"FROM read_parquet('{sf_dir}/documents.parquet'), range(10) t(r)) "
                    f"TO '{dst}' (FORMAT PARQUET)"
                )
            # event_type is the metric key (hta_queries.samples): suffix it
            # per replica so per-metric timestamp monotonicity is preserved.
            # pyarrow, not a DuckDB COPY: preserves events.ts's on-disk
            # type exactly across testdata generations (TIMESTAMP(NANOS)
            # would be round-tripped to µs by DuckDB; plain µs is copied
            # as-is either way).
            dst = os.path.join(big_dir, "events.parquet")
            if not os.path.exists(dst):
                import pyarrow as pa
                import pyarrow.compute as pc
                import pyarrow.parquet as pq

                tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
                parts = []
                for r in range(10):
                    et = pc.binary_join_element_wise(
                        pc.cast(tbl["event_type"], pa.string()),
                        pa.scalar(f"_{r}"),
                        "",
                    )
                    eid = pc.add(tbl["event_id"], pa.scalar(r * 10000000))
                    parts.append(
                        tbl.set_column(
                            tbl.schema.get_field_index("event_type"),
                            "event_type",
                            et,
                        ).set_column(
                            tbl.schema.get_field_index("event_id"),
                            "event_id",
                            eid,
                        )
                    )
                pq.write_table(
                    pa.concat_tables(parts), dst, version="2.6"
                )
            import shutil as _sh

            for t in TABLES:
                src_p = os.path.join(sf_dir, f"{t}.parquet")
                dst_p = os.path.join(big_dir, f"{t}.parquet")
                if os.path.exists(src_p) and not os.path.exists(dst_p):
                    _sh.copy(src_p, dst_p)
            big_con = duckdb.connect()
            big_con.execute(f"SET threads TO {os.cpu_count() or 8}")
            for t in TABLES:
                p = os.path.join(big_dir, f"{t}.parquet")
                if os.path.exists(p):
                    big_con.execute(
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                    )
            for name in (
                "rel_q1_pricing_summary",
                "rel_q5_local_supplier_volume",
                "rel_join_sortmerge",
                "llm_minhash_lsh_pairs",
                "hta_level0",
                # rel_join_asof can't probe here: the replicas suffix
                # event_type, so its purchase/click filters match nothing
                "hta_ingest_chain",
            ):
                spec = REGISTRY[name]
                runs = []
                for m in (False, True, True):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    spec.spark(spark, big_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                    if m:
                        runs.append(time.perf_counter() - t0)
                big_con.execute(spec.oracle).fetchall()
                t0 = time.perf_counter()
                big_con.execute(spec.oracle).fetchall()
                dd = time.perf_counter() - t0
                scaling[name] = {
                    "spark_sec": round(min(runs), 3),
                    "duckdb_sec": round(dd, 3),
                    "spark_sec_sf0.1": timings.get(name),
                    "duckdb_sec_sf0.1": duck.get(name),
                }
    except Exception as e:  # noqa: BLE001 — informational, but not silent
        print(f"scaling bench skipped: {e!r}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "spark_query_floor_sec": spark_floor,
        "resident_total": resident_total,
    }
    # Full per-query detail (resident times, DuckDB per-query baseline, sf1
    # scaling probe) goes to a side file: the driver records only the LAST
    # ~2000 chars of stdout, so the one-line JSON contract must stay well
    # under that (round 3's line outgrew the window and was dropped).
    detail = {
        "resident_queries": resident,
        "scaling_sf1_replicated": scaling or None,
        "duckdb_baseline": duck or None,
    }
    if ingest_rate is not None:
        out["ingest_samples_per_sec"] = ingest_rate
    if duck:
        out["duckdb_total"] = round(sum(duck.values()), 3)
        out["ratio_vs_duckdb"] = round(total / max(sum(duck.values()), 1e-9), 2)
        out["resident_ratio_vs_duckdb"] = round(
            resident_total / max(sum(duck.values()), 1e-9), 2
        )
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump({**out, **detail}, f, indent=1)
    except OSError as e:
        print(f"detail write skipped: {e!r}", file=sys.stderr)
    line = json.dumps(out)
    if len(line) > 1900:  # hard guard on the driver's tail window
        out.pop("queries", None)
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
