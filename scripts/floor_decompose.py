#!/usr/bin/env python
"""Per-stage floor decomposition for the weakest bench ratios (VERDICT r6
next-step 2): break each query's sf1 RESIDENT wall time into

* ``executor compute``  — sum of task executorRunTime, divided by the
  core count (the lower bound a perfectly-scheduled run could reach);
* ``stage span``        — per-stage wall (first task launched -> stage
  complete), so (span - compute/cores) is within-stage overhead: task
  launch, Arrow/python worker startup, skewed tails;
* ``inter-stage gap``   — query wall minus the sum of stage spans: driver
  time between stages (AQE re-planning, shuffle-map-status round trips,
  job submission) plus plan-execution bookkeeping.

Method: resident protocol (DataFrame built once, unmeasured warm run,
then a measured run inside a fresh job group), stage metrics from the
Spark UI REST API (run with SPARK_GRAFT_UI=1). Results merge into
FLOOR.json under ``floor_decomposition`` (its own artifact — the driver
bench overwrites BENCH_DETAIL.json every round) and print as a table.

Usage:
    SPARK_GRAFT_UI=1 python scripts/floor_decompose.py [query ...]
defaults to the round-6 worst three:
    rel_q3_shipping_priority rel_q5_local_supplier_volume
    llm_similarity_topk_brute
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY

DEFAULT_QUERIES = [
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "llm_similarity_topk_brute",
]


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.load(r)


def stage_metrics(spark, group_id: str) -> list[dict]:
    base = spark.sparkContext.uiWebUrl + "/api/v1"
    app = _rest(base, "/applications")[0]["id"]
    jobs = _rest(base, f"/applications/{app}/jobs")
    stage_ids = sorted(
        {
            sid
            for j in jobs
            if j.get("jobGroup") == group_id
            for sid in j["stageIds"]
        }
    )
    out = []
    for sid in stage_ids:
        for att in _rest(base, f"/applications/{app}/stages/{sid}"):
            if att["status"] != "COMPLETE":
                continue
            t0 = att.get("firstTaskLaunchedTime")
            t1 = att.get("completionTime")
            span = None
            if t0 and t1:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                span = (
                    datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)
                ).total_seconds()
            out.append(
                {
                    "stage": sid,
                    "name": att["name"].split("\n")[0][:60],
                    "tasks": att["numCompleteTasks"],
                    "span_s": span,
                    "run_s": att["executorRunTime"] / 1e3,
                    "deser_s": att["executorDeserializeTime"] / 1e3,
                    "gc_s": att["jvmGcTime"] / 1e3,
                    "fetch_wait_s": att["shuffleFetchWaitTime"] / 1e3,
                    "write_s": att["shuffleWriteTime"] / 1e9,
                    "shuffle_read_mb": round(
                        att["shuffleReadBytes"] / 1e6, 2
                    ),
                    "shuffle_write_mb": round(
                        att["shuffleWriteBytes"] / 1e6, 2
                    ),
                    "input_mb": round(att["inputBytes"] / 1e6, 2),
                }
            )
    return out


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    from bench import build_sf1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("floor-decompose")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("run with SPARK_GRAFT_UI=1 (fresh process)")
    cores = spark.sparkContext.defaultParallelism
    data_dir = build_sf1(sf_dir)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    report = {}
    import bench

    for name in names:
        # measure under the shipped execution policy (QuerySpec.static_plan
        # -> AQE off), so FLOOR.json decomposes the same plans bench times;
        # the with-block restores the session conf even when a query
        # measurement raises (r9 ADVICE: a manual __enter__/__exit__ left
        # AQE off for the rest of the process on error)
        group = f"floor::{name}"
        with bench._static_plan_policy(spark, REGISTRY[name]):
            df = REGISTRY[name].spark(spark, data_dir)
            # resident warm-ups (codegen, AQE stats, footers)
            for _ in range(2):
                spark.catalog.clearCache()
                df.write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobGroup(None, None)

        stages = stage_metrics(spark, group)
        spans = [s["span_s"] for s in stages if s["span_s"] is not None]
        run_total = sum(s["run_s"] for s in stages)
        span_total = sum(spans)
        compute_floor = run_total / cores
        report[name] = {
            "wall_s": round(wall, 3),
            "n_stages": len(stages),
            "executor_run_total_s": round(run_total, 3),
            "compute_floor_s": round(compute_floor, 3),
            "stage_span_total_s": round(span_total, 3),
            "inter_stage_gap_s": round(wall - span_total, 3),
            "within_stage_overhead_s": round(span_total - compute_floor, 3),
            "fixed_overhead_pct": round(
                100 * (wall - compute_floor) / wall, 1
            ),
            "stages": stages,
        }
        r = report[name]
        print(
            f"\n{name}: wall={r['wall_s']}s stages={r['n_stages']} "
            f"compute_floor={r['compute_floor_s']}s "
            f"inter_stage_gap={r['inter_stage_gap_s']}s "
            f"fixed_overhead={r['fixed_overhead_pct']}%"
        )
        for s in stages:
            print(
                f"  stage {s['stage']:>4} {s['name']:<60} tasks={s['tasks']:>3} "
                f"span={s['span_s'] if s['span_s'] is None else round(s['span_s'], 3)} "
                f"run={round(s['run_s'], 3)} in={s['input_mb']}MB "
                f"sr={s['shuffle_read_mb']}MB sw={s['shuffle_write_mb']}MB"
            )

    # Own artifact, NOT BENCH_DETAIL.json: the driver's per-round bench
    # overwrites BENCH_DETAIL.json, which clobbered the round-7 adjudication
    # data BASELINE.md cites (VERDICT r7 wrongness 1). FLOOR.json is only
    # ever written here, so the citation stays live across rounds; queries
    # are merged so partial reruns don't drop earlier rows.
    floor_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "FLOOR.json",
    )
    try:
        with open(floor_path) as f:
            floor = json.load(f)
    except (OSError, ValueError):
        floor = {}
    floor.setdefault("floor_decomposition", {}).update(report)
    floor["cores"] = cores
    with open(floor_path, "w") as f:
        json.dump(floor, f, indent=1)
    print(f"\nwrote floor_decomposition to {floor_path}")


if __name__ == "__main__":
    main()
