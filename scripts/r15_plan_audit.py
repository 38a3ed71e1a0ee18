#!/usr/bin/env python
"""Full-registry plan-shape audit (optimization r15, guide §1/§7.2).

Builds every registered query's DataFrame over a small sf dir and counts
the plan features the optimization guide says to look for: Exchange
nodes, Sorts, Python-boundary nodes (BatchEvalPython / ArrowEvalPython /
MapInArrow / MapInPandas / FlatMapGroupsInPandas...), CartesianProduct,
join strategies, and whether any scan reports PushedFilters. No query is
executed (plan build only — queries whose *builders* run bounded
metadata jobs, e.g. the k-means centroid collects, still pay those).

Usage: python scripts/r15_plan_audit.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import re
import sys
import time

sys.path.insert(0, ".")

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "PythonMapInArrow",
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/r15_plan_audit.json"
    spark = get_spark("plan-audit")
    rows = {}
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        rows[name] = {
            "build_s": round(time.time() - t0, 2),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "sorts": len(re.findall(r"\bSort\b", plan)),
            "py_nodes": {
                n: c
                for n in PY_NODES
                if (c := len(re.findall(rf"\b{n}\b", plan)))
            },
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "bnl_join": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "shj": len(re.findall(r"ShuffledHashJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "pushed_filters": bool(
                re.search(r"PushedFilters: \[[^\]]", plan)
            ),
            "plan_lines": plan.count("\n"),
        }
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
    # print the outliers, worst first
    ok = {k: v for k, v in rows.items() if "error" not in v}
    for k in sorted(ok, key=lambda k: -ok[k]["exchanges"])[:25]:
        v = ok[k]
        print(
            f"{k:42s} ex={v['exchanges']:3d} sort={v['sorts']:2d} "
            f"win={v['window']:2d} cart={v['cartesian']} "
            f"py={sum(v['py_nodes'].values())} lines={v['plan_lines']:4d} "
            f"build={v['build_s']:5.2f}s"
        )
    errs = {k: v for k, v in rows.items() if "error" in v}
    for k, v in errs.items():
        print(f"ERROR {k}: {v['error']}")
    print(f"\n{len(ok)} plans built, {len(errs)} errors -> {out_path}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
