#!/usr/bin/env python
"""Per-query PLAN-BUILD cost (VERDICT r15 #3): time from spec.spark() to
a fully planned (optimized + physical + codegen-ready) QueryExecution,
no execution. One unmeasured warm build absorbs first-touch session costs
(file listings, derived-layout builds), then min of 3.

Usage: python scripts/r16_build_cost.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _static_plan_policy  # noqa: E402
from metricq_db_hta_spark import get_spark  # noqa: E402
from metricq_db_hta_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or [n for n, s in REGISTRY.items() if s.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r16-build-cost")
    spark.range(10).count()
    total = 0.0
    rows = []
    for name in names:
        spec = REGISTRY[name]
        runs = []
        with _static_plan_policy(spark, spec):
            for measured in (False, True, True, True):
                t0 = time.perf_counter()
                df = spec.spark(spark, sf_dir)
                # force full planning (optimizer + physical + codegen prep)
                df._jdf.queryExecution().executedPlan()
                if measured:
                    runs.append(time.perf_counter() - t0)
        best = min(runs)
        total += best
        rows.append((best, name))
    for best, name in sorted(rows, reverse=True):
        print(f"{name:40s} build_min={best:.3f}s")
    print(f"TOTAL {total:.3f}s over {len(rows)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
