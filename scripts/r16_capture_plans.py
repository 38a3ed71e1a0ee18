#!/usr/bin/env python
"""Capture .explain("formatted") for every benched query (round-16
optimization evidence). Writes plans/r16/<name>_<tag>.txt.

Usage: python scripts/r16_capture_plans.py <tag> [names...]
  tag: "before" | "after" (file suffix)

The plan is captured under the same session + per-query conf pins the
bench applies (bench._static_plan_policy), so the committed plan is the
one the timed run executes (initial plan; AQE queries print
AdaptiveSparkPlan isFinalPlan=false).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _static_plan_policy  # noqa: E402
from metricq_db_hta_spark import get_spark  # noqa: E402
from metricq_db_hta_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [
        n for n, s in REGISTRY.items() if s.bench or n == "hta_level0"
    ]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plans")
    for name in names:
        spec = REGISTRY[name]
        with _static_plan_policy(spark, spec):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            build_s = time.perf_counter() - t0
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        plan = buf.getvalue()
        n_exchange = plan.count("Exchange")
        header = (
            f"-- query: {name}\n"
            f"-- tag: {tag}\n"
            f"-- data: {sf_dir}\n"
            f"-- python plan-build: {build_s:.3f}s\n"
            f"-- Exchange nodes in initial plan: {n_exchange}\n"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(header + plan)
        print(f"{name:36s} build={build_s:6.3f}s exchanges={n_exchange}")


if __name__ == "__main__":
    main()
