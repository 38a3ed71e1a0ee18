#!/usr/bin/env python
"""A/B harness for rel_q1_pricing_summary variants (r15 optimization).

Variant A: current registry form (msum/mavg SQL-text fast path — each
measure's hi/lo split repeats `CAST(RINT(expr*1e6) AS BIGINT)` inside the
aggregate).
Variant B: scaled values hoisted into a named projection below the
aggregate, so each measure's scaled long is provably computed once per row
and the aggregate functions are plain SUM/shiftright/& over a column.

Both are timed with the bench's exact protocol shape (toArrow, per-query
conf pins, warm + min-of-N), on the sf1 replica. Result equality is
asserted before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _static_plan_policy, build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.queries.base import _SPLIT
from metricq_db_hta_spark.sources.tables import load_table


def variant_b(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    measures = {
        "q": "l_quantity",
        "p": "l_extendedprice",
        "dp": "l_extendedprice * (1 - l_discount)",
        "ch": "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
        "d": "l_discount",
    }
    proj = [
        F.expr(f"CAST(RINT(({e}) * 1000000.0D) AS BIGINT)").alias(f"s_{k}")
        for k, e in measures.items()
    ]
    mask = _SPLIT - 1

    def tot(k):
        return (
            f"CAST((CAST(SUM(SHIFTRIGHT(s_{k}, 31)) AS DECIMAL(38,0))"
            f" * {_SPLIT} + CAST(SUM(s_{k} & {mask}) AS DECIMAL(38,0)))"
            f" * CAST(0.000001D AS DECIMAL(7,6)) AS DOUBLE)"
        )

    aggs = [
        F.expr(f"{tot('q')} AS sum_qty"),
        F.expr(f"{tot('p')} AS sum_base_price"),
        F.expr(f"{tot('dp')} AS sum_disc_price"),
        F.expr(f"{tot('ch')} AS sum_charge"),
        F.expr(f"CAST({tot('q')} / COUNT(s_q) AS DOUBLE) AS avg_qty"),
        F.expr(f"CAST({tot('p')} / COUNT(s_p) AS DOUBLE) AS avg_price"),
        F.expr(f"CAST({tot('d')} / COUNT(s_d) AS DOUBLE) AS avg_disc"),
        F.count("*").alias("count_order"),
    ]
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
        )
        .select("l_returnflag", "l_linestatus", *proj)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*aggs)
    )


def time_df(spark, spec, build, data_dir, runs=5):
    times = []
    with _static_plan_policy(spark, spec):
        for measured in (False, *([True] * runs)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = build(spark, data_dir)
            df.toArrow()
            if measured:
                times.append(time.perf_counter() - t0)
    return min(times), times


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-q1")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = build_sf1(sf_dir)
    prewarm_files(big)
    spec = REGISTRY["rel_q1_pricing_summary"]

    a = spec.spark(spark, big).toArrow().to_pylist()
    b = variant_b(spark, big).toArrow().to_pylist()
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key), "variant B result differs"
    print("results identical:", len(a), "rows")

    for name, build in (("A(current)", spec.spark), ("B(hoisted)", variant_b)):
        best, times = time_df(spark, spec, build, big)
        print(f"{name}: min={best:.3f}  all={[round(t,3) for t in times]}")
    # second interleave to confound JIT ordering
    for name, build in (("B(hoisted)", variant_b), ("A(current)", spec.spark)):
        best, times = time_df(spark, spec, build, big)
        print(f"{name}: min={best:.3f}  all={[round(t,3) for t in times]}")


if __name__ == "__main__":
    main()
