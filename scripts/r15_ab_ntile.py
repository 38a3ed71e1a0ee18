#!/usr/bin/env python
"""A/B harness for the r15 distributed_ntile rewrite.

Variant A (current, operators/ranking.py): range-sorted checkpoint, then
the local row_number runs in a Window.partitionBy("__pid") — but the
checkpoint's captured partitioning is RangePartitioning(order_by), which
does NOT satisfy ClusteredDistribution([__pid]), so EnsureRequirements
inserts Exchange hashpartitioning(__pid) + Sort: the ENTIRE dataset is
re-shuffled and re-sorted just to number rows that are already stored in
the right order (guide §2.4: an Exchange you did not expect).

Variant B (proposed): the checkpointed partitions are already sorted, so
the local row number is pure arithmetic on monotonically_increasing_id()
(= partition_id << 33 | row-counter, counting from 0 in stored row
order): local_rn = (mid & (2^33 - 1)) + 1. Zero exchange, zero sort,
zero window in the main job — the rank is offset_map[__pid] + local_rn
with the same offsets the counts job already computes.

Identity asserted (full row set) at sf0.01 + sf1 before timing; the plan
shape (exchange count in the main job) printed for both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.sources.tables import load_table

MASK33 = (1 << 33) - 1


def distributed_ntile_mid(df, n_tiles, order_by, out_col="tile"):
    pid = F.spark_partition_id()
    sorted_df = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", pid)
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in sorted_df.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    if not n:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    local_rn = F.monotonically_increasing_id().bitwiseAND(F.lit(MASK33)) + 1
    rank = (offset_map[F.col("__pid")] + local_rn).cast("long")
    q, rem = divmod(n, n_tiles)
    head = rem * (q + 1)
    tile = F.when(
        F.lit(rem > 0) & (rank <= F.lit(head)),
        F.ceil(rank / F.lit(q + 1)),
    ).otherwise(F.lit(rem) + F.ceil((rank - F.lit(head)) / F.lit(max(q, 1))))
    return sorted_df.withColumn(out_col, tile.cast("int")).drop("__pid")


def ntile_b(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    out = distributed_ntile_mid(
        o.select("o_orderkey", "o_totalprice"),
        4,
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        out_col="quartile",
    )
    return out.select("o_orderkey", "o_totalprice", "quartile")


def time_cold(spark, build, data_dir, runs=5):
    times = []
    for measured in (False, *([True] * runs)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build(spark, data_dir).toArrow()
        if measured:
            times.append(time.perf_counter() - t0)
    return times


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-ntile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = build_sf1(sf_dir)
    prewarm_files(big)
    spec = REGISTRY["rel_window_ntile"]

    for venue in ("/root/testdata/sf0.01", big):
        a = sorted(map(tuple, spec.spark(spark, venue).collect()))
        b = sorted(map(tuple, ntile_b(spark, venue).collect()))
        assert a == b, f"ntile rows differ at {venue}"
        pa = spec.spark(spark, venue)._jdf.queryExecution().executedPlan().toString()
        pb = ntile_b(spark, venue)._jdf.queryExecution().executedPlan().toString()
        print(
            f"identity OK at {venue}: {len(a)} rows; main-job exchanges "
            f"A={pa.count('Exchange hashpartitioning')} -> "
            f"B={pb.count('Exchange hashpartitioning')}, "
            f"sorts A={pa.count('+- Sort ')} -> B={pb.count('+- Sort ')}"
        )

    variants = [("A(window)", spec.spark), ("B(mid)", ntile_b)]
    for order in (variants, variants[::-1]):
        for name, build in order:
            ts = time_cold(spark, build, big)
            print(f"{name:12s} cold min={min(ts):.3f}  all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
