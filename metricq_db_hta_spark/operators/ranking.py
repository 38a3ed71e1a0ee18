"""Scale-safe global ranking operators.

A global ``Window.orderBy(...)`` (no partitionBy) funnels the entire input
through ONE task — Spark itself warns "No Partition Defined for Window
operation". Correct at test scale, dead at 100x. These helpers compute the
same results from a distributed sort plus metadata-sized driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: list[Column],
    out_col: str = "tile",
) -> DataFrame:
    """``NTILE(n) OVER (ORDER BY ...)`` without a single-partition window.

    Requires ``order_by`` to be a strict total order (include a unique
    tie-break column — the SQL NTILE is only deterministic then anyway).

    Plan shape:

    1. range-repartition + local sort on the order key — the same
       distributed sort a global ORDER BY compiles to (range boundaries
       are disjoint under a strict total order, so cross-partition order
       is global order);
    2. per-partition row counts -> cumulative offsets. This is the only
       driver round-trip: ONE ROW PER PARTITION (metadata-sized at any
       data scale), broadcast back as a literal map;
    3. global rank = partition offset + local position. The local position
       is pure arithmetic on ``monotonically_increasing_id()`` — the low
       33 bits are a per-partition row counter that increments in stored
       row order, and the checkpointed partitions are already sorted (r15:
       the previous ``row_number() OVER (PARTITION BY __pid)`` looked
       local but was not — the checkpoint's captured partitioning is
       RangePartitioning(order_by), which does not satisfy
       ClusteredDistribution([__pid]), so EnsureRequirements re-shuffled
       and re-sorted the ENTIRE dataset just to number rows it already
       stored in order; guide §2.4. Removing the window removes that full
       second pass: main-job exchanges 1 -> 0, sf1 cold 1.44 -> 1.09 s,
       identity pinned on the full 1.5M-row output,
       scripts/r15_ab_ntile.py);
    4. NTILE's remainder semantics as arithmetic: with n rows and t tiles,
       the first ``n % t`` tiles hold ``n//t + 1`` rows, the rest ``n//t``
       (degenerate n < t: tile == rank — the formula's first branch).

    Two jobs total (counts + main); the lazy localCheckpoint makes the
    sorted input compute once and serve both, and pins the row order the
    id counter numbers (re-executions re-read the same blocks).
    """
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
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    # monotonically_increasing_id = (partition << 33) | counter; the low 33
    # bits count from 0 in stored row order (exact until 2^33 rows in one
    # partition — bound the partition sizes, not the data, long before that).
    # The rank MUST be materialized as its own column before the tile
    # arithmetic references it: mono_id is stateful-nondeterministic, so a
    # copy of the expression inside a when() BRANCH keeps an independent
    # counter that only advances when the branch is taken — referencing the
    # raw expression three times in when/cond/otherwise silently de-syncs
    # the counters (caught by test_ntile_matches_sql_semantics at any
    # n % n_tiles != 0; CollapseProject never inlines a multiply-referenced
    # nondeterministic alias, so the intermediate Project is load-bearing).
    local_rn = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1)) + 1
    ranked = sorted_df.withColumn(
        "__rank", (offset_map[F.col("__pid")] + local_rn).cast("long")
    )
    rank = F.col("__rank")
    q, rem = divmod(n, n_tiles)
    head = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
    tile = F.when(
        F.lit(rem > 0) & (rank <= F.lit(head)),
        F.ceil(rank / F.lit(q + 1)),
    ).otherwise(F.lit(rem) + F.ceil((rank - F.lit(head)) / F.lit(max(q, 1))))
    return ranked.withColumn(out_col, tile.cast("int")).drop("__pid", "__rank")
