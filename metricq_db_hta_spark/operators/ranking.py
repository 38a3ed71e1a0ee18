"""Scale-safe global ranking operators.

A global ``Window.orderBy(...)`` (no partitionBy) funnels the entire input
through ONE task — Spark itself warns "No Partition Defined for Window
operation". Correct at test scale, dead at 100x. These helpers compute the
same results from a distributed sort plus metadata-sized driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    3. global rank = partition offset + local row_number (window bounded
       by the sorted partition — no hot key);
    4. NTILE's remainder semantics as arithmetic: with n rows and t tiles,
       the first ``n % t`` tiles hold ``n//t + 1`` rows, the rest ``n//t``
       (degenerate n < t: tile == rank — the formula's first branch).

    Two jobs total (counts + main); the lazy localCheckpoint makes the
    sorted input compute once and serve both.
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
    local_w = Window.partitionBy("__pid").orderBy(*order_by)
    rank = (offset_map[F.col("__pid")] + F.row_number().over(local_w)).cast("long")
    q, rem = divmod(n, n_tiles)
    head = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
    tile = F.when(
        F.lit(rem > 0) & (rank <= F.lit(head)),
        F.ceil(rank / F.lit(q + 1)),
    ).otherwise(F.lit(rem) + F.ceil((rank - F.lit(head)) / F.lit(max(q, 1))))
    return sorted_df.withColumn(out_col, tile.cast("int")).drop("__pid")
