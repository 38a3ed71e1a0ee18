"""Skew mitigation via key salting (SURVEY §2 scale notes; north-star
"skewed keys -> salting or AQE skew-join").

AQE's skew-join splitting is the first line of defense and is enabled in
session.py — but it only covers sort-merge *joins*. Hot keys in
aggregations and in broadcast-impossible joins still serialize onto one
task; these helpers spread them deterministically:

* ``salted_aggregate`` — two-phase aggregation: group on (keys + salt)
  first (splits a hot key across ``n_salts`` tasks), then merge partials
  on the true keys. Correct for any algebra that is associative/
  commutative over partials — which the engine's Aggregate record is by
  design (operators/hta.py).
* ``salted_join`` — replicate the small side ``n_salts`` times; the big
  side picks a deterministic salt per row, so each (key, salt) bucket
  holds ~1/n of the hot key's rows.

Salts are derived from xxhash64 of stable columns, never rand(): a retry
of a failed task must land rows in the same bucket.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Callable[[str], Column]],
    salt_from: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs: output_name -> aggregate Column for phase 1.
    final_aggs:   output_name -> (phase-1 column name -> merge Column).
    Example (count + sum):
        partial = {"c": F.count("*"), "s": F.sum("v")}
        final   = {"c": lambda c: F.sum(c), "s": lambda c: F.sum(c)}
    """
    phase1 = (
        df.withColumn("__salt", _salt(salt_from, n_salts))
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(name) for name, c in partial_aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[fn(name).alias(name) for name, fn in final_aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
    big_salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side deterministically, replicate
    the small side across all salts, join on (key, salt).

    Only inner / left / left_semi are valid: any join that can emit
    *unmatched small-side rows* (right/full/left_anti-of-small) would emit
    one unmatched row per salt replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: the "
            "replicated small side would duplicate unmatched rows"
        )
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("__salt")
    )
    small_rep = small.crossJoin(F.broadcast(salts))
    big_salted = big.withColumn(
        "__salt", _salt(big_salt_from or big.columns, n_salts)
    )
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")
