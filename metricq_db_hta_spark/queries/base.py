"""Registry plumbing + determinism helpers shared by all declared queries.

Float determinism (SURVEY.md §7 risk 3): Spark merges aggregation partials in
a nondeterministic order, so a plain double SUM over many rows is not
run-to-run stable, let alone equal to DuckDB's. All wide double sums in
declared queries therefore accumulate in DECIMAL(38,6) — exact, associative,
order-independent — and cast back to double at the end. (A double can never
be an exact tie at decimal scale 6 — dyadic rationals can't end in ...5e-7 —
so the double->decimal cast itself agrees across engines.) min/max/count are
exact in IEEE/bigint and need no special handling.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None => rows-only weaker check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


def register(
    name: str, oracle: str | None, doc: str = "", bench: bool = False
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


# ---------------------------------------------------------------------------
# determinism helpers (Spark side). Oracle SQL uses the matching text forms:
#   dsum  -> CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
#   davg  -> CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)
#   bsum  -> CAST(SUM(x) AS BIGINT)        (DuckDB sums BIGINT into HUGEINT)
# ---------------------------------------------------------------------------

DEC = "decimal(38,6)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column) -> Column:
    """Order-independent exact sum of a double expression."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """avg as exact-sum / count — one deterministic double division."""
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def bsum(col: str | Column) -> Column:
    """Integer sum pinned to BIGINT on both engines."""
    return F.sum(_c(col)).cast("long")


def r6(col: str | Column) -> Column:
    """round(x, 6) for transcendental results (log/exp/…) where the two
    engines' libm may differ in the last ulp."""
    return F.round(_c(col).cast("double"), 6)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"


def sql_bsum(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"
