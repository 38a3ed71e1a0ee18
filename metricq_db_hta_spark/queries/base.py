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

import re
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
    #: Declares the physical plan fully determined at compile time (zero
    #: exchanges, or exchanges whose partitioning is pinned by layout /
    #: broadcast hints — the shapes tests/test_planning.py EXCHANGE_BUDGET
    #: pins). Executors (bench.py, serve) run these with AQE disabled:
    #: adaptive re-planning has nothing to adapt on a static plan and
    #: costs a measured 13-179 ms/query in materialization-sync rounds at
    #: sf1 (r9 A/B, all 14 headline queries). Queries that genuinely
    #: benefit from runtime re-planning (skewed/banded self-joins, the
    #: shuffled sentinel) leave this False and keep AQE. On a shared
    #: cluster leave AQE on regardless if input skew is unknown — this is
    #: an interactive-latency policy, not a correctness knob (results are
    #: identical; pinned by test_static_plan_policy).
    static_plan: bool = False
    #: Per-query session conf the executor pins for the query's runs and
    #: restores afterwards (applied by bench._static_plan_policy alongside
    #: the AQE flag). Same contract as static_plan: execution-shape only,
    #: never results (the policy invariance test covers declared pairs).
    #: Canonical use: shuffle.partitions=1 on a partials-merge whose
    #: reduce side has a handful of groups — 32 scheduled reduce tasks
    #: for 5 rows is pure floor.
    conf: tuple[tuple[str, str], ...] = ()


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    static_plan: bool = False,
    conf: dict[str, str] | None = None,
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or ""), bench, static_plan,
            tuple(sorted((conf or {}).items())),
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# determinism helpers (Spark side). Oracle SQL uses the matching text forms:
#   dsum  -> CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
#   davg  -> CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)
#   bsum  -> CAST(SUM(x) AS BIGINT)        (DuckDB sums BIGINT into HUGEINT)
# ---------------------------------------------------------------------------

DEC = "decimal(38,6)"

# Argument contract for every helper below (dsum/davg/bsum/msum/mavg/r6/
# md5_bucket): a *string* argument is a SQL EXPRESSION, parsed by F.expr —
# NOT a column name looked up verbatim. To keep the old F.col semantics for
# bare names (a column called ``order`` or ``select`` must not parse as a
# keyword — r8 ADVICE), anything matching a plain identifier is
# backtick-quoted before parsing, which makes F.expr resolve it exactly as
# F.col would. Strings with operators/spaces/dots pass through as SQL text.
_PLAIN_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quoted(s: str) -> str:
    return f"`{s}`" if _PLAIN_IDENT.match(s) else s


def _c(col: str | Column) -> Column:
    # str args are SQL EXPRESSIONS (bare identifiers backticked -> ≡ F.col)
    return F.expr(_quoted(col)) if isinstance(col, str) else col


def _sql_of(col: str | Column) -> str | None:
    """The SQL text of the argument when the caller passed one, else None.
    Bare identifiers come back backtick-quoted (see contract note above) so
    the composed fast-path SQL resolves them as column references even when
    the name collides with a SQL keyword.

    Why a text fast path exists: every classic-pyspark Column operation
    is a py4j round trip (~1-3 ms each); msum built ~15 JVM calls per
    invocation (~23 ms measured), so a query with 8 money measures paid
    ~0.2 s of its cold build in expression plumbing alone. Composing ONE
    F.expr string instead (~0.4 ms, parsed JVM-side) builds the
    identical analyzed expression at ~50x less build latency — measured
    bit-identical results, and the whole registry's oracle suite pins
    that they stay so. Spark 4's Column cannot be rendered back to SQL
    (the JVM node prints function-call form), so the fast path applies
    only when the call site passes the expression AS TEXT; Column args
    keep the original construction."""
    return _quoted(col) if isinstance(col, str) else None


def dsum(col: str | Column) -> Column:
    """Order-independent exact sum of a double expression."""
    s = _sql_of(col)
    if s is not None:
        return F.expr(f"CAST(SUM(CAST(({s}) AS {DEC})) AS DOUBLE)")
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """avg as exact-sum / count — one deterministic double division."""
    s = _sql_of(col)
    if s is not None:
        return F.expr(
            f"CAST(CAST(SUM(CAST(({s}) AS {DEC})) AS DOUBLE)"
            f" / COUNT({s}) AS DOUBLE)"
        )
    c = _c(col)
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def bsum(col: str | Column) -> Column:
    """Integer sum pinned to BIGINT on both engines."""
    s = _sql_of(col)
    if s is not None:
        return F.expr(f"CAST(SUM({s}) AS BIGINT)")
    return F.sum(_c(col)).cast("long")


#: 2^31 — split point for the scaled-long exact sum (see msum)
_SPLIT = 1 << 31


def msum(col: str | Column) -> Column:
    """Exact order-independent sum for *money-grain* doubles — values with
    at most 6 decimal digits (prices, quantities, discount/tax products:
    2dp x 2dp x 2dp). Produces the identical double to :func:`dsum` /
    ``sql_dsum`` but ~6x faster (measured: rel_q1 1.73s -> 0.4s at sf0.1).

    Why it is exact, step by step:

    * ``rint(x * 1e6) :: long`` — for a value with <= 6 decimal digits the
      true scaled integer is exact and the double error (|x| * 2^-53,
      scaled ~1e-5 at |x|<=1e5) never reaches the .5 rounding boundary, so
      every engine and rounding mode agrees — including ``Math.rint``'s
      half-even vs ROUND's half-up, which differ only AT the unreachable
      boundary. rint specifically because Spark's ROUND on a double
      allocates a BigDecimal per row (measured: rel_q1's 7 money aggs
      0.99 s -> 0.49 s at sf0.1 after the swap); rint is one FP
      instruction inside codegen. This equals DuckDB's
      ``CAST(x AS DECIMAL(38,6))`` numerator exactly. (NOT valid for
      arbitrary doubles — those keep :func:`dsum`'s per-row decimal cast.)
    * the scaled long is split ``hi = x >> 31`` (arithmetic shift = floor),
      ``lo = x & (2^31 - 1)`` — identity ``x = hi * 2^31 + lo`` holds for
      negatives too. Each half accumulates in a plain BIGINT sum: |hi| <=
      2^32 per row allows ~2^30 rows per group; lo < 2^31 allows 2^32 rows
      per group — no overflow at any realistic group size (a 100 TB group
      would split into partials long before 10^9 rows anyway, and the
      partial/final merge is the same long addition).
    * the two sums recombine in DECIMAL at the *final* aggregate output
      (a handful of rows): exact integer, then descale by 1e-6 as a
      decimal multiply (scale grows 6->12, no rounding), then one cast to
      double — the same nearest-double the oracle's
      ``CAST(SUM(DECIMAL) AS DOUBLE)`` produces.
    """
    s = _sql_of(col)
    if s is not None:
        return F.expr(_msum_sql(s))
    scaled = F.rint(_c(col) * F.lit(1_000_000.0)).cast("long")
    hi = F.sum(F.shiftright(scaled, 31))
    lo = F.sum(scaled.bitwiseAND(F.lit(_SPLIT - 1)))
    total = hi.cast("decimal(38,0)") * F.lit(_SPLIT) + lo.cast("decimal(38,0)")
    return (total * F.lit(0.000001).cast("decimal(7,6)")).cast("double")


def _msum_sql(s: str) -> str:
    """Spark-SQL text of msum's exact construction (D suffix pins the
    scale literals to DOUBLE, matching F.lit(float) in the Column form)."""
    scaled = f"CAST(RINT(({s}) * 1000000.0D) AS BIGINT)"
    return (
        f"CAST((CAST(SUM(SHIFTRIGHT({scaled}, 31)) AS DECIMAL(38,0))"
        f" * {_SPLIT} + CAST(SUM({scaled} & {_SPLIT - 1}) AS DECIMAL(38,0)))"
        f" * CAST(0.000001D AS DECIMAL(7,6)) AS DOUBLE)"
    )


def mavg(col: str | Column) -> Column:
    """avg via :func:`msum` / count — same double as :func:`davg` for
    money-grain inputs."""
    s = _sql_of(col)
    if s is not None:
        return F.expr(f"CAST({_msum_sql(s)} / COUNT({s}) AS DOUBLE)")
    c = _c(col)
    return (msum(c) / F.count(c)).cast("double")


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


# ---------------------------------------------------------------------------
# deterministic salted hash bucket — the cross-engine substitute for rand()
# sampling/splitting. The Spark expression and the SQL fragment MUST stay
# byte-equivalent; having one owner here is what keeps the four sampling/
# split queries' engine parity from drifting (round-7 review finding).
# ---------------------------------------------------------------------------


def md5_bucket(col: str | Column, salt: str = "", mod: int | None = None) -> Column:
    """``conv(substr(md5(salt || col), 1, 8), 16, 10) [% mod]`` as a long —
    a uniform deterministic bucket derived from the value, identical in
    Spark and DuckDB. ``salt`` decorrelates independent uses (split vs
    sample vs weighted-sample) of the same key."""
    inp = _c(col).cast("string")
    if salt:
        inp = F.concat(F.lit(salt), inp)
    b = F.conv(F.substring(F.md5(inp), 1, 8), 16, 10).cast("long")
    return b % mod if mod is not None else b


def sql_md5_bucket(expr: str, salt: str = "", mod: int | None = None) -> str:
    """DuckDB fragment computing the identical bucket as :func:`md5_bucket`."""
    inp = f"CAST({expr} AS VARCHAR)"
    if salt:
        inp = f"'{salt}' || {inp}"
    b = f"('0x' || substr(md5({inp}), 1, 8))::BIGINT"
    return f"{b} % {mod}" if mod is not None else b
