"""Differential query fuzzing (SQLancer-style): hypothesis generates
random filter/group/aggregate specs over lineitem; each spec is rendered
BOTH as a Spark DataFrame pipeline and as DuckDB SQL and the results must
match under the canonical comparison.

This covers the combinatorial space the hand-written declared queries
sample only pointwise: arbitrary predicate conjunctions x grouping
choices x aggregate sets, including the empty-result and empty-group
edges. Constants are drawn from the same value grids the data uses
(2dp money, day-granular timestamps, enum strings), so literals parse to
identical values in both engines and every comparison is exact — any
mismatch is an engine-semantics bug, not float noise.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from metricq_db_hta_spark import oracle
from metricq_db_hta_spark.queries.base import bsum, msum, sql_dsum
from metricq_db_hta_spark.sources.tables import load_table

# predicate atoms: (column, [grid of constants]) — all constants exist in
# or bracket the actual sf0.001 value ranges so filters hit every
# selectivity from empty to full
NUM_COLS = {
    "l_quantity": [1.0, 10.0, 25.0, 49.0],
    "l_extendedprice": [1000.0, 20000.0, 60000.0],
    "l_discount": [0.0, 0.03, 0.07, 0.1],
    "l_orderkey": [100.0, 2000.0, 5000.0],
}
TS_CONSTS = ["1996-06-01", "1998-01-01", "2000-06-01"]
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
OPS = ["<", "<=", ">", ">=", "="]

num_pred = st.tuples(
    st.sampled_from(sorted(NUM_COLS)), st.sampled_from(OPS), st.integers(0, 3)
)
ts_pred = st.tuples(
    st.just("l_shipdate"), st.sampled_from(["<", ">="]), st.integers(0, 2)
)
str_pred = st.tuples(
    st.sampled_from(sorted(STR_COLS)), st.just("="), st.integers(0, 2)
)

AGGS = ["count", "sum_qty", "sum_price", "min_qty", "max_price", "sum_key"]

query_spec = st.fixed_dictionaries(
    {
        "preds": st.lists(
            st.one_of(num_pred, ts_pred, str_pred), min_size=0, max_size=3
        ),
        "group": st.sampled_from(
            [(), ("l_returnflag",), ("l_linestatus",), ("l_returnflag", "l_linestatus")]
        ),
        "aggs": st.lists(
            st.sampled_from(AGGS), min_size=1, max_size=3, unique=True
        ),
        # optionally join orders on l_orderkey=o_orderkey and group by
        # o_orderpriority instead — exercises join+agg combinations
        "join_orders": st.booleans(),
    }
)


def _const(col: str, idx: int):
    if col == "l_shipdate":
        return TS_CONSTS[idx % len(TS_CONSTS)]
    if col in STR_COLS:
        return STR_COLS[col][idx % len(STR_COLS[col])]
    grid = NUM_COLS[col]
    return grid[idx % len(grid)]


_SPARK_AGG = {
    "count": lambda: F.count("*").alias("n"),
    "sum_qty": lambda: msum("l_quantity").alias("sum_qty"),
    "sum_price": lambda: msum("l_extendedprice").alias("sum_price"),
    "min_qty": lambda: F.min("l_quantity").alias("min_qty"),
    "max_price": lambda: F.max("l_extendedprice").alias("max_price"),
    "sum_key": lambda: bsum("l_orderkey").alias("sum_key"),
}
_SQL_AGG = {
    "count": "COUNT(*) AS n",
    "sum_qty": f"{sql_dsum('l_quantity')} AS sum_qty",
    "sum_price": f"{sql_dsum('l_extendedprice')} AS sum_price",
    "min_qty": "MIN(l_quantity) AS min_qty",
    "max_price": "MAX(l_extendedprice) AS max_price",
    "sum_key": "CAST(SUM(l_orderkey) AS BIGINT) AS sum_key",
}


def _group_cols(spec):
    if spec["join_orders"]:
        return (*spec["group"], "o_orderpriority")
    return spec["group"]


def _spark_query(spark, sf_dir, spec):
    df = load_table(spark, sf_dir, "lineitem")
    if spec["join_orders"]:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        df = df.join(o, df.l_orderkey == o.o_orderkey)
    for col, op, idx in spec["preds"]:
        c = _const(col, idx)
        lhs = F.col(col)
        rhs = (
            F.lit(c).cast("timestamp") if col == "l_shipdate" else F.lit(c)
        )
        expr = {
            "<": lhs < rhs,
            "<=": lhs <= rhs,
            ">": lhs > rhs,
            ">=": lhs >= rhs,
            "=": lhs == rhs,
        }[op]
        df = df.filter(expr)
    aggs = [_SPARK_AGG[a]() for a in spec["aggs"]]
    group = _group_cols(spec)
    if group:
        return df.groupBy(*group).agg(*aggs)
    return df.agg(*aggs)


def _oracle_sql(spec) -> str:
    wheres = []
    for col, op, idx in spec["preds"]:
        c = _const(col, idx)
        if col == "l_shipdate":
            rhs = f"TIMESTAMP '{c} 00:00:00'"
        elif col in STR_COLS:
            rhs = f"'{c}'"
        else:
            rhs = repr(c)
        wheres.append(f"{col} {op} {rhs}")
    sel = [_SQL_AGG[a] for a in spec["aggs"]]
    group = _group_cols(spec)
    sql = "SELECT "
    if group:
        sel = [*group, *sel]
    sql += ", ".join(sel) + " FROM lineitem"
    if spec["join_orders"]:
        sql += " JOIN orders ON l_orderkey = o_orderkey"
    if wheres:
        sql += " WHERE " + " AND ".join(wheres)
    if group:
        sql += " GROUP BY " + ", ".join(group)
    return sql


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=query_spec)
def test_random_query_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_query(spark, sf_dir, spec)
    mismatch = oracle.compare(df, duck, _oracle_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# window-function fuzzing: ranking + framed aggregates over a unique total
# order. (l_orderkey, l_linenumber) alone is NOT unique in the synthetic
# data (1161 duplicate pairs at sf0.001 — found by this very fuzzer), so
# the order key is the 6-column combination verified unique across rows;
# without a total order, framed sums are legitimately engine-divergent.
# ---------------------------------------------------------------------------
from pyspark.sql import Window  # noqa: E402

ORDER_COLS = [
    "l_orderkey",
    "l_linenumber",
    "l_partkey",
    "l_suppkey",
    "l_extendedprice",
    "l_quantity",
]

WFUNCS = ["row_number", "rank", "sum_qty_frame", "min_price_frame", "lag_qty"]
FRAMES = [(-2, 0), (-1, 1), (0, 2)]

window_spec = st.fixed_dictionaries(
    {
        "partition": st.sampled_from([(), ("l_returnflag",), ("l_linestatus",)]),
        "func": st.sampled_from(WFUNCS),
        "frame": st.sampled_from(FRAMES),
        "desc": st.booleans(),
        # pre-filter keeps each example cheap and varies row counts
        "key_cap": st.sampled_from([500, 2000, 10**9]),
    }
)


def _spark_window(spark, sf_dir, spec):
    df = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= spec["key_cap"]
    )
    order = [
        F.col(c).desc() if spec["desc"] else F.col(c) for c in ORDER_COLS
    ]
    w = (
        Window.partitionBy(*spec["partition"]).orderBy(*order)
        if spec["partition"]
        else Window.partitionBy(F.lit(1)).orderBy(*order)
    )
    lo, hi = spec["frame"]
    fn = spec["func"]
    if fn == "row_number":
        val = F.row_number().over(w)
    elif fn == "rank":
        val = F.rank().over(w)
    elif fn == "lag_qty":
        val = F.lag("l_quantity").over(w)
    elif fn == "sum_qty_frame":
        val = msum2_frame("l_quantity", w.rowsBetween(lo, hi))
    else:
        val = F.min("l_extendedprice").over(w.rowsBetween(lo, hi))
    return df.select(
        "l_orderkey", "l_linenumber", val.alias("wval")
    )


def msum2_frame(col, w):
    # framed sums run over <= 4 money-grain values: exact in double, but
    # pin the accumulation order anyway via the scaled-long trick
    scaled = F.rint(F.col(col) * 1_000_000.0).cast("long")
    return (F.sum(scaled).over(w).cast("double") / 1e6).alias("wval")


def _oracle_window_sql(spec) -> str:
    part = (
        "PARTITION BY " + ", ".join(spec["partition"])
        if spec["partition"]
        else ""
    )
    d = " DESC" if spec["desc"] else ""
    order = "ORDER BY " + ", ".join(f"{c}{d}" for c in ORDER_COLS)
    lo, hi = spec["frame"]

    def bound(n, side):
        if n == 0:
            return "CURRENT ROW"
        return f"{abs(n)} {'PRECEDING' if n < 0 else 'FOLLOWING'}"

    frame = f"ROWS BETWEEN {bound(lo, 'lo')} AND {bound(hi, 'hi')}"
    fn = spec["func"]
    if fn == "row_number":
        expr = f"row_number() OVER ({part} {order})"
    elif fn == "rank":
        expr = f"rank() OVER ({part} {order})"
    elif fn == "lag_qty":
        expr = f"lag(l_quantity) OVER ({part} {order})"
    elif fn == "sum_qty_frame":
        expr = (
            f"CAST(SUM(CAST(round(l_quantity * 1000000) AS BIGINT)) "
            f"OVER ({part} {order} {frame}) AS DOUBLE) / 1e6"
        )
    else:
        expr = f"MIN(l_extendedprice) OVER ({part} {order} {frame})"
    return (
        f"SELECT l_orderkey, l_linenumber, {expr} AS wval FROM lineitem "
        f"WHERE l_orderkey <= {spec['key_cap']}"
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=window_spec)
def test_random_window_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_window(spark, sf_dir, spec)
    mismatch = oracle.compare(df, duck, _oracle_window_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# set-operation fuzzing (VERDICT r7 next-step 5): two filtered projections
# of lineitem combined by UNION / UNION ALL / INTERSECT [ALL] / EXCEPT
# [ALL], rendered through the DataFrame API (the surface the declared
# rel_set_* queries use) and as ANSI SQL for the oracle. Projections are
# low-cardinality column pairs so INTERSECT/EXCEPT produce non-trivial
# overlaps at every predicate selectivity, including the empty side.
# ---------------------------------------------------------------------------

SETOP_PROJ = [
    ("l_returnflag", "l_linestatus"),
    ("l_returnflag", "l_linenumber"),
    ("l_linestatus", "l_quantity"),
]

setop_spec = st.fixed_dictionaries(
    {
        "proj": st.sampled_from(SETOP_PROJ),
        "preds_a": st.lists(
            st.one_of(num_pred, ts_pred, str_pred), min_size=0, max_size=2
        ),
        "preds_b": st.lists(
            st.one_of(num_pred, ts_pred, str_pred), min_size=0, max_size=2
        ),
        "op": st.sampled_from(
            ["union", "union_all", "intersect", "intersect_all",
             "except", "except_all"]
        ),
    }
)


def _filtered(spark, sf_dir, preds):
    df = load_table(spark, sf_dir, "lineitem")
    for col, op, idx in preds:
        c = _const(col, idx)
        lhs = F.col(col)
        rhs = F.lit(c).cast("timestamp") if col == "l_shipdate" else F.lit(c)
        df = df.filter(
            {"<": lhs < rhs, "<=": lhs <= rhs, ">": lhs > rhs,
             ">=": lhs >= rhs, "=": lhs == rhs}[op]
        )
    return df


def _where_sql(preds) -> str:
    if not preds:
        return ""
    wheres = []
    for col, op, idx in preds:
        c = _const(col, idx)
        if col == "l_shipdate":
            rhs = f"TIMESTAMP '{c} 00:00:00'"
        elif col in STR_COLS:
            rhs = f"'{c}'"
        else:
            rhs = repr(c)
        wheres.append(f"{col} {op} {rhs}")
    return " WHERE " + " AND ".join(wheres)


def _spark_setop(spark, sf_dir, spec):
    proj = list(spec["proj"])
    a = _filtered(spark, sf_dir, spec["preds_a"]).select(*proj)
    b = _filtered(spark, sf_dir, spec["preds_b"]).select(*proj)
    return {
        # DataFrame union == UNION ALL; SQL UNION's dedup is .distinct()
        "union": lambda: a.union(b).distinct(),
        "union_all": lambda: a.union(b),
        "intersect": lambda: a.intersect(b),
        "intersect_all": lambda: a.intersectAll(b),
        "except": lambda: a.subtract(b),
        "except_all": lambda: a.exceptAll(b),
    }[spec["op"]]()


def _oracle_setop_sql(spec) -> str:
    proj = ", ".join(spec["proj"])
    a = f"SELECT {proj} FROM lineitem{_where_sql(spec['preds_a'])}"
    b = f"SELECT {proj} FROM lineitem{_where_sql(spec['preds_b'])}"
    kw = {
        "union": "UNION",
        "union_all": "UNION ALL",
        "intersect": "INTERSECT",
        "intersect_all": "INTERSECT ALL",
        "except": "EXCEPT",
        "except_all": "EXCEPT ALL",
    }[spec["op"]]
    return f"({a}) {kw} ({b})"


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=setop_spec)
def test_random_setop_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_setop(spark, sf_dir, spec)
    # UNION ALL of two unfiltered lineitem scans is ~2x the table — at the
    # sf0.1 soak scale that is ~1.2M rows, over oracle.ROW_BUDGET's 1M
    # default (sized for declared <=10k-row checks). Declare the fuzzer's
    # true worst case explicitly so the budget guard keeps protecting
    # declared queries without vetoing this soak.
    mismatch = oracle.compare(
        df, duck, _oracle_setop_sql(spec), row_budget=2_500_000
    )
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# subquery fuzzing (VERDICT r7 next-step 5): random [NOT] EXISTS / [NOT]
# IN / correlated scalar subqueries over customer⟷orders, executed as ONE
# SQL string through BOTH engines. Running the Spark side via spark.sql
# (not a hand-built semi/anti-join) is the point: it exercises Catalyst's
# decorrelation rewrites (RewritePredicateSubquery, scalar-subquery
# aggregation pull-up) against DuckDB's independent decorrelator — the
# rewrites the declared rel_subquery_* queries sample only pointwise.
# ---------------------------------------------------------------------------

ORD_NUM = {
    "o_totalprice": [1000.0, 50000.0, 150000.0, 300000.0],
    "o_custkey": [50.0, 500.0, 5000.0],
}
ORD_STR = {"o_orderstatus": ["F", "O", "P"]}

ord_num_pred = st.tuples(
    st.sampled_from(sorted(ORD_NUM)), st.sampled_from(OPS), st.integers(0, 3)
)
ord_ts_pred = st.tuples(
    st.just("o_orderdate"), st.sampled_from(["<", ">="]), st.integers(0, 2)
)
ord_str_pred = st.tuples(
    st.sampled_from(sorted(ORD_STR)), st.just("="), st.integers(0, 2)
)

subquery_spec = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(
            ["exists", "not_exists", "in", "not_in",
             "scalar_count", "scalar_max", "scalar_sum"]
        ),
        "sub_preds": st.lists(
            st.one_of(ord_num_pred, ord_ts_pred, ord_str_pred),
            min_size=0,
            max_size=2,
        ),
        "cust_cap": st.sampled_from([500, 2000, 10**9]),
        "segment": st.sampled_from(
            [None, "AUTOMOBILE", "BUILDING", "MACHINERY"]
        ),
    }
)


def _ord_where(preds, *, correlated: bool, extra_indent: str = "") -> str:
    conds = ["o_custkey = c_custkey"] if correlated else []
    for col, op, idx in preds:
        if col == "o_orderdate":
            c = TS_CONSTS[idx % len(TS_CONSTS)]
            rhs = f"TIMESTAMP '{c} 00:00:00'"
        elif col in ORD_STR:
            rhs = f"'{ORD_STR[col][idx % len(ORD_STR[col])]}'"
        else:
            grid = ORD_NUM[col]
            rhs = repr(grid[idx % len(grid)])
        conds.append(f"{col} {op} {rhs}")
    return (" WHERE " + " AND ".join(conds)) if conds else ""


def _subquery_sql(spec) -> str:
    outer = [f"c_custkey <= {spec['cust_cap']}"]
    if spec["segment"] is not None:
        outer.append(f"c_mktsegment = '{spec['segment']}'")
    kind = spec["kind"]
    if kind in ("exists", "not_exists"):
        neg = "NOT " if kind == "not_exists" else ""
        sub = f"SELECT 1 FROM orders{_ord_where(spec['sub_preds'], correlated=True)}"
        outer.append(f"{neg}EXISTS ({sub})")
        sel = "c_custkey, c_acctbal"
    elif kind in ("in", "not_in"):
        # o_custkey is never NULL in the fixture, so NOT IN keeps its
        # intuitive anti-join meaning identically in both engines
        neg = "NOT " if kind == "not_in" else ""
        sub = f"SELECT o_custkey FROM orders{_ord_where(spec['sub_preds'], correlated=False)}"
        outer.append(f"c_custkey {neg}IN ({sub})")
        sel = "c_custkey, c_acctbal"
    else:
        agg = {
            "scalar_count": "COUNT(*)",
            "scalar_max": "MAX(o_totalprice)",
            "scalar_sum": sql_dsum("o_totalprice"),
        }[kind]
        sub = f"SELECT {agg} FROM orders{_ord_where(spec['sub_preds'], correlated=True)}"
        sel = f"c_custkey, c_acctbal, ({sub}) AS sub_val"
    return f"SELECT {sel} FROM customer WHERE " + " AND ".join(outer)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=subquery_spec)
def test_random_subquery_matches_oracle(spark, duck, sf_dir, spec):
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    df = spark.sql(_subquery_sql(spec))
    mismatch = oracle.compare(df, duck, _subquery_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# as-of join fuzzing: the union-trick operator (operators/asof.py) is the
# engine's most intricate custom operator — direction, inclusive tie
# handling, equal-ts reference dedup, and tolerance nullification all
# interact. Random (probe type, reference type, direction, tolerance)
# specs run the fused one-exchange Spark operator against DuckDB's native
# ASOF JOIN; the declared rel_join_asof* queries pin only 3 points of
# this space.
# ---------------------------------------------------------------------------

EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
HOUR_NS = 3_600_000_000_000
TOLERANCES = [None, HOUR_NS, 28 * HOUR_NS, 30 * 24 * HOUR_NS]

asof_spec = st.fixed_dictionaries(
    {
        # index pair with i != j so probe and reference predicates are
        # disjoint (a row matching both would be tagged reference-only)
        "probe_i": st.integers(0, 4),
        "ref_off": st.integers(1, 4),
        "forward": st.booleans(),
        "tol_i": st.integers(0, 3),
    }
)


def _spark_asof(spark, sf_dir, spec):
    from metricq_db_hta_spark.operators.asof import (
        asof_self_join_backward,
        asof_self_join_forward,
    )
    from metricq_db_hta_spark.queries.relational import events_df

    probe = EVENT_TYPES[spec["probe_i"]]
    ref = EVENT_TYPES[(spec["probe_i"] + spec["ref_off"]) % 5]
    tol = TOLERANCES[spec["tol_i"]]
    fn = asof_self_join_forward if spec["forward"] else asof_self_join_backward
    return fn(
        events_df(spark, sf_dir),
        by=["user_id"],
        ts_col="ts_ns",
        probe_pred=F.col("event_type") == probe,
        ref_pred=F.col("event_type") == ref,
        right_payload={"r_ts_ns": "ts_ns", "r_value": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns", "value"],
        tolerance_ns=tol,
        payload_ts="r_ts_ns" if tol is not None else None,
    )


def _oracle_asof_sql(spec) -> str:
    probe = EVENT_TYPES[spec["probe_i"]]
    ref = EVENT_TYPES[(spec["probe_i"] + spec["ref_off"]) % 5]
    tol = TOLERANCES[spec["tol_i"]]
    cmp_op = "<=" if spec["forward"] else ">="
    if tol is None:
        sel = "r.r_ts_ns, r.r_value"
    else:
        gap = (
            "r.r_ts_ns - p.ts_ns" if spec["forward"] else "p.ts_ns - r.r_ts_ns"
        )
        sel = (
            f"CASE WHEN {gap} <= {tol} THEN r.r_ts_ns END AS r_ts_ns, "
            f"CASE WHEN {gap} <= {tol} THEN r.r_value END AS r_value"
        )
    return f"""
WITH ev AS (
  SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type, value
  FROM events
),
p AS (SELECT event_id, user_id, ts_ns, value FROM ev
      WHERE event_type = '{probe}'),
r AS (SELECT user_id, ts_ns AS r_ts_ns, value AS r_value FROM ev
      WHERE event_type = '{ref}'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts_ns
                                 ORDER BY event_id DESC) = 1)
SELECT p.event_id, p.user_id, p.ts_ns, p.value, {sel}
FROM p ASOF LEFT JOIN r
  ON p.user_id = r.user_id AND p.ts_ns {cmp_op} r.r_ts_ns
"""


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=asof_spec)
def test_random_asof_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_asof(spark, sf_dir, spec)
    mismatch = oracle.compare(df, duck, _oracle_asof_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# HTA history-service fuzzing: the level router (Q1) and the cost-routed
# range decomposition (Q3) are the reference's core read path
# (async_hta_service.hpp:361-464). Random (metric, hour-aligned range,
# interval_max) specs run the service against the DuckDB level CTEs; the
# expected level in the oracle follows the REFERENCE rule (coarsest width
# <= interval_max, finest if none), so a routing bug surfaces as a width
# mismatch, not a silently-agreeing comparison.
# ---------------------------------------------------------------------------

from metricq_db_hta_spark.queries.hta_queries import (  # noqa: E402
    LEVEL_WIDTHS,
    LEVELS_SQL,
    W0,
    service as hta_service,
)
from metricq_db_hta_spark.queries.base import sql_bsum  # noqa: E402

import pytest
# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

#: 2024-01-01T00:00:00Z — the fixture events start here
HTA_T0 = 1_704_067_200_000_000_000
IMAX_GRID = [
    W0 // 2,            # finer than finest: Q1 falls back to level0
    W0,                 # exactly level0
    5 * W0,             # between levels -> level0
    LEVEL_WIDTHS[1],    # exactly level1
    3 * LEVEL_WIDTHS[1],
    LEVEL_WIDTHS[2],    # exactly level2
    10 * LEVEL_WIDTHS[2],
]

hta_spec = st.fixed_dictionaries(
    {
        "metric": st.sampled_from([None, *EVENT_TYPES]),
        "h0": st.integers(0, 700),
        "span_h": st.integers(1, 400),
        "imax_i": st.integers(0, len(IMAX_GRID) - 1),
    }
)


def _hta_range(spec):
    start = HTA_T0 + spec["h0"] * W0
    end = start + spec["span_h"] * W0
    return start, end


def _expected_level(imax: int) -> int:
    fitting = [i for i, w in enumerate(LEVEL_WIDTHS) if w <= imax]
    return max(fitting) if fitting else 0


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=hta_spec)
def test_random_hta_q1_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.queries.hta_queries import _present

    start, end = _hta_range(spec)
    imax = IMAX_GRID[spec["imax_i"]]
    svc = hta_service(spark, sf_dir)
    df = _present(svc.aggregate_timeline(spec["metric"], start, end, imax))
    where = f"bucket_start_ns >= {start} AND bucket_start_ns < {end}"
    if spec["metric"] is not None:
        where += f" AND metric = '{spec['metric']}'"
    sql = LEVELS_SQL + f"""
SELECT metric, bucket_start_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM level{_expected_level(imax)}
WHERE {where}
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=hta_spec)
def test_random_hta_q3_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.queries.hta_queries import _present

    start, end = _hta_range(spec)
    svc = hta_service(spark, sf_dir)
    df = _present(svc.aggregate(spec["metric"], start, end))
    where = f"bucket_start_ns >= {start} AND bucket_start_ns < {end}"
    if spec["metric"] is not None:
        where += f" AND metric = '{spec['metric']}'"
    sql = LEVELS_SQL + f"""
SELECT metric, MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral,
       {sql_bsum('active_time')} AS active_time
FROM level0
WHERE {where}
GROUP BY metric
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# regexp parity fuzzing (VERDICT r8 next-step 7): the LLM text surface
# (PII redaction, URL extraction, normalize-dedup) is regex-heavy, and
# regex semantics are a classic cross-engine divergence site — Spark runs
# java.util.regex, DuckDB runs RE2. The hand-written queries pin specific
# patterns pointwise; this generator sweeps the COMMON SUBSET grammar both
# engines document identically (literals, classes, \d/\w/\s, greedy
# quantifiers, non-capturing alternation, anchors, dot) over the real
# documents text, and requires regexp_extract / regexp_replace(g) /
# match-count parity row-for-row. Deliberately excluded from the grammar,
# with the engine reason: backreferences and lookaround (absent from RE2),
# capturing-group replacement ($1 vs \1 syntax), non-ASCII classes (UTF-16
# vs UTF-8 code-unit semantics), and NULLABLE patterns — ones that can
# match the empty string. The nullable exclusion is not hypothetical: this
# fuzzer's first unseeded sweep found it (pattern 'a?', global replace:
# java.util.regex and RE2 place zero-width matches differently next to
# non-empty matches, e.g. Spark '<R>f<R><R>s<R>' vs DuckDB '<R>f<R>s<R>'),
# so _rx_pattern forces at least one non-optional piece. The engine
# queries' own patterns (PII/URL/normalize) are all non-nullable.
# ---------------------------------------------------------------------------

_RX_ATOMS = [
    "a", "e", "t", "th", " ", r"\d", r"\w", r"\s",
    "[a-m]", "[aeiou]", "[^aeiou ]", ".",
]
_RX_QUANTS = ["", "?", "*", "+", "{2}", "{1,3}"]

_rx_piece = st.tuples(st.sampled_from(_RX_ATOMS), st.sampled_from(_RX_QUANTS))

regexp_spec = st.fixed_dictionaries(
    {
        "pieces": st.lists(_rx_piece, min_size=1, max_size=4),
        "alt": st.one_of(st.none(), st.sampled_from(["or", "and|or", "ing"])),
        "anchor": st.sampled_from(["", "^", "$"]),
        "func": st.sampled_from(["extract", "replace", "count"]),
    }
)


def _rx_pattern(spec) -> str:
    pieces = list(spec["pieces"])
    if all(q in ("?", "*") for _, q in pieces):
        # nullable pattern — zero-width global-match semantics diverge
        # between java.util.regex and RE2 (see section comment); pin the
        # first piece to one-or-more so the pattern never matches empty
        pieces[0] = (pieces[0][0], "+")
    body = "".join(a + q for a, q in pieces)
    if spec["alt"] is not None:
        body = f"(?:{body}|{spec['alt']})"
    if spec["anchor"] == "^":
        body = "^" + body
    elif spec["anchor"] == "$":
        body = body + "$"
    return body


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=regexp_spec)
def test_random_regexp_matches_oracle(spark, duck, sf_dir, spec):
    pat = _rx_pattern(spec)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    lit = pat  # grammar emits no single quotes; safe to inline in SQL
    if spec["func"] == "extract":
        df = docs.select(
            "doc_id", F.regexp_extract(F.col("text"), pat, 0).alias("m")
        )
        sql = (
            "SELECT doc_id, regexp_extract(text, '" + lit + "', 0) AS m "
            "FROM documents WHERE doc_id < 60"
        )
    elif spec["func"] == "replace":
        df = docs.select(
            "doc_id", F.regexp_replace(F.col("text"), pat, "<R>").alias("m")
        )
        sql = (
            "SELECT doc_id, regexp_replace(text, '" + lit + "', '<R>', 'g') AS m "
            "FROM documents WHERE doc_id < 60"
        )
    else:
        df = docs.select(
            "doc_id", F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias("m")
        )
        sql = (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '" + lit + "')) AS BIGINT) AS m "
            "FROM documents WHERE doc_id < 60"
        )
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (pat, spec["func"], mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# join-type fuzzing (r9): the query fuzzer above only exercises INNER
# join+agg; the declared rel_join_* queries pin each join type pointwise.
# This closes the combinatorial gap: every join type x filter-on-either-
# side x selectivity (empty left, empty right, full overlap), with
# filters applied BEFORE the join on both engines (subselects in the SQL
# rendering — for outer joins, filter-then-join and join-then-filter are
# semantically different, and the DataFrame pipeline does the former).
# Null-extended rows from LEFT/RIGHT/FULL and the EXISTS/NOT EXISTS
# renderings of semi/anti are the interesting edges.
# ---------------------------------------------------------------------------

JOIN_TYPES = ["inner", "left", "right", "full", "left_semi", "left_anti"]

# (sql predicate, spark builder) pairs per side; index 0 = no filter
LEFT_PREDS = [
    None,
    ("l_quantity <= 25.0", lambda d: d.filter(F.col("l_quantity") <= 25.0)),
    ("l_returnflag = 'R'", lambda d: d.filter(F.col("l_returnflag") == "R")),
    ("l_orderkey < 0", lambda d: d.filter(F.col("l_orderkey") < 0)),  # empty
]
RIGHT_PREDS = [
    None,
    (
        "o_orderpriority = '1-URGENT'",
        lambda d: d.filter(F.col("o_orderpriority") == "1-URGENT"),
    ),
    (
        "o_totalprice >= 150000.0",
        lambda d: d.filter(F.col("o_totalprice") >= 150000.0),
    ),
    ("o_orderkey < 0", lambda d: d.filter(F.col("o_orderkey") < 0)),  # empty
]

join_fuzz_spec = st.fixed_dictionaries(
    {
        "how": st.sampled_from(JOIN_TYPES),
        "lpred": st.integers(0, len(LEFT_PREDS) - 1),
        "rpred": st.integers(0, len(RIGHT_PREDS) - 1),
        "key_cap": st.sampled_from([500, 2000]),
    }
)


def _join_fuzz_frames(spark, sf_dir, spec):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") <= spec["key_cap"]
    )
    o = load_table(spark, sf_dir, "orders")
    if LEFT_PREDS[spec["lpred"]] is not None:
        li = LEFT_PREDS[spec["lpred"]][1](li)
    if RIGHT_PREDS[spec["rpred"]] is not None:
        o = RIGHT_PREDS[spec["rpred"]][1](o)
    return li, o


def _spark_join_fuzz(spark, sf_dir, spec):
    li, o = _join_fuzz_frames(spark, sf_dir, spec)
    how = spec["how"]
    joined = li.join(o, li.l_orderkey == o.o_orderkey, how)
    if how in ("left_semi", "left_anti"):
        return joined.select("l_orderkey", "l_linenumber", "l_quantity")
    return joined.select(
        "l_orderkey", "l_linenumber", "l_quantity",
        "o_orderkey", "o_orderpriority", "o_totalprice",
    )


def _oracle_join_fuzz_sql(spec) -> str:
    lw = f"l_orderkey <= {spec['key_cap']}"
    if LEFT_PREDS[spec["lpred"]] is not None:
        lw += " AND " + LEFT_PREDS[spec["lpred"]][0]
    lsub = f"(SELECT * FROM lineitem WHERE {lw}) l"
    rw = (
        RIGHT_PREDS[spec["rpred"]][0]
        if RIGHT_PREDS[spec["rpred"]] is not None
        else "TRUE"
    )
    rsub = f"(SELECT * FROM orders WHERE {rw}) o"
    how = spec["how"]
    if how in ("left_semi", "left_anti"):
        neg = "NOT " if how == "left_anti" else ""
        return (
            f"SELECT l_orderkey, l_linenumber, l_quantity FROM {lsub} "
            f"WHERE {neg}EXISTS (SELECT 1 FROM {rsub} "
            f"WHERE o.o_orderkey = l.l_orderkey)"
        )
    kw = {"inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
          "full": "FULL OUTER JOIN"}[how]
    return (
        f"SELECT l_orderkey, l_linenumber, l_quantity, "
        f"o_orderkey, o_orderpriority, o_totalprice "
        f"FROM {lsub} {kw} {rsub} ON l.l_orderkey = o.o_orderkey"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=join_fuzz_spec)
def test_random_join_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_join_fuzz(spark, sf_dir, spec)
    mismatch = oracle.compare(df, duck, _oracle_join_fuzz_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# grouping-structure fuzzing (r9): random GROUPING SETS / ROLLUP / CUBE
# over low-cardinality lineitem columns, optional pre-filter, sum+count
# aggregates, GROUPING() disambiguation. The declared rel_agg_rollup/
# cube/grouping_sets queries pin one structure each; this samples the
# lattice space — empty sets, the grand-total-only set, duplicated
# member columns across sets, and the NULL-vs-"NULL group" ambiguity
# GROUPING() exists to resolve.
# ---------------------------------------------------------------------------

GCOLS = ["l_returnflag", "l_linestatus", "l_linenumber"]

grouping_spec = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["sets", "rollup", "cube"]),
        # indexes into GCOLS; for "sets" each inner tuple is one set
        "cols": st.lists(
            st.integers(0, len(GCOLS) - 1), min_size=1, max_size=3, unique=True
        ),
        "sets": st.lists(
            st.lists(
                st.integers(0, len(GCOLS) - 1),
                min_size=0,
                max_size=2,
                unique=True,
            ),
            min_size=1,
            max_size=3,
        ),
        "filtered": st.booleans(),
    }
)


def _grouping_frames(spec):
    cols = [GCOLS[i] for i in spec["cols"]]
    sets = [tuple(GCOLS[i] for i in s) for s in spec["sets"]]
    # grouped output columns: union of set members, in GCOLS order
    if spec["kind"] == "sets":
        used = sorted({c for s in sets for c in s}, key=GCOLS.index)
        if not used:  # all sets empty = grand total only; group cols absent
            used = []
    else:
        used = cols
    return cols, sets, used


def _spark_grouping(spark, sf_dir, spec):
    cols, sets, used = _grouping_frames(spec)
    df = load_table(spark, sf_dir, "lineitem")
    if spec["filtered"]:
        df = df.filter(F.col("l_quantity") <= 25.0)
    df.createOrReplaceTempView("v_li_gfuzz")
    if spec["kind"] == "sets":
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
        by = f"GROUPING SETS ({sets_sql})"
    elif spec["kind"] == "rollup":
        by = "ROLLUP (" + ", ".join(cols) + ")"
    else:
        by = "CUBE (" + ", ".join(cols) + ")"
    sel = used + [f"GROUPING({c}) AS g_{c}" for c in used]
    # the filter lives inside the view, so the SQL is pure grouping
    sql = (
        "SELECT "
        + ", ".join(sel + [
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty",
            "COUNT(*) AS n",
        ])
        + f" FROM v_li_gfuzz GROUP BY {by}"
    )
    return spark.sql(sql)


def _oracle_grouping_sql(spec) -> str:
    cols, sets, used = _grouping_frames(spec)
    if spec["kind"] == "sets":
        sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
        by = f"GROUPING SETS ({sets_sql})"
    elif spec["kind"] == "rollup":
        by = "ROLLUP (" + ", ".join(cols) + ")"
    else:
        by = "CUBE (" + ", ".join(cols) + ")"
    sel = used + [f"GROUPING({c}) AS g_{c}" for c in used]
    return (
        "SELECT "
        + ", ".join(sel + [
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty",
            "CAST(COUNT(*) AS BIGINT) AS n",
        ])
        + " FROM lineitem"
        + (" WHERE l_quantity <= 25.0" if spec["filtered"] else "")
        + f" GROUP BY {by}"
    )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=grouping_spec)
def test_random_grouping_structure_matches_oracle(spark, duck, sf_dir, spec):
    df = _spark_grouping(spark, sf_dir, spec)
    mismatch = oracle.compare(df, duck, _oracle_grouping_sql(spec))
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 11 (r10): dense-timeline serving — gap-filled Q1 and linear
# resampling over random (metric, range, width/step). Exercises alignment
# arithmetic (unaligned starts, ranges past the data, empty spines) the
# declared queries sample pointwise.
# ---------------------------------------------------------------------------

#: resample steps: aligned (15m/30m/1h), coarse-unaligned (1.5h), and a
#: deliberately odd prime-ish step so grid points never coincide with
#: bucket or sample alignment
RESAMPLE_STEPS = [
    900_000_000_000,
    1_800_000_000_000,
    3_600_000_000_000,
    5_400_000_000_000,
    7_777_000_000_000,
]

#: mapped (post-ingest) metric names — resampling serves the committed
#: store, whose names went through the A2 rename mapping
KEPT_METRICS = [
    "interaction.click", "interaction.view", "signup", "error", "purchase",
]

dense_spec = st.fixed_dictionaries(
    {
        "metric": st.sampled_from([None, *KEPT_METRICS]),
        "h0": st.integers(0, 800),      # events span ~720 h: past-the-end
        "span_h": st.integers(1, 400),  # ranges are a real edge
        "step_i": st.integers(0, len(RESAMPLE_STEPS) - 1),
        "imax_i": st.integers(0, len(IMAX_GRID) - 1),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=dense_spec)
def test_random_resample_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.operators import ingest
    from metricq_db_hta_spark.plans.history import resample_linear
    from metricq_db_hta_spark.queries.hta_queries import (
        _CHAIN_CTES,
        MAPPING,
        samples,
    )

    start, end = _hta_range(spec)
    step = RESAMPLE_STEPS[spec["step_i"]]
    kept = ingest.ingest_batch(samples(spark, sf_dir), MAPPING, metric_col="metric")
    df = resample_linear(kept, spec["metric"], start, end, step)
    mfilter = (
        "" if spec["metric"] is None else f"WHERE metric = '{spec['metric']}'"
    )
    sql = f"""
WITH {_CHAIN_CTES.strip()},
m AS (SELECT metric, ts_ns, value FROM kept {mfilter}),
sp AS (SELECT range AS pos FROM range({start}, {end}, {step})),
mets AS (SELECT DISTINCT metric FROM m),
merged AS (
  SELECT mets.metric, pos, CAST(NULL AS DOUBLE) AS v,
         CAST(NULL AS BIGINT) AS sts, 1 AS is_spine
  FROM sp CROSS JOIN mets
  UNION ALL
  SELECT metric, ts_ns, value, ts_ns, 0 FROM m
),
w AS (
  SELECT metric, pos, is_spine,
    last_value(v IGNORE NULLS) OVER (PARTITION BY metric ORDER BY pos, is_spine
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(sts IGNORE NULLS) OVER (PARTITION BY metric ORDER BY pos, is_spine
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
    first_value(v IGNORE NULLS) OVER (PARTITION BY metric ORDER BY pos, is_spine
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(sts IGNORE NULLS) OVER (PARTITION BY metric ORDER BY pos, is_spine
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM merged
)
SELECT metric, pos AS ts_ns,
       ROUND(CASE WHEN prev_ts = pos THEN prev_v
             WHEN prev_ts IS NULL OR next_ts IS NULL THEN NULL
             ELSE prev_v + (next_v - prev_v)
                  * CAST(pos - prev_ts AS DOUBLE)
                  / CAST(next_ts - prev_ts AS DOUBLE) END, 6) AS value
FROM w WHERE is_spine = 1
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=dense_spec)
def test_random_gapfill_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.queries.hta_queries import (
        LEVEL_WIDTHS as LW,
        _present,
    )

    metric = spec["metric"] or "purchase"
    if metric.startswith("interaction."):
        # levels are built over RAW metric names (no mapping on this path)
        metric = metric.split(".", 1)[1]
    start, end = _hta_range(spec)
    imax = IMAX_GRID[spec["imax_i"]]
    width = LW[_expected_level(imax)]
    svc = hta_service(spark, sf_dir)
    df = _present(svc.aggregate_timeline_gapfill(metric, start, end, imax))
    first = start + (-start) % width
    # width-aligning the start can push it past a sub-width range's end;
    # Spark's range() returns empty there but DuckDB's raises ("start is
    # bigger than end") — clamp the oracle's end up to keep it empty-legal
    sql = LEVELS_SQL + f""",
spine AS (SELECT range AS bucket_start_ns
          FROM range({first}, {max(end, first)}, {width}))
SELECT '{metric}' AS metric, s.bucket_start_ns, l.minimum, l.maximum,
       CAST(COALESCE(l."sum", 0) AS DOUBLE) AS "sum",
       CAST(COALESCE(l."count", 0) AS BIGINT) AS "count",
       CAST(COALESCE(l.integral, 0) AS BIGINT) AS integral,
       CAST(COALESCE(l.active_time, 0) AS BIGINT) AS active_time
FROM spine s
LEFT JOIN (SELECT * FROM level{_expected_level(imax)}
           WHERE metric = '{metric}') l
  ON s.bucket_start_ns = l.bucket_start_ns
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 12 (r10): recursive CTE — random integer-division hierarchies
# parent(k) = k DIV c walked from every supplier key, rendered as Spark
# WITH RECURSIVE (DIV) and DuckDB WITH RECURSIVE (//). Randomizing the
# divisor and the walk cutoff varies recursion depth, fan-in, and the
# fixpoint behavior of small keys.
# ---------------------------------------------------------------------------

recursive_spec = st.fixed_dictionaries(
    {
        "div": st.integers(2, 7),
        "stop": st.sampled_from([0, 1, 2, 5]),  # walk while ancestor > stop
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=recursive_spec)
def test_random_recursive_cte_matches_oracle(spark, duck, sf_dir, spec):
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "v_supplier_fuzz"
    )
    d, stop = spec["div"], spec["stop"]
    df = spark.sql(f"""
WITH RECURSIVE anc(suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM v_supplier_fuzz
  UNION ALL
  SELECT suppkey, ancestor DIV {d}, depth + 1 FROM anc WHERE ancestor > {stop}
)
SELECT suppkey, ancestor, depth FROM anc
""")
    sql = f"""
WITH RECURSIVE anc(suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
  UNION ALL
  SELECT suppkey, ancestor // {d}, depth + 1 FROM anc WHERE ancestor > {stop}
)
SELECT suppkey, ancestor, depth FROM anc
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 13 (r10): retention-aware Q3 — random ranges x random per-level
# retention floors through the availability-constrained decomposition
# (plans/history.py::aggregate_tiered). The oracle aggregates the FINEST
# DuckDB level over exactly the covered segments (computed by the same
# pure function the hypothesis suite pins for partition/availability
# invariants), so any divergence in the multi-level substitution or the
# per-level slicing surfaces as a value mismatch — and the gap list is
# re-checked against the pure function on every example.
# ---------------------------------------------------------------------------

tiered_spec = st.fixed_dictionaries(
    {
        "metric": st.sampled_from([None, *EVENT_TYPES]),
        "h0": st.integers(0, 700),
        "span_h": st.integers(1, 400),
        # floor hour offsets from T0 per level; None = never expired.
        # Drawn independently (including inverted tiers): the math must
        # hold for arbitrary floors even though the retention operator
        # only ever advertises monotone ones.
        "f0": st.one_of(st.none(), st.integers(-50, 720)),
        "f1": st.one_of(st.none(), st.integers(-50, 720)),
        "f2": st.one_of(st.none(), st.integers(-50, 720)),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=tiered_spec)
def test_random_tiered_q3_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.plans.history import q3_segments_tiered

    start, end = _hta_range(spec)
    floors = {
        w: HTA_T0 + h * W0
        for w, h in zip(LEVEL_WIDTHS, (spec["f0"], spec["f1"], spec["f2"]))
        if h is not None
    }
    segs, gaps = q3_segments_tiered(start, end, LEVEL_WIDTHS, floors)
    svc = hta_service(spark, sf_dir)
    df, rep_gaps = svc.aggregate_tiered(spec["metric"], start, end, floors)
    assert rep_gaps == gaps
    cover = " OR ".join(
        f"(bucket_start_ns >= {lo} AND bucket_start_ns < {hi})"
        for _, lo, hi in segs
    ) or "FALSE"
    mfilter = (
        "" if spec["metric"] is None else f"AND metric = '{spec['metric']}'"
    )
    sql = LEVELS_SQL + f"""
SELECT metric, MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral,
       {sql_bsum('active_time')} AS active_time
FROM level0
WHERE ({cover}) {mfilter}
GROUP BY metric
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 14 (r10): mixed-resolution timeline — random ranges x floors x
# requested resolution through q1_regions_tiered/timeline_tiered. Oracle =
# UNION ALL of DuckDB level slices with the planned per-region bounds and
# width_ns stamped; the gap list is re-pinned per example. Catches region
# overlap (double-plotted buckets), wrong-level slicing, and width-column
# drift that the Q3 fuzzer's single merged aggregate would average away.
# ---------------------------------------------------------------------------

timeline_spec = st.fixed_dictionaries(
    {
        "metric": st.sampled_from([None, *EVENT_TYPES]),
        "h0": st.integers(0, 700),
        "span_h": st.integers(1, 400),
        "imax_i": st.integers(0, len(IMAX_GRID) - 1),
        "f0": st.one_of(st.none(), st.integers(-50, 720)),
        "f1": st.one_of(st.none(), st.integers(-50, 720)),
        "f2": st.one_of(st.none(), st.integers(-50, 720)),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=timeline_spec)
def test_random_tiered_timeline_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.plans.history import q1_regions_tiered

    start, end = _hta_range(spec)
    imax = IMAX_GRID[spec["imax_i"]]
    floors = {
        w: HTA_T0 + h * W0
        for w, h in zip(LEVEL_WIDTHS, (spec["f0"], spec["f1"], spec["f2"]))
        if h is not None
    }
    regions, gaps = q1_regions_tiered(start, end, LEVEL_WIDTHS, floors, imax)
    svc = hta_service(spark, sf_dir)
    df, rep_gaps = svc.timeline_tiered(
        spec["metric"], start, end, imax, floors
    )
    assert rep_gaps == gaps
    level_of = dict(zip(LEVEL_WIDTHS, ("level0", "level1", "level2")))
    mfilter = (
        "" if spec["metric"] is None else f"AND metric = '{spec['metric']}'"
    )
    parts = [
        f"""SELECT metric, bucket_start_ns, CAST({w} AS BIGINT) AS width_ns,
       minimum, maximum, CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM {level_of[w]}
WHERE bucket_start_ns >= {lo} AND bucket_start_ns < {hi} {mfilter}"""
        for w, lo, hi in regions
    ] or [
        # empty plan: an empty result with the full column set
        """SELECT metric, bucket_start_ns,
       CAST(0 AS BIGINT) AS width_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count", integral, active_time
FROM level0 WHERE FALSE"""
    ]
    sql = LEVELS_SQL + "\n" + "\nUNION ALL\n".join(parts)
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 15 (late r10): fleet pattern aggregate — random metric globs x
# hour-aligned ranges x level choices against a DuckDB LIKE+GROUP BY oracle.
# The glob set spans 0 matches (empty result), exactly-one (degenerate
# merge == plain Q1 row), subsets, all-metrics, '?' single-char wildcards,
# and an escaped-'_' literal that must NOT act as a wildcard.
# ---------------------------------------------------------------------------

#: glob -> the DuckDB LIKE pattern WITH explicit ESCAPE (DuckDB has no
#: default escape char; Spark's LIKE defaults to backslash — glob_to_like's
#: documented contract)
PATTERN_GRID = [
    "*",            # every metric
    "*u*",          # purchase, signup
    "*i*",          # click, signup, view
    "c*",           # click
    "?iew",         # view
    "s?gnup",       # signup
    "*r*",          # error, purchase
    "zz*",          # no match -> empty result
    "click_extra*", # literal '_' in the GLOB: escaped, matches nothing
]

pattern_spec = st.fixed_dictionaries(
    {
        "pat_i": st.integers(0, len(PATTERN_GRID) - 1),
        "h0": st.integers(0, 700),
        "span_h": st.integers(1, 400),
        "imax_i": st.integers(0, len(IMAX_GRID) - 1),
    }
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=pattern_spec)
def test_random_pattern_aggregate_matches_oracle(spark, duck, sf_dir, spec):
    from metricq_db_hta_spark.plans.history import glob_to_like
    from metricq_db_hta_spark.queries.hta_queries import _present

    start, end = _hta_range(spec)
    imax = IMAX_GRID[spec["imax_i"]]
    glob = PATTERN_GRID[spec["pat_i"]]
    svc = hta_service(spark, sf_dir)
    df = _present(svc.aggregate_timeline_pattern(glob, start, end, imax))
    # DuckDB keeps backslashes literal inside '' literals (verified:
    # SELECT 'a_b' LIKE 'a\_b' ESCAPE '\' is true) — only quotes need
    # doubling; doubling the backslash would turn the escape into a
    # literal-backslash-then-WILDCARD, silently widening the oracle
    like = glob_to_like(glob).replace("'", "''")
    sql = LEVELS_SQL + f"""
SELECT bucket_start_ns, COUNT(metric) AS n_metrics,
       MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral,
       {sql_bsum('active_time')} AS active_time
FROM level{_expected_level(imax)}
WHERE metric LIKE '{like}' ESCAPE '\\'
  AND bucket_start_ns >= {start} AND bucket_start_ns < {end}
GROUP BY 1
"""
    mismatch = oracle.compare(df, duck, sql)
    assert mismatch is None, (spec, glob, mismatch.kind, mismatch.detail)

    # whole-range companion (fleet Q3) on the same example: one merged
    # row through the cost-routed decomposition vs a finest-level
    # ungrouped DuckDB aggregate (incl. the empty-match single-NULL-row
    # shape, identical on both engines)
    df_q3 = _present(svc.aggregate_pattern(glob, start, end))
    sql_q3 = LEVELS_SQL + f"""
SELECT COUNT(DISTINCT metric) AS n_metrics,
       MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral,
       {sql_bsum('active_time')} AS active_time
FROM level0
WHERE metric LIKE '{like}' ESCAPE '\\'
  AND bucket_start_ns >= {start} AND bucket_start_ns < {end}
"""
    mismatch = oracle.compare(df_q3, duck, sql_q3)
    assert mismatch is None, (spec, glob, mismatch.kind, mismatch.detail)


# ---------------------------------------------------------------------------
# fuzz class 16 (r11): counter-family decomposition equivalences — random
# (possibly unaligned) ranges x output widths through the three serving
# plans. Property 1: the leveled coarse-interior/fine-edge decomposition
# (counter_rate_timeline_leveled) is bit-equal to the range-pruned raw
# scan. Property 2: stored attribution (counter_rate_timeline_stored)
# equals a direct groupBy of the per-sample stored increases over the
# range. Property 3: the fleet stored form equals the same computation
# merged across metrics. The DuckDB value oracle for the underlying
# semantics is the registry's hta_counter_rate/hta_counter_serve pair;
# this class pins that every SERVING plan is a faithful rewrite of it.
# ---------------------------------------------------------------------------

_COUNTER_FUZZ: dict = {}


def _counter_service(spark, sf_dir):
    from pyspark.sql import Window as _W

    from metricq_db_hta_spark.operators import hta as _hta
    from metricq_db_hta_spark.plans.history import HistoryService
    from metricq_db_hta_spark.queries.hta_queries import samples

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _COUNTER_FUZZ.get(key)
    if got is None:
        _COUNTER_FUZZ.clear()
        w = _W.partitionBy("metric").orderBy("ts_ns")
        raw = (
            samples(spark, sf_dir)
            .withColumn("prev_value", F.lag("value", 1).over(w))
            .localCheckpoint(eager=True)
        )
        counter = _hta.counter_level(raw, W0).localCheckpoint(eager=True)
        svc = HistoryService(raw=raw, levels={W0: counter})
        got = (svc, raw, counter)
        _COUNTER_FUZZ[key] = got
    return got


counter_spec = st.fixed_dictionaries(
    {
        "h0": st.integers(0, 700),
        "span_h": st.integers(1, 200),
        "jitter_lo": st.integers(0, W0 - 1),
        "jitter_hi": st.integers(0, W0 - 1),
        "width_i": st.integers(0, 3),
    }
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=counter_spec)
def test_random_counter_serving_plans_agree(spark, sf_dir, spec):
    from metricq_db_hta_spark.operators.hta import counter_increase_stored

    width = [W0, 2 * W0, 6 * W0, 24 * W0][spec["width_i"]]
    start = HTA_T0 + spec["h0"] * W0 + spec["jitter_lo"]
    end = start + spec["span_h"] * W0 + spec["jitter_hi"] - spec["jitter_lo"]
    if end <= start:
        end = start + 1
    svc, raw, counter = _counter_service(spark, sf_dir)

    def _same(a, b, what):
        cols = sorted(a.columns)
        assert sorted(b.columns) == cols, (what, a.columns, b.columns)
        d = (
            a.select(*cols).exceptAll(b.select(*cols))
            .unionAll(b.select(*cols).exceptAll(a.select(*cols)))
        )
        rows = d.limit(3).collect()
        assert not rows, (what, spec, rows)

    # P1: leveled == raw-scan form (range attribution)
    _same(
        svc.counter_rate_timeline_leveled(
            counter, W0, "click", start, end, width
        ),
        svc.counter_rate_timeline("click", start, end, width),
        "leveled vs raw",
    )

    inc = counter_increase_stored(
        raw.filter((F.col("ts_ns") >= start) & (F.col("ts_ns") < end))
    )
    aggs = [
        F.round(F.sum(F.col("increase").cast("decimal(38,6)")), 6)
        .cast("double")
        .alias("increase"),
        F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.round(
            F.sum(F.col("increase").cast("decimal(38,6)")).cast("double")
            / F.lit(width / 1e9),
            6,
        ).alias("rate_per_s"),
    ]
    bucket = (F.col("ts_ns") - F.col("ts_ns") % width).alias(
        "bucket_start_ns"
    )

    # P2: stored attribution == direct groupBy of stored increases
    got2, gaps2 = svc.counter_rate_timeline_stored(
        counter, W0, "click", start, end, width
    )
    assert gaps2 == []
    _same(
        got2,
        inc.filter(F.col("metric") == "click").groupBy("metric", bucket)
        .agg(*aggs),
        "stored vs direct",
    )

    # P3: fleet stored == the same, merged across metrics
    got3, gaps3 = svc.counter_rate_timeline_stored(
        counter, W0, None, start, end, width, pattern="*"
    )
    assert gaps3 == []
    want3 = (
        inc.groupBy(bucket)
        .agg(
            *aggs,
            F.count_distinct("metric").cast("long").alias("n_metrics"),
        )
        .withColumn("metric", F.lit("*"))
        .select(
            "metric", "bucket_start_ns", "increase", "n_resets",
            "rate_per_s", "n_metrics",
        )
    )
    _same(got3, want3, "fleet stored vs direct merge")


# ---------------------------------------------------------------------------
# fuzz class 17 (r12): mixed-generation counter stores — random interleavings
# of legacy batches (pre-r11 layout: data files WITHOUT prev_value) and
# modern backfills, x optional compaction, then fsck --repair
# (rebuild_levels). Oracle: the counter_<W0> table must equal the TRUE
# full-chain reference computed in plain Python from the generated sample
# stream (per-metric consecutive increases, reset = post-reset reading,
# first-ever sample NULL) — lossless where the store persisted prev_value,
# lag-recovered where files predate the column — and check_store must be
# green afterwards. Guards the r12 schema-pinned raw reads + lossless
# rebuild (sources/rawstore.py, fsck.rebuild_levels, hta.counter_level_rebuilt).
# ---------------------------------------------------------------------------

mixed_gen_spec = st.fixed_dictionaries(
    {
        "n_segments": st.integers(2, 4),
        "legacy_mask": st.integers(0, 15),  # bit i => segment i is legacy
        "per_seg": st.integers(6, 20),
        "step_a": st.integers(1, 40),
        "step_b": st.integers(1, 40),
        "mod_a": st.integers(25, 400),
        "mod_b": st.integers(25, 400),
        "spacing_i": st.integers(1, 30),
        "compact": st.booleans(),
    }
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=mixed_gen_spec)
def test_random_mixed_generation_counter_rebuild(spark, spec, tmp_path_factory):
    import shutil

    from metricq_db_hta_spark.operators import fsck as fsck_mod
    from metricq_db_hta_spark.operators import maintenance
    from metricq_db_hta_spark.queries.hta_queries import W0
    from metricq_db_hta_spark.sources.rawstore import read_raw
    from metricq_db_hta_spark.streaming import store_meta
    from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

    store = str(tmp_path_factory.mktemp("mixed_gen_store"))
    shutil.rmtree(store, ignore_errors=True)

    # deterministic two-metric counter stream: strictly increasing ts per
    # metric, integer values (exact in float), wrap-around resets
    spacing = W0 * spec["spacing_i"] // 7 + 1  # unaligned on purpose
    rows = []  # (metric, ts_ns, value, event_id)
    eid = 0
    for i in range(spec["n_segments"] * spec["per_seg"]):
        for m, step, mod in (
            ("cnt_a", spec["step_a"], spec["mod_a"]),
            ("cnt_b", spec["step_b"], spec["mod_b"]),
        ):
            rows.append((m, HTA_T0 + i * spacing, float((i * step) % mod), eid))
            eid += 1
    segs = [
        rows[k * 2 * spec["per_seg"]: (k + 1) * 2 * spec["per_seg"]]
        for k in range(spec["n_segments"])
    ]

    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    )
    for k, seg in enumerate(segs):
        # every segment index may be legacy, INCLUDING k==0 (ADVICE r12:
        # the old `k > 0` guard silently excluded the 'store begins with a
        # pre-r11 legacy batch' generation class) — the legacy writer
        # needed no prior store state, so neither does its emulation here
        if (spec["legacy_mask"] >> k) & 1:
            # pre-r11-shaped batch: same layout the old writer produced —
            # no prev_value column, no counter-cascade maintenance
            df = spark.createDataFrame(
                [(m, t, v, e, 0) for (m, t, v, e) in seg],
                "metric string, ts_ns long, value double, event_id long, "
                "delta_ns long",
            )
            bid = 10_000 + k
            (
                df.withColumn("ingest_batch", F.lit(bid))
                .withColumn(
                    "ts_month",
                    F.trunc(
                        F.to_date(
                            F.timestamp_micros(
                                (F.col("ts_ns") / 1000).cast("long")
                            )
                        ),
                        "month",
                    ),
                )
                .write.mode("append")
                .partitionBy("ingest_batch", "metric", "ts_month")
                .parquet(store_meta.raw_path(store))
            )
            store_meta.update_commit_marker(store, add={bid})
        else:
            svc.backfill(
                spark.createDataFrame(
                    seg, "metric string, ts_ns long, value double, event_id long"
                )
            )

    if spec["compact"]:
        maintenance.compact_raw(spark, store, min_batches=2)

    fsck_mod.rebuild_levels(spark, store)
    rep = fsck_mod.check_store(spark, store)
    assert rep.ok, (spec, [r for r in rep.levels if not r.ok])

    all_legacy = (
        spec["legacy_mask"] & ((1 << spec["n_segments"]) - 1)
        == (1 << spec["n_segments"]) - 1
    )
    if all_legacy:
        # a store written ENTIRELY by the pre-r11 writer never configured
        # counter maintenance, so no counter table exists and rebuild —
        # which discovers widths from the layout — must not invent one
        # (enabling counters on such a store is fuzz class 18's path)
        import os as _os

        assert not _os.path.isdir(f"{store}/counter_{W0}"), spec
        return

    # plain-Python full-chain reference
    expected: dict = {}
    prev: dict = {}
    for m, t, v, _e in sorted(rows, key=lambda r: (r[0], r[1])):
        p = prev.get(m)
        b = (m, t - t % W0)
        acc = expected.setdefault(b, [None, 0])
        if p is not None:
            inc = v - p if v >= p else v
            acc[0] = (acc[0] or 0.0) + inc
            acc[1] += 1 if v < p else 0
        prev[m] = v

    got = {
        (r["metric"], r["bucket_start_ns"]): (
            None if r["increase_sum"] is None else float(r["increase_sum"]),
            r["n_resets"],
        )
        for r in spark.read.parquet(f"{store}/counter_{W0}")
        .select("metric", "bucket_start_ns", "increase_sum", "n_resets")
        .collect()
    }
    want = {k: (v[0], v[1]) for k, v in expected.items()}
    assert got == want, (
        spec,
        {k: (got.get(k), want.get(k)) for k in set(got) ^ set(want) or list(want)[:3]},
    )

    # the schema-pinned reader surfaces prev_value NULL for legacy rows,
    # real for modern rows — never garbage, regardless of footer order
    raw = read_raw(spark, store)
    assert "prev_value" in raw.columns


# ---------------------------------------------------------------------------
# fuzz class 18 (r12): leveled-counter coverage guard — counter levels
# enabled LATE on a store with pre-existing raw (random split point, random
# month gap between the eras, random request ranges/widths, optionally
# healed by fsck.rebuild_levels). Property: the serve router's plain
# counter_rate answer equals the all-raw recompute
# (HistoryService.counter_rate_timeline) for EVERY enablement state and
# range — the guard must route pre-enablement months to the raw fallback,
# never serve them silently empty from level rows (the r11 ADVICE medium),
# and the healed store must answer identically from the fast path.
# ---------------------------------------------------------------------------

late_enable_spec = st.fixed_dictionaries(
    {
        "split_pct": st.integers(20, 80),
        "gap_months": st.integers(1, 3),
        "width_mult": st.sampled_from([1, 3, 24]),
        "jit_lo": st.integers(0, 3_600_000_000_000),
        "span_pct": st.integers(30, 100),
        "rebuild": st.booleans(),
    }
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=late_enable_spec)
def test_random_late_counter_enablement_serves_raw_truth(
    spark, sf_dir, spec, tmp_path_factory
):
    import shutil

    from metricq_db_hta_spark.operators.fsck import rebuild_levels
    from metricq_db_hta_spark.plans.serve import (
        HistoryServer,
        build_history_service,
    )
    from metricq_db_hta_spark.queries.hta_queries import W0, samples
    from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

    store_root = str(tmp_path_factory.mktemp("late_enable_fuzz"))
    store = store_root + "/store"
    shutil.rmtree(store, ignore_errors=True)

    src = samples(spark, sf_dir).orderBy("event_id").limit(1_000)
    rows = src.collect()
    cut = max(1, len(rows) * spec["split_pct"] // 100)
    early = spark.createDataFrame(rows[:cut], schema=src.schema)
    shift = spec["gap_months"] * 31 * 86_400 * 1_000_000_000
    late = spark.createDataFrame(
        rows[cut:] or rows[:1], schema=src.schema
    ).withColumn("ts_ns", (F.col("ts_ns") + F.lit(shift)).cast("long"))

    StreamingIngest(spark, store, level_widths_ns=(W0,)).backfill(early)
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    ).backfill(late)
    if spec["rebuild"]:
        rebuild_levels(spark, store)

    ts = sorted(
        r[0]
        for r in spark.read.parquet(f"{store}/raw")
        .filter("metric = 'click'")
        .select("ts_ns")
        .collect()
    )
    lo, hi = ts[0], ts[-1]
    width = W0 * spec["width_mult"]
    start = lo - lo % width + spec["jit_lo"] % width
    if start > lo:
        start -= width
    end = start + max(
        width, (hi - start) * spec["span_pct"] // 100 // width * width
    )

    srv = HistoryServer(spark, store, [W0])
    svc = build_history_service(spark, store)
    want = [
        r.asDict()
        for r in svc.counter_rate_timeline("click", start, end, width)
        .limit(100_000)
        .collect()
    ]
    got = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": width,
            "start_ns": start, "end_ns": end, "limit": 100_000,
        }
    )
    assert "error" not in got, (spec, got)
    assert got["rows"] == want, (
        spec,
        len(got["rows"]),
        len(want),
        got["rows"][:2],
        want[:2],
    )
