"""Relational declared queries (SURVEY §2 Part B) over the TPC-H-ish star
schema + events: scans, filters, every join type (incl. as-of and interval
overlap), aggregation variants (rollup/cube/grouping sets, distinct,
conditional), window functions, sort/limit, set ops, and the scalar function
families (string/date/math/json).

The reference implements none of these beyond its four history queries
(SURVEY §2 "not-implemented-by-reference") — they are engine surface that
arrives with Spark, declared here so the oracle pins their semantics.

Determinism: all wide double sums use the DECIMAL(38,6) accumulation rules
from queries/base.py; top-k queries carry a unique tie-breaker in ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.timeutil import ts_ns_auto
from metricq_db_hta_spark.operators.asof import asof_self_join_backward
from metricq_db_hta_spark.queries.base import (
    davg,
    dsum,
    mavg,
    msum,
    register,
    sql_davg,
    sql_dsum,
)
from metricq_db_hta_spark.sources.bucketed import bucketed_table
from metricq_db_hta_spark.sources.tables import load_table


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ts_ns_auto(e, "ts").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


#: lookback bound for rel_join_asof_tolerance (~27.8 h) — chosen to sit
#: near the median purchase->click gap at sf0.001 so both the kept and
#: nullified branches are exercised
ASOF_TOL_NS = 100_000_000_000_000

EVENTS_CTE = """
ev AS (
  SELECT event_id, epoch_ns(ts) AS ts_ns, user_id, event_type, value, props
  FROM events
)"""


# ---------------------------------------------------------------------------
# scans + filter + aggregate (TPC-H Q1 shape: the pricing summary)
# ---------------------------------------------------------------------------


@register(
    "rel_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H-Q1-shaped pricing summary: filtered scan + grouped "
    "aggregation with computed measures (HashAggregate, partial+final).",
    bench=True,
    static_plan=True,
    # (returnflag, linestatus) has ~6 groups at ANY scale; map-side
    # partials bound the exchange to 6 rows per scan task, so one reduce
    # task merges a few thousand rows even at 100 TB (pin sweep:
    # 0.269 -> 0.200 s resident at sf1)
    conf={"spark.sql.shuffle.partitions": "1"},
)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # SQL-text expressions: msum/mavg's fast path composes one F.expr
    # instead of ~15 py4j Column calls per measure (base.py _sql_of)
    disc_price = "l_extendedprice * (1 - l_discount)"
    charge = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # msum/mavg: money-grain columns (<= 6 decimal digits) take the
            # scaled-long exact sum — identical doubles to dsum/davg, no
            # per-row BigDecimal (see base.py)
            msum("l_quantity").alias("sum_qty"),
            msum("l_extendedprice").alias("sum_base_price"),
            msum(disc_price).alias("sum_disc_price"),
            msum(charge).alias("sum_charge"),
            mavg("l_quantity").alias("avg_qty"),
            mavg("l_extendedprice").alias("avg_price"),
            mavg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# multi-join pipelines (TPC-H Q3/Q5 shapes)
# ---------------------------------------------------------------------------


@register(
    "rel_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey, o_orderdate,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    # NOT reduce-side pinned (r13): the surviving (orderkey, date) group
    # count scales with the fact table — 4 tasks won 0.03 s at sf1 but
    # cost 0.10 s at sf10 (SCALE_SWEEP A/B); scale-growing reduces keep
    # the session partition count
    doc="TPC-H-Q3 shape: 3-way join, grouped revenue, deterministic top-10 "
    "(TakeOrderedAndProject), over BUCKETED fact storage (r8, same "
    "rationale as rel_q5): the orders⋈lineitem chain joins bucket-aligned "
    "with zero exchange; predicate pushdown applies to the bucketed scans "
    "unchanged. r9: the fact join is a bucket-aligned SHUFFLED-HASH join "
    "(hint) instead of sort-merge — Spark ignores the on-disk sortBy "
    "order (SPARK-28595) and re-sorted BOTH facts per query; hashing the "
    "filtered orders side deletes both Sort nodes (measured sf10 resident "
    "0.97 -> 0.67 s, sf1 0.223 -> 0.203 s, answers identical). The "
    "query-time shuffled path is pinned by rel_join_sortmerge, the "
    "purpose-built sentinel for that plan shape.",
    bench=True,
    static_plan=True,
)
def rel_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer is a dimension in this engine's data model (TESTDATA/
    # BASELINE recipe: dims stay broadcast-sized at scale by design), so
    # the segment-filtered side is an explicit broadcast — the AQE path
    # can only convert AFTER both map stages run, i.e. after the orders
    # shuffle write (the expensive part: measured 0.612 s shuffled vs
    # 0.148 s broadcast for this fragment at sf1) is already paid. If a
    # deployment's customer scaled with the fact chain, dropping the hint
    # degrades gracefully to the AQE-converted shuffle plan.
    #
    # The fact join builds the hash map on the date-filtered ORDERS side
    # (the provably smaller side: sf10 6.9M vs 33.6M rows), per bucket.
    # At 100 TB the build must fit executor memory: bucket count is sized
    # to ~128 MB-1 GB files (sources/bucketed.py), so a per-bucket orders
    # slice is bounded by layout; if a deployment can't bound it, drop
    # the hint and the planner falls back to the sort-merge plan.
    # r9 dim-pushdown (same move as rel_q5): the BUILDING-segment filter
    # keeps ~1/5 of customers, and joining it BEFORE the fact join
    # shrinks both the orders-side hash build and the join output 5x —
    # a map-side broadcast probe that preserves the bucket partitioning.
    # Measured sf1 resident 0.37 -> 0.26 s, sf10 0.78 -> 0.58 s, same
    # answers, still ZERO exchanges (EXCHANGE_BUDGET pin).
    c = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = bucketed_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = bucketed_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    o2 = o.join(c, o.o_custkey == c.c_custkey)
    oli = o2.hint("shuffle_hash").join(li, o2.o_orderkey == li.l_orderkey)
    return (
        oli.groupBy("l_orderkey", "o_orderdate")
        .agg(msum("l_extendedprice * (1 - l_discount)").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "rel_q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
    doc="TPC-H-Q5 shape: 6-way join with broadcast dims "
    "(customer/supplier/nation/region) + date-range filter + grouped "
    "revenue, over BUCKETED fact storage (r8): orders and lineitem are "
    "read from their bucketBy(32, orderkey) copies, so the fact chain "
    "joins bucket-aligned with zero exchange — the broadcast dim joins "
    "preserve the bucket partitioning, leaving only the 25-row n_name "
    "aggregation exchange. Measured sf1 resident 0.60 s vs 1.11 s flat; "
    "answers identical (the layout changes the physical plan only). r9: "
    "the fact join hashes instead of sort-merging (same rationale + "
    "measurements as rel_q3 — SPARK-28595 re-sorts are deleted). The "
    "query-time shuffled path stays pinned by rel_join_sortmerge.",
    bench=True,
    static_plan=True,
    # the single exchange is the n_name aggregation: <= 25 nation groups
    # at ANY scale, bounded map-side partials — one reduce task, not 32
    # scheduled for 25 rows (pin sweep: 0.446 -> 0.245 s resident at sf1)
    conf={"spark.sql.shuffle.partitions": "1"},
)
def rel_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # customer broadcast for the same reason as rel_q3: it is a declared
    # dimension table, and the static hint is the only way to skip the
    # orders-side shuffle write that AQE conversion would still pay.
    # Fact join: bucket-aligned shuffled-hash, building on the
    # date-filtered orders side (see rel_q3 sizing note).
    #
    # r9 dim-pushdown: the selective predicate in this query is
    # c_nationkey = s_nationkey (keeps ~1/|nation| of joined rows), and
    # it used to apply two broadcast joins AFTER the fact join — the
    # wide orders x lineitem output (27M rows at sf10) was fully
    # materialized first. Attaching c_nationkey to orders and
    # s_nationkey to lineitem (map-side broadcast probes, no row-count
    # change, bucketing preserved) lets the guard run INSIDE the fact
    # join's probe loop, so only the ~1/25 surviving rows materialize:
    # sf10 resident 2.14 -> 0.79 s, sf1 0.49 -> 0.39 s, same answers.
    # The guard is written (c_nationkey - s_nationkey) = 0 ON PURPOSE:
    # a bare attr = attr equality is extracted by ExtractEquiJoinKeys
    # into the join KEYS, which re-keys the hash partitioning to
    # (orderkey, nationkey) and breaks bucket alignment (measured: +2
    # fact exchanges, slower than the un-pushed plan); the arithmetic
    # form stays a non-equi join condition. Plan pinned: 1 exchange
    # (EXCHANGE_BUDGET), 1 ShuffledHashJoin, 4 broadcasts.
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    o = bucketed_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = bucketed_table(spark, sf_dir, "lineitem")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    o2 = o.join(c, o.o_custkey == c.c_custkey)
    li2 = li.join(s, li.l_suppkey == s.s_suppkey)
    oli = o2.hint("shuffle_hash").join(
        li2,
        (o2.o_orderkey == li2.l_orderkey)
        & ((F.col("c_nationkey") - F.col("s_nationkey")) == 0),
    )
    return (
        oli.join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(msum("l_extendedprice * (1 - l_discount)").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# join-type coverage
# ---------------------------------------------------------------------------


@register(
    "rel_join_broadcast_dim",
    oracle="""
SELECT r_name, COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    doc="Broadcast hash equi-join of small dims (the reference's A2 rename "
    "join is this exact shape).",
)
def rel_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
    )


@register(
    "rel_join_sortmerge",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
    doc="Large-side shuffled equi-join (sort-merge/shuffled-hash under AQE) "
    "orders x lineitem.",
    bench=True,
)
def rel_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            msum("l_extendedprice * (1 - l_discount)").alias("revenue"),
        )
    )


@register(
    "rel_join_left_outer",
    oracle=f"""
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_without_orders,
       {sql_dsum('COALESCE(o_totalprice, 0.0)')} AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
    doc="Left outer join preserving customers without orders + null-aware "
    "conditional aggregation.",
)
def rel_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_without_orders"),
            msum("coalesce(o_totalprice, 0.0D)").alias("total_spend"),
        )
    )


@register(
    "rel_join_semi",
    oracle="""
SELECT n_name, COUNT(*) AS n_big_spenders
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
GROUP BY n_name
""",
    doc="Left semi join: customers having at least one large order.",
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_big_spenders"))
    )


@register(
    "rel_join_anti",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_orderless
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
""",
    doc="Left anti join: customers with no orders at all.",
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orderless"))
    )


@register(
    "rel_join_full_outer",
    oracle="""
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00' GROUP BY 1
),
ld AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' GROUP BY 1
)
SELECT COALESCE(od.d, ld.d) AS d,
       COALESCE(n_orders, 0) AS n_orders, COALESCE(n_ships, 0) AS n_ships
FROM od FULL OUTER JOIN ld ON od.d = ld.d
""",
    doc="Full outer join of two daily aggregates with misses on both sides.",
)
def rel_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= cutoff)
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count("*").alias("n_orders"))
    )
    ld = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= cutoff)
        .groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.count("*").alias("n_ships"))
    )
    return od.join(ld, od.d == ld.d, "full").select(
        F.coalesce(od.d, ld.d).alias("d"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
    )


@register(
    "rel_join_range_band",
    oracle="""
SELECT p_brand, COUNT(*) AS n_matches
FROM lineitem JOIN part
  ON l_partkey = p_partkey AND l_quantity BETWEEN p_size - 5 AND p_size + 5
GROUP BY p_brand
""",
    doc="Mixed equi + band (range) join condition.",
)
def rel_join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_quantity >= p.p_size - 5)
            & (li.l_quantity <= p.p_size + 5),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_matches"))
    )


@register(
    "rel_join_interval_overlap",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
clicks AS (SELECT user_id, ts_ns FROM ev WHERE event_type = 'click'),
purch  AS (SELECT user_id, ts_ns, value FROM ev WHERE event_type = 'purchase')
SELECT c.user_id, COUNT(*) AS n_pairs,
       {sql_dsum('p.value')} AS purchase_value
FROM clicks c JOIN purch p
  ON c.user_id = p.user_id
 AND p.ts_ns >= c.ts_ns AND p.ts_ns < c.ts_ns + 86400000000000
GROUP BY c.user_id
""",
    doc="Interval-overlap join: purchases within 24h after each click of "
    "the same user (conjunctive range predicates).",
)
def rel_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_ns")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts_ns", "value")
        .withColumnRenamed("ts_ns", "p_ts_ns")
        .withColumnRenamed("user_id", "p_user_id")
    )
    day_ns = 86_400_000_000_000
    return (
        clicks.join(
            purch,
            (clicks.user_id == purch.p_user_id)
            & (purch.p_ts_ns >= clicks.ts_ns)
            & (purch.p_ts_ns < clicks.ts_ns + day_ns),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"), dsum("value").alias("purchase_value"))
    )


@register(
    "rel_join_asof",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
purch  AS (SELECT event_id, user_id, ts_ns, value FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts_ns AS click_ts_ns, value AS click_value FROM ev
           WHERE event_type = 'click'
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts_ns
                                      ORDER BY event_id DESC) = 1)
SELECT p.event_id, p.user_id, p.ts_ns, p.value, c.click_ts_ns, c.click_value
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_ns >= c.click_ts_ns
""",
    doc="As-of join (backward, inclusive): each purchase matched to the "
    "same user's most recent click at-or-before it, equal-(user, ts) "
    "clicks deduped to the greatest event_id. Spark side uses the fused "
    "same-source form (operators/asof.py asof_self_join_backward: one "
    "scan, ONE exchange); oracle uses native ASOF JOIN.",
    bench=True,
    static_plan=True,
    # the union trick's ONE exchange carries |events-in-window| rows into
    # a per-user window; 8 reduce tasks beat 32 at sf1 (0.14 vs 0.19 s
    # resident, r13 A/B — launch floor). Venue latency pin.
    conf={"spark.sql.shuffle.partitions": "8"},
)
def rel_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    return asof_self_join_backward(
        ev,
        by=["user_id"],
        ts_col="ts_ns",
        probe_pred=F.col("event_type") == "purchase",
        ref_pred=F.col("event_type") == "click",
        right_payload={"click_ts_ns": "ts_ns", "click_value": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns", "value"],
    )


@register(
    "rel_join_asof_tolerance",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
purch  AS (SELECT event_id, user_id, ts_ns, value FROM ev WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts_ns AS click_ts_ns, value AS click_value FROM ev
           WHERE event_type = 'click'
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts_ns
                                      ORDER BY event_id DESC) = 1)
SELECT p.event_id, p.user_id, p.ts_ns, p.value,
       CASE WHEN p.ts_ns - c.click_ts_ns <= {ASOF_TOL_NS} THEN c.click_ts_ns END
         AS click_ts_ns,
       CASE WHEN p.ts_ns - c.click_ts_ns <= {ASOF_TOL_NS} THEN c.click_value END
         AS click_value
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts_ns >= c.click_ts_ns
""",
    doc="As-of join with a lookback TOLERANCE (pandas merge_asof "
    "tolerance= semantics): a most-recent click older than ~28h before "
    "the purchase is nullified. Implemented as a post-projection on the "
    "fused one-exchange operator (operators/asof.py tolerance_ns); the "
    "oracle wraps native ASOF JOIN in the same CASE.",
)
def rel_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    return asof_self_join_backward(
        ev,
        by=["user_id"],
        ts_col="ts_ns",
        probe_pred=F.col("event_type") == "purchase",
        ref_pred=F.col("event_type") == "click",
        right_payload={"click_ts_ns": "ts_ns", "click_value": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns", "value"],
        tolerance_ns=ASOF_TOL_NS,
        payload_ts="click_ts_ns",
    )


@register(
    "rel_join_asof_forward",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
clicks AS (SELECT event_id, user_id, ts_ns, value FROM ev WHERE event_type = 'click'),
purch  AS (SELECT user_id, ts_ns AS purchase_ts_ns, value AS purchase_value FROM ev
           WHERE event_type = 'purchase'
           QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts_ns
                                      ORDER BY event_id DESC) = 1)
SELECT c.event_id, c.user_id, c.ts_ns, c.value, p.purchase_ts_ns, p.purchase_value
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts_ns <= p.purchase_ts_ns
""",
    doc="As-of join, FORWARD direction (inclusive): each click matched to "
    "the same user's earliest purchase at-or-after it, equal-(user, ts) "
    "purchases deduped to the greatest event_id. Spark side mirrors the "
    "fused backward operator with the sort direction flipped "
    "(operators/asof.py asof_self_join_forward: one scan, ONE exchange); "
    "oracle uses DuckDB's native ASOF with the <= ordering.",
)
def rel_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.operators.asof import asof_self_join_forward

    ev = events_df(spark, sf_dir)
    return asof_self_join_forward(
        ev,
        by=["user_id"],
        ts_col="ts_ns",
        probe_pred=F.col("event_type") == "click",
        ref_pred=F.col("event_type") == "purchase",
        right_payload={"purchase_ts_ns": "ts_ns", "purchase_value": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns", "value"],
    )


# ---------------------------------------------------------------------------
# aggregation variants
# ---------------------------------------------------------------------------


@register(
    "rel_agg_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
    doc="Distinct aggregation (expand + two-phase agg in Spark).",
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "rel_agg_approx_distinct",
    # HLL sketches differ across engines by construction, so the raw
    # estimate is unhashable — instead the query outputs the EXACT distinct
    # count (hash-verified) plus a boolean asserting the HLL++ estimate
    # lands within a 5% relative-error band, which the oracle pins to TRUE.
    # A broken sketch now fails the driver gate instead of being
    # unfalsifiable (round-1 "What's wrong" #8).
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
    doc="approx_count_distinct (HyperLogLog++) checked against the exact "
    "distinct count: the driver verifies exact_users by value and the "
    "within-5%-band flag by assertion. rsd is pinned to 0.01 so the 5% "
    "band is a 5-sigma envelope: the DEFAULT rsd 0.05 means 5% is ONE "
    "standard error, and the sketch genuinely exceeded it at sf0.1 "
    "(measured 6.67% at 1500 distinct users) — a flaky assertion, not a "
    "broken sketch.",
)
def rel_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    exact = F.count_distinct(F.col("user_id"))
    approx = F.approx_count_distinct("user_id", 0.01)
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@register(
    "rel_agg_rollup",
    oracle=f"""
SELECT n_name, c_mktsegment, COUNT(*) AS n_customers,
       {sql_dsum('c_acctbal')} AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
""",
    doc="GROUP BY ROLLUP over two dimensions (the HTA level hierarchy is "
    "the time-axis analogue of this, materialized eagerly — SURVEY A5).",
)
def rel_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_customers"), msum("c_acctbal").alias("total_balance"))
    )


@register(
    "rel_agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    doc="GROUP BY CUBE over two dimensions.",
)
def rel_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@register(
    "rel_agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
    doc="Explicit GROUPING SETS (SQL path through spark.sql).",
)
def rel_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@register(
    "rel_agg_conditional",
    oracle=f"""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       {sql_dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS open_value
FROM orders GROUP BY o_orderpriority
""",
    doc="Conditional aggregation (reference A14's counter pattern: "
    "/root/reference/src/db_stats.cpp:35-115).",
)
def rel_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_large"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_finished"),
        msum(
            "CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0D END"
        ).alias("open_value"),
    )


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@register(
    "rel_window_rank_topn",
    oracle="""
SELECT n_name, c_name, c_acctbal, rn, rnk, drnk
FROM (
  SELECT n_name, c_name, c_acctbal,
         ROW_NUMBER() OVER w AS rn,
         RANK() OVER w AS rnk,
         DENSE_RANK() OVER w AS drnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
) t WHERE rn <= 3
""",
    doc="Ranking window functions + top-N per group (deterministic "
    "tie-break on c_custkey).",
)
def rel_window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "c_name",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "rel_window_lag_lead",
    oracle=f"""
WITH {EVENTS_CTE.strip()}
SELECT event_id, user_id, ts_ns, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       ts_ns - LAG(ts_ns) OVER w AS gap_ns
FROM ev
WHERE user_id < 5
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
""",
    doc="Analytic lag/lead over per-entity time order (reference A12's "
    "delta encoding is this operator).",
)
def rel_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir).filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts_ns",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("ts_ns") - F.lag("ts_ns").over(w)).alias("gap_ns"),
    )


@register(
    "rel_window_moving_agg",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
       COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_n
FROM orders
""",
    doc="Sliding-frame window aggregate (ROWS BETWEEN), decimal-exact sum.",
)
def rel_window_moving_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("moving_sum"),
        F.count("*").over(w).alias("moving_n"),
    )


@register(
    "rel_window_range_between",
    oracle=f"""
WITH {EVENTS_CTE.strip()}
SELECT event_id, event_type, ts_ns,
       COUNT(*) OVER (
           PARTITION BY event_type ORDER BY ts_ns
           RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW) AS n_last_hour
FROM ev
""",
    doc="RANGE BETWEEN window on the ns time axis: per-metric sliding count "
    "over the trailing hour.",
)
def rel_window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_ns")
        .rangeBetween(-3_600_000_000_000, 0)
    )
    return ev.select(
        "event_id", "event_type", "ts_ns", F.count("*").over(w).alias("n_last_hour")
    )


@register(
    "rel_window_ntile",
    oracle="""
SELECT o_orderkey, o_totalprice,
       NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
""",
    doc="NTILE bucketing over a global order (deterministic tie-break), "
    "computed scale-safe: distributed range sort + per-partition offsets "
    "instead of a single-partition global window.",
)
def rel_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.operators.ranking import distributed_ntile

    o = load_table(spark, sf_dir, "orders")
    out = distributed_ntile(
        o.select("o_orderkey", "o_totalprice"),
        4,
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        out_col="quartile",
    )
    return out.select("o_orderkey", "o_totalprice", "quartile")


# ---------------------------------------------------------------------------
# sort / limit, set ops
# ---------------------------------------------------------------------------


@register(
    "rel_topk",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
""",
    doc="Global top-k (TakeOrderedAndProject — no full sort at scale).",
)
def rel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(25)
    )


@register(
    "rel_join_lateral",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN t.top_price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_no_lineitems,
       CAST(SUM(CAST(round(t.top_price * 100) AS BIGINT)) AS BIGINT)
           AS sum_top_cents
FROM orders o
LEFT JOIN LATERAL (SELECT MAX(l.l_extendedprice) AS top_price
                   FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey) t ON TRUE
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    doc="LATERAL correlated subquery (per-order top lineitem price): "
    "Catalyst decorrelates the lateral aggregate into a plain "
    "aggregate-then-join — the scale-safe plan — rather than re-executing "
    "the subquery per outer row. LEFT JOIN LATERAL explicitly (not the "
    "comma form): DuckDB decorrelates comma-LATERAL to an INNER join and "
    "drops outer rows with no match, Spark keeps the standard one-row "
    "empty aggregate — the explicit join pins identical semantics. Money "
    "sums ride the scaled-cents trick (queries/base.py float rules).",
)
def rel_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__lat_lineitem"
    )
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN t.top_price IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_no_lineitems,
               CAST(SUM(CAST(rint(t.top_price * 100) AS BIGINT)) AS BIGINT)
                   AS sum_top_cents
        FROM __lat_orders o
        LEFT OUTER JOIN LATERAL
            (SELECT MAX(l.l_extendedprice) AS top_price
             FROM __lat_lineitem l
             WHERE l.l_orderkey = o.o_orderkey) t
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@register(
    "rel_unpivot",
    oracle="""
SELECT measure, COUNT(*) AS n,
       ROUND(SUM(val), 2) AS total, ROUND(MIN(val), 2) AS lo,
       ROUND(MAX(val), 2) AS hi
FROM (
  SELECT l_orderkey, 'quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'tax', l_tax FROM lineitem
) t GROUP BY measure
""",
    doc="UNPIVOT / melt: wide measure columns to (measure, value) rows via "
    "Spark's native unpivot (Expand node — one pass over the scan, no "
    "self-union re-reads), re-aggregated per measure. The oracle spells "
    "the same relation as a UNION ALL, the portable equivalent.",
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    ).withColumn(
        "measure",
        F.element_at(F.split(F.col("measure"), "_", 2), 2),
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.min("val"), 2).alias("lo"),
        F.round(F.max("val"), 2).alias("hi"),
    )


@register(
    "rel_window_distribution",
    # Exact-integer projection of the distribution functions:
    # percent_rank = (rank-1)/(n-1) lands EXACTLY on .5 boundaries of any
    # fixed rounding grain whenever (n-1) divides a power of 10 times an
    # odd multiple (found at sf0.1: nation partitions of 1281 rows give
    # k/1280 = ...0625, where Spark's BigDecimal HALF_UP and DuckDB's
    # fl(x*1e6)-based round disagree by 1 ulp of the grain). Multiplying
    # back by (n-1)/n recovers the integer numerators exactly (double
    # error ≤ a few ulps, never near .5), so the native percent_rank/
    # cume_dist paths are still what is exercised while the compared
    # values are integers on both engines.
    oracle="""
SELECT c_custkey, c_nationkey,
       CAST(ROUND(PERCENT_RANK() OVER w
                  * (COUNT(*) OVER (PARTITION BY c_nationkey) - 1))
            AS BIGINT) AS pr_num,
       CAST(ROUND(CUME_DIST() OVER w
                  * COUNT(*) OVER (PARTITION BY c_nationkey))
            AS BIGINT) AS cume_num,
       COUNT(*) OVER (PARTITION BY c_nationkey) AS n_part
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
""",
    doc="Distribution window functions (percent_rank + cume_dist) per "
    "nation partition with a total tie order — the remaining ranking-"
    "family surface beyond rank/dense_rank/ntile. Compared as exact "
    "integer numerators (x partition size) for cross-engine stability.",
)
def rel_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("c_nationkey")
    n_part = F.count("*").over(wp)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w) * (n_part - 1))
        .cast("long")
        .alias("pr_num"),
        F.round(F.cume_dist().over(w) * n_part).cast("long").alias("cume_num"),
        n_part.alias("n_part"),
    )


@register(
    "rel_set_union",
    oracle="""
SELECT user_id, COUNT(*) AS n FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id FROM events WHERE event_type = 'view'
) t GROUP BY user_id
""",
    doc="UNION ALL + re-aggregation.",
)
def rel_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    return clicks.union(views).groupBy("user_id").agg(F.count("*").alias("n"))


@register(
    "rel_set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    doc="INTERSECT (distinct) — users who both clicked and purchased.",
)
def rel_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(purch)


@register(
    "rel_set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
    doc="EXCEPT (distinct) — users who viewed but never purchased.",
)
def rel_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return views.subtract(purch)


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------


@register(
    "rel_string_funcs",
    oracle="""
SELECT p_partkey, p_name,
       UPPER(p_name) AS name_upper,
       SUBSTR(p_name, 1, 5) AS name_prefix,
       LENGTH(p_name) AS name_len,
       LEN(STRING_SPLIT(p_name, ' ')) AS n_tokens,
       LEVENSHTEIN(p_name, 'small widget') AS lev_dist,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       REPLACE(p_name, ' ', '_') AS name_snake
FROM part
WHERE p_name LIKE '%widget%'
""",
    doc="String scalar family: case, substring, length, split-count, "
    "levenshtein, concat, replace, LIKE predicate.",
)
def rel_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey",
        "p_name",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_tokens"),
        F.levenshtein(F.col("p_name"), F.lit("small widget"))
        .cast("long")
        .alias("lev_dist"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@register(
    "rel_date_funcs",
    oracle="""
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
       CAST(MONTH(o_orderdate) AS INTEGER) AS order_mm,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2, 3
""",
    doc="Date/time scalar family: truncation + field extraction + grouping "
    "by derived time keys.",
)
def rel_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_mm"),
    ).agg(F.count("*").alias("n_orders"))


@register(
    "rel_math_funcs",
    oracle="""
SELECT c_custkey, c_acctbal,
       ROUND(ABS(c_acctbal), 2) AS abs_bal,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
       ROUND(LN(ABS(c_acctbal) + 1), 6) AS ln_bal,
       ROUND(POWER(c_acctbal / 1000.0, 2), 6) AS sq_kbal,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS bal_sign
FROM customer
""",
    doc="Math scalar family: abs/round/sqrt/ln/power/sign (transcendentals "
    "rounded to 6 — engine libm may differ in the last ulp).",
)
def rel_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.round(F.abs(bal), 2).alias("abs_bal"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("ln_bal"),
        F.round(F.pow(bal / 1000.0, 2), 6).alias("sq_kbal"),
        F.signum(bal).cast("double").alias("bal_sign"),
    )


@register(
    "rel_json_funcs",
    oracle=f"""
WITH {EVENTS_CTE.strip()}
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS n
FROM ev GROUP BY event_type
""",
    doc="JSON scalar access over the events.props column "
    "(get_json_object / json_extract).",
)
def rel_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_df(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count("*").alias("n"),
    )


@register(
    "rel_subquery_scalar_exists",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_above_avg
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
""",
    doc="Scalar subquery + correlated EXISTS (Catalyst decorrelation).",
)
def rel_subquery_scalar_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_above_avg
        FROM v_customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM v_customer)
          AND EXISTS (SELECT 1 FROM v_orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment
        """
    )


@register(
    "rel_subquery_correlated_scalar",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(38,6))
      * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(38,6)))
       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
""",
    doc="CORRELATED scalar subqueries (per-row aggregate over the outer "
    "row's group — Catalyst's DecorrelateInnerQuery rewrites both into "
    "one grouped aggregate + join): orders strictly above their own "
    "customer's average order total. The avg comparison is cross-"
    "multiplied into DECIMAL-exact price*count > sum so the boundary "
    "rows cannot flip between engines the way a float average could.",
)
def rel_subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_c")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders_c o
        WHERE CAST(o_totalprice AS DECIMAL(38,6))
              * (SELECT COUNT(*) FROM v_orders_c o2
                 WHERE o2.o_custkey = o.o_custkey)
            > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(38,6)))
               FROM v_orders_c o3 WHERE o3.o_custkey = o.o_custkey)
        """
    )


@register(
    "rel_having",
    oracle=f"""
SELECT l_suppkey, COUNT(*) AS n_lines, {sql_dsum('l_quantity')} AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 10
""",
    doc="Grouped aggregation with HAVING post-filter.",
)
def rel_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_lines"), msum("l_quantity").alias("total_qty"))
        .filter(F.col("n_lines") > 10)
    )
