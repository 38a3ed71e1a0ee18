"""Additional TPC-H-shaped relational queries (Q6/Q10/Q18 shapes).

These widen the declared surface over the shapes the first batch
(`relational.py` Q1/Q3/Q5) does not cover:

* Q6  — predicate-only scan feeding an ungrouped scalar aggregate: the
  purest pushdown test (every filter must reach the parquet scan; no
  shuffle at all beyond the final partial-merge).
* Q10 — a 4-table join pipeline that, unlike Q3/Q5, keys the final
  aggregate on the *customer* grain, so the customer relation is part of
  the aggregation key, not just a filter dim.
* Q18 — aggregate-then-join: a HAVING-filtered aggregate over the fact
  table reused as a semi-join filter against the same fact. Exercises the
  "build a keyset from an aggregation, then re-join it" shape the other
  queries don't.

All money sums use the scaled-long exact sum (`base.msum`) so the doubles
are bit-identical to the DuckDB oracle's DECIMAL(38,6) accumulation and the
ORDER BY ... LIMIT tie-breaking is deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.queries.base import (
    dsum,
    msum,
    register,
    sql_dsum,
)
from metricq_db_hta_spark.sources.bucketed import bucketed_table
from metricq_db_hta_spark.sources.tables import load_table


@register(
    "rel_q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H-Q6-shaped forecast-revenue-change: conjunctive range "
    "predicates feeding an ungrouped scalar aggregate. All four filters "
    "must reach the parquet scan (PushedFilters); no exchange beyond the "
    "single-row partial merge.",
)
def rel_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # BETWEEN on the stored doubles: both engines compare the identical
    # parquet-resident values against the same parsed literals, so the
    # row set agrees exactly; the product is money-grain (2dp x 2dp).
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            msum("l_extendedprice * l_discount").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "rel_q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1999-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H-Q10-shaped returned-item report: 4-table join keyed on the "
    "customer grain, ordered top-20 by lost revenue. Reference parity: the "
    "multi-input join pipelines of metricq's history service have no "
    "customer-grain analog; this is engine surface beyond the reference.",
)
def rel_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlike Q3/Q5 (customer used only as a filter -> broadcast it), Q10
    aggregates ON customer attributes, so customer rows flow through the
    aggregate. nation is the only always-tiny dim -> explicit broadcast;
    the orders⋈customer join is left to AQE's runtime-size planning
    because at 100 TB customer is fact-scale and must shuffle (the
    o_orderdate quarter filter shrinks orders first, so the shuffle
    carries one quarter of orders, not the full table)."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    revenue = "l_extendedprice * (1 - l_discount)"
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(msum(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        # msum == oracle's decimal sum bit-for-bit, so the revenue sort key
        # agrees; c_custkey breaks exact-revenue ties deterministically.
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "rel_q18_large_volume_customer",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 200
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       {sql_dsum('l_quantity')} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    doc="TPC-H-Q18-shaped large-volume-customer: HAVING-filtered aggregate "
    "over the fact builds a keyset that semi-joins back against the same "
    "fact (aggregate-then-rejoin shape).",
)
def rel_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `big` keyset is an aggregation of lineitem on l_orderkey; the
    outer pipeline joins lineitem⋈orders on the same key. Spark plans both
    aggregations over one l_orderkey hash partitioning, so the semi join is
    exchange-free on the probe side; the keyset (orders exceeding the
    quantity threshold — rare by construction) is broadcast by AQE at any
    realistic selectivity. At 100 TB nothing here materializes more than
    |lineitem| shuffled once on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    # sum(l_quantity) is money-grain (integral-valued doubles <= 50), so the
    # HAVING threshold compares exact sums on both engines.
    big = (
        li.groupBy("l_orderkey")
        .agg(msum("l_quantity").alias("order_qty"))
        .filter(F.col("order_qty") > 200)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(msum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "rel_agg_statistical",
    oracle=f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         {sql_dsum('l_quantity')} AS sx,
         {sql_dsum('l_quantity * l_quantity')} AS sxx,
         {sql_dsum('l_extendedprice')} AS sy,
         {sql_dsum('l_extendedprice * l_extendedprice')} AS syy,
         {sql_dsum('l_quantity * l_extendedprice')} AS sxy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
       ROUND(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS qty_stddev,
       ROUND((sxx - sx * sx / n) / (n - 1), 6) AS qty_var,
       ROUND((sxy - sx * sy / n) / (n - 1), 6) AS qty_price_covar,
       ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS qty_price_corr
FROM m
""",
    doc="Statistical aggregates (stddev_samp/var_samp/covar_samp/corr) "
    "per group, formulated from EXACT decimal moments (n, Σx, Σx², Σxy) "
    "rather than the engines' built-in accumulators: the builtins merge "
    "float partials in nondeterministic order (Spark) and with different "
    "update formulas (Welford vs naive), so their last-ulp results "
    "diverge across engines and even across runs. Exact moments make "
    "the derived statistics bit-identical everywhere; the moment "
    "aggregation is the same single-pass grouped-hash shape as any sum. "
    "Moment envelopes (round-8 ADVICE fix): x = l_quantity <= 50, so "
    "x*x and x*y stay well inside msum's scaled-long range (y*x <= 5e6 "
    "scales to 5e12 < 2^53). y*y is the exception: ~1e10 scales to "
    "~1e16 > 2^53, where fl(d*1e6) has ulp 2 and rint can differ from "
    "the oracle's exact CAST(d AS DECIMAL(38,6)) by ~2e-6/row — so syy "
    "alone uses dsum (per-row decimal cast), byte-matching sql_dsum.",
)
def rel_agg_statistical(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        msum("l_quantity").alias("sx"),
        msum("l_quantity * l_quantity").alias("sxx"),
        msum("l_extendedprice").alias("sy"),
        # y*y ~ 1e10 overflows msum's 2^53 scaled-long envelope (see the
        # registry doc) — exact decimal cast per row for this moment only.
        dsum("l_extendedprice * l_extendedprice").alias("syy"),
        msum("l_quantity * l_extendedprice").alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        "n",
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 6).alias("qty_stddev"),
        F.round((sxx - sx * sx / n) / (n - 1), 6).alias("qty_var"),
        F.round((sxy - sx * sy / n) / (n - 1), 6).alias("qty_price_covar"),
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("qty_price_corr"),
    )


@register(
    "rel_join_bucketed",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
    doc="The rel_join_sortmerge query over BUCKETED storage: both facts "
    "persisted bucketBy(32, orderkey).sortBy(orderkey), so the equi-join "
    "plans with ZERO Exchange — the layout answer to the shuffled-join "
    "exchange tax quantified in BASELINE.md. r9: the join is a "
    "bucket-aligned SHUFFLED-HASH join (hint, build on the smaller "
    "orders side) instead of sort-merge — Spark re-sorts both bucketed "
    "scans for SMJ despite the on-disk sortBy order (SPARK-28595), and "
    "hashing deletes both Sort nodes (see rel_q3 for measurements and "
    "the 100 TB build-side sizing note). Identical oracle to "
    "rel_join_sortmerge: same rows, different physical strategy "
    "(tests/test_bucketing.py pins the exchange-free hash plan; this "
    "registry entry makes it driver-verified and benchmarked).",
    bench=True,
    static_plan=True,
    # the join itself is bucket-aligned (zero exchange); the pin sizes
    # only the 3-group status aggregation's reduce side — 8 tasks vs 32
    # saves launch floor (0.21 vs 0.27 s sf1 resident, r13 A/B)
    conf={"spark.sql.shuffle.partitions": "8"},
)
def rel_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = bucketed_table(spark, sf_dir, "orders")
    li = bucketed_table(spark, sf_dir, "lineitem")
    return (
        o.hint("shuffle_hash")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            msum("l_extendedprice * (1 - l_discount)").alias("revenue"),
        )
    )


@register(
    "rel_recursive_cte",
    oracle="""
WITH RECURSIVE anc(suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
  UNION ALL
  SELECT suppkey, ancestor // 2, depth + 1 FROM anc WHERE ancestor > 1
)
SELECT suppkey, ancestor, depth FROM anc
""",
    doc="Recursive CTE (Spark 4.x WITH RECURSIVE): walk every supplier's "
    "ancestor chain in the implicit binary-heap hierarchy parent(k) = "
    "k DIV 2 up to the root, emitting (suppkey, ancestor, depth) — the "
    "transitive-closure shape (org charts, BOM explosion, thread trees) "
    "the rest of the surface only reaches via the iterative driver loop "
    "in operators/dedup.py::neardup_clusters. Scale shape: each "
    "iteration is one codegen projection+filter over the previous "
    "frontier (|S| rows), depth is log2(max key), and the union of "
    "frontiers never materializes on the driver; recursion over an "
    "ACYCLIC parent function terminates structurally (cyclic graphs "
    "need the label-propagation operator instead).",
)
def rel_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier_rec")
    return spark.sql(
        """
WITH RECURSIVE anc(suppkey, ancestor, depth) AS (
  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM v_supplier_rec
  UNION ALL
  SELECT suppkey, ancestor DIV 2, depth + 1 FROM anc WHERE ancestor > 1
)
SELECT suppkey, ancestor, depth FROM anc
"""
    )
