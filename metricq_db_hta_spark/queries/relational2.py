"""Second wave of relational coverage (SURVEY §2 Part B rows): session
windows (gap-based), native tumbling + sliding time windows, exact
percentiles, pivot, grouping indicators, date arithmetic, null-handling
functions, array functions, and cross join.

Session-window note: Spark's ``F.session_window`` merges events whose
``[ts, ts+gap)`` intervals overlap; with per-key time-sorted data that is
exactly "new session when ts - prev_ts >= gap", which is how the DuckDB
oracle emulates it (lag + cumulative sum over the session-break flag).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.queries.base import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from metricq_db_hta_spark.queries.relational import EVENTS_CTE, events_df
from metricq_db_hta_spark.sources.tables import load_table

HOUR_NS = 3_600_000_000_000
DAY_NS = 86_400_000_000_000


@register(
    "rel_session_window",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
flagged AS (
  SELECT user_id, ts_ns,
         CASE WHEN ts_ns - LAG(ts_ns) OVER w >= {6 * HOUR_NS}
              OR LAG(ts_ns) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns)
),
sessions AS (
  SELECT user_id, ts_ns,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts_ns) AS session_start_ns, COUNT(*) AS n_events,
       MAX(ts_ns) - MIN(ts_ns) AS span_ns
FROM sessions GROUP BY user_id, session_id
""",
    doc="Gap-based sessionization (6h gap): Spark F.session_window vs the "
    "lag+cumsum SQL emulation — identical session boundaries for "
    "time-sorted keys.",
)
def rel_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.functions.timeutil import ns_to_timestamp

    ev = events_df(spark, sf_dir).withColumn("ts", ns_to_timestamp("ts_ns"))
    out = (
        ev.groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(
            F.min("ts_ns").alias("session_start_ns"),
            F.count("*").alias("n_events"),
            (F.max("ts_ns") - F.min("ts_ns")).alias("span_ns"),
        )
        .drop("session_window")
    )
    return out


@register(
    "rel_window_tumbling_native",
    oracle=f"""
WITH {EVENTS_CTE.strip()}
SELECT event_type,
       ts_ns - ts_ns % {DAY_NS} AS window_start_ns,
       COUNT(*) AS n, {sql_dsum('value')} AS total
FROM ev GROUP BY 1, 2
""",
    doc="Native F.window tumbling aggregation (the streaming-compatible "
    "form of the HTA level-0 bucketing; epoch-aligned 1-day windows).",
)
def rel_window_tumbling_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.functions.timeutil import ns_to_timestamp

    ev = events_df(spark, sf_dir).withColumn("ts", ns_to_timestamp("ts_ns"))
    return (
        ev.groupBy("event_type", F.window("ts", "1 day"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            "event_type",
            (F.unix_micros(F.col("window.start")) * 1000).alias("window_start_ns"),
            "n",
            "total",
        )
    )


@register(
    "rel_window_sliding_native",
    oracle=f"""
WITH {EVENTS_CTE.strip()},
starts AS (
  SELECT event_type, value,
         unnest([ts_ns - ts_ns % {DAY_NS}, ts_ns - ts_ns % {DAY_NS} - {DAY_NS}])
             AS window_start_ns
  FROM ev
)
SELECT event_type, window_start_ns, COUNT(*) AS n
FROM starts GROUP BY 1, 2
""",
    doc="Sliding time window (2-day width, 1-day slide): each event lands "
    "in two windows; oracle replicates rows per candidate window start.",
)
def rel_window_sliding_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.functions.timeutil import ns_to_timestamp

    ev = events_df(spark, sf_dir).withColumn("ts", ns_to_timestamp("ts_ns"))
    return (
        ev.groupBy("event_type", F.window("ts", "2 days", "1 day"))
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            (F.unix_micros(F.col("window.start")) * 1000).alias("window_start_ns"),
            "n",
        )
    )


@register(
    "rel_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       ROUND(MAX(l_extendedprice), 6) AS p100
FROM lineitem GROUP BY l_returnflag
""",
    doc="Exact linear-interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont), rounded to 6.",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(p, F.lit(0.25)), 6).alias("p25"),
        F.round(F.percentile(p, F.lit(0.50)), 6).alias("p50"),
        F.round(F.percentile(p, F.lit(0.75)), 6).alias("p75"),
        F.round(F.max(p), 6).alias("p100"),
    )


@register(
    "rel_pivot",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
FROM orders GROUP BY o_orderpriority
""",
    doc="Pivot (explicit value list -> conditional aggregation columns).",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .fillna(0, subset=["F", "O", "P"])
    )


@register(
    "rel_grouping_id",
    oracle="""
SELECT n_name, c_mktsegment,
       CAST(GROUPING(n_name, c_mktsegment) AS INTEGER) AS gid,
       COUNT(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
""",
    doc="ROLLUP with GROUPING() bitmask indicator distinguishing "
    "subtotal rows from genuine NULL groups.",
)
def rel_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n"),
        )
        .select("n_name", "c_mktsegment", "gid", "n")
    )


@register(
    "rel_date_arithmetic",
    oracle=f"""
SELECT o_orderpriority,
       {sql_davg("date_diff('day', o_orderdate, l_shipdate)")} AS avg_ship_delay_days,
       MIN(CAST(o_orderdate + INTERVAL 7 DAY AS TIMESTAMP)) AS earliest_due
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
    doc="Date arithmetic: day difference and interval addition, aggregated.",
)
def rel_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            davg(delay).alias("avg_ship_delay_days"),
            F.min(F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias(
                "earliest_due"
            ),
        )
    )


@register(
    "rel_null_handling",
    oracle="""
SELECT c_custkey,
       COALESCE(o_totalprice, -1.0) AS price_or_default,
       (o_custkey IS NULL) AS no_order,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_nullified,
       IFNULL(CAST(o_orderstatus AS VARCHAR), 'NONE') AS status_or_none
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
WHERE c_custkey <= 50
""",
    doc="Null-handling scalar family over outer-join misses: coalesce, "
    "IS NULL, nullif, ifnull.",
)
def rel_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("o_totalprice", F.lit(-1.0)).alias("price_or_default"),
        F.col("o_custkey").isNull().alias("no_order"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullified"),
        F.ifnull(F.col("o_orderstatus"), F.lit("NONE")).alias("status_or_none"),
    )


@register(
    "rel_array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
       ROUND(CAST(list_aggregate(embedding[1:8], 'sum') AS DOUBLE), 6) AS head_sum,
       ROUND(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_el
FROM embeddings WHERE vec_id < 100
""",
    doc="Array scalar family: size, element access, slice + fold, max.",
)
def rel_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    head = F.slice(F.col("embedding"), 1, 8)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.get("embedding", 0).cast("double"), 6).alias("first_el"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_el"),
    )


@register(
    "rel_join_cross",
    oracle="""
SELECT r_name, COUNT(*) AS n_combos
FROM region CROSS JOIN nation
GROUP BY r_name
""",
    doc="Cartesian product (BroadcastNestedLoopJoin) of small dims.",
)
def rel_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).groupBy("r_name").agg(F.count("*").alias("n_combos"))
