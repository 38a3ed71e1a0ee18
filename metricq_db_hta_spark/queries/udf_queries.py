"""UDF-surface declared queries (SURVEY §2 Part B "UDF surface") plus the
remaining reference-operator rows: A11 scope boundary semantics and A16
metadata projection.

The UDF queries deliberately compute *portable* things so the DuckDB
oracle can pin them: the point is to exercise the Arrow-batched execution
paths (scalar pandas_udf, grouped-map applyInPandas), not to hide logic in
Python. All closures are self-contained (workers have no package install).
"""

from __future__ import annotations

# module-level so pyspark's get_type_hints can resolve the stringified
# `pd.Series` annotations on the grouped-agg pandas UDF (future-import
# annotations are strings evaluated against the defining module's globals)
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metricq_db_hta_spark.queries.base import register
from metricq_db_hta_spark.queries.hta_queries import MAPPING, START_NS, samples
from metricq_db_hta_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# scalar pandas UDF (Arrow-vectorized)
# ---------------------------------------------------------------------------


@register(
    "udf_pandas_scalar_normalize",
    oracle="""
SELECT doc_id,
       lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS norm_text,
       LENGTH(lower(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS norm_len
FROM documents WHERE doc_id < 100
""",
    doc="Scalar pandas_udf (Arrow batches): text normalization "
    "(lowercase + strip non-alphanumerics) — the vectorized-Python "
    "extension point replacing the reference's recompile-C++ path.",
)
def udf_pandas_scalar_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def normalize(s):
        import re as _re

        pat = _re.compile(r"[^a-zA-Z0-9 ]")
        return s.map(lambda x: pat.sub("", x).lower())

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # project the UDF once, derive from the result — two normalize("text")
    # expressions would serialize every Arrow batch to Python twice
    return d.select("doc_id", normalize("text").alias("norm_text")).select(
        "doc_id",
        "norm_text",
        F.length("norm_text").cast("long").alias("norm_len"),
    )


# ---------------------------------------------------------------------------
# grouped-map applyInPandas
# ---------------------------------------------------------------------------

ZSCORE_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


@register(
    "udf_apply_in_pandas_zscore",
    oracle="""
WITH s AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
),
stats AS (
  SELECT metric, AVG(value) AS mu,
         stddev_pop(value) AS sigma
  FROM s GROUP BY metric
)
SELECT s.metric, s.ts_ns, s.value,
       ROUND(CASE WHEN sigma > 0 THEN (value - mu) / sigma ELSE 0.0 END, 6)
           AS zscore
FROM s JOIN stats USING (metric)
""",
    doc="Grouped-map applyInPandas: per-metric z-score normalization "
    "(population stddev) — one Arrow batch per metric group.",
)
def udf_apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscore(pdf):
        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=0)
        out = pdf[["metric", "ts_ns", "value"]].copy()
        if sigma and sigma > 0:
            out["zscore"] = ((pdf["value"] - mu) / sigma).round(6)
        else:
            out["zscore"] = 0.0
        return out

    s = samples(spark, sf_dir).select("metric", "ts_ns", "value")
    return s.groupBy("metric").applyInPandas(zscore, schema=ZSCORE_SCHEMA)


# ---------------------------------------------------------------------------
# A11: interval scope boundary semantics
# ---------------------------------------------------------------------------


@register(
    "hta_scope_boundaries",
    oracle=f"""
WITH s AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
)
SELECT metric,
       CAST(SUM(CASE WHEN ts_ns >= {START_NS} THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
       CAST(SUM(CASE WHEN ts_ns >  {START_NS} THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       MAX(CASE WHEN ts_ns < {START_NS} THEN ts_ns END) AS extended_prev_ts
FROM s GROUP BY metric
""",
    doc="A11 hta::Scope semantics: closed (>= boundary) vs open (>) "
    "counts, and 'extended' = the one sample beyond the boundary "
    "(/root/reference/src/async_hta_service.hpp:469).",
)
def hta_scope_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.plans.history import scope_predicate

    s = samples(spark, sf_dir)
    closed = scope_predicate("ts_ns", START_NS, "start", "closed")
    open_ = scope_predicate("ts_ns", START_NS, "start", "open")
    return s.groupBy("metric").agg(
        F.sum(F.when(closed, 1).otherwise(0)).cast("long").alias("n_closed"),
        F.sum(F.when(open_, 1).otherwise(0)).cast("long").alias("n_open"),
        F.max(F.when(~closed, F.col("ts_ns"))).alias("extended_prev_ts"),
    )


# ---------------------------------------------------------------------------
# A16: metric metadata projection
# ---------------------------------------------------------------------------

METADATA = [
    (name, input_, "W", "power", f"power draw of {name}", 0.1)
    for input_, name in MAPPING
]


@register(
    "hta_metadata_projection",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        f"('{n}', '{i}', '{u}', '{q}', '{d}', {r})" for n, i, u, q, d, r in METADATA
    )
    + ") AS t(name, input, unit, quantity, description, rate)",
    doc="A16: per-metric metadata projection (unit/quantity/description/"
    "rate attached to emitted metrics; "
    "/root/reference/src/db_stats.cpp:122-179).",
)
def hta_metadata_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(
        METADATA, ["name", "input", "unit", "quantity", "description", "rate"]
    )


# ---------------------------------------------------------------------------
# ungrouped (scalar) aggregation — Part B row
# ---------------------------------------------------------------------------


@register(
    "rel_agg_scalar_global",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
FROM lineitem
""",
    doc="Ungrouped scalar aggregate over the fact table (reference A9's "
    "shape at the relational surface).",
)
def rel_agg_scalar_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from metricq_db_hta_spark.queries.base import dsum

    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


# ---------------------------------------------------------------------------
# grouped-agg pandas UDF
# ---------------------------------------------------------------------------


@register(
    "udf_grouped_agg_geomean",
    oracle="""
SELECT event_type,
       ROUND(EXP(AVG(LN(value))), 6) AS geo_mean
FROM events WHERE value > 0
GROUP BY event_type
""",
    doc="Grouped-aggregate pandas_udf: per-metric geometric mean "
    "(exp of mean log) — the Arrow-batched custom-aggregate extension "
    "point; oracle pins it via EXP(AVG(LN(x))).",
)
def udf_grouped_agg_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    # pd.Series -> float type hints select the grouped-agg eval type
    # (PandasUDFType.GROUPED_AGG is deprecated; pyspark resolves the
    # stringified future-import annotations via get_type_hints)
    @pandas_udf(DoubleType())
    def geomean(v: pd.Series) -> float:
        import numpy as _np

        return float(_np.exp(_np.log(v.to_numpy(dtype="float64")).mean()))

    s = samples(spark, sf_dir).filter(F.col("value") > 0)
    # round in a separate projection: Spark rejects a pandas GROUPED_AGG
    # UDF nested inside another expression in the agg list
    return (
        s.groupBy(F.col("metric").alias("event_type"))
        .agg(geomean("value").alias("__g"))
        .select("event_type", F.round("__g", 6).alias("geo_mean"))
    )


# ---------------------------------------------------------------------------
# Python UDTF (table function)
# ---------------------------------------------------------------------------


@register(
    "udf_udtf_explode_buckets",
    oracle=f"""
WITH bounds AS (
  SELECT event_type AS metric,
         MIN(epoch_ns(ts)) AS min_ts, MAX(epoch_ns(ts)) AS max_ts
  FROM events GROUP BY event_type
)
SELECT metric, unnest(generate_series(
         min_ts - min_ts % {7 * 86_400_000_000_000},
         max_ts,
         {7 * 86_400_000_000_000})) AS week_start_ns
FROM bounds
""",
    doc="Python UDTF (table function): expand each metric's time range "
    "into epoch-aligned week starts (1 row -> N rows, lateral-join "
    "shape).",
)
def udf_udtf_explode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    WEEK = 7 * 86_400_000_000_000

    @udtf(returnType="metric: string, week_start_ns: long")
    class ExpandWeeks:
        def eval(self, metric: str, min_ts: int, max_ts: int):
            start = min_ts - min_ts % WEEK
            while start <= max_ts:
                yield metric, start
                start += WEEK

    bounds = (
        samples(spark, sf_dir)
        .groupBy("metric")
        .agg(F.min("ts_ns").alias("min_ts"), F.max("ts_ns").alias("max_ts"))
    )
    bounds.createOrReplaceTempView("v_bounds")
    spark.udtf.register("expand_weeks", ExpandWeeks)
    return spark.sql(
        "SELECT t.metric, t.week_start_ns "
        "FROM v_bounds, LATERAL expand_weeks(metric, min_ts, max_ts) t"
    )
