"""History query service: the reference's four query types + level router.

The reference dispatches history RPCs on a request-type switch
(/root/reference/src/async_hta_service.hpp:359-491):

  Q1 AGGREGATE_TIMELINE (:361-392) — rows of (time, Aggregate) from the
     coarsest level whose width <= interval_max; finest if none qualifies.
  Q2 FLEX_TIMELINE      (:393-441) — like Q1, but falls through to raw
     samples when interval_max is finer than the finest level.
  Q3 AGGREGATE          (:442-464) — one merged Aggregate over [start, end).
  Q4 LAST_VALUE         (:465-488) — the single most recent raw sample.

This module is the *entire* planner the system needs (SURVEY §3.2): pick the
level table, emit a partition-prunable range scan. Catalyst does the rest
(predicate pushdown into Parquet, column pruning, top-1 as
TakeOrderedAndProject).

Level tables are DataFrames (materialized rollups in production, lazily
built in tests); ``HistoryService`` holds ``{width_ns: DataFrame}`` plus the
raw samples table.

Boundary semantics: [start, end) half-open on bucket_start_ns for aggregate
levels, inclusive-start on raw ts (matching hta::Scope::closed on start /
open on end — SURVEY A11; the Scope variants are exposed via
``scope_predicate``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators.hta import AGG_FIELDS


def choose_level(widths_ns: list[int], interval_max_ns: int) -> int | None:
    """Coarsest level width <= interval_max; None => raw fallthrough for
    FLEX queries, finest level for AGGREGATE_TIMELINE."""
    eligible = [w for w in widths_ns if w <= interval_max_ns]
    return max(eligible) if eligible else None


def _date_pruned(df: DataFrame, date_col: str, start_ns: int, end_ns: int) -> DataFrame:
    """Add a partition-pruning predicate on the store's time partition
    column when present (stores written by streaming/ingest_stream.py are
    laid out as (metric, ts_month|ts_date) for raw and (metric,
    bucket_month) for levels — the predicate on the ns column alone cannot
    prune those directory partitions)."""
    if date_col not in df.columns:
        return df
    start_day = F.to_date(F.timestamp_micros(F.lit(start_ns // 1000)))
    end_day = F.to_date(F.timestamp_micros(F.lit(min(end_ns, 2**62) // 1000)))
    if date_col in ("bucket_month", "ts_month"):
        # month dirs are labeled by their first day: a range starting
        # mid-month must still scan that month's directory
        start_day = F.trunc(start_day, "month")
    return df.filter(
        (F.col(date_col) >= start_day) & (F.col(date_col) <= end_day)
    )


def _time_pruned(df: DataFrame, start_ns: int, end_ns: int) -> DataFrame:
    """Prune whichever raw time-partition layout the store uses."""
    df = _date_pruned(df, "ts_date", start_ns, end_ns)
    return _date_pruned(df, "ts_month", start_ns, end_ns)


@dataclass
class HistoryService:
    raw: DataFrame                      # (metric, ts_ns, value)
    levels: dict[int, DataFrame]        # width_ns -> agg_level table
    widths: list[int] = field(init=False)

    def __post_init__(self) -> None:
        self.widths = sorted(self.levels)

    # -- Q1 ----------------------------------------------------------------
    def aggregate_timeline(
        self, metric: str | None, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Q1: (metric, bucket_start_ns, Aggregate...) rows ordered by time.
        Buckets whose start lies in [start, end)."""
        width = choose_level(self.widths, interval_max_ns) or self.widths[0]
        df = self.levels[width]
        if metric is not None:
            df = df.filter(F.col("metric") == metric)
        df = _date_pruned(df, "bucket_month", start_ns, end_ns)
        return (
            df.filter(
                (F.col("bucket_start_ns") >= start_ns)
                & (F.col("bucket_start_ns") < end_ns)
            )
            .select("metric", "bucket_start_ns", *AGG_FIELDS)
            .orderBy("metric", "bucket_start_ns")
        )

    # -- Q2 ----------------------------------------------------------------
    def flex_timeline(
        self, metric: str | None, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Q2: Q1, or raw (metric, ts_ns, value) when the request is finer
        than the finest level. Union result type, dispatched here (the
        reference returns a std::variant, :427-437)."""
        if choose_level(self.widths, interval_max_ns) is None:
            df = self.raw
            if metric is not None:
                df = df.filter(F.col("metric") == metric)
            df = _time_pruned(df, start_ns, end_ns)
            return (
                df.filter((F.col("ts_ns") >= start_ns) & (F.col("ts_ns") < end_ns))
                .select("metric", "ts_ns", "value")
                .orderBy("metric", "ts_ns")
            )
        return self.aggregate_timeline(metric, start_ns, end_ns, interval_max_ns)

    # -- Q3 ----------------------------------------------------------------
    def aggregate(
        self, metric: str | None, start_ns: int, end_ns: int
    ) -> DataFrame:
        """Q3: one merged Aggregate per metric over [start, end), computed
        from the finest level (correctness-equivalent to merging coarse
        interior + fine edge buckets — SURVEY A9)."""
        df = self.levels[self.widths[0]]
        if metric is not None:
            df = df.filter(F.col("metric") == metric)
        df = _date_pruned(df, "bucket_month", start_ns, end_ns)
        return (
            df.filter(
                (F.col("bucket_start_ns") >= start_ns)
                & (F.col("bucket_start_ns") < end_ns)
            )
            .groupBy("metric")
            .agg(
                F.min("minimum").alias("minimum"),
                F.max("maximum").alias("maximum"),
                F.sum("sum").alias("sum"),
                F.sum("count").cast("long").alias("count"),
                F.sum("integral").cast("long").alias("integral"),
                F.sum("active_time").cast("long").alias("active_time"),
            )
            .orderBy("metric")
        )

    # -- Q4 ----------------------------------------------------------------
    def last_value(self, metric: str | None = None) -> DataFrame:
        """Q4: most recent raw sample per metric. The reference queries
        retrieve(ts_max, ts_max, Scope::extended/open) (:465-488); in Spark
        this is max_by over the metric group — a single partial/final agg,
        no sort."""
        df = self.raw
        if metric is not None:
            df = df.filter(F.col("metric") == metric)
        return (
            df.groupBy("metric")
            .agg(
                F.max("ts_ns").alias("ts_ns"),
                F.max_by("value", "ts_ns").alias("value"),
            )
            .orderBy("metric")
        )

    # -- A12 ---------------------------------------------------------------
    @staticmethod
    def delta_encode(timeline: DataFrame, ts_col: str = "bucket_start_ns") -> DataFrame:
        """Delta-encode response timestamps: time_delta[i] = t[i] - t[i-1]
        per metric (first row keeps its absolute time, delta vs 0 — matching
        the reference's last_time initialisation, :377-380)."""
        w = Window.partitionBy("metric").orderBy(ts_col)
        return timeline.withColumn(
            "time_delta",
            (F.col(ts_col) - F.coalesce(F.lag(ts_col, 1).over(w), F.lit(0))).cast("long"),
        )


def scope_predicate(ts_col, bound_ns: int, side: str, scope: str):
    """hta::Scope boundary semantics (SURVEY A11): 'open' excludes the
    boundary sample, 'closed' includes it; 'extended' is handled by callers
    by unioning one row beyond the bound (lag/lead or limit-1 outside)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if side == "start":
        return c > bound_ns if scope == "open" else c >= bound_ns
    return c < bound_ns if scope == "open" else c <= bound_ns
