"""Streaming window aggregations + dedup (SURVEY §2 Part B streaming rows).

The reference's only streaming aggregation is the eager HTA rollup (A5);
these are the general streaming surfaces around it:

* tumbling / sliding / session window aggregation with a watermark for
  late-data expiry (the reference drops *all* out-of-order data, A3 —
  strictly harsher than a watermark; a configurable lateness tolerance is
  this engine's improvement, SURVEY §2 "watermark" row);
* exact stream dedup within the watermark horizon
  (dropDuplicatesWithinWatermark on the natural (metric, ts) key).

All return unstarted streaming DataFrames; callers attach sinks. Each is
also valid on batch DataFrames (same code path minus the watermark), which
is how the differential tests pin their semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(stream: DataFrame, ts_ns_col: str = "ts_ns") -> DataFrame:
    """Attach the µs event-time column Spark windows need (exact ns->µs
    via decimal — see functions/timeutil.ns_to_timestamp)."""
    from metricq_db_hta_spark.functions.timeutil import ns_to_timestamp

    return stream.withColumn("event_time", ns_to_timestamp(ts_ns_col))


def tumbling_agg(
    stream: DataFrame,
    width: str = "1 hour",
    watermark: str = "10 minutes",
    key: str = "metric",
) -> DataFrame:
    s = with_event_time(stream)
    if s.isStreaming:
        s = s.withWatermark("event_time", watermark)
    return s.groupBy(key, F.window("event_time", width)).agg(
        F.min("value").alias("minimum"),
        F.max("value").alias("maximum"),
        F.count("value").alias("count"),
    )


def sliding_agg(
    stream: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "10 minutes",
    key: str = "metric",
) -> DataFrame:
    s = with_event_time(stream)
    if s.isStreaming:
        s = s.withWatermark("event_time", watermark)
    return s.groupBy(key, F.window("event_time", width, slide)).agg(
        F.count("value").alias("count")
    )


def session_agg(
    stream: DataFrame,
    gap: str = "6 hours",
    watermark: str = "10 minutes",
    key: str = "user_id",
) -> DataFrame:
    s = with_event_time(stream)
    if s.isStreaming:
        s = s.withWatermark("event_time", watermark)
    return s.groupBy(key, F.session_window("event_time", gap)).agg(
        F.count("*").alias("n_events")
    )


def stream_dedup(
    stream: DataFrame,
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("metric", "ts_ns"),
) -> DataFrame:
    """Exact duplicate drop within the watermark horizon — the bounded-state
    streaming analogue of A3's exact-duplicate case."""
    s = with_event_time(stream)
    if s.isStreaming:
        return s.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return s.dropDuplicates(list(keys))
