"""Self-monitoring stats (reference A14/A15: db_stats.cpp).

The reference keeps lock-protected counters per operation class
(pending/active/completed/failed, durations, bytes;
/root/reference/src/db_stats.cpp:35-115) and, on a timer, projects derived
rates over the elapsed window — request_rate, data_rate, pending_time,
utilization, with guarded division (:181-206).

Spark-native shape: operations are an *events log* (one row per completed
op with its timestamps/bytes); the counters are a windowed aggregation and
the derived metrics a projection. Works identically over a static ops log
(batch) or a stream with a tumbling window + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS_COLUMNS = ("op_type", "ts_ns", "duration_ns", "bytes", "failed")


def derived_rates(
    ops: DataFrame, window_ns: int = 10_000_000_000, streaming: bool = False
) -> DataFrame:
    """Per (op_type, window): counts, failure count, data volume, and the
    reference's derived projections (rates per second, mean latency,
    utilization = busy-time / wall-time) with guarded division."""
    window_s = window_ns / 1_000_000_000
    bucket = (F.col("ts_ns") - (F.col("ts_ns") % F.lit(window_ns))).cast("long")
    g = ops.groupBy(
        "op_type", bucket.alias("window_start_ns")
    ).agg(
        F.count("*").alias("completed"),
        F.sum(F.when(F.col("failed"), 1).otherwise(0)).cast("long").alias("failures"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.sum("duration_ns").cast("long").alias("busy_ns"),
    )
    return g.select(
        "op_type",
        "window_start_ns",
        "completed",
        "failures",
        "bytes",
        F.round(F.col("completed") / window_s, 6).alias("request_rate"),
        F.round(F.col("bytes") / window_s, 6).alias("data_rate"),
        F.round(
            F.when(
                F.col("completed") > 0, F.col("busy_ns") / F.col("completed") / 1e9
            ).otherwise(0.0),
            6,
        ).alias("mean_latency_s"),
        F.round(F.col("busy_ns") / F.lit(float(window_ns)), 6).alias("utilization"),
    )
