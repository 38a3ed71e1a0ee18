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
    ops: DataFrame,
    window_ns: int = 10_000_000_000,
    streaming: bool = False,
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per (op_type, window): counts, failure count, data volume, and the
    reference's derived projections (rates per second, mean latency,
    utilization = busy-time / wall-time) with guarded division.

    ``streaming=True`` groups on an event-time ``F.window`` with a
    watermark, so state is bounded and windows emit (append mode) once the
    watermark passes — the module-docstring contract a batch-only bucket
    expression cannot honor (ADVICE r1: without a watermark a streaming
    deployment accumulates unbounded state). Both paths produce identical
    epoch-aligned ``window_start_ns`` buckets; window_ns must be a whole
    number of milliseconds for the streaming form.
    """
    window_s = window_ns / 1_000_000_000
    if streaming:
        if window_ns % 1_000_000 != 0:
            raise ValueError(f"streaming window must be whole ms: {window_ns}")
        # exact integer ns -> µs (same pattern as ingest_stream._ns_to_date):
        # double division would round epoch-ns (~1.7e18 > 2^53) by up to
        # hundreds of ns and could land boundary samples in the wrong window
        ts = F.timestamp_micros(
            F.floor(F.col("ts_ns").cast("decimal(38,0)") / 1000).cast("long")
        )
        grouped = (
            ops.withColumn("__ts", ts)
            .withWatermark("__ts", watermark)
            .groupBy(
                "op_type",
                F.window("__ts", f"{window_ns // 1_000_000} milliseconds").alias(
                    "__w"
                ),
            )
        )
        key = (F.unix_micros(F.col("__w.start")) * 1000).alias("window_start_ns")
    else:
        bucket = (F.col("ts_ns") - (F.col("ts_ns") % F.lit(window_ns))).cast("long")
        grouped = ops.groupBy("op_type", bucket.alias("window_start_ns"))
        key = F.col("window_start_ns")
    g = grouped.agg(
        F.count("*").alias("completed"),
        F.sum(F.when(F.col("failed"), 1).otherwise(0)).cast("long").alias("failures"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.sum("duration_ns").cast("long").alias("busy_ns"),
    )
    return g.select(
        "op_type",
        key,
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
