"""Structured Streaming ingest: the reference's write path as a streaming
job (SURVEY §3.1; /root/reference/src/async_hta_service.hpp:251-328).

Reference contract reproduced here:

  A1  chunked per-metric delivery  -> file streaming source (one parquet
      file per arriving chunk; swap for Kafka in production — the rest of
      the pipeline is source-agnostic)
  A2  input rename mapping         -> broadcast join with the config table
  A4  NaN/Inf validity filter      -> stateless predicate
  A3  per-metric monotonic drop    -> applyInPandasWithState keyed by
      metric holding the high-watermark ts; state survives microbatches
      and restarts (checkpointed), which is exactly the reference's
      "max_ts starts from metric.range().second" durability semantics
  A5  rollup cascade               -> per-batch partial Aggregate records
      MERGED into the stored level tables (the record is mergeable, so
      partial-from-batch + stored = exact — no reprocessing of raw)
  A6  flush/commit barrier         -> microbatch checkpoint commit
  A13 per-key serialization        -> per-key ordered state updates

The stateful filter also emits each kept sample's ``delta_ns`` (gap to the
previous *kept* sample of that metric, 0 for the first ever) — computed
against the state watermark so integral/active_time are exact across
microbatch boundaries.

Storage layout (Parquet; Delta would add ACID but is not in this
container): ``{store}/raw`` and ``{store}/level_<width>`` partitioned by
metric. Level maintenance uses dynamic partition overwrite of only the
touched metric partitions. At 100 TB the same design holds with
(metric_bucket, time_range) partitioning so a microbatch rewrites a
bounded slice; the merge cost is proportional to batch size + touched
bucket count, never to history size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metricq_db_hta_spark.operators.ingest import apply_input_mapping, validity_filter

SAMPLE_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
    ]
)

KEPT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
        StructField("delta_ns", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("max_ts", LongType())])


def _ns_to_date(c):
    """UTC date of an int64-ns timestamp (partition key for pruning)."""
    return F.to_date(F.timestamp_micros(F.floor(c.cast("decimal(38,0)") / 1000).cast("long")))


def monotonic_stateful(stream: DataFrame) -> DataFrame:
    """A3 as an arbitrary stateful operator, keyed by metric.

    The state function is a nested closure with its own imports: Spark's
    Python workers do not have this package installed, so cloudpickle must
    serialize it by value (see operators/multimodal.py pickling note).
    """

    def monotonic_state_fn(key, pdfs, state):
        import pandas as _pd

        (metric,) = key
        max_ts = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("event_id", kind="mergesort")  # arrival order
            kept_rows = []
            for ts, value, event_id in zip(
                pdf["ts_ns"], pdf["value"], pdf["event_id"]
            ):
                ts = int(ts)
                if max_ts is not None and ts <= max_ts:
                    continue  # non-monotonic -> dropped, watermark unchanged
                delta = 0 if max_ts is None else ts - max_ts
                kept_rows.append((metric, ts, float(value), int(event_id), delta))
                max_ts = ts
            if kept_rows:
                yield _pd.DataFrame(
                    kept_rows,
                    columns=["metric", "ts_ns", "value", "event_id", "delta_ns"],
                )
        if max_ts is not None:
            state.update((max_ts,))

    return stream.groupBy("metric").applyInPandasWithState(
        monotonic_state_fn,
        outputStructType=KEPT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_level_partials(kept: DataFrame, width_ns: int) -> DataFrame:
    """Six-field partial Aggregate records for one microbatch (delta_ns
    already exact from the stateful filter)."""
    bucket = (F.col("ts_ns") - (F.col("ts_ns") % F.lit(width_ns))).cast("long")
    return kept.groupBy("metric", bucket.alias("bucket_start_ns")).agg(
        F.min("value").alias("minimum"),
        F.max("value").alias("maximum"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum"),
        F.count("value").alias("count"),
        F.sum(F.floor(F.col("value") * F.col("delta_ns") / F.lit(1_000_000.0)))
        .cast("long")
        .alias("integral"),
        F.sum("delta_ns").cast("long").alias("active_time"),
    )


def merge_level(existing: DataFrame | None, partial: DataFrame) -> DataFrame:
    """Merge partial records into stored ones (mergeability, SURVEY §1.2)."""
    if existing is None:
        unioned = partial
    else:
        unioned = existing.select(*partial.columns).unionByName(partial)
    return unioned.groupBy("metric", "bucket_start_ns").agg(
        F.min("minimum").alias("minimum"),
        F.max("maximum").alias("maximum"),
        F.sum("sum").alias("sum"),
        F.sum("count").cast("long").alias("count"),
        F.sum("integral").cast("long").alias("integral"),
        F.sum("active_time").cast("long").alias("active_time"),
    )


class StreamingIngest:
    """End-to-end streaming ingest service.

    ``start(input_dir)`` runs A1->A6 with ``availableNow`` (drain all
    pending chunks then stop — the test/backfill mode) or a processing-
    time trigger (service mode).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        level_widths_ns: tuple[int, ...] = (3_600_000_000_000,),
        mapping: DataFrame | None = None,
    ) -> None:
        self.spark = spark
        self.store = store_dir
        self.widths = level_widths_ns
        self.mapping = mapping

    # -- paths -------------------------------------------------------------
    @property
    def raw_path(self) -> str:
        return os.path.join(self.store, "raw")

    def level_path(self, width_ns: int) -> str:
        return os.path.join(self.store, f"level_{width_ns}")

    def checkpoint_path(self) -> str:
        return os.path.join(self.store, "_checkpoint")

    # -- batch sink --------------------------------------------------------
    def _process_batch(self, kept: DataFrame, batch_id: int) -> None:
        spark = kept.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        kept = kept.persist()
        try:
            if kept.isEmpty():
                return
            # A6: append raw samples, clustered by metric and day — the
            # (metric, date) layout is what lets Q2/Q4 range scans prune
            # partitions at 100 TB (SURVEY §4 "time-range partition
            # pruning" row)
            (
                kept.select("metric", "ts_ns", "value", "event_id")
                .withColumn("ts_date", _ns_to_date(F.col("ts_ns")))
                .repartition("metric")
                .write.mode("append")
                .partitionBy("metric", "ts_date")
                .parquet(self.raw_path)
            )
            # A5: merge batch partials into each level table. Levels are
            # partitioned by (metric, bucket_date); only partitions whose
            # (metric, date) actually received data are read + rewritten,
            # so the merge cost tracks the batch's time locality, not the
            # metric's full history.
            for width in self.widths:
                partial = batch_level_partials(kept, width).withColumn(
                    "bucket_date", _ns_to_date(F.col("bucket_start_ns"))
                )
                path = self.level_path(width)
                existing = None
                if os.path.exists(path):
                    touched = partial.select("metric", "bucket_date").distinct()
                    existing = spark.read.parquet(path).join(
                        F.broadcast(touched), ["metric", "bucket_date"], "left_semi"
                    )
                # localCheckpoint materializes the merge BEFORE the write:
                # Spark refuses to overwrite a path that is also a source
                # of the writing plan, and the checkpoint breaks that
                # lineage (it also bounds recompute — merged is small, the
                # level table is log-sized relative to raw)
                merged = (
                    merge_level(existing, partial)
                    .withColumn("bucket_date", _ns_to_date(F.col("bucket_start_ns")))
                    .localCheckpoint(eager=True)
                )
                # dynamic overwrite rewrites only the touched partitions;
                # everything else stays in place
                (
                    merged.repartition("metric")
                    .write.mode("overwrite")
                    .partitionBy("metric", "bucket_date")
                    .parquet(path)
                )
        finally:
            kept.unpersist()

    # -- the query ---------------------------------------------------------
    def start(self, input_dir: str, available_now: bool = True):
        stream = (
            self.spark.readStream.schema(SAMPLE_SCHEMA)
            .option("maxFilesPerTrigger", "8")
            .option("recursiveFileLookup", "true")  # chunks may arrive as dirs
            .parquet(input_dir)
        )
        if self.mapping is not None:
            stream = apply_input_mapping(stream, self.mapping, "metric")
        stream = validity_filter(stream)
        kept = monotonic_stateful(stream)
        writer = (
            kept.writeStream.outputMode("append")
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_path())
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")
        return writer.start()

    def backfill(self, stream: DataFrame) -> None:
        """A18: bulk import (the reference's ``metricq_importer`` MySQL ETL,
        /root/reference/src/tools/metricq_importer/importer.py:197-249) —
        one batch DataFrame through the same chain and sink. Parallelism
        comes from partitions instead of the importer's worker queue."""
        from metricq_db_hta_spark.operators.hta import with_delta
        from metricq_db_hta_spark.operators.ingest import ingest_batch

        kept = with_delta(ingest_batch(stream, self.mapping))
        self._process_batch(kept, batch_id=-1)

    def run_until_drained(self, input_dir: str, timeout_s: int = 300) -> None:
        q = self.start(input_dir, available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        if q.exception() is not None:
            raise q.exception()
