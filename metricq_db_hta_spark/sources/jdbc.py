"""JDBC bulk-import source — the Spark equivalent of the reference's
legacy-MySQL importer.

The reference imports historic data by shelling ``hta_mysql_import`` once
per metric with ``--mysql-chunk-size 10000000``
(/root/reference/src/tools/metricq_importer/importer.py:233-239): each
metric's legacy table is chunk-read and replayed into the HTA store. The
Spark translation is declarative: ONE partitioned JDBC scan per legacy
table (``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
— Spark's executor-parallel range chunking, the direct analogue of the
importer's chunk loop), projected to the canonical sample schema and
handed to ``StreamingIngest.backfill`` — the same source-agnostic ETL
chain every other backfill uses, so monotonicity filtering, raw writes
and level maintenance are identical to streaming ingest.

Scale notes (100 TB import):

* ``numPartitions`` bounds concurrent connections to the legacy server —
  size it to what MySQL tolerates (the reference runs ``num_workers``
  subprocesses for the same reason), not to the cluster size.
* The range partitioning column should be the legacy PK/timestamp so each
  chunk is an index range scan, not a full-table scan per partition.
* Predicate pushdown applies: a ``WHERE metric IN (...)`` filter on the
  returned DataFrame is pushed into the remote SQL.

This container ships no JDBC driver jar, so ``load()`` fails fast with
Spark's actionable driver-resolution error (contract-tested, same
acceptance pattern as the kafka source — see COVERAGE.md A1); the option
plumbing and the downstream ETL chain are identical with or without the
jar, which is what the gate pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def jdbc_samples_source(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    metric_col: str = "metric",
    ts_ms_col: str = "timestamp",
    value_col: str = "value",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
) -> DataFrame:
    """Partitioned JDBC scan of a legacy samples table, projected to the
    canonical ``(metric, ts_ns, value, event_id)`` sample schema.

    The legacy store keeps POSIX-millisecond timestamps (the importer's
    ``posix_ms``, importer.py:238); ``ts_ns`` is the engine's int64 ns.
    Legacy rows carry no event id, so ``event_id`` is derived from the
    timestamp — unique per metric under the same per-metric monotonicity
    contract the ingest chain enforces anyway.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound "
                "(the legacy PK/timestamp range to chunk)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (("driver", driver), ("user", user), ("password", password)):
        if v is not None:
            reader = reader.option(k, v)
    raw = reader.load()
    ts_ns = (F.col(ts_ms_col).cast("long") * F.lit(1_000_000)).alias("ts_ns")
    return raw.select(
        F.col(metric_col).cast("string").alias("metric"),
        ts_ns,
        F.col(value_col).cast("double").alias("value"),
        (F.col(ts_ms_col).cast("long") * F.lit(1_000_000)).alias("event_id"),
    )
