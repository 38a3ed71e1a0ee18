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

Driver jars: none ship on the default classpath, but any JDBC driver jar
already on the machine can be registered at RUNTIME via ``ADD JAR``
(:func:`register_driver_jar`) — no session restart, executors pick it up
through Spark's mutable classloader. :func:`find_driver_jar` discovers a
jar in the usual local artifact caches (ivy2 / coursier / $SPARK_HOME
jars), so the end-to-end import path is exercised wherever ANY driver is
present (the test suite uses the DuckDB JDBC driver as the legacy
database stand-in; with no jar anywhere, ``load()`` still fails fast with
Spark's actionable driver-resolution error — the r8-accepted gate).

:func:`jdbc_import` is the full importer-parity entry point
(/root/reference/src/tools/metricq_importer/importer.py:197-249): bound
probe -> chunked partitioned scan (the ``--mysql-chunk-size 10000000``
analogue) -> ``StreamingIngest.backfill``, with connection concurrency
capped the way the importer caps ``num_workers``.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: vendor -> (jar glob stem, driver class) for local-cache discovery
_KNOWN_DRIVERS = {
    "duckdb": ("duckdb_jdbc*.jar", "org.duckdb.DuckDBDriver"),
    "mysql": ("mysql-connector*.jar", "com.mysql.cj.jdbc.Driver"),
    "mariadb": ("mariadb-java-client*.jar", "org.mariadb.jdbc.Driver"),
    "postgresql": ("postgresql-*.jar", "org.postgresql.Driver"),
    "sqlite": ("sqlite-jdbc*.jar", "org.sqlite.JDBC"),
}


def find_driver_jar(vendor: str = "duckdb") -> tuple[str, str] | None:
    """Locate a JDBC driver jar for ``vendor`` in the local artifact
    caches. Returns ``(jar_path, driver_class)`` or None. Search order:
    ``$SPARK_GRAFT_JDBC_JAR`` (explicit override — the driver class is
    then taken from the vendor table), ``~/.ivy2``, ``~/.cache/coursier``,
    ``$SPARK_HOME/jars``. Nothing is downloaded."""
    stem, cls = _KNOWN_DRIVERS[vendor]
    override = os.environ.get("SPARK_GRAFT_JDBC_JAR")
    if override and os.path.isfile(override):
        return override, cls
    home = os.path.expanduser("~")
    roots = [
        os.path.join(home, ".ivy2"),
        os.path.join(home, ".cache", "coursier"),
        os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars"),
    ]
    def _version_key(path: str) -> tuple:
        # numeric-aware: 1.10.0 must beat 1.9.2 (plain lexicographic
        # sorting inverts multi-digit components — r13 review)
        import re as _re

        return tuple(
            int(t) if t.isdigit() else t
            for t in _re.split(r"(\d+)", os.path.basename(path))
        )

    for root in roots:
        if not os.path.isdir(root):
            continue
        hits = glob.glob(os.path.join(root, "**", stem), recursive=True)
        if hits:
            return max(hits, key=_version_key), cls
    return None


def register_driver_jar(spark: SparkSession, jar_path: str) -> None:
    """Put a driver jar on the session's classloader at runtime (Spark's
    ``ADD JAR`` — distributed to executors, picked up by the JDBC
    source's DriverRegistry). Idempotent: re-adding the same path is a
    no-op in Spark."""
    quoted = jar_path.replace("'", "\\'")  # paths may carry apostrophes
    spark.sql(f"ADD JAR '{quoted}'")


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
    push_down_predicate: bool = True,
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
    if not push_down_predicate:
        # the import path disables remote predicate pushdown: the scan is
        # full-table by design (everything gets imported) and Spark's
        # DEFAULT JDBC dialect renders NaN/Infinity double literals as
        # bare identifiers — the ingest chain's validity filter would
        # arrive at the legacy server as invalid SQL ("Binder Error:
        # Referenced column 'Infinity' not found", DuckDB). Filtering in
        # the engine matches the reference, where hta_mysql_import reads
        # raw chunks and HTA applies the sample filters.
        reader = reader.option("pushDownPredicate", "false")
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


def jdbc_import(
    spark: SparkSession,
    ingest,
    url: str,
    table: str,
    *,
    partition_column: str,
    chunk_rows: int = 10_000_000,
    max_connections: int = 8,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    **source_kwargs,
) -> int:
    """Importer-parity bulk import: probe the legacy table's key range,
    chunk it, scan it with bounded connection concurrency, and replay it
    through ``StreamingIngest.backfill`` — the one ETL chain every other
    backfill uses (monotonicity filter, raw write, level cascade).

    Parity with the reference importer
    (/root/reference/src/tools/metricq_importer/importer.py:197-249):
    ``chunk_rows`` is ``--mysql-chunk-size`` (10M rows/chunk — here a
    per-partition KEY span, the same index-range-scan shape);
    ``max_connections`` caps concurrent legacy-server connections the way
    the importer's ``num_workers`` caps its subprocess fleet. The bound
    probe is ONE single-row remote aggregate, pushed down as a subquery.
    Returns the number of rows imported."""
    opts = {"url": url}
    for k, v in (("driver", driver), ("user", user), ("password", password)):
        if v is not None:
            opts[k] = v
    bounds_q = (
        f"(SELECT MIN({partition_column}) AS lo, MAX({partition_column}) "
        f"AS hi, COUNT(*) AS n FROM {table}) bounds"
    )
    probe = (
        spark.read.format("jdbc")
        .options(**opts, dbtable=bounds_q)
        .load()
        .collect()[0]
    )
    if probe["n"] == 0:
        return 0
    if probe["lo"] is None or probe["hi"] is None:
        # n > 0 with NULL MIN/MAX: every partition_column value is NULL —
        # range-partitioned scanning cannot chunk such a table (and the
        # rows carry no usable key for the ingest chain either)
        raise ValueError(
            f"jdbc_import: {table}.{partition_column} is NULL in every row "
            f"({int(probe['n'])} rows) - pick a non-NULL partition_column"
        )
    lo, hi = int(probe["lo"]), int(probe["hi"])
    # chunk count from the ROW count (a sparse key range must not explode
    # into empty chunks), connection-capped like the importer's workers
    want_parts = -(-int(probe["n"]) // chunk_rows)
    n_parts = max(1, min(int(max_connections), want_parts))
    if want_parts > n_parts:
        # the connection budget, not chunk_rows, is sizing the chunks now:
        # each of the n_parts scans covers ~want/n x chunk_rows rows — a
        # silent deviation from the importer's per-connection chunk bound
        # worth surfacing (e.g. 1B rows @ 8 connections = 125M-row scans)
        import logging

        logging.getLogger(__name__).warning(
            "jdbc_import: %s rows need %d chunks of %d rows but "
            "max_connections=%d caps the scan at %d partitions "
            "(~%d rows each, exceeding chunk_rows %.1fx); raise "
            "max_connections or chunk_rows to restore importer-parity "
            "chunking",
            int(probe["n"]), want_parts, chunk_rows, int(max_connections),
            n_parts, int(probe["n"]) // n_parts,
            (int(probe["n"]) / n_parts) / chunk_rows,
        )
    src = jdbc_samples_source(
        spark,
        url,
        table,
        partition_column=partition_column,
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=n_parts,
        driver=driver,
        user=user,
        password=password,
        # full-table import defaults pushdown OFF (see the source note);
        # popped from kwargs so a caller's explicit choice is honored
        # instead of colliding (TypeError) with the default
        push_down_predicate=source_kwargs.pop("push_down_predicate", False),
        **source_kwargs,
    )
    ingest.backfill(src)
    return int(probe["n"])  # rows read from legacy (probe already paid)
