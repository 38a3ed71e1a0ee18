"""A18b JDBC legacy import — EXECUTED end-to-end (VERDICT r12 next-step 6).

The reference imports legacy history by chunk-reading a MySQL table per
metric and replaying it into the HTA store
(/root/reference/src/tools/metricq_importer/importer.py:197-249). These
tests run the Spark translation against a real JDBC endpoint: a DuckDB
database file behind the public ``org.duckdb:duckdb_jdbc`` driver,
registered at runtime via ``ADD JAR`` (sources/jdbc.py). The driver jar is
discovered in the local artifact caches; with none present the suite falls
back to the r8-accepted gate tests in test_formats.py (these skip).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.queries.hta_queries import W0
from metricq_db_hta_spark.sources.jdbc import (
    find_driver_jar,
    jdbc_import,
    jdbc_samples_source,
    register_driver_jar,
)
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

_JAR = find_driver_jar("duckdb")
pytestmark = pytest.mark.skipif(
    _JAR is None, reason="no JDBC driver jar in local caches"
)

BASE_MS = 1_700_000_000_000  # legacy stores POSIX ms (importer posix_ms)


@pytest.fixture()
def legacy_db(tmp_path):
    """A legacy samples table: 2 metrics x 600 rows, ms timestamps, a
    numeric PK to chunk on — plus one timestamp-early row (kept: replay
    order is timestamp order, see below) and one NaN row the ingest
    chain's validity filter must drop, same as any other source."""
    db = str(tmp_path / "legacy.db")
    con = duckdb.connect(db)
    con.execute(
        """
        CREATE TABLE samples AS
        SELECT 'legacy_' || (i % 2) AS metric,
               ? + i * 500 AS timestamp,
               (i * 7 % 100) / 10.0 AS value,
               i AS pk
        FROM range(1200) t(i)
        """,
        [BASE_MS],
    )
    # an out-of-range-early row and an invalid (NaN) row: event_id is
    # derived from the legacy timestamp, so replay order IS timestamp
    # order — the early row becomes the metric's first sample (kept);
    # the NaN row is dropped by the validity filter
    con.execute(
        "INSERT INTO samples VALUES ('legacy_0', ?, 9.9, 10000), "
        "('legacy_1', ?, CAST('nan' AS DOUBLE), 10001)",
        [BASE_MS - 1000, BASE_MS + 10_000_000],
    )
    con.close()
    return db


def test_partitioned_jdbc_scan_projects_sample_schema(spark, legacy_db):
    jar, driver_cls = _JAR
    register_driver_jar(spark, jar)
    src = jdbc_samples_source(
        spark,
        f"jdbc:duckdb:{legacy_db}",
        "samples",
        partition_column="pk",
        lower_bound=0,
        upper_bound=10_001,
        num_partitions=4,
        driver=driver_cls,
    )
    assert src.columns == ["metric", "ts_ns", "value", "event_id"]
    assert src.rdd.getNumPartitions() == 4  # 4 concurrent range chunks
    rows = src.count()
    assert rows == 1202
    first = src.filter(F.col("metric") == "legacy_0").agg(
        F.min("ts_ns").alias("lo")
    ).collect()[0]
    assert first["lo"] == (BASE_MS - 1000) * 1_000_000  # ms -> ns


def test_jdbc_import_round_trips_into_store(spark, legacy_db, tmp_path):
    """Full importer parity: bound probe -> chunked scan -> backfill.
    The imported store must equal a store backfilled from the same rows
    delivered any other way (the source-agnostic ETL contract)."""
    jar, driver_cls = _JAR
    register_driver_jar(spark, jar)

    store = str(tmp_path / "store_jdbc")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    n = jdbc_import(
        spark,
        svc,
        f"jdbc:duckdb:{legacy_db}",
        "samples",
        partition_column="pk",
        chunk_rows=400,  # 1202 rows -> capped at max_connections
        max_connections=3,
        driver=driver_cls,
    )
    assert n == 1202

    # reference store: identical rows via the plain in-memory backfill
    ref_store = str(tmp_path / "store_ref")
    ref_rows = duckdb.connect(legacy_db).execute(
        "SELECT metric, timestamp * 1000000 AS ts_ns, value, "
        "timestamp * 1000000 AS event_id FROM samples"
    ).fetchall()
    ref_svc = StreamingIngest(spark, ref_store, level_widths_ns=(W0,))
    ref_svc.backfill(
        spark.createDataFrame(
            ref_rows, "metric string, ts_ns long, value double, event_id long"
        )
    )

    got = sorted(
        spark.read.parquet(svc.raw_path)
        .select("metric", "ts_ns", "value")
        .collect()
    )
    want = sorted(
        spark.read.parquet(ref_svc.raw_path)
        .select("metric", "ts_ns", "value")
        .collect()
    )
    assert got == want and len(got) == 1201  # the NaN row dropped

    lv = sorted(
        spark.read.parquet(svc.level_path(W0))
        .select("metric", "bucket_start_ns", "count", "sum")
        .collect()
    )
    lv_ref = sorted(
        spark.read.parquet(ref_svc.level_path(W0))
        .select("metric", "bucket_start_ns", "count", "sum")
        .collect()
    )
    assert lv == lv_ref


def test_jdbc_import_empty_table_is_noop(spark, tmp_path):
    jar, driver_cls = _JAR
    register_driver_jar(spark, jar)
    db = str(tmp_path / "empty.db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE samples (metric VARCHAR, timestamp BIGINT, "
        "value DOUBLE, pk BIGINT)"
    )
    con.close()
    store = str(tmp_path / "store_empty")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    n = jdbc_import(
        spark,
        svc,
        f"jdbc:duckdb:{db}",
        "samples",
        partition_column="pk",
        driver=driver_cls,
    )
    assert n == 0
    assert not os.path.isdir(svc.raw_path) or not os.listdir(svc.raw_path)


def test_jdbc_import_null_partition_column_raises(spark, tmp_path):
    """r14 review: a non-empty table whose partition_column is NULL in
    every row probed (n>0, lo/hi NULL) must fail with a clear error, not
    a TypeError from int(None)."""
    jar, driver_cls = _JAR
    register_driver_jar(spark, jar)
    db = str(tmp_path / "nullpk.db")
    con = duckdb.connect(db)
    con.execute(
        "CREATE TABLE samples AS SELECT 'm' AS metric, "
        "1700000000000 + i AS timestamp, i / 10.0 AS value, "
        "CAST(NULL AS BIGINT) AS pk FROM range(5) t(i)"
    )
    con.close()
    svc = StreamingIngest(
        spark, str(tmp_path / "store_nullpk"), level_widths_ns=(W0,)
    )
    with pytest.raises(ValueError, match="NULL in every row"):
        jdbc_import(
            spark,
            svc,
            f"jdbc:duckdb:{db}",
            "samples",
            partition_column="pk",
            driver=driver_cls,
        )


def test_jdbc_import_warns_when_connection_cap_inflates_chunks(
    spark, legacy_db, tmp_path, caplog
):
    """r14 review: when row-count-derived chunking wants more partitions
    than max_connections allows, the effective per-connection span
    silently outgrows chunk_rows — the deviation from importer-parity
    chunking must be logged."""
    import logging

    jar, driver_cls = _JAR
    register_driver_jar(spark, jar)
    store = str(tmp_path / "store_capwarn")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    # 1202 rows, chunk_rows=100 -> wants 13 chunks; cap at 2 connections
    with caplog.at_level(logging.WARNING, logger="metricq_db_hta_spark.sources.jdbc"):
        n = jdbc_import(
            spark,
            svc,
            f"jdbc:duckdb:{legacy_db}",
            "samples",
            partition_column="pk",
            chunk_rows=100,
            max_connections=2,
            driver=driver_cls,
        )
    assert n == 1202
    assert any(
        "exceeding chunk_rows" in r.getMessage() for r in caplog.records
    ), caplog.records
