"""CSV / JSONL source round-trips (sources/formats.py): schema-pinned
reads reproduce the parquet-resident values exactly; unrepresentable
schemas fail up front; malformed input fails fast."""

from __future__ import annotations

import os

import pytest

from metricq_db_hta_spark.sources import formats
from metricq_db_hta_spark.sources.tables import load_table


@pytest.mark.parametrize("table", ["nation", "orders", "lineitem"])
def test_csv_round_trip_exact(spark, sf_dir, tmp_path, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_csv")
    formats.write_csv(src, path)
    back = formats.read_csv(spark, path, src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


@pytest.mark.parametrize("table", ["nation", "orders", "documents"])
def test_jsonl_round_trip_exact(spark, sf_dir, tmp_path, table):
    src = load_table(spark, sf_dir, table)
    path = str(tmp_path / f"{table}_jsonl")
    formats.write_jsonl(src, path)
    back = formats.read_jsonl(spark, path, src.schema)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_csv_rejects_nested_columns(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")  # array<float> column
    with pytest.raises(ValueError, match="CSV cannot represent"):
        formats.write_csv(emb, "/tmp/never-written")


def test_csv_malformed_row_fails_fast(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "bad_csv")
    formats.write_csv(src, path)
    part = next(
        f for f in os.listdir(path) if f.endswith(".csv") and not f.startswith(".")
    )
    with open(os.path.join(path, part), "a") as f:
        f.write("not-a-number,alpha,beta\n")
    # drop the hadoop checksum sidecar the append just invalidated, so the
    # read reaches the CSV parser instead of dying on ChecksumException
    crc = os.path.join(path, f".{part}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(Exception, match="Malformed|FAILFAST|MALFORMED"):
        formats.read_csv(spark, path, src.schema).collect()


# ---------------------------------------------------------------------------
# JDBC bulk-import source (reference importer parity) — package-gated like
# kafka: no driver jar ships in this container, so the gate pins that the
# failure is fast and actionable and that the option plumbing up to load()
# is exercised. The projection logic itself is covered by the canonical
# sample-schema contract below (built against an in-memory frame).
# ---------------------------------------------------------------------------


def test_jdbc_source_driver_gate(spark):
    import pytest

    from metricq_db_hta_spark.sources.jdbc import jdbc_samples_source

    with pytest.raises(Exception) as ei:
        jdbc_samples_source(
            spark,
            "jdbc:mysql://localhost:3306/legacy",
            "samples",
            partition_column="timestamp",
            lower_bound=0,
            upper_bound=10**12,
        ).count()
    msg = str(ei.value)
    assert "driver" in msg.lower() or "jdbc" in msg.lower(), msg


def test_jdbc_source_requires_bounds_with_partition_column(spark):
    import pytest

    from metricq_db_hta_spark.sources.jdbc import jdbc_samples_source

    with pytest.raises(ValueError, match="lower_bound"):
        jdbc_samples_source(
            spark, "jdbc:mysql://h/db", "samples", partition_column="ts"
        )
