"""Non-parquet batch sources and sinks: CSV and JSON Lines.

The engine's canonical storage is parquet (`tables.py`), but a complete
ingestion surface needs the interchange formats real pipelines hand over:
CSV exports and JSONL dumps. Both readers take an explicit schema —
schema inference scans the whole input once before the real job (at
100 TB that doubles the read), and inferred types drift between files
(an all-null column infers string), so the engine treats inference as a
dev-only convenience and production reads as schema-pinned.

Round-trip fidelity notes (tested in tests/test_formats.py):

* CSV has no types — timestamps serialize as ISO strings and doubles as
  decimal text; the pinned schema restores them exactly for the value
  domains in the fixture tables. CSV cannot carry nested/array/binary
  columns (documents/embeddings/events.props) — those raise up front
  rather than silently stringifying.
* JSONL carries numbers/strings/arrays natively; binary is not
  JSON-representable and raises up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

#: options every CSV read/write shares so a write_csv output reads back
#: identically: header row, ISO-8601 instants in UTC.
_CSV_OPTS = {
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timeZone": "UTC",
}


def _flat_only(schema: StructType, fmt: str) -> None:
    for f in schema.fields:
        t = f.dataType
        if fmt == "csv" and isinstance(t, (ArrayType, MapType, StructType)):
            raise ValueError(
                f"CSV cannot represent column {f.name!r} of type "
                f"{t.simpleString()}; use JSONL or parquet"
            )
        if isinstance(t, BinaryType):
            raise ValueError(
                f"{fmt.upper()} cannot represent binary column {f.name!r}; "
                "use parquet"
            )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-pinned CSV read. Malformed rows FAIL the job (FAILFAST) —
    an ingest source that silently nulls bad rows hides data loss."""
    _flat_only(schema, "csv")
    return (
        spark.read.schema(schema)
        .options(**_CSV_OPTS, mode="FAILFAST")
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    _flat_only(df.schema, "csv")
    df.write.options(**_CSV_OPTS).mode("overwrite").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-pinned JSON-Lines read (one object per line — the standard
    corpus dump format). FAILFAST for the same reason as CSV."""
    _flat_only(schema, "json")
    return (
        spark.read.schema(schema)
        .options(mode="FAILFAST", timeZone="UTC")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    _flat_only(df.schema, "json")
    df.write.options(timeZone="UTC", ignoreNullFields="false").mode(
        "overwrite"
    ).json(path)
