"""Schema-pinned raw-store reader — the ONE way to open ``store/raw``.

Why pinning matters: ``spark.read.parquet(raw)`` infers the schema from a
single file footer. On a store mixing pre-r11 batches (no ``prev_value``
column) with r11 batches, the inspected footer is typically the OLDEST
batch (lexicographic listing), which makes the persisted ``prev_value``
column invisible for EVERY row — stored-attribution counter reads return
NULL increases, and worse, compaction would rewrite r11 rows into its
dest with ``prev_value`` synthesized to NULL, destroying the stored chain
irreversibly (r12 review finding). ``mergeSchema`` would also fix
visibility but reads every footer; pinning the schema reads none — the
declared columns resolve per file, absent ones as NULL, which is exactly
the pre-r11 under-count rule the readers already apply.

The data-column layout is owned by the writer
(``streaming/ingest_stream.KEPT_SCHEMA`` minus the drop counters,
``operators/maintenance.RAW_COLS``); the time partition column
(``ts_month``/``ts_date``) varies per store and is discovered from the
directory layout — only the store's actual one is pinned, because an
all-NULL phantom time column would make ``_time_pruned``'s date filters
drop every row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark.sql import functions as F

from metricq_db_hta_spark.streaming import store_meta

#: the raw table's logical column list (partition column aside) — owned
#: here with the schema; ``raw_col_exprs`` is the tolerant select every
#: raw writer/rewriter uses
RAW_COLS = ["metric", "ts_ns", "value", "event_id", "delta_ns", "prev_value"]


def raw_col_exprs(df) -> list:
    """Tolerant RAW_COLS select: an input predating ``prev_value``
    (pre-r11 rows) must not fail (nor invent values) — the column
    synthesizes to NULL, the same under-count rule the readers apply.
    One implementation for the ingest sink and compaction rewrite, so
    the two cannot drift when the raw schema next grows."""
    return [
        F.col(c)
        if c in df.columns
        else F.lit(None).cast("double").alias(c)
        for c in RAW_COLS
    ]


#: data columns persisted inside the parquet files (partition columns —
#: ingest_batch, metric, ts_month/ts_date — live in the directory names)
_DATA_FIELDS = [
    StructField("ts_ns", LongType()),
    StructField("value", DoubleType()),
    StructField("event_id", LongType()),
    StructField("delta_ns", LongType()),
    StructField("prev_value", DoubleType()),
]


def raw_time_partition(store_dir: str) -> str:
    """The store's raw time-partition column name, discovered from the
    first leaf directory (``StreamingIngest.raw_partition`` writes
    exactly one of ``ts_month``/``ts_date`` per store). Defaults to
    ``ts_month`` (the writer default) for an empty store."""
    root = store_meta.raw_path(store_dir)
    try:
        for b in sorted(os.listdir(root)):
            if not b.startswith("ingest_batch="):
                continue
            bdir = os.path.join(root, b)
            for m in os.listdir(bdir):
                if not m.startswith("metric="):
                    continue
                for t in os.listdir(os.path.join(bdir, m)):
                    col, eq, _ = t.partition("=")
                    if eq and col in ("ts_month", "ts_date"):
                        return col
    except FileNotFoundError:
        pass
    return "ts_month"


def raw_schema(time_col: str) -> StructType:
    return StructType(
        [
            *_DATA_FIELDS,
            StructField("ingest_batch", IntegerType()),
            StructField("metric", StringType()),
            StructField(time_col, DateType()),
        ]
    )


def read_raw(
    spark: SparkSession,
    store_dir: str,
    paths: list[str] | None = None,
) -> DataFrame:
    """Open the raw store with the pinned schema. ``paths`` (snapshot
    readers) enumerates batch dirs explicitly; ``basePath`` keeps the
    partition columns either way. No filtering is applied here — batch
    visibility (committed / retired / journal exclusions) stays with the
    callers, who own those policies."""
    root = store_meta.raw_path(store_dir)
    reader = spark.read.schema(raw_schema(raw_time_partition(store_dir)))
    if paths is not None:
        return reader.option("basePath", root).parquet(*paths)
    return reader.parquet(root)
