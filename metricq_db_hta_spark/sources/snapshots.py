"""Snapshot-pinned raw-store reads (the manifest protocol's reader side).

A root-listing reader (``spark.read.parquet(store/raw)``) races
compaction twice: between its journal read and its file listing
(TOCTOU — the journal can flip states in between, making the reader
skip BOTH copies or read both), and between the dest write and the
source deletes (double copy). ``read_raw_snapshot`` removes both races
the way a transactional table format does (reference A6 flush barrier,
/root/reference/src/async_hta_service.hpp:308, generalized to
reader-visible atomicity): it opens ``_snapshots/CURRENT`` exactly once
and reads exactly the immutable batch dirs that manifest version pins —
no directory listing, no journal consultation, one atomic decision
point. Combined with deferred-delete compaction
(``compact_raw(defer_source_delete=True)``) and a vacuum grace sized
above the longest read, a reader holds a consistent table version for
its whole lifetime even while compaction rewrites the store under it.

At 100 TB the manifest stays metadata-sized: it lists BATCH ids (dirs
are immutable once committed), not files, so a store with thousands of
batches has a manifest of a few KB read once per query on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from metricq_db_hta_spark.streaming import store_meta


def read_raw_snapshot(spark: SparkSession, store_dir: str) -> DataFrame:
    """The raw store pinned to the CURRENT manifest version. Raises when
    the store has never published (pre-snapshot stores: use the
    journal-honoring listing reader in plans/serve.py) and when a pinned
    batch dir is missing — the latter means vacuum's grace was shorter
    than this reader's staleness, the operator misconfiguration the
    strict error exists to surface."""
    snap = store_meta.current_snapshot(store_dir)
    if snap is None:
        raise ValueError(
            f"no snapshot manifest published under {store_dir} - any "
            "commit (ingest/backfill/compaction/recover) publishes one"
        )
    if not snap["batches"]:
        raise ValueError(
            f"snapshot v{snap['version']} of {store_dir} is empty"
        )
    paths = []
    for b in snap["batches"]:
        d = store_meta.batch_dir(store_dir, int(b))
        if not os.path.exists(d):
            raise RuntimeError(
                f"snapshot v{snap['version']} pins batch {b} but its dir "
                "is gone - vacuum grace shorter than reader staleness?"
            )
        paths.append(d)
    # schema-pinned read (sources/rawstore.py): basePath keeps the
    # partition columns even though we enumerate leaf dirs explicitly
    from metricq_db_hta_spark.sources.rawstore import read_raw

    return read_raw(spark, store_dir, paths=paths)
