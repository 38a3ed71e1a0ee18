"""Small-file compaction for the raw ingest store (OPTIMIZE-style
maintenance).

Why this exists at 100 TB: streaming ingest writes one file set per
microbatch per touched (metric, month) partition — after a week of
5-second microbatches a single partition holds thousands of KB-sized
files, and every history read pays an open/footer-parse per file
(`spark.sql.files.openCostInBytes` models exactly this tax). Table
formats solve it with OPTIMIZE / rewrite_data_files; on the plain-parquet
store this module is that operation, built on the same batch-id
namespace and commit-marker durability contract as the writer
(`streaming/ingest_stream.py::StreamingIngest`).

Protocol (write-new-then-delete, journaled):

1. Pick source batch ids: COMMITTED ids only (the marker is the
   replay barrier — a committed batch can never be replayed by the
   streaming checkpoint, so merging it into a new id cannot race a
   replay; uncommitted ids stay untouched and self-heal as usual).
2. Allocate the destination id from the same descending-negative
   allocator as backfill (min(on-disk, 0) - 1): one namespace, no
   collisions by construction.
3. Journal ``_compaction.json`` (atomic tmp+rename) with
   ``state=writing``, then rewrite the sources' rows under the dest id,
   repartitioned to one task per (metric, month) partition — the shuffle
   IS the compaction: each output partition lands as one right-sized
   file instead of one-per-source-batch.
4. Verify dest row count == source row count (parquet footer counts, no
   data pages), journal ``state=written``, delete the source partition
   dirs, refresh the commit marker, remove the journal.

Crash recovery (:func:`recover_compaction`): ``writing`` -> the dest id
is torn garbage and the sources are intact: delete dest, drop journal.
``written`` -> dest is complete: finish deleting sources, refresh the
marker, drop journal. Both idempotent.

Concurrency contract: like every plain-parquet OPTIMIZE, compaction
assumes a quiesced maintenance window — between the dest write and the
source delete, raw briefly holds both copies, so a concurrent reader
could double-count and a concurrent ``recover()`` would treat the
not-yet-committed dest id as torn. A transactional table format (Delta /
Iceberg, unavailable in this container — README) removes that window;
the journal bounds it to exactly one recover call.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

RAW_COLS = ["metric", "ts_ns", "value", "event_id", "delta_ns"]


@dataclass(frozen=True)
class CompactionPlan:
    sources: list[int]  # committed batch ids to merge
    dest: int  # allocated destination batch id
    n_files_before: int  # data files across the source batches


@dataclass(frozen=True)
class CompactionResult:
    sources: list[int]
    dest: int
    n_files_before: int
    n_files_after: int
    n_rows: int


def _raw_path(store_dir: str) -> str:
    return os.path.join(store_dir, "raw")


def _journal_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_compaction.json")


def _batch_dir(store_dir: str, batch_id: int) -> str:
    return os.path.join(_raw_path(store_dir), f"ingest_batch={batch_id}")


def _on_disk_batches(store_dir: str) -> set[int]:
    raw = _raw_path(store_dir)
    if not os.path.exists(raw):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(raw)
        if name.startswith("ingest_batch=")
    }


def _committed_batches(store_dir: str) -> set[int]:
    marker = os.path.join(store_dir, "_last_commit.json")
    if not os.path.exists(marker):
        return set()
    with open(marker) as f:
        return set(json.load(f).get("committed_batches", []))


def _write_commit_marker(store_dir: str) -> None:
    # same atomic tmp+rename as StreamingIngest._write_commit_marker: the
    # marker must reflect exactly the on-disk batch set after compaction,
    # or recover() would "repair" batches that no longer exist
    marker = {"committed_batches": sorted(_on_disk_batches(store_dir))}
    path = os.path.join(store_dir, "_last_commit.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(marker, f)
    os.replace(tmp, path)


def _count_data_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _write_journal(store_dir: str, state: dict) -> None:
    tmp = _journal_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _journal_path(store_dir))


def plan_compaction(store_dir: str, min_batches: int = 2) -> CompactionPlan | None:
    """Metadata-only planning (directory walk, no data scan — the same
    driver-side role Delta's OPTIMIZE planner plays): merge every
    committed batch when there are at least ``min_batches`` of them.
    Returns None when there is nothing worth doing."""
    committed = sorted(_committed_batches(store_dir) & _on_disk_batches(store_dir))
    if len(committed) < min_batches:
        return None
    n_files = sum(
        _count_data_files(_batch_dir(store_dir, b)) for b in committed
    )
    # the backfill/compaction shared allocator: next id below everything
    dest = min(min(_on_disk_batches(store_dir)), 0) - 1
    return CompactionPlan(sources=committed, dest=dest, n_files_before=n_files)


def compact_raw(
    spark: SparkSession, store_dir: str, min_batches: int = 2
) -> CompactionResult | None:
    """Execute the journaled write-new-then-delete protocol. One shuffle
    keyed on the physical partition columns (metric, month) — every output
    partition is written by exactly one task, so N source files per
    partition become one."""
    if os.path.exists(_journal_path(store_dir)):
        raise RuntimeError(
            "unfinished compaction journal present - run recover_compaction()"
        )
    plan = plan_compaction(store_dir, min_batches=min_batches)
    if plan is None:
        return None
    raw = spark.read.parquet(_raw_path(store_dir))
    tcol = "ts_date" if "ts_date" in raw.columns else "ts_month"
    src = raw.filter(F.col("ingest_batch").isin(plan.sources))
    n_src_rows = src.count()  # parquet footer counts: no data pages read

    _write_journal(
        store_dir,
        {"state": "writing", "sources": plan.sources, "dest": plan.dest},
    )
    (
        src.select(*RAW_COLS, tcol)
        .withColumn("ingest_batch", F.lit(plan.dest))
        .repartition("metric", tcol)
        # ts-sorted output files: compaction is the one cheap moment to
        # cluster rows so parquet row-group min/max on ts_ns actually
        # prunes (source batches interleave arbitrary time slices)
        .sortWithinPartitions("metric", tcol, "ts_ns")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch", "metric", tcol)
        .parquet(_raw_path(store_dir))
    )
    # verification barrier before any delete becomes possible
    dest_rows = (
        spark.read.parquet(_raw_path(store_dir))
        .filter(F.col("ingest_batch") == plan.dest)
        .count()
    )
    if dest_rows != n_src_rows:
        raise RuntimeError(
            f"compaction verify failed: dest {dest_rows} != sources {n_src_rows}"
        )
    _write_journal(
        store_dir,
        {"state": "written", "sources": plan.sources, "dest": plan.dest},
    )
    for b in plan.sources:
        shutil.rmtree(_batch_dir(store_dir, b), ignore_errors=True)
    _write_commit_marker(store_dir)
    os.remove(_journal_path(store_dir))
    n_after = _count_data_files(_batch_dir(store_dir, plan.dest))
    return CompactionResult(
        sources=plan.sources,
        dest=plan.dest,
        n_files_before=plan.n_files_before,
        n_files_after=n_after,
        n_rows=n_src_rows,
    )


def recover_compaction(store_dir: str) -> str:
    """Finish or roll back a torn compaction. Returns the action taken:
    ``"none"`` (no journal), ``"rolled_back"`` (dest deleted, sources
    intact), or ``"completed"`` (source deletes finished, marker
    refreshed)."""
    path = _journal_path(store_dir)
    if not os.path.exists(path):
        return "none"
    with open(path) as f:
        j = json.load(f)
    if j["state"] == "writing":
        # dest may be partial; sources are untouched -> roll back
        shutil.rmtree(_batch_dir(store_dir, j["dest"]), ignore_errors=True)
        os.remove(path)
        return "rolled_back"
    # state == written: dest verified complete -> roll forward
    for b in j["sources"]:
        shutil.rmtree(_batch_dir(store_dir, b), ignore_errors=True)
    _write_commit_marker(store_dir)
    os.remove(path)
    return "completed"
