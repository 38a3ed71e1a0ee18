"""Small-file compaction for the raw ingest store (OPTIMIZE-style
maintenance).

Why this exists at 100 TB: streaming ingest writes one file set per
microbatch per touched (metric, month) partition — after a week of
5-second microbatches a single partition holds thousands of KB-sized
files, and every history read pays an open/footer-parse per file
(`spark.sql.files.openCostInBytes` models exactly this tax). Table
formats solve it with OPTIMIZE / rewrite_data_files; on the plain-parquet
store this module is that operation, built on the same batch-id
namespace and commit-marker durability contract as the writer — the
marker format has one owner, `streaming/store_meta.py`, shared with
`streaming/ingest_stream.py::StreamingIngest`.

Protocol (write-new-then-delete, journaled):

1. Pick source batch ids: ids that are BOTH store-marker-committed and —
   for non-negative (streaming-owned) ids — recorded in the streaming
   checkpoint's commits log. The marker alone is not a replay barrier:
   it is written inside foreachBatch, before the engine's own commit
   record, so a crash in that window leaves a marker-committed batch the
   checkpoint will still replay on restart; merging it away would let
   the replay resurrect it (duplicate rows). The checkpoint commits file
   is the engine's replay barrier, so requiring both closes the window.
   Uncommitted ids stay untouched and self-heal as usual.
2. Reserve the destination id from the locked allocator backfill shares
   (store_meta.allocate_negative_batch_id): one namespace, and a
   concurrent backfill can never compute the same id (fuzz class 20).
3. Journal ``_compaction.json`` (atomic tmp+rename) with
   ``state=writing``, then rewrite the sources' rows under the dest id,
   repartitioned to one task per (metric, month) partition — the shuffle
   IS the compaction: each output partition lands as one right-sized,
   ts-sorted file instead of one-per-source-batch.
4. Verify dest row count == source row count (parquet footer counts, no
   data pages), journal ``state=written``, delete the source partition
   dirs (STRICT: a failed delete keeps the journal so recovery can
   retry — silently proceeding would commit duplicated rows), update the
   marker incrementally ((committed - sources) | {dest} — never
   "everything on disk", which would mark unrelated torn batches
   committed and disable their recover() repair), remove the journal.

Crash recovery (:func:`recover_compaction`): ``writing`` -> the dest id
is torn garbage and the sources are intact: delete dest (strict — a
partial dest left on disk is an uncommitted batch recover() would try to
"repair" levels from), drop journal. ``written`` -> dest is complete:
finish deleting sources, update the marker, drop journal. Both
idempotent.

Concurrency contract: like every plain-parquet OPTIMIZE, compaction
assumes a quiesced maintenance window — between the dest write and the
source delete, raw briefly holds both copies, so a concurrent reader
could double-count. A transactional table format (Delta / Iceberg,
unavailable in this container — README) removes that window; the journal
bounds it to exactly one recover call.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.streaming import store_meta

# the raw column list + tolerant select live with the pinned reader
# (sources/rawstore.py) — one owner for the raw schema end to end
from metricq_db_hta_spark.sources.rawstore import (  # noqa: E402
    RAW_COLS,
    raw_col_exprs as _raw_col_exprs,
)


@dataclass(frozen=True)
class CompactionPlan:
    sources: list[int]  # committed + replay-barriered batch ids to merge
    #: destination batch id — None from the PURE planner
    #: (plan_compaction); compact_raw reserves the real id via the locked
    #: allocator only when it commits to executing the plan
    dest: int | None
    n_files_before: int  # data files across the source batches


@dataclass(frozen=True)
class CompactionResult:
    sources: list[int]
    dest: int
    n_files_before: int
    n_files_after: int
    n_rows: int


# thin aliases: the journal location/format and file counting are owned by
# store_meta (readers honor the journal via excluded_batches_for_read)
_journal_path = store_meta.journal_path
_count_data_files = store_meta.data_file_count


def _data_bytes(root: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(root):
        total += sum(
            os.path.getsize(os.path.join(dirpath, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def _write_journal(store_dir: str, state: dict) -> None:
    tmp = _journal_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _journal_path(store_dir))


def _rmtree_strict(path: str) -> None:
    """Delete a batch dir and VERIFY it is gone — a silently surviving
    source dir after the marker update means permanently duplicated rows,
    so a failed delete must surface (the journal stays, recovery retries)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    if os.path.exists(path):
        raise RuntimeError(f"failed to delete {path}")


def plan_compaction(store_dir: str, min_batches: int = 2) -> CompactionPlan | None:
    """Metadata-only planning (directory walk, no data scan — the same
    driver-side role Delta's OPTIMIZE planner plays): merge every batch
    that is committed AND past the streaming replay barrier, when there
    are at least ``min_batches`` of them. Returns None when there is
    nothing worth doing."""
    on_disk = store_meta.raw_batches_on_disk(store_dir)
    replayable = store_meta.replayable_batches(store_dir)  # listed ONCE
    sources = sorted(
        b
        for b in store_meta.committed_batches(store_dir) & on_disk
        if b < 0 or b not in replayable
    )
    if len(sources) < min_batches:
        return None
    n_files = sum(
        _count_data_files(store_meta.batch_dir(store_dir, b)) for b in sources
    )
    # dest stays None here so planning keeps its advertised purity (dry
    # runs, status probes, read-only stores); compact_raw reserves the
    # real id from the locked shared allocator at execution time
    return CompactionPlan(sources=sources, dest=None, n_files_before=n_files)


#: target compacted file size. 128 MB matches
#: spark.sql.files.maxPartitionBytes, so a later scan maps one compacted
#: file to one task with no further splitting or coalescing.
TARGET_FILE_BYTES = 128 * 1024 * 1024


def compact_raw(
    spark: SparkSession,
    store_dir: str,
    min_batches: int = 2,
    target_file_bytes: int = TARGET_FILE_BYTES,
    defer_source_delete: bool = False,
) -> CompactionResult | None:
    """Execute the journaled write-new-then-delete protocol. One shuffle
    keyed on the physical partition columns (metric, month) — every output
    partition is written by one task, so N source files per partition
    become one — EXCEPT a hot partition whose rows exceed
    ``target_file_bytes``: ``maxRecordsPerFile`` (records estimated from
    the sources' measured bytes/row) rolls such partitions into multiple
    right-sized files, so a 10 GB metric-month at 100 TB never becomes
    one 10 GB file.

    ``defer_source_delete=True`` is the snapshot-isolated mode (the
    store_meta manifest protocol): instead of deleting the verified
    sources it RETIRES them — readers skip them immediately (via the
    manifest or ``excluded_batches_for_read``), a reader pinned to the
    previous snapshot version keeps its files on disk, and
    :func:`vacuum` deletes them after a grace period. This closes the
    concurrent-reader window the plain delete path documents below."""
    if os.path.exists(_journal_path(store_dir)):
        raise RuntimeError(
            "unfinished compaction journal present - run recover_compaction()"
        )
    store_meta.require_committed_batches_on_disk(store_dir, "compacting raw")
    plan = plan_compaction(store_dir, min_batches=min_batches)
    if plan is None:
        return None
    # the backfill/compaction shared allocator — a locked RESERVATION, not
    # a local min(on_disk)-1 (which a concurrent backfill could also
    # compute: the colliding append then swaps over this dest — fuzz
    # class 20). Reserved only now, when the plan actually executes.
    dest = store_meta.allocate_negative_batch_id(store_dir)
    from metricq_db_hta_spark.sources.rawstore import read_raw

    raw_root = store_meta.raw_path(store_dir)
    raw = read_raw(spark, store_dir)
    tcol = "ts_date" if "ts_date" in raw.columns else "ts_month"
    src = raw.filter(F.col("ingest_batch").isin(plan.sources))
    n_src_rows = src.count()  # parquet footer counts: no data pages read
    # bytes/row measured from the sources themselves (compressed, with
    # their real column mix) — the best available estimator for sizing
    # output files without writing them first
    src_bytes = sum(
        _data_bytes(store_meta.batch_dir(store_dir, b)) for b in plan.sources
    )
    bytes_per_row = max(1, src_bytes // max(1, n_src_rows))
    max_records = max(1, target_file_bytes // bytes_per_row)

    _write_journal(
        store_dir,
        {
            "state": "writing",
            "sources": plan.sources,
            "dest": dest,
            "defer": bool(defer_source_delete),
        },
    )
    # heartbeat the journal mtime while the dest write runs, so the
    # recover_compaction liveness guard can distinguish a live long write
    # from a dead one regardless of how long the shuffle takes
    stop_beat = threading.Event()

    def _beat() -> None:
        while not stop_beat.wait(_HEARTBEAT_S):
            try:
                os.utime(_journal_path(store_dir))
            except FileNotFoundError:
                return

    beat = threading.Thread(target=_beat, daemon=True)
    beat.start()
    try:
        (
            src.select(*_raw_col_exprs(src), tcol)
            .withColumn("ingest_batch", F.lit(dest))
            .repartition("metric", tcol)
            # ts-sorted output files: compaction is the one cheap moment
            # to cluster rows so parquet row-group min/max on ts_ns
            # actually prunes (source batches interleave arbitrary time
            # slices)
            .sortWithinPartitions("metric", tcol, "ts_ns")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(max_records))
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", "metric", tcol)
            .parquet(raw_root)
        )
        # verification barrier before any delete becomes possible
        dest_rows = (
            read_raw(spark, store_dir)
            .filter(F.col("ingest_batch") == dest)
            .count()
        )
    finally:
        stop_beat.set()
    if dest_rows != n_src_rows:
        raise RuntimeError(
            f"compaction verify failed: dest {dest_rows} != sources {n_src_rows}"
        )
    _write_journal(
        store_dir,
        {
            "state": "written",
            "sources": plan.sources,
            "dest": dest,
            "defer": bool(defer_source_delete),
        },
    )
    if defer_source_delete:
        _finish_retire(store_dir, plan.sources, dest)
    else:
        _finish_deletes(store_dir, plan.sources, dest)
    n_after = _count_data_files(store_meta.batch_dir(store_dir, dest))
    return CompactionResult(
        sources=plan.sources,
        dest=dest,
        n_files_before=plan.n_files_before,
        n_files_after=n_after,
        n_rows=n_src_rows,
    )


def _finish_retire(store_dir: str, sources: list[int], dest: int) -> None:
    """The deferred-delete roll-forward tail (compact_raw and recovery
    share it; every step idempotent): retire the sources FIRST — from
    that instant every reader path skips them, before they leave the
    committed set — then the marker update (which republishes the
    snapshot manifest: the new CURRENT has dest, not sources), then the
    journal drop. Source dirs stay on disk for pinned readers until
    :func:`vacuum`'s grace expires."""
    store_meta.retire_batches(store_dir, set(sources))
    store_meta.update_commit_marker(store_dir, add={dest}, remove=set(sources))
    try:
        os.remove(_journal_path(store_dir))
    except FileNotFoundError:
        pass


def vacuum(store_dir: str, grace_s: float = 15 * 60.0) -> list[int]:
    """Delete retired batch dirs whose grace period has expired (Delta's
    VACUUM analogue for the deferred-delete compaction mode). Size
    ``grace_s`` above the longest-running read against this store — a
    reader pinned to an older snapshot version keeps working for exactly
    that long after its data was compacted away. Strict deletes, entry
    cleared per batch after its delete verifies, so a crash mid-vacuum
    retries the remainder on the next call. Returns the vacuumed ids."""
    snap = store_meta.current_snapshot(store_dir)
    keep = set(snap["batches"]) if snap is not None else set()
    now = time.time()
    vacuumed: list[int] = []
    for b, retired_at in sorted(store_meta.retired_batches(store_dir).items()):
        if b in keep or (now - retired_at) < grace_s:
            continue
        _rmtree_strict(store_meta.batch_dir(store_dir, b))
        store_meta.clear_retired(store_dir, {b})
        vacuumed.append(b)
    return vacuumed


def _finish_deletes(store_dir: str, sources: list[int], dest: int) -> None:
    """The roll-forward tail shared by compact_raw and recovery: strict
    source deletes, then the incremental marker update, then journal
    removal — in that order, so any failure leaves the 'written' journal
    in place and recovery can retry."""
    for b in sources:
        _rmtree_strict(store_meta.batch_dir(store_dir, b))
    store_meta.update_commit_marker(store_dir, add={dest}, remove=set(sources))
    # missing_ok: a concurrent/settling recover_compaction may have already
    # finished and removed the journal — both paths are idempotent
    try:
        os.remove(_journal_path(store_dir))
    except FileNotFoundError:
        pass


#: a writing-state journal younger than this is presumed to belong to a
#: LIVE compaction (compact_raw heartbeats the journal mtime every
#: _HEARTBEAT_S while its dest write runs, so a live job's journal is
#: never older than ~2x the heartbeat)
LIVENESS_WINDOW_S = 15 * 60
_HEARTBEAT_S = 60


def _journal_age(store_dir: str) -> float | None:
    """Seconds since the journal's last heartbeat, or None when it was
    settled concurrently — the ONE freshness probe both liveness guards
    below share."""
    try:
        return time.time() - os.path.getmtime(_journal_path(store_dir))
    except FileNotFoundError:
        return None


def recover_compaction(
    store_dir: str, force: bool = False, skip_live: bool = False
) -> str:
    """Finish or roll back a torn compaction. Returns the action taken:
    ``"none"`` (no journal), ``"live"`` (``skip_live`` and the journal is
    fresh — a compaction appears to be RUNNING; nothing touched),
    ``"rolled_back"`` (dest deleted, sources intact), or ``"completed"``
    (source deletes finished, marker updated).

    Liveness guard: a FRESH ``writing``-state journal may belong to a
    compaction that is still running (compact_raw heartbeats the journal
    mtime during its write) — rolling it back would delete the dest
    partitions out from under the live job, so this raises instead
    unless ``force=True``. ``skip_live=True`` (the ingest writer's entry
    settle, r14) neither raises nor acts on a fresh journal of EITHER
    state: the writer can proceed — its reads exclude the journal's
    pending side via ``excluded_batches_for_read`` — and a concurrent
    roll-forward of a fresh ``written`` journal would race the live
    compactor's own source deletes (two rmtrees of the same dirs). A
    stale journal (dead compactor) settles as before."""
    j = store_meta.read_journal(store_dir)
    if j is None:
        return "none"
    if skip_live and not force:
        age = _journal_age(store_dir)
        if age is None:
            return "none"  # settled concurrently
        if age < LIVENESS_WINDOW_S:
            return "live"
    if j["state"] == "writing":
        if not force:
            age = _journal_age(store_dir)
            if age is None:
                return "none"  # settled concurrently
            if age < LIVENESS_WINDOW_S:
                raise RuntimeError(
                    "compaction journal is fresh (writing state, "
                    f"{age:.0f}s old) - a compaction may still be running; "
                    "wait for it or pass force=True"
                )
        # dest may be partial; sources are untouched -> roll back. Strict:
        # a surviving partial dest is an uncommitted batch that recover()
        # would otherwise "repair" derived levels from.
        _rmtree_strict(store_meta.batch_dir(store_dir, j["dest"]))
        try:
            os.remove(_journal_path(store_dir))
        except FileNotFoundError:
            pass
        return "rolled_back"
    # state == written: dest verified complete -> roll forward, honoring
    # the journaled delete mode (a deferred compaction's crash recovery
    # must retire, not delete — pinned readers may hold the sources)
    if j.get("defer"):
        _finish_retire(store_dir, j["sources"], j["dest"])
    else:
        _finish_deletes(store_dir, j["sources"], j["dest"])
    return "completed"
