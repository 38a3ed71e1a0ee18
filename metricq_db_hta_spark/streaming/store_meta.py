"""Single owner of the raw-store durability metadata: the batch-directory
layout, the ``_last_commit.json`` marker, and the streaming checkpoint's
commits log. Both writers of the store — the ingest service
(`ingest_stream.StreamingIngest`) and the compaction maintenance pass
(`operators/maintenance`) — go through these helpers, so the marker format
and its semantics have exactly one implementation.

Marker semantics: ``committed_batches`` is the set of batch ids whose raw
write AND derived level state are both complete. It is updated
incrementally ((old - remove) | add, clipped to what is actually on disk)
— never recomputed as "everything on disk", because a torn batch from a
crashed writer may be on disk without being complete, and marking it
committed would permanently disable its `recover()` repair.
"""

from __future__ import annotations

import json
import os


def raw_path(store_dir: str) -> str:
    return os.path.join(store_dir, "raw")


def batch_dir(store_dir: str, batch_id: int) -> str:
    return os.path.join(raw_path(store_dir), f"ingest_batch={batch_id}")


def marker_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_last_commit.json")


def raw_batches_on_disk(store_dir: str) -> set[int]:
    """ingest_batch ids present in raw, from the directory layout — no
    data scan."""
    root = raw_path(store_dir)
    if not os.path.exists(root):
        return set()
    return {
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith("ingest_batch=")
    }


def committed_batches(store_dir: str) -> set[int]:
    path = marker_path(store_dir)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return set(json.load(f).get("committed_batches", []))


def update_commit_marker(
    store_dir: str, add: set[int], remove: set[int] = frozenset()
) -> set[int]:
    """Atomic (tmp-write + rename, A6 durability barrier) incremental
    marker update: committed := ((committed - remove) | add) ∩ on-disk.
    Returns the new committed set."""
    new = (committed_batches(store_dir) - set(remove)) | set(add)
    new &= raw_batches_on_disk(store_dir)
    path = marker_path(store_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"committed_batches": sorted(new)}, f)
    os.replace(tmp, path)
    return new


def _checkpoint_log_ids(store_dir: str, log: str) -> set[int]:
    path = os.path.join(store_dir, "_checkpoint", log)
    if not os.path.isdir(path):
        return set()
    return {int(f) for f in os.listdir(path) if f.isdigit()}


def replayable_batches(store_dir: str) -> set[int]:
    """Batch ids the streaming engine WILL replay on restart: ids with an
    offsets entry but no commits entry — the engine writes offsets, runs
    the batch, then writes the commit, so at most one id is ever in this
    state. This is the definition, not mere commits-file absence: a
    commits entry can also be missing because the engine purged it past
    ``minBatchesToRetain`` (then the offsets entry is purged too — not
    replayable) or because the checkpoint was rebuilt from scratch (no
    offsets at all — nothing can replay). Negative ids
    (backfill/compaction namespace) never appear in either log."""
    return _checkpoint_log_ids(store_dir, "offsets") - _checkpoint_log_ids(
        store_dir, "commits"
    )


def checkpoint_committed(store_dir: str, batch_id: int) -> bool:
    """True iff the checkpoint can never replay ``batch_id``. The store
    marker is written inside foreachBatch, BEFORE the engine's commit
    record, so a crash in that window leaves a batch that is
    marker-committed yet still replayable; anything that deletes or merges
    batch partitions (compaction) must additionally require this check for
    non-negative (streaming-owned) ids."""
    if batch_id < 0:
        return True
    return batch_id not in replayable_batches(store_dir)


# -- compaction journal (shared: maintenance writes it, readers honor it) --


def journal_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_compaction.json")


def read_journal(store_dir: str) -> dict | None:
    # tolerate the journal vanishing between exists and open (a concurrent
    # recover/settle just finished): absent either way
    try:
        with open(journal_path(store_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def excluded_batches_for_read(store_dir: str) -> set[int]:
    """Batch ids a READER must skip to see exactly-once data while a
    compaction journal is pending — the reader-side (non-mutating)
    counterpart of recover_compaction: in the ``writing`` state the dest
    may be partial and the sources are authoritative (skip dest); in the
    ``written`` state the dest is verified complete and any surviving
    source dirs are its duplicates (skip sources). Empty when no journal
    is pending."""
    j = read_journal(store_dir)
    if j is None:
        return set()
    if j["state"] == "writing":
        return {int(j["dest"])}
    return {int(b) for b in j["sources"]}


def data_file_count(root: str) -> int:
    """Count parquet data files under a directory tree (driver-side
    metadata walk)."""
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n
