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


def checkpoint_committed(store_dir: str, batch_id: int) -> bool:
    """True iff the STREAMING engine has durably recorded ``batch_id`` in
    its checkpoint commits log — i.e. the checkpoint can never replay it.
    The store marker is written inside foreachBatch, BEFORE the engine's
    commit record, so a crash in that window leaves a batch that is
    marker-committed yet still replayable; anything that deletes or merges
    batch partitions (compaction) must additionally require this check for
    non-negative (streaming-owned) ids. Negative ids (backfill/compaction
    namespace) have no checkpoint and are never replayed by the engine."""
    if batch_id < 0:
        return True
    return os.path.exists(
        os.path.join(store_dir, "_checkpoint", "commits", str(batch_id))
    )
