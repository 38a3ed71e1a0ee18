"""Consistent store backup built on the snapshot manifest.

The reference's disaster-recovery story is "copy /var/hta while the
service is stopped" (one directory per metric, Dockerfile:39-40). At
100 TB a cold copy window does not exist, so this module produces a
CONSISTENT copy while a writer may be running, using invariants the
store already maintains:

* **Raw** is copied pinned to the CURRENT snapshot manifest
  (streaming/store_meta.py): batch dirs are immutable once committed and
  the manifest names exactly one consistent committed set, so the copy
  can never capture a torn or replay-pending batch regardless of
  concurrent microbatches. The copied commit marker is rewritten to
  exactly the pinned set.
* **Level / hist / counter tables** are copied as-is. Partitions below the
  retention floor are immutable by construction (expired raw cannot be
  re-imported — the backfill guard — and live writes only touch
  partitions their new data lands in), so the only tearing risk is the
  RECENT partitions a concurrent writer is overwriting. The backup
  records this honestly: run ``fsck --repair`` on the copy to rebuild
  any torn recent partition from the copied raw (pre-floor history is
  out of repair scope and consistent by the immutability argument).
* ``_retention.json``, the ``drops_log`` observability table (tiny by
  design — one row per dropping metric per microbatch) and the snapshot
  ledger ride along; the streaming
  ``_checkpoint`` does NOT — it belongs to the source's stream, and the
  copy starts life as a backfill-style store (a new writer builds a
  fresh checkpoint; the copied marker makes every copied batch
  non-replayable by definition).

The output directory IS a valid store: point ``serve`` / ``fsck`` /
``backfill`` at it directly — "restore" is a rename. Driver-side file
copy (shutil): at cluster scale the same manifest-pinned file list is
what you hand to distcp/s3 sync; the selection logic, not the byte
mover, is the part worth owning here.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from metricq_db_hta_spark.streaming import store_meta


@dataclass(frozen=True)
class BackupResult:
    batches: list[int]  # raw batch ids captured (the pinned snapshot)
    snapshot_version: int
    n_files: int
    n_bytes: int
    tables: list[str]  # level_/hist_/counter_ tables captured (+drops_log)


def _copy_tree(src: str, dst: str) -> tuple[int, int]:
    n_files = n_bytes = 0
    for dirpath, _dirs, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            if f.endswith(".crc") or f == "_SUCCESS":
                continue  # job-commit debris, not data
            p = os.path.join(dirpath, f)
            shutil.copy2(p, os.path.join(out, f))
            n_files += 1
            n_bytes += os.path.getsize(p)
    return n_files, n_bytes


def backup_store(store_dir: str, dest_dir: str) -> BackupResult:
    """Produce a consistent, self-contained copy of ``store_dir`` at
    ``dest_dir`` (must not exist). Raises if the store never published a
    snapshot (no committed data — nothing consistent to pin)."""
    snap = store_meta.current_snapshot(store_dir)
    if snap is None:
        raise ValueError(
            f"{store_dir} has no snapshot manifest (no committed batch) - "
            "nothing consistent to back up"
        )
    if os.path.exists(dest_dir):
        raise ValueError(f"backup destination already exists: {dest_dir}")
    os.makedirs(dest_dir)
    batches = [int(b) for b in snap["batches"]]
    n_files = n_bytes = 0
    # raw: exactly the pinned batch set
    for b in batches:
        src = store_meta.batch_dir(store_dir, b)
        f, by = _copy_tree(src, store_meta.batch_dir(dest_dir, b))
        n_files += f
        n_bytes += by
    # derived tables + metadata that defines the store's read contract
    tables = []
    for name in sorted(os.listdir(store_dir)):
        head, _, tail = name.partition("_")
        if head in ("level", "hist", "counter") and tail.isdigit():
            f, by = _copy_tree(
                os.path.join(store_dir, name), os.path.join(dest_dir, name)
            )
            n_files += f
            n_bytes += by
            tables.append(name)
    # drops_log through the torn-swap-aware resolver: a store crashed
    # between _swap_drops' rename-out and rename-in holds the table only
    # as ``drops_log.swap_old`` — a name-filter copy would silently back
    # up NO drops_log at all. The resolved root is copied under the live
    # name, so the backup is clean even when the source is mid-swap.
    from metricq_db_hta_spark.operators.erase import _drops_root_for_read

    droot = _drops_root_for_read(store_dir)
    if droot is not None:
        f, by = _copy_tree(droot, os.path.join(dest_dir, "drops_log"))
        n_files += f
        n_bytes += by
        tables.append("drops_log")
    for meta in ("_retention.json",):
        p = os.path.join(store_dir, meta)
        if os.path.exists(p):
            shutil.copy2(p, os.path.join(dest_dir, meta))
    # marker = exactly the pinned set (update_commit_marker clips to
    # on-disk and republishes a fresh snapshot ledger for the copy)
    store_meta.update_commit_marker(dest_dir, add=set(batches))
    return BackupResult(
        batches=sorted(batches),
        snapshot_version=int(snap["version"]),
        n_files=n_files,
        n_bytes=n_bytes,
        tables=tables,
    )
