"""Per-metric store surgery: erase or rename one metric's stored history.

Targeted metric erasure: remove EVERY stored trace of one metric.

The operational need the TTL pass (operators/retention.py) cannot serve:
a decommissioned sensor, a mis-keyed ingest, or a data-removal request
wants ONE metric gone from a store while every other metric's history
stays byte-identical. The reference has no such tool — its store is one
file tree per metric, so its operators delete directories by hand; this
store's layout makes the same surgery principled:

* raw is partitioned ``ingest_batch=N/metric=M/<timecol>=D`` and every
  level/hist table ``metric=M/bucket_month=D`` (streaming/
  ingest_stream.py write layout), so erasure is a metric-directory
  delete per table — metadata-only, zero data bytes read, any store
  size.
* ``drops_log`` rows carry the metric name (observability counts); a
  complete erasure rewrites that (tiny, one row per dropping metric per
  batch) table without the metric's rows — the only step that needs a
  SparkSession.

Complete-or-refuse contract (stricter than retention, which *skips*
non-barriered batches and leaves the floor as a promise): "delete metric
M" is only honest if nothing can resurrect M, so the pass refuses up
front when

* a compaction journal is pending (same rule as retention/compaction:
  settle with ``recover_compaction`` first),
* any batch dir holding M is not marker-committed (a torn batch is
  ``recover()``'s property; an in-flight writer means the store is live
  on the ingest path — stop it first), or
* any batch holding M is still inside the streaming replay barrier
  (``store_meta.checkpoint_committed``): a checkpoint replay would
  rewrite M's partitions after we deleted them.

Batches left empty by the erasure are removed and de-committed
(``update_commit_marker`` — republishes the snapshot manifest), exactly
like fully-expired batches in retention.

What erasure deliberately does NOT touch:

* the streaming checkpoint's per-metric monotonic watermark state — the
  store keeps no readable trace of M there, and a later re-ingest of M
  under a live checkpoint simply starts from whatever watermark state
  says; a from-scratch re-ingest wants a fresh checkpoint anyway (the
  backup copy starts checkpoint-free for the same reason,
  operators/backup.py).
* ``_retention.json`` floors — they are per-table promises, not
  per-metric data.

Reader caveat (same class as ``maintenance.vacuum``): deleting
``metric=M`` subdirs mutates committed batch dirs, so a snapshot-pinned
reader that listed files before the pass can hit missing files mid-scan.
Run erasure from the maintenance role like compaction/vacuum; readers
re-opened after the pass (or refreshed via the serve ``refresh`` type)
see the consistent post-erase store, and ``fsck`` audits green — the
metric is absent from raw and levels alike.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from urllib.parse import unquote

from metricq_db_hta_spark.streaming import store_meta


@dataclass(frozen=True)
class EraseResult:
    raw_dirs: int            # metric partition dirs removed from raw batches
    table_dirs: int          # metric dirs removed from level_*/hist_* tables
    emptied_batches: list[int]   # batch ids removed + de-committed
    drops_rows: int          # drops_log rows scrubbed (0 without spark)


def _is_metric_dir(name: str, metric: str) -> bool:
    """Match ``metric=<value>`` against the metric, tolerating Spark's
    partition-path escaping (special chars are %-encoded on write)."""
    col, eq, val = name.partition("=")
    return bool(eq) and col == "metric" and unquote(val) == metric


def _batches_holding(store_dir: str, metric: str) -> dict[int, str]:
    """batch id -> the batch's ``metric=M`` dir path, for every raw batch
    dir on disk that holds the metric (committed or not — the guards
    decide what that means)."""
    out: dict[int, str] = {}
    raw_root = store_meta.raw_path(store_dir)
    if not os.path.isdir(raw_root):
        return out
    for b in store_meta.raw_batches_on_disk(store_dir):
        bdir = store_meta.batch_dir(store_dir, b)
        for name in os.listdir(bdir):
            if _is_metric_dir(name, metric):
                out[b] = os.path.join(bdir, name)
                break
    return out


def _table_roots(store_dir: str):
    """Every ``level_<w>`` / ``hist_<w>`` / ``counter_<w>`` table root on
    disk, sorted."""
    for name in sorted(os.listdir(store_dir)):
        if name.startswith(("level_", "hist_", "counter_")):
            p = os.path.join(store_dir, name)
            if os.path.isdir(p):
                yield p


def _refuse_unsafe(store_dir: str, metric: str, verb: str) -> dict[int, str]:
    """The complete-or-refuse guard set shared by erase and rename
    (module docstring): pending compaction journal, torn
    (marker-uncommitted) batches holding the metric, and batches still
    inside the streaming replay barrier. Returns the batch->metric-dir
    map the mutation will operate on. One helper for both ops so a
    future guard fix cannot silently cover only one of them."""
    if store_meta.read_journal(store_dir) is not None:
        raise RuntimeError(
            "compaction journal pending - settle it (recover_compaction) "
            f"before {verb} a metric"
        )
    store_meta.require_committed_batches_on_disk(store_dir, f"{verb} a metric")
    holding = _batches_holding(store_dir, metric)
    committed = store_meta.committed_batches(store_dir)
    # retired batches (deferred-delete compaction sources) are
    # uncommitted BY DESIGN — their rows live on in the committed dest
    # and the dirs are reader-invisible, vacuum-bound. They are not torn
    # (recover() would be a no-op on them), so they must not block the
    # op; they STAY in the returned map so the mutation also scrubs or
    # moves the invisible bytes instead of leaving them for vacuum to
    # leak past an erasure.
    retired = set(store_meta.retired_batches(store_dir))
    torn = sorted(b for b in holding if b not in committed and b not in retired)
    if torn:
        raise RuntimeError(
            f"batches {torn} hold metric {metric!r} but are not "
            "marker-committed - run recover() (torn write) or stop the "
            "live writer first"
        )
    replayable = sorted(
        b for b in holding if not store_meta.checkpoint_committed(store_dir, b)
    )
    if replayable:
        raise RuntimeError(
            f"batches {replayable} holding metric {metric!r} are still "
            "inside the streaming replay barrier - a checkpoint replay "
            "would rewrite them; advance the stream one batch or stop it "
            "cleanly first"
        )
    return holding


#: drops_log swap suffixes — the crash-recovery contract of _swap_drops
_SWAP_TMP = ".swap_tmp"
_SWAP_OLD = ".swap_old"


def _rename_journal_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_rename.json")


def _read_rename_journal(store_dir: str) -> dict | None:
    p = _rename_journal_path(store_dir)
    try:
        with open(p, encoding="utf-8") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _drops_root_for_read(store_dir: str) -> str | None:
    """The drops_log table an op should COUNT from: the live root, or —
    after a crash between _swap_drops' rename-out and rename-in — the
    set-aside ``.swap_old`` copy a real pass would first restore. Any
    non-None result drives the spark-required refusal and dry-run
    counts, so a torn swap neither reports drops_rows=0 nor skips the
    guard."""
    root = os.path.join(store_dir, "drops_log")
    if os.path.isdir(root):
        return root
    old = root + _SWAP_OLD
    if os.path.isdir(old):
        return old
    return None


def _recover_drops_swap(store_dir: str) -> None:
    """Heal a drops_log swap torn by a crash in a prior surgery pass
    (called on entry of both ops, making them resumable): a leftover
    ``.swap_old`` with no live table means the crash hit between
    rename-out and rename-in — restore the original (the re-run redoes
    the rewrite); a leftover ``.swap_old`` beside a live table means
    only the final cleanup was lost; a leftover ``.swap_tmp`` is an
    incomplete rewrite whose source is intact either way."""
    root = os.path.join(store_dir, "drops_log")
    old, tmp = root + _SWAP_OLD, root + _SWAP_TMP
    if os.path.isdir(old):
        if os.path.isdir(root):
            shutil.rmtree(old)
        else:
            os.rename(old, root)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def _swap_drops(root: str, kept) -> None:
    """Replace the drops_log with a rewritten copy, crash-recoverable at
    every step (see _recover_drops_swap): materialize the rewrite fully,
    rename the source ASIDE (never deleted before the replacement is
    in place), rename the rewrite in, then drop the old copy."""
    tmp, old = root + _SWAP_TMP, root + _SWAP_OLD
    kept.coalesce(1).write.mode("overwrite").partitionBy(
        "ingest_batch"
    ).parquet(tmp)
    os.rename(root, old)
    os.rename(tmp, root)
    shutil.rmtree(old)


def delete_metric(
    store_dir: str,
    metric: str,
    spark=None,
    dry_run: bool = False,
) -> EraseResult:
    """Erase one metric from a store (module docstring: layout, guards,
    what stays). Idempotent: erasing an absent metric is a no-op result,
    not an error. ``dry_run=True`` runs every guard and counts what WOULD
    be removed without touching the store. ``spark`` is only needed to
    scrub ``drops_log``; without it the pass refuses when that table
    still holds rows for the metric (a partial erasure that *looks*
    complete is worse than an actionable refusal)."""
    from metricq_db_hta_spark.operators.maintenance import _rmtree_strict

    j = _read_rename_journal(store_dir)
    if j is not None:
        raise RuntimeError(
            f"rename journal pending ({j.get('old')!r} -> "
            f"{j.get('new')!r}) - re-run that rename to roll it forward "
            "before erasing"
        )
    holding = _refuse_unsafe(store_dir, metric, "erasing")
    if not dry_run:
        _recover_drops_swap(store_dir)

    # drops_log: refuse-or-scrub BEFORE deleting anything, so a refusal
    # leaves the store untouched rather than half-erased. A dry run reads
    # through _drops_root_for_read so a torn swap from a crashed prior
    # pass is COUNTED (from the set-aside copy the real pass restores)
    # instead of reported as drops_rows=0.
    drops_rows = 0
    drops_root = os.path.join(store_dir, "drops_log")
    droot_read = _drops_root_for_read(store_dir)
    if droot_read is not None:
        if spark is None:
            raise RuntimeError(
                "store has a drops_log (rows carry metric names) - pass a "
                "SparkSession so the erasure can scrub it"
            )
        drops = spark.read.parquet(droot_read)
        from pyspark.sql import functions as F

        drops_rows = drops.filter(F.col("metric") == metric).count()
        if drops_rows and not dry_run:
            # tiny table (one row per dropping metric per batch): full
            # rewrite through the crash-recoverable swap, because a
            # dynamic partition overwrite cannot delete partitions whose
            # every row was the erased metric's
            kept = drops.filter(F.col("metric") != metric)
            if kept.isEmpty():
                # nothing left: remove the table instead of leaving a
                # file-less parquet dir later readers can't infer from
                _rmtree_strict(drops_root)
            else:
                _swap_drops(drops_root, kept)

    # raw: the metric's partition dir in every committed batch
    raw_dirs = 0
    emptied: list[int] = []
    for b, mdir in sorted(holding.items()):
        raw_dirs += 1
        if dry_run:
            bdir = store_meta.batch_dir(store_dir, b)
            others = [
                n
                for n in os.listdir(bdir)
                if n.startswith("metric=") and not _is_metric_dir(n, metric)
            ]
            if not others:
                emptied.append(b)
            continue
        _rmtree_strict(mdir)
        bdir = store_meta.batch_dir(store_dir, b)
        if not any(n.startswith("metric=") for n in os.listdir(bdir)):
            # intent before whole-dir delete: a crash before the marker
            # de-commit must read as deliberate removal, not torn-replay
            # loss (see store_meta.settle_removal_intent)
            store_meta.record_removal_intent(store_dir, {b})
            shutil.rmtree(bdir)
            emptied.append(b)
    if emptied and not dry_run:
        # de-commit the now-empty batches (clips to on-disk and
        # republishes the snapshot manifest, same as retention); an
        # emptied RETIRED batch also leaves the vacuum ledger now — its
        # dir is gone, waiting for vacuum to clear a tombstone would
        # just leave a dangling entry until then
        store_meta.update_commit_marker(store_dir, add=set(), remove=set(emptied))
        store_meta.clear_removal_intent(store_dir, set(emptied))
        gone_retired = set(emptied) & set(
            store_meta.retired_batches(store_dir)
        )
        if gone_retired:
            store_meta.clear_retired(store_dir, gone_retired)

    # level / hist tables: one metric dir per table
    table_dirs = 0
    for troot in _table_roots(store_dir):
        for child in os.listdir(troot):
            if _is_metric_dir(child, metric):
                table_dirs += 1
                if not dry_run:
                    _rmtree_strict(os.path.join(troot, child))
        if not dry_run and not any(
            n.startswith("metric=") for n in os.listdir(troot)
        ):
            # erased the table's LAST metric: remove the whole table dir
            # rather than leave a file-less parquet root every reader
            # (build_history_service, fsck, sql) chokes on with an
            # unhelpful schema-inference error — an ABSENT table raises
            # the loud "no level tables - not an ingest store" message,
            # and the next ingest recreates it from scratch (the writer
            # treats a raw root with zero batch dirs as fresh)
            shutil.rmtree(troot)
    if not dry_run:
        raw_root = store_meta.raw_path(store_dir)
        if os.path.isdir(raw_root) and not any(
            n.startswith("ingest_batch=") for n in os.listdir(raw_root)
        ):
            shutil.rmtree(raw_root)  # same hazard for an emptied raw root
        # surgery is invisible in the durability metadata when no batch
        # empties — tick the explicit epoch so resident servers
        # (plans/serve store-epoch check) drop their pinned plans
        store_meta.bump_store_epoch(store_dir)

    return EraseResult(
        raw_dirs=raw_dirs,
        table_dirs=table_dirs,
        emptied_batches=emptied,
        drops_rows=drops_rows,
    )


# -- rename ------------------------------------------------------------------

#: characters Spark's partition-path writer %-escapes (escapePathName);
#: mirrored here so a renamed dir is byte-identical to what the writer
#: would have produced for the new name. Enumerated EMPIRICALLY against
#: the installed PySpark's JVM (sweep pinned by
#: test_escape_partition_value_matches_spark): the printable specials are
#: "#%'*/:=?[\]^{ — note '^' IS escaped and '}' is NOT — plus control
#: chars 0x01-0x1F and DEL; a hand-written set had both of those wrong,
#: which would have made rename targets diverge from later ingests of
#: the same metric (two physical dirs for one partition value).
_ESCAPE = set('"#%\'*/:=?[\\]^{') | {chr(c) for c in range(1, 0x20)} | {
    chr(0x7F)
}


def _escape_partition_value(value: str) -> str:
    return "".join(
        f"%{ord(ch):02X}" if ch in _ESCAPE else ch for ch in value
    )


@dataclass(frozen=True)
class RenameResult:
    raw_dirs: int          # metric partition dirs moved in raw batches
    table_dirs: int        # metric dirs moved in level_*/hist_* tables
    drops_rows: int        # drops_log rows re-labeled (0 without spark)


def rename_metric(
    store_dir: str,
    old: str,
    new: str,
    spark=None,
    dry_run: bool = False,
) -> RenameResult:
    """Migrate one metric's ENTIRE stored history to a new name.

    The reference renames at the ingest edge only (A2 input mapping,
    /root/reference/src/async_hta_service.hpp:136-145): from the remap
    onward, new samples land under the new name, and history stays
    stranded under the old one. This is the missing second half — a
    store-side migration so queries for the new name see the full
    history. Runbook: update the input mapping first (A17 reconfigure),
    then rename the history; the two are independently safe in that
    order (a window where fresh data is `new` and history is `old`),
    while the reverse order would keep REFILLING `old`.

    Directory moves only (`os.rename` of each ``metric=old`` partition
    dir — metadata-only at any store size) plus the same tiny
    ``drops_log`` rewrite as erasure. Stored ``delta_ns`` values are
    per-metric gaps, so they remain exactly correct under a whole-
    history rename — which is also why the target name must not already
    exist ANYWHERE in the store: merging two histories would interleave
    sample chains whose stored deltas no longer match
    (``fsck`` would flag every merged bucket). Refused, never merged.

    Guards: identical complete-or-refuse set as :func:`delete_metric`
    (pending journal, torn batches, replay barrier), checked before
    anything moves. The streaming checkpoint's watermark state still
    carries the OLD key; correctness is preserved because a fresh
    stream start re-seeds per-metric watermarks from the store's max
    (ingest_stream.monotonic_stateful seed contract), which the renamed
    history now advertises under the new name — pre-rename timestamps
    re-sent under the new name are dropped exactly as they would have
    been under the old one.
    """
    if old == new:
        raise ValueError("rename requires two distinct metric names")
    # crash-resume contract: the journal (written after every refusal
    # check passes, removed after the last move) marks a rename in
    # flight. A re-run of the SAME rename rolls the remaining moves
    # forward — each dir move is atomic, so under a matching journal a
    # location holds the metric under exactly one of the two names and
    # the merge-clash refusal (which would otherwise fire in both
    # directions against our own half-moved dirs) is safely skipped.
    # Any OTHER surgery against a journaled store refuses.
    journal = _read_rename_journal(store_dir)
    resume = False
    if journal is not None:
        if journal.get("old") == old and journal.get("new") == new:
            resume = True
        else:
            raise RuntimeError(
                f"rename journal pending ({journal.get('old')!r} -> "
                f"{journal.get('new')!r}) - re-run that rename to roll "
                "it forward before starting another"
            )
    holding = _refuse_unsafe(store_dir, old, "renaming")
    if resume:
        # the half-moved dirs now live under `new`: hold them to the
        # same torn/replay-barrier guards before moving the rest
        _refuse_unsafe(store_dir, new, "renaming")
    if not dry_run:
        _recover_drops_swap(store_dir)

    # refuse an absent source: unlike erasure (where absent == already
    # done, a safe no-op), a rename that silently "succeeds" against a
    # typo'd --old leaves the operator believing the history migrated
    # while it stays stranded under the real name. Under a matching
    # journal an absent source is the expected end state of the
    # interrupted pass, not a typo.
    holds_tables = any(
        any(_is_metric_dir(c, old) for c in os.listdir(t))
        for t in _table_roots(store_dir)
    )
    if not holding and not holds_tables and not resume:
        raise ValueError(
            f"metric {old!r} not found anywhere in {store_dir} - "
            "nothing to rename (check the name; erasure treats absent "
            "as a no-op, rename refuses)"
        )

    # the target must be absent EVERYWHERE (docstring: merge refusal).
    # Skipped on resume: the journal proves this check passed before the
    # first move, so anything under `new` is our own moved history.
    drops_root = os.path.join(store_dir, "drops_log")
    drops = None
    droot_read = _drops_root_for_read(store_dir)
    if droot_read is not None:
        if spark is None:
            raise RuntimeError(
                "store has a drops_log (rows carry metric names) - pass a "
                "SparkSession so the rename can re-label it"
            )
        drops = spark.read.parquet(droot_read)
    if resume:
        # the journal proves the full clash check passed before the first
        # move — but only for data that EXISTED then. Batches that
        # appeared after the journal (the remapped ingest kept running
        # across the crash) can hold metric=new legitimately as fresh
        # data, and moving the remaining metric=old dirs alongside them
        # would interleave two delta_ns chains — exactly the merge the
        # refusal exists to prevent. The journal records which batches
        # held the old name, so foreign new-name batches are decidable.
        # (Journals from before this field existed carry no batch set —
        # for those the check is skipped, the pre-r12 behavior.)
        known = journal.get("batches_old")
        foreign = (
            []
            if known is None
            else sorted(set(_batches_holding(store_dir, new)) - set(known))
        )
        if foreign:
            raise RuntimeError(
                f"resuming rename {old!r} -> {new!r}, but batches "
                f"{foreign} hold {new!r} and were written AFTER the "
                "rename journal (remapped ingest ran across the crash) - "
                "rolling forward would merge the remaining old-name "
                "history into the fresh new-name stream; erase or "
                "rename one side first, then delete the journal"
            )
    if not resume:
        clashes: list[str] = []
        if _batches_holding(store_dir, new):
            clashes.append("raw")
        for troot in _table_roots(store_dir):
            if any(_is_metric_dir(c, new) for c in os.listdir(troot)):
                clashes.append(os.path.basename(troot))
        if drops is not None:
            from pyspark.sql import functions as F

            if drops.filter(F.col("metric") == new).limit(1).count():
                clashes.append("drops_log")
        if clashes:
            raise RuntimeError(
                f"metric {new!r} already exists in {clashes} - renaming "
                f"{old!r} onto it would merge two histories (stored "
                "delta_ns chains would interleave); erase or rename the "
                "target first"
            )

    new_dirname = "metric=" + _escape_partition_value(new)

    if not dry_run:
        with open(_rename_journal_path(store_dir), "w", encoding="utf-8") as f:
            json.dump(
                {
                    "old": old,
                    "new": new,
                    # the batch set holding `old` NOW — a resume uses it
                    # to tell our own half-moved dirs from batches a
                    # still-running remapped ingest wrote after the crash.
                    # On resume the original set is PRESERVED (unioned):
                    # batches moved by an earlier attempt hold `new` only
                    # and must stay known to any later resume
                    "batches_old": sorted(
                        {int(b) for b in _batches_holding(store_dir, old)}
                        | (
                            set(journal.get("batches_old", []))
                            if resume
                            else set()
                        )
                    ),
                },
                f,
            )

    # drops_log first (same refuse-before-mutate ordering as erasure)
    drops_rows = 0
    if drops is not None:
        from pyspark.sql import functions as F

        drops_rows = drops.filter(F.col("metric") == old).count()
        if drops_rows and not dry_run:
            relabeled = drops.withColumn(
                "metric",
                F.when(F.col("metric") == old, F.lit(new)).otherwise(
                    F.col("metric")
                ),
            )
            _swap_drops(drops_root, relabeled)

    raw_dirs = 0
    for _b, mdir in sorted(holding.items()):
        raw_dirs += 1
        if not dry_run:
            os.rename(mdir, os.path.join(os.path.dirname(mdir), new_dirname))

    table_dirs = 0
    for troot in _table_roots(store_dir):
        for child in os.listdir(troot):
            if _is_metric_dir(child, old):
                table_dirs += 1
                if not dry_run:
                    os.rename(
                        os.path.join(troot, child),
                        os.path.join(troot, new_dirname),
                    )

    if not dry_run:
        os.remove(_rename_journal_path(store_dir))
        store_meta.bump_store_epoch(store_dir)  # see delete_metric

    return RenameResult(
        raw_dirs=raw_dirs, table_dirs=table_dirs, drops_rows=drops_rows
    )
