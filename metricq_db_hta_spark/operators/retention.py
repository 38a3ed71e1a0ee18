"""Tiered retention (TTL) for the HTA store — partition-granular expiry.

The reference keeps raw samples forever (no TTL anywhere in
metricq-db-hta; hta::Directory only ever appends), which works at its
single-node scale but not at 100 TB: an append-only metric store grows
without bound and the *only* affordable delete is one that reads nothing.
This module is the classic tiered-downsampling retention of RRD-style
TSDBs, expressed against this store's layout: raw samples are kept for a
bounded age, each aggregate level may be kept longer (coarse history
outlives fine), and queries over expired ranges are served from the
levels that still hold them — the serve layer clamps against the
advertised floors (plans/serve.py) so a request never silently reads a
hole.

Expiry is PARTITION-GRANULAR and METADATA-ONLY: whole time-partition
directories (``ts_month=``/``ts_date=`` under raw batches,
``bucket_month=`` under level/hist tables) are deleted when their entire
period lies before the cutoff; rows in the boundary partition survive
until the whole partition ages out. A retention pass therefore reads
zero data bytes at any store size — the same reason real table formats
implement TTL as partition drops, and the same driver-side-walk shape as
``plan_compaction``.

Ordering / durability contract (shares the store's quiesced-maintenance
window with compaction):

1. Refuse while a compaction journal is pending — a concurrent
   compaction's verify counts and journaled source/dest sets must not
   have partitions deleted out from under them.
2. Floors are advertised FIRST (``_retention.json``, atomic tmp+rename,
   merge-max so a floor never regresses), then deleted. A crash between
   the two leaves readers clamping conservatively over still-present
   data — never reading a hole. A re-run finishes the deletes (every
   step idempotent).
3. Raw expiry only touches batches that are marker-committed AND past
   the streaming replay barrier (``store_meta.checkpoint_committed`` —
   the same rule as compaction: a checkpoint replay of a
   partially-deleted batch would resurrect expired rows). Retired
   batches belong to ``maintenance.vacuum`` and are skipped.
4. A batch directory emptied by expiry is removed and its id dropped
   from the commit marker (which republishes the snapshot manifest), so
   snapshot/pinned readers converge on the surviving set.

Floor semantics (what ``_retention.json`` means): for key ``raw``, rows
with ``ts_ns >= floor`` are intact and rows below it may be missing; for
``level_<w>``/``hist_<w>``, buckets with ``bucket_start_ns >= floor``
are intact. Floors are aligned DOWN to the table's partition unit, so
the guarantee is exact against the partition predicate the query router
already pushes down.

Policy tiering invariant (validated here, against the widths actually on
disk): a coarser level must be retained at least as long as any finer
one, and every level at least as long as raw — the shape that lets old
queries degrade in resolution instead of hitting nothing. An unlisted
width means "keep forever".
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Mapping

from metricq_db_hta_spark.streaming import store_meta

_UTC = dt.timezone.utc
_NS_PER_S = 1_000_000_000


def _date_ns(d: dt.date) -> int:
    """Epoch ns of a UTC calendar date (partition values are UTC dates —
    the session timezone is pinned to UTC, sources/tables.py)."""
    return int(
        dt.datetime(d.year, d.month, d.day, tzinfo=_UTC).timestamp()
    ) * _NS_PER_S


def _align_down_ns(ns: int, unit: str) -> int:
    """Largest partition boundary <= ns for unit 'month' | 'day'."""
    ns = max(ns, 0)
    t = dt.datetime.fromtimestamp(ns // _NS_PER_S, tz=_UTC)
    if unit == "month":
        return _date_ns(dt.date(t.year, t.month, 1))
    return _date_ns(t.date())


def _period_end_ns(d: dt.date, unit: str) -> int:
    if unit == "month":
        nxt = (
            dt.date(d.year + 1, 1, 1)
            if d.month == 12
            else dt.date(d.year, d.month + 1, 1)
        )
        return _date_ns(nxt)
    return _date_ns(d) + 86_400 * _NS_PER_S


#: partition-column name -> alignment unit for each expirable table kind
_TIME_PARTITIONS = {"ts_month": "month", "ts_date": "day", "bucket_month": "month"}


@dataclass(frozen=True)
class RetentionPolicy:
    """Max ages in ns; ``None`` / unlisted width = keep forever.

    ``level_max_age_ns`` / ``hist_max_age_ns`` map level width_ns ->
    max age. Static validation checks the listed widths; :func:`expire`
    re-validates against the widths discovered on disk (an unlisted
    finer width is infinite retention, so a listed coarser width with a
    finite age would invert the tiering)."""

    raw_max_age_ns: int | None = None
    level_max_age_ns: Mapping[int, int] = field(default_factory=dict)
    hist_max_age_ns: Mapping[int, int] = field(default_factory=dict)
    counter_max_age_ns: Mapping[int, int] = field(default_factory=dict)

    def __post_init__(self) -> None:
        ages = [self.raw_max_age_ns, *self.level_max_age_ns.values(),
                *self.hist_max_age_ns.values(),
                *self.counter_max_age_ns.values()]
        for a in ages:
            if a is not None and a <= 0:
                raise ValueError(f"max age must be positive ns: {a}")
        for label, table in (
            ("level", self.level_max_age_ns),
            ("hist", self.hist_max_age_ns),
            ("counter", self.counter_max_age_ns),
        ):
            self._check_tiering(label, table, sorted(table))

    def _check_tiering(
        self, label: str, table: Mapping[int, int], widths_asc: list[int]
    ) -> None:
        prev_w, prev_age = None, None
        for w in widths_asc:
            a = table.get(w)  # unlisted discovered width = keep forever
            eff = float("inf") if a is None else a
            if prev_age is not None and eff < prev_age:
                raise ValueError(
                    f"retention tiering inverted: {label}_{w} kept {a} ns "
                    f"< finer {label}_{prev_w} kept {prev_age} ns (coarser "
                    "levels must outlive finer ones)"
                )
            if self.raw_max_age_ns is not None and eff < self.raw_max_age_ns:
                raise ValueError(
                    f"retention tiering inverted: {label}_{w} kept {a} ns "
                    f"< raw kept {self.raw_max_age_ns} ns"
                )
            prev_w, prev_age = w, eff

    def validate_against(
        self,
        level_widths: list[int],
        hist_widths: list[int],
        counter_widths: list[int] = (),
    ) -> None:
        """Re-check tiering with the store's actual widths mixed in (any
        discovered width missing from the policy participates as
        keep-forever)."""
        for label, table, widths in (
            ("level", self.level_max_age_ns, level_widths),
            ("hist", self.hist_max_age_ns, hist_widths),
            ("counter", self.counter_max_age_ns, counter_widths),
        ):
            unknown = set(table) - set(widths)
            if unknown:
                raise ValueError(
                    f"policy names {label} widths absent from the store: "
                    f"{sorted(unknown)} (present: {sorted(widths)})"
                )
            self._check_tiering(label, table, sorted(set(widths) | set(table)))


@dataclass(frozen=True)
class RetentionResult:
    floors: dict[str, int]  # advertised floor per table key
    deleted_dirs: int  # time-partition dirs removed
    emptied_batches: list[int]  # raw batch ids fully expired + de-committed


def retention_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_retention.json")


def retention_floors(store_dir: str) -> dict[str, int]:
    """Advertised floors: ``{"raw": ns, "level_<w>": ns, "hist_<w>": ns}``
    — empty for a store that never ran retention. Readers treat a missing
    key as floor 0 (everything intact)."""
    try:
        with open(retention_path(store_dir)) as f:
            return {k: int(v) for k, v in json.load(f)["floors"].items()}
    except FileNotFoundError:
        return {}


def raw_floor_ns(store_dir: str) -> int:
    return retention_floors(store_dir).get("raw", 0)


def _advertise(store_dir: str, updates: dict[str, int]) -> dict[str, int]:
    """Merge-max atomic floor publish — floors never move backward, so a
    later expire() with a *longer* max age cannot un-advertise deletions
    an earlier pass already performed."""
    cur = retention_floors(store_dir)
    for k, v in updates.items():
        cur[k] = max(int(v), cur.get(k, 0))
    tmp = retention_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"floors": cur}, f)
    os.replace(tmp, retention_path(store_dir))
    return cur


def _discovered_widths(store_dir: str, prefix: str) -> list[int]:
    if not os.path.isdir(store_dir):
        return []
    return sorted(store_meta.width_table_dirs(store_dir, prefix))


def _time_dirs(parent: str) -> list[tuple[str, dt.date, str]]:
    """(path, date, unit) for each recognized time-partition child dir."""
    out = []
    for name in os.listdir(parent):
        col, eq, val = name.partition("=")
        unit = _TIME_PARTITIONS.get(col)
        if not eq or unit is None:
            continue
        try:
            d = dt.date.fromisoformat(val)
        except ValueError:
            continue
        out.append((os.path.join(parent, name), d, unit))
    return out


def _expire_tree(root: str, floor_ns: int, dry_run: bool = False) -> int:
    """Delete every ``metric=*/<timecol>=<date>`` dir under ``root`` whose
    entire period ends at or before ``floor_ns``; prune metric dirs that
    empty out. Returns the count of time-partition dirs removed (or, in
    dry-run, that WOULD be). Strict deletes
    (maintenance._rmtree_strict): a silently surviving dir is an ops
    signal, not a correctness hazard (the floor promises *may be
    missing*, not *is gone*), but failing loudly keeps disk accounting
    honest."""
    from metricq_db_hta_spark.operators.maintenance import _rmtree_strict

    deleted = 0
    for mname in os.listdir(root):
        mdir = os.path.join(root, mname)
        if not mname.startswith("metric=") or not os.path.isdir(mdir):
            continue
        for tpath, d, unit in _time_dirs(mdir):
            if _period_end_ns(d, unit) <= floor_ns:
                if not dry_run:
                    _rmtree_strict(tpath)
                deleted += 1
        if not dry_run and not os.listdir(mdir):
            os.rmdir(mdir)
    return deleted


def expire(
    store_dir: str,
    policy: RetentionPolicy,
    now_ns: int,
    dry_run: bool = False,
) -> RetentionResult:
    """Run one retention pass at logical time ``now_ns`` (caller-supplied,
    never wall-clock-sampled here: deterministic tests, replayable ops
    runbooks). Idempotent — a re-run with the same arguments deletes
    nothing further and re-advertises the same floors.

    ``dry_run=True`` plans only: validates the policy, computes the
    floors this pass WOULD advertise (merge-maxed with the existing
    file), and counts the partition dirs and emptied batches it would
    remove — without writing ``_retention.json`` or touching a single
    directory. The journal-pending refusal still applies, so a dry run
    is an honest preview of the real pass."""
    if store_meta.read_journal(store_dir) is not None:
        raise RuntimeError(
            "compaction journal pending - settle it (recover_compaction) "
            "before running retention"
        )
    store_meta.require_committed_batches_on_disk(store_dir, "running retention")
    level_widths = _discovered_widths(store_dir, "level")
    hist_widths = _discovered_widths(store_dir, "hist")
    counter_widths = _discovered_widths(store_dir, "counter")
    policy.validate_against(level_widths, hist_widths, counter_widths)

    # -- compute floors (aligned down to each table's partition unit) ------
    floors: dict[str, int] = {}
    raw_root = store_meta.raw_path(store_dir)
    raw_unit = _detect_raw_unit(store_dir)
    if policy.raw_max_age_ns is not None and raw_unit is not None:
        floors["raw"] = _align_down_ns(now_ns - policy.raw_max_age_ns, raw_unit)
    for label, table in (
        ("level", policy.level_max_age_ns),
        ("hist", policy.hist_max_age_ns),
        ("counter", policy.counter_max_age_ns),
    ):
        for w, age in table.items():
            if age is not None:
                floors[f"{label}_{w}"] = _align_down_ns(now_ns - age, "month")

    # -- advertise BEFORE deleting (contract step 2; dry-run: merge-max
    # computed in memory only) ---------------------------------------------
    if dry_run:
        advertised = retention_floors(store_dir)
        for k, v in floors.items():
            advertised[k] = max(int(v), advertised.get(k, 0))
    else:
        advertised = (
            _advertise(store_dir, floors) if floors else retention_floors(store_dir)
        )

    # -- raw: committed + replay-barriered batches only --------------------
    deleted = 0
    emptied: list[int] = []
    raw_floor = floors.get("raw")
    if raw_floor is not None and os.path.isdir(raw_root):
        retired = set(store_meta.retired_batches(store_dir))
        committed = store_meta.committed_batches(store_dir)
        for b in sorted(store_meta.raw_batches_on_disk(store_dir)):
            if b in retired or b not in committed:
                continue
            if not store_meta.checkpoint_committed(store_dir, b):
                continue  # a replay would resurrect expired partitions
            bdir = store_meta.batch_dir(store_dir, b)
            n_deleted = _expire_tree(bdir, raw_floor, dry_run=dry_run)
            deleted += n_deleted
            if dry_run:
                # would the batch empty out? every metric dir whose time
                # dirs ALL fall below the floor would be pruned
                remaining = sum(
                    1
                    for mname in os.listdir(bdir)
                    if mname.startswith("metric=")
                    for _, d, unit in _time_dirs(os.path.join(bdir, mname))
                    if _period_end_ns(d, unit) > raw_floor
                )
                if n_deleted and remaining == 0:
                    emptied.append(b)
            elif not any(n.startswith("metric=") for n in os.listdir(bdir)):
                # whole-batch-dir deletion: record the intent FIRST so a
                # crash before the marker de-commit below reads as a
                # deliberate removal (settled automatically), never as
                # torn-replay loss wedging the maintenance guard
                store_meta.record_removal_intent(store_dir, {b})
                shutil.rmtree(bdir)
                emptied.append(b)
        if emptied and not dry_run:
            # drop fully-expired ids from the committed set (clips to
            # on-disk, republishes the snapshot manifest)
            store_meta.update_commit_marker(store_dir, add=set(), remove=set(emptied))
            store_meta.clear_removal_intent(store_dir, set(emptied))

    # -- level / hist tables ----------------------------------------------
    for key, floor in floors.items():
        if key == "raw":
            continue
        troot = os.path.join(store_dir, key)
        if os.path.isdir(troot):
            deleted += _expire_tree(troot, floor, dry_run=dry_run)

    return RetentionResult(
        floors=advertised, deleted_dirs=deleted, emptied_batches=emptied
    )


def _detect_raw_unit(store_dir: str) -> str | None:
    """'month' | 'day' from the store's actual raw layout (the writer's
    ``raw_partition`` choice), None for an empty store. Mixed layouts
    cannot occur (one writer config per store); detection beats trusting
    a caller-passed flag that could disagree with the dirs."""
    root = store_meta.raw_path(store_dir)
    if not os.path.isdir(root):
        return None
    for b in store_meta.raw_batches_on_disk(store_dir):
        bdir = store_meta.batch_dir(store_dir, b)
        for mname in os.listdir(bdir):
            mdir = os.path.join(bdir, mname)
            if mname.startswith("metric=") and os.path.isdir(mdir):
                for _, _, unit in _time_dirs(mdir):
                    return unit
    return None
