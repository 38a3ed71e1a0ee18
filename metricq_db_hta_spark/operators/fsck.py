"""Store consistency checker (fsck): verify the derived level tables
against a from-scratch recompute of the committed raw data.

The level tables are DERIVED state maintained incrementally by three
different writers — the streaming cascade (touched-partition recompute),
backfill (same path, negative batch ids), and crash repair
(``recover()``) — while compaction rewrites raw underneath them and
retention deletes both tiers on different clocks. Each path is
individually tested, but an operator running all of them against 100 TB
wants an independent auditor: recompute each level from raw
(``operators/hta.py`` — the same pure functions the property tests pin)
and diff it against what is stored, bucket by bucket, field by field.
The reference has no analogue (its HTA tree is rewritten in one process);
this is the `fsck` every multi-writer store grows eventually.

Comparison is BIT-exact: both sides run the identical plan shape (same
decimal sums, same floor-based integral), so any difference is real
divergence, not float noise — the same argument the mergeability
property tests rely on.

Scope rules (what an honest checker must skip):

* Only batches that are marker-committed AND not excluded for read
  (pending-journal side, retired-awaiting-vacuum) participate.
  Uncommitted (torn) batches are REPORTED, not diffed — their level
  partitions are legitimately unrepaired until ``recover()`` runs.
* Under raw retention (``_retention.json``), buckets below a level's own
  floor no longer exist to check, and the per-metric bucket containing
  the first RETAINED sample is skipped: its stored integral/active_time
  were computed with the delta to an expired predecessor that a
  recompute can no longer see. One boundary bucket per metric per level
  — everything above it must still match exactly.
* A time range (``start_ns``/``end_ns``) bounds the audit cost: the
  recompute's raw scan partition-prunes to the range, so a nightly
  "check yesterday" reads a day, not the store.

Scale shape: per level, one groupBy over the (pruned) raw scan plus one
full-outer join against the (log-sized) stored level on
(metric, bucket_start_ns) — shuffles bounded by the rollup size, never
by pair enumeration. Histogram levels (``hist_<w>``) are checked the
same way on (metric, bucket, bin); counter levels (``counter_<w>``,
r11) on (metric, bucket) with an INDEPENDENT lag-window recompute so
the stored ``prev_value`` column is validated, never trusted.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.timeutil import bucket_start_ns
from metricq_db_hta_spark.operators import hta
from metricq_db_hta_spark.operators.retention import retention_floors
from metricq_db_hta_spark.streaming import store_meta

AGG_FIELDS = list(hta.AGG_FIELDS)


@dataclass(frozen=True)
class LevelReport:
    table: str  # "level_<w>" | "hist_<w>"
    n_checked: int  # stored rows inside the audited scope
    n_mismatched: int  # rows differing from the recompute (either side)
    examples: list[dict] = field(default_factory=list)  # up to `sample` rows

    @property
    def ok(self) -> bool:
        return self.n_mismatched == 0


@dataclass(frozen=True)
class FsckReport:
    levels: list[LevelReport]
    uncommitted_batches: list[int]  # reported, not diffed (run recover())
    journal_pending: bool

    @property
    def ok(self) -> bool:
        return all(r.ok for r in self.levels)


def _committed_raw(spark: SparkSession, store_dir: str) -> DataFrame:
    """The audit's source of truth: committed raw minus read-exclusions —
    the same visibility rule every reader path applies."""
    root = store_meta.raw_path(store_dir)
    if not os.path.isdir(root):
        raise ValueError(f"not an ingest store (no raw table): {store_dir}")
    from metricq_db_hta_spark.sources.rawstore import read_raw

    raw = read_raw(spark, store_dir)
    committed = store_meta.committed_batches(store_dir)
    excluded = store_meta.excluded_batches_for_read(store_dir)
    keep = sorted(committed - excluded)
    return raw.filter(F.col("ingest_batch").isin([int(b) for b in keep]))


def _boundary_buckets(raw: DataFrame, width_ns: int) -> DataFrame:
    """(metric, bucket_start_ns) of each metric's FIRST retained sample —
    the one bucket whose stored delta-derived fields may reference an
    expired predecessor. Dimension-sized (one row per metric)."""
    return raw.groupBy("metric").agg(
        bucket_start_ns(F.min("ts_ns"), width_ns).alias("bucket_start_ns")
    )


def _diff(
    stored: DataFrame,
    expected: DataFrame,
    keys: list[str],
    fields: list[str],
    sample: int,
) -> tuple[int, int, list[dict]]:
    """Full-outer field diff on ``keys``: a mismatch is a key present on
    one side only, or any field differing. Null-safe equality (<=>) so a
    NULL-vs-value difference counts and NULL==NULL does not."""
    s = stored.select(*keys, *[F.col(c).alias(f"s_{c}") for c in fields])
    e = expected.select(*keys, *[F.col(c).alias(f"e_{c}") for c in fields])
    j = s.join(e, keys, "full_outer")
    same = None
    for c in fields:
        eq = F.col(f"s_{c}").eqNullSafe(F.col(f"e_{c}"))
        same = eq if same is None else (same & eq)
    # presence: a side is "present" iff ANY of its fields is non-null —
    # count is non-null on every real row for both table kinds, so this
    # is exact, and it avoids carrying separate marker columns
    bad = j.filter(~same)
    agg = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~same).cast("long")).alias("m"),
    ).collect()[0]
    examples = [r.asDict() for r in bad.limit(sample).collect()]
    return int(agg["n"]), int(agg["m"] or 0), examples


def check_store(
    spark: SparkSession,
    store_dir: str,
    start_ns: int | None = None,
    end_ns: int | None = None,
    sample: int = 5,
    hist_lo: float = hta.HIST_LO,
    hist_hi: float = hta.HIST_HI,
    hist_bins: int = hta.HIST_BINS,
) -> FsckReport:
    """Audit every ``level_<w>`` / ``hist_<w>`` / ``counter_<w>`` table
    under ``store_dir`` against a recompute from committed raw,
    optionally bounded to [start_ns, end_ns) bucket starts. Read-only —
    never mutates the store (the repair tool is ``recover()``; fsck is
    the detector). ``hist_*`` must match the writer's binning config
    (defaults match)."""
    floors = retention_floors(store_dir)
    raw = _committed_raw(spark, store_dir)
    if start_ns is not None:
        raw = raw.filter(F.col("ts_ns") >= start_ns)
    if end_ns is not None:
        raw = raw.filter(F.col("ts_ns") < end_ns)
    raw = raw.select("metric", "ts_ns", "value").cache()

    # buckets touched by UNCOMMITTED (torn) batches are excluded from the
    # diff, not flagged: their stored level partitions are legitimately
    # unrepaired until recover() runs, and flagging them would bury real
    # divergence under expected noise. The torn ids are still reported.
    on_disk = store_meta.raw_batches_on_disk(store_dir)
    committed = store_meta.committed_batches(store_dir)
    # retired dirs (deferred-delete compaction sources awaiting vacuum)
    # are deliberately uncommitted — their rows live on in the compaction
    # dest. Treating them as torn would (a) report ids recover() refuses
    # to touch and (b) anti-join the dest's buckets out of the diff,
    # silently excluding most compacted history from the audit between a
    # deferred compaction and its vacuum (mirrors recover() and
    # excluded_batches_for_read).
    uncommitted = sorted(
        on_disk - committed - set(store_meta.retired_batches(store_dir))
    )
    torn_raw = None
    if uncommitted:
        from metricq_db_hta_spark.sources.rawstore import read_raw as _rr

        torn_raw = (
            _rr(spark, store_dir)
            .filter(
                F.col("ingest_batch").isin([int(b) for b in uncommitted])
            )
            .select("metric", "ts_ns")
        )

    reports: list[LevelReport] = []
    raw_floor = floors.get("raw", 0)
    for name in sorted(os.listdir(store_dir)):
        head, _, tail = name.partition("_")
        if head not in ("level", "hist", "counter") or not tail.isdigit():
            continue
        w = int(tail)
        stored = spark.read.parquet(os.path.join(store_dir, name))
        if head == "level":
            expected = hta.level0(raw, w)
        elif head == "hist":
            expected = hta.histogram_level(
                raw, w, lo=hist_lo, hi=hist_hi, bins=hist_bins
            )
        else:
            # independent recompute (lag-window form): validates the
            # stored prev_value-derived sums instead of trusting them
            expected = hta.counter_level_recomputed(raw, w)
        # audited scope: inside the requested range (whole buckets only —
        # a bucket straddling the range edge would be recomputed from a
        # fragment), above the table's own retention floor, above the RAW
        # floor (stored buckets below it kept their full-history values
        # but the raw to recompute them is gone — unverifiable by design,
        # that is the tiering contract), and past the per-metric
        # raw-retention boundary bucket
        lo = max(
            floors.get(name, 0),
            (-(-raw_floor // w) * w) if raw_floor > 0 else -(1 << 63),
            (-(-start_ns // w) * w) if start_ns is not None else -(1 << 63),
        )
        hi = (end_ns // w) * w if end_ns is not None else (1 << 63) - 1
        stored = stored.filter(
            (F.col("bucket_start_ns") >= lo) & (F.col("bucket_start_ns") < hi)
        )
        expected = expected.filter(
            (F.col("bucket_start_ns") >= lo) & (F.col("bucket_start_ns") < hi)
        )
        # the boundary-bucket exclusion applies under raw retention AND
        # under a start-bounded audit: either way, each metric's first
        # visible sample has a delta-predecessor the recompute can't see.
        # Aggregate + counter levels only (both derive from the previous
        # sample) — histogram bins are pure counts with no delta
        # dependence, so they audit exactly up to the raw floor.
        if head in ("level", "counter") and (
            raw_floor > 0 or start_ns is not None
        ):
            bb = _boundary_buckets(raw, w)
            stored = stored.join(
                F.broadcast(bb), ["metric", "bucket_start_ns"], "left_anti"
            )
            expected = expected.join(
                F.broadcast(bb), ["metric", "bucket_start_ns"], "left_anti"
            )
        if torn_raw is not None:
            touched = torn_raw.select(
                "metric",
                bucket_start_ns("ts_ns", w).alias("bucket_start_ns"),
            ).distinct()
            stored = stored.join(
                touched, ["metric", "bucket_start_ns"], "left_anti"
            )
            expected = expected.join(
                touched, ["metric", "bucket_start_ns"], "left_anti"
            )
        keys = ["metric", "bucket_start_ns"] + (
            ["bin"] if head == "hist" else []
        )
        fields = {
            "hist": ["n"],
            "counter": ["increase_sum", "n_resets"],
            "level": AGG_FIELDS,
        }[head]
        n, m, ex = _diff(stored, expected, keys, fields, sample)
        reports.append(
            LevelReport(table=name, n_checked=n, n_mismatched=m, examples=ex)
        )

    raw.unpersist()
    return FsckReport(
        levels=reports,
        uncommitted_batches=uncommitted,
        journal_pending=store_meta.read_journal(store_dir) is not None,
    )


def _month_start_ns(d_iso: str) -> int:
    import datetime as _dt

    d = _dt.date.fromisoformat(d_iso)
    return int(
        _dt.datetime(d.year, d.month, d.day, tzinfo=_dt.timezone.utc).timestamp()
    ) * 1_000_000_000


def _ceil_month_ns(ns: int) -> int:
    import datetime as _dt

    t = _dt.datetime.fromtimestamp(max(ns, 0) // 1_000_000_000, tz=_dt.timezone.utc)
    first = _dt.date(t.year, t.month, 1)
    if _month_start_ns(first.isoformat()) >= ns:
        return _month_start_ns(first.isoformat())
    nxt = (
        _dt.date(t.year + 1, 1, 1)
        if t.month == 12
        else _dt.date(t.year, t.month + 1, 1)
    )
    return _month_start_ns(nxt.isoformat())


def rebuild_levels(
    spark: SparkSession,
    store_dir: str,
    hist_lo: float = hta.HIST_LO,
    hist_hi: float = hta.HIST_HI,
    hist_bins: int = hta.HIST_BINS,
) -> dict[str, int]:
    """Repair the divergence :func:`check_store` detects: recompute every
    level/hist table from committed raw and overwrite the stored
    partitions — the repairer to fsck's detector (``recover()`` only
    repairs UNCOMMITTED batches; corruption inside committed state needs
    a from-raw rebuild). Returns ``{table: n_partitions_rewritten}``.

    Scope under raw retention: only ``(metric, bucket_month)`` partitions
    whose month starts at-or-after ``ceil_month(raw_floor)`` are
    rewritten. Below that the retained level rows are the ONLY surviving
    copy of the expired history (the tiering contract) — recomputing
    them from post-floor raw would destroy it, so those partitions are
    left untouched regardless of what fsck found there (restore from
    backup is the honest remedy). Partitions in scope that the recompute
    yields no rows for (stored-only "extra bucket" corruption) are
    deleted, not just skipped — dynamic overwrite alone would miss them.

    Boundary-delta semantics under retention: the recompute reads ALL
    retained raw (including the partial floor month below the rewrite
    scope) and clips only its OUTPUT to in-scope months, so every
    rewritten bucket's delta-derived fields (integral/active_time) are
    measured against the true retained predecessor — bit-equal to what
    ``check_store`` recomputes. Only each metric's FIRST retained
    bucket (in the unrewritten floor month) still references an expired
    predecessor; fsck excludes exactly that bucket. COUNTER tables go
    one better: raw persists each sample's true predecessor
    (``prev_value``), so their rebuild keeps even pre-retention
    increases (``hta.counter_level_rebuilt`` — lag fallback only for
    pre-r11 rows whose files predate the column).

    Scale note: the extra-bucket sweep enumerates (metric, month)
    partitions driver-side — O(partitions), same cardinality as the
    directory layout itself. At extreme metric counts the store layout
    swaps ``metric`` for ``metric_bucket`` (SCALE.md §1) and this sweep
    scales with bucket count instead.

    Same quiesce contract as compaction/retention: refuses while a
    journal is pending; run with writers stopped."""
    if store_meta.read_journal(store_dir) is not None:
        raise RuntimeError(
            "compaction journal pending - settle it (recover_compaction) "
            "before rebuilding levels"
        )
    store_meta.require_committed_batches_on_disk(store_dir, "rebuilding levels")
    from metricq_db_hta_spark.operators.maintenance import _rmtree_strict

    floors = retention_floors(store_dir)
    raw_floor = floors.get("raw", 0)
    scope_lo = _ceil_month_ns(raw_floor) if raw_floor > 0 else None
    raw = _committed_raw(spark, store_dir)
    # the recompute reads ALL retained raw — including the partial floor
    # month below scope — and only the OUTPUT is clipped to in-scope
    # months (the write filter below). Filtering the INPUT at scope_lo
    # (the pre-r12 behavior) re-measured each metric's first in-scope
    # delta against nothing, diverging from the checker's retained-raw
    # lag for data whose predecessor lives in [floor, scope_lo) —
    # rebuild_levels produced tables its own check_store flagged.
    if raw_floor > 0:
        raw = raw.filter(F.col("ts_ns") >= raw_floor)
    # prev_value rides along for the counter rebuild: the stored chain is
    # lossless where present (a metric's first retained row keeps its
    # true pre-retention predecessor), so repairing counters from a
    # lag-only recompute would NULL increases raw demonstrably still holds
    raw = raw.select("metric", "ts_ns", "value", "prev_value")

    rewritten: dict[str, int] = {}
    for name in sorted(os.listdir(store_dir)):
        head, _, tail = name.partition("_")
        if head not in ("level", "hist", "counter") or not tail.isdigit():
            continue
        w = int(tail)
        troot = os.path.join(store_dir, name)
        if head == "level":
            expected = hta.level0(raw, w)
        elif head == "hist":
            expected = hta.histogram_level(
                raw, w, lo=hist_lo, hi=hist_hi, bins=hist_bins
            )
        else:
            # coalesce(stored prev_value, in-scope lag): lossless where
            # the column exists, lag fallback for pre-r11 rows — see
            # hta.counter_level_rebuilt
            expected = hta.counter_level_rebuilt(raw, w)
        out = expected.withColumn(
            "bucket_month",
            F.trunc(
                F.to_date(
                    F.timestamp_micros(
                        F.floor(
                            F.col("bucket_start_ns").cast("decimal(38,0)")
                            / 1000
                        ).cast("long")
                    )
                ),
                "month",
            ),
        )
        if scope_lo is not None:
            # below-scope months keep their stored rows — the retained
            # only-copy of partially-expired history (tiering contract);
            # the recompute's rows for them exist only as lag context
            out = out.filter(F.col("bucket_start_ns") >= scope_lo)
        (
            out.repartition("metric", "bucket_month")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("metric", "bucket_month")
            .parquet(troot)
        )
        # months the recompute produced, per metric — partitions in scope
        # with stored data but NO recomputed rows are corruption's "extra
        # buckets": delete them (log-sized collect: one row per
        # metric-month of a rollup)
        produced = {
            (r["metric"], str(r["bucket_month"]))
            for r in out.select("metric", "bucket_month").distinct().collect()
        }
        n = 0
        for mname in os.listdir(troot):
            mdir = os.path.join(troot, mname)
            if not mname.startswith("metric=") or not os.path.isdir(mdir):
                continue
            metric = mname.split("=", 1)[1]
            for tpath, d in _time_dirs_months(mdir):
                if scope_lo is not None and _month_start_ns(d) < scope_lo:
                    continue  # pre-floor history: the only copy, keep
                n += 1
                if (metric, d) not in produced:
                    _rmtree_strict(tpath)
        rewritten[name] = n
    # level rewrites are invisible in the durability metadata — tick the
    # epoch so resident servers drop plans pinned to the old files
    store_meta.bump_store_epoch(store_dir)
    return rewritten


def _time_dirs_months(parent: str) -> list[tuple[str, str]]:
    out = []
    for nm in os.listdir(parent):
        col, eq, val = nm.partition("=")
        if eq and col == "bucket_month":
            out.append((os.path.join(parent, nm), val))
    return out
