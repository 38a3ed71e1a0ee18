"""History query service: the reference's four query types + level router.

The reference dispatches history RPCs on a request-type switch
(/root/reference/src/async_hta_service.hpp:359-491):

  Q1 AGGREGATE_TIMELINE (:361-392) — rows of (time, Aggregate) from the
     coarsest level whose width <= interval_max; finest if none qualifies.
  Q2 FLEX_TIMELINE      (:393-441) — like Q1, but falls through to raw
     samples when interval_max is finer than the finest level.
  Q3 AGGREGATE          (:442-464) — one merged Aggregate over [start, end).
  Q4 LAST_VALUE         (:465-488) — the single most recent raw sample.

This module is the *entire* planner the system needs (SURVEY §3.2): pick the
level table, emit a partition-prunable range scan. Catalyst does the rest
(predicate pushdown into Parquet, column pruning, top-1 as
TakeOrderedAndProject).

Level tables are DataFrames (materialized rollups in production, lazily
built in tests); ``HistoryService`` holds ``{width_ns: DataFrame}`` plus the
raw samples table.

Boundary semantics: [start, end) half-open on bucket_start_ns for aggregate
levels, inclusive-start on raw ts (matching hta::Scope::closed on start /
open on end — SURVEY A11; the Scope variants are exposed via
``scope_predicate``).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators.hta import AGG_FIELDS


#: Q3 auto-router threshold: decompose across levels only when the
#: finest-only scan would cover more than this many bucket rows per
#: metric. At the reference's 40 s finest width this is ~7.6 days — short
#: dashboards take the single pruned scan, archival ranges take the
#: O(levels)-row decomposition. See HistoryService.aggregate.
AUTO_DECOMPOSE_MIN_BUCKETS = 16384


def glob_to_like(pattern: str) -> str:
    """Translate a shell glob (``*`` = any run, ``?`` = one char) into a SQL
    LIKE pattern, escaping LIKE's own metacharacters so a literal ``%``,
    ``_`` or ``\\`` in a metric name never widens the match. The escape
    character is backslash — Spark's LIKE default; an engine without a
    default escape (e.g. DuckDB) must add ``ESCAPE '\\'`` explicitly."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def glob_match(name: str, pattern: str) -> bool:
    """Python-side evaluation of the SAME glob dialect ``glob_to_like``
    translates (``*`` any run, ``?`` one char, everything else literal —
    deliberately NOT fnmatch, whose ``[seq]`` classes the SQL paths would
    treat literally): used where matching happens driver-side over a
    directory listing (serve ``list_metrics``) so every pattern surface
    agrees. Property-tested equal to LIKE-on-glob_to_like."""
    import re

    rx = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    )
    return re.fullmatch(rx, name, flags=re.DOTALL) is not None


def choose_level(widths_ns: list[int], interval_max_ns: int) -> int | None:
    """Coarsest level width <= interval_max; None => raw fallthrough for
    FLEX queries, finest level for AGGREGATE_TIMELINE."""
    eligible = [w for w in widths_ns if w <= interval_max_ns]
    return max(eligible) if eligible else None


def q3_segments(
    start_ns: int, end_ns: int, widths_ns: list[int]
) -> list[tuple[int, int, int]]:
    """Q3 level decomposition (reference A9,
    /root/reference/src/async_hta_service.hpp:442-464): cover the finest
    buckets whose start lies in [start, end) with the COARSEST buckets that
    fit — coarse interior, recursively finer edges — returning
    ``[(width_ns, lo_ns, hi_ns), ...]`` scan segments where each segment
    reads buckets with ``lo <= bucket_start_ns < hi`` from the
    ``width_ns`` level.

    Exactness: a coarse bucket [c, c+w) is the bit-exact merge of its
    constituent finest buckets (the mergeability invariant,
    tests/test_hta_properties.py), and a coarse bucket is substituted only
    when its FULL index span lies inside the covered finest-bucket range —
    so the merged result is identical to the finest-only scan while reading
    O(levels * factor) rows instead of O(range / w0) rows. At a 100x time
    range that is thousands vs millions of bucket rows per metric.

    Only widths that are exact multiples of the finest width participate
    (epoch-aligned tumbling buckets nest iff widths divide — build_levels'
    ``interval_min * factor**k`` construction guarantees it; anything else
    is skipped, never wrongly substituted).
    """
    w0 = min(widths_ns)
    a0 = -(-start_ns // w0) * w0  # first finest bucket start >= start
    a1 = -(-end_ns // w0) * w0    # buckets with start < end (trailing
    #                               partial bucket included whole — same
    #                               semantics as the finest-only filter)
    # ceil-alignment overflows int64 for an open-ended range (serve's
    # default end is TS_MAX_NS = 2^63-1), and F.lit of an over-long int
    # dies in py4j with NumberFormatException. No bucket start can exceed
    # TS_MAX_NS, so an unaligned cap preserves "bucket_start < end"
    # exactly: the finest segment filters `< a1` directly and coarser
    # levels floor-align their interior span from it.
    a1 = min(a1, (1 << 63) - 1)
    if a0 >= a1:
        return []
    usable = sorted((w for w in widths_ns if w % w0 == 0), reverse=True)
    return _decompose(a0, a1, usable)


def _decompose(
    a0: int, a1: int, widths_desc: list[int]
) -> list[tuple[int, int, int]]:
    if a0 >= a1:
        return []
    w = widths_desc[0]
    if len(widths_desc) == 1:
        return [(w, a0, a1)]  # finest level: a0 is w-aligned (a1 may be
        #                       the unaligned TS_MAX cap — used only as an
        #                       exclusive upper bound, so still exact)
    lo = -(-a0 // w) * w      # first w-aligned start >= a0
    hi = (a1 // w) * w        # last w bucket fully inside [a0, a1)
    if lo >= hi:
        return _decompose(a0, a1, widths_desc[1:])
    return (
        _decompose(a0, lo, widths_desc[1:])
        + [(w, lo, hi)]
        + _decompose(hi, a1, widths_desc[1:])
    )


def q3_segments_tiered(
    start_ns: int,
    end_ns: int,
    widths_ns: list[int],
    floors: dict[int, int],
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int]]]:
    """Availability-constrained Q3 decomposition for a store under tiered
    retention (operators/retention.py): cover [start, end) with the
    coarsest buckets that fit AND still exist, recursing to finer edges
    only where the finer level's history survives. Returns
    ``(segments, gaps)`` — segments as in :func:`q3_segments`, plus the
    sub-ranges NO retained level can serve exactly (each bounded by one
    coarse bucket width, at the range edges under monotone tiering).

    ``floors[width]`` is the level's advertised retention floor (buckets
    with ``bucket_start_ns >= floor`` intact; missing width = floor 0).
    A level serves a bucket only when the WHOLE bucket is at-or-above
    its floor, so every emitted segment reads only intact buckets and
    the merged aggregate stays bit-exact over ``segments`` — degraded
    RESOLUTION for old ranges (coarser buckets), never degraded truth.
    The honest remainder is returned instead of silently clamped: a
    caller that merges ``segments`` and reports ``gaps`` serves exactly
    what RRD-style tiered stores promise.
    """
    w0 = min(widths_ns)
    a0 = -(-start_ns // w0) * w0
    a1 = min(-(-end_ns // w0) * w0, (1 << 63) - 1)  # TS_MAX cap, as Q3
    if a0 >= a1:
        return [], []
    usable = sorted((w for w in widths_ns if w % w0 == 0), reverse=True)
    # floor <= 0 / absent means "never expired": fully available, including
    # pre-epoch timestamps (legal int64 ns) — so the sentinel is -2^63,
    # not 0. Advertised retention floors are always month-aligned > 0.
    avail = {
        w: (-(-floors[w] // w) * w if floors.get(w, 0) > 0 else -(1 << 63))
        for w in usable
    }
    return _decompose_avail(a0, a1, usable, avail)


def q1_regions_tiered(
    start_ns: int,
    end_ns: int,
    widths_ns: list[int],
    floors: dict[int, int],
    interval_max_ns: int,
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int]]]:
    """Mixed-resolution timeline plan for a store under tiered retention
    (the RRD/Graphite fetch shape): serve each era of [start, end) at the
    FINEST width that (a) satisfies the requested resolution
    (``choose_level`` on ``interval_max_ns``, Q1's rule) and (b) still
    retains that era. Returns ``(regions, gaps)`` where each region
    ``(width, lo, hi)`` selects buckets with ``lo <= bucket_start < hi``
    from that width's level, regions are disjoint and time-descending in
    resolution (recent = fine, old = coarse), and ``gaps`` are the span
    slivers no retained width can serve (tier-boundary alignment
    remainders, each smaller than the coarser width, plus anything below
    the coarsest floor).

    Unlike Q3's decomposition (which prefers COARSE buckets to minimize
    rows read), a timeline prefers the requested resolution everywhere
    it survives and degrades only where it does not — resolution is the
    product here, not a cost to amortize. A coarse region's upper bound
    is floor-aligned to its own width against the finer region's start,
    so a coarse bucket never overlaps (double-plots) a finer era.
    """
    w_req = choose_level(widths_ns, interval_max_ns) or min(widths_ns)
    usable = sorted(w for w in widths_ns if w >= w_req)
    regions: list[tuple[int, int, int]] = []
    gaps: list[tuple[int, int]] = []
    prev_lo = end_ns  # exclusive upper bound of the era still unserved
    for w in usable:
        f = floors.get(w, 0)
        avail = (-(-f // w) * w) if f > 0 else -(1 << 63)
        hi = prev_lo if w == w_req else (prev_lo // w) * w
        lo = max(start_ns, avail)
        if lo >= hi:
            continue
        alo = -(-lo // w) * w  # first bucket start on this width's grid
        if hi < prev_lo:
            # alignment sliver between this tier and the finer one: a
            # coarse bucket there would straddle (double-plot) the
            # boundary
            gaps.append((hi, prev_lo))
        if alo < hi:
            regions.append((w, alo, hi))
            if alo > lo:
                # sub-width lead-in below this era's first aligned
                # bucket — no coarser grid can fit a bucket there either
                gaps.append((lo, alo))
        else:
            # the whole era is narrower than one bucket at this width
            gaps.append((lo, hi))
        prev_lo = lo
        if prev_lo <= start_ns:
            break
    if prev_lo > start_ns:
        gaps.append((start_ns, prev_lo))
    return regions, sorted(gaps)


def _decompose_avail(
    a0: int, a1: int, widths_desc: list[int], avail: dict[int, int]
) -> tuple[list[tuple[int, int, int]], list[tuple[int, int]]]:
    if a0 >= a1:
        return [], []
    w = widths_desc[0]
    if len(widths_desc) == 1:
        s = max(a0, avail[w])
        gaps = [(a0, min(s, a1))] if s > a0 else []
        segs = [(w, s, a1)] if s < a1 else []
        return segs, gaps
    lo = -(-max(a0, avail[w]) // w) * w  # first intact w bucket >= a0
    hi = (a1 // w) * w
    if lo >= hi:
        return _decompose_avail(a0, a1, widths_desc[1:], avail)
    lsegs, lgaps = _decompose_avail(a0, lo, widths_desc[1:], avail)
    rsegs, rgaps = _decompose_avail(hi, a1, widths_desc[1:], avail)
    return lsegs + [(w, lo, hi)] + rsegs, lgaps + rgaps


def _date_pruned(df: DataFrame, date_col: str, start_ns: int, end_ns: int) -> DataFrame:
    """Add a partition-pruning predicate on the store's time partition
    column when present (stores written by streaming/ingest_stream.py are
    laid out as (metric, ts_month|ts_date) for raw and (metric,
    bucket_month) for levels — the predicate on the ns column alone cannot
    prune those directory partitions)."""
    if date_col not in df.columns:
        return df
    start_day = F.to_date(F.timestamp_micros(F.lit(start_ns // 1000)))
    end_day = F.to_date(F.timestamp_micros(F.lit(min(end_ns, 2**62) // 1000)))
    if date_col in ("bucket_month", "ts_month"):
        # month dirs are labeled by their first day: a range starting
        # mid-month must still scan that month's directory
        start_day = F.trunc(start_day, "month")
    return df.filter(
        (F.col(date_col) >= start_day) & (F.col(date_col) <= end_day)
    )


def _time_pruned(df: DataFrame, start_ns: int, end_ns: int) -> DataFrame:
    """Prune whichever raw time-partition layout the store uses."""
    df = _date_pruned(df, "ts_date", start_ns, end_ns)
    return _date_pruned(df, "ts_month", start_ns, end_ns)


def _merge_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort and coalesce overlapping/adjacent [lo, hi) spans — gap lists
    built from several sources (retention floor edges, level coverage)
    normalize to one canonical uncovered list."""
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(spans):
        if out and lo <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _counter_rate_aggs(increase, width_ns: int) -> list:
    """The counter_rate output record from a per-sample ``increase``
    column: decimal-exact sum (cast back to double after the final
    round, the engine-wide presentation convention), reset count, and
    per-second rate."""
    dec = increase.cast("decimal(38,6)")
    return [
        F.round(F.sum(dec), 6).cast("double").alias("increase"),
        F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.round(
            F.sum(dec).cast("double") / F.lit(width_ns / 1e9), 6
        ).alias("rate_per_s"),
    ]


#: gapfill level-slice rows above this are joined SHUFFLED, not broadcast:
#: the slice has at most one row per spine bucket, and a fine-width
#: long-range request (legal under serve's 10M-point spine guard) would
#: otherwise collect millions of Aggregate rows onto the driver for the
#: broadcast — a resource crash on a request the guard deemed safe
#: (r13 review). 1M rows x 8 cols is ~100 MB serialized, a safe ceiling.
GAPFILL_BROADCAST_MAX_BUCKETS = 1_000_000


def _gapfill_join(spine: DataFrame, tl: DataFrame, n_buckets: int) -> DataFrame:
    right = F.broadcast(tl) if n_buckets <= GAPFILL_BROADCAST_MAX_BUCKETS else tl
    return spine.join(right, "bucket_start_ns", "left")


def _counter_level_aggs(width_ns: int) -> list:
    """The counter_rate output record merged from stored LEVEL partials
    (``increase_sum``/``n_resets`` columns, decimal-exact from the
    cascade) — the level-side twin of :func:`_counter_rate_aggs`. One
    owner (r13 review): the stored and leveled serving forms are
    documented bit-equal, so a rounding/typing fix must reach both."""
    return [
        F.round(F.sum("increase_sum"), 6).cast("double").alias("increase"),
        F.sum("n_resets").cast("long").alias("n_resets"),
        F.round(
            F.sum("increase_sum").cast("double") / F.lit(width_ns / 1e9), 6
        ).alias("rate_per_s"),
    ]


@dataclass
class HistoryService:
    raw: DataFrame                      # (metric, ts_ns, value)
    levels: dict[int, DataFrame]        # width_ns -> agg_level table
    widths: list[int] = field(init=False)

    def __post_init__(self) -> None:
        self.widths = sorted(self.levels)

    # -- Q1 ----------------------------------------------------------------
    def aggregate_timeline(
        self,
        metric: str | None,
        start_ns: int,
        end_ns: int,
        interval_max_ns: int,
        pattern: str | None = None,
    ) -> DataFrame:
        """Q1: (metric, bucket_start_ns, Aggregate...) rows ordered by time.
        Buckets whose start lies in [start, end). ``pattern`` (a shell
        glob, mutually exclusive with ``metric``) keeps the PER-METRIC
        rows for every matching metric — the multi-line dashboard chart
        ("one line per host.*.power") in one request; the MERGED fleet
        form is :meth:`aggregate_timeline_pattern`."""
        if metric is not None and pattern is not None:
            raise ValueError("pass at most one of metric / pattern")
        width = choose_level(self.widths, interval_max_ns) or self.widths[0]
        df = self.levels[width]
        if metric is not None:
            df = df.filter(F.col("metric") == metric)
        elif pattern is not None:
            df = df.filter(F.col("metric").like(glob_to_like(pattern)))
        df = _date_pruned(df, "bucket_month", start_ns, end_ns)
        return (
            df.filter(
                (F.col("bucket_start_ns") >= start_ns)
                & (F.col("bucket_start_ns") < end_ns)
            )
            .select("metric", "bucket_start_ns", *AGG_FIELDS)
            .orderBy("metric", "bucket_start_ns")
        )

    # -- Q1, gap-filled ------------------------------------------------------
    def aggregate_timeline_gapfill(
        self, metric: str, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Q1 over a dense time spine: one row per level bucket whose start
        lies in [start, end), whether or not any sample fell in it.

        Gap rows carry the *merge identity* of the Aggregate record —
        count=0, sum/integral/active_time=0, NULL minimum/maximum — so a
        gap-filled timeline still rolls up / merges exactly like a sparse
        one (hta.rollup over it is unchanged: the zero rows contribute
        nothing and NULL min/max are ignored by MIN/MAX).

        Scale shape: the spine is ``spark.range`` — a parallel iota scan
        that reads no data — left-joined against the pruned rollup slice,
        broadcast while it is driver-safe (<= GAPFILL_BROADCAST_MAX_BUCKETS
        spine buckets; beyond that the slice itself can be millions of
        rows and the join runs shuffled instead). Under the broadcast
        bound there are zero exchanges on the spine side regardless of
        range length, so a year-long dense minutely spine (~0.5M rows)
        costs one codegen stage. The reference returns sparse timelines and leaves gap
        handling to clients (/root/reference/src/async_hta_service.hpp:
        361-392); a dashboard over a large store wants the dense form
        computed next to the data.
        """
        width = choose_level(self.widths, interval_max_ns) or self.widths[0]
        tl = self.aggregate_timeline(metric, start_ns, end_ns, interval_max_ns)
        first = start_ns + (-start_ns) % width  # first aligned bucket >= start
        spine = tl.sparkSession.range(first, end_ns, width).select(
            F.col("id").alias("bucket_start_ns")
        )
        types = dict(tl.dtypes)
        filled = _gapfill_join(
            spine, tl.drop("metric"), (end_ns - first) // width
        )
        zero_filled = ("sum", "count", "integral", "active_time")
        return filled.select(
            F.lit(metric).alias("metric"),
            "bucket_start_ns",
            "minimum",
            "maximum",
            *[
                F.coalesce(F.col(c), F.lit(0).cast(types[c])).alias(c)
                for c in zero_filled
            ],
        ).orderBy("bucket_start_ns")

    # -- Q1 across a metric pattern ------------------------------------------
    def aggregate_timeline_pattern(
        self, pattern: str, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Fleet Q1: ONE merged Aggregate timeline across every metric whose
        name matches a shell glob (``*`` any run, ``?`` one char — metricq
        names are dotted hierarchies, so ``host.*.power`` is the natural
        fleet selector).

        The cross-metric merge is the same monoid the rollup cascade uses
        (operators/hta.py::rollup) applied on the metric axis instead of the
        time axis: each bucket's row is the pointwise combine of the
        matching metrics' per-metric Aggregate records — exactly what a
        client merging M single-metric responses computes (fleet totals:
        sum of per-metric integrals/active_time, min/max across metrics),
        NOT the Aggregate of an interleaved union stream, whose delta_ns
        attribution would differ. No raw scan, no per-metric fan-out.
        ``n_metrics`` counts
        the metrics PRESENT in the bucket (levels are sparse; a metric with
        no samples there has no row), via COUNT not COUNT DISTINCT — one
        row per (metric, bucket) is a store invariant (fsck audits it) and
        distinct aggregation would force a second shuffle phase.

        Scale shape: one partition-pruned scan of the chosen log-sized
        level + one groupBy(bucket) — cost independent of raw history size,
        linear in matching level rows. The reference serves only per-metric
        requests (/root/reference/src/async_hta_service.hpp:361-441); a
        fleet dashboard otherwise issues M requests and merges client-side.
        """
        width = choose_level(self.widths, interval_max_ns) or self.widths[0]
        df = self.levels[width].filter(
            F.col("metric").like(glob_to_like(pattern))
        )
        df = _date_pruned(df, "bucket_month", start_ns, end_ns)
        return (
            df.filter(
                (F.col("bucket_start_ns") >= start_ns)
                & (F.col("bucket_start_ns") < end_ns)
            )
            .groupBy("bucket_start_ns")
            .agg(
                F.count("metric").alias("n_metrics"),
                F.min("minimum").alias("minimum"),
                F.max("maximum").alias("maximum"),
                # decimal-in, decimal-out — the same exact accumulators as
                # the level cascade, so pattern-over-levels == pattern-over-
                # raw bit-for-bit (presentation casts at the edge)
                F.sum("sum").alias("sum"),
                F.sum("count").cast("long").alias("count"),
                F.sum("integral").cast("long").alias("integral"),
                F.sum("active_time").cast("long").alias("active_time"),
            )
            .orderBy("bucket_start_ns")
        )

    def aggregate_timeline_pattern_gapfill(
        self, pattern: str, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Dense fleet Q1: the merged glob timeline over a full spine —
        one row per level bucket in [start, end) whether or not any
        matching metric has data there. Gap rows carry the merge
        identity extended with ``n_metrics = 0`` (no metric present), so
        the dense fleet form still merges/rolls up exactly like the
        sparse one. Same plan shape as the single-metric gapfill: a
        spark.range spine left-joined against the merged slice (broadcast
        under the same driver-safety bound, shuffled past it)."""
        width = choose_level(self.widths, interval_max_ns) or self.widths[0]
        tl = self.aggregate_timeline_pattern(
            pattern, start_ns, end_ns, interval_max_ns
        )
        first = start_ns + (-start_ns) % width
        spine = tl.sparkSession.range(first, end_ns, width).select(
            F.col("id").alias("bucket_start_ns")
        )
        types = dict(tl.dtypes)
        filled = _gapfill_join(spine, tl, (end_ns - first) // width)
        zero_filled = (
            "n_metrics", "sum", "count", "integral", "active_time",
        )
        return filled.select(
            "bucket_start_ns",
            *[
                F.coalesce(F.col(c), F.lit(0).cast(types[c])).alias(c)
                for c in zero_filled
            ],
            "minimum",
            "maximum",
        ).orderBy("bucket_start_ns")

    # -- Q2 ----------------------------------------------------------------
    def flex_timeline(
        self, metric: str | None, start_ns: int, end_ns: int, interval_max_ns: int
    ) -> DataFrame:
        """Q2: Q1, or raw (metric, ts_ns, value) when the request is finer
        than the finest level. Union result type, dispatched here (the
        reference returns a std::variant, :427-437)."""
        if choose_level(self.widths, interval_max_ns) is None:
            df = self.raw
            if metric is not None:
                df = df.filter(F.col("metric") == metric)
            df = _time_pruned(df, start_ns, end_ns)
            return (
                df.filter((F.col("ts_ns") >= start_ns) & (F.col("ts_ns") < end_ns))
                .select("metric", "ts_ns", "value")
                .orderBy("metric", "ts_ns")
            )
        return self.aggregate_timeline(metric, start_ns, end_ns, interval_max_ns)

    # -- Q3 ----------------------------------------------------------------
    def aggregate(
        self,
        metric: str | None,
        start_ns: int,
        end_ns: int,
        decompose: bool | str = "auto",
    ) -> DataFrame:
        """Q3: one merged Aggregate per metric over [start, end).

        ``decompose=True`` answers from coarse interior buckets plus
        recursively finer edge buckets (reference A9 — ``q3_segments``
        documents the exactness argument): each level is scanned once with
        an OR of at most two tight bucket ranges, the per-level slices
        union, and a single groupBy(metric) merges them — O(levels*factor)
        rows read instead of O(range / w0). ``decompose=False`` keeps the
        finest-only scan; the property test pins the two bit-equal.

        ``"auto"`` (default) is the cost-based router: the reference
        always decomposes because its in-process tree walk is free
        (async_hta_service.hpp:442-464), but on Spark each extra level
        table is an extra scan stage (~0.1-0.2 s of plan/stage overhead —
        measured: decomposing a 360-bucket range DOUBLED the bench query,
        0.17 -> 0.32 s resident). Decompose only when the finest-only
        scan would read more than AUTO_DECOMPOSE_MIN_BUCKETS bucket rows
        per metric — below that the single pruned scan is strictly
        cheaper; far above it (the open-ended serve default) the
        decomposition's O(levels) rows win by orders of magnitude."""
        if decompose == "auto":
            w0 = self.widths[0]
            span = max(0, min(end_ns, (1 << 63) - 1) - start_ns)
            decompose = span // w0 > AUTO_DECOMPOSE_MIN_BUCKETS
        segs = (
            q3_segments(start_ns, end_ns, self.widths)
            if decompose
            else [(self.widths[0], start_ns, end_ns)]
        )
        return self._merge_segments(metric, segs)

    # -- Q3 across a metric pattern ------------------------------------------
    def aggregate_pattern(
        self, pattern: str, start_ns: int, end_ns: int
    ) -> DataFrame:
        """Fleet Q3: ONE merged Aggregate row over [start, end) across
        every metric matching a shell glob, plus ``n_metrics`` — the
        whole-range companion of :meth:`aggregate_timeline_pattern`
        ("total energy of host.*.power this month" in one request).

        Built on :meth:`aggregate`'s cost-routed level decomposition with
        the glob as a plain filter: ``metric`` is the grouping key, so
        Catalyst pushes the LIKE through the per-metric aggregate down to
        the level scans — matching metrics' rows are the only rows read —
        and one final ungrouped merge (the rollup monoid on the metric
        axis) collapses the per-metric records."""
        per_metric = self.aggregate(None, start_ns, end_ns).filter(
            F.col("metric").like(glob_to_like(pattern))
        )
        return per_metric.agg(
            F.count("metric").alias("n_metrics"),
            F.min("minimum").alias("minimum"),
            F.max("maximum").alias("maximum"),
            F.sum("sum").alias("sum"),
            F.sum("count").cast("long").alias("count"),
            F.sum("integral").cast("long").alias("integral"),
            F.sum("active_time").cast("long").alias("active_time"),
        )

    def aggregate_tiered(
        self,
        metric: str | None,
        start_ns: int,
        end_ns: int,
        floors: dict[int, int],
    ) -> tuple[DataFrame, list[tuple[int, int]]]:
        """Q3 over a store under tiered retention: one merged Aggregate
        per metric over the maximal exactly-servable part of
        [start, end), answered from whichever levels still retain each
        sub-range (coarse buckets for expired-raw history — degraded
        resolution, exact values), plus the honest list of sub-ranges no
        retained level covers. ``floors`` maps level width -> advertised
        retention floor (plans/serve.py feeds the ``_retention.json``
        values). With no floors this is exactly ``aggregate(...,
        decompose=True)`` with an empty gap list."""
        segs, gaps = q3_segments_tiered(start_ns, end_ns, self.widths, floors)
        return self._merge_segments(metric, segs), gaps

    def timeline_tiered(
        self,
        metric: str | None,
        start_ns: int,
        end_ns: int,
        interval_max_ns: int,
        floors: dict[int, int],
    ) -> tuple[DataFrame, list[tuple[int, int]]]:
        """Q1 under tiered retention: a mixed-resolution timeline — rows
        ``(metric, bucket_start_ns, width_ns, Aggregate...)`` — serving
        each era at the finest width that satisfies the requested
        resolution AND still retains it (``q1_regions_tiered``; recent =
        requested width, older = progressively coarser), plus the span
        slivers no retained width can serve. Every row is a true stored
        bucket (values exact, resolution varies); ``width_ns`` tells the
        client each row's bucket span, which is what an RRD-style
        consumer plots."""
        regions, gaps = q1_regions_tiered(
            start_ns, end_ns, self.widths, floors, interval_max_ns
        )
        parts = []
        for w, lo, hi in regions:
            df = self.levels[w]
            if metric is not None:
                df = df.filter(F.col("metric") == metric)
            df = _date_pruned(df, "bucket_month", lo, hi)
            parts.append(
                df.filter(
                    (F.col("bucket_start_ns") >= lo)
                    & (F.col("bucket_start_ns") < hi)
                ).select(
                    "metric",
                    "bucket_start_ns",
                    F.lit(w).cast("long").alias("width_ns"),
                    *AGG_FIELDS,
                )
            )
        if not parts:  # fully expired / empty request: schema, no scan
            w0 = self.widths[0]
            parts = [
                self.levels[w0]
                .filter(F.lit(False))
                .select(
                    "metric",
                    "bucket_start_ns",
                    F.lit(w0).cast("long").alias("width_ns"),
                    *AGG_FIELDS,
                )
            ]
        merged = reduce(DataFrame.unionByName, parts)
        return merged.orderBy("metric", "bucket_start_ns"), gaps

    def _merge_segments(
        self, metric: str | None, segs: list[tuple[int, int, int]]
    ) -> DataFrame:
        """Union the per-level bucket slices a decomposition selected and
        merge them to one Aggregate per metric (each level scanned once
        with an OR of its tight ranges; partition-pruned)."""
        by_width: dict[int, list[tuple[int, int]]] = defaultdict(list)
        for w, lo, hi in segs:
            by_width[w].append((lo, hi))
        parts = []
        for w, ranges in by_width.items():
            df = self.levels[w]
            if metric is not None:
                df = df.filter(F.col("metric") == metric)
            df = _date_pruned(
                df,
                "bucket_month",
                min(lo for lo, _ in ranges),
                max(hi for _, hi in ranges),
            )
            pred = reduce(
                lambda a, b: a | b,
                (
                    (F.col("bucket_start_ns") >= lo)
                    & (F.col("bucket_start_ns") < hi)
                    for lo, hi in ranges
                ),
            )
            parts.append(df.filter(pred).select("metric", *AGG_FIELDS))
        if not parts:  # empty range: keep the result schema, scan nothing
            parts = [
                self.levels[self.widths[0]]
                .filter(F.lit(False))
                .select("metric", *AGG_FIELDS)
            ]
        merged = reduce(DataFrame.unionByName, parts)
        return (
            merged.groupBy("metric")
            .agg(
                F.min("minimum").alias("minimum"),
                F.max("maximum").alias("maximum"),
                F.sum("sum").alias("sum"),
                F.sum("count").cast("long").alias("count"),
                F.sum("integral").cast("long").alias("integral"),
                F.sum("active_time").cast("long").alias("active_time"),
            )
            .orderBy("metric")
        )

    # -- Q4 ----------------------------------------------------------------
    def last_value(
        self, metric: str | None = None, pattern: str | None = None
    ) -> DataFrame:
        """Q4: most recent raw sample per metric. The reference queries
        retrieve(ts_max, ts_max, Scope::extended/open) (:465-488); in Spark
        this is max_by over the metric group — a single partial/final agg,
        no sort. ``pattern`` (a shell glob, mutually exclusive with
        ``metric``) restricts to matching metrics — the fleet
        current-values panel ("last value of host.*.power") in one
        request instead of M."""
        if metric is not None and pattern is not None:
            raise ValueError("pass at most one of metric / pattern")
        df = self.raw
        if metric is not None:
            df = df.filter(F.col("metric") == metric)
        elif pattern is not None:
            df = df.filter(F.col("metric").like(glob_to_like(pattern)))
        return (
            df.groupBy("metric")
            .agg(
                F.max("ts_ns").alias("ts_ns"),
                F.max_by("value", "ts_ns").alias("value"),
            )
            .orderBy("metric")
        )

    # -- counter-rate timeline (serving form of operators/hta.py::
    #    counter_increase) ----------------------------------------------------
    def counter_rate_timeline(
        self, metric: str, start_ns: int, end_ns: int, width_ns: int
    ) -> DataFrame:
        """Monotonic-counter rate timeline from raw: per width-bucket
        increase sum, reset count and per-second rate over [start, end).
        The first in-range sample is the baseline (contributes no
        increase — NULL increase/rate in a bucket holding only it): the
        standard range-query semantics for counters, deliberately NOT
        reaching before ``start`` for a prior sample. Raw-proportional
        but (metric, time) partition-pruned, same class as resample."""
        from metricq_db_hta_spark.operators.hta import counter_increase

        raw = self.raw.filter(F.col("metric") == metric)
        raw = _time_pruned(raw, start_ns, end_ns).filter(
            (F.col("ts_ns") >= start_ns) & (F.col("ts_ns") < end_ns)
        )
        inc = counter_increase(raw)
        return (
            inc.groupBy(
                "metric",
                (F.col("ts_ns") - F.col("ts_ns") % width_ns).alias(
                    "bucket_start_ns"
                ),
            )
            .agg(*_counter_rate_aggs(F.col("increase"), width_ns))
            .orderBy("bucket_start_ns")
        )

    def counter_rate_timeline_pattern(
        self, pattern: str, start_ns: int, end_ns: int, width_ns: int
    ) -> DataFrame:
        """Fleet counter rate: per-bucket sum of every glob-matching
        metric's increases (each with its own per-metric reset detection
        and first-in-range baseline), labeled with the glob — the "total
        requests/sec across host.*" dashboard line. Increases are
        additive across metrics exactly as they are across buckets, so
        the merged timeline IS the sum of the per-metric ones (pinned in
        tests). Served from raw with ONE per-metric window + one groupBy
        — the fleet form favors recent dashboard ranges; the
        range-length-independent leveled decomposition stays the
        single-metric fast path (its per-metric edge search does not
        compose setwise without rescanning the range)."""
        from metricq_db_hta_spark.operators.hta import counter_increase

        raw = self.raw.filter(F.col("metric").like(glob_to_like(pattern)))
        raw = _time_pruned(raw, start_ns, end_ns).filter(
            (F.col("ts_ns") >= start_ns) & (F.col("ts_ns") < end_ns)
        )
        inc = counter_increase(raw)
        return (
            inc.groupBy(
                (F.col("ts_ns") - F.col("ts_ns") % width_ns).alias(
                    "bucket_start_ns"
                )
            )
            .agg(
                *_counter_rate_aggs(F.col("increase"), width_ns),
                F.count_distinct("metric").alias("n_metrics"),
            )
            .withColumn("metric", F.lit(pattern))
            .select(
                "metric", "bucket_start_ns", "increase", "n_resets",
                "rate_per_s", "n_metrics",
            )
            .orderBy("bucket_start_ns")
        )

    def counter_rate_timeline_stored(
        self,
        counter_df: DataFrame,
        level_width_ns: int,
        metric: str | None,
        start_ns: int,
        end_ns: int,
        width_ns: int,
        raw_floor_ns: int = 0,
        pattern: str | None = None,
        coverage_gaps: list[tuple[int, int]] | None = None,
    ) -> tuple[DataFrame, list[tuple[int, int]]]:
        """STORED-attribution counter_rate: every sample's increase is
        the one measured against its true predecessor (the persisted
        ``prev_value`` chain — exactly what the ``counter_<w>`` sums
        hold), so there is no first-in-range baseline rule and the
        result is exact with respect to FULL history. Two consequences
        the range-baseline form can't offer:

        * fully-covered output buckets are servable from the level
          tables ALONE — including ranges whose raw has EXPIRED under
          tiered retention (the counter analogue of
          :meth:`timeline_tiered`), because the level rows outlive raw;
        * the plan needs no first-sample search: zero driver-side
          lookups, so a cached (prepared) plan is one job.

        Only the sub-bucket EDGE slivers need raw (via the stored
        ``prev_value`` column, window-free); an edge below
        ``raw_floor_ns`` is honestly UNSERVABLE at sample grain and is
        returned in ``gaps`` rather than silently approximated —
        the same uncovered-contract as the tiered aggregate paths.

        Returns ``(df, gaps)`` with df columns matching
        :meth:`counter_rate_timeline` (each bucket row reflects only
        in-range samples, as there). ``pattern`` (exactly one of
        metric/pattern) serves the FLEET form — merged across the glob
        like :meth:`counter_rate_timeline_pattern`, but from the level
        tables, so fleet counter history is also servable past raw
        expiry; ``n_metrics`` from level rows is exact (any metric with
        a sample in a bucket has a level row).

        ``coverage_gaps``: [start, end)-ns spans where the counter table
        is known to MISS level rows that raw (or expired raw) held —
        counter levels enabled on a store with pre-existing history
        (``store_meta.counter_coverage_gaps``). The interior is served
        from level rows alone, so these spans, clipped to the aligned
        interior, are reported in ``gaps`` instead of silently returning
        short sums; the caller heals them with
        ``operators/fsck.rebuild_levels``."""
        if width_ns % level_width_ns != 0:
            raise ValueError(
                f"output width {width_ns} not a multiple of the counter "
                f"level width {level_width_ns}"
            )
        from metricq_db_hta_spark.operators.hta import (
            counter_increase_stored,
        )

        if (metric is None) == (pattern is None):
            raise ValueError("pass exactly one of metric / pattern")
        fleet = pattern is not None
        mflt = (
            F.col("metric").like(glob_to_like(pattern))
            if fleet
            else (F.col("metric") == metric)
        )

        a_start = -(-start_ns // width_ns) * width_ns
        a_end = (end_ns // width_ns) * width_ns
        gaps: list[tuple[int, int]] = []
        for lo, hi in coverage_gaps or ():
            lo, hi = max(int(lo), a_start), min(int(hi), a_end)
            if lo < hi:
                gaps.append((lo, hi))
        parts: list[DataFrame] = []
        out_bucket = (
            F.col("ts_ns") - F.col("ts_ns") % F.lit(width_ns)
        ).alias("bucket_start_ns")
        # fleet form: one merged row per bucket (increases add across
        # metrics like across buckets), labeled with the glob and
        # carrying n_metrics — count_distinct over level rows is EXACT
        # because any metric with a sample in a bucket has a level row
        fleet_tail = (
            [F.count_distinct("metric").cast("long").alias("n_metrics")]
            if fleet
            else []
        )

        def _label(df: DataFrame) -> DataFrame:
            if not fleet:
                return df
            return df.withColumn("metric", F.lit(pattern)).select(
                "metric", "bucket_start_ns", "increase", "n_resets",
                "rate_per_s", "n_metrics",
            )

        if a_start < a_end:
            lvl = counter_df.filter(mflt)
            lvl = _date_pruned(lvl, "bucket_month", a_start, a_end)
            grp = (
                []
                if fleet
                else [F.col("metric")]
            )
            parts.append(
                _label(
                    lvl.filter(
                        (F.col("bucket_start_ns") >= a_start)
                        & (F.col("bucket_start_ns") < a_end)
                    )
                    .groupBy(
                        *grp,
                        (
                            F.col("bucket_start_ns")
                            - F.col("bucket_start_ns") % F.lit(width_ns)
                        ).alias("bucket_start_ns"),
                    )
                    .agg(*_counter_level_aggs(width_ns), *fleet_tail)
                )
            )

        def _edge(lo: int, hi: int) -> None:
            if lo >= hi:
                return
            if lo < raw_floor_ns:
                gaps.append((lo, min(hi, raw_floor_ns)))
                lo = raw_floor_ns
                if lo >= hi:
                    return
            raw = _time_pruned(self.raw.filter(mflt), lo, hi).filter(
                (F.col("ts_ns") >= lo) & (F.col("ts_ns") < hi)
            )
            grp = [] if fleet else [F.col("metric")]
            parts.append(
                _label(
                    counter_increase_stored(raw)
                    .groupBy(*grp, out_bucket)
                    .agg(
                        *_counter_rate_aggs(F.col("increase"), width_ns),
                        *fleet_tail,
                    )
                )
            )

        if a_start >= a_end:
            # the whole range sits inside one output bucket
            _edge(start_ns, end_ns)
        else:
            _edge(start_ns, a_start)
            _edge(a_end, end_ns)

        if not parts:
            empty = (
                self.counter_rate_timeline_pattern(
                    pattern, start_ns, min(start_ns, end_ns), width_ns
                )
                if fleet
                else self.counter_rate_timeline(
                    metric, start_ns, min(start_ns, end_ns), width_ns
                )
            )
            return empty, _merge_spans(gaps)
        res = parts[0]
        for p in parts[1:]:
            res = res.unionByName(p)
        return res.orderBy("bucket_start_ns"), _merge_spans(gaps)

    def counter_rate_timeline_leveled(
        self,
        counter_df: DataFrame,
        level_width_ns: int,
        metric: str,
        start_ns: int,
        end_ns: int,
        width_ns: int,
    ) -> DataFrame:
        """:meth:`counter_rate_timeline` served from a maintained
        ``counter_<w>`` level table (the same coarse-interior/fine-edge
        decomposition Q3 uses, applied to the counter family):

        * **interior** output buckets — fully inside the range and
          strictly after the bucket holding the first in-range sample —
          are exact SUMs of stored level rows (each stored increase is
          attributed to its own sample's bucket and measured against a
          predecessor that is provably in range, so stored == range-lag);
        * the **low edge** (everything up to and including the first
          in-range sample's bucket) is recomputed from ≤ two bucket
          widths of range-pruned raw with the in-slice lag, which
          reproduces the baseline rule (the first in-range sample
          contributes no increase) exactly;
        * an unaligned **high edge** is recomputed from < one bucket
          width of raw using the stored ``prev_value`` column — its first
          row's predecessor lives in the interior, which an in-slice lag
          could not see.

        Cost: ONE scalar-lookup job (the sub-bucket raw head slice and
        the level-table min, unioned into a single collect) + level rows
        + ≤ 3 bucket widths of raw — independent of the requested range
        length, which is the point. Bit-equal to the raw form: stored
        per-bucket sums are exact DECIMAL(38,6) partials of the same
        increases, and decimal addition is associative.
        Caller guarantees ``width_ns % level_width_ns == 0``; returns
        None-equivalent fallback decisions to the caller (raises if the
        widths don't divide)."""
        if width_ns % level_width_ns != 0:
            raise ValueError(
                f"output width {width_ns} not a multiple of the counter "
                f"level width {level_width_ns}"
            )
        lvl = counter_df.filter(F.col("metric") == metric)
        lvl = _date_pruned(lvl, "bucket_month", start_ns, end_ns)

        # first in-range sample's OUTPUT bucket (all that is needed
        # downstream): from the sub-bucket head slice of raw, or (when
        # start is level-aligned-empty) from the first in-range level
        # bucket — both minima computed in ONE unioned job (r11 shipped
        # this as three sequential driver scalars; VERDICT r11 #3)
        ceil_lvl = -(-start_ns // level_width_ns) * level_width_ns
        head_hi = min(ceil_lvl, end_ns)
        lvl_min = (
            lvl.filter(
                (F.col("bucket_start_ns") >= ceil_lvl)
                & (F.col("bucket_start_ns") < end_ns)
            )
            .agg(F.min("bucket_start_ns").alias("v"))
            .select(F.lit("lvl").alias("k"), F.col("v"))
        )
        probe = lvl_min
        if head_hi > start_ns:
            probe = (
                self._pruned_metric_raw(metric, start_ns, head_hi)
                .agg(F.min("ts_ns").alias("v"))
                .select(F.lit("head").alias("k"), F.col("v"))
                .unionByName(lvl_min)
            )
        mins = {r["k"]: r["v"] for r in probe.collect()}
        if mins.get("head") is not None:
            first_ts = int(mins["head"])
            fb_out = first_ts - first_ts % width_ns
        elif mins.get("lvl") is not None:
            fb2 = int(mins["lvl"])
            if fb2 + level_width_ns <= end_ns:
                # the whole level bucket is in range, so its first sample
                # is too; level buckets never straddle output buckets
                # (width is a multiple, both epoch-aligned), so the level
                # bucket pins the output bucket with NO raw lookup
                fb_out = fb2 - fb2 % width_ns
            else:
                # the candidate level bucket straddles `end` — only here
                # does deciding take a second scalar job (rare: at most
                # the last level bucket of the range)
                r = (
                    self._pruned_metric_raw(metric, fb2, end_ns)
                    .agg(F.min("ts_ns"))
                    .collect()[0][0]
                )
                if r is None:
                    # every sample of the bucket lies at-or-after `end`:
                    # nothing is in range
                    return self.counter_rate_timeline(
                        metric, start_ns, min(start_ns, end_ns), width_ns
                    )
                fb_out = int(r) - int(r) % width_ns
        else:
            # no in-range data at all -> empty frame, raw-form schema
            return self.counter_rate_timeline(
                metric, start_ns, min(start_ns, end_ns), width_ns
            )
        lo_cut = fb_out + width_ns  # first interior bucket start
        aligned_end = end_ns - end_ns % width_ns
        if lo_cut >= aligned_end:
            # no interior remains — the whole range is edge work
            return self.counter_rate_timeline(
                metric, start_ns, end_ns, width_ns
            )

        from metricq_db_hta_spark.operators.hta import (
            counter_increase,
            counter_increase_stored,
        )

        out_bucket = (
            F.col("ts_ns") - F.col("ts_ns") % F.lit(width_ns)
        ).alias("bucket_start_ns")
        lo = (
            counter_increase(
                self._pruned_metric_raw(metric, start_ns, lo_cut)
            )
            .groupBy("metric", out_bucket)
            .agg(*_counter_rate_aggs(F.col("increase"), width_ns))
        )
        interior = (
            lvl.filter(
                (F.col("bucket_start_ns") >= lo_cut)
                & (F.col("bucket_start_ns") < aligned_end)
            )
            .groupBy(
                "metric",
                (
                    F.col("bucket_start_ns")
                    - F.col("bucket_start_ns") % F.lit(width_ns)
                ).alias("bucket_start_ns"),
            )
            .agg(*_counter_level_aggs(width_ns))
        )
        parts = [lo, interior]
        if aligned_end < end_ns:
            hi = (
                counter_increase_stored(
                    self._pruned_metric_raw(metric, aligned_end, end_ns)
                )
                .groupBy("metric", out_bucket)
                .agg(*_counter_rate_aggs(F.col("increase"), width_ns))
            )
            parts.append(hi)
        res = parts[0]
        for p in parts[1:]:
            res = res.unionByName(p)
        return res.orderBy("bucket_start_ns")

    def _pruned_metric_raw(
        self, metric: str, start_ns: int, end_ns: int
    ) -> DataFrame:
        raw = self.raw.filter(F.col("metric") == metric)
        return _time_pruned(raw, start_ns, end_ns).filter(
            (F.col("ts_ns") >= start_ns) & (F.col("ts_ns") < end_ns)
        )

    # -- A12 ---------------------------------------------------------------
    @staticmethod
    def delta_encode(timeline: DataFrame, ts_col: str = "bucket_start_ns") -> DataFrame:
        """Delta-encode response timestamps: time_delta[i] = t[i] - t[i-1]
        per metric (first row keeps its absolute time, delta vs 0 — matching
        the reference's last_time initialisation, :377-380)."""
        w = Window.partitionBy("metric").orderBy(ts_col)
        return timeline.withColumn(
            "time_delta",
            (F.col(ts_col) - F.coalesce(F.lag(ts_col, 1).over(w), F.lit(0))).cast("long"),
        )


def scope_predicate(ts_col, bound_ns: int, side: str, scope: str):
    """hta::Scope boundary semantics (SURVEY A11): 'open' excludes the
    boundary sample, 'closed' includes it; 'extended' is handled by callers
    by unioning one row beyond the bound (lag/lead or limit-1 outside)."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if side == "start":
        return c > bound_ns if scope == "open" else c >= bound_ns
    return c < bound_ns if scope == "open" else c <= bound_ns


def resample_linear(
    samples: DataFrame,
    metric: str | None,
    start_ns: int,
    end_ns: int,
    step_ns: int,
    metric_col: str = "metric",
    ts_col: str = "ts_ns",
    value_col: str = "value",
) -> DataFrame:
    """Resample a (strictly per-metric-monotonic) sample stream onto a
    regular grid by linear interpolation: for every grid point t in
    [start, end) step ``step_ns``, the value interpolated between the last
    sample at-or-before t and the first sample after it. Grid points
    before the first / after the last sample are NULL (no extrapolation).
    ``metric=None`` resamples every metric in ``samples`` onto the same
    grid; a string resamples that one metric.

    Precondition: unique ``ts_ns`` per metric — exactly what the ingest
    chain's monotonicity filter (A3) guarantees for the committed store,
    which is the data this serves (resampling raw UN-ingested data with
    duplicate timestamps would make the neighbor choice nondeterministic).

    Plan shape — the asof union trick (operators/asof.py), both directions
    at once: union the grid under the samples, then one window ordering
    per metric computes last-non-null (backward frame) and first-non-null
    (forward frame) over the SAME sort — one exchange + one sort for both
    neighbors, where two as-of joins would pay two. Exact grid hits take
    an explicit branch (prev_ts == t -> the sample value, no forward
    neighbor required — a grid point ON the last sample is a hit, not an
    edge NULL); the tie order (sample rows sort before the grid row at
    equal ts) is what makes prev_ts == t detect them, and it also keeps
    the interpolation denominator strictly positive since the forward
    frame then only sees later samples.

    Scale: the window partitions by metric — per-metric sequential within
    a partition, all metrics in parallel, the same contract as every
    ordered per-metric operator here. The grid is spark.range crossed
    with the (broadcast, dimension-sized) metric list — O(metrics x
    range/step) generated rows, nothing read. A single-metric request
    skips even the metric-list scan (one literal row).
    """
    src = samples if metric is None else samples.filter(
        F.col(metric_col) == metric
    )
    src = src.select(metric_col, ts_col, value_col)
    # Only the samples INSIDE [start, end) plus the single nearest
    # neighbor on each side per metric can affect any grid point, so the
    # window below sorts range-sized input instead of the metric's whole
    # history (r13 review: an unpruned 1-hour resample of a 10-year
    # metric window-sorted the full decade in one task). The in-range
    # slice partition-prunes; each neighbor is ONE max_by/min_by
    # aggregation row — a map-side-combined scan, no sort, no window.
    in_range = _time_pruned(src, start_ns, end_ns).filter(
        (F.col(ts_col) >= start_ns) & (F.col(ts_col) < end_ns)
    )
    pair = F.struct(ts_col, value_col)
    # Both neighbors from ONE scan + ONE groupBy: max_by/min_by ignore
    # NULL ordering keys, so a side-gated `when` key makes each pick only
    # from its own slice. One row per metric out of the partial agg —
    # the exchange is dimension-sized regardless of history length.
    out_lo = F.col(ts_col) < start_ns
    out_hi = F.col(ts_col) >= end_ns
    nbrs = (
        src.filter(out_lo | out_hi)
        .groupBy(metric_col)
        .agg(
            F.max_by(pair, F.when(out_lo, F.col(ts_col))).alias("lo"),
            F.min_by(pair, F.when(out_hi, F.col(ts_col))).alias("hi"),
        )
        .select(
            metric_col,
            F.explode(F.array_compact(F.array("lo", "hi"))).alias("r"),
        )
        .select(metric_col, f"r.{ts_col}", f"r.{value_col}")
    )
    pruned = in_range.unionByName(nbrs)
    s = pruned.select(
        metric_col,
        F.col(ts_col).alias("pos"),
        F.col(value_col).alias("v"),
        F.col(ts_col).alias("sts"),
        F.lit(0).alias("is_spine"),
    )
    spark = samples.sparkSession
    if metric is None:
        # every metric in src has at least one row in pruned (any sample
        # falls in exactly one of the three slices, and the neighbor aggs
        # keep one row per metric), so this distinct reads the pruned
        # slice, not full history
        mets = pruned.select(metric_col).distinct()
    else:
        mets = spark.createDataFrame([(metric,)], f"{metric_col} string")
    spine = (
        spark.range(start_ns, end_ns, step_ns)
        .crossJoin(F.broadcast(mets))
        .select(
            metric_col,
            F.col("id").alias("pos"),
            F.lit(None).cast("double").alias("v"),
            F.lit(None).cast("long").alias("sts"),
            F.lit(1).alias("is_spine"),
        )
    )
    merged = spine.unionByName(s)
    back = (
        Window.partitionBy(metric_col)
        .orderBy("pos", "is_spine")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(metric_col)
        .orderBy("pos", "is_spine")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w = merged.select(
        metric_col,
        "pos",
        "is_spine",
        F.last("v", ignorenulls=True).over(back).alias("prev_v"),
        F.last("sts", ignorenulls=True).over(back).alias("prev_ts"),
        F.first("v", ignorenulls=True).over(fwd).alias("next_v"),
        F.first("sts", ignorenulls=True).over(fwd).alias("next_ts"),
    )
    # exact-hit branch first: it must not require a forward neighbor (a
    # grid point landing ON the last sample is a hit, not an edge NULL)
    interp = (
        F.when(F.col("prev_ts") == F.col("pos"), F.col("prev_v"))
        .when(
            F.col("prev_ts").isNull() | F.col("next_ts").isNull(), F.lit(None)
        )
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (F.col("pos") - F.col("prev_ts")).cast("double")
            / (F.col("next_ts") - F.col("prev_ts")).cast("double")
        )
    )
    return (
        w.filter(F.col("is_spine") == 1)
        .select(
            metric_col,
            F.col("pos").alias(ts_col),
            F.round(interp, 6).alias(value_col),
        )
        .orderBy(metric_col, ts_col)
    )
