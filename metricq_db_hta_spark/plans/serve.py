"""Long-lived history serving endpoint (reference read-path parity).

The reference answers history RPCs over the metric bus from a resident
service, with failures propagated to the requester
(/root/reference/src/db.cpp:124-128; handler.failed at
src/async_hta_service.hpp:511-534). The round-1 CLI printed DataFrames and
exited — fine for smoke tests, but a real deployment needs a loop that
owns ONE SparkSession + HistoryService and answers repeated requests, so
the per-query JVM costs (codegen cache, file listings, broadcast
machinery) amortize the way they do in the reference's resident process.

Transport: newline-delimited JSON over TCP (the bus stand-in; the request
router is transport-agnostic). One request per line:

    {"type": "aggregate_timeline" | "flex_timeline" | "aggregate"
             | "aggregate_tiered" | "timeline_tiered" | "last_value"
             | "gapfill_timeline" | "resample" | "histogram_percentile"
             | "stats" | "refresh",
     "metric": str | null, "start_ns": int, "end_ns": int,
     "interval_max_ns": int, "step_ns": int, "p": float, "limit": int}

``histogram_percentile`` serves percentile timelines from the
distributional (histogram) level tables a writer configured with
``hist_widths_ns`` maintains — no raw scan; errors when the store
maintains none. Width selection follows the same coarsest-fitting rule
as Q1 (interval_max_ns over the discovered hist widths).

The two r10 dense request types serve what the reference leaves to
clients: ``gapfill_timeline`` is Q1 over a dense bucket spine (gap rows =
the Aggregate merge identity) and ``resample`` linearly interpolates the
committed raw stream onto a regular ``step_ns`` grid. Both REQUIRE an
explicit [start_ns, end_ns) (a dense timeline from the epoch default is
a limit-truncated wall of empty buckets, never what the caller meant),
and the handler additionally rejects ranges whose spine exceeds
MAX_SPINE_POINTS instead of building them.

Response line: {"rows": [...], "n": int} on success, {"error": "..."} on
failure (the handler.failed contract — a bad request never kills the
service). ``refresh`` re-lists the store so data appended by a concurrent
ingest becomes visible (Parquet DataFrames pin their file listing at
creation).

Store-mutation contract (r12): a resident server's relations AND its
prepared-plan cache pin the store state they were built against. Every
request therefore checks the store epoch — a stat-only composite of the
commit marker, retention floors, retired ledger and the surgery tick
(``store_meta.store_epoch``) — and auto-refreshes when it moved, so
ingest commits, ``retain``, ``compact``, ``delete-metric``/
``rename-metric`` and ``fsck --repair`` level rebuilds become visible without a manual
``refresh``. The explicit ``refresh`` request remains for out-of-band
mutations the epoch cannot see (e.g. hand-editing parquet files).
"""

from __future__ import annotations

import itertools
import json
import os
import socketserver
import threading
from collections import OrderedDict
from urllib.parse import unquote

from pyspark.sql import SparkSession

from metricq_db_hta_spark.functions.timeutil import TS_MAX_NS
from metricq_db_hta_spark.plans.history import (
    HistoryService,
    _date_pruned,
    _time_pruned,
    choose_level,
    resample_linear,
)

#: responses are capped — a timeline over years at ns resolution must not
#: materialize unbounded rows into the service heap
DEFAULT_LIMIT = 100_000

#: dense requests (gapfill/resample) generate one row per grid point; cap
#: the grid a request may ask for (10M points ~ a year at 3 s steps) so a
#: missing/huge range errors instead of scheduling a 2^63-point spine
MAX_SPINE_POINTS = 10_000_000


def _collect_rows(df) -> list[dict]:
    """One request's result rows as dicts, via Arrow self-collection.

    r16 (guide §6 "Arrow for driver transfers"): ``[r.asDict() for r in
    df.collect()]`` pays the pickled-Row path per request; ``toArrow()``
    ships the same rows as one Arrow batch. Measured on the serve bench
    shapes (cached-plan path, 1-15 row results): 58.7→45.0 / 57.2→40.3 /
    37.7→33.9 ms min per request — the job cost is unchanged, the result
    delivery is what shrinks. Value mapping is identical for every type
    the store serves (int64 ns timestamps, doubles, DECIMAL(38,6) sums →
    decimal.Decimal both ways); wire encoding stays _json_default's.
    """
    return df.toArrow().to_pylist()


def _json_default(o):
    """Wire encoding for non-JSON-native Spark row values: the Aggregate
    record's exact-decimal ``sum`` goes out as float (the reference's wire
    carries doubles too), timestamps as ISO strings, binary as hex."""
    import datetime
    import decimal

    if isinstance(o, decimal.Decimal):
        return float(o)
    if isinstance(o, (datetime.datetime, datetime.date)):
        return o.isoformat()
    if isinstance(o, (bytes, bytearray)):
        return o.hex()
    raise TypeError(f"unserializable {type(o).__name__}")


def discover_level_widths(store: str) -> list[int]:
    """Level widths from the store layout (``level_<width>`` dirs) — the
    writer's configuration read back from what it actually built, so a
    reader can never silently disagree with it."""
    from metricq_db_hta_spark.streaming import store_meta

    return sorted(store_meta.width_table_dirs(store, "level"))


def build_history_service(
    spark: SparkSession, store: str, level_widths_ns: list[int] | None = None,
    snapshot: bool = False,
) -> HistoryService:
    """The one owner of the store READ path (HistoryServer + the history
    CLI both build through here): load raw honoring a pending compaction
    journal, and only the level tables that exist.
    ``level_widths_ns=None`` discovers the widths from the store layout
    (:func:`discover_level_widths`) — the safe default for readers: a
    hand-passed list that disagrees with the writer silently drops
    levels. Raises on a store with no level tables at all (nothing to
    route over).

    Reader-side journal honoring: while a compaction journal is pending,
    raw briefly holds a row twice (dest copy + undeleted sources) or a
    partial dest — skip the journal's excluded side (which also covers
    retired deferred-delete sources) so serving never double-counts,
    without mutating the store from a read path.

    ``snapshot=True`` reads raw pinned to the CURRENT manifest version
    instead of listing the root (sources/snapshots.py): one atomic
    decision point, immune to the journal-read/file-listing TOCTOU, and
    stable for the service's lifetime under concurrent deferred-delete
    compaction. Requires a store that has published (any commit does)."""
    from pyspark.sql import functions as F

    from metricq_db_hta_spark.streaming import store_meta

    if level_widths_ns is None:
        level_widths_ns = discover_level_widths(store)
        if not level_widths_ns:
            raise ValueError(
                f"no level_<width> tables under {store} - not an ingest "
                "store (or pass level_widths_ns explicitly)"
            )
    if snapshot:
        from metricq_db_hta_spark.sources.snapshots import read_raw_snapshot

        raw = read_raw_snapshot(spark, store)
    else:
        from metricq_db_hta_spark.sources.rawstore import read_raw

        raw = read_raw(spark, store)
        excluded = store_meta.excluded_batches_for_read(store)
        if excluded:
            raw = raw.filter(
                ~F.col("ingest_batch").isin([int(b) for b in excluded])
            )
    missing = [
        w
        for w in level_widths_ns
        if not os.path.exists(os.path.join(store, f"level_{w}"))
    ]
    if missing:
        # fail loudly at build time (r13 review: the old silent drop
        # could yield an EMPTY width list from an explicit request, and
        # every later request died with IndexError instead)
        raise ValueError(
            f"requested level widths have no tables under {store}: "
            f"{sorted(missing)} (on disk: {discover_level_widths(store)})"
        )
    levels = {
        w: spark.read.parquet(os.path.join(store, f"level_{w}"))
        for w in level_widths_ns
    }
    return HistoryService(raw=raw, levels=levels)


def register_store_views(spark: SparkSession, store: str) -> list[str]:
    """Expose a store's tables as session temp views for ad-hoc Spark SQL
    (CLI ``sql``): ``raw`` (journal-honoring read, same path the history
    service uses), every ``level_<width>`` / ``hist_<width>`` table, and
    ``drops_log`` when present. The typed request API stays the product
    surface; this is the escape hatch for exploration and ops forensics —
    any question the request types don't cover (per-metric bucket counts,
    bin distributions, drop audits) is one SELECT away, with Catalyst's
    partition pruning on (metric, time) intact because the views ARE the
    partitioned tables. Returns the registered view names."""
    svc = build_history_service(spark, store)
    svc.raw.createOrReplaceTempView("raw")
    names = ["raw"]
    for w, df in sorted(svc.levels.items()):
        df.createOrReplaceTempView(f"level_{w}")
        names.append(f"level_{w}")
    from metricq_db_hta_spark.streaming import store_meta

    for prefix in ("hist", "counter"):
        for w, d in sorted(store_meta.width_table_dirs(store, prefix).items()):
            spark.read.parquet(d).createOrReplaceTempView(f"{prefix}_{w}")
            names.append(f"{prefix}_{w}")
    drops = os.path.join(store, "drops_log")
    if os.path.isdir(drops):
        spark.read.parquet(drops).createOrReplaceTempView("drops_log")
        names.append("drops_log")
    return names


class _StoreState:
    """One immutable snapshot of everything a request reads that a
    refresh replaces: the routed relations, the optional level families,
    the retention floors, counter coverage gaps, and the store epoch the
    lot was built against. Installed atomically (one reference
    assignment) by ``_do_refresh`` and read ONCE per request — handler
    threads can never observe a torn mix of pre- and post-refresh state
    (r13 review: new relations + old floors silently truncated tiered
    responses; old counter dict + new width set raised KeyError)."""

    __slots__ = ("svc", "hists", "counters", "floors", "counter_gaps", "epoch")

    def __init__(self, svc, hists, counters, floors, counter_gaps, epoch):
        self.svc = svc
        self.hists = hists
        self.counters = counters
        self.floors = floors
        self.counter_gaps = counter_gaps
        self.epoch = epoch


class HistoryServer:
    #: size of the round-robin FAIR-pool set (pools are never deregistered
    #: by Spark, so the set must be bounded; 8 >= local[32]/4 concurrent
    #: requests keeps fairness without unbounded pool registration)
    _N_POOLS = 8

    def __init__(
        self,
        spark: SparkSession,
        store: str,
        level_widths_ns: list[int] | None = None,
        static_plans: bool = False,
        snapshot: bool = False,
    ) -> None:
        """``static_plans=True`` runs the server's session with AQE off —
        the same execution policy as ``QuerySpec.static_plan`` (queries/
        base.py): every history request is a level-router plan whose shape
        is fully compile-time-determined (pruned scan + filter + agg, no
        join to adapt), and AQE's materialization-sync rounds are a
        measured 35+ ms per request of pure latency against the
        reference's <1 s read expectation. The flag mutates SESSION conf
        for the server's lifetime (concurrent FAIR-pool handler threads
        share it, so a per-request toggle would race) — leave it False
        when embedding in a session that also runs adaptive queries; the
        serving CLI (a dedicated session) turns it on."""
        self.spark = spark
        self.store = store
        # None -> discover from the store layout per build/refresh
        # (build_history_service), so the server follows the writer's
        # actual level set instead of a hand-kept copy of it
        self.widths = (
            None if level_widths_ns is None else list(level_widths_ns)
        )
        self.snapshot = snapshot
        if static_plans:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        # ALL refresh-swapped state lives in ONE immutable snapshot,
        # installed with a single reference assignment (atomic in
        # CPython): handler threads read self._state once per request and
        # can never see a torn mix of pre- and post-refresh relations /
        # floors / counter tables (r13 review: the old five separate
        # attribute swaps let a racing request pair new relations with
        # old floors — silently truncated tiered responses)
        self._state = self._build_state()
        # self-monitoring (reference db_stats parity,
        # /root/reference/src/db_stats.hpp:41-53: per-operation completed/
        # failed counts + durations + data sizes): one record per request
        # type, updated under a lock (FAIR-pool handler threads share it)
        self._stats_lock = threading.Lock()
        self._stats: dict[str, dict[str, float]] = {}
        # prepared-plan cache (r11): a Dataset memoizes its analyzed/
        # optimized/physical plan, so re-collecting the SAME DataFrame
        # object skips Catalyst entirely — measured ~120 ms of the
        # ~150 ms request latency. Keyed on the full canonical request,
        # LRU-bounded, cleared on refresh (the same consistency point at
        # which the underlying relations re-list files). Results are
        # never cached — every hit re-executes the job against the
        # pinned relations, exactly like a prepared statement.
        self._plan_lock = threading.Lock()
        self._plans: "OrderedDict[str, tuple]" = OrderedDict()
        # per-handler-thread flag: did THIS request serve from a cached
        # plan? (thread-local — concurrent FAIR-pool handlers must not
        # smear each other's attribution); _record folds it into the
        # per-type stats as plan_hits
        self._tls = threading.local()
        # generation stamp for the plan cache: bumped by refresh under
        # the lock, so a request that BUILT its plan against pre-refresh
        # relations cannot reinstate it after the refresh cleared the
        # cache (the put is dropped instead — see _plan_put)
        self._plan_gen = 0
        # store-mutation clock: every request compares the store's
        # current epoch (4 stat calls — store_meta.store_epoch) against
        # the one its relations were built at and auto-refreshes on
        # change, so retain/erase/rename/compact/ingest commits become
        # visible without a manual refresh; the lock serializes
        # concurrent handler threads detecting the same change
        self._refresh_lock = threading.Lock()

    def _record(self, rtype: str, dt_s: float, rows: int, error: bool) -> None:
        with self._stats_lock:
            s = self._stats.setdefault(
                rtype,
                {"n": 0, "errors": 0, "rows": 0, "total_s": 0.0,
                 "max_s": 0.0, "plan_hits": 0},
            )
            s["n"] += 1
            s["errors"] += 1 if error else 0
            s["rows"] += rows
            s["total_s"] += dt_s
            s["max_s"] = max(s["max_s"], dt_s)
            if getattr(self._tls, "plan_hit", False):
                s["plan_hits"] += 1

    #: prepared-plan cache bound — plans are driver-side plan trees
    #: (no data), so the bound is about catalog hygiene, not memory
    _PLANS_MAX = 256

    def _plan_get(self, key: str) -> tuple["tuple | None", int]:
        """(cached entry or None, current cache generation). The
        generation is read under the same lock so a miss carries the
        stamp its eventual _plan_put must match."""
        with self._plan_lock:
            hit = self._plans.get(key)
            if hit is not None:
                self._plans.move_to_end(key)
            return hit, self._plan_gen

    def _plan_put(self, key: str, entry: tuple, gen: int) -> None:
        with self._plan_lock:
            if gen != self._plan_gen:
                # a refresh landed while this plan was being built: it is
                # pinned to the pre-refresh file listing — serving it
                # would resurrect stale data until the NEXT refresh
                return
            self._plans[key] = entry
            self._plans.move_to_end(key)
            while len(self._plans) > self._PLANS_MAX:
                self._plans.popitem(last=False)

    def _read_floors(self) -> dict[str, int]:
        """Retention floors advertised by operators/retention.expire —
        cached at build/refresh time like the DataFrames themselves (a
        floor only ever advances, and only via a maintenance pass that a
        ``refresh`` is expected to follow)."""
        from metricq_db_hta_spark.operators.retention import retention_floors

        return retention_floors(self.store)

    def _clamp_floor(
        self, st: "_StoreState", start: int, key: str
    ) -> tuple[int, int | None]:
        """Clamp a request's start to the serving table's retention floor
        so an expired range returns an EXPLICIT ``clamped_start_ns``
        instead of silently missing rows — the serve-side half of the
        retention contract (operators/retention.py floor semantics).
        Returns (possibly-raised start, floor-if-clamped)."""
        floor = st.floors.get(key, 0)
        if floor > start:
            return floor, floor
        return start, None

    def _discover_tables(self, prefix: str) -> dict[int, "object"]:
        """Optional level families the write path maintains (``hist_<w>``
        when StreamingIngest runs with ``hist_widths_ns``, ``counter_<w>``
        with ``counter_widths_ns``) — discovered from the store layout,
        never configured twice. Empty dict when the store maintains
        none."""
        from metricq_db_hta_spark.streaming import store_meta

        return {
            w: self.spark.read.parquet(d)
            for w, d in sorted(
                store_meta.width_table_dirs(self.store, prefix).items()
            )
        }

    def _build(self) -> HistoryService:
        return build_history_service(
            self.spark, self.store, self.widths, snapshot=self.snapshot
        )

    def _build_state(self) -> "_StoreState":
        """One complete, immutable view of the store: relations, optional
        level families, retention floors, counter coverage — stamped with
        the epoch captured BEFORE the relations are built, so a mutation
        landing mid-build triggers an auto-refresh on the next request
        instead of being missed."""
        from metricq_db_hta_spark.streaming import store_meta as _sm

        epoch = _sm.store_epoch(self.store)
        counters = self._discover_tables("counter")
        return _StoreState(
            svc=self._build(),
            hists=self._discover_tables("hist"),
            counters=counters,
            floors=self._read_floors(),
            counter_gaps=self._counter_coverage(counters),
            epoch=epoch,
        )

    def _do_refresh(self) -> None:
        """Re-list the store and drop every prepared plan — the single
        consistency point at which appended batches, retention floors,
        surgery and level rebuilds become visible. Caller holds
        ``_refresh_lock``. The new state is installed in ONE assignment;
        in-flight requests finish against the snapshot they started with
        (their prepared plans pinned the old file listing — consistent,
        just pre-mutation, exactly like a request that completed a moment
        earlier). INSTALL ORDER CONTRACT: the state assignment must
        precede the generation bump — _handle_inner captures the
        generation before reading the state and relies on this order to
        never pair a pre-refresh state with a post-refresh generation."""
        self._state = self._build_state()
        with self._plan_lock:
            self._plans.clear()
            self._plan_gen += 1

    def _maybe_auto_refresh(self) -> None:
        """The store-mutation/refresh contract, automated: if the store's
        epoch moved since this server's relations were built (ingest
        commit, retention pass, compaction retire, erase/rename/rebuild
        tick), refresh before serving — a prepared plan pins its parquet
        file listing, so serving across a mutation would return stale or
        vanished files. Cost on the hot path: four stat calls."""
        from metricq_db_hta_spark.streaming import store_meta as _sm

        if _sm.store_epoch(self.store) == self._state.epoch:
            return
        with self._refresh_lock:
            if _sm.store_epoch(self.store) != self._state.epoch:
                self._do_refresh()

    def _counter_coverage(
        self, counters: dict[int, "object"]
    ) -> dict[int, dict[str, list[tuple[int, int]]]]:
        """Per-width, per-metric month spans that raw holds but the
        counter level table does not (counter levels enabled on a store
        with pre-existing history — healed by ``fsck --repair``).
        Computed from the directory layout at build/refresh time (one
        raw walk shared across widths, no data scan); empty on a healthy
        store, so the per-request guard below is a dict lookup."""
        if not counters:
            return {}
        from metricq_db_hta_spark.streaming import store_meta

        raw_months = store_meta.raw_months_by_metric(self.store)
        return {
            w: store_meta.counter_coverage_gaps(
                self.store, w, raw_months=raw_months
            )
            for w in counters
        }

    def _coverage_spans(
        self,
        st: "_StoreState",
        w: int,
        metric: str | None,
        pattern: str | None,
        start: int,
        end: int,
    ) -> list[tuple[int, int]]:
        """Counter-coverage gap spans intersecting [start, end) for one
        metric (or the union over a fleet glob) at level width ``w``."""
        gaps = st.counter_gaps.get(w) or {}
        if not gaps:
            return []
        if pattern is not None:
            from metricq_db_hta_spark.plans.history import glob_match

            spans = [
                s
                for m, sp in gaps.items()
                if glob_match(m, str(pattern))
                for s in sp
            ]
        else:
            spans = list(gaps.get(metric, ()))
        return [(lo, hi) for lo, hi in spans if lo < end and hi > start]

    @staticmethod
    def _spine_guard(start: int, end: int, step: int) -> dict | None:
        """Reject dense requests whose grid would be astronomically large
        (notably the open-ended default end_ns) instead of building it."""
        points = max(0, end - start) // step
        if points > MAX_SPINE_POINTS:
            return {
                "error": "dense request spine too large: "
                f"{points} points > {MAX_SPINE_POINTS} — pass an explicit "
                "finite [start_ns, end_ns) sized to the step/width"
            }
        return None

    # -- request router (src/async_hta_service.hpp:359 switch parity) ------
    def handle(self, req: dict) -> dict:
        """Route one request, recording per-type self-monitoring stats
        (count / errors / rows / total and max seconds — the serve-side
        analogue of the reference's db_stats read tracking). ``stats``
        returns the counters themselves and is not counted."""
        import time as _time

        rtype = str(req.get("type", "?"))
        if rtype == "stats":
            with self._stats_lock:
                snap = {k: dict(v) for k, v in sorted(self._stats.items())}
            rows = [{"type": k, **v} for k, v in snap.items()]
            return {"rows": rows, "n": len(rows)}
        t0 = _time.perf_counter()
        resp = self._handle_inner(req)
        self._record(
            rtype,
            _time.perf_counter() - t0,
            int(resp.get("n", 0)),
            "error" in resp,
        )
        return resp

    def _handle_inner(self, req: dict) -> dict:
        self._tls.plan_hit = False  # reset per request (thread reuse)
        try:
            rtype = req["type"]
            if rtype == "refresh":
                with self._refresh_lock:
                    self._do_refresh()
                return {"rows": [], "n": 0}
            self._maybe_auto_refresh()
            # prepared-plan fast path: an identical request re-executes
            # its cached (already-planned) DataFrame — no Catalyst, no
            # plan rebuild; Spark additionally reuses the plan's cached
            # shuffle map outputs across actions, which is CORRECT here
            # precisely because the cache is store-epoch-guarded (any
            # mutation drops the plans) — a serving win the bench
            # deliberately does NOT take (bench._reexecute builds a fresh
            # QueryExecution per run so measurements cover the full
            # pipeline). Only requests that reached the common
            # collect tail are ever stored, so early-return types
            # (list_metrics, errors) never hit here.
            cache_key = json.dumps(req, sort_keys=True, default=str)
            hit, plan_gen = self._plan_get(cache_key)
            # ONE consistent snapshot for the whole request: a concurrent
            # refresh installs a new state object but never mutates this
            # one (r13 torn-read fix). ORDER MATTERS: the generation is
            # captured BEFORE the state read, and _do_refresh installs
            # the new state BEFORE bumping the generation — so a refresh
            # landing between these two reads pairs the OLD generation
            # with the NEW state, and _plan_put drops the entry. The
            # reverse order could pair a pre-refresh state with the
            # post-refresh generation and pin a stale file listing into
            # the fresh cache (r14 review fix).
            st = self._state
            self._tls.plan_hit = hit is not None
            if hit is not None:
                df_lim, clamped, uncovered = hit
                rows = _collect_rows(df_lim)
                resp = {"rows": rows, "n": len(rows)}
                if clamped is not None:
                    resp["clamped_start_ns"] = clamped
                if uncovered is not None:
                    resp["uncovered"] = uncovered
                return resp
            metric = req.get("metric")
            start = int(req.get("start_ns", 0))
            end = int(req.get("end_ns", TS_MAX_NS))
            imax = int(req.get("interval_max_ns", TS_MAX_NS))
            limit = int(req.get("limit", DEFAULT_LIMIT))
            clamped = None
            uncovered = None
            if rtype == "aggregate_timeline":
                # optional "pattern" glob: PER-METRIC rows for every
                # matching metric (the multi-line chart); the merged
                # fleet form is aggregate_timeline_pattern
                w = choose_level(st.svc.widths, imax) or st.svc.widths[0]
                start, clamped = self._clamp_floor(st, start, f"level_{w}")
                df = st.svc.aggregate_timeline(
                    metric, start, end, imax, pattern=req.get("pattern")
                )
            elif rtype == "flex_timeline":
                w = choose_level(st.svc.widths, imax)
                start, clamped = self._clamp_floor(st, 
                    start, "raw" if w is None else f"level_{w}"
                )
                df = st.svc.flex_timeline(metric, start, end, imax)
            elif rtype == "aggregate":
                # Q3 may decompose across every level; the FINEST level's
                # floor is the highest under the tiering invariant, so
                # clamping there keeps the merged aggregate exact over
                # the reported range (a degraded-resolution answer from
                # coarse-only buckets below it would be a different,
                # wider-bucket quantity — explicit clamp over silent mix)
                start, clamped = self._clamp_floor(st, 
                    start, f"level_{st.svc.widths[0]}"
                )
                df = st.svc.aggregate(metric, start, end)
            elif rtype == "aggregate_tiered":
                # retention-aware Q3: serve expired-raw history from the
                # coarse levels that retain it (exact values, degraded
                # resolution) and report the unservable slivers in
                # ``uncovered`` — the tiered-store alternative to the
                # plain ``aggregate`` clamp above
                floors = {
                    w: st.floors.get(f"level_{w}", 0)
                    for w in st.svc.widths
                }
                df, gaps = st.svc.aggregate_tiered(
                    metric, start, end, floors
                )
                uncovered = [[lo, hi] for lo, hi in gaps]
            elif rtype == "timeline_tiered":
                # retention-aware Q1: mixed-resolution timeline — each
                # era at the finest retained width satisfying the
                # requested resolution; rows carry width_ns, unservable
                # slivers reported in ``uncovered``
                floors = {
                    w: st.floors.get(f"level_{w}", 0)
                    for w in st.svc.widths
                }
                df, gaps = st.svc.timeline_tiered(
                    metric, start, end, imax, floors
                )
                uncovered = [[lo, hi] for lo, hi in gaps]
            elif rtype == "aggregate_timeline_pattern":
                # fleet Q1: one merged Aggregate timeline across every
                # metric matching a shell glob (history.py::
                # aggregate_timeline_pattern) — the level choice and
                # retention-floor clamp are exactly aggregate_timeline's
                pat = req.get("pattern")
                if not pat:
                    return {
                        "error": "aggregate_timeline_pattern requires "
                        "a pattern"
                    }
                w = choose_level(st.svc.widths, imax) or st.svc.widths[0]
                start, clamped = self._clamp_floor(st, start, f"level_{w}")
                df = st.svc.aggregate_timeline_pattern(
                    str(pat), start, end, imax
                )
            elif rtype == "aggregate_pattern":
                # fleet Q3: ONE merged row over the whole range across the
                # glob's metrics; clamped at the finest level's floor for
                # the same exactness reason as plain `aggregate`
                pat = req.get("pattern")
                if not pat:
                    return {"error": "aggregate_pattern requires a pattern"}
                start, clamped = self._clamp_floor(st, 
                    start, f"level_{st.svc.widths[0]}"
                )
                df = st.svc.aggregate_pattern(str(pat), start, end)
            elif rtype == "last_value":
                # optional fleet glob: {"type": "last_value",
                # "pattern": "host.*.power"} — one request, M rows
                df = st.svc.last_value(
                    metric, pattern=req.get("pattern")
                )
            elif rtype == "list_metrics":
                # store discovery: the metric names the store actually
                # holds, read from the finest level table's partition
                # layout — a directory listing, no data scan at any
                # store size. (The reference's manager knows metrics
                # from config, A19; a store browser wants them FROM the
                # store.) Optional "pattern" glob filters the listing —
                # the same */? dialect every pattern request uses
                # (history.glob_match == LIKE on glob_to_like, property-
                # tested; fnmatch would diverge on [seq] classes).
                from metricq_db_hta_spark.plans.history import glob_match

                w = st.svc.widths[0]
                troot = os.path.join(self.store, f"level_{w}")
                names = sorted(
                    unquote(n.split("=", 1)[1])
                    for n in (
                        os.listdir(troot) if os.path.isdir(troot) else []
                    )
                    if n.startswith("metric=")
                )
                pat = req.get("pattern")
                if pat:
                    names = [n for n in names if glob_match(n, str(pat))]
                rows = [{"metric": n} for n in names[:limit]]
                return {"rows": rows, "n": len(rows)}
            elif rtype == "gapfill_timeline":
                pat = req.get("pattern")
                if (metric is None) == (pat is None):
                    return {
                        "error": "gapfill_timeline requires exactly one "
                        "of metric / pattern"
                    }
                if "start_ns" not in req or "end_ns" not in req:
                    # a dense timeline from the epoch default is a
                    # limit-truncated wall of empty buckets, never what
                    # the caller meant — demand the range
                    return {
                        "error": "gapfill_timeline requires explicit "
                        "start_ns and end_ns"
                    }
                width = choose_level(st.svc.widths, imax) or (
                    st.svc.widths[0]
                )
                start, clamped = self._clamp_floor(st, start, f"level_{width}")
                err = self._spine_guard(start, end, width)
                if err:
                    return err
                if pat is not None:
                    # dense MERGED fleet timeline: gap rows carry the
                    # merge identity + n_metrics=0
                    df = st.svc.aggregate_timeline_pattern_gapfill(
                        str(pat), start, end, imax
                    )
                else:
                    df = st.svc.aggregate_timeline_gapfill(
                        metric, start, end, imax
                    )
            elif rtype == "resample":
                if metric is None:
                    return {"error": "resample requires a metric"}
                if "start_ns" not in req or "end_ns" not in req:
                    return {
                        "error": "resample requires explicit start_ns "
                        "and end_ns"
                    }
                step = int(req.get("step_ns", 0))
                if step <= 0:
                    return {"error": "resample requires step_ns > 0"}
                start, clamped = self._clamp_floor(st, start, "raw")
                err = self._spine_guard(start, end, step)
                if err:
                    return err
                df = resample_linear(st.svc.raw, metric, start, end, step)
            elif rtype == "counter_rate":
                # monotonic-counter rate timeline from raw (the
                # range-pruned serving form of the hta_counter_rate
                # operator): per width-bucket increase sum, reset count
                # and per-second rate. The first in-range sample is the
                # baseline (contributes no increase) — the standard
                # range-query semantics for counters, deliberately NOT
                # reaching before `start` for a prior sample.
                pat = req.get("pattern")
                if (metric is None) == (pat is None):
                    return {
                        "error": "counter_rate requires exactly one of "
                        "metric / pattern"
                    }
                width = int(req.get("width_ns", st.svc.widths[0]))
                if width <= 0:
                    return {"error": f"width_ns must be > 0: {width}"}
                attribution = str(req.get("attribution", "range"))
                if attribution not in ("range", "stored"):
                    return {
                        "error": "attribution must be 'range' (first "
                        "in-range sample is the baseline) or 'stored' "
                        "(full-history increases from the persisted "
                        f"prev_value chain): {attribution!r}"
                    }
                # maintained counter widths dividing the request, widest
                # first — the ONE width-selection rule for both
                # attributions (computed once; the leveled fast path
                # below additionally filters it by coverage)
                cw = [
                    w
                    for w in sorted(st.counters, reverse=True)
                    if width % w == 0
                ]
                if attribution == "stored":
                    # full-history-exact increases served from the
                    # counter level tables; bucket-aligned history stays
                    # servable past the RAW retention floor (the counter
                    # analogue of timeline_tiered), so the clamp is the
                    # COUNTER table's floor and raw's floor only gates
                    # the sub-bucket edge slivers (reported as gaps).
                    # Works for both the single-metric and fleet (glob)
                    # forms — the level sums merge across metrics too.
                    if not cw:
                        return {
                            "error": "attribution=stored needs a "
                            "maintained counter_<w> level whose width "
                            "divides width_ns (run the writer with "
                            "counter_widths_ns)"
                        }
                    start, clamped = self._clamp_floor(st, 
                        start, f"counter_{cw[0]}"
                    )
                    df, gaps = st.svc.counter_rate_timeline_stored(
                        st.counters[cw[0]], cw[0], metric, start, end,
                        width, raw_floor_ns=st.floors.get("raw", 0),
                        pattern=None if pat is None else str(pat),
                        coverage_gaps=self._coverage_spans(st, 
                            cw[0], metric, pat, start, end
                        ),
                    )
                    # always a list (possibly []) — one presence check
                    # works across every tiered-style response type
                    uncovered = [[lo, hi] for lo, hi in gaps]
                    df_done = True
                elif pat is not None:
                    # fleet form: per-metric increases summed across the
                    # glob (additive, like histogram bins) — from raw
                    start, clamped = self._clamp_floor(st, start, "raw")
                    df = st.svc.counter_rate_timeline_pattern(
                        str(pat), start, end, width
                    )
                    df_done = True
                else:
                    start, clamped = self._clamp_floor(st, start, "raw")
                    df_done = False
                # serve from the maintained counter_<w> family when one
                # divides the requested width: interior buckets come from
                # stored level rows, only the range edges touch raw — the
                # request cost stops growing with range length. Falls
                # back to the range-pruned raw scan otherwise (and for
                # ranges too short to have an interior, inside the
                # leveled method itself). Coverage guard: a width whose
                # counter table MISSES months raw holds in-range (levels
                # enabled on a store with pre-existing history) is
                # skipped — the raw fallback stays correct, and
                # ``fsck --repair`` restores the fast path.
                if not df_done:
                    cw_cov = [
                        w
                        for w in cw
                        if not self._coverage_spans(st, 
                            w, metric, None, start, end
                        )
                    ]
                    if cw_cov:
                        df = st.svc.counter_rate_timeline_leveled(
                            st.counters[cw_cov[0]], cw_cov[0], metric,
                            start, end, width,
                        )
                    else:
                        df = st.svc.counter_rate_timeline(
                            metric, start, end, width
                        )
            elif rtype == "histogram_percentile":
                if not st.hists:
                    return {
                        "error": "store maintains no histogram levels "
                        "(run the writer with hist_widths_ns)"
                    }
                p = float(req.get("p", 0.95))
                if not 0.0 < p < 1.0:
                    return {"error": f"p must be in (0, 1): {p}"}
                from metricq_db_hta_spark.operators.hta import (
                    histogram_percentile,
                )

                pat = req.get("pattern")
                if metric is not None and pat is not None:
                    return {
                        "error": "pass at most one of metric / pattern"
                    }
                widths = sorted(st.hists)
                width = choose_level(widths, imax) or widths[0]
                start, clamped = self._clamp_floor(st, start, f"hist_{width}")
                h = st.hists[width]
                if metric is not None:
                    h = h.filter(h["metric"] == metric)
                # directory-partition pruning on the store's bucket_month
                # layout, same as the Aggregate level reads
                h = _date_pruned(h, "bucket_month", start, end)
                h = h.filter(
                    (h["bucket_start_ns"] >= start)
                    & (h["bucket_start_ns"] < end)
                )
                if pat is not None:
                    # fleet percentile: bin counts are mergeable across
                    # metrics (they just add — the same property the
                    # rollup cascade uses on the time axis), so the
                    # merged histogram IS the exact histogram of the
                    # union metric; the percentile walk then runs on it
                    # unchanged, labeled with the glob
                    from pyspark.sql import functions as F

                    from metricq_db_hta_spark.plans.history import (
                        glob_to_like,
                    )

                    h = (
                        h.filter(h["metric"].like(glob_to_like(str(pat))))
                        .groupBy("bucket_start_ns", "bin")
                        .agg(F.sum("n").cast("long").alias("n"))
                        .withColumn("metric", F.lit(str(pat)))
                    )
                df = histogram_percentile(h, p).orderBy(
                    "metric", "bucket_start_ns"
                )
            else:
                return {"error": f"unknown request type {rtype!r}"}
            df_lim = df.limit(limit)
            rows = _collect_rows(df_lim)
            # store only after a successful execution so a plan that
            # fails at runtime is rebuilt (and re-validated) next time
            self._plan_put(cache_key, (df_lim, clamped, uncovered), plan_gen)
            resp = {"rows": rows, "n": len(rows)}
            if clamped is not None:
                # the requested range dipped below the serving table's
                # retention floor: rows start at the floor, and the
                # response says so instead of looking mysteriously short
                resp["clamped_start_ns"] = clamped
            if uncovered is not None:
                resp["uncovered"] = uncovered
            return resp
        except Exception as e:  # noqa: BLE001 — handler.failed parity
            # first line only: Spark appends a multi-line DataFrame/JVM
            # context blob after the actual message, and an RPC error is
            # a one-line protocol field, not a log file
            first = (str(e).splitlines() or [type(e).__name__])[0]
            return {"error": f"{type(e).__name__}: {first}"}

    # -- TCP loop ----------------------------------------------------------
    def start_background(self, host: str = "127.0.0.1", port: int = 0):
        """Start the serving loop on a daemon thread; returns
        (server, bound_port). ``server.shutdown()`` stops it."""
        handle = self.handle

        spark = self.spark

        # Pools come from a BOUNDED round-robin set, not thread idents:
        # FAIR-scheduler pools are registered on first use and never
        # removed, so ident-named pools accumulate without bound on a
        # long-lived server, and OS ident reuse would silently co-schedule
        # unrelated sequential connections (round-8 ADVICE). A fixed set of
        # _N_POOLS gives the same fairness property (concurrent requests
        # land in distinct pools up to the pool count) with O(1) registry.
        pool_seq = itertools.count()

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self) -> None:  # one connection, many requests
                # each connection gets a pool from the bounded set: under
                # FAIR mode (SPARK_GRAFT_SCHEDULER=FAIR) concurrent
                # requests share executor slots fairly instead of queueing
                # behind the largest scan; a harmless no-op under FIFO
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool",
                    f"req-{next(pool_seq) % HistoryServer._N_POOLS}",
                )
                try:
                    for line in self.rfile:
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            req = json.loads(line)
                            resp = handle(req)
                        except Exception as e:  # noqa: BLE001
                            resp = {"error": f"{type(e).__name__}: {e}"}
                        self.wfile.write(
                            (json.dumps(resp, default=_json_default) + "\n").encode()
                        )
                        self.wfile.flush()
                finally:
                    # local properties are inherited by any job the pooled
                    # handler thread later runs — clear on close so a
                    # recycled thread doesn't carry a stale pool
                    spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        server = _Server((host, port), _Handler)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, server.server_address[1]
