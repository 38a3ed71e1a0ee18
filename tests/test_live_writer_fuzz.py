"""Durability fuzz class 20 (VERDICT r13 next-step 6): a LIVE writer
racing maintenance.

Fuzz class 19 (test_durability_fuzz.py) interleaves injected CRASH STATES
with maintenance — the writer is always dead when maintenance runs. This
class runs the other axis: an actual concurrent ingest thread appending
batches while compact / retention / erase execute against the same store.
The serialization primitive under test is ``store_meta.mutation_lock``
(r14): every commit-marker / retired-set / removal-intent update is a
read-modify-write over a small JSON file, and without the lock a writer
committing batch N while maintenance de-commits batch M loses one of the
two updates.

Invariants (same as class 19): no loss, no duplication — the raced store's
raw content equals a store built from the same chunks sequentially;
``missing_committed_batches`` empty; no replay-staging leftovers; no
dangling removal intents; fsck green after a rebuild. Maintenance may
legally REFUSE mid-race only with the documented liveness errors; any
other exception fails the schedule.
"""

from __future__ import annotations

import os
import random
import threading
import time

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

W = 3_600_000_000_000  # 1h level width


def _chunks(spark, sf_dir: str, n_chunks: int):
    """The events fixture as n deterministic, event_id-ordered chunks
    (the replayable unit a writer appends per backfill)."""
    from metricq_db_hta_spark.queries.hta_queries import samples

    src = samples(spark, sf_dir)
    rows = src.orderBy("event_id").collect()
    per = max(1, len(rows) // n_chunks)
    return [
        spark.createDataFrame(rows[i * per : (i + 1) * per], schema=src.schema)
        for i in range(n_chunks)
        if rows[i * per : (i + 1) * per]
    ]


def _raw_content(spark, store: str) -> list[tuple]:
    df = spark.read.parquet(store_meta.raw_path(store))
    return sorted(
        (r["metric"], r["ts_ns"], r["value"])
        for r in df.select("metric", "ts_ns", "value").collect()
    )


#: maintenance refusals that are LEGAL while a writer is provably live —
#: anything else raised mid-race is a real bug and fails the schedule
_LEGAL_REFUSALS = ("live ingest replay",)


@pytest.mark.parametrize(
    "sf_dir_name,seed",
    [("sf0.001", 1), ("sf0.001", 2), ("sf0.01", 3)],
)
def test_live_writer_races_maintenance(spark, sf_dir_name, seed, tmp_path):
    sf_dir = os.path.join(os.path.dirname(os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")), sf_dir_name)
    rng = random.Random(seed)
    n_chunks = rng.choice((3, 4))
    chunks = _chunks(spark, sf_dir, n_chunks)

    store = str(tmp_path / "store_race")
    svc = StreamingIngest(spark, store, level_widths_ns=(W,))
    # first chunk lands before the race so maintenance always has
    # committed state to chew on
    svc.backfill(chunks[0])

    errors: list[str] = []
    writer_done = threading.Event()

    def _record(e: BaseException) -> None:
        import traceback

        errors.append("".join(traceback.format_exception(e)))

    def writer() -> None:
        try:
            for ch in chunks[1:]:
                svc.backfill(ch)
                time.sleep(rng.random() * 0.05)
        except BaseException as e:  # noqa: BLE001 — surfaced in the join
            _record(e)
        finally:
            writer_done.set()

    def maintenance() -> None:
        from metricq_db_hta_spark.operators.erase import delete_metric
        from metricq_db_hta_spark.operators.maintenance import compact_raw
        from metricq_db_hta_spark.operators.retention import (
            RetentionPolicy,
            expire,
        )

        ops = [
            lambda: compact_raw(spark, store, min_batches=2),
            # no-op policy: cutoff far in the past — expires nothing but
            # runs the full pre-flight/advertise/delete machinery
            lambda: expire(
                store, RetentionPolicy(raw_max_age_ns=10**18), now_ns=1
            ),
            # ghost-metric surgery: a full erase pass (guards, intent
            # ledger, level scrub) that deletes zero rows
            lambda: delete_metric(store, "zz_ghost", spark=spark),
        ]
        try:
            while True:
                rng.shuffle(ops)
                for op in ops:
                    try:
                        op()
                    except RuntimeError as e:
                        if not any(s in str(e) for s in _LEGAL_REFUSALS):
                            raise
                if writer_done.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — surfaced in the join
            _record(e)

    tw = threading.Thread(target=writer, name="live-writer")
    tm = threading.Thread(target=maintenance, name="maintenance")
    tw.start()
    tm.start()
    tw.join(timeout=600)
    tm.join(timeout=600)
    assert not tw.is_alive() and not tm.is_alive(), "race deadlocked"
    assert not errors, "\n".join(errors)

    # -- invariants -----------------------------------------------------
    # settle converges: the writer's own recovery entry point finds
    # nothing left to repair
    StreamingIngest(spark, store, level_widths_ns=(W,)).recover()
    assert store_meta.missing_committed_batches(store) == set()
    assert store_meta.read_removal_intent(store) == set()
    assert not os.path.isdir(
        store_meta.replay_staging_root(store_meta.raw_path(store))
    )

    # no loss, no duplication: content equals a sequentially-built store
    ref_store = str(tmp_path / "store_ref")
    ref = StreamingIngest(spark, ref_store, level_widths_ns=(W,))
    for ch in chunks:
        ref.backfill(ch)
    assert _raw_content(spark, store) == _raw_content(spark, ref_store)

    # derived state consistent with raw
    from metricq_db_hta_spark.operators import fsck as fsck_mod

    rep = fsck_mod.check_store(spark, store)
    assert rep.ok, [r for r in rep.levels if not r.ok]


def test_mutation_lock_serializes_marker_rmw(tmp_path):
    """The primitive itself: N threads hammering update_commit_marker
    with disjoint adds must lose nothing (pre-lock, the read-modify-write
    interleaving dropped updates). Pure-metadata — no Spark jobs."""
    store = str(tmp_path / "store_lock")
    raw = store_meta.raw_path(store)
    for b in range(32):
        os.makedirs(os.path.join(raw, f"ingest_batch={b}"))

    errs: list[BaseException] = []

    def add(b: int) -> None:
        try:
            store_meta.update_commit_marker(store, add={b})
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=add, args=(b,)) for b in range(32)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert store_meta.committed_batches(store) == set(range(32))

    # re-entrancy: a composite holding the lock can call a locked leaf
    with store_meta.mutation_lock(store):
        store_meta.update_commit_marker(store, add=set(), remove={31})
    assert store_meta.committed_batches(store) == set(range(31))


def test_live_replay_races_maintenance_preflight(spark, sf_dir, tmp_path):
    """The REPLAY half of the live-writer axis: a stage-then-swap replay
    (raw/_replay_staging/<N> write + two renames) runs repeatedly while
    maintenance pre-flights and no-op passes hammer the store. The
    pre-flight's liveness guards must refuse (documented errors only)
    rather than rmtree the live staging or complete the swap under the
    writer; the replay must never crash; afterwards the store reads
    identically and settle converges."""
    from metricq_db_hta_spark.operators.retention import (
        RetentionPolicy,
        expire,
    )
    from metricq_db_hta_spark.queries.hta_queries import samples

    src = samples(spark, sf_dir).orderBy("event_id").limit(300)
    store = str(tmp_path / "store_replayrace")
    svc = StreamingIngest(spark, store, level_widths_ns=(W,))
    svc.backfill(src)
    (batch_id,) = store_meta.committed_batches(store)
    before = _raw_content(spark, store)

    errors: list[str] = []
    replays_done = threading.Event()
    refusals = {"n": 0}

    def _record(e: BaseException) -> None:
        import traceback

        errors.append("".join(traceback.format_exception(e)))

    def replayer() -> None:
        try:
            for _ in range(4):
                # foreachBatch's retry shape: re-process the SAME batch id
                # (isdir -> replay branch -> staging + swap). Built fresh
                # per replay: _process_batch eagerly checkpoints its input
                # BEFORE the swap replaces the underlying files
                kept = spark.read.parquet(svc.raw_path).select(
                    "metric", "ts_ns", "value", "event_id", "delta_ns"
                )
                svc._process_batch(kept, int(batch_id))
        except BaseException as e:  # noqa: BLE001
            _record(e)
        finally:
            replays_done.set()

    def maintenance() -> None:
        try:
            while not replays_done.is_set():
                for op in (
                    lambda: store_meta.require_committed_batches_on_disk(
                        store, "race-preflight"
                    ),
                    lambda: expire(
                        store,
                        RetentionPolicy(raw_max_age_ns=10**18),
                        now_ns=1,
                    ),
                ):
                    try:
                        op()
                    except RuntimeError as e:
                        msg = str(e)
                        if (
                            "live ingest replay" not in msg
                            and "mid-swap" not in msg
                        ):
                            raise
                        refusals["n"] += 1
        except BaseException as e:  # noqa: BLE001
            _record(e)

    tw = threading.Thread(target=replayer, name="replayer")
    tm = threading.Thread(target=maintenance, name="maintenance")
    tw.start()
    tm.start()
    tw.join(timeout=600)
    tm.join(timeout=600)
    assert not tw.is_alive() and not tm.is_alive(), "race deadlocked"
    assert not errors, "\n".join(errors)

    # settle converges; nothing lost or duplicated by the replays
    StreamingIngest(spark, store, level_widths_ns=(W,)).recover()
    assert store_meta.missing_committed_batches(store) == set()
    assert not os.path.isdir(
        store_meta.replay_staging_root(store_meta.raw_path(store))
    )
    assert _raw_content(spark, store) == before


def test_allocator_never_reuses_ids(tmp_path):
    """Property pin for the locked allocator (pure metadata, no Spark):
    ids strictly decrease across any interleaving of allocations,
    on-disk dirs, journal dests, and floor-file crash-loss simulation —
    reuse is the silent-data-loss precondition fuzz class 20 caught."""
    import json as _json

    store = str(tmp_path / "store_alloc")
    seen = []
    for step in range(40):
        bid = store_meta.allocate_negative_batch_id(store)
        assert bid < 0
        assert not seen or bid < seen[-1], (bid, seen)
        seen.append(bid)
        if step % 3 == 0:
            # the id becomes a real dir (normal execution)
            os.makedirs(store_meta.batch_dir(store, bid))
        elif step % 3 == 1:
            # crashed reservation: floor file survives, dir never appears
            pass
        else:
            # a pending journal names a dest below everything else —
            # the allocator must clear it even if the floor file is lost
            store_meta._write_json_atomic(
                store_meta.journal_path(store),
                {"state": "writing", "sources": [], "dest": bid - 1},
            )
            os.remove(store_meta._alloc_path(store))
            nxt = store_meta.allocate_negative_batch_id(store)
            assert nxt <= bid - 2, (nxt, bid)
            seen.append(nxt)
            os.remove(store_meta.journal_path(store))
    # the floor file is the durable word: it equals the last handout
    with open(store_meta._alloc_path(store)) as f:
        assert int(_json.load(f)["floor"]) == seen[-1]
