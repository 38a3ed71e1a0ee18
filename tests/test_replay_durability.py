"""Torn-replay durability (ADVICE r12 medium).

A replayed microbatch replaces its own committed batch subtree. The r12
implementation rmtree'd the committed subtree BEFORE the replacement write
job ran; a failure in that window left batch N's rows absent from raw while
the commit marker still claimed them committed — maintenance run then would
bake the loss into level tables. The fix is stage-then-swap
(``store_meta.replay_stage_path`` / ``swap_replayed_subtree``): the
committed subtree is touched only after the replacement is durable, every
crash point is settled by ``settle_replay_staging``, and maintenance
refuses to run while a marker-committed batch is missing from raw
(``require_committed_batches_on_disk``).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from conftest import backdate_removal_intent

from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

W = 3_600_000_000_000  # 1h level
BASE = 1_760_000_000_000_000_000


@pytest.fixture()
def store_one_batch(spark, tmp_path):
    """A store with exactly one committed streaming batch (id 0)."""
    rows = [
        ("m1", BASE + i * 1_000_000_000, float(i), i) for i in range(1, 21)
    ] + [("m2", BASE + i * 1_000_000_000, float(i) * 2, 100 + i) for i in range(1, 11)]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    spark.createDataFrame(
        rows, ["metric", "ts_ns", "value", "event_id"]
    ).coalesce(1).write.parquet(str(input_dir / "c1"))
    store = str(tmp_path / "store")
    svc = StreamingIngest(spark, store, level_widths_ns=(W,))
    svc.run_until_drained(str(input_dir))
    (batch_id,) = store_meta.committed_batches(store)
    return svc, store, batch_id


def _replay_kept(spark, svc):
    """The stateful filter's (deterministic) output for a replay of the
    whole store — what foreachBatch would hand ``_process_batch`` again."""
    kept = spark.read.parquet(svc.raw_path).select(
        "metric", "ts_ns", "value", "event_id", "delta_ns"
    )
    return kept


def test_failed_replay_write_leaves_committed_subtree_intact(
    spark, store_one_batch, monkeypatch
):
    """Crash-before-swap: if the replay's staging write succeeds but the
    process dies before the swap, the committed subtree and every row in
    it are still on disk — the old code had already rmtree'd it."""
    svc, store, batch_id = store_one_batch
    final = store_meta.batch_dir(store, batch_id)
    rows_before = sorted(
        spark.read.parquet(svc.raw_path).select("metric", "ts_ns", "value").collect()
    )

    def boom(parent, bid):
        raise RuntimeError("simulated crash before swap")

    monkeypatch.setattr(store_meta, "swap_replayed_subtree", boom)
    # also patch the name imported inside ingest_stream (module attribute)
    import metricq_db_hta_spark.streaming.ingest_stream as ist

    monkeypatch.setattr(ist.store_meta, "swap_replayed_subtree", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        svc._process_batch(_replay_kept(spark, svc), batch_id)

    assert os.path.isdir(final), "committed subtree deleted before swap"
    assert batch_id in store_meta.committed_batches(store)
    assert store_meta.missing_committed_batches(store) == set()
    rows_after = sorted(
        spark.read.parquet(svc.raw_path).select("metric", "ts_ns", "value").collect()
    )
    assert rows_after == rows_before

    monkeypatch.undo()
    # the retry (the engine replays the batch) completes normally
    svc._process_batch(_replay_kept(spark, svc), batch_id)
    rows_retry = sorted(
        spark.read.parquet(svc.raw_path).select("metric", "ts_ns", "value").collect()
    )
    assert rows_retry == rows_before
    assert not os.path.isdir(store_meta.replay_staging_root(svc.raw_path))


def test_settle_completes_crash_between_renames(spark, store_one_batch):
    """Crash between the two swap renames: final is aside, staging holds a
    job-committed replacement. settle must finish the swap — the store
    reads identically afterwards."""
    svc, store, batch_id = store_one_batch
    final = store_meta.batch_dir(store, batch_id)
    rows_before = sorted(
        spark.read.parquet(svc.raw_path).select("metric", "ts_ns", "value").collect()
    )
    staging = store_meta.replay_stage_path(svc.raw_path, batch_id)
    os.makedirs(os.path.dirname(staging), exist_ok=True)
    shutil.copytree(final, staging)  # a complete replacement (_SUCCESS-less
    # parquet dirs: streaming writes carry _SUCCESS; emulate it)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    os.rename(final, staging + ".old")
    assert store_meta.missing_committed_batches(store) == {batch_id}

    actions = store_meta.settle_replay_staging(store)
    assert any("completed replay swap" in a for a in actions)
    assert os.path.isdir(final)
    assert store_meta.missing_committed_batches(store) == set()
    rows_after = sorted(
        spark.read.parquet(svc.raw_path).select("metric", "ts_ns", "value").collect()
    )
    assert rows_after == rows_before
    assert not os.path.isdir(store_meta.replay_staging_root(svc.raw_path))


def test_settle_drops_stale_staging_and_aside(spark, store_one_batch):
    """Crash before the swap started (staging partial, final intact) and
    after the swap finished (aside left behind): settle removes the
    garbage and touches nothing else."""
    svc, store, batch_id = store_one_batch
    final = store_meta.batch_dir(store, batch_id)
    staging = store_meta.replay_stage_path(svc.raw_path, batch_id)
    os.makedirs(staging)  # partial: no _SUCCESS
    open(os.path.join(staging, "part-0.parquet"), "w").close()
    aside = staging + ".old"
    os.makedirs(aside)

    store_meta.settle_replay_staging(store)
    assert os.path.isdir(final)
    assert not os.path.exists(staging)
    assert not os.path.exists(aside)
    assert store_meta.missing_committed_batches(store) == set()


def test_maintenance_refuses_on_missing_committed_batch(spark, store_one_batch):
    """A marker-committed batch missing from raw with nothing to settle is
    unrecoverable loss evidence: compaction/retention/rebuild/erase must
    refuse instead of baking it into derived state."""
    from metricq_db_hta_spark.operators.maintenance import compact_raw
    from metricq_db_hta_spark.operators.retention import RetentionPolicy, expire

    svc, store, batch_id = store_one_batch
    shutil.rmtree(store_meta.batch_dir(store, batch_id))
    assert store_meta.missing_committed_batches(store) == {batch_id}

    with pytest.raises(RuntimeError, match="missing from raw"):
        compact_raw(spark, store)
    with pytest.raises(RuntimeError, match="missing from raw"):
        expire(
            store, RetentionPolicy(raw_max_age_ns=1), now_ns=BASE + 10**15
        )


def test_recover_settles_torn_swap_first(spark, store_one_batch):
    """recover() on a store whose writer died mid-swap restores the batch
    before looking for torn level state (the entry-point settle)."""
    svc, store, batch_id = store_one_batch
    final = store_meta.batch_dir(store, batch_id)
    staging = store_meta.replay_stage_path(svc.raw_path, batch_id)
    os.makedirs(os.path.dirname(staging), exist_ok=True)
    shutil.copytree(final, staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    os.rename(final, staging + ".old")

    svc2 = StreamingIngest(spark, store, level_widths_ns=(W,))
    svc2.recover()
    assert os.path.isdir(final)
    assert store_meta.missing_committed_batches(store) == set()


def test_interrupted_deliberate_removal_does_not_wedge_maintenance(
    spark, store_one_batch, tmp_path
):
    """r13 review #1: retention/erase delete an emptied batch DIR and then
    de-commit it; a crash between the two used to read as torn-replay loss
    and wedge every maintenance op forever (no journal heals it). With the
    removal-intent ledger, the interrupted removal settles automatically:
    the de-commit completes and maintenance proceeds."""
    from metricq_db_hta_spark.operators.maintenance import compact_raw

    svc, store, batch_id = store_one_batch
    # simulate the crash window: intent recorded, dir deleted, marker
    # UPDATE never ran (exactly what expire()/erase do before de-commit)
    store_meta.record_removal_intent(store, {batch_id})
    shutil.rmtree(store_meta.batch_dir(store, batch_id))
    backdate_removal_intent(store)
    assert store_meta.missing_committed_batches(store) == {batch_id}

    # the guard settles instead of wedging: de-commit completes...
    store_meta.require_committed_batches_on_disk(store, "test")
    assert batch_id not in store_meta.committed_batches(store)
    assert store_meta.read_removal_intent(store) == set()
    # ...and maintenance runs (nothing to compact on an empty store = None)
    assert compact_raw(spark, store) is None

    # counter-case: intent recorded but the dir SURVIVED (crash before the
    # delete) — the intent is dropped, the batch stays committed
    svc2_store = str(tmp_path / "store_intact")
    rows = [("m1", BASE + i * 1_000_000_000, float(i), i) for i in range(1, 6)]
    input_dir = tmp_path / "in2"
    input_dir.mkdir()
    spark.createDataFrame(
        rows, ["metric", "ts_ns", "value", "event_id"]
    ).coalesce(1).write.parquet(str(input_dir / "c1"))
    svc2 = StreamingIngest(spark, svc2_store, level_widths_ns=(W,))
    svc2.run_until_drained(str(input_dir))
    (bid2,) = store_meta.committed_batches(svc2_store)
    store_meta.record_removal_intent(svc2_store, {bid2})
    backdate_removal_intent(svc2_store)  # dead-op model; fresh = live op
    store_meta.require_committed_batches_on_disk(svc2_store, "test")
    assert bid2 in store_meta.committed_batches(svc2_store)
    assert store_meta.read_removal_intent(svc2_store) == set()


def test_maintenance_preflight_refuses_live_replay_staging(
    spark, store_one_batch
):
    """r14 review: the maintenance pre-flight settle must NOT rmtree a
    FRESH _SUCCESS-less staging — that write may belong to a live ingest
    replay running concurrently, and deleting it mid-write crashes the
    stream batch. It refuses instead (mirroring recover_compaction's
    journal liveness guard); once the staging ages past the window (the
    writer is provably dead) the same pre-flight drops it. The stream's
    own recover() path keeps the unconditional settle — it is the single
    writer, so no live peer can exist there."""
    import time

    svc, store, batch_id = store_one_batch
    staging = store_meta.replay_stage_path(svc.raw_path, batch_id)
    os.makedirs(staging)
    open(os.path.join(staging, "part-0.parquet"), "w").close()  # no _SUCCESS

    with pytest.raises(RuntimeError, match="live ingest replay"):
        store_meta.require_committed_batches_on_disk(store, "test")
    assert os.path.isdir(staging), "refusal must leave the staging intact"

    # owner path (refuse_live default False): drops it even when fresh
    staging2 = store_meta.replay_stage_path(svc.raw_path, batch_id + 1)
    os.makedirs(staging2)
    store_meta.settle_replay_staging(store)
    assert not os.path.exists(staging2)
    assert not os.path.exists(staging)

    # dead staging: recreate, age past the window — pre-flight now settles
    from conftest import backdate_tree

    os.makedirs(staging)
    open(os.path.join(staging, "part-0.parquet"), "w").close()
    backdate_tree(staging)
    store_meta.require_committed_batches_on_disk(store, "test")
    assert not os.path.exists(staging)


# -- r15: marker-flock exact liveness (ADVICE r14 medium + low #3) ----------


def test_writer_flock_probe_states(spark, store_one_batch):
    """probe_replay_writer_live distinguishes the three states exactly:
    flock held = live, marker-without-flock = provably dead crash
    leftover, no marker = no writer."""
    svc, store, _ = store_one_batch
    parent = svc.raw_path
    assert store_meta.probe_replay_writer_live(parent) is None
    store_meta.mark_replay_writer(parent)
    try:
        assert store_meta.probe_replay_writer_live(parent) is True
    finally:
        store_meta.release_replay_writer(parent)
    # marker still exists, nobody holds it: dead
    assert store_meta._writer_markers(parent)
    assert store_meta.probe_replay_writer_live(parent) is False
    store_meta.settle_replay_staging(store)
    assert store_meta.probe_replay_writer_live(parent) is None


def test_settle_refuses_flock_held_then_settles_dead_immediately(
    spark, store_one_batch
):
    """A flock-held marker refuses settle on BOTH paths (a live peer can
    exist even under the 'owner' settle once backfill and streaming
    share a store); the moment the holder dies (flock released), the
    settle proceeds WITHOUT waiting out the 15-minute mtime window —
    the availability win the exact liveness signal buys (r15)."""
    svc, store, batch_id = store_one_batch
    parent = svc.raw_path
    staging = store_meta.replay_stage_path(parent, batch_id + 7)
    os.makedirs(staging, exist_ok=True)
    open(os.path.join(staging, "part-0.parquet"), "w").close()  # no _SUCCESS
    store_meta.mark_replay_writer(parent)
    try:
        with pytest.raises(RuntimeError, match="flock is held"):
            store_meta.settle_replay_staging(store)
        with pytest.raises(RuntimeError, match="flock is held"):
            store_meta.settle_replay_staging(store, refuse_live=True)
        assert os.path.isdir(staging)
    finally:
        store_meta.release_replay_writer(parent)
    # writer provably dead: marker mtime is seconds old and the staging
    # tree is fresh, yet the pre-flight settle sweeps both immediately
    actions = store_meta.settle_replay_staging(store, refuse_live=True)
    assert any("writer marker" in a for a in actions)
    assert not os.path.exists(staging)


def test_entry_points_refuse_live_peer_writer(spark, store_one_batch):
    """ADVICE r14 low #3: backfill()/start() must not sweep a live peer's
    replay staging — their pre-flight settle runs with refuse_live=True
    and surfaces the retriable wait-for-it error while the peer's flock
    is held; recover() (the offline repair path) keeps the unconditional
    settle but still refuses under a held flock."""
    svc, store, _ = store_one_batch
    parent = svc.raw_path
    store_meta.mark_replay_writer(parent)
    try:
        with pytest.raises(RuntimeError, match="flock is held"):
            svc._settle_pending_compaction(refuse_live=True)
        with pytest.raises(RuntimeError, match="flock is held"):
            svc.recover()
    finally:
        store_meta.release_replay_writer(parent)
    # peer gone: both paths proceed
    svc._settle_pending_compaction(refuse_live=True)
    svc.recover()


def test_swap_retouches_stale_marker_and_reads_live_mid_swap(
    spark, store_one_batch, monkeypatch
):
    """ADVICE r14 medium: a staging write longer than the liveness window
    arrives at the swap with a stale marker; during the two renames the
    batch is genuinely absent from raw, and a stale marker there would
    make update_commit_marker de-commit it as torn-replay loss.
    swap_replayed_subtree must re-touch the marker (mtime fresh) AND the
    flock must read live at the first rename."""
    import time as _time

    svc, store, batch_id = store_one_batch
    parent = svc.raw_path
    final = store_meta.batch_dir(store, batch_id)
    staging = store_meta.replay_stage_path(parent, batch_id)
    os.makedirs(os.path.dirname(staging), exist_ok=True)
    shutil.copytree(final, staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()

    # the long write: marker created at write start, stale by swap time
    marker = store_meta.mark_replay_writer(parent)
    old = _time.time() - store_meta.REPLAY_LIVENESS_WINDOW_S - 120
    os.utime(marker, (old, old))

    seen = {}
    real_rename = os.rename

    def spy(src, dst):
        # fire on the staging->final rename: final was renamed aside, so
        # the batch is genuinely absent from raw RIGHT NOW — the exact
        # window the medium finding is about
        if dst == final and not seen:
            seen["marker_age"] = _time.time() - os.path.getmtime(marker)
            seen["flock_live"] = store_meta.probe_replay_writer_live(parent)
            # the end-to-end pin: a commit-marker RMW during the rename
            # window must NOT clip the mid-swap batch
            committed = store_meta.update_commit_marker(store, set())
            seen["still_committed"] = batch_id in committed
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", spy)
    store_meta.swap_replayed_subtree(parent, batch_id)
    monkeypatch.undo()

    assert seen["marker_age"] < 60, "swap did not re-touch the stale marker"
    assert seen["flock_live"] is True
    assert seen["still_committed"], "mid-swap batch was de-committed"
    assert batch_id in store_meta.committed_batches(store)
    assert store_meta.missing_committed_batches(store) == set()
    assert not os.path.exists(marker)


def test_failed_replay_write_releases_flock_but_keeps_marker(
    spark, store_one_batch, monkeypatch
):
    """In-process crash (exception) between mark and swap: the writer
    flock is released so later settles see a provably dead writer —
    without the release, every future settle would refuse forever."""
    svc, store, batch_id = store_one_batch
    parent = svc.raw_path

    def boom(p, bid):
        raise RuntimeError("simulated crash before swap")

    import metricq_db_hta_spark.streaming.ingest_stream as ist

    monkeypatch.setattr(ist.store_meta, "swap_replayed_subtree", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        svc._process_batch(_replay_kept(spark, svc), batch_id)
    monkeypatch.undo()

    assert store_meta._writer_markers(parent), (
        "marker documents the recent write"
    )
    assert store_meta.probe_replay_writer_live(parent) is False
    # a restart's pre-flight settles immediately (no 15-minute wait) ...
    svc._settle_pending_compaction(refuse_live=True)
    assert not store_meta._writer_markers(parent)
    # ... and the retry completes normally
    svc._process_batch(_replay_kept(spark, svc), batch_id)
    assert store_meta.missing_committed_batches(store) == set()


def test_flock_degraded_marker_keeps_mtime_protection(spark, store_one_batch):
    """r15 second review pass: a writer on a mount without flock support
    plants an 'M'-mode marker — it must NEVER read as 'provably dead'
    (that inference is only valid for 'F' markers whose lock the kernel
    released), so the pre-flight keeps the conservative mtime refusal
    for it, and a finishing peer's dead-sibling sweep spares it."""
    import time as _time

    svc, store, batch_id = store_one_batch
    parent = svc.raw_path
    root = store_meta.replay_staging_root(parent)
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, f"{store_meta.WRITER_MARKER_PREFIX}.99999.1")
    with open(marker, "w") as f:
        f.write("M")  # flock-degraded writer: mtime is its only signal
    staging = store_meta.replay_stage_path(parent, batch_id + 3)
    os.makedirs(staging, exist_ok=True)
    open(os.path.join(staging, "part-0.parquet"), "w").close()  # no _SUCCESS

    assert store_meta._probe_marker(marker) is None
    assert store_meta.probe_replay_writer_live(parent) is None
    with pytest.raises(RuntimeError, match="marker .* is fresh"):
        store_meta.settle_replay_staging(store, refuse_live=True)
    assert os.path.exists(marker) and os.path.isdir(staging)

    # a peer's finishing swap must not sweep the fresh M marker either
    final = store_meta.batch_dir(store, batch_id)
    peer_staging = store_meta.replay_stage_path(parent, batch_id)
    shutil.copytree(final, peer_staging)
    open(os.path.join(peer_staging, "_SUCCESS"), "w").close()
    store_meta.mark_replay_writer(parent)
    store_meta.swap_replayed_subtree(parent, batch_id)
    assert os.path.exists(marker), "peer swap swept a live M-mode marker"

    # once the M marker AGES OUT it sweeps like any stale marker
    old = _time.time() - store_meta.REPLAY_LIVENESS_WINDOW_S - 60
    os.utime(marker, (old, old))
    backdate_tree = __import__("conftest").backdate_tree
    backdate_tree(staging)
    store_meta.settle_replay_staging(store, refuse_live=True)
    assert not os.path.exists(marker)
    assert not os.path.exists(staging)


def test_concurrent_writers_keep_independent_liveness(spark, store_one_batch):
    """r15 review #1/#2: two concurrent replay writers on one parent
    (a stream replay racing a backfill replay) each own a distinct
    marker+flock; the first finisher's swap removes only ITS marker, so
    the still-live peer keeps its liveness signal — settles keep
    refusing until the peer actually releases."""
    import threading

    svc, store, batch_id = store_one_batch
    parent = svc.raw_path
    final = store_meta.batch_dir(store, batch_id)
    staging = store_meta.replay_stage_path(parent, batch_id)
    os.makedirs(os.path.dirname(staging), exist_ok=True)
    shutil.copytree(final, staging)
    open(os.path.join(staging, "_SUCCESS"), "w").close()

    marked = threading.Event()
    done = threading.Event()

    def peer():
        store_meta.mark_replay_writer(parent)
        marked.set()
        done.wait(30)
        store_meta.release_replay_writer(parent)

    t = threading.Thread(target=peer, name="peer-writer")
    t.start()
    assert marked.wait(10)
    try:
        # writer A (this thread) runs a complete write+swap while the
        # peer is still mid-write
        store_meta.swap_replayed_subtree(parent, batch_id)
        assert store_meta._writer_markers(parent), (
            "first finisher stripped the live peer's marker"
        )
        assert store_meta.probe_replay_writer_live(parent) is True
        with pytest.raises(RuntimeError, match="flock is held"):
            store_meta.settle_replay_staging(store, refuse_live=True)
    finally:
        done.set()
        t.join(10)
    # peer gone (flock released): the leftover marker sweeps immediately
    store_meta.settle_replay_staging(store)
    assert not store_meta._writer_markers(parent)
    assert store_meta.missing_committed_batches(store) == set()


def test_mutation_lock_warns_once_when_flock_degrades(
    spark, tmp_path, monkeypatch, caplog
):
    """ADVICE r14 low #2: the flock leg of mutation_lock degrading to
    thread-only locking must warn (once per store), not stay silent —
    multi-process deployments on odd mounts lose the cross-process
    guarantee the batch-id allocator and marker RMWs rely on."""
    import logging

    import fcntl as _fcntl

    def no_flock(fd, op):
        raise OSError("flock unsupported on this mount (simulated)")

    monkeypatch.setattr(_fcntl, "flock", no_flock)
    store = str(tmp_path / "degraded_store")
    with caplog.at_level(logging.WARNING, logger=store_meta.__name__):
        with store_meta.mutation_lock(store):
            pass
        with store_meta.mutation_lock(store):
            pass
    hits = [
        r
        for r in caplog.records
        if "cross-process mutual exclusion degraded" in r.getMessage()
    ]
    assert len(hits) == 1, f"expected exactly one warning, got {len(hits)}"
