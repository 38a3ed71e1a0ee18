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
