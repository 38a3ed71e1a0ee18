"""Snapshot-manifest protocol tests (store_meta manifests +
sources/snapshots.py reader + deferred-delete compaction + vacuum):
the plain-parquet answer to the transactional-format gap — readers pin
one consistent version, compaction retires instead of deletes, vacuum
reclaims after a grace period."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import maintenance
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.sources.snapshots import read_raw_snapshot
from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

RAW_KEY = ["metric", "ts_ns", "value", "event_id", "delta_ns"]


@pytest.fixture()
def multi_batch_store(spark, sf_dir, tmp_path):
    """Same shape as test_maintenance's fixture: 3 committed time-split
    backfill batches (900 rows total)."""
    store = str(tmp_path / "store")
    src = samples(spark, sf_dir).orderBy("event_id").limit(900)
    ts = sorted(r[0] for r in src.select("ts_ns").collect())
    t1, t2 = ts[len(ts) // 3], ts[2 * len(ts) // 3]
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.backfill(src.filter(F.col("ts_ns") <= t1))
    svc.backfill(src.filter((F.col("ts_ns") > t1) & (F.col("ts_ns") <= t2)))
    svc.backfill(src.filter(F.col("ts_ns") > t2))
    return store, svc


def test_commits_publish_manifest_and_snapshot_read_matches_listing(
    spark, multi_batch_store
):
    """Every commit republishes: after 3 backfills CURRENT pins exactly
    the committed set and the pinned read equals the root listing."""
    store, svc = multi_batch_store
    snap = store_meta.current_snapshot(store)
    assert snap is not None
    assert snap["batches"] == sorted(store_meta.committed_batches(store))
    pinned = read_raw_snapshot(spark, store).select(*RAW_KEY)
    listed = spark.read.parquet(svc.raw_path).select(*RAW_KEY)
    assert pinned.count() == 900
    assert pinned.exceptAll(listed).count() == 0
    assert listed.exceptAll(pinned).count() == 0


def test_deferred_compaction_keeps_pinned_reader_alive(
    spark, multi_batch_store
):
    """The headline isolation property: a reader pinned BEFORE a deferred
    compaction still reads its version's files afterwards (sources are
    retired, not deleted), while a new reader sees the compacted dest —
    both with identical rows."""
    store, svc = multi_batch_store
    old_df = read_raw_snapshot(spark, store).select(*RAW_KEY)
    old_version = store_meta.current_snapshot(store)["version"]

    res = maintenance.compact_raw(spark, store, defer_source_delete=True)
    assert res is not None

    # old pinned plan still executes: source dirs are on disk
    assert old_df.count() == 900
    # new snapshot advanced to the dest-only version
    snap = store_meta.current_snapshot(store)
    assert snap["version"] > old_version
    assert snap["batches"] == [res.dest]
    new_df = read_raw_snapshot(spark, store).select(*RAW_KEY)
    assert new_df.count() == 900
    assert new_df.exceptAll(old_df).count() == 0
    # sources retired (awaiting vacuum), marker excludes them
    assert set(store_meta.retired_batches(store)) == set(res.sources)
    assert store_meta.committed_batches(store) == {res.dest}
    assert set(res.sources) <= store_meta.raw_batches_on_disk(store)
    # no journal left behind
    assert not os.path.exists(store_meta.journal_path(store))


def test_root_listing_reader_excludes_retired(spark, multi_batch_store):
    """The legacy listing reader (serve path) must stay exactly-once for
    the whole retire-to-vacuum window, not just while the journal is
    pending (post-journal, pre-vacuum was the r9 double-copy window)."""
    from metricq_db_hta_spark.plans.serve import HistoryServer

    store, svc = multi_batch_store
    res = maintenance.compact_raw(spark, store, defer_source_delete=True)
    assert set(res.sources) <= store_meta.raw_batches_on_disk(store)
    assert set(store_meta.excluded_batches_for_read(store)) >= set(res.sources)
    srv = HistoryServer(spark, store, [W0])
    total = sum(r["count"] for r in srv.handle({"type": "aggregate"})["rows"])
    assert total == 900
    # snapshot-mode server sees the same data through the pinned manifest
    srv_snap = HistoryServer(spark, store, [W0], snapshot=True)
    total_snap = sum(
        r["count"] for r in srv_snap.handle({"type": "aggregate"})["rows"]
    )
    assert total_snap == 900


def test_recover_ignores_retired(spark, multi_batch_store):
    """Retired dirs are on disk and uncommitted — recover() must not
    'repair' them back in (that would double-count levels and re-commit
    the duplicates)."""
    store, svc = multi_batch_store
    res = maintenance.compact_raw(spark, store, defer_source_delete=True)
    assert svc.recover() == set()
    assert store_meta.committed_batches(store) == {res.dest}
    lv = (
        spark.read.parquet(svc.level_path(W0))
        .agg(F.sum("count").alias("c"))
        .collect()[0]["c"]
    )
    assert lv == 900


def test_vacuum_honors_grace_then_reclaims(spark, multi_batch_store):
    store, svc = multi_batch_store
    res = maintenance.compact_raw(spark, store, defer_source_delete=True)
    # inside grace: nothing reclaimed
    assert maintenance.vacuum(store, grace_s=3600) == []
    assert set(res.sources) <= store_meta.raw_batches_on_disk(store)
    # grace expired: sources reclaimed, retired ledger cleared, store clean
    assert sorted(maintenance.vacuum(store, grace_s=0)) == sorted(res.sources)
    assert store_meta.raw_batches_on_disk(store) == {res.dest}
    assert store_meta.retired_batches(store) == {}
    # idempotent re-run
    assert maintenance.vacuum(store, grace_s=0) == []
    assert read_raw_snapshot(spark, store).count() == 900
    assert svc.recover() == set()


def test_deferred_crash_rolls_forward_to_retire(spark, multi_batch_store):
    """Crash after the dest verify of a DEFERRED compaction: recovery
    must finish by retiring (pinned readers may hold the sources), never
    by deleting."""
    store, svc = multi_batch_store
    src_dir = store_meta.batch_dir(store, -1)
    backup = os.path.join(store, "bak")
    shutil.copytree(src_dir, backup)
    maintenance.compact_raw(spark, store, defer_source_delete=True)
    # reconstruct the crash window: journal resurrected in written state
    # with the defer flag; -1's dir is still on disk (retired, unvacuumed)
    maintenance._write_journal(
        store,
        {"state": "written", "sources": [-3, -2, -1], "dest": -4,
         "defer": True},
    )
    assert maintenance.recover_compaction(store) == "completed"
    assert os.path.exists(src_dir)  # retired, NOT deleted
    assert set(store_meta.retired_batches(store)) == {-3, -2, -1}
    assert store_meta.committed_batches(store) == {-4}
    assert store_meta.current_snapshot(store)["batches"] == [-4]
    assert not os.path.exists(store_meta.journal_path(store))
    assert spark.read.parquet(svc.raw_path).filter(
        F.col("ingest_batch") == -4
    ).count() == 900


def test_snapshot_reader_immune_to_journal_toctou(spark, multi_batch_store):
    """The race the manifest closes: a journal appearing (with a partial
    dest on disk) between 'decide what to read' and 'read it' corrupts a
    listing reader's view; the pinned reader never consults the journal
    or lists the root, so its result is unchanged."""
    store, svc = multi_batch_store
    pinned = read_raw_snapshot(spark, store).select(*RAW_KEY)
    # mid-read journal flip + partial dest appears (crash-simulation
    # pattern from test_maintenance)
    os.makedirs(
        os.path.join(store_meta.batch_dir(store, -4), "metric=torn"),
        exist_ok=True,
    )
    maintenance._write_journal(
        store, {"state": "writing", "sources": [-3, -2, -1], "dest": -4}
    )
    assert pinned.count() == 900
    # a FRESH pinned reader also sees the consistent committed set (the
    # manifest never contains an in-flight dest)
    assert read_raw_snapshot(spark, store).count() == 900


def test_vacuum_never_deletes_current_version(spark, multi_batch_store):
    """Safety rail: a batch somehow both retired and pinned by CURRENT
    must survive vacuum (manifest wins)."""
    store, svc = multi_batch_store
    cur = store_meta.current_snapshot(store)["batches"]
    store_meta.retire_batches(store, {cur[0]})
    assert maintenance.vacuum(store, grace_s=0) == []
    assert cur[0] in store_meta.raw_batches_on_disk(store)
    store_meta.clear_retired(store, {cur[0]})
