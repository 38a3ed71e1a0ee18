"""Raw-store compaction tests (operators/maintenance.py): rows preserved,
files reduced, commit marker/recover() coherence, torn-compaction
rollback and roll-forward."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import maintenance
from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

RAW_KEY = ["metric", "ts_ns", "value", "event_id", "delta_ns"]


@pytest.fixture()
def multi_batch_store(spark, sf_dir, tmp_path):
    """A store with 3 committed batches: two time-split backfills (the
    split point is a global ts threshold, so per-metric monotonicity holds
    across them and nothing is dropped) plus a third with later rows."""
    store = str(tmp_path / "store")
    src = samples(spark, sf_dir).orderBy("event_id").limit(900)
    ts = sorted(r[0] for r in src.select("ts_ns").collect())
    t1, t2 = ts[len(ts) // 3], ts[2 * len(ts) // 3]
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.backfill(src.filter(F.col("ts_ns") <= t1))
    svc.backfill(src.filter((F.col("ts_ns") > t1) & (F.col("ts_ns") <= t2)))
    svc.backfill(src.filter(F.col("ts_ns") > t2))
    return store, svc


def test_compact_preserves_rows_and_reduces_files(spark, multi_batch_store):
    store, svc = multi_batch_store
    before = spark.read.parquet(svc.raw_path).select(*RAW_KEY)
    n_before = before.count()
    rows_before = before.collect()
    files_before = maintenance._count_data_files(svc.raw_path)

    res = maintenance.compact_raw(spark, store)
    assert res is not None
    assert sorted(res.sources) == [-3, -2, -1]
    assert res.dest == -4
    assert res.n_rows == n_before
    assert res.n_files_after < res.n_files_before

    after = spark.read.parquet(svc.raw_path).select(*RAW_KEY)
    assert after.count() == n_before
    assert (
        after.exceptAll(spark.createDataFrame(rows_before, after.schema)).count()
        == 0
    )
    assert maintenance._count_data_files(svc.raw_path) < files_before
    # on-disk set is exactly the dest; the commit marker matches it, so
    # recover() finds no suspects and no journal remains
    assert store_meta.raw_batches_on_disk(store) == {-4}
    assert store_meta.committed_batches(store) == {-4}
    assert svc.recover() == set()
    assert not os.path.exists(maintenance._journal_path(store))


def test_compact_noop_below_min_batches(spark, multi_batch_store):
    store, _ = multi_batch_store
    assert maintenance.compact_raw(spark, store, min_batches=4) is None


def test_second_compaction_after_more_batches(spark, sf_dir, multi_batch_store):
    """Compaction output is itself a committed batch: a later maintenance
    run merges it with newer batches under a fresh dest id."""
    store, svc = multi_batch_store
    maintenance.compact_raw(spark, store)
    late = samples(spark, sf_dir).orderBy("event_id").limit(1200)
    svc.backfill(late)  # only the 300 unseen later rows survive the wm
    n = spark.read.parquet(svc.raw_path).count()
    res = maintenance.compact_raw(spark, store)
    assert res is not None and res.dest == -6  # after -4 (compact), -5 (bf)
    assert spark.read.parquet(svc.raw_path).count() == n


def test_torn_writing_rolls_back(spark, multi_batch_store):
    store, svc = multi_batch_store
    n = spark.read.parquet(svc.raw_path).count()
    # simulate a crash mid-dest-write: journal says writing, dest partial
    dest_dir = store_meta.batch_dir(store, -4)
    os.makedirs(os.path.join(dest_dir, "metric=torn"), exist_ok=True)
    maintenance._write_journal(
        store, {"state": "writing", "sources": [-3, -2, -1], "dest": -4}
    )
    with pytest.raises(RuntimeError, match="recover_compaction"):
        maintenance.compact_raw(spark, store)
    # the journal is fresh -> the liveness guard presumes a live job and
    # refuses; force=True is the operator's explicit crash adjudication
    with pytest.raises(RuntimeError, match="may still be running"):
        maintenance.recover_compaction(store)
    assert maintenance.recover_compaction(store, force=True) == "rolled_back"
    assert not os.path.exists(dest_dir)
    assert spark.read.parquet(svc.raw_path).count() == n
    # store is clean: a fresh compaction succeeds
    assert maintenance.compact_raw(spark, store) is not None


def test_torn_written_rolls_forward(spark, multi_batch_store):
    store, svc = multi_batch_store
    rows = spark.read.parquet(svc.raw_path).select(*RAW_KEY)
    n = rows.count()
    # run a real compaction, then resurrect one source dir + a journal in
    # the post-verification state: recovery must finish the deletes
    src_dir = store_meta.batch_dir(store, -1)
    backup = os.path.join(store, "batch_backup")  # outside raw/: the
    # batch-dir listing parses every ingest_batch= entry under raw
    shutil.copytree(src_dir, backup)
    maintenance.compact_raw(spark, store)
    shutil.copytree(backup, src_dir)
    maintenance._write_journal(
        store, {"state": "written", "sources": [-3, -2, -1], "dest": -4}
    )
    assert maintenance.recover_compaction(store) == "completed"
    assert not os.path.exists(src_dir)
    assert store_meta.raw_batches_on_disk(store) == {-4}
    assert store_meta.committed_batches(store) == {-4}
    assert spark.read.parquet(svc.raw_path).count() == n


def test_recover_compaction_without_journal_is_noop(spark, multi_batch_store):
    store, _ = multi_batch_store
    assert maintenance.recover_compaction(store) == "none"


def test_compact_skips_uncommitted_batches(spark, multi_batch_store):
    """An id missing from the commit marker (a mid-flight or torn batch)
    must never be merged: it belongs to the streaming replay contract."""
    store, svc = multi_batch_store
    marker = os.path.join(store, "_last_commit.json")
    with open(marker) as f:
        m = json.load(f)
    m["committed_batches"] = [-2, -1]  # pretend -3 is uncommitted
    with open(marker, "w") as f:
        json.dump(m, f)
    res = maintenance.compact_raw(spark, store)
    assert res is not None and sorted(res.sources) == [-2, -1]
    assert -3 in store_meta.raw_batches_on_disk(store)


def test_compacted_files_are_ts_sorted(spark, multi_batch_store):
    """Compaction clusters rows by ts within each output file so parquet
    row-group min/max pruning works on the merged data."""
    store, svc = multi_batch_store
    res = maintenance.compact_raw(spark, store)
    dest = spark.read.parquet(svc.raw_path).filter(
        F.col("ingest_batch") == res.dest
    )
    disorder = (
        dest.withColumn("f", F.input_file_name())
        .withColumn(
            "prev",
            F.lag("ts_ns").over(
                Window.partitionBy("f", "metric").orderBy(
                    F.monotonically_increasing_id()
                )
            ),
        )
        .filter(F.col("prev") > F.col("ts_ns"))
        .count()
    )
    assert disorder == 0


def test_compact_then_stream_restart(spark, sf_dir, tmp_path):
    """The replay-safety claim, validated against the real streaming
    checkpoint: ingest via the stream, compact the committed batches,
    then restart the stream over the same input PLUS a new chunk. The
    checkpoint must not replay compacted batches (they are committed),
    the new chunk must land under a fresh non-negative id, and the store
    must equal the no-compaction run row-for-row."""
    src = samples(spark, sf_dir).orderBy("event_id").limit(600)
    rows = src.collect()
    input_dir = tmp_path / "in"
    input_dir.mkdir()

    def write_chunk(name, data):
        spark.createDataFrame(data, src.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(input_dir / name))

    write_chunk("chunk1", rows[:400])
    store = str(tmp_path / "store")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(str(input_dir))

    res = maintenance.compact_raw(spark, store, min_batches=1)
    assert res is not None
    compacted_ids = store_meta.raw_batches_on_disk(store)

    write_chunk("chunk2", rows[400:])
    svc2 = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc2.run_until_drained(str(input_dir))

    after = store_meta.raw_batches_on_disk(store)
    # the compacted id survived untouched and the new data arrived under
    # fresh (non-negative, checkpoint-allocated) ids
    assert compacted_ids <= after
    assert all(b >= 0 for b in after - compacted_ids) and after != compacted_ids
    raw = spark.read.parquet(svc.raw_path).select(*RAW_KEY)
    assert raw.count() == 600
    ref = spark.createDataFrame(rows, src.schema)
    got = raw.select("metric", "ts_ns", "value")
    assert got.exceptAll(ref.select("metric", "ts_ns", "value")).count() == 0


def test_compact_day_partitioned_store(spark, sf_dir, tmp_path):
    """tcol autodetection: a raw_partition='day' store compacts on
    (metric, ts_date) instead of ts_month."""
    store = str(tmp_path / "store_day")
    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    ts = sorted(r[0] for r in src.select("ts_ns").collect())
    mid = ts[len(ts) // 2]
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), raw_partition="day"
    )
    svc.backfill(src.filter(F.col("ts_ns") <= mid))
    svc.backfill(src.filter(F.col("ts_ns") > mid))
    n = spark.read.parquet(svc.raw_path).count()
    res = maintenance.compact_raw(spark, store)
    assert res is not None and res.n_rows == n
    after = spark.read.parquet(svc.raw_path)
    assert "ts_date" in after.columns
    assert after.count() == n


def test_torn_batch_stays_repairable_after_compaction(spark, multi_batch_store):
    """Code-review regression (round 7): the marker update must be
    incremental — compacting {-2, -1} around a torn batch (-3, on disk
    but uncommitted) must leave -3 uncommitted so recover() still
    repairs its level state. The old commit-everything-on-disk marker
    write silently committed -3 and disabled the repair forever."""
    store, svc = multi_batch_store
    marker = os.path.join(store, "_last_commit.json")
    with open(marker) as f:
        m = json.load(f)
    m["committed_batches"] = [-2, -1]  # -3 is torn: raw on disk, levels not
    with open(marker, "w") as f:
        json.dump(m, f)
    res = maintenance.compact_raw(spark, store)
    assert sorted(res.sources) == [-2, -1]
    assert store_meta.committed_batches(store) == {res.dest}
    assert -3 not in store_meta.committed_batches(store)
    # recover() still sees the torn batch and repairs it
    assert svc.recover() == {-3}
    assert -3 in store_meta.committed_batches(store)


def test_writer_commit_is_incremental_too(spark, sf_dir, multi_batch_store):
    """Same defect class on the writer path: a later backfill's commit
    must not blanket-commit an unrelated torn batch."""
    store, svc = multi_batch_store
    marker = os.path.join(store, "_last_commit.json")
    with open(marker) as f:
        m = json.load(f)
    m["committed_batches"] = [-2, -1]  # -3 torn
    with open(marker, "w") as f:
        json.dump(m, f)
    late = samples(spark, sf_dir).orderBy("event_id").limit(1200)
    svc.backfill(late)  # commits its own id (-4) only
    committed = store_meta.committed_batches(store)
    assert -4 in committed and -3 not in committed


def test_compact_requires_checkpoint_commit_for_streaming_ids(
    spark, sf_dir, tmp_path
):
    """Code-review regression (round 7): the store marker is written
    inside foreachBatch BEFORE the engine's checkpoint commit record, so
    a marker-committed streaming batch may still be replayable. Source
    selection must additionally require the checkpoint commits file for
    non-negative ids — simulate the crash window by deleting one."""
    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    spark.createDataFrame(src.collect(), src.schema).coalesce(1).write.parquet(
        str(input_dir / "chunk")
    )
    store = str(tmp_path / "store")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(str(input_dir))
    ids = sorted(store_meta.raw_batches_on_disk(store))
    assert ids and all(b >= 0 for b in ids)
    # crash-window simulation: engine commit record missing for the last id
    victim = ids[-1]
    os.remove(os.path.join(store, "_checkpoint", "commits", str(victim)))
    plan = maintenance.plan_compaction(store, min_batches=1)
    assert plan is None or victim not in plan.sources


def test_failed_source_delete_keeps_journal(spark, multi_batch_store, monkeypatch):
    """Code-review regression (round 7): a failed source delete must NOT
    proceed to the marker update and journal removal — the 'written'
    journal stays so recovery can retry, instead of silently committing
    duplicated rows."""
    store, svc = multi_batch_store
    real_rmtree = shutil.rmtree
    calls = {"n": 0}

    def flaky_rmtree(path, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # second source delete fails
            raise OSError("simulated NFS delete failure")
        return real_rmtree(path, **kw)

    monkeypatch.setattr(maintenance.shutil, "rmtree", flaky_rmtree)
    with pytest.raises(OSError, match="simulated"):
        maintenance.compact_raw(spark, store)
    # journal survived in the written state; marker does NOT include dest
    with open(maintenance._journal_path(store)) as f:
        assert json.load(f)["state"] == "written"
    assert -4 not in store_meta.committed_batches(store)
    monkeypatch.setattr(maintenance.shutil, "rmtree", real_rmtree)
    assert maintenance.recover_compaction(store) == "completed"
    assert store_meta.committed_batches(store) == {-4}
    n = spark.read.parquet(svc.raw_path).count()
    assert n == 900


def test_recover_settles_torn_compaction_first(spark, multi_batch_store):
    """Code-review regression (round 7, second pass): recover() on a store
    whose compaction crashed must settle the journal BEFORE computing
    suspects — otherwise it would recompute level partitions from a raw
    directory holding both the dest rows and their undeleted source
    duplicates, serving double-counted buckets forever."""
    store, svc = multi_batch_store
    src_dir = store_meta.batch_dir(store, -1)
    backup = os.path.join(store, "bak")
    shutil.copytree(src_dir, backup)
    maintenance.compact_raw(spark, store)
    # crash simulation: dest written+verified, one source delete missing
    shutil.copytree(backup, src_dir)
    maintenance._write_journal(
        store, {"state": "written", "sources": [-3, -2, -1], "dest": -4}
    )
    # the crash state models a DEAD compactor: age the journal past the
    # liveness window (the writer's entry settle skips FRESH journals —
    # those belong to a live compaction racing the writer, r14)
    old = __import__("time").time() - maintenance.LIVENESS_WINDOW_S - 60
    os.utime(maintenance._journal_path(store), (old, old))
    # recover(), not recover_compaction(): must roll the journal forward
    # itself, then find nothing suspect
    assert svc.recover() == set()
    assert not os.path.exists(maintenance._journal_path(store))
    assert store_meta.raw_batches_on_disk(store) == {-4}
    raw_n = spark.read.parquet(svc.raw_path).count()
    lv_n = (
        spark.read.parquet(svc.level_path(W0))
        .agg(F.sum("count").alias("c"))
        .collect()[0]["c"]
    )
    assert raw_n == 900 and lv_n == 900  # no double-counted buckets


def test_hot_partition_splits_at_target_file_size(spark, multi_batch_store):
    """A partition bigger than the target file size must roll into
    multiple files (maxRecordsPerFile sized from measured bytes/row), not
    one giant file — the 100 TB hot-metric-month case scaled down via a
    tiny target."""
    store, svc = multi_batch_store
    res = maintenance.compact_raw(spark, store, target_file_bytes=4096)
    assert res is not None
    # with a 4 KB target, at least one (metric, month) partition must have
    # split into several files, and total dest files must exceed the
    # one-per-partition minimum
    dest_dir = store_meta.batch_dir(store, res.dest)
    per_part = []
    for dirpath, dirnames, files in os.walk(dest_dir):
        if not dirnames:
            per_part.append(sum(1 for f in files if f.endswith(".parquet")))
    assert max(per_part) > 1
    assert spark.read.parquet(svc.raw_path).count() == 900


def test_torn_written_partial_deletes_roll_forward(spark, multi_batch_store):
    """Crash after SOME source deletes: roll-forward must be idempotent
    over already-deleted sources and finish the rest."""
    store, svc = multi_batch_store
    maintenance.compact_raw(spark, store)
    # reconstruct the mid-delete crash: -1 already gone, -2 resurrected,
    # journal still in the written state
    backup = os.path.join(store, "bak2")
    # (sources were deleted by the real run; fabricate -2 from dest rows)
    dest_df = spark.read.parquet(svc.raw_path).filter(F.col("ingest_batch") == -4)
    dest_df.limit(50).select(*RAW_KEY, "ts_month").withColumn(
        "ingest_batch", F.lit(-2)
    ).write.partitionBy("ingest_batch", "metric", "ts_month").parquet(
        backup
    )
    shutil.copytree(
        os.path.join(backup, "ingest_batch=-2"),
        store_meta.batch_dir(store, -2),
    )
    maintenance._write_journal(
        store, {"state": "written", "sources": [-3, -2, -1], "dest": -4}
    )
    assert maintenance.recover_compaction(store) == "completed"
    assert store_meta.raw_batches_on_disk(store) == {-4}
    assert store_meta.committed_batches(store) == {-4}
    assert spark.read.parquet(svc.raw_path).count() == 900


def test_fresh_writing_journal_skips_writer_entry(spark, sf_dir, multi_batch_store):
    """Liveness guard, r14 form: a FRESH writing-state journal may belong
    to a LIVE compaction — writer entry points must neither roll it back
    (deleting the dest out from under the running job) NOR refuse (a
    backfill racing a live compact is legal since fuzz class 20): they
    proceed, leave the journal untouched, read around its pending side
    (excluded_batches_for_read), and never allocate its dest id. A stale
    journal (dead compactor) settles normally on the next entry."""
    store, svc = multi_batch_store
    maintenance._write_journal(
        store, {"state": "writing", "sources": [-3, -2, -1], "dest": -4}
    )
    assert svc.recover() == set()  # proceeds, adopts nothing
    assert os.path.exists(maintenance._journal_path(store))
    fresh_rows = spark.createDataFrame(
        [("race_m", 2_000_000_000_000_000_000 + i, float(i), i) for i in range(5)],
        "metric string, ts_ns long, value double, event_id long",
    )
    svc.backfill(fresh_rows)
    assert os.path.exists(maintenance._journal_path(store))
    # the backfill skipped the journal's dest id (-4) — colliding with it
    # would hand the live compactor's rollback the backfill's subtree
    assert -4 not in store_meta.raw_batches_on_disk(store)
    assert -5 in store_meta.raw_batches_on_disk(store)
    # age the journal past the liveness window -> settles as rollback
    old = __import__("time").time() - 20 * 60
    os.utime(maintenance._journal_path(store), (old, old))
    assert svc.recover() == set()
    assert not os.path.exists(maintenance._journal_path(store))


def test_reader_honors_pending_journal(spark, multi_batch_store):
    """Reader-side journal honoring: while a written-state journal is
    pending (dest complete, sources not yet deleted), HistoryServer must
    skip the sources so aggregates are not double-counted."""
    from metricq_db_hta_spark.plans.serve import HistoryServer
    from metricq_db_hta_spark.queries.hta_queries import W0 as _W0

    store, svc = multi_batch_store
    src_dir = store_meta.batch_dir(store, -1)
    backup = os.path.join(store, "bak_reader")
    shutil.copytree(src_dir, backup)
    maintenance.compact_raw(spark, store)
    shutil.copytree(backup, src_dir)  # crash simulation: source survives
    maintenance._write_journal(
        store, {"state": "written", "sources": [-3, -2, -1], "dest": -4}
    )
    srv = HistoryServer(spark, store, [_W0])
    resp = srv.handle({"type": "aggregate"})
    total = sum(r["count"] for r in resp["rows"])
    assert total == 900  # not 900 + |resurrected source|
