"""Snapshot-pinned store backup (operators/backup.py): the copy is a
valid, independently-auditable store serving identical results, and
stays frozen while the source moves on."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import backup, fsck, retention
from metricq_db_hta_spark.plans.serve import build_history_service
from metricq_db_hta_spark.queries.hta_queries import W0, W1, samples
from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

DAY_NS = 86_400 * 1_000_000_000


@pytest.fixture()
def committed_store(spark, sf_dir, tmp_path):
    store = str(tmp_path / "src")
    src = samples(spark, sf_dir).orderBy("event_id").limit(500)
    ts = sorted(r[0] for r in src.select("ts_ns").collect())
    mid = ts[len(ts) // 2]
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0, W1), hist_widths_ns=(W0,)
    )
    svc.backfill(src.filter(F.col("ts_ns") <= mid))
    svc.backfill(src.filter(F.col("ts_ns") > mid))
    return store, svc, src


def _q3(spark, store):
    svc = build_history_service(spark, store)
    return sorted(tuple(r) for r in svc.aggregate(None, 0, 2**62).collect())


def test_backup_is_a_valid_equal_store(spark, committed_store, tmp_path):
    store, svc, src = committed_store
    dest = str(tmp_path / "copy")
    res = backup.backup_store(store, dest)
    assert res.batches == [-2, -1]
    assert set(res.tables) == {f"level_{W0}", f"level_{W1}", f"hist_{W0}"}
    assert res.n_files > 0 and res.n_bytes > 0

    # identical query results, independent audit green
    assert _q3(spark, dest) == _q3(spark, store)
    assert fsck.check_store(spark, dest).ok
    # the copy has its own committed marker + snapshot ledger
    assert store_meta.committed_batches(dest) == {-2, -1}
    assert store_meta.current_snapshot(dest)["batches"] == [-2, -1]

    # the copy is frozen: mutate the source afterwards
    before = _q3(spark, dest)
    svc.backfill(
        src.select(
            "metric",
            (F.col("ts_ns") + 61 * DAY_NS).alias("ts_ns"),
            "value",
            (F.col("event_id") + 10**6).alias("event_id"),
        )
    )
    assert _q3(spark, dest) == before
    assert _q3(spark, store) != before


def test_backup_carries_retention_floors(spark, committed_store, tmp_path):
    store, _svc, _src = committed_store
    import datetime as dt

    now = int(
        dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp()
    ) * 10**9
    retention.expire(
        store,
        retention.RetentionPolicy(raw_max_age_ns=200 * DAY_NS),
        now_ns=now,
    )  # advertises a floor without deleting (Jan data is younger)
    dest = str(tmp_path / "copy")
    backup.backup_store(store, dest)
    assert retention.retention_floors(dest) == retention.retention_floors(
        store
    )


def test_backup_refusals(spark, committed_store, tmp_path):
    store, _svc, _src = committed_store
    dest = str(tmp_path / "copy")
    os.makedirs(dest)
    with pytest.raises(ValueError, match="already exists"):
        backup.backup_store(store, dest)
    with pytest.raises(ValueError, match="no snapshot"):
        backup.backup_store(str(tmp_path / "not_a_store"), str(tmp_path / "x"))


def test_backup_captures_drops_log_through_torn_swap(
    spark, committed_store, tmp_path
):
    """A store crashed between _swap_drops' rename-out and rename-in
    holds drops_log only as ``drops_log.swap_old``; the backup must
    still capture it (under the live name — the copy is clean), not
    silently produce a store with no drops_log (r12 review)."""
    store, svc, src = committed_store
    # give the store a drops_log: one stale streaming row
    top = max(r[0] for r in src.select("ts_ns").collect())
    chunk = tmp_path / "in_swapchunk"
    chunk.mkdir()
    spark.createDataFrame(
        [("click", 1, 9.9, 10**6), ("click", top + W0, 1.0, 10**6 + 1)],
        "metric string, ts_ns long, value double, event_id long",
    ).coalesce(1).write.parquet(str(chunk / "c"))
    svc.run_until_drained(str(chunk))
    droot = os.path.join(store, "drops_log")
    want = spark.read.parquet(droot).count()
    assert want > 0

    os.rename(droot, droot + ".swap_old")  # the torn-swap crash window
    try:
        dest = str(tmp_path / "bak_swap")
        res = backup.backup_store(store, dest)
        assert "drops_log" in res.tables
        got = spark.read.parquet(os.path.join(dest, "drops_log")).count()
        assert got == want
    finally:
        os.rename(droot + ".swap_old", droot)
