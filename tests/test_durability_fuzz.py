"""Fuzz class 19: randomized crash-state x maintenance interleavings.

The r13 durability work added three cooperating recovery mechanisms —
replay stage-then-swap settle, the removal-intent ledger, and the
missing-committed maintenance guard. The explicit tests in
test_replay_durability.py pin each crash window in isolation; this fuzz
drives RANDOM interleavings of (multi-batch store build, injected crash
state, maintenance/entry action) and asserts the global invariants:

* settle always restores 'every marker-committed batch is on disk'
  (missing_committed_batches == {}) except for genuine injected loss,
  where maintenance must REFUSE;
* no injected crash state ever loses or duplicates raw rows;
* after the dust settles, fsck's full-store check is green.
"""

from __future__ import annotations

import os
import shutil

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from metricq_db_hta_spark.streaming import store_meta
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

W = 3_600_000_000_000
T0 = 1_704_067_200_000_000_000


from conftest import backdate_removal_intent  # noqa: E402
from conftest import backdate_tree as _backdate_tree  # noqa: E402

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
import pytest

pytestmark = pytest.mark.slow

INCIDENTS = [
    "none",
    "torn_swap_mid",          # replay swap crashed between the two renames
    "stale_staging",          # replay crashed before the swap started
    "removal_intent_only",    # expire/erase crashed before the dir delete
    "removal_dir_deleted",    # expire/erase crashed after delete, pre de-commit
    "genuine_loss",           # batch dir vanished with no intent (real loss)
    # r15 marker states: a crashed FLOCKED writer (F marker, lock
    # released by death, mtime FRESH — provably dead, settles with no
    # age-out wait) and a crashed flock-DEGRADED writer (M marker, aged
    # out — settles via the mtime window)
    "dead_flocked_writer",
    "stale_degraded_writer",
]
ACTIONS = ["recover", "expire", "compact", "rebuild"]

fuzz_spec = st.fixed_dictionaries(
    {
        "n_batches": st.integers(2, 3),
        "per_batch": st.integers(5, 12),
        "victim": st.integers(0, 2),  # which batch the incident targets (mod n)
        "incident": st.sampled_from(INCIDENTS),
        "action": st.sampled_from(ACTIONS),
    }
)


def _pin(incident, action, victim=1):
    return {
        "n_batches": 3,
        "per_batch": 6,
        "victim": victim,
        "incident": incident,
        "action": action,
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
# the five load-bearing combinations run EVERY time, on top of the
# random exploration (hypothesis sampling alone covers ~10 of 24 combos)
@example(spec=_pin("torn_swap_mid", "recover"))
@example(spec=_pin("torn_swap_mid", "rebuild"))
@example(spec=_pin("removal_dir_deleted", "expire"))
@example(spec=_pin("removal_dir_deleted", "compact"))
@example(spec=_pin("genuine_loss", "compact"))
@example(spec=_pin("dead_flocked_writer", "compact"))
@example(spec=_pin("stale_degraded_writer", "expire"))
@given(spec=fuzz_spec)
def test_random_crash_state_then_maintenance(spark, spec, tmp_path_factory):
    import pytest

    from metricq_db_hta_spark.operators import fsck as fsck_mod
    from metricq_db_hta_spark.operators.maintenance import compact_raw
    from metricq_db_hta_spark.operators.retention import RetentionPolicy, expire

    store = str(tmp_path_factory.mktemp("dfuzz"))
    shutil.rmtree(store, ignore_errors=True)
    svc = StreamingIngest(spark, store, level_widths_ns=(W,))

    # deterministic multi-batch build: per-metric strictly increasing ts
    eid = 0
    all_rows: list[tuple] = []
    for k in range(spec["n_batches"]):
        rows = []
        for i in range(spec["per_batch"]):
            for m in ("fa", "fb"):
                t = T0 + (k * spec["per_batch"] + i) * (W // 7 + 1)
                rows.append((m, t, float(eid % 17), eid))
                eid += 1
        all_rows += rows
        svc.backfill(
            spark.createDataFrame(
                rows, "metric string, ts_ns long, value double, event_id long"
            )
        )
    batches = sorted(store_meta.committed_batches(store))
    victim = batches[spec["victim"] % len(batches)]
    vdir = store_meta.batch_dir(store, victim)
    victim_rows = {
        (r["metric"], r["ts_ns"])
        for r in spark.read.parquet(vdir).select("metric", "ts_ns").collect()
    }

    # -- inject the crash state --------------------------------------------
    lost = False  # True => victim's rows deliberately/genuinely gone
    inc = spec["incident"]
    if inc == "torn_swap_mid":
        staging = store_meta.replay_stage_path(
            store_meta.raw_path(store), victim
        )
        os.makedirs(os.path.dirname(staging), exist_ok=True)
        shutil.copytree(vdir, staging)
        open(os.path.join(staging, "_SUCCESS"), "w").close()
        os.rename(vdir, staging + ".old")
        # dead-writer model: the swap-liveness guard treats a fresh
        # staging/aside as a LIVE mid-swap replay and refuses
        _backdate_tree(staging)
        _backdate_tree(staging + ".old")
    elif inc == "stale_staging":
        staging = store_meta.replay_stage_path(
            store_meta.raw_path(store), victim
        )
        os.makedirs(staging)
        open(os.path.join(staging, "part-junk.parquet"), "w").close()
        # the minted crash state models a DEAD writer: age it past the
        # maintenance pre-flight's liveness window (a fresh _SUCCESS-less
        # staging is presumed live and refused — tested separately)
        _backdate_tree(staging)
    elif inc == "dead_flocked_writer":
        # crash mid-write WITH the staging partial: marker mode 'F',
        # flock released (process death model), mtime seconds old — the
        # settle must sweep BOTH immediately, no liveness-window wait
        staging = store_meta.replay_stage_path(
            store_meta.raw_path(store), victim
        )
        os.makedirs(staging, exist_ok=True)
        open(os.path.join(staging, "part-junk.parquet"), "w").close()
        store_meta.mark_replay_writer(store_meta.raw_path(store))
        store_meta.release_replay_writer(store_meta.raw_path(store))
        assert (
            store_meta.probe_replay_writer_live(store_meta.raw_path(store))
            is False
        )
    elif inc == "stale_degraded_writer":
        # flock-degraded writer's crash leftover: 'M' marker aged out
        root = store_meta.replay_staging_root(store_meta.raw_path(store))
        os.makedirs(root, exist_ok=True)
        m = os.path.join(root, f"{store_meta.WRITER_MARKER_PREFIX}.77.1")
        with open(m, "w") as f:
            f.write("M")
        _backdate_tree(root)
    elif inc == "removal_intent_only":
        store_meta.record_removal_intent(store, {victim})
        backdate_removal_intent(store)  # dead-op model; fresh = live op
    elif inc == "removal_dir_deleted":
        store_meta.record_removal_intent(store, {victim})
        backdate_removal_intent(store)
        shutil.rmtree(vdir)
        lost = True  # deliberately removed — settle finishes the de-commit
    elif inc == "genuine_loss":
        shutil.rmtree(vdir)
        lost = True

    # -- run the maintenance / entry action --------------------------------
    def act():
        if spec["action"] == "recover":
            StreamingIngest(spark, store, level_widths_ns=(W,)).recover()
        elif spec["action"] == "expire":
            expire(store, RetentionPolicy(raw_max_age_ns=10**18), now_ns=T0 + 1)
        elif spec["action"] == "compact":
            compact_raw(spark, store, min_batches=2)
        else:
            fsck_mod.rebuild_levels(spark, store)

    if inc == "genuine_loss" and spec["action"] != "recover":
        # unsettleable loss: every maintenance op must refuse, and the
        # refusal must leave the marker still claiming the batch (the
        # loss evidence is preserved, never silently clipped)
        with pytest.raises(RuntimeError, match="missing from raw"):
            act()
        assert victim in store_meta.committed_batches(store)
        return
    if inc == "genuine_loss":
        # recover() is the writer's entry point, not maintenance: it
        # settles what it can; the loss surfaces to the next maintenance
        act()
        assert store_meta.missing_committed_batches(store) == {victim}
        return

    act()

    # -- invariants ---------------------------------------------------------
    assert store_meta.missing_committed_batches(store) == set()
    assert store_meta.read_removal_intent(store) == set()
    root = store_meta.raw_path(store)
    assert not os.path.isdir(store_meta.replay_staging_root(root))

    got = {
        (r["metric"], r["ts_ns"])
        for r in spark.read.parquet(root).select("metric", "ts_ns").collect()
    }
    want = {(m, t) for (m, t, _v, _e) in all_rows}
    if lost:
        want -= victim_rows
        assert victim not in store_meta.committed_batches(store)
    assert got == want

    # derived state consistent with whatever raw remains
    fsck_mod.rebuild_levels(spark, store)
    rep = fsck_mod.check_store(spark, store)
    assert rep.ok, (spec, [r for r in rep.levels if not r.ok])
