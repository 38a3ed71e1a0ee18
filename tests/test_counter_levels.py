"""Counter level family (r11): the stored ``prev_value`` column and the
``counter_<w>`` mergeable level tables it enables.

Invariants pinned here:
* raw's ``prev_value`` equals a full-raw per-metric lag of ``value`` —
  the stateful filter's incremental computation matches the global
  window semantics across chunk/microbatch boundaries;
* the maintained ``counter_<w>`` tables equal an independent recompute
  from raw (``counter_level_recomputed``, lag-window form);
* rolling up the finest counter level equals computing the coarser
  level directly (the additivity the attribution rule buys);
* backfill and stream-after-backfill seams carry the counter baseline
  (a metric's first new sample measures against the stored last value).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import hta
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

import pytest
# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

W1 = 24 * W0


def _assert_df_equal(a, b, keys):
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, (a.columns, b.columns)
    a, b = a.select(*cols), b.select(*cols)
    diff = a.exceptAll(b).unionAll(b.exceptAll(a))
    rows = diff.limit(5).collect()
    assert not rows, f"dataframes differ on {keys}: {rows}"


def _chunks(spark, sf_dir, tmp_path, n=3, limit=600):
    src = samples(spark, sf_dir).orderBy("event_id").limit(limit)
    rows = src.collect()
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    per = len(rows) // n
    for i in range(n):
        chunk = rows[i * per : (i + 1) * per if i < n - 1 else len(rows)]
        spark.createDataFrame(chunk, schema=src.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(str(input_dir / f"chunk{i}"))
    return str(input_dir), src


def test_prev_value_equals_raw_lag(spark, sf_dir, tmp_path):
    input_dir, _ = _chunks(spark, sf_dir, tmp_path)
    store = str(tmp_path / "store")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)

    raw = spark.read.parquet(svc.raw_path)
    w = Window.partitionBy("metric").orderBy("ts_ns")
    expect = raw.select(
        "metric", "ts_ns", F.lag("value", 1).over(w).alias("prev_value")
    )
    got = raw.select("metric", "ts_ns", "prev_value")
    _assert_df_equal(got, expect, "prev_value vs full-raw lag")


def test_counter_levels_match_recompute_and_rollup(spark, sf_dir, tmp_path):
    input_dir, _ = _chunks(spark, sf_dir, tmp_path)
    store = str(tmp_path / "store")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0, W1)
    )
    svc.run_until_drained(input_dir)

    raw = spark.read.parquet(svc.raw_path)
    c0 = spark.read.parquet(svc.counter_path(W0)).drop("bucket_month")
    c1 = spark.read.parquet(svc.counter_path(W1)).drop("bucket_month")

    _assert_df_equal(
        c0, hta.counter_level_recomputed(raw, W0), "counter_0 vs recompute"
    )
    _assert_df_equal(
        c1, hta.counter_level_recomputed(raw, W1), "counter_1 vs recompute"
    )
    # mergeability: rollup of the stored finest level == stored coarse
    _assert_df_equal(c1, hta.counter_rollup(c0, W1), "rollup property")


def test_backfill_carries_counter_baseline(spark, sf_dir, tmp_path):
    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    rows = src.collect()
    half = len(rows) // 2
    first = spark.createDataFrame(rows[:half], schema=src.schema)
    second = spark.createDataFrame(rows[half:], schema=src.schema)

    store = str(tmp_path / "store_bf")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    )
    svc.backfill(first)
    svc.backfill(second)

    raw = spark.read.parquet(svc.raw_path)
    w = Window.partitionBy("metric").orderBy("ts_ns")
    expect = raw.select(
        "metric", "ts_ns", F.lag("value", 1).over(w).alias("prev_value")
    )
    _assert_df_equal(
        raw.select("metric", "ts_ns", "prev_value"),
        expect,
        "backfill-seam prev_value",
    )
    c0 = spark.read.parquet(svc.counter_path(W0)).drop("bucket_month")
    _assert_df_equal(
        c0, hta.counter_level_recomputed(raw, W0), "counter after 2 backfills"
    )


def test_counter_rate_leveled_equals_raw_form(spark, sf_dir, tmp_path):
    """The leveled counter_rate decomposition (interior from stored
    counter_<w> rows, edges from bounded raw slices) must be bit-equal to
    the range-pruned raw scan, across aligned/unaligned starts and ends
    and at both the maintained width and a coarser multiple."""
    from metricq_db_hta_spark.plans.serve import build_history_service

    src = samples(spark, sf_dir).orderBy("event_id").limit(2_000)
    store = str(tmp_path / "store_lvl")
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    ).backfill(src)

    svc = build_history_service(spark, store)
    counter = spark.read.parquet(f"{store}/counter_{W0}")
    ts = [
        r[0]
        for r in spark.read.parquet(f"{store}/raw")
        .filter("metric = 'click'")
        .select("ts_ns")
        .orderBy("ts_ns")
        .collect()
    ]
    lo, hi = ts[0], ts[-1]
    cases = [
        # (start, end, width): aligned, unaligned both sides, coarse width
        (lo - lo % W0, (hi // W0 + 1) * W0, W0),
        (lo + 12_345, hi - 54_321, W0),
        (lo + 7, hi + 1, 6 * W0),
        # start far before the first sample (empty lead gap -> fb via
        # the level-table min, not the head slice)
        (lo - 5 * W0 - 3, hi - 1, W0),
    ]
    # an EMPTY range whose candidate level bucket straddles `end` (every
    # sample of the first non-empty bucket lies at-or-after it): the
    # leveled path must return empty, not crash on a NULL first_ts
    for a, b in zip(ts, ts[1:]):
        if b - b % W0 > a:  # consecutive samples in different buckets
            cases.append((a + 1, b, W0))
            break
    for start, end, width in cases:
        raw_form = svc.counter_rate_timeline("click", start, end, width)
        lvl_form = svc.counter_rate_timeline_leveled(
            counter, W0, "click", start, end, width
        )
        _assert_df_equal(
            lvl_form, raw_form, f"leveled vs raw ({start},{end},{width})"
        )


def test_stream_after_backfill_seeds_baseline(spark, sf_dir, tmp_path):
    """A fresh checkpoint over a backfilled store: the first streamed
    sample of each metric must take its prev_value from the STORE's last
    value (the store_lastv seed), not NULL."""
    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    rows = src.collect()
    half = len(rows) // 2
    first = spark.createDataFrame(rows[:half], schema=src.schema)

    store = str(tmp_path / "store_seed")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    )
    svc.backfill(first)

    input_dir = tmp_path / "in_seed"
    input_dir.mkdir()
    spark.createDataFrame(rows[half:], schema=src.schema).coalesce(
        1
    ).write.mode("overwrite").parquet(str(input_dir / "chunk"))
    svc.run_until_drained(str(input_dir))

    raw = spark.read.parquet(svc.raw_path)
    w = Window.partitionBy("metric").orderBy("ts_ns")
    expect = raw.select(
        "metric", "ts_ns", F.lag("value", 1).over(w).alias("prev_value")
    )
    _assert_df_equal(
        raw.select("metric", "ts_ns", "prev_value"),
        expect,
        "stream-after-backfill prev_value seam",
    )
    c0 = spark.read.parquet(svc.counter_path(W0)).drop("bucket_month")
    _assert_df_equal(
        c0,
        hta.counter_level_recomputed(raw, W0),
        "counter across the backfill->stream seam",
    )


def test_counter_rate_pattern_serves_fleet_merge(spark, sf_dir, tmp_path):
    """serve counter_rate + pattern: the fleet timeline equals the
    per-metric raw recomputes summed per bucket (per-metric baselines and
    resets preserved); metric and pattern are mutually exclusive."""
    from metricq_db_hta_spark.plans.serve import HistoryServer

    src = samples(spark, sf_dir).orderBy("event_id").limit(1_000)
    store = str(tmp_path / "store_fleet")
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    ).backfill(src)

    srv = HistoryServer(spark, store, [W0])
    resp = srv.handle(
        {"type": "counter_rate", "pattern": "*", "width_ns": W0}
    )
    assert "error" not in resp and resp["n"] > 0

    # ground truth: per-metric counter_increase over raw, merged
    raw = spark.read.parquet(f"{store}/raw")
    inc = hta.counter_increase(raw.select("metric", "ts_ns", "value"))
    want = {
        r["b"]: r
        for r in inc.groupBy(
            (F.col("ts_ns") - F.col("ts_ns") % W0).alias("b")
        )
        .agg(
            F.round(
                F.sum(F.col("increase").cast("decimal(38,6)")), 6
            ).cast("double").alias("increase"),
            F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
            .cast("long")
            .alias("n_resets"),
            F.count_distinct("metric").alias("n_metrics"),
        )
        .collect()
    }
    assert resp["n"] == len(want)
    for row in resp["rows"]:
        w = want[row["bucket_start_ns"]]
        assert row["metric"] == "*"
        if w["increase"] is None:
            assert row["increase"] is None
        else:
            assert abs(float(row["increase"]) - w["increase"]) < 1e-6, row
        assert row["n_resets"] == w["n_resets"]
        assert row["n_metrics"] == w["n_metrics"]

    # exactly-one-of guard
    assert "error" in srv.handle({"type": "counter_rate"})
    assert "error" in srv.handle(
        {"type": "counter_rate", "metric": "click", "pattern": "*"}
    )


def test_counter_rate_stored_attribution_live(spark, sf_dir, tmp_path):
    """attribution=stored on a live store: every bucket equals a direct
    groupBy of the stored per-sample increases over the range (no
    first-in-range baseline), across aligned and unaligned ranges."""
    from metricq_db_hta_spark.plans.serve import build_history_service

    src = samples(spark, sf_dir).orderBy("event_id").limit(2_000)
    store = str(tmp_path / "store_stored")
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    ).backfill(src)

    svc = build_history_service(spark, store)
    counter = spark.read.parquet(f"{store}/counter_{W0}")
    raw = spark.read.parquet(f"{store}/raw")
    ts = [
        r[0]
        for r in raw.filter("metric = 'click'")
        .select("ts_ns").orderBy("ts_ns").collect()
    ]
    lo, hi = ts[0], ts[-1]
    for start, end, width in [
        (lo - lo % W0, (hi // W0 + 1) * W0, W0),
        (lo + 11, hi - 17, W0),
        (lo + 3, hi + 1, 6 * W0),
    ]:
        got, gaps = svc.counter_rate_timeline_stored(
            counter, W0, "click", start, end, width
        )
        assert gaps == []
        want = (
            hta.counter_increase_stored(
                raw.filter(
                    (F.col("metric") == "click")
                    & (F.col("ts_ns") >= start)
                    & (F.col("ts_ns") < end)
                ).select("metric", "ts_ns", "value", "prev_value")
            )
            .groupBy(
                "metric",
                (F.col("ts_ns") - F.col("ts_ns") % width).alias(
                    "bucket_start_ns"
                ),
            )
            .agg(
                F.round(
                    F.sum(F.col("increase").cast("decimal(38,6)")), 6
                ).cast("double").alias("increase"),
                F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
                .cast("long")
                .alias("n_resets"),
                F.round(
                    F.sum(F.col("increase").cast("decimal(38,6)"))
                    .cast("double") / F.lit(width / 1e9),
                    6,
                ).alias("rate_per_s"),
            )
        )
        _assert_df_equal(got, want, f"stored attribution ({start},{end},{width})")


def test_counter_rate_stored_survives_raw_expiry(spark, sf_dir, tmp_path):
    """The tiered-counter contract: after raw expires, bucket-aligned
    counter history is STILL served exactly from the retained counter
    levels under attribution=stored (equal to the pre-expiry answer),
    and an unaligned start below the raw floor is reported as an
    uncovered gap, never approximated."""
    from metricq_db_hta_spark.operators.retention import (
        RetentionPolicy, expire,
    )
    from metricq_db_hta_spark.plans.serve import HistoryServer

    # thin by event_id modulus instead of limit(): a prefix of a denser
    # fixture (sf0.01) spans under one day, putting the day-aligned
    # expiry floor AT the data start (r12 soak finding) — the modulus
    # keeps ~2k rows spread over the fixture's FULL time range at any sf
    all_src = samples(spark, sf_dir)
    k = max(1, all_src.count() // 2_000)
    src = all_src.filter(F.col("event_id") % k == 0)
    store = str(tmp_path / "store_tiered_counter")
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,),
        raw_partition="day",  # day-grain expiry: the floor lands mid-data
    ).backfill(src)

    raw = spark.read.parquet(f"{store}/raw")
    ts = [
        r[0] for r in raw.select("ts_ns").orderBy("ts_ns").collect()
    ]
    lo, hi = ts[0], ts[-1]
    start = lo - lo % W0          # aligned: fully servable from levels
    end = (lo + (hi - lo) // 3) // W0 * W0

    req = {
        "type": "counter_rate", "metric": "click", "width_ns": W0,
        "start_ns": start, "end_ns": end, "attribution": "stored",
    }
    srv = HistoryServer(spark, store, [W0])
    before = srv.handle(req)
    assert "error" not in before and before["n"] > 0
    # stored responses ALWAYS carry uncovered (possibly empty), matching
    # the tiered response types — one presence check for clients
    assert before["uncovered"] == []
    # fleet baseline captured pre-expiry (range attribution over the
    # FULL aligned range: first-ever samples NULL under both rules)
    full_req = {
        "type": "counter_rate", "pattern": "*", "width_ns": W0,
        "start_ns": lo - lo % W0, "end_ns": (hi // W0 + 1) * W0,
    }
    fleet_before = srv.handle(full_req)
    assert "error" not in fleet_before, fleet_before

    # expire raw up to a floor inside (start, end); keep counter forever
    from metricq_db_hta_spark.operators.retention import retention_floors

    now = hi + 10 * W0
    floor_age = now - (start + (end - start) // 2)
    expire(
        store,
        RetentionPolicy(raw_max_age_ns=floor_age),
        now_ns=now,
    )
    floor = retention_floors(store)["raw"]  # day-aligned advertised floor
    assert floor > start, "fixture data must span multiple days"
    srv2 = HistoryServer(spark, store, [W0])
    after = srv2.handle(req)
    assert "error" not in after, after
    # aligned request: identical rows, before and after expiry — the
    # counter levels serve the expired era exactly
    assert after["rows"] == before["rows"]

    # unaligned start below the floor: the sliver is an uncovered gap
    probe = floor - W0 + 7
    resp = srv2.handle(dict(req, start_ns=probe))
    assert "error" not in resp, resp
    assert resp.get("uncovered"), resp.keys()
    g_lo, g_hi = resp["uncovered"][0]
    assert g_lo == probe and g_hi == floor

    # fleet + stored: the merged form also serves the expired era from
    # levels; over a full aligned range it equals the range-attribution
    # fleet form computed BEFORE expiry (every metric's first-ever
    # sample is NULL under both attributions when the range covers all
    # history)
    fleet_after = srv2.handle(dict(full_req, attribution="stored"))
    assert "error" not in fleet_after, fleet_after
    assert fleet_after["rows"] == fleet_before["rows"]

    # guard: stored without counter tables
    store2 = str(tmp_path / "store_nocounter")
    StreamingIngest(spark, store2, level_widths_ns=(W0,)).backfill(
        src.limit(100)
    )
    srv3 = HistoryServer(spark, store2, [W0])
    r = srv3.handle(dict(req, start_ns=0))
    assert "error" in r and "counter_" in r["error"]


def test_recover_repairs_torn_counter_state(spark, sf_dir, tmp_path):
    """A6 durability extends to the counter family: a crash between the
    raw write and the commit leaves counter partitions torn; recover()
    recomputes the uncommitted batch's touched counter partitions from
    raw (whose rows carry prev_value, so the repair needs no raw-wide
    window)."""
    import datetime as _dt
    import glob as _glob
    import os

    from metricq_db_hta_spark.streaming.ingest_stream import _ns_to_month

    src = samples(spark, sf_dir).orderBy("event_id").limit(400)
    store = str(tmp_path / "store_rec_counter")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    )
    svc.backfill(src)
    assert svc.recover() == set()

    agg = src.filter(F.col("metric") == "click").agg(
        F.max("ts_ns"), F.max_by("value", "ts_ns")
    ).collect()[0]
    click_max, click_lastv = agg[0], agg[1]
    max_ts = src.agg(F.max("ts_ns")).collect()[0][0]
    rows, prev_ts, prev_v = [], click_max, click_lastv
    for i in range(50):
        ts = max_ts + (i + 1) * 1_000_000_000
        rows.append(("click", ts, float(i), 900_000 + i, ts - prev_ts, prev_v))
        prev_ts, prev_v = ts, float(i)
    extra = spark.createDataFrame(
        rows,
        ["metric", "ts_ns", "value", "event_id", "delta_ns", "prev_value"],
    )
    (
        extra.withColumn("ts_month", _ns_to_month(F.col("ts_ns")))
        .withColumn("ingest_batch", F.lit(-99))
        .write.mode("append")
        .partitionBy("ingest_batch", "metric", "ts_month")
        .parquet(svc.raw_path)
    )
    month = _dt.datetime.fromtimestamp(
        (max_ts + 1_000_000_000) / 1e9, _dt.timezone.utc
    ).strftime("%Y-%m-01")
    victim = _glob.glob(
        os.path.join(
            svc.counter_path(W0),
            "metric=click",
            f"bucket_month={month}",
            "*.parquet",
        )
    )
    assert victim
    os.remove(victim[0])

    assert svc.recover() == {-99}
    raw = spark.read.parquet(svc.raw_path)
    c0 = spark.read.parquet(svc.counter_path(W0)).drop("bucket_month")
    _assert_df_equal(
        c0,
        hta.counter_level_recomputed(raw, W0),
        "counter table after recover()",
    )


def test_counter_coverage_guard_on_late_enablement(spark, sf_dir, tmp_path):
    """Counter levels enabled on a store with PRE-EXISTING raw (r11
    ADVICE medium): pre-enablement months have raw but no counter rows.
    The serve router must not serve those months from level rows —
    plain counter_rate falls back to the raw scan (answer unchanged),
    attribution=stored reports the months as ``uncovered`` — and
    ``fsck.rebuild_levels`` heals both, restoring the leveled fast
    path."""
    from metricq_db_hta_spark.operators.fsck import rebuild_levels
    from metricq_db_hta_spark.plans.serve import (
        HistoryServer,
        build_history_service,
    )
    from metricq_db_hta_spark.streaming import store_meta

    src = samples(spark, sf_dir).orderBy("event_id").limit(1_200)
    rows = src.collect()
    half = len(rows) // 2
    early = spark.createDataFrame(rows[:half], schema=src.schema)
    # the testdata spans one month; shift the post-enablement half two
    # months out so enablement is a month-set boundary, not a same-month
    # touch (a touched month recomputes WHOLLY, leaving no gap)
    shift = 60 * 86_400 * 1_000_000_000
    late = spark.createDataFrame(rows[half:], schema=src.schema).withColumn(
        "ts_ns", (F.col("ts_ns") + F.lit(shift)).cast("long")
    )

    store = str(tmp_path / "store_late_enable")
    StreamingIngest(spark, store, level_widths_ns=(W0,)).backfill(early)
    StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,)
    ).backfill(late)

    gaps = store_meta.counter_coverage_gaps(store, W0)
    assert gaps, "pre-enablement months must show as coverage gaps"
    assert "click" in gaps

    ts = sorted(
        r[0]
        for r in spark.read.parquet(f"{store}/raw")
        .filter("metric = 'click'")
        .select("ts_ns")
        .collect()
    )
    lo, hi = ts[0], ts[-1]
    start, end = lo - lo % W0, (hi // W0 + 1) * W0

    srv = HistoryServer(spark, store, [W0])
    svc = build_history_service(spark, store)
    want = [
        r.asDict()
        for r in svc.counter_rate_timeline("click", start, end, W0)
        .limit(10_000)
        .collect()
    ]
    got = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": W0,
            "start_ns": start, "end_ns": end, "limit": 10_000,
        }
    )
    assert "error" not in got, got
    assert got["rows"] == want, "guard must fall back to the raw answer"

    # a request confined to the POST-enablement era keeps the leveled
    # fast path (no gap intersects it) and still matches raw
    lo2 = min(t for t in ts if t >= lo + shift // 2)
    s2, e2 = lo2 - lo2 % W0, end
    assert not srv._coverage_spans(srv._state, W0, "click", None, s2, e2)
    got2 = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": W0,
            "start_ns": s2, "end_ns": e2, "limit": 10_000,
        }
    )
    want2 = [
        r.asDict()
        for r in svc.counter_rate_timeline("click", s2, e2, W0)
        .limit(10_000)
        .collect()
    ]
    assert got2["rows"] == want2

    # stored attribution over the full range: the pre-enablement months
    # come back as uncovered spans (clipped to the aligned interior)
    stored = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": W0,
            "start_ns": start, "end_ns": end, "attribution": "stored",
            "limit": 10_000,
        }
    )
    assert "error" not in stored, stored
    assert stored["uncovered"], "enablement hole must be reported"
    (g_lo, g_hi) = stored["uncovered"][0]
    assert g_lo <= lo < g_hi, (g_lo, g_hi, lo)

    # rebuild_levels recomputes the missing partitions from raw; after a
    # refresh the gaps are gone, the leveled path serves the full range
    # bit-equal to raw, and stored reports no uncovered spans
    rebuild_levels(spark, store)
    srv.handle({"type": "refresh"})
    assert not store_meta.counter_coverage_gaps(store, W0)
    healed = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": W0,
            "start_ns": start, "end_ns": end, "limit": 10_000,
        }
    )
    assert healed["rows"] == want
    stored2 = srv.handle(
        {
            "type": "counter_rate", "metric": "click", "width_ns": W0,
            "start_ns": start, "end_ns": end, "attribution": "stored",
            "limit": 10_000,
        }
    )
    assert stored2["uncovered"] == []


def test_rebuild_levels_preserves_stored_counter_chain(
    spark, sf_dir, tmp_path
):
    """rebuild_levels must repair counter tables LOSSLESSLY where raw
    still holds the truth (r12 review): a metric's first in-scope sample
    carries its true predecessor in the stored prev_value column (here: a
    backfill seam two months back), so the rebuilt bucket keeps the
    cross-seam increase instead of being nulled by a scope-bounded lag.
    Bit-equal to the cascade-written table, and fsck stays green."""
    from metricq_db_hta_spark import operators
    from metricq_db_hta_spark.operators.fsck import check_store, rebuild_levels
    from metricq_db_hta_spark.operators.retention import (
        RetentionPolicy,
        expire,
        retention_floors,
    )

    src = samples(spark, sf_dir).orderBy("event_id").limit(800)
    rows = src.collect()
    half = len(rows) // 2
    early = spark.createDataFrame(rows[:half], schema=src.schema)
    shift = 60 * 86_400 * 1_000_000_000
    late = spark.createDataFrame(rows[half:], schema=src.schema).withColumn(
        "ts_ns", (F.col("ts_ns") + F.lit(shift)).cast("long")
    )
    store = str(tmp_path / "store_rebuild_chain")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), counter_widths_ns=(W0,),
        raw_partition="day",
    )
    svc.backfill(early)
    svc.backfill(late)  # seam: late's first sample per metric measures
    #                      against early's stored last value

    # retention floor INSIDE month 1: rebuild scope starts at month 2,
    # where the first in-scope rows' predecessors live below scope
    ts = sorted(r[0] for r in spark.read.parquet(f"{store}/raw").select("ts_ns").collect())
    lo, hi = ts[0], ts[-1]
    now = hi + 10 * W0
    expire(
        store, RetentionPolicy(raw_max_age_ns=now - (lo + 3 * 86_400 * 10**9)),
        now_ns=now,
    )
    assert retention_floors(store)["raw"] > lo

    def snap():
        return {
            (r["metric"], r["bucket_start_ns"]): (
                r["increase_sum"], r["n_resets"]
            )
            for r in spark.read.parquet(f"{store}/counter_{W0}")
            .drop("bucket_month")
            .collect()
        }

    want = snap()
    rebuild_levels(spark, store)
    got = snap()
    assert got == want, "rebuild changed the stored counter chain"
    assert check_store(spark, store).ok
