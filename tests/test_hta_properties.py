"""Property checks for the HTA core (SURVEY.md §5.3):

(a) mergeability — level k re-aggregated equals level k+1 built from raw;
(b) Q1 row counts bounded by range/width + 1 per metric;
(c) ingest idempotence — re-delivering data changes nothing (monotonic
    filter drops every duplicate);
(d) invalid samples (NaN/Inf) never reach storage;
(e) level-router boundary behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import hta, ingest
from metricq_db_hta_spark.plans.history import choose_level
from metricq_db_hta_spark.queries.hta_queries import (
    END_NS,
    LEVEL_WIDTHS,
    START_NS,
    W0,
    W1,
    samples,
    service,
)


def test_mergeability_levels(spark, sf_dir):
    """level1 built by rolling up level0 == level1 built directly from raw."""
    raw = samples(spark, sf_dir)
    via_rollup = hta.rollup(hta.level0(raw, W0), width_ns=W1)
    direct = hta.level0(raw, W1)
    sym_diff = via_rollup.exceptAll(direct).union(direct.exceptAll(via_rollup))
    assert sym_diff.count() == 0


def test_q1_row_count_bound(spark, sf_dir):
    svc = service(spark, sf_dir)
    rows = svc.aggregate_timeline("click", START_NS, END_NS, W1).count()
    assert rows <= (END_NS - START_NS) // W1 + 1


def test_ingest_idempotence(spark, sf_dir):
    """Re-delivering every chunk is a no-op: the monotonic high-watermark
    drops exact duplicates (reference A3)."""
    raw = samples(spark, sf_dir)
    doubled = raw.union(raw)
    once = ingest.ingest_batch(raw)
    twice = ingest.ingest_batch(doubled)
    assert once.count() == twice.count()


def test_invalid_never_stored(spark, sf_dir):
    base = samples(spark, sf_dir).limit(10)
    bad = base.withColumn("value", F.lit(float("nan"))).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    ).withColumn("ts_ns", F.col("ts_ns") + 1)
    out = ingest.ingest_batch(base.union(bad))
    assert out.filter(F.isnan("value")).count() == 0


def test_monotonic_filter_drops_out_of_order(spark):
    rows = [
        ("m", 100, 1.0, 1),
        ("m", 50, 2.0, 2),   # out of order -> dropped
        ("m", 150, 3.0, 3),
        ("m", 150, 4.0, 4),  # duplicate ts -> dropped
        ("n", 10, 5.0, 5),   # other metric unaffected
    ]
    df = spark.createDataFrame(rows, ["metric", "ts_ns", "value", "event_id"])
    kept = ingest.monotonic_filter(df).select("event_id").toPandas()["event_id"]
    assert sorted(kept) == [1, 3, 5]


@pytest.mark.parametrize(
    "interval_max,expected",
    [
        (W0 - 1, None),            # finer than finest -> raw fallthrough
        (W0, W0),                  # exactly the finest level
        (W1 - 1, W0),
        (W1, W1),                  # exactly a level width
        (LEVEL_WIDTHS[-1] * 100, LEVEL_WIDTHS[-1]),  # coarser than coarsest
    ],
)
def test_level_router_boundaries(interval_max, expected):
    assert choose_level(LEVEL_WIDTHS, interval_max) == expected


def _rows(df):
    return sorted(
        tuple(r) for r in df.collect()
    )


def test_q3_decomposition_equals_finest_only(spark, sf_dir):
    """(f) Q3 level decomposition (reference A9): answering from coarse
    interior + finer edge buckets is BIT-equal to the finest-only scan —
    on the registered range and on random unaligned ranges (edge spans,
    sub-coarse-width spans, empty spans)."""
    import random

    svc = service(spark, sf_dir)
    rnd = random.Random(42)
    span = END_NS - START_NS
    ranges = [(START_NS, END_NS)]
    for _ in range(6):
        s = START_NS + rnd.randrange(-span // 4, span // 2)
        e = s + rnd.randrange(0, span)
        ranges.append((s, e))
    ranges.append((START_NS + 17, START_NS + 17))        # empty
    ranges.append((START_NS + 1, START_NS + W0 // 2))    # sub-bucket span
    for s, e in ranges:
        dec = _rows(svc.aggregate(None, s, e, decompose=True))
        fin = _rows(svc.aggregate(None, s, e, decompose=False))
        assert dec == fin, (s, e)


def test_q3_auto_router_picks_plan_by_span(spark, sf_dir):
    """decompose='auto' (the default) is a cost-based router: a short
    range (the 15-day registered window, 360 finest buckets) must take
    the single finest-level scan — decomposing it measurably DOUBLED the
    bench query — while an open-ended range (serve's default) must take
    the O(levels)-row decomposition and touch the coarse tables."""
    from metricq_db_hta_spark.functions.timeutil import TS_MAX_NS

    svc = service(spark, sf_dir)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    short = plan(svc.aggregate(None, START_NS, END_NS))
    assert f"level_{LEVEL_WIDTHS[0]}" in short
    for w in LEVEL_WIDTHS[1:]:
        assert f"level_{w}" not in short, f"short span wrongly decomposed to level_{w}"
    wide = plan(svc.aggregate(None, 0, TS_MAX_NS))
    for w in LEVEL_WIDTHS:
        assert f"level_{w}" in wide, f"open-ended span misses level_{w}"


def test_q3_open_ended_range_does_not_overflow(spark, sf_dir):
    """Regression: serve's default end is TS_MAX_NS = 2^63-1; ceil-aligning
    it to the finest width overflowed int64 and py4j rejected the literal
    (NumberFormatException from Column.lt). The open-ended decomposed scan
    must run and equal the finest-only scan."""
    from metricq_db_hta_spark.functions.timeutil import TS_MAX_NS

    svc = service(spark, sf_dir)
    dec = _rows(svc.aggregate(None, 0, TS_MAX_NS, decompose=True))
    fin = _rows(svc.aggregate(None, 0, TS_MAX_NS, decompose=False))
    assert dec == fin and dec, "open-ended Q3 must return data"


def test_q3_decomposition_reads_coarse_tables(spark, sf_dir):
    """Plan assertion: the decomposed Q3 over the registered (15-day)
    range scans the coarse level stores for the interior — all three
    materialized level_<width> parquet paths appear in the physical plan,
    while the finest-only plan touches only level_<w0>."""
    svc = service(spark, sf_dir)
    dec_plan = svc.aggregate(
        None, START_NS, END_NS, decompose=True
    )._jdf.queryExecution().executedPlan().toString()
    fin_plan = svc.aggregate(
        None, START_NS, END_NS, decompose=False
    )._jdf.queryExecution().executedPlan().toString()
    for w in LEVEL_WIDTHS:
        assert f"level_{w}" in dec_plan, f"decomposed plan misses level_{w}"
    assert f"level_{LEVEL_WIDTHS[0]}" in fin_plan
    for w in LEVEL_WIDTHS[1:]:
        assert f"level_{w}" not in fin_plan


# -- q3_segments: pure decomposition math under hypothesis ------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from metricq_db_hta_spark.plans.history import q3_segments

_W0 = 40_000_000_000  # the reference's 40 s finest width


@settings(max_examples=300, deadline=None)
@given(
    start=st.integers(min_value=-(2**40), max_value=2**62),
    span=st.integers(min_value=0, max_value=2**45),
    n_levels=st.integers(min_value=1, max_value=5),
    factor=st.sampled_from([2, 10]),
)
def test_q3_segments_tile_exactly(start, span, n_levels, factor):
    """The decomposition must tile the covered finest-bucket range
    EXACTLY: segments are disjoint, contiguous, cover [ceil(start), 
    ceil(end)) completely, each segment is aligned to its own width
    (except the TS_MAX cap), and widths come only from the level set.
    Any violation double-counts or drops buckets — a silent wrong
    answer for Q3."""
    widths = [_W0 * factor**k for k in range(n_levels)]
    end = start + span
    segs = q3_segments(start, end, widths)
    a0 = -(-start // _W0) * _W0
    a1 = min(-(-end // _W0) * _W0, (1 << 63) - 1)
    if a0 >= a1:
        assert segs == []
        return
    assert all(w in widths for w, _, _ in segs)
    # per-segment alignment: lo aligned to w; hi aligned unless capped
    for w, lo, hi in segs:
        assert lo % w == 0
        assert hi % w == 0 or hi == (1 << 63) - 1
        assert lo < hi
    # disjoint + contiguous + exact cover of [a0, a1)
    spans = sorted((lo, hi) for _, lo, hi in segs)
    assert spans[0][0] == a0
    assert spans[-1][1] == a1
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 == l2, "gap or overlap between segments"
    # a coarse segment only covers ground an even multiple of finer widths
    # (substitutability): every non-finest segment's span is a whole
    # number of ITS OWN buckets, already implied by alignment above.


# -- q3_segments_tiered: availability-constrained decomposition -------------

from metricq_db_hta_spark.plans.history import q3_segments_tiered


@settings(max_examples=300, deadline=None)
@given(
    start=st.integers(min_value=-(2**40), max_value=2**62),
    span=st.integers(min_value=0, max_value=2**45),
    n_levels=st.integers(min_value=1, max_value=5),
    factor=st.sampled_from([2, 10]),
    floor_units=st.lists(
        st.integers(min_value=0, max_value=2**20), min_size=0, max_size=5
    ),
)
def test_q3_segments_tiered_partitions_exactly(
    start, span, n_levels, factor, floor_units
):
    """The tiered decomposition must partition [a0, a1) EXACTLY into
    segments + gaps (disjoint, contiguous, no loss), with every segment
    entirely at-or-above its level's availability — a violation either
    reads expired (missing) buckets or silently double-counts/drops.
    Floors are arbitrary here (the operator validates tiering separately;
    the math must hold regardless)."""
    widths = [_W0 * factor**k for k in range(n_levels)]
    floors = {
        widths[i]: u * _W0 for i, u in enumerate(floor_units[:n_levels])
    }
    end = start + span
    segs, gaps = q3_segments_tiered(start, end, widths, floors)
    a0 = -(-start // _W0) * _W0
    a1 = min(-(-end // _W0) * _W0, (1 << 63) - 1)
    if a0 >= a1:
        assert segs == [] and gaps == []
        return
    for w, lo, hi in segs:
        assert w in widths and lo < hi and lo % w == 0
        # availability: the whole segment reads only intact buckets
        # (floor <= 0 = never expired = no constraint)
        if floors.get(w, 0) > 0:
            assert lo >= -(-floors[w] // w) * w
    # segments + gaps tile [a0, a1) with no gap-in-the-other-sense
    pieces = sorted(
        [(lo, hi) for _, lo, hi in segs] + [(lo, hi) for lo, hi in gaps]
    )
    assert pieces[0][0] == a0 and pieces[-1][1] == a1
    for (l1, h1), (l2, h2) in zip(pieces, pieces[1:]):
        assert h1 == l2, "hole or overlap in segments+gaps tiling"
    # no floors -> identical to the classic decomposition, zero gaps
    if not any(floors.values()):
        assert segs == q3_segments(start, end, widths) and gaps == []


def test_q3_tiered_equals_finest_over_covered(spark, sf_dir):
    """On un-expired data (every level row still present), the tiered
    merge over its chosen segments must be BIT-equal to a finest-only
    scan over exactly the covered ranges — isolates the multi-level
    substitution math from actual expiry (test_retention.py covers the
    expired-store end-to-end)."""
    import random

    from metricq_db_hta_spark.queries.hta_queries import LEVEL_WIDTHS, W1

    svc = service(spark, sf_dir)
    rnd = random.Random(7)
    span = END_NS - START_NS
    cases = [
        {},  # no retention
        {W0: START_NS + span // 3, W1: START_NS},  # tiered
        {w: END_NS for w in LEVEL_WIDTHS},  # everything expired
    ]
    for _ in range(3):
        cases.append(
            {
                W0: START_NS + rnd.randrange(0, span),
                W1: START_NS + rnd.randrange(-span, span // 2),
            }
        )
    for floors in cases:
        segs, gaps = q3_segments_tiered(
            START_NS, END_NS, LEVEL_WIDTHS, floors
        )
        tiered, rep_gaps = svc.aggregate_tiered(
            None, START_NS, END_NS, floors
        )
        assert rep_gaps == gaps
        finest = svc._merge_segments(
            None, [(W0, lo, hi) for _, lo, hi in segs]
        )
        assert _rows(tiered) == _rows(finest), floors


# -- q1_regions_tiered: mixed-resolution timeline planning ------------------

from metricq_db_hta_spark.plans.history import choose_level, q1_regions_tiered


@settings(max_examples=300, deadline=None)
@given(
    start=st.integers(min_value=-(2**40), max_value=2**62),
    span=st.integers(min_value=0, max_value=2**45),
    n_levels=st.integers(min_value=1, max_value=5),
    factor=st.sampled_from([2, 10]),
    imax_mult=st.sampled_from([0.5, 1, 5, 100, 10**6]),
    floor_units=st.lists(
        st.integers(min_value=0, max_value=2**20), min_size=0, max_size=5
    ),
)
def test_q1_regions_tiered_partition_and_availability(
    start, span, n_levels, factor, imax_mult, floor_units
):
    """The timeline plan must partition [start, end) EXACTLY into regions
    + gaps, use only widths >= the Q1-chosen resolution, keep every
    region on its own width's grid and at-or-above its availability, and
    order resolution monotonically (finer = more recent). Any violation
    double-plots a bucket, silently skips an era, or serves expired
    (missing) buckets."""
    widths = [_W0 * factor**k for k in range(n_levels)]
    floors = {
        widths[i]: u * _W0 for i, u in enumerate(floor_units[:n_levels])
    }
    imax = int(_W0 * imax_mult)
    end = start + span
    regions, gaps = q1_regions_tiered(start, end, widths, floors, imax)
    w_req = choose_level(widths, imax) or widths[0]
    if start >= end:
        assert regions == [] and gaps == []
        return
    prev_w = 0
    prev_hi = end
    for w, lo, hi in regions:  # emitted fine -> coarse = recent -> old
        assert w in widths and w >= w_req
        assert w > prev_w, "each width serves at most one era"
        prev_w = w
        assert lo < hi <= prev_hi
        prev_hi = lo
        assert lo % w == 0, "region must start on its width's grid"
        assert hi % w == 0 or hi == end, (
            "region end aligned (or the request end for the finest era)"
        )
        if floors.get(w, 0) > 0:
            assert lo >= -(-floors[w] // w) * w
    pieces = sorted([(lo, hi) for _, lo, hi in regions] + gaps)
    assert pieces and pieces[0][0] == start and pieces[-1][1] == end
    for (l1, h1), (l2, h2) in zip(pieces, pieces[1:]):
        assert h1 == l2, "hole or overlap in regions+gaps tiling"
    # no retention at all: at most one region, at the requested width
    # (none when the whole span is narrower than one unaligned bucket),
    # and any gap is a sub-bucket alignment sliver
    if not any(floors.values()):
        assert [w for w, _, _ in regions] in ([w_req], [])
        assert all(hi - lo < w_req for lo, hi in gaps)


def test_q1_timeline_tiered_rows_equal_plain_q1_slices(spark, sf_dir):
    """On un-expired data each region's rows must be EXACTLY the plain Q1
    timeline of that width restricted to the region bounds, with the
    width_ns column stamped — the tiered timeline changes which width
    serves an era, never the rows a width serves."""
    from pyspark.sql import functions as F

    from metricq_db_hta_spark.queries.hta_queries import (
        LEVEL_WIDTHS,
        TIER_FLOORS,
        TIER_TL_START_NS,
        W1,
    )

    svc = service(spark, sf_dir)
    for floors in (TIER_FLOORS, {}, {w: END_NS for w in LEVEL_WIDTHS}):
        df, gaps = svc.timeline_tiered(
            None, TIER_TL_START_NS, END_NS, W0, floors
        )
        got = sorted(tuple(r) for r in df.collect())
        from metricq_db_hta_spark.plans.history import q1_regions_tiered

        regions, exp_gaps = q1_regions_tiered(
            TIER_TL_START_NS, END_NS, LEVEL_WIDTHS, floors, W0
        )
        assert gaps == exp_gaps
        expected = []
        for w, lo, hi in regions:
            tl = svc.aggregate_timeline(None, lo, hi, interval_max_ns=w)
            # aggregate_timeline picks the coarsest width <= imax == w
            expected.extend(
                tuple(r)
                for r in tl.withColumn(
                    "width_ns", F.lit(w).cast("long")
                ).select(*df.columns).collect()
            )
        assert got == sorted(expected), floors


# -- fleet pattern aggregate (plans/history.py::aggregate_timeline_pattern) --

from metricq_db_hta_spark.plans.history import glob_to_like


def test_glob_to_like_translation_and_escaping():
    assert glob_to_like("host.*.power") == "host.%.power"
    assert glob_to_like("cpu?") == "cpu_"
    # literal LIKE metacharacters in a metric name must stay literal
    assert glob_to_like("a_b") == "a\\_b"
    assert glob_to_like("a%b") == "a\\%b"
    assert glob_to_like("a\\b*") == "a\\\\b%"


def test_pattern_aggregate_equals_client_side_merge(spark, sf_dir):
    """The pattern timeline must equal what a client of the per-metric API
    computes today: issue one Q1 request per matching metric and merge the
    Aggregate records per bucket (min/max across metrics, sums of the
    additive fields). Exercises a DIFFERENT code path — M single-metric
    timelines collected and merged in Python — against the one-scan
    operator; the DuckDB oracle (hta_pattern_aggregate) is the third leg."""
    from collections import defaultdict

    from metricq_db_hta_spark.queries.hta_queries import (
        END_NS,
        START_NS,
        W0,
        service,
    )

    svc = service(spark, sf_dir)
    got = {
        r["bucket_start_ns"]: r
        for r in svc.aggregate_timeline_pattern(
            "*u*", START_NS, END_NS, 12 * W0
        ).collect()
    }

    merged: dict[int, dict] = defaultdict(
        lambda: {
            "n_metrics": 0, "minimum": None, "maximum": None,
            "sum": 0, "count": 0, "integral": 0, "active_time": 0,
        }
    )
    for metric in ("purchase", "signup"):  # the *u* matches, explicitly
        rows = svc.aggregate_timeline(
            metric, START_NS, END_NS, 12 * W0
        ).collect()
        for r in rows:
            m = merged[r["bucket_start_ns"]]
            m["n_metrics"] += 1
            m["minimum"] = (
                r["minimum"] if m["minimum"] is None
                else min(m["minimum"], r["minimum"])
            )
            m["maximum"] = (
                r["maximum"] if m["maximum"] is None
                else max(m["maximum"], r["maximum"])
            )
            m["sum"] += r["sum"]
            m["count"] += r["count"]
            m["integral"] += r["integral"]
            m["active_time"] += r["active_time"]

    assert set(got) == set(merged) and got
    for b, want in merged.items():
        have = got[b]
        for k in ("n_metrics", "minimum", "maximum", "count",
                  "integral", "active_time"):
            assert have[k] == want[k], (b, k)
        # decimal accumulators on both paths: exact equality holds
        assert have["sum"] == want["sum"], b


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

_GLOB_ALPHABET = list("ab.%_\\*?")


@_settings(max_examples=300, deadline=None)
@_given(
    name=_st.text(alphabet=list("ab.%_\\"), max_size=8),
    pattern=_st.text(alphabet=_GLOB_ALPHABET, max_size=8),
)
def test_glob_match_equals_sql_like_translation(name, pattern):
    """Every pattern surface must agree: the driver-side matcher
    (glob_match — serve list_metrics) and the SQL translation
    (glob_to_like + LIKE...ESCAPE — every other pattern request) are the
    same */? dialect, including literal %, _ and backslash in names."""
    import duckdb

    from metricq_db_hta_spark.plans.history import glob_match, glob_to_like

    like = glob_to_like(pattern).replace("'", "''")
    sql_name = name.replace("'", "''")
    got_sql = duckdb.sql(
        f"SELECT '{sql_name}' LIKE '{like}' ESCAPE '\\'"
    ).fetchone()[0]
    assert glob_match(name, pattern) == bool(got_sql), (name, pattern, like)
