"""Hypothesis property tests for the custom semantics (SURVEY §5.3).

The engine-defined pieces — the monotonic high-watermark, the Aggregate
record's mergeability, the level router — are checked against tiny pure-
Python reference implementations on random inputs. Spark jobs are kept to
one per example batch (lists are small) to stay fast.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from metricq_db_hta_spark.operators import ingest
from metricq_db_hta_spark.operators.hta import DEFAULT_FACTOR
from metricq_db_hta_spark.plans.history import choose_level

# -- pure-Python reference for A3 -------------------------------------------


def ref_monotonic(rows):
    """rows: [(ts, value)] in arrival order; returns kept indexes."""
    kept, max_ts = [], None
    for i, (ts, value) in enumerate(rows):
        if math.isnan(value) or math.isinf(value):
            continue
        if max_ts is not None and ts <= max_ts:
            continue
        kept.append(i)
        max_ts = ts
    return kept


sample_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=32),
            st.just(float("nan")),
        ),
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=30, deadline=None)
@given(rows=sample_lists)
def test_ingest_chain_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [("m", ts, v, i) for i, (ts, v) in enumerate(rows)],
        "metric string, ts_ns long, value double, event_id long",
    )
    kept = (
        ingest.ingest_batch(df)
        .select("event_id")
        .toPandas()["event_id"]
        .tolist()
        if rows
        else []
    )
    assert sorted(kept) == ref_monotonic(rows)


@settings(max_examples=200, deadline=None)
@given(
    interval_min=st.integers(min_value=1, max_value=10**12),
    n_levels=st.integers(min_value=1, max_value=8),
    interval_max=st.integers(min_value=0, max_value=10**15),
)
def test_level_router_properties(interval_min, n_levels, interval_max):
    widths = [interval_min * DEFAULT_FACTOR**k for k in range(n_levels)]
    chosen = choose_level(widths, interval_max)
    if chosen is None:
        # raw fallthrough iff even the finest level is too coarse
        assert interval_max < widths[0]
    else:
        assert chosen in widths
        assert chosen <= interval_max
        # coarsest eligible: no wider level also fits
        assert all(w > interval_max for w in widths if w > chosen)


def test_merge_is_associative_python():
    """The Aggregate record merge (min/max/sum/count/integral/active_time
    pointwise) is associative and commutative — checked exhaustively on a
    small algebra, which is the property Spark's partial/final aggregation
    and the streaming incremental merge rely on."""
    import itertools

    def merge(a, b):
        return (
            min(a[0], b[0]),
            max(a[1], b[1]),
            a[2] + b[2],
            a[3] + b[3],
            a[4] + b[4],
            a[5] + b[5],
        )

    recs = [
        (0.5, 2.0, 5, 3, 100, 60),
        (-1.0, 1.0, 2, 1, 40, 10),
        (0.0, 9.0, 11, 4, 260, 200),
    ]
    for a, b, c in itertools.permutations(recs):
        assert merge(merge(a, b), c) == merge(a, merge(b, c))
        assert merge(a, b) == merge(b, a)
