"""Direct tests for the as-of join tolerance bound (operators/asof.py):
both directions on a handcrafted frame where the expected matches are
computable by eye, plus the misuse guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators.asof import (
    asof_self_join_backward,
    asof_self_join_forward,
)

ROWS = [
    # (event_id, user, ts, type, value)
    (1, "u1", 100, "click", 1.0),
    (2, "u1", 500, "purchase", 10.0),  # gap 400 from click@100
    (3, "u1", 510, "click", 2.0),
    (4, "u1", 520, "purchase", 20.0),  # gap 10 from click@510
    (5, "u2", 50, "purchase", 30.0),  # no prior click at all
    (6, "u2", 60, "click", 3.0),  # forward match for purchase@50, gap 10
]
SCHEMA = "event_id long, user_id string, ts_ns long, event_type string, value double"


def _src(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _run(spark, fn, tolerance):
    kwargs = dict(
        by=["user_id"],
        ts_col="ts_ns",
        probe_pred=F.col("event_type") == "purchase",
        ref_pred=F.col("event_type") == "click",
        right_payload={"m_ts": "ts_ns", "m_val": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns"],
    )
    if tolerance is not None:
        kwargs.update(tolerance_ns=tolerance, payload_ts="m_ts")
    out = fn(_src(spark), **kwargs)
    return {r["event_id"]: (r["m_ts"], r["m_val"]) for r in out.collect()}


def test_backward_tolerance_nullifies_stale_match(spark):
    # unbounded: purchase@500 matches click@100 (gap 400)
    assert _run(spark, asof_self_join_backward, None) == {
        2: (100, 1.0),
        4: (510, 2.0),
        5: (None, None),
    }
    # tolerance 50: the gap-400 match is nullified, the gap-10 one stays
    assert _run(spark, asof_self_join_backward, 50) == {
        2: (None, None),
        4: (510, 2.0),
        5: (None, None),
    }


def test_forward_tolerance_nullifies_far_match(spark):
    # unbounded forward: each purchase takes the next click at-or-after it
    assert _run(spark, asof_self_join_forward, None) == {
        2: (510, 2.0),  # gap 10 forward
        4: (None, None),  # no later click for u1
        5: (60, 3.0),  # gap 10 forward
    }
    # tolerance 5: both gap-10 forward matches are nullified
    assert _run(spark, asof_self_join_forward, 5) == {
        2: (None, None),
        4: (None, None),
        5: (None, None),
    }


def test_tolerance_requires_payload_ts(spark):
    with pytest.raises(ValueError, match="payload_ts"):
        asof_self_join_backward(
            _src(spark),
            by=["user_id"],
            ts_col="ts_ns",
            probe_pred=F.col("event_type") == "purchase",
            ref_pred=F.col("event_type") == "click",
            right_payload={"m_ts": "ts_ns"},
            order_col="event_id",
            probe_cols=["event_id"],
            tolerance_ns=10,
        ).collect()
