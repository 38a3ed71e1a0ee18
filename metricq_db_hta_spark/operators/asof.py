"""As-of join (time-series alignment) — SURVEY §2 Part B.

Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). Rather
than a Pandas ``merge_asof`` UDF, this implements the *union trick*, which
stays entirely JVM-side and scales like any single window:

  1. union left (probe) and right (reference) rows, tagged;
  2. one window per join key, ordered by (ts, tag) — reference rows sort
     before probe rows at equal timestamps so an exact-tie reference row is
     visible to the probe (backward/inclusive semantics, matching
     ``ASOF JOIN ... ON l.ts >= r.ts``);
  3. ``last(<right payload>, ignorenulls=True)`` over the running frame
     picks the most recent reference row at-or-before each probe row;
  4. keep probe rows.

Cost: ONE shuffle on the join key (same as a sort-merge join would need),
no broadcast, no Python. Skewed keys behave like any skewed window — salt
the key upstream if one entity dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``ts_col`` <= left's ``ts_col`` within the same ``by`` group
    (NULLs when none exists — left-outer semantics).

    ``right_payload`` columns must not collide with left column names.
    ``tiebreak`` (a right column) makes the choice deterministic if the
    right side can contain duplicate (by, ts) rows.
    """
    payload = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        *by, F.col(ts_col).alias(ts_col), payload.alias("__payload")
    ).withColumn("__tag", F.lit(0))
    l = left.withColumn("__payload", F.lit(None).cast(r.schema["__payload"].dataType))
    l = l.withColumn("__tag", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts_col).asc(), F.col("__tag").asc()]
    if tiebreak is not None:
        # orders duplicate-(by, ts) right rows; left rows have a NULL
        # payload and are unaffected
        order.append(F.col("__payload").getField(tiebreak).asc_nulls_first())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = u.filter(F.col("__tag") == 1).select(
        *[c for c in left.columns],
        *[F.col("__match").getField(c).alias(c) for c in right_payload],
    )
    return out


def asof_self_join_backward(
    source: DataFrame,
    by: list[str],
    ts_col: str,
    probe_pred,
    ref_pred,
    right_payload: dict[str, str],
    order_col: str,
    probe_cols: list[str],
    tolerance_ns: int | None = None,
    payload_ts: str | None = None,
) -> DataFrame:
    """As-of join where probe and reference rows come from the SAME source
    (the common event-stream case: align purchases to the latest prior
    click). Semantically equal to filtering two sides and calling
    :func:`asof_join_backward` with the reference deduped per ``(by, ts)``
    to its greatest ``order_col`` row — but ONE scan, ONE shuffle, and
    since r16 ONE window:

      Exchange(by) -> sort(ts, tag, order asc) -> running last(payload)
      -> probes.

    The r15 form ran a separate lag-window dedup of equal-``(by, ts)``
    reference rows before the running last — a second full window pass
    over the partition (guide §2.4: two operations keyed the same way
    should share more than the exchange). The dedup folds into the
    running-last's ORDER instead: with ties broken by ``order_col`` ASC,
    the last non-null payload in frame order at any probe row is exactly
    the greatest-``order_col`` reference among the equal-greatest-ts ones
    — the same row the dedup kept. The whole operator is a single
    exchange and a single window pass regardless of scale.

    ``right_payload`` maps output name -> source column for reference
    rows; ``probe_cols`` are the probe columns to keep.

    ``tolerance_ns`` (with ``payload_ts`` naming the payload key that
    carries the reference timestamp) bounds the lookback: a match older
    than ``probe_ts - tolerance_ns`` is nullified — pandas
    ``merge_asof(tolerance=...)`` semantics. Pure post-projection on the
    running-last struct; the plan stays one exchange."""
    tag = F.when(ref_pred, F.lit(0)).otherwise(F.lit(1))
    pay = F.when(
        ref_pred,
        F.struct(*[F.col(s).alias(t) for t, s in right_payload.items()]),
    )
    u = (
        source.filter(probe_pred | ref_pred)
        .withColumn("__tag", tag)
        .withColumn("__payload", pay)
    )
    # order_col ASC makes the running last() do the equal-(by, ts) dedup:
    # among reference rows tied on ts, the LAST one in frame order — the
    # one the running last(ignorenulls) keeps — is the greatest-order_col
    # row; probe rows at the same ts still sort after every reference
    # (tag 1 > 0), so exact-tie references stay visible (inclusive).
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts_col).asc(), F.col("__tag").asc(), F.col(order_col).asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    if tolerance_ns is not None:
        if payload_ts is None:
            raise ValueError("tolerance_ns requires payload_ts")
        u = u.withColumn(
            "__match",
            F.when(
                F.col(ts_col) - F.col("__match").getField(payload_ts)
                <= F.lit(int(tolerance_ns)),
                F.col("__match"),
            ),
        )
    return u.filter(F.col("__tag") == 1).select(
        *probe_cols,
        *[F.col("__match").getField(t).alias(t) for t in right_payload],
    )


def asof_self_join_forward(
    source: DataFrame,
    by: list[str],
    ts_col: str,
    probe_pred,
    ref_pred,
    right_payload: dict[str, str],
    order_col: str,
    probe_cols: list[str],
    tolerance_ns: int | None = None,
    payload_ts: str | None = None,
) -> DataFrame:
    """Forward (inclusive) mirror of :func:`asof_self_join_backward`: each
    probe row gets the payload of the EARLIEST reference row with
    ``ts >= probe.ts`` in its ``by`` group (``ASOF JOIN ... ON l.ts <=
    r.ts``). Identical machinery with the sort direction flipped — the
    running ``last(ignorenulls)`` over a descending-ts window sees the
    nearest *following* reference; equal-ts reference rows still sort
    before probes (inclusive), and the ``order_col`` ASC tiebreak folds
    the equal-(by, ts) dedup-to-greatest-``order_col`` into the same
    single window pass (see the backward form). Still ONE exchange and
    ONE window on ``by``.
    """
    tag = F.when(ref_pred, F.lit(0)).otherwise(F.lit(1))
    pay = F.when(
        ref_pred,
        F.struct(*[F.col(s).alias(t) for t, s in right_payload.items()]),
    )
    u = (
        source.filter(probe_pred | ref_pred)
        .withColumn("__tag", tag)
        .withColumn("__payload", pay)
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts_col).desc(), F.col("__tag").asc(), F.col(order_col).asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    if tolerance_ns is not None:
        if payload_ts is None:
            raise ValueError("tolerance_ns requires payload_ts")
        # forward: the match sits AT-OR-AFTER the probe, so the gap is
        # match_ts - probe_ts (the backward formula would be negative here
        # and never nullify anything)
        u = u.withColumn(
            "__match",
            F.when(
                F.col("__match").getField(payload_ts) - F.col(ts_col)
                <= F.lit(int(tolerance_ns)),
                F.col("__match"),
            ),
        )
    return u.filter(F.col("__tag") == 1).select(
        *probe_cols,
        *[F.col("__match").getField(t).alias(t) for t in right_payload],
    )
