#!/usr/bin/env python
"""A/B: asof single-window (r16) vs dedup-window + running-last (r15).

Interleaved min-of-N at sf1 (10x replica), identity asserted on the full
result set of rel_join_asof / rel_join_asof_forward. Variant A is the old
two-window form inlined below; variant B is the shipped operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.operators.asof import (
    asof_self_join_backward,
    asof_self_join_forward,
)
from metricq_db_hta_spark.queries.relational import events_df


def old_backward(source, by, ts_col, probe_pred, ref_pred, right_payload,
                 order_col, probe_cols):
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
    w_dedup = Window.partitionBy(*by).orderBy(
        F.col(ts_col).asc(), F.col("__tag").asc(), F.col(order_col).desc()
    )
    dup = (
        (F.col("__tag") == 0)
        & (F.lag("__tag").over(w_dedup) == 0)
        & (F.lag(ts_col).over(w_dedup) == F.col(ts_col))
    )
    u = u.withColumn("__dup", F.coalesce(dup, F.lit(False))).filter(
        ~F.col("__dup")
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    return u.filter(F.col("__tag") == 1).select(
        *probe_cols,
        *[F.col("__match").getField(t).alias(t) for t in right_payload],
    )


def _key(r):
    return tuple((v is None, v) for v in r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big = build_sf1(sf_dir)
    prewarm_files(big)
    spark = get_spark("r16-ab-asof")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # the query's pin
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # static_plan
    ev = events_df(spark, big)
    kw = dict(
        by=["user_id"], ts_col="ts_ns",
        probe_pred=F.col("event_type") == "purchase",
        ref_pred=F.col("event_type") == "click",
        right_payload={"click_ts_ns": "ts_ns", "click_value": "value"},
        order_col="event_id",
        probe_cols=["event_id", "user_id", "ts_ns", "value"],
    )
    variants = {
        "A(two-window)": lambda: old_backward(ev, **kw),
        "B(one-window)": lambda: asof_self_join_backward(ev, **kw),
    }
    rows = {}
    for name, build in variants.items():
        rows[name] = sorted(_key(r) for r in build().collect())
    if rows["A(two-window)"] != rows["B(one-window)"]:
        raise AssertionError("IDENTITY MISMATCH")  # survives python -O
    n = len(rows["A(two-window)"])
    print(f"identity OK on {n} rows")

    for sweep in range(2):
        for name, build in variants.items():
            times = []
            for _ in range(4):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().toArrow()
                times.append(time.perf_counter() - t0)
            print(f"sweep{sweep} {name}: min={min(times):.3f} "
                  f"all={[round(t, 3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
