"""NULL-safety contracts for the text functions under Spark 4's ANSI
default (ADVICE r6: size(NULL) is NULL, not -1 — a NULL doc must not
propagate NULL into corpus-level averages while a COALESCEd SQL oracle
counts it as 0.0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricq_db_hta_spark.functions import text as T


def test_repetition_ratio_null_text_is_zero(spark):
    df = spark.createDataFrame(
        [("a a a a",), (None,), ("",), ("one",)], "text string"
    ).select("text", T.repetition_ratio("text").alias("r"))
    got = {r["text"]: r["r"] for r in df.collect()}
    assert got[None] == 0.0  # NULL text: pinned, never NULL
    assert got[""] == 0.0
    assert got["one"] == 0.0  # < 2 tokens
    assert got["a a a a"] == 1.0 - 1.0 / 3.0  # 3 bigram slots, 1 distinct


def test_repetition_ratio_mean_counts_null_docs(spark):
    """The corpus mean divides by COUNT(*) on both engines because the
    ratio is never NULL — the exact divergence ADVICE r6 flagged."""
    df = spark.createDataFrame(
        [("b b b",), (None,)], "text string"
    ).select(T.repetition_ratio("text").alias("r"))
    mean = df.agg(F.avg("r")).collect()[0][0]
    assert mean == (0.5 + 0.0) / 2  # NULL doc participates as 0.0
