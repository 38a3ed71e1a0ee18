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


def test_word_hits_arith_equals_regexp(spark, sf_dir):
    """The replace-counting twin (_word_hits_arith) must stay
    value-identical to the shipped regexp form — over the fixture corpus
    for every language dictionary AND on the adjacency/empty/NULL edge
    cases (adjacent hits share a separator in the raw text, which is
    exactly what the doubled-space construction must survive). Kept
    although the arith form lost the r10 A/B (0.75 s vs 0.50 s at sf10 —
    allocation churn beats regex cost), so the twin stays an honest
    differential for any future regexp change."""
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for words in (T.STOPWORDS, *T.LANG_DICTS.values()):
        n = (
            docs.select(
                T._word_hits("text", words).alias("a"),
                T._word_hits_arith("text", words).alias("b"),
            )
            .filter("a <> b")
            .count()
        )
        assert n == 0, words

    edge = spark.createDataFrame(
        [
            ("",),
            ("a",),
            ("the a of and in to",),
            ("  a  of  ",),  # empty tokens from double separators
            ("band the theory",),  # substring must not match
            ("to to to to",),  # adjacent repeats share separators
            (None,),
        ],
        "text string",
    )
    rows = edge.select(
        T._word_hits("text", T.STOPWORDS).alias("a"),
        T._word_hits_arith("text", T.STOPWORDS).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in rows), rows
