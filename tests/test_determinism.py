"""Run-to-run determinism: the oracle gate hashes values, so a query that
produces different doubles across executions (float sums under Spark's
nondeterministic partial-merge order, unordered window ties, arbitrary
top-k ties) would pass locally and flake in the driver. Execute the most
float-heavy / tie-prone declared queries twice and require canonically
identical results."""

from __future__ import annotations

import pytest

from metricq_db_hta_spark.oracle import canon_rows
from metricq_db_hta_spark.queries import REGISTRY

RISKY = [
    "rel_q1_pricing_summary",     # decimal-accumulated wide sums
    "hta_level0",                 # integral quantization + decimal sums
    "llm_similarity_topk_brute",  # float ranking with tie-breaks
    "rel_window_moving_agg",      # sliding-frame decimal sums
    "llm_minhash_lsh_pairs",      # hash-bucket join + distinct
    "rel_join_asof",              # window-ordered last() choice
]


@pytest.mark.parametrize("name", RISKY)
def test_query_is_run_to_run_deterministic(name, spark, sf_dir):
    spec = REGISTRY[name]
    df1 = spec.spark(spark, sf_dir)
    r1 = canon_rows(df1.columns, [tuple(r) for r in df1.collect()])
    spark.catalog.clearCache()
    df2 = spec.spark(spark, sf_dir)
    r2 = canon_rows(df2.columns, [tuple(r) for r in df2.collect()])
    assert r1 == r2


# ---------------------------------------------------------------------------
# Text fast path (r8): msum/mavg/dsum accept the expression as SQL text and
# compose one F.expr instead of the Column construction. The two forms must
# stay BIT-identical (the text form is what the hot queries use; the Column
# form is the fallback and the reference semantics). Pinned per expression
# over real data, compared at full double precision via struct packing.
# ---------------------------------------------------------------------------


def test_msum_text_path_bit_identical_to_column_path(spark, sf_dir):
    import struct

    from pyspark.sql import functions as F

    from metricq_db_hta_spark.queries import base
    from metricq_db_hta_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cases = [
        ("l_quantity", F.col("l_quantity")),
        (
            "l_extendedprice * (1 - l_discount)",
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
        ),
        (
            "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        ),
        ("-l_extendedprice", -F.col("l_extendedprice")),
    ]
    for text, col in cases:
        for fn in (base.msum, base.mavg, base.dsum):
            a = li.groupBy("l_returnflag").agg(fn(text).alias("v")).collect()
            b = li.groupBy("l_returnflag").agg(fn(col).alias("v")).collect()
            av = sorted((r["l_returnflag"], struct.pack("d", r["v"]).hex()) for r in a)
            bv = sorted((r["l_returnflag"], struct.pack("d", r["v"]).hex()) for r in b)
            assert av == bv, (fn.__name__, text, av, bv)


def test_helpers_treat_keyword_named_columns_as_columns(spark):
    """r8 ADVICE: _c()'s string->F.expr change must not break bare column
    names that are SQL reserved words — the helpers backtick-quote plain
    identifiers, so a column literally named ``order`` or ``select``
    resolves as a column reference, while operator-bearing strings stay
    SQL expressions."""
    from pyspark.sql import functions as F

    from metricq_db_hta_spark.queries import base

    df = spark.createDataFrame(
        [(1.5, 2, "a"), (2.5, 3, "a"), (4.0, 5, "b")],
        "order double, `select` bigint, grp string",
    )
    got = (
        df.groupBy("grp")
        .agg(
            base.dsum("order").alias("d"),
            base.msum("order").alias("m"),
            base.bsum("select").alias("b"),
            base.dsum("order + select").alias("expr_mix"),
        )
        .orderBy("grp")
        .collect()
    )
    assert [(r["d"], r["m"], r["b"], r["expr_mix"]) for r in got] == [
        (4.0, 4.0, 5, 9.0),
        (4.0, 4.0, 5, 9.0),
    ]
    # r6/md5_bucket go through _c() too
    one = df.select(base.r6("order").alias("r"), base.md5_bucket("select", mod=7).alias("h"))
    assert one.count() == 3
