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
