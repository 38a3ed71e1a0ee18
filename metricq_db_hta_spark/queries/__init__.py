"""Central query registry — single source of truth for the driver contract
(``__spark_entry__.py``), the pytest differential suite, and ``bench.py``.

Every implemented operator from SURVEY.md §2 has one entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB oracle SQL over the pre-registered table views. Column names/types are
aligned between the two by construction (FIXTURES.md §4 contract).
"""

from __future__ import annotations

from metricq_db_hta_spark.queries.base import REGISTRY, QuerySpec

# Importing the domain modules populates REGISTRY via register().
from metricq_db_hta_spark.queries import llm  # noqa: F401
from metricq_db_hta_spark.queries import udf_queries  # noqa: F401
from metricq_db_hta_spark.queries import relational2  # noqa: F401
from metricq_db_hta_spark.queries import hta_queries  # noqa: F401
from metricq_db_hta_spark.queries import relational  # noqa: F401

# Registry order is part of the driver contract: the correctness harness
# records the first 50 entries each round. Round 3 window policy (explicit,
# per round-2 judge/advisor guidance):
#   1. rel_agg_approx_distinct FIRST — the only query that has never had a
#      driver correctness row (r01: no_oracle by design; r02: position 52).
#   2. Every query green only in r01 (the 28 entries rotated out by round 2)
#      regains coverage, so all 79 registry queries are green across r02∪r03.
#   3. Every query whose code path changes this round stays in the window
#      (similarity, multimodal, dedup-cache, stats, rel_q5).
#   4. Remaining slots re-check headline bench queries.
# The 29 rotated-out entries are all green in CORRECTNESS_r02.json.
_WINDOW = [
    # (1) never driver-verified
    "rel_agg_approx_distinct",
    # (2) r01-only green — regain coverage
    "rel_join_asof",
    "rel_agg_distinct",
    "rel_agg_rollup",
    "rel_agg_cube",
    "rel_agg_grouping_sets",
    "rel_agg_conditional",
    "rel_window_rank_topn",
    "rel_window_lag_lead",
    "rel_window_moving_agg",
    "rel_window_range_between",
    "rel_window_ntile",
    "rel_topk",
    "rel_set_union",
    "rel_set_intersect",
    "rel_set_except",
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_math_funcs",
    "rel_json_funcs",
    "rel_subquery_scalar_exists",
    "rel_having",
    "rel_session_window",
    "rel_window_tumbling_native",
    "rel_window_sliding_native",
    "rel_percentiles",
    "rel_pivot",
    "rel_grouping_id",
    "rel_date_arithmetic",
    # (3) modified this round
    "llm_similarity_topk_brute",
    "llm_similarity_topk_ivf",
    "llm_minhash_lsh_pairs",
    "llm_jaccard_blocked_pairs",
    "llm_neardup_clusters",
    "llm_embedding_neardup",
    "llm_multimodal_decode",
    "hta_stats_rates",
    "rel_q5_local_supplier_volume",
    # (4) headline re-checks
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "hta_ingest_chain",
    "hta_level0",
    "hta_level1_rollup",
    "hta_q1_aggregate_timeline",
    "hta_q3_aggregate",
    "llm_exact_dedup",
    "llm_minhash_signatures",
    "llm_embedding_norms",
    "rel_join_sortmerge",
    "rel_agg_scalar_global",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec"]
