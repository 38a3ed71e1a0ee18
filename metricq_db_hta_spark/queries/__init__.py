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
from metricq_db_hta_spark.queries import relational3  # noqa: F401
from metricq_db_hta_spark.queries import llm2  # noqa: F401

# Registry order is part of the driver contract: the correctness harness
# records the first 50 entries each round. Round 11 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) The 18 r8-green queries displaced mid-r10 — named in the r10 (4)/(5)
#     comments and promised to round 11 by VERDICT r10 next-step 2 — all
#     scheduled: hta_q2_flex_raw, hta_q4_last_value, rel_agg_statistical,
#     llm_decontaminate, llm_unigram_logprob, rel_q6_forecast_revenue,
#     rel_q10_returned_items, rel_q18_large_volume_customer,
#     rel_window_lag_lead, udf_apply_in_pandas_zscore,
#     udf_grouped_agg_geomean, rel_window_moving_agg, rel_window_ntile,
#     rel_having, rel_grouping_id, rel_agg_scalar_global,
#     rel_window_rank_topn, rel_window_distribution.
# (2) The two fleet/pattern queries added after the r10 window froze
#     (PENDING_NEXT_WINDOW in r10; diffcheck-green at all three SFs,
#     judge-verified at sf0.01, never driver-checked):
#     hta_pattern_aggregate, hta_pattern_q3.
# (3) hta_counter_rate re-check — r10's one red driver row, fixed this
#     round (the final increase column now casts DECIMAL->DOUBLE on both
#     sides, matching the engine-wide convention).
# (4) hta_counter_serve — NEW this round (serving-path counter_rate over
#     the stored prev_value column, zero-exchange): first driver row.
# (5) The remaining 28 slots rotate r9-green queries (49 candidates,
#     sorted; the first 28 scheduled here, the remaining 21 —
#     rel_join_asof .. udf_udtf_explode_buckets — sit at stale(2) and
#     round 12 MUST schedule them: rel_join_asof, rel_join_asof_forward,
#     rel_join_broadcast_dim, rel_join_bucketed, rel_join_full_outer,
#     rel_join_left_outer, rel_join_range_band, rel_join_semi,
#     rel_join_sortmerge, rel_math_funcs, rel_q1_pricing_summary,
#     rel_q3_shipping_priority, rel_q5_local_supplier_volume,
#     rel_session_window, rel_string_funcs,
#     rel_subquery_correlated_scalar, rel_topk, rel_window_range_between,
#     rel_window_sliding_native, rel_window_tumbling_native,
#     udf_pandas_scalar_normalize, udf_udtf_explode_buckets — plus
#     rel_join_anti, displaced late-r11 by hta_counter_fleet: 22 total).
# (6) hta_counter_fleet — NEW late-r11 (fleet counter merge, the serve
#     counter_rate+pattern twin): first driver row, displacing
#     rel_join_anti from (5).
PENDING_NEXT_WINDOW: list[str] = []
_WINDOW = [
    # (3)+(4): the r10 red row re-check and the round's new serve query
    "hta_counter_rate",
    "hta_counter_serve",
    # (2) never-driver-checked fleet/pattern queries
    "hta_pattern_aggregate",
    "hta_pattern_q3",
    # (1) the 18 displaced r8-green queries (promise kept)
    "hta_q2_flex_raw",
    "hta_q4_last_value",
    "rel_agg_statistical",
    "llm_decontaminate",
    "llm_unigram_logprob",
    "rel_q6_forecast_revenue",
    "rel_q10_returned_items",
    "rel_q18_large_volume_customer",
    "rel_window_lag_lead",
    "udf_apply_in_pandas_zscore",
    "udf_grouped_agg_geomean",
    "rel_window_moving_agg",
    "rel_window_ntile",
    "rel_having",
    "rel_grouping_id",
    "rel_agg_scalar_global",
    "rel_window_rank_topn",
    "rel_window_distribution",
    # (5) r9-green rotation (first 28 of 49, sorted)
    "hta_delta_encode",
    "hta_ingest_chain",
    "hta_level0",
    "hta_metadata_projection",
    "hta_q1_aggregate_timeline",
    "hta_q3_aggregate",
    "hta_scope_boundaries",
    "hta_stats_rates",
    "hta_subscription_list",
    "llm_dataset_split",
    "llm_exact_dedup",
    "llm_lang_id",
    "llm_minhash_jaccard_estimate",
    "llm_minhash_lsh_pairs",
    "llm_quality_filter",
    "llm_repetition_filter",
    "llm_sequence_packing",
    "llm_similarity_recall_ivf",
    "llm_similarity_topk_brute",
    "llm_stratified_sample",
    "llm_token_count",
    "rel_agg_approx_distinct",
    "rel_agg_conditional",
    "rel_agg_cube",
    "rel_agg_distinct",
    "rel_date_arithmetic",
    "rel_date_funcs",
    # (6) late-r11 addition — first driver row
    "hta_counter_fleet",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
