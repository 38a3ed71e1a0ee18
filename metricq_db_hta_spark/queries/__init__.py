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
# records the first 50 entries each round. Round 9 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) llm_minhash_jaccard_estimate drains from PENDING_NEXT_WINDOW and
#     gets its FIRST driver row (VERDICT r8 next-step 1 — the single
#     remaining query with local-oracle evidence only).
# (2) The 8 queries deferred in round 8 (green-since-r6, stale(2)) are
#     scheduled as promised: rel_math_funcs, rel_string_funcs,
#     rel_date_funcs, rel_date_arithmetic, rel_topk,
#     rel_agg_approx_distinct, rel_agg_conditional, rel_agg_cube
#     (VERDICT r8 next-step 6).
# (3) modified-this-round re-checks: rel_q3 / rel_q5 /
#     rel_join_bucketed moved their fact joins to the bucket-aligned
#     shuffled-hash plan (r9), and llm_token_count's ws_tokens moved to
#     the allocation-free arithmetic form — their r8/r7 green rows cover
#     plans that no longer exist.
# (4) The remaining 38 slots rotate r07-green queries in (47 candidates;
#     the 9 deferred to round 10 — rel_set_union, rel_set_intersect,
#     rel_set_except, rel_json_funcs, rel_array_funcs,
#     rel_null_handling, llm_char_entropy, llm_tfidf_top_terms,
#     rel_join_cross — are pure set-op/scalar/pointwise-text/cross shapes
#     with untouched code, covered by the r8 set-op fuzzer and the r9
#     regexp fuzzer, at stale(2) after this round, which
#     window_coverage.py still accepts; the round-10 window MUST
#     schedule them). rel_q1_pricing_summary is kept in-window
#     deliberately: its resident-vs-cold anomaly was profiled this
#     round (FLOOR.json) and any plan change needs a fresh driver row.
PENDING_NEXT_WINDOW: list[str] = []
_WINDOW = [
    # (1) PENDING_NEXT_WINDOW drain — first driver row ever
    "llm_minhash_jaccard_estimate",
    # (2) round-8 deferral promise (green-since-r6)
    "rel_math_funcs",
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_date_arithmetic",
    "rel_topk",
    "rel_agg_approx_distinct",
    "rel_agg_conditional",
    "rel_agg_cube",
    # (3) modified this round — bucket-aligned hash-join plans
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_join_bucketed",
    # (4) r07-green rotation (38 of 47)
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
    "llm_minhash_lsh_pairs",
    "llm_quality_filter",
    "llm_repetition_filter",
    "llm_sequence_packing",
    "llm_similarity_recall_ivf",
    "llm_similarity_topk_brute",
    "llm_stratified_sample",
    "rel_agg_distinct",
    "rel_join_anti",
    "rel_join_asof",
    "rel_join_asof_forward",
    "rel_join_broadcast_dim",
    "llm_token_count",
    "rel_join_full_outer",
    "rel_join_left_outer",
    "rel_join_range_band",
    "rel_join_semi",
    "rel_join_sortmerge",
    "rel_q1_pricing_summary",
    "rel_session_window",
    "rel_subquery_correlated_scalar",
    "rel_window_range_between",
    "rel_window_sliding_native",
    "rel_window_tumbling_native",
    "udf_pandas_scalar_normalize",
    "udf_udtf_explode_buckets",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
