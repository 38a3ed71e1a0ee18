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
# records the first 50 entries each round. Round 7 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) The four round-6 additions drain from PENDING_NEXT_WINDOW and get
#     their FIRST driver row (standing rotation contract — VERDICT r6
#     next-step 1). Until now their only green evidence was the local
#     pytest oracle suite.
# (2) All 32 queries whose latest driver row is CORRECTNESS_r05 rotate in
#     — after this round every query's last green row is r06 or r07,
#     keeping the rotation one round deep.
# (3) The remaining 14 slots re-check r06-green queries: every query whose
#     code path is modified THIS round (llm_repetition_filter's NULL
#     pinning, the similarity qdim guard behind the top-k paths, the Q3
#     level decomposition behind hta_q3_aggregate) plus the headline
#     bench queries, so the hard external signal always covers the
#     current code and the numbers the bench reports.
#
# Queries added this round (if any) sit after the window with the same
# machine-readable PENDING_NEXT_WINDOW promise: scripts/window_coverage.py
# exempts them from its never-checked failure, and the round-8 window must
# include (and thereby drain) them.
PENDING_NEXT_WINDOW = [
    "llm_dedup_survivors",
    "llm_decontaminate",
    "rel_unpivot",
    "rel_window_distribution",
    "rel_join_lateral",
    # second round-7 batch (relational3.py / llm2.py)
    "rel_q6_forecast_revenue",
    "rel_q10_returned_items",
    "rel_q18_large_volume_customer",
    "llm_pii_redact",
    "llm_url_domain_filter",
    "llm_chunk_dedup",
    "llm_length_histogram",
    "llm_source_mixing_weights",
    "llm_unigram_logprob",
    "rel_join_asof_tolerance",
    "llm_weighted_sample",
    "rel_agg_statistical",
]
_WINDOW = [
    # (1) PENDING_NEXT_WINDOW drain — first driver row ever
    "llm_tfidf_top_terms",
    "llm_char_entropy",
    "rel_join_asof_forward",
    "rel_subquery_correlated_scalar",
    # (2) last green r05 — rotate all 32 in
    "hta_delta_encode",
    "hta_metadata_projection",
    "hta_scope_boundaries",
    "hta_stats_rates",
    "hta_subscription_list",
    "llm_dataset_split",
    "llm_lang_id",
    "llm_quality_filter",
    "llm_sequence_packing",
    "llm_stratified_sample",
    "llm_token_count",
    "rel_agg_distinct",
    "rel_array_funcs",
    "rel_join_anti",
    "rel_join_broadcast_dim",
    "rel_join_cross",
    "rel_join_full_outer",
    "rel_join_left_outer",
    "rel_join_range_band",
    "rel_join_semi",
    "rel_json_funcs",
    "rel_null_handling",
    "rel_session_window",
    "rel_set_except",
    "rel_set_intersect",
    "rel_set_union",
    "rel_window_range_between",
    "rel_window_sliding_native",
    "rel_window_tumbling_native",
    "udf_grouped_agg_geomean",
    "udf_pandas_scalar_normalize",
    "udf_udtf_explode_buckets",
    # (3) r06-green re-checks: code modified this round + headline bench.
    # llm_similarity_recall_ivf (added this round) drains here instead of
    # waiting a round in PENDING_NEXT_WINDOW: it runs brute AND multiprobe
    # internally and pins their agreement, so it strictly supersedes the
    # multiprobe re-check slot it takes (multiprobe stays r06-green).
    "llm_repetition_filter",
    "llm_similarity_topk_brute",
    "llm_similarity_recall_ivf",
    "hta_q3_aggregate",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_join_asof",
    "rel_join_sortmerge",
    "hta_ingest_chain",
    "hta_level0",
    "hta_q1_aggregate_timeline",
    "llm_exact_dedup",
    "llm_minhash_lsh_pairs",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
