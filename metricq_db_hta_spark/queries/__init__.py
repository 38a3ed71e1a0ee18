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
# records the first 50 entries each round. Round 12 window policy
# (scripts/window_coverage.py is the authoritative freshness ledger):
#
# (1) ALL 23 r9-stale queries — the 22 names in the r11 (5) comment PLUS
#     rel_join_anti (displaced late-r11 by hta_counter_fleet; the r11
#     comment's "22 total" was an off-by-one, VERDICT r11 "what's wrong" #1).
#     After this round no registry query is driver-green older than r10:
#     rel_join_anti, rel_join_asof, rel_join_asof_forward,
#     rel_join_broadcast_dim, rel_join_bucketed, rel_join_full_outer,
#     rel_join_left_outer, rel_join_range_band, rel_join_semi,
#     rel_join_sortmerge, rel_math_funcs, rel_q1_pricing_summary,
#     rel_q3_shipping_priority, rel_q5_local_supplier_volume,
#     rel_session_window, rel_string_funcs, rel_subquery_correlated_scalar,
#     rel_topk, rel_window_range_between, rel_window_sliding_native,
#     rel_window_tumbling_native, udf_pandas_scalar_normalize,
#     udf_udtf_explode_buckets
# (2) The remaining 27 slots rotate the stalest r10-green queries (49
#     candidates, sorted; the first 27 scheduled here). The 22 deferred
#     r10-greens are the hard r13 obligation (they will be stale(2) then):
#     llm_text_stats, llm_text_stats_scan, llm_tfidf_top_terms,
#     llm_url_domain_filter, llm_weighted_sample, rel_agg_grouping_sets,
#     rel_agg_rollup, rel_array_funcs, rel_join_asof_tolerance,
#     rel_join_cross, rel_join_interval_overlap, rel_join_lateral,
#     rel_json_funcs, rel_null_handling, rel_percentiles, rel_pivot,
#     rel_recursive_cte, rel_set_except, rel_set_intersect, rel_set_union,
#     rel_subquery_scalar_exists, rel_unpivot
PENDING_NEXT_WINDOW: list[str] = []
_WINDOW = [
    # (1) the 23 r9-stale queries — freshness obligation, scheduled first
    "rel_join_anti",
    "rel_join_asof",
    "rel_join_asof_forward",
    "rel_join_broadcast_dim",
    "rel_join_bucketed",
    "rel_join_full_outer",
    "rel_join_left_outer",
    "rel_join_range_band",
    "rel_join_semi",
    "rel_join_sortmerge",
    "rel_math_funcs",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume",
    "rel_session_window",
    "rel_string_funcs",
    "rel_subquery_correlated_scalar",
    "rel_topk",
    "rel_window_range_between",
    "rel_window_sliding_native",
    "rel_window_tumbling_native",
    "udf_pandas_scalar_normalize",
    "udf_udtf_explode_buckets",
    # (2) r10-green rotation (first 27 of 49, sorted)
    "hta_histogram_level0",
    "hta_histogram_p95_rollup",
    "hta_ingest_serve",
    "hta_level1_rollup",
    "hta_percentile_timeline",
    "hta_q1_tiered_timeline",
    "hta_q3_tiered",
    "hta_resample_linear",
    "hta_timeline_gapfill",
    "llm_char_entropy",
    "llm_chunk_dedup",
    "llm_dedup_survivors",
    "llm_embedding_neardup",
    "llm_embedding_norms",
    "llm_fingerprint",
    "llm_jaccard_blocked_pairs",
    "llm_length_histogram",
    "llm_minhash_signatures",
    "llm_multimodal_decode",
    "llm_neardup_clusters",
    "llm_ngram_span_dedup",
    "llm_normalize_dedup",
    "llm_pii_redact",
    "llm_simhash",
    "llm_similarity_topk_ivf",
    "llm_similarity_topk_ivf_multiprobe",
    "llm_source_mixing_weights",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
