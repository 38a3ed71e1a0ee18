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
# records the first 50 entries each round. Round 10 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) First driver rows for the two queries added after the r9 driver run
#     (commit 6862220): hta_ingest_serve (serving-path committed-raw
#     summary) and llm_text_stats_scan (from-scratch twin of the served
#     stats query). Local-oracle + pytest evidence only until now.
# (2) The 9 queries deferred in round 9 (green-since-r7, stale(2)) are
#     scheduled as promised (VERDICT r9 next-step 1): rel_set_union,
#     rel_set_intersect, rel_set_except, rel_json_funcs, rel_array_funcs,
#     rel_null_handling, llm_char_entropy, llm_tfidf_top_terms,
#     rel_join_cross.
# (3) modified-this-round re-check: llm_text_stats now serves from the
#     ingest-time doc_stats_table layout (sources/derived.py) — its r8
#     green row covers the from-scratch scan plan that llm_text_stats_scan
#     now owns.
# (4) The remaining 30 slots rotate r08-green queries in (46 candidates;
#     the 16 deferred to round 11 — hta_q2_flex_raw, hta_q4_last_value,
#     rel_agg_statistical, llm_decontaminate, llm_unigram_logprob,
#     rel_q6_forecast_revenue, rel_q10_returned_items,
#     rel_q18_large_volume_customer (all 8 with an INDEPENDENT judge
#     re-check green in r9 on untouched code, the best-evidenced
#     candidates to sit at stale(2)), plus rel_window_lag_lead,
#     udf_apply_in_pandas_zscore, udf_grouped_agg_geomean,
#     rel_window_moving_agg, rel_window_ntile, rel_having,
#     rel_grouping_id, rel_agg_scalar_global (r8-green, displaced
#     mid-r10 by the eight new queries in (5)); the round-11 window MUST
#     schedule all 16.
# (5) Nine queries added mid-round-10 take first driver rows
#     immediately: hta_timeline_gapfill, rel_recursive_cte,
#     llm_ngram_span_dedup, hta_resample_linear, hta_percentile_timeline,
#     hta_histogram_level0, hta_histogram_p95_rollup, hta_counter_rate,
#     hta_q3_tiered, hta_q1_tiered_timeline (each diffcheck-green at all
#     three SFs). The ninth and tenth displace rel_window_rank_topn and
#     rel_window_distribution from (4) — both r8-green, untouched —
#     which join the queries round 11 MUST schedule (now 18).
# (6) hta_pattern_aggregate + hta_pattern_q3 (fleet glob timeline /
#     whole-range aggregate) were added after the window froze:
#     diffcheck-green at all three SFs, never driver-checked — round 11
#     schedules them with the 18 above (20).
PENDING_NEXT_WINDOW: list[str] = [
    # added after the r10 window froze — never driver-checked,
    # diffcheck-green at all three SFs; see (6)
    "hta_pattern_aggregate",
    "hta_pattern_q3",
]
_WINDOW = [
    # (1) first driver rows ever — added post-r9-driver-run
    "hta_ingest_serve",
    "llm_text_stats_scan",
    # (5) added mid-round-10 — first driver rows
    "hta_timeline_gapfill",
    "rel_recursive_cte",
    "llm_ngram_span_dedup",
    "hta_resample_linear",
    "hta_percentile_timeline",
    "hta_histogram_level0",
    "hta_histogram_p95_rollup",
    "hta_counter_rate",
    "hta_q3_tiered",
    "hta_q1_tiered_timeline",
    # (2) round-9 deferral promise (green-since-r7)
    "rel_set_union",
    "rel_set_intersect",
    "rel_set_except",
    "rel_json_funcs",
    "rel_array_funcs",
    "rel_null_handling",
    "llm_char_entropy",
    "llm_tfidf_top_terms",
    "rel_join_cross",
    # (3) modified this round — served-layout plan
    "llm_text_stats",
    # (4) r08-green rotation (28 of 46)
    "hta_level1_rollup",
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
    "llm_normalize_dedup",
    "llm_pii_redact",
    "llm_simhash",
    "llm_similarity_topk_ivf",
    "llm_similarity_topk_ivf_multiprobe",
    "llm_source_mixing_weights",
    "llm_url_domain_filter",
    "llm_weighted_sample",
    "rel_agg_grouping_sets",
    "rel_agg_rollup",
    "rel_join_asof_tolerance",
    "rel_join_interval_overlap",
    "rel_join_lateral",
    "rel_percentiles",
    "rel_pivot",
    "rel_subquery_scalar_exists",
    "rel_unpivot",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
