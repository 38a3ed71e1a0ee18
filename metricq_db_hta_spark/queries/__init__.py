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
# records the first 50 entries each round. Round 6 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) The three round-5 additions get their FIRST driver row — until now
#     their only green evidence was the local pytest oracle suite (noted
#     per ADVICE r5: r05 evidence for these is local-only).
# (2) All 29 queries whose latest driver row is CORRECTNESS_r04 rotate in
#     — they are 2 rounds stale and several had their code paths modified
#     after r04 (llm_similarity_topk_brute's mapInPandas rewrite + this
#     round's null/ragged-vector guard, llm_minhash_lsh_pairs' expr-string
#     matrix build), so the hard external signal re-checks the CURRENT
#     code. After this round every registry query's last green row is
#     r05 or r06 — a one-round-deep rotation.
# (3) The remaining 18 slots re-check r05-green queries: the 9 headline
#     bench queries not already in (2), llm_repetition_filter's sibling
#     paths, and a cross-family spread (HTA rollup/flex/last-value, UDF,
#     windows, joins) so no family goes unwatched for a full round.
#
# The four round-6 additions sit after the window — same rotation pattern
# as round 5's additions; their round-6 evidence is the local oracle suite
# (diffcheck green at sf0.001 and sf0.01). PENDING_NEXT_WINDOW makes the
# promised rotation machine-readable: scripts/window_coverage.py exempts
# these from its never-checked failure, and the NEXT round's window must
# include (and thereby drain) them.
PENDING_NEXT_WINDOW = [
    "llm_tfidf_top_terms",
    "llm_char_entropy",
    "rel_join_asof_forward",
    "rel_subquery_correlated_scalar",
]
_WINDOW = [
    # (1) first driver row ever (round-5 additions; r05 evidence local-only)
    "llm_repetition_filter",
    "llm_normalize_dedup",
    "llm_similarity_topk_ivf_multiprobe",
    # (2) last green r04 — 2 rounds stale, several paths modified since
    "llm_minhash_signatures",
    "llm_minhash_lsh_pairs",
    "llm_jaccard_blocked_pairs",
    "llm_embedding_neardup",
    "llm_similarity_topk_brute",
    "llm_similarity_topk_ivf",
    "llm_embedding_norms",
    "llm_multimodal_decode",
    "llm_neardup_clusters",
    "rel_agg_scalar_global",
    "rel_q5_local_supplier_volume",
    "rel_join_sortmerge",
    "rel_agg_rollup",
    "rel_agg_cube",
    "rel_agg_grouping_sets",
    "rel_agg_conditional",
    "rel_window_rank_topn",
    "rel_window_moving_agg",
    "rel_window_ntile",
    "rel_topk",
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_math_funcs",
    "rel_subquery_scalar_exists",
    "rel_having",
    "rel_percentiles",
    "rel_pivot",
    "rel_grouping_id",
    "rel_date_arithmetic",
    # (3a) headline bench re-checks (r05-green, re-pinned with the bench)
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_join_asof",
    "hta_ingest_chain",
    "hta_level0",
    "hta_q1_aggregate_timeline",
    "hta_q3_aggregate",
    "llm_exact_dedup",
    "llm_text_stats",
    # (3b) cross-family spread (r05-green)
    "hta_level1_rollup",
    "hta_q2_flex_raw",
    "hta_q4_last_value",
    "rel_agg_approx_distinct",
    "llm_simhash",
    "llm_fingerprint",
    "rel_window_lag_lead",
    "udf_apply_in_pandas_zscore",
    "rel_join_interval_overlap",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
