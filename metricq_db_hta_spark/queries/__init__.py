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
# records the first 50 entries each round. Round 8 window policy
# (scripts/window_coverage.py enforces freshness going forward):
#
# (1) ALL 17 round-7 additions drain from PENDING_NEXT_WINDOW and get
#     their FIRST driver row (VERDICT r7 next-step 1 — the single
#     blocking gap between "100% local oracle" and the stated bar).
#     rel_agg_statistical's syy moment was corrected this round (msum
#     envelope overflow, r8 ADVICE), so its first driver row checks the
#     fixed code.
# (2) rel_join_bucketed (new this round) goes straight into the window —
#     same policy as llm_similarity_recall_ivf last round: no reason to
#     let a new query wait a full rotation.
# (3) modified-this-round re-checks: udf_grouped_agg_geomean's UDF was
#     rewritten (deprecated GROUPED_AGG -> type hints) and rel_q3/rel_q5's
#     physical plans moved to bucketed fact storage — their r7 green rows
#     cover code that no longer exists.
# (4) The remaining 29 slots rotate r06-green queries in (37 candidates;
#     the 8 deferred to round 9 — rel_math_funcs, rel_string_funcs,
#     rel_date_funcs, rel_date_arithmetic, rel_topk,
#     rel_agg_approx_distinct, rel_agg_conditional, rel_agg_cube — are
#     pure-scalar/topk/conditional/cube shapes with untouched code, at
#     stale(2) after this round, which window_coverage.py still accepts;
#     the round-9 window MUST schedule them).
# Added after the round-8 window filled; the round-9 window must drain it
# (scripts/window_coverage.py exempts listed names from its never-checked
# failure until then).
PENDING_NEXT_WINDOW: list[str] = ["llm_minhash_jaccard_estimate"]
_WINDOW = [
    # (1) PENDING_NEXT_WINDOW drain — first driver row ever
    "llm_dedup_survivors",
    "llm_decontaminate",
    "rel_unpivot",
    "rel_window_distribution",
    "rel_join_lateral",
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
    # (2) new this round
    "rel_join_bucketed",
    # (3) modified this round
    "udf_grouped_agg_geomean",
    "rel_q5_local_supplier_volume",
    "rel_q3_shipping_priority",
    # (4) r06-green rotation (29 of 37)
    "hta_level1_rollup",
    "hta_q2_flex_raw",
    "hta_q4_last_value",
    "llm_embedding_neardup",
    "llm_embedding_norms",
    "llm_fingerprint",
    "llm_jaccard_blocked_pairs",
    "llm_minhash_signatures",
    "llm_multimodal_decode",
    "llm_neardup_clusters",
    "llm_normalize_dedup",
    "llm_simhash",
    "llm_similarity_topk_ivf",
    "llm_similarity_topk_ivf_multiprobe",
    "llm_text_stats",
    "rel_agg_grouping_sets",
    "rel_agg_rollup",
    "rel_agg_scalar_global",
    "rel_grouping_id",
    "rel_having",
    "rel_join_interval_overlap",
    "rel_percentiles",
    "rel_pivot",
    "rel_subquery_scalar_exists",
    "rel_window_lag_lead",
    "rel_window_moving_agg",
    "rel_window_ntile",
    "rel_window_rank_topn",
    "udf_apply_in_pandas_zscore",
]
assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [n for n in _WINDOW if n not in REGISTRY]
assert not _missing, f"window names absent from registry: {_missing}"
_rest = [n for n in REGISTRY if n not in set(_WINDOW)]
_ordered = {n: REGISTRY[n] for n in (*_WINDOW, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "PENDING_NEXT_WINDOW"]
