"""The bench summary line must keep per-query timings under the budget.

VERDICT r15 #1: the one-line JSON grew 22 chars past the driver's tail
window and the old guard dropped the entire ``queries`` map, blanking
``PERF_r15.json``'s per-query and scaling tables. ``bench.compact_line``
now sheds the protocol prose (preserved in BENCH_DETAIL.json) before any
data, and the cold ``queries`` map is never shed. These tests exercise
the compaction with a realistic r15-shaped payload — no SparkSession.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

QUERY_NAMES = [
    "rel_q1_pricing_summary", "rel_q3_shipping_priority",
    "rel_q5_local_supplier_volume", "rel_join_sortmerge",
    "rel_join_bucketed", "rel_join_asof", "hta_q1_aggregate_timeline",
    "hta_q3_aggregate", "hta_level0_serve", "hta_ingest_serve",
    "hta_counter_serve", "hta_ingest_chain", "llm_text_stats",
    "llm_exact_dedup", "llm_minhash_lsh_pairs", "llm_similarity_topk_brute",
]


def _r15_shaped_out() -> dict:
    """A summary dict with every key the real bench emits, realistic
    magnitudes, and the full-length prose notes that pushed r15 over."""
    q = {n: round(0.061 + i * 0.137, 3) for i, n in enumerate(QUERY_NAMES)}
    qr = {n: round(0.051 + i * 0.093, 3) for i, n in enumerate(QUERY_NAMES)}
    return {
        "metric": "headline_queries_total_wall_clock",
        "value": 8.821, "unit": "sec", "queries": q, "sf": 1.0,
        "spark_query_floor_sec": 0.054, "resident_total": 3.862,
        "sf_note": "10x-replicated-from-sf0.1", "sf0.1_total": 3.839,
        "sf0.1_resident_total": 2.44, "sf0.1_duckdb_total": 0.928,
        "ingest_samples_per_sec": 133706.2,
        "state_100k_keys_samples_per_sec": 186440.3,
        "state_100k_keys_first_trial": 84117.5,
        "serve_requests_per_sec": 45.1,
        "serve_requests_per_sec_4clients": 126.9,
        "duckdb_total": 1.871, "ratio_vs_duckdb": 4.71,
        "resident_ratio_vs_duckdb": 2.06,
        "layout_note": "x" * 178, "cache_protocol": "x" * 198,
        "action_protocol": "x" * 270,
        "scale_curve_resident_ratio": {"sf10": 0.4, "sf3": 1.5, "sf30": 0.38},
        "resident_total_median": 4.831, "resident_total_max": 5.75,
        "resident_median_ratio_vs_duckdb": 2.58,
        "queries_resident": qr,
    }


def test_line_fits_budget_and_keeps_both_query_maps():
    out = _r15_shaped_out()
    assert len(json.dumps(out)) > bench.LINE_BUDGET  # the r15 failure mode
    line = bench.compact_line(out)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["queries"] == {
        n: out["queries"][n] for n in QUERY_NAMES
    }, "cold per-query map must survive compaction"
    assert "queries_resident" in parsed, "resident map fits the r15 payload"
    assert "protocol_note" in parsed  # prose replaced by a pointer


def test_queries_survive_even_pathological_payload():
    """Even with every shed-able key exhausted, `queries` is never dropped."""
    out = _r15_shaped_out()
    # inflate the non-sheddable scalars' neighborhood with a giant resident
    # map so compaction has to shed it too
    out["queries_resident"] = {f"q_{i:03d}_very_long_query_name": 0.123
                               for i in range(60)}
    line = bench.compact_line(out)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(QUERY_NAMES)
    assert len(line) <= bench.LINE_BUDGET


def test_under_budget_payload_is_untouched():
    out = _r15_shaped_out()
    for k in ("layout_note", "cache_protocol", "action_protocol",
              "queries_resident"):
        out.pop(k)
    before = dict(out)
    line = bench.compact_line(out)
    assert json.loads(line) == before
