"""Property tests for the three round-10 additions:

(a) gap-filled timeline — dense spine, gap rows are the Aggregate merge
    identity, and rolling the dense form up equals rolling the sparse
    form up (so gapfill composes with the HTA cascade);
(b) recursive CTE — the binary-heap ancestor walk has exactly
    floor(log2(k)) + 1 rows per key, every chain ends at the root;
(c) span_dup_stats — constructed corpus with a known copied paragraph.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import dedup, hta
from metricq_db_hta_spark.queries.hta_queries import (
    END_NS,
    START_NS,
    W0,
    W1,
    service,
)
from metricq_db_hta_spark.queries.relational3 import rel_recursive_cte
from metricq_db_hta_spark.sources.tables import load_table


def test_gapfill_dense_and_identity(spark, sf_dir):
    svc = service(spark, sf_dir)
    dense = svc.aggregate_timeline_gapfill("purchase", START_NS, END_NS, W0)
    sparse = svc.aggregate_timeline("purchase", START_NS, END_NS, W0)
    rows = dense.collect()
    # dense: exactly one row per aligned bucket start in [start, end)
    first = START_NS + (-START_NS) % W0
    expected = [first + i * W0 for i in range((END_NS - first + W0 - 1) // W0)]
    assert [r.bucket_start_ns for r in rows] == expected
    # gap rows carry the merge identity; populated rows match the sparse form
    sparse_by_bucket = {r.bucket_start_ns: r for r in sparse.collect()}
    assert len(sparse_by_bucket) < len(rows)  # fixture really has gaps
    for r in rows:
        s = sparse_by_bucket.get(r.bucket_start_ns)
        if s is None:
            assert r["count"] == 0
            assert float(r["sum"]) == 0.0
            assert r.integral == 0 and r.active_time == 0
            assert r.minimum is None and r.maximum is None
        else:
            assert (r["count"], r.integral, r.active_time) == (
                s["count"], s.integral, s.active_time
            )
            assert float(r["sum"]) == float(s["sum"])


def test_gapfill_rolls_up_like_sparse(spark, sf_dir):
    """hta.rollup over the dense timeline == rollup over the sparse one,
    once all-gap coarse buckets (count=0) are dropped — the gap rows are
    the aggregate's merge identity, so they contribute nothing."""
    svc = service(spark, sf_dir)
    dense = svc.aggregate_timeline_gapfill("purchase", START_NS, END_NS, W0)
    sparse = svc.aggregate_timeline("purchase", START_NS, END_NS, W0)
    up_dense = hta.rollup(dense, width_ns=W1).filter(F.col("count") > 0)
    up_sparse = hta.rollup(sparse, width_ns=W1)
    # NULL-min/max identity check happens inside rollup's MIN/MAX; compare
    # the full records
    a = {tuple(r) for r in up_dense.collect()}
    b = {tuple(r) for r in up_sparse.collect()}
    assert a == b


def test_recursive_cte_chain_shape(spark, sf_dir):
    out = rel_recursive_cte(spark, sf_dir).collect()
    keys = {r.s_suppkey for r in load_table(spark, sf_dir, "supplier").collect()}
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.suppkey, []).append(r)
    assert set(by_key) == keys
    for k, chain in by_key.items():
        chain.sort(key=lambda r: r.depth)
        # depth d ancestor is k >> d, down to the root (1)
        assert [r.ancestor for r in chain] == [k >> d for d in range(len(chain))]
        # chains terminate at the root (1); key 0 is its own fixpoint
        assert chain[-1].ancestor == (1 if k >= 1 else 0)
        assert len(chain) == max(1, k.bit_length())


def test_span_dup_stats_constructed(spark):
    words = [f"w{i}" for i in range(20)]
    para = " ".join(words[:10])          # 10 tokens -> 3 8-grams
    docs = spark.createDataFrame(
        [
            (1, para),                                   # fully copied in 2
            (2, para + " " + " ".join(words[10:18])),    # 11 8-grams, 3 shared
            (3, " ".join(reversed(words))),              # unique 20-tok doc
            (4, "too short"),                            # < 8 tokens: no spans
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.span_dup_stats(docs, n_words=8).collect()}
    assert set(rows) == {1, 2, 3}  # doc 4 has no spans
    assert rows[1].n_spans == 3 and rows[1].dup_spans == 3
    assert rows[1].dup_frac == 1.0
    assert rows[2].n_spans == 11 and rows[2].dup_spans == 3
    assert rows[2].dup_frac == round(3 / 11, 6)
    assert rows[3].dup_spans == 0 and rows[3].dup_frac == 0.0
