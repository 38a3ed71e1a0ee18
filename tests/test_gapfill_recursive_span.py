"""Property tests for the round-10 surface additions:

(a) gap-filled timeline — dense spine, gap rows are the Aggregate merge
    identity, and rolling the dense form up equals rolling the sparse
    form up (so gapfill composes with the HTA cascade);
(b) recursive CTE — the binary-heap ancestor walk has exactly
    floor(log2(k)) + 1 rows per key, every chain ends at the root;
(c) span_dup_stats — constructed corpus with a known copied paragraph;
(d) resample_linear — constructed stream with known interpolants, exact
    hits (incl. on the last sample), edge NULLs, metric isolation;
(e) exact percentile — the R-7 interpolation definition pinned.
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


def test_resample_linear_constructed(spark):
    from metricq_db_hta_spark.plans.history import resample_linear

    samples = spark.createDataFrame(
        [("m", 100, 10.0), ("m", 200, 20.0), ("m", 400, 40.0),
         # a second metric that must not leak into m's interpolation
         ("other", 150, 999.0)],
        "metric string, ts_ns long, value double",
    )
    out = {
        r.ts_ns: r.value
        for r in resample_linear(samples, "m", 50, 450, 50).collect()
    }
    assert out == {
        50: None,        # before first sample: no extrapolation
        100: 10.0,       # exact hit
        150: 15.0,       # midpoint
        200: 20.0,
        250: 25.0, 300: 30.0, 350: 35.0,  # across the 200->400 segment
        400: 40.0,       # exact hit at the last sample
    }
    # grid is half-open: end_ns itself excluded
    assert 450 not in out
    # metric=None resamples every metric onto the same grid, isolated
    both = resample_linear(samples, None, 100, 250, 50).collect()
    got = {(r.metric, r.ts_ns): r.value for r in both}
    assert got == {
        ("m", 100): 10.0, ("m", 150): 15.0, ("m", 200): 20.0,
        # single-sample metric: only its exact grid hit is non-NULL
        ("other", 100): None, ("other", 150): 999.0, ("other", 200): None,
    }


def test_percentile_interpolation_matches_definition(spark):
    """Spark's exact percentile is the R-7 linear interpolation DuckDB's
    quantile_cont implements — pin the definition on a known group."""
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,)], "value double"
    )
    row = df.agg(
        F2.percentile("value", 0.5).alias("p50"),
        F2.percentile("value", 0.95).alias("p95"),
    ).collect()[0]
    assert row.p50 == 2.5                       # (n-1)*0.5 = 1.5 -> 2 + .5
    assert abs(row.p95 - 3.85) < 1e-12          # (n-1)*0.95 = 2.85


def test_new_query_plan_shapes(spark, sf_dir):
    """Pin the r10 additions' physical shapes (the non-bench analogue of
    test_planning.py's EXCHANGE_BUDGET — these queries aren't benched, so
    the budget table can't carry them, but their plans regress just as
    silently): gapfill must stay a zero-shuffle broadcast join over the
    range spine; resample pays exactly the ingest window + the merged
    neighbor window; span dedup is the designed 3-exchange pipeline;
    the percentile rollup is one exchange."""
    from metricq_db_hta_spark.queries import REGISTRY

    budgets = {
        # (hash exchanges, broadcast exchanges)
        "hta_timeline_gapfill": (0, 1),
        # ingest-chain window + fused neighbor max_by/min_by agg (one
        # groupBy serving BOTH sides via NULL-gated ordering keys) +
        # resample window over the pruned union — the r13 range-pruning
        # rewrite costs exactly ONE extra (dimension-sized) exchange
        "hta_resample_linear": (3, 1),
        "llm_ngram_span_dedup": (3, 0),
        "hta_percentile_timeline": (1, 0),
    }
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name, (n_hash, n_bcast) in budgets.items():
            df = REGISTRY[name].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            got = (
                plan.count("Exchange hashpartitioning"),
                plan.count("BroadcastExchange"),
            )
            assert got == (n_hash, n_bcast), (name, got, plan)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_histogram_mergeability(spark, sf_dir):
    """Rolling level-0 histograms up == binning raw at the coarse width
    directly — integer-exact (the distributional mergeability property)."""
    from metricq_db_hta_spark.queries.hta_queries import samples

    raw = samples(spark, sf_dir)
    via_rollup = hta.histogram_rollup(hta.histogram_level(raw, W0), W1)
    direct = hta.histogram_level(raw, W1)
    sym = via_rollup.exceptAll(direct).union(direct.exceptAll(via_rollup))
    assert sym.count() == 0


def test_histogram_percentile_within_one_bin(spark, sf_dir):
    """The histogram-served p95 honors its accuracy contract: the selected
    bin BRACKETS the rank-ceil(0.95 n) order statistic, so the estimate is
    within one bin width (16.0) of that sample (clamped to the histogram
    domain). NOTE the contract is against the order statistic, not the
    R-7 interpolated percentile — for tiny buckets R-7 interpolates
    between samples that may sit bins apart (a 2-sample bucket pulls p95
    5% toward the minimum), which no histogram can reproduce."""
    import math

    from pyspark.sql import functions as F2

    from metricq_db_hta_spark.queries.hta_queries import samples

    raw = samples(spark, sf_dir)
    h1 = hta.histogram_rollup(hta.histogram_level(raw, W0), W1)
    served = hta.histogram_percentile(h1, 0.95)
    vals = raw.groupBy(
        "metric",
        (F2.col("ts_ns") - F2.col("ts_ns") % W1).alias("bucket_start_ns"),
    ).agg(F2.sort_array(F2.collect_list("value")).alias("vs"))
    joined = served.join(vals, ["metric", "bucket_start_ns"]).collect()
    assert joined  # non-empty join: both sides cover the same buckets
    for r in joined:
        k = math.ceil(0.95 * len(r.vs))          # 1-based target rank
        x_k = min(max(r.vs[k - 1], hta.HIST_LO), hta.HIST_HI)
        assert abs(r.p95_est - x_k) <= 16.0, (r.metric, r.bucket_start_ns,
                                              r.p95_est, x_k, len(r.vs))


def test_counter_increase_reset_semantics(spark):
    """Constructed counter stream: plain increases, one reset (drop), and
    the first-sample NULL; a second metric stays isolated."""
    s = spark.createDataFrame(
        [("c", 10, 100.0), ("c", 20, 150.0), ("c", 30, 20.0),  # reset at 30
         ("c", 40, 25.0), ("d", 15, 7.0)],
        "metric string, ts_ns long, value double",
    )
    rows = {(r.metric, r.ts_ns): r for r in hta.counter_increase(s).collect()}
    assert rows[("c", 10)].increase is None and rows[("c", 10)].is_reset is None
    assert rows[("c", 20)].increase == 50.0 and rows[("c", 20)].is_reset is False
    # drop 150 -> 20: restart; the post-reset reading is the increase
    assert rows[("c", 30)].increase == 20.0 and rows[("c", 30)].is_reset is True
    assert rows[("c", 40)].increase == 5.0
    assert rows[("d", 15)].increase is None  # other metric's first sample
