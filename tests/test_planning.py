"""Plan-shape guards for the broadcast policy (SCALE.md §2 Joins).

Statically-estimated broadcasts misplanned twice (a 60M-row fact table
at sf1 under a 64 MB threshold, the sf0.1 lineitem under Spark's default
10 MB) — these tests pin the policy that prevents the class: no static
size estimation, explicit hints for known-small dims, AQE runtime
conversion for everything else.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.sources.tables import load_table


def _initial_plan(df) -> str:
    # pre-AQE physical plan: what the STATIC planner chose
    return df._jdf.queryExecution().sparkPlan().toString()


def test_static_broadcast_estimation_is_off(spark):
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert (
        int(spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
        > 0
    )


def test_fact_fact_join_plans_as_shuffle(spark, sf_dir):
    """orders x lineitem must never pick a statically-estimated broadcast
    of either fact side — the misplan builds a fact-table hashed relation
    single-threaded and would OOM a real executor at scale."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plan = _initial_plan(o.join(li, o.o_orderkey == li.l_orderkey))
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_explicit_dim_hint_still_broadcasts(spark, sf_dir):
    """The policy must not disable deliberate broadcasts: an F.broadcast
    hint on a known-small dim keeps its BroadcastHashJoin."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    plan = _initial_plan(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    assert "BroadcastHashJoin" in plan, plan


def test_q3_q5_broadcast_exactly_the_dims(spark, sf_dir):
    """Round-7 tuning guard: rel_q3/rel_q5 must broadcast their dimension
    sides (customer; q5 also supplier/nation/region) and keep the
    orders-lineitem fact edge as a shuffled join — a lost customer hint
    reintroduces the orders map-stage shuffle write AQE cannot avoid
    (measured 0.612 vs 0.148 s on the sf1 fragment), while a broadcast
    lineitem would rebuild the round-2 fact-broadcast misplan."""
    from metricq_db_hta_spark.queries import REGISTRY

    for name, n_bcast in (
        ("rel_q3_shipping_priority", 1),
        ("rel_q5_local_supplier_volume", 4),
    ):
        plan = _initial_plan(REGISTRY[name].spark(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") == n_bcast, (name, plan)
        # the fact edge stays a non-broadcast co-located join (r9: the
        # bucket-aligned shuffled-hash join — see test_bucketing.py for
        # the zero-exchange/zero-sort pin)
        assert "ShuffledHashJoin" in plan and "l_orderkey" in plan, (name, plan)
        # lineitem is never a broadcast build side: its scan must feed an
        # Exchange, not a BroadcastExchange (check via the build-side
        # relation list: no broadcast exchange subtree scans lineitem)
        import re

        for m in re.finditer(r"BroadcastExchange[\s\S]{0,2000}?FileScan parquet \[([^\]]*)\]", plan):
            assert "l_orderkey" not in m.group(1), (name, m.group(1))


def test_q6_pushes_all_filters_to_scan(spark, sf_dir):
    """rel_q6 is the pure pushdown query: every conjunct (shipdate range,
    discount band, quantity cap) must reach the parquet scan as a
    PushedFilter — a filter evaluated only post-scan reads the whole
    column range at 100 TB."""
    from metricq_db_hta_spark.queries import REGISTRY

    df = REGISTRY["rel_q6_forecast_revenue"].spark(spark, sf_dir)
    # explain("formatted") prints PushedFilters untruncated (toString elides
    # long filter lists with "...")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = plan[plan.index("PushedFilters") :].split("]", 1)[0]
    for want in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05",
        "LessThanOrEqual(l_discount,0.07",
        "LessThan(l_quantity,24",
    ):
        assert want in pushed, (want, pushed)


def test_q10_broadcasts_nation_shuffles_customer(spark, sf_dir):
    """rel_q10 aggregates ON the customer grain: customer is fact-scale at
    100 TB and must NOT be statically broadcast (only nation is); the
    fact chain shuffles."""
    from metricq_db_hta_spark.queries import REGISTRY

    plan = _initial_plan(REGISTRY["rel_q10_returned_items"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "n_nationkey" in plan.split("BroadcastHashJoin")[1].split("\n")[0], plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_unigram_lm_is_broadcast_not_shuffled(spark, sf_dir):
    """llm_unigram_logprob scores the token stream against the corpus LM:
    the LM (vocab-sized) must broadcast so scoring is map-side — a
    shuffled word-key join would re-shuffle the whole token stream a
    second time for no reason."""
    from metricq_db_hta_spark.queries import REGISTRY

    plan = _initial_plan(REGISTRY["llm_unigram_logprob"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 1, plan


# ---------------------------------------------------------------------------
# Exchange budget (r8): every headline query's shuffle-exchange count is
# pinned. Plans regress silently — a lost broadcast hint or a layout
# change re-inserts fact shuffles without failing any correctness test,
# and only shows up as a bench regression a round later. The counts come
# from the initial (pre-AQE-finalization) executedPlan, which is
# deterministic across scale factors because static broadcasts are
# disabled and the declared hints/buckets fully determine the shape.
# ---------------------------------------------------------------------------

EXCHANGE_BUDGET = {
    "rel_join_bucketed": 1,            # agg only; fact join is bucket-aligned
    "rel_q5_local_supplier_volume": 1, # agg only; facts bucketed, dims broadcast
    "rel_q3_shipping_priority": 0,     # facts bucketed + TakeOrderedAndProject
    "llm_text_stats": 1,               # partials merge only (lang_stats layout)
    "llm_exact_dedup": 1,              # the content-hash window
    "llm_minhash_lsh_pairs": 3,        # shingle window, band-key join, distinct
    "llm_similarity_topk_brute": 0,    # mapInPandas partial top-k, no shuffle
    "hta_ingest_chain": 1,             # the metric window
    "hta_ingest_serve": 0,             # bucketed raw store, zero-exchange agg
    "hta_counter_serve": 0,            # stored prev_value: no window, no shuffle
    "hta_level0_serve": 0,             # pruned materialized-level scan (r14:
                                       # replaces hta_level0's full export as
                                       # the headline — production reads the
                                       # ingest-time levels, never re-exports)
    "hta_q1_aggregate_timeline": 0,    # pruned level scan
    "hta_q3_aggregate": 1,
    "rel_q1_pricing_summary": 1,
    "rel_join_sortmerge": 3,           # 2 fact maps + agg: the shuffled sentinel
    "rel_join_asof": 1,                # ONE keyed window (union trick)
}


@pytest.mark.parametrize("name", sorted(EXCHANGE_BUDGET))
def test_headline_query_exchange_budget(spark, sf_dir, name):
    from metricq_db_hta_spark.queries import REGISTRY

    df = REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n == EXCHANGE_BUDGET[name], (
        f"{name}: {n} shuffle exchanges, budget {EXCHANGE_BUDGET[name]}\n{plan}"
    )


def test_exchange_budget_covers_all_bench_queries():
    from metricq_db_hta_spark.queries import REGISTRY

    bench = {n for n, s in REGISTRY.items() if s.bench}
    assert bench == set(EXCHANGE_BUDGET), (
        bench ^ set(EXCHANGE_BUDGET)
    )


# ---------------------------------------------------------------------------
# Static-plan policy (r9): QuerySpec.static_plan declares the physical plan
# fully compile-time-determined, and executors (bench.time_spark) run those
# queries with AQE off — its materialization-sync rounds cost a measured
# 13-179 ms/query at sf1 on plans with nothing to adapt. The two checks:
# the flag's extent equals the pinned-budget queries minus the two that
# measurably BENEFIT from runtime re-planning, and the policy is
# result-invariant (AQE never changes answers, only physical strategy).
# ---------------------------------------------------------------------------


def test_static_plan_flag_extent():
    from metricq_db_hta_spark.queries import REGISTRY

    static = {n for n, s in REGISTRY.items() if s.static_plan}
    adaptive_wins = {"llm_minhash_lsh_pairs", "rel_join_sortmerge"}
    assert static == set(EXCHANGE_BUDGET) - adaptive_wins, (
        static ^ (set(EXCHANGE_BUDGET) - adaptive_wins)
    )
    # the flag only ever marks bench queries whose exchange count is
    # pinned above — an unpinned static_plan query has no plan evidence
    for n in static:
        assert n in EXCHANGE_BUDGET


def test_static_plan_policy(spark, sf_dir):
    """bench._static_plan_policy toggles AQE off inside, restores after,
    and the answer is byte-identical under both settings."""
    import bench
    from metricq_db_hta_spark.queries import REGISTRY

    spec = REGISTRY["rel_q3_shipping_priority"]
    assert spec.static_plan
    key = "spark.sql.adaptive.enabled"
    assert spark.conf.get(key) == "true"
    with bench._static_plan_policy(spark, spec):
        assert spark.conf.get(key) == "false"
        rows_off = REGISTRY["rel_q3_shipping_priority"].spark(
            spark, sf_dir
        ).collect()
    assert spark.conf.get(key) == "true"
    rows_on = REGISTRY["rel_q3_shipping_priority"].spark(spark, sf_dir).collect()
    assert rows_off == rows_on
    # non-flagged spec: context manager is a no-op
    with bench._static_plan_policy(spark, REGISTRY["rel_join_sortmerge"]):
        assert spark.conf.get(key) == "true"


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in EXCHANGE_BUDGET
        if n not in ("llm_minhash_lsh_pairs", "rel_join_sortmerge")
    ),
)
def test_static_plan_queries_aqe_invariant(spark, sf_dir, name):
    """Every static_plan query returns the identical answer with AQE off —
    the full result-invariance pin behind the policy (the one-query check
    above pins the conf mechanics; this pins the claim per query)."""
    import bench
    from metricq_db_hta_spark.queries import REGISTRY

    spec = REGISTRY[name]
    assert spec.static_plan
    rows_on = sorted(map(tuple, spec.spark(spark, sf_dir).collect()))
    with bench._static_plan_policy(spark, spec):
        rows_off = sorted(map(tuple, spec.spark(spark, sf_dir).collect()))
    assert rows_on == rows_off


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime semi-join reduction (scale feature, plan-pinned): on a
    shuffled join with a selective build side, Spark injects a
    bloom_filter_agg subquery over the build keys and a might_contain
    filter above the PROBE scan — at 100 TB that is the difference
    between shuffling the whole fact table and shuffling only rows that
    can match. The default 10 GB application-side scan threshold means
    it (correctly) never fires at test scale, so the capability is
    pinned by lowering the threshold: the filter must appear, and the
    answer must be invariant."""
    from pyspark.sql import functions as F

    def q():
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400_000
        )
        li = load_table(spark, sf_dir, "lineitem")
        return (
            li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )

    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    plain = q()
    assert "might_contain" not in plain._jdf.queryExecution().executedPlan().toString()
    rows_plain = sorted(map(tuple, plain.collect()))

    prev = spark.conf.get(key)
    spark.conf.set(key, "10KB")
    try:
        pruned = q()
        txt = pruned._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in txt and "bloom_filter_agg" in txt, txt[:500]
        rows_pruned = sorted(map(tuple, pruned.collect()))
    finally:
        spark.conf.set(key, prev)
    assert rows_plain == rows_pruned


def test_bench_reexecute_is_a_fresh_execution(spark, sf_dir):
    """The resident protocol's honesty invariant (bench._reexecute): the
    re-executed frame must return identical rows through a DIFFERENT
    QueryExecution — reusing the original would silently reuse its
    cached shuffle map outputs and skip whole stages. Guards the
    internal Dataset.ofRows seam the harness stands on; if the API
    moves, _reexecute returns None and callers rebuild (cold-shaped,
    still honest) — but the fast path should exist on this Spark."""
    import bench
    from pyspark.sql import functions as F

    df = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    re1 = bench._reexecute(spark, df)
    assert re1 is not None, "Dataset.ofRows seam missing on this Spark"
    assert re1._jdf.queryExecution() is not df._jdf.queryExecution()
    assert sorted(map(tuple, re1.collect())) == sorted(
        map(tuple, df.collect())
    )
