"""Bucketed co-located joins: the zero-shuffle fact⋈fact strategy.

SCALE.md's join section argues the orders⋈lineitem exchange is the
irreducible cost of the shuffled-join plan. Bucketing is the storage-side
answer at 100 TB: write both facts bucketed by the join key
(``bucketBy(N, key)`` + ``saveAsTable``), and Spark's scan reports the
bucket spec so the join planner skips BOTH exchanges — the join runs
bucket-aligned, map-side. This test pins that the engine actually
achieves the exchange-free plan, not just that bucketing is possible.
"""

from __future__ import annotations

import pytest

from metricq_db_hta_spark.sources.tables import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    # saveAsTable uses the session's warehouse dir (a static conf);
    # managed table data is removed by the DROP TABLE teardown
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bkt_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")


def test_bucketed_fact_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Same-bucket-count equi-join on the bucket key must plan with ZERO
    Exchange operators (bucket-aligned SortMergeJoin), while the plain
    parquet join of the same data needs two."""
    joined = spark.sql(
        """
        SELECT o.o_orderkey, COUNT(*) AS n
        FROM bkt_orders o JOIN bkt_lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey
        """
    )
    # executedPlan: exchanges are inserted by EnsureRequirements during
    # preparation — sparkPlan() is the pre-preparation tree and never
    # shows them, bucketed or not
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the aggregate reuses the join's bucket distribution too: the whole
    # query is exchange-free
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flat_plan = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert flat_plan.count("Exchange") >= 2, flat_plan

    # and the bucketed join is answer-identical to the plain one
    flat = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .count()
    )
    assert joined.count() == flat.count()
    assert joined.exceptAll(flat.withColumnRenamed("count", "n")).count() == 0


def test_rel_join_bucketed_registry_query_is_exchange_free_up_to_agg(spark, sf_dir):
    """The declared rel_join_bucketed query must get the bucket-aligned
    HASH join (r9: shuffled-hash instead of sort-merge — SPARK-28595
    makes SMJ re-sort both bucketed scans; hashing deletes both Sorts):
    no Exchange and no Sort below the join; the only exchange allowed in
    the whole plan is the final 5-row o_orderstatus aggregation."""
    from metricq_db_hta_spark.queries import REGISTRY

    df = REGISTRY["rel_join_bucketed"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    # split at the join: everything below it (the scan sides) must be
    # exchange-free AND sort-free; the single partial->final agg exchange
    # sits above
    below_join = plan.split("ShuffledHashJoin", 1)[1]
    assert "Exchange" not in below_join, plan
    assert "Sort " not in below_join, plan
    assert plan.count("Exchange") <= 1, plan


def test_rel_q5_fact_chain_is_exchange_free(spark, sf_dir):
    """rel_q5 over the bucketed facts: no Exchange anywhere below the
    final n_name aggregation — the broadcast dim joins must preserve the
    bucket partitioning of the orders⋈lineitem chain — and the fact join
    is the sort-free bucket-aligned hash join (r9)."""
    from metricq_db_hta_spark.queries import REGISTRY

    df = REGISTRY["rel_q5_local_supplier_volume"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # BroadcastExchange nodes are expected (the four dims); shuffle
    # exchanges are "Exchange hashpartitioning(...)" — exactly one, for
    # the 25-row aggregate
    shuffles = plan.count("Exchange hashpartitioning")
    assert shuffles == 1, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rel_q3_has_no_shuffle_exchange(spark, sf_dir):
    """rel_q3 over the bucketed facts: zero shuffle exchanges in the
    ENTIRE plan — broadcast customer preserves the bucket partitioning
    and the top-10 is TakeOrderedAndProject (no sort exchange) — and the
    fact join is the sort-free bucket-aligned hash join (r9)."""
    from metricq_db_hta_spark.queries import REGISTRY

    df = REGISTRY["rel_q3_shipping_priority"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "Sort " not in plan, plan


def test_bucket_count_env_override(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_BUCKETS resizes the layout (the 100 TB file-size knob):
    the override builds its own non-colliding table set, the scan reports
    the requested bucket count, and the bucket-aligned join still plans
    with zero fact exchanges."""
    from metricq_db_hta_spark.sources import bucketed as B

    monkeypatch.setenv("SPARK_GRAFT_BUCKETS", "8")
    # no memo clear: the bucket count is part of the memo key, so the
    # override itself forces the 8-bucket build (r9 ADVICE)
    try:
        t = B.bucketed_table(spark, sf_dir, "orders")
        # layout is its own table set (name carries the count) at 8 buckets
        assert "_8_orders" in t._jdf.queryExecution().executedPlan().toString()
        [desc] = [
            r
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {B._prefix(sf_dir)}_orders"
            ).collect()
            if r.col_name == "Num Buckets"
        ]
        assert desc.data_type.strip() == "8", desc
        li = B.bucketed_table(spark, sf_dir, "lineitem")
        j = t.hint("shuffle_hash").join(li, t.o_orderkey == li.l_orderkey)
        jplan = j._jdf.queryExecution().executedPlan().toString()
        assert jplan.count("Exchange hashpartitioning") == 0, jplan
        assert j.count() > 0
    finally:
        # drop only the override's entries: the default layout's memo (and
        # its built tables) stay valid for later tests
        for k in [k for k in B._BUCKETED if k[2] == 8]:
            del B._BUCKETED[k]
