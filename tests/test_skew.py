"""Salting helpers produce identical results to the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricq_db_hta_spark.operators.skew import salted_aggregate, salted_join
from metricq_db_hta_spark.sources.tables import load_table


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("c"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s"),
        F.min("l_extendedprice").alias("mn"),
    )
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        partial_aggs={
            "c": F.count("*"),
            "s": F.sum(F.col("l_quantity").cast("decimal(38,6)")),
            "mn": F.min("l_extendedprice"),
        },
        final_aggs={
            "c": lambda c: F.sum(c).cast("long"),
            "s": lambda c: F.sum(c),
            "mn": lambda c: F.min(c),
        },
        salt_from=["l_orderkey", "l_linenumber"],
        n_salts=8,
    )
    diff = plain.exceptAll(salted).union(salted.exceptAll(plain))
    assert diff.count() == 0


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    plain = (
        li.join(sup, "l_suppkey")
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        salted_join(li, sup, on="l_suppkey", n_salts=8,
                    big_salt_from=["l_orderkey", "l_linenumber"])
        .groupBy("s_name")
        .agg(F.count("*").alias("n"))
    )
    diff = plain.exceptAll(salted).union(salted.exceptAll(plain))
    assert diff.count() == 0
