"""Derived-layout contracts (sources/derived.py): a serving-path query
over an ingest-time layout must return EXACTLY what its from-scratch twin
recomputes — the layout is a cost move, never a semantics move."""

from __future__ import annotations

from pyspark.sql import functions as F

from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.sources import derived


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_text_stats_served_equals_scan(spark, sf_dir):
    served = REGISTRY["llm_text_stats"].spark(spark, sf_dir)
    scan = REGISTRY["llm_text_stats_scan"].spark(spark, sf_dir)
    assert served.columns == scan.columns
    assert _rows(served) == _rows(scan)


def test_ingest_serve_equals_chain_recompute(spark, sf_dir):
    """The serving store's persisted delta_ns must reproduce what the
    chain + lag window computes per request (the exchange the layout
    removes), including the delta-dependent active_time aggregate."""
    from pyspark.sql import Window

    from metricq_db_hta_spark.operators import ingest
    from metricq_db_hta_spark.queries.hta_queries import MAPPING, samples

    served = REGISTRY["hta_ingest_serve"].spark(spark, sf_dir)

    kept = ingest.ingest_batch(samples(spark, sf_dir), MAPPING)
    w = Window.partitionBy("metric").orderBy("event_id")
    expected = (
        kept.withColumn(
            "delta_ns",
            F.coalesce(F.col("ts_ns") - F.lag("ts_ns").over(w), F.lit(0)),
        )
        .groupBy("metric")
        .agg(
            F.count("*").alias("n"),
            F.min("ts_ns").alias("min_ts_ns"),
            F.max("ts_ns").alias("max_ts_ns"),
            F.sum("delta_ns").cast("long").alias("active_time_ns"),
        )
    )
    assert served.columns == expected.columns
    assert _rows(served) == _rows(expected)


def test_derived_layouts_memoized(spark, sf_dir):
    """Second read must serve the memoized table — no rebuild (the build
    runs inside bench's unmeasured warm run; a rebuild per call would
    leak layout cost into the timed window)."""
    derived.doc_stats_table(spark, sf_dir)
    before = dict(derived._BUILT)
    derived.doc_stats_table(spark, sf_dir)
    assert derived._BUILT == before


def test_doc_stats_columns_are_exact_counts(spark, sf_dir):
    """Stats columns equal the from-scratch expressions doc-by-doc (not
    just in aggregate)."""
    import os

    from metricq_db_hta_spark.functions import text as T

    stats = derived.doc_stats_table(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    fresh = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        T.token_count("text").alias("ws_tokens"),
        T.stopword_count("text").alias("sw_hits"),
    )
    joined = stats.alias("s").join(fresh.alias("f"), "doc_id")
    bad = joined.filter(
        (F.col("s.n_chars") != F.col("f.n_chars"))
        | (F.col("s.ws_tokens") != F.col("f.ws_tokens"))
        | (F.col("s.sw_hits") != F.col("f.sw_hits"))
    ).count()
    assert bad == 0
    assert stats.count() == docs.count()
