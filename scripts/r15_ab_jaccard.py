#!/usr/bin/env python
"""A/B for the r15 shared-subtree rewrites of the jaccard/decontaminate
family (guide §2.4 "remove shuffles outright" / §3.3 "materialise an
intermediate": Spark does NOT dedupe a self-join's common subplan, so a
query that references the same derived stream k times recomputes it k
times unless the stream is materialized once with a lazy localCheckpoint
— the established pattern from lsh_candidate_pairs_from_tokens).

Candidates (full-registry plan audit, scripts/r15_plan_audit.py):

* llm_minhash_jaccard_estimate — 24 exchanges: computes the corpus
  signature pipeline TWICE (wide matrix inside lsh pairs + long-form
  minhash_signatures with its 16x token crossJoin) and the distinct
  shingle stream THREE times (ta, tb, sizes).
  B: one checkpointed wide matrix feeds band keys AND per-pair agreement
  (n_agree as a map-side sum of 16 column comparisons — no seed
  explosion, no agree groupBy); one checkpointed distinct-shingle stream
  feeds ta/tb/sizes; the candidate pairs are checkpointed before their
  two consumers.
* llm_jaccard_blocked_pairs — 11 exchanges: the distinct token stream is
  computed three times (ta, tb, sizes). B: checkpoint it once.
* llm_decontaminate — 8 exchanges: the distinct shingle stream is
  computed twice, BUT the eval side's recompute is filter-pushed to 1/97
  of docs, so sharing may not pay (the full-stream checkpoint write can
  cost more than the pushed mini-pass saves). Measured to decide.

Identity: full result multiset pinned at sf0.01 and sf1 for each pair.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.operators import dedup
from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.queries.llm import BANDS, N_HASHES, docs


def jaccard_estimate_b(spark, sf_dir):
    d = docs(spark, sf_dir)
    toks = dedup.doc_shingles(d, distinct=False)
    sig = dedup.minhash_matrix(toks, N_HASHES).localCheckpoint(eager=False)
    rpb = N_HASHES // BANDS
    keys = [
        F.md5(
            F.concat_ws(
                "|", F.lit(b), *[F.col(f"mh{b * rpb + j}") for j in range(rpb)]
            )
        )
        for b in range(BANDS)
    ]
    band_keys = sig.select("doc_id", F.explode(F.array(*keys)).alias("band_key"))
    a = band_keys.select(F.col("doc_id").alias("id_a"), F.col("band_key").alias("bk_a"))
    b = band_keys.select(F.col("doc_id").alias("id_b"), F.col("band_key").alias("bk_b"))
    pairs = (
        a.join(b, (a.bk_a == b.bk_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ma = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_HASHES)],
    )
    mb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_HASHES)],
    )
    n_agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    agree = (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select("id_a", "id_b", n_agree.cast("long").alias("n_agree"))
    )
    stok = dedup.doc_shingles(d, distinct=True).localCheckpoint(eager=False)
    sizes = stok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = stok.select(F.col("doc_id").alias("id_a"), "token")
    tb = stok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        agree.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("long").alias("n_inter"),
            (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)))
            .cast("long")
            .alias("n_union"),
        )
    )


def jaccard_estimate_c(spark, sf_dir):
    """Variant C: NO checkpoints (the measured-loser part of B), but the
    long-form signature path is still replaced by the wide matrix + a
    map-side 16-column comparison — the agree side then shuffles ONE row
    per doc (17 cols) instead of 16, and the agree groupBy disappears
    entirely (n_agree is a projection)."""
    d = docs(spark, sf_dir)
    toks = dedup.doc_shingles(d, distinct=False)
    pairs = dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)
    sig = dedup.minhash_matrix(toks, N_HASHES)
    ma = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_HASHES)],
    )
    mb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_HASHES)],
    )
    n_agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    agree = (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select("id_a", "id_b", n_agree.cast("long").alias("n_agree"))
    )
    stok = dedup.doc_shingles(d, distinct=True)
    sizes = stok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = stok.select(F.col("doc_id").alias("id_a"), "token")
    tb = stok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        agree.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("long").alias("n_inter"),
            (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)))
            .cast("long")
            .alias("n_union"),
        )
    )


def blocked_pairs_b(spark, sf_dir):
    d = docs(spark, sf_dir)
    toks = (
        d.select(
            "doc_id", "lang", "source",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    ta = toks.select(F.col("doc_id").alias("id_a"), "lang", "source", "token")
    tb = toks.select(F.col("doc_id").alias("id_b"), "lang", "source", "token")
    inter = (
        ta.join(tb, ["token", "lang", "source"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_tok").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


def decontaminate_b(spark, sf_dir):
    d = docs(spark, sf_dir)
    toks = dedup.doc_shingles(d).localCheckpoint(eager=False)
    ev = toks.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "token"
    )
    tr = toks.filter(F.col("doc_id") % 97 != 0)
    hits = (
        tr.join(ev, "token")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("token").alias("shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    train_docs = d.filter(F.col("doc_id") % 97 != 0)
    return (
        train_docs.join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.sum(F.when(F.col("shared_shingles") >= 5, 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.coalesce(F.max("shared_shingles"), F.lit(0))
            .cast("long")
            .alias("max_shared"),
        )
        .orderBy("lang")
    )


def tfidf_b(spark, sf_dir):
    from pyspark.sql import Window

    d = docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
    )


PAIRS = [
    ("llm_minhash_jaccard_estimate", jaccard_estimate_b),
    ("llm_jaccard_blocked_pairs", blocked_pairs_b),
    ("llm_decontaminate", decontaminate_b),
    ("llm_tfidf_top_terms", tfidf_b),
]


def _key(rows):
    # None-safe sort key (ADVICE r15: a nullable column would raise
    # TypeError on comparison instead of reporting a diff)
    return sorted(tuple((v is None, v) for v in r) for r in rows)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-jaccard")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = build_sf1(sf_dir)
    prewarm_files(big)

    for name, b_build in PAIRS:
        a_build = REGISTRY[name].spark
        for venue in ("/root/testdata/sf0.01", big):
            a = _key(a_build(spark, venue).collect())
            b = _key(b_build(spark, venue).collect())
            if a != b:
                # explicit raise, not bare assert (ADVICE r15: asserts
                # vanish under python -O, silently skipping the check)
                raise AssertionError(f"{name} results differ at {venue}")
            print(f"{name}: identity OK at {venue} ({len(a)} rows)")

    for name, b_build in PAIRS:
        a_build = REGISTRY[name].spark
        variants = [("A(current)", a_build), ("B(shared)", b_build)]
        for order in (variants, variants[::-1]):
            for vname, build in order:
                ts = []
                for m in (False, True, True, True):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    build(spark, big).toArrow()
                    if m:
                        ts.append(time.perf_counter() - t0)
                print(
                    f"{name:34s} {vname:12s} min={min(ts):.3f}  "
                    f"all={[round(t, 3) for t in ts]}"
                )


if __name__ == "__main__":
    main()
