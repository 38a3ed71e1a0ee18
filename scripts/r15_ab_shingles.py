#!/usr/bin/env python
"""A/B harness for the r15 doc_shingles rewrite + LSH pair generation.

Variant A (current): posexplode words -> per-doc lead() window (ONE full
exchange of the word stream) -> concat -> shingles; LSH pairs via band-key
self-join (2 exchanges of band_keys) + distinct.

Variant B (proposed): shingles assembled MAP-SIDE from arrays_zip of the
split array with its shifted slices (codegen-native, no HOF, no window, no
exchange) — the downstream minhash groupBy(doc_id) then partial-aggregates
per doc locally and shuffles ~|docs| x 17 tiny rows instead of the
~|tokens| word stream (guide §2.3: aggregate before you shuffle).

Variant C (proposed, stacked on B): candidate pairs via
groupBy(band_key) + sort_array(collect_set) + in-bucket pair explosion
instead of the band-key self-join — one exchange of the band_keys stream
instead of two, no sorts (guide §2.4).

Result identity is asserted (sorted row sets) before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _static_plan_policy, build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.operators import dedup
from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.queries.llm import BANDS, N_HASHES, docs

TOKEN_SPLIT = " "


def doc_shingles_zip(
    docs_df, n_words=3, text_col="text", id_col="doc_id", distinct=True
):
    w = F.split(F.col(text_col), TOKEN_SPLIT)
    arrs = [w.alias("w0")] + [
        F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0))).alias(f"w{j}")
        for j in range(1, n_words)
    ]
    z = docs_df.select(
        id_col, F.explode(F.arrays_zip(*arrs)).alias("z")
    )
    parts = []
    for j in range(n_words):
        if j:
            parts.append(F.lit(" "))
        parts.append(F.col(f"z.w{j}"))
    out = z.select(id_col, F.concat(*parts).alias("token")).filter(
        F.col("token").isNotNull()
    )
    return out.distinct() if distinct else out


def lsh_pairs_zip(spark, sf_dir):
    """llm_minhash_lsh_pairs with zip shingles (variant B)."""
    toks = doc_shingles_zip(docs(spark, sf_dir), distinct=False)
    return dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)


def _band_keys(spark, sf_dir, shingler):
    toks = shingler(docs(spark, sf_dir), distinct=False)
    rows_per_band = N_HASHES // BANDS
    sig = dedup.minhash_matrix(toks, N_HASHES)
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(b),
                *[F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)],
            )
        )
        for b in range(BANDS)
    ]
    return sig.select("doc_id", F.explode(F.array(*keys)).alias("band_key"))


def lsh_pairs_groupby(spark, sf_dir):
    """Variant C: zip shingles + groupBy pair generation."""
    bk = _band_keys(spark, sf_dir, doc_shingles_zip)
    grouped = (
        bk.groupBy("band_key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        grouped.select(F.posexplode("ids").alias("i", "id_a"), F.col("ids"))
        .select(
            "id_a",
            F.explode(
                F.slice("ids", F.col("i") + F.lit(2), F.size("ids"))
            ).alias("id_b"),
        )
        .distinct()
    )


def time_build(spark, spec, build, data_dir, runs=5):
    times = []
    with _static_plan_policy(spark, spec):
        for measured in (False, *([True] * runs)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = build(spark, data_dir)
            df.toArrow()
            if measured:
                times.append(time.perf_counter() - t0)
    return times


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-shingles")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = build_sf1(sf_dir)
    prewarm_files(big)
    spec = REGISTRY["llm_minhash_lsh_pairs"]

    # --- result identity at sf0.01 (fast) and on the sf1 replica ---
    small = "/root/testdata/sf0.01"
    for venue in (small, big):
        a_tok = sorted(
            dedup.doc_shingles(docs(spark, venue), distinct=False)
            .groupBy("doc_id", "token").count().collect()
        )
        b_tok = sorted(
            doc_shingles_zip(docs(spark, venue), distinct=False)
            .groupBy("doc_id", "token").count().collect()
        )
        assert a_tok == b_tok, f"token multiset differs at {venue}"
        a = sorted(map(tuple, spec.spark(spark, venue).collect()))
        b = sorted(map(tuple, lsh_pairs_zip(spark, venue).collect()))
        c = sorted(map(tuple, lsh_pairs_groupby(spark, venue).collect()))
        assert a == b, f"variant B pairs differ at {venue}"
        assert a == c, f"variant C pairs differ at {venue}"
        print(f"identity OK at {venue}: {len(a)} pairs")

    variants = [
        ("A(window+join)", spec.spark),
        ("B(zip+join)", lsh_pairs_zip),
        ("C(zip+groupby)", lsh_pairs_groupby),
    ]
    for order in (variants, variants[::-1]):
        for name, build in order:
            ts = time_build(spark, spec, build, big)
            print(f"{name:16s} min={min(ts):.3f}  all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
