#!/usr/bin/env python
"""A/B: clustered distinct (repartition by the downstream key before
``distinct()``) vs bare distinct — r16, guide §2.4 "two operations keyed
the same way can share one exchange".

Variants measured (identity asserted on full results, min-of-N
interleaved, sf1 = 10x replica by default, REPS=30 for the sf3 probe):

* llm_jaccard_blocked_pairs — cluster by the self-join key
  (token, lang, source): sf1 3.29-3.68 -> 2.86-3.11 s, sf3 (counts
  1,138,110 identical) 15.3-22.1 -> 10.7-11.7 s.   LANDED.
* llm_decontaminate — cluster the shingle dedup by the eval-join key
  (token): sf1 1.79 -> 1.48, sf3 2.63 -> 2.24 s.   LANDED.
* llm_simhash — cluster the token dedup by the groupBy key (doc_id):
  sf1 1.31 -> 1.02 s.                              LANDED.
* llm_minhash_jaccard_estimate — clustering stok by doc_id: sf1
  3.81-3.93 -> 4.00-5.18 s (the (id_b, token) join side cannot reuse a
  doc_id partitioning and EnsureRequirements re-shuffles BOTH sides of
  that join to match).                             REJECTED.

Usage: REPS=10|30 python scripts/r16_ab_cluster_distinct.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_replica, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.operators import dedup
from metricq_db_hta_spark.queries.llm import docs


def _key(r):
    return tuple((v is None, v) for v in r.values())


def main() -> None:
    reps = int(os.environ.get("REPS", "10"))
    big = build_replica("/root/testdata/sf0.1", reps)
    prewarm_files(big)
    spark = get_spark("r16-ab-cluster-distinct")
    d = docs(spark, big)

    base = d.select(
        "doc_id", "lang", "source", F.explode(F.split("text", " ")).alias("token")
    )

    def blocked_pairs(toks):
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
            inter.join(sa, "id_a").join(sb, "id_b").filter(jac >= 0.8)
            .select("id_a", "id_b", "n_common", F.round(jac, 6).alias("jaccard"))
        )

    variants = {
        "bp:A(distinct)": lambda: blocked_pairs(base.distinct()),
        "bp:B(clustered)": lambda: blocked_pairs(
            base.repartition("token", "lang", "source").distinct()
        ),
        "sh:A(distinct)": lambda: dedup.simhash16(dedup.doc_tokens(d)),
        "sh:B(clustered)": lambda: dedup.simhash16(
            dedup.doc_tokens(d, cluster_by=["doc_id"])
        ),
    }
    for pair in (("bp:A(distinct)", "bp:B(clustered)"),
                 ("sh:A(distinct)", "sh:B(clustered)")):
        ra = sorted(_key(r) for r in variants[pair[0]]().toArrow().to_pylist())
        rb = sorted(_key(r) for r in variants[pair[1]]().toArrow().to_pylist())
        if ra != rb:
            raise AssertionError(f"IDENTITY MISMATCH: {pair}")
        print(f"identity OK {pair[0][:2]} on {len(ra)} rows", flush=True)
    for sweep in range(2):
        for name, build in variants.items():
            ts = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().toArrow()
                ts.append(time.perf_counter() - t0)
            print(
                f"sweep{sweep} {name:18s} min={min(ts):.3f} "
                f"all={[round(t, 3) for t in ts]}", flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
