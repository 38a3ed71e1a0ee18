#!/usr/bin/env python
"""A/B for the r15 fingerprint_by_doc rewrite.

Variant A (current): split(text, "") -> per-CHARACTER posexplode -> per-doc
lead() window (full exchange + sort of the character stream) -> concat_ws
-> filter tail stubs -> groupBy min(md5).

Variant B: explode(sequence(1, greatest(1, len-n+1))) -> substring(text,
i, n) — shingles assembled map-side from the row's own text column, no
window, no exchange of the character stream; groupBy(doc_id) partial-
aggregates the min per doc locally so the only exchange carries one row
per doc. Same clamped-substring semantics as the scalar `shingles()` form
and the oracle's GREATEST(1, len-7) bound.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import build_sf1, prewarm_files
from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.functions import text as T
from metricq_db_hta_spark.queries.llm import docs


def fingerprint_by_doc_seq(docs_df, id_col="doc_id", text_col="text", n=8):
    c = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - (n - 1)))
    rows = docs_df.select(id_col, c.alias("__t"), F.explode(idx).alias("i"))
    return (
        rows.select(
            id_col, F.md5(F.substring(F.col("__t"), F.col("i"), F.lit(n))).alias("__h")
        )
        .groupBy(id_col)
        .agg(F.min("__h").alias("fingerprint"))
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-ab-fp")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = build_sf1(sf_dir)
    prewarm_files(big)

    for venue in ("/root/testdata/sf0.01", big):
        a = sorted(map(tuple, T.fingerprint_by_doc(docs(spark, venue)).collect()))
        b = sorted(map(tuple, fingerprint_by_doc_seq(docs(spark, venue)).collect()))
        assert a == b, f"fingerprints differ at {venue}"
        print(f"identity OK at {venue}: {len(a)} docs")

    variants = [
        ("A(char window)", T.fingerprint_by_doc),
        ("B(seq substr)", fingerprint_by_doc_seq),
    ]
    for order in (variants, variants[::-1]):
        for name, build in order:
            ts = []
            for m in (False, True, True, True):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build(docs(spark, big)).toArrow()
                if m:
                    ts.append(time.perf_counter() - t0)
            print(f"{name:16s} min={min(ts):.3f}  all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
