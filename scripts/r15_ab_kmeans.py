#!/usr/bin/env python
"""A/B: IVF k-means — nested all-lazy plan (pre-r15, via git stash by the
runner) vs collected-centroid broadcast-local-relation form (r15).
Times the three IVF registry queries end-to-end (build + toArrow), twice
each after one warm run, at the given sf dir.

Run once on each tree: python scripts/r15_ab_kmeans.py <sf_dir> <label>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY

NAMES = [
    "llm_similarity_topk_ivf",
    "llm_similarity_topk_ivf_multiprobe",
    "llm_similarity_recall_ivf",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    label = sys.argv[2] if len(sys.argv) > 2 else "?"
    spark = get_spark("r15-ab-kmeans")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in NAMES:
        spec = REGISTRY[name]
        ts = []
        for m in (False, True, True):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).toArrow()
            if m:
                ts.append(time.perf_counter() - t0)
        print(f"{label:8s} {name:38s} min={min(ts):6.2f}  all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
