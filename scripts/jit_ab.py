"""A/B harness for JVM/JIT-level cold-floor experiments (VERDICT r9
next-step 5: the profiled C2-recompile churn taxes every cold run).

Runs bench.time_spark over the headline queries at the sf1 replica in THIS
process (one variant per process — JVM flags are process-lifetime), prints
cold/resident totals as one JSON line. Drive it from a shell loop that
exports SPARK_GRAFT_JAVA_OPTS per variant:

    SPARK_GRAFT_JAVA_OPTS="-XX:ReservedCodeCacheSize=512m" \
        python scripts/jit_ab.py

Measurement hygiene (memory: venue swings single queries +-30%): never run
concurrently with pytest or another sweep; compare TOTALS, alternate
variants A/B/A/B to cancel venue drift.

Round-10 results (all measured with this harness, sf1 replica, 15 bench
queries — every VERDICT-r9 cold-floor hypothesis came back NEGATIVE):

* ``-XX:ReservedCodeCacheSize=512m``: cold 6.92 vs 6.55 baseline,
  resident 4.31 vs 4.48 — a wash; the code cache is not under pressure.
* ``spark.sql.codegen.methodSplitThreshold=256``: A/B/A/B cold means
  6.35 (default) vs 6.36 — a wash; smaller generated methods do not
  change C2 behavior here.
* ``spark.sql.shuffle.partitions=8`` for the static-plan queries (the
  coalescing decision AQE would make, made statically): a PAIRED
  alternating per-query A/B (5 reps, same process, interleaved) showed
  every query within +-10% with no systematic winner (totals 2.14 s at
  32 vs 2.16 s at 8); the earlier whole-run "win" was venue drift.
* A session warm-up exercising the widest codegen shapes is a no-op by
  construction: time_spark already runs each query once UNMEASURED
  before its cold samples, so the exact generated code is C2-compiled
  before any measured run.

Conclusion recorded for future rounds: the residual cold total
(~6.1-6.6 s venue-dependent for 15 queries) is per-query scheduler +
py4j + commit fixed overhead, amortized at scale (SCALE_SWEEP sf10 cold
0.80x); the r9 rel_q1 bimodality is venue state, not recompilation —
paired back-to-back resident runs of the same plans total 2.16 s vs
4.0-4.5 s under the separated-sweep protocol, i.e. the spread lives in
page-cache/venue state, not in the plans.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from metricq_db_hta_spark.queries import REGISTRY  # noqa: E402
from metricq_db_hta_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jit-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_SQL_CONF="k=v;k=v" — session-conf variants (e.g.
    # spark.sql.codegen.methodSplitThreshold) in the same harness
    for kv in filter(None, os.environ.get("SPARK_GRAFT_SQL_CONF", "").split(";")):
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    data_dir = bench.build_sf1(sf_dir)
    names = [n for n, s in REGISTRY.items() if s.bench]
    cold, resident, _ = bench.time_spark(spark, names, data_dir)
    print(
        json.dumps(
            {
                "opts": os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""),
                "cold_total": round(sum(cold.values()), 3),
                "resident_total": round(sum(resident.values()), 3),
                "cold": cold,
            }
        )
    )


if __name__ == "__main__":
    main()
