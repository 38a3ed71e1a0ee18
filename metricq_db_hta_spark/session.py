"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
configs below are the ones that matter identically on a large cluster:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for the Pandas-UDF paths, UTC session timezone (all HTA timestamps
are int64 ns since epoch — see SURVEY.md §1.1), and a shuffle-partition
count sized to the parallelism at hand.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "metricq-db-hta-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cpus)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark's default 10 MB. Round 2 raised this to 64 MB to catch
        # mid-size dims, and the sf1 scaling probe caught the mistake:
        # column pruning shrinks lineitem's ESTIMATE under 64 MB, so the
        # planner broadcast a 60M-row fact table and built its hashed
        # relation single-threaded — rel_q5 4.4 s, rel_q3 2.2 s at sf1.
        # At 10 MB both are flat vs sf0.1 (1.39 s / 0.88 s). Genuinely
        # small dims (nation/region/supplier/customer) still broadcast,
        # and AQE upgrades shuffle joins to broadcast from RUNTIME sizes,
        # which is the correct mechanism for mid-size build sides.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # split-size floor: default 4 MB caps a 10 MB file at ~3 scan tasks
        # (measured: q1's partial agg ran on 3 of 32 cores). On a cluster,
        # maxSplitBytes = max(openCost, totalSize/parallelism) — totalSize
        # per core at 100 TB dwarfs any openCost, so this floor only ever
        # binds on small inputs, where finer splits are exactly what we want.
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        # HotSpot refuses to JIT methods over 8000 bytecodes by default
        # (DontCompileHugeMethods); wide whole-stage-codegen methods — e.g.
        # the dim=64 flat dot product, one straight-line method — cross that
        # limit and run in the bytecode interpreter forever. Measured on the
        # 160k-pair scoring microbench: 2.85 s -> 0.71 s (4x) with the flag.
        # local[:] the driver JVM hosts the executors; set both for cluster
        # deployments (executor JVMs are where codegen runs).
        .config("spark.driver.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
    )
    return builder.getOrCreate()
