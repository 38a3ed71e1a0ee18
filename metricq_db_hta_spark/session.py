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


def _default_driver_mem(cpus: str, _meminfo: str = "/proc/meminfo") -> str:
    """Driver max heap derived from the venue instead of a flat constant:
    0.75 GiB per local task slot with a 2 GiB floor, then capped at half
    of MemTotal (the Python workers, Arrow buffers and OS page cache need
    the rest). The CAP beats the floor (r14 review: floor-after-cap gave
    small hosts Xmx above half of physical memory — exactly the swap/OOM
    scenario the cap exists for); a 512m absolute minimum keeps a
    degenerate meminfo reading from emitting an unstartable heap. Max
    heap only — the JVM commits what it uses (ADVICE r12)."""
    override = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if override:
        return override
    try:
        slots = int(cpus)
    except ValueError:
        slots = os.cpu_count() or 8
    want_mb = max(slots * 768, 2048)
    try:
        with open(_meminfo) as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_mb = int(line.split()[1]) // 1024
                    want_mb = min(want_mb, total_mb // 2)
                    break
    except OSError:
        pass  # non-Linux: keep the per-slot estimate
    return f"{max(want_mb, 512)}m"


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
        # Driver<->Python result channels over a unix domain socket
        # (Spark 4.1): every collect/toArrow otherwise opens a fresh
        # loopback TCP connection + auth handshake PER CALL — pure
        # per-request latency on the resident serve path (r16 A/B,
        # HistoryServer cached-plan requests, interleaved best-of:
        # 25.1 -> 29.4 req/s mean-of-best across 3 paired runs). The
        # transfer itself is driver-local on any deployment (cluster
        # results still land on the driver), so the setting is
        # scale-neutral; SPARK_GRAFT_UDS=0 restores TCP for A/B.
        .config(
            "spark.python.unix.domain.socket.enabled",
            "false" if os.environ.get("SPARK_GRAFT_UDS") == "0" else "true",
        )
        # FIFO by default (single-workload bench/test determinism); a
        # resident deployment serving concurrent history requests opts
        # into FAIR so one long timeline scan cannot starve point reads —
        # HistoryServer tags each connection with its own on-demand pool,
        # which is a no-op under FIFO
        .config(
            "spark.scheduler.mode",
            os.environ.get("SPARK_GRAFT_SCHEDULER", "FIFO"),
        )
        # heap sized to the task-slot count: local[32] hosts 32 executor
        # threads in the driver JVM, and 8g gave them 256 MB/slot — below
        # Spark's own 512M-1G/core guidance; FLOOR.json showed 0.4 s of GC
        # inside a single sf1 q1 stage. 0.75 g/slot measured ~7% faster on
        # the 16-query sf1 resident sweep with the same spreads. The
        # default is DERIVED (min(0.75g x slots, 50% of MemTotal), floor
        # 2g — ADVICE r12: a flat 24g Xmx could outgrow physical memory on
        # small hosts under load); SPARK_GRAFT_DRIVER_MEM overrides.
        .config("spark.driver.memory", _default_driver_mem(cpus))
        # UI off for tests/bench (saves startup + listener overhead);
        # SPARK_GRAFT_UI=1 turns it on for stage-level profiling via the
        # REST API (scripts/floor_decompose.py)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        # Statically-estimated broadcasts are OFF. The planner's estimate is
        # compressed-file-size x pruning, which lies in both directions:
        # round 2's 64 MB threshold broadcast a 60M-row fact table at sf1
        # (rel_q5 4.4 s), and even Spark's default 10 MB still broadcast
        # the 600k-row lineitem at sf0.1 (pruned estimate ~8 MB), paying a
        # single-threaded hashed-relation build per query. Correct split:
        # known-small dims are broadcast EXPLICITLY (F.broadcast hints,
        # honored regardless of this conf), and every other join plans as
        # shuffle, then AQE upgrades to broadcast from RUNTIME map-output
        # sizes — the only estimate that can't misplan at 100 TB. Measured
        # at sf0.1: rel_q5 0.945 -> 0.582 s, rel_q3 0.543 -> 0.333 s,
        # as-of 0.331 -> 0.276 s, no regressions.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(10 * 1024 * 1024),
        )
        # AQE SMJ -> shuffled-hash-join conversion from RUNTIME map-output
        # sizes (same no-static-estimates philosophy as the broadcast
        # policy above): when every map partition of a join side is under
        # this threshold, the sort of both sides is replaced by a per-
        # partition hash build — DuckDB's shape. Partitions above 64 MB
        # keep SMJ's spill path, so a 100 TB shuffle is unaffected.
        # Measured at sf1 (resident): rel_q3 0.744 -> 0.683, rel_q5
        # 0.955 -> 0.838, rel_join_sortmerge 0.659 -> 0.545 s.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
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
        # SPARK_GRAFT_JAVA_OPTS appends further JVM flags (A/B harness for
        # JIT/code-cache experiments; cluster operators can inject GC or
        # code-cache sizing without editing code).
        .config(
            "spark.driver.extraJavaOptions",
            _java_opts := "-XX:-DontCompileHugeMethods "
            + os.environ.get("SPARK_GRAFT_JAVA_OPTS", ""),
        )
        .config("spark.executor.extraJavaOptions", _java_opts)
    )
    return builder.getOrCreate()
