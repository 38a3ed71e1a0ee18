#!/usr/bin/env python
"""Benchmark runner. Primary venue: the full headline query set at **sf1**
(a deterministic 10x replication of ``$SPARK_GRAFT_SF_DIR``, default
/root/testdata/sf0.1), cold + resident, with DuckDB running the declared
oracle SQL over the SAME sf1 parquet as the baseline. BASELINE.md defines
the bar at "the same (or nearest) scale factor"; at sf0.1 the comparison
measures per-query fixed costs (task launch, codegen, stage scheduling),
not engine throughput — the round-5 probe showed Spark growing 0.8-2.1x on
10x rows with LSH overtaking DuckDB, so sf1 is the smallest venue where
throughput, not floors, decides the number (VERDICT r5 next-step 1).

Prints ONE JSON line:

  {"metric": "...", "value": <sf1 cold total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 1.0, ...}

sf0.1 cold/resident/DuckDB numbers are still measured for round-over-round
continuity and written to BENCH_DETAIL.json (plus summary scalars on the
line). Each query is fully materialized via a no-op sink so timing covers
the whole plan without driver-collect overhead.
"""

from __future__ import annotations

import contextlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame

from metricq_db_hta_spark import get_spark
from metricq_db_hta_spark.queries import REGISTRY
from metricq_db_hta_spark.sources.tables import TABLES, load_table


#: set True the first time _reexecute's Spark-internal seam is missing —
#: surfaced in the artifact's action_protocol (ADVICE r12: a silent
#: fallback would publish cold-shaped timings as 'resident' after a Spark
#: upgrade with no trace)
_REEXECUTE_FELL_BACK = False


def _reexecute(spark, df):
    """A fresh ``QueryExecution`` over ``df``'s ANALYZED logical plan.

    The honest resident re-execution form (r12). Re-collecting the SAME
    Dataset does NOT re-run the pipeline: each exchange caches its
    shuffle RDD on the physical plan object, so a second action skips
    every map stage (measured: 0.35 s vs 0.85 s for a 20M-row shuffle —
    stage reuse, not speed). ``Dataset.ofRows`` over the kept analyzed
    plan builds a fresh physical plan — full optimization, fresh shuffle
    dependencies, the whole pipeline runs — while skipping exactly what
    a resident server skips per request: py4j logical-plan construction
    and Catalyst analysis. Falls back to None if the internal API moves;
    callers then rebuild via the registry (cold-shaped, still honest) and
    the artifact's action_protocol records the fallback.
    """
    global _REEXECUTE_FELL_BACK
    try:
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, df._jdf.queryExecution().analyzed()
        )
        return DataFrame(jdf, spark)
    except Exception as e:  # noqa: BLE001 — internal API; rebuild instead
        if not _REEXECUTE_FELL_BACK:
            _REEXECUTE_FELL_BACK = True
            print(
                f"bench: Dataset.ofRows seam unavailable ({e!r}) — "
                "resident runs rebuild plans per run (cold-shaped)",
                file=sys.stderr,
            )
        return None

#: sf1 replica recipe version — bump when the replication recipe changes so
#: a stale /tmp cache from an older recipe is never measured. The cache dir
#: itself is keyed on (recipe version, source sf_dir) — see sf1_cache_dir.
SF1_RECIPE = "v4"
REPS = 10


def sf1_cache_dir(sf_dir: str, reps: int = REPS) -> str:
    """Cache dir keyed on recipe version AND source dir, with a provenance
    marker double-check: per-table existence checks alone would silently
    reuse a replica built from DIFFERENT source data when
    SPARK_GRAFT_SF_DIR changes (ADVICE r6). The basename key separates
    sf0.1/sf0.01 caches; the marker catches same-basename different-path
    sources and recipe drift, wiping the dir for a rebuild. ``reps`` other
    than the bench default gets its own dir (scripts/scale_sweep.py builds
    30x/100x replicas through the same recipe)."""
    import hashlib
    import shutil

    src = os.path.abspath(sf_dir)
    key = hashlib.sha256(src.encode()).hexdigest()[:8]
    tag = "sf1" if reps == REPS else f"rep{reps}"
    d = f"/tmp/metricq_bench_{tag}_{SF1_RECIPE}_{os.path.basename(src)}_{key}"
    marker = os.path.join(d, "_provenance.json")
    want = {"recipe": SF1_RECIPE, "src": src, "reps": reps}
    if os.path.isdir(d):
        try:
            with open(marker) as f:
                have = json.load(f)
        except (OSError, ValueError):
            have = None
        if have != want:
            shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    if not os.path.exists(marker):
        with open(marker, "w") as f:
            json.dump(want, f)
    return d


def prewarm_files(data_dir: str) -> int:
    """Read every data file under ``data_dir`` into the OS page cache and
    return the byte count. Measurement-protocol pin (VERDICT r11 #4): the
    sf3/sf10 ratio swung 2x between rounds purely on whether the replica
    files happened to be page-cache-warm (a round that re-built them had
    warmed them; a round that reused them had not warmed DuckDB's reads).
    Pre-warming BOTH engines' input deterministically (warm-warm) makes
    per-round denominators comparable; recorded as cache_protocol in
    SCALE_SWEEP.json."""
    n = 0
    buf = bytearray(1 << 20)
    for dirpath, _dirs, files in os.walk(data_dir):
        for fname in files:
            p = os.path.join(dirpath, fname)
            with open(p, "rb", buffering=0) as f:
                while True:
                    got = f.readinto(buf)
                    if not got:
                        break
                    n += got
    return n


def build_sf1(sf_dir: str) -> str:
    return build_replica(sf_dir, REPS)


def build_replica(sf_dir: str, reps: int) -> str:
    """Deterministic ``reps``x replication of the fixture tables into the
    keyed cache dir (sf1_cache_dir). The bench uses reps=10 (sf1);
    scripts/scale_sweep.py reuses the identical recipe at 30x/100x so the
    ratio-vs-scale curve is measured on the same data family.

    Replication recipe (v4 — v3 plus explicit row-group sizing below):

    * ``lineitem`` / ``orders``: key-shifted replicas (orderkey + r*1e7).
    * ``documents``: doc_id-shifted replicas with letter-permuted text so
      replicas are NOT near-duplicates of each other (keeps the near-dup
      graph density realistic instead of quadratic).
    * ``embeddings``: vec_id-shifted replicas (10x ANN corpus; the bench
      query set stays replica-0's vec_id < 8).
    * ``events``: replica 0 is copied VERBATIM (metric names and the
      fixed 2024-01 query window intact, so metric-filtered queries —
      as-of's purchase/click, Q1's timeline window — keep their original
      selectivity while the scan under them grows 10x: the honest scale
      behavior, where pruning/pushdown is what keeps selective queries
      fast); replicas 1-9 suffix event_type so the per-metric
      monotonic-timestamp contract holds (hta_queries.samples keys on
      event_type).
    * dimension tables (region/nation/customer/supplier/part): copied
      as-is — dims stay broadcast-sized at scale by design.

    Every replicated table is written with explicit row-group sizing
    (~32-60 groups): a single-row-group parquet file caps Spark's scan at
    ONE task (a split only owns the row groups whose midpoint it covers),
    while DuckDB parallelizes *within* a row group — measured at sf1-v3,
    the 1-group documents/events/embeddings files serialized every scan
    stage. Real 100 TB stores are many-file/many-group by construction,
    so multi-group files are the representative layout, not a favor.
    """
    import duckdb

    out_dir = sf1_cache_dir(sf_dir, reps)
    gen = duckdb.connect()
    gen.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t, key, rgs in (
        ("lineitem", "l_orderkey", 131072),
        ("orders", "o_orderkey", 32768),
        ("embeddings", "vec_id", 640),
    ):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            gen.execute(
                f"COPY (SELECT * REPLACE ({key} + r * 10000000 AS {key}) "
                f"FROM read_parquet('{sf_dir}/{t}.parquet'), range({reps}) t(r)) "
                f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {rgs})"
            )
    dst = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(dst):
        perms = [
            "aeiounrst", "eiouanrts", "iouaesrtn", "ouaeitnrs",
            "uaeiornst", "aeiourtsn", "eiouatsrn", "iouaentsr",
            "ouaeisntr", "uaeiostrn",
        ]
        if reps > len(perms):
            # extend deterministically with seeded shuffles — shuffled
            # 9-letter permutations differ from each other in most
            # positions, keeping replicas non-near-dup of one another
            # (lexicographic itertools order would NOT: adjacent perms
            # differ in 2 letters)
            import random

            rng = random.Random(42)
            seen = set(perms)
            while len(perms) < reps:
                p = list("aeiounrst")
                rng.shuffle(p)
                p = "".join(p)
                if p not in seen:
                    seen.add(p)
                    perms.append(p)
        cases = " ".join(
            f"WHEN {i} THEN translate(text, 'aeiounrst', '{p}')"
            for i, p in enumerate(perms)
        )
        gen.execute(
            f"COPY (SELECT * REPLACE (doc_id + r * 10000000 AS doc_id, "
            f"CASE r {cases} END AS text) "
            f"FROM read_parquet('{sf_dir}/documents.parquet'), range({reps}) t(r)) "
            f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 1536)"
        )
    # events: pyarrow, not a DuckDB COPY — preserves events.ts's on-disk
    # type exactly across testdata generations (TIMESTAMP(NANOS) would be
    # round-tripped to µs by DuckDB; plain µs is copied as-is either way).
    dst = os.path.join(out_dir, "events.parquet")
    if not os.path.exists(dst):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        parts = [tbl]  # replica 0: verbatim (see docstring)
        for r in range(1, reps):
            et = pc.binary_join_element_wise(
                pc.cast(tbl["event_type"], pa.string()), pa.scalar(f"_{r}"), ""
            )
            eid = pc.add(tbl["event_id"], pa.scalar(r * 10000000))
            parts.append(
                tbl.set_column(
                    tbl.schema.get_field_index("event_type"), "event_type", et
                ).set_column(
                    tbl.schema.get_field_index("event_id"), "event_id", eid
                )
            )
        pq.write_table(
            pa.concat_tables(parts), dst, version="2.6", row_group_size=24576
        )
    import shutil

    for t in TABLES:
        src_p = os.path.join(sf_dir, f"{t}.parquet")
        dst_p = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src_p) and not os.path.exists(dst_p):
            shutil.copy(src_p, dst_p)
    return out_dir


@contextlib.contextmanager
def _static_plan_policy(spark, spec):
    """Run a declared static-plan query with AQE off (QuerySpec.static_plan).

    AQE's materialization-sync rounds cost 13-179 ms/query at sf1 on plans
    with nothing to adapt (zero exchanges or layout/broadcast-pinned ones —
    the shapes EXCHANGE_BUDGET pins); queries that genuinely re-plan at
    runtime (lsh_pairs' banded self-join coalescing: AQE is 332 ms FASTER
    there; the shuffled sentinel) keep it on. Results are identical either
    way (tests/test_planning.py::test_static_plan_policy). Conf is restored
    on exit so the session default (AQE on) governs everything else.

    QuerySpec.conf pairs (r10) are applied the same way: per-query pinned
    execution conf, restored on exit — e.g. llm_text_stats runs its
    5-group partials merge with shuffle.partitions=1 instead of paying 32
    scheduled reduce tasks for 5 rows.
    """
    pairs = dict(getattr(spec, "conf", ()) or ())
    if getattr(spec, "static_plan", False):
        pairs.setdefault("spark.sql.adaptive.enabled", "false")
    if not pairs:
        yield
        return
    prev = {k: spark.conf.get(k) for k in pairs}
    for k, v in pairs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def time_spark(spark, names, data_dir, cold_runs=3, resident_sweeps=5):
    """Cold (plan rebuilt per run) and resident (plan reused) timings.

    Action protocol v3 (r12): every measured run ends in ``toArrow()`` —
    the result is Arrow-materialized in the driver, the same delivery
    work the DuckDB side pays (``fetch_arrow_table``). The previous noop
    sink discarded Spark's results while DuckDB materialized rows
    (asymmetric), and its write command re-ran full Catalyst per call
    (measured ~0.05-0.12 s/query of wrapper re-planning), so "resident"
    never actually skipped analysis as documented.

    Cold: one unmeasured run absorbs one-off session costs (codegen/JIT,
    parquet footer reads, broadcast machinery), then min of ``cold_runs``
    full build+execute cycles. cold_runs is 3 since r15 (was 2) — a
    measurement-robustness fix, declared in OPTIMIZATION_r15.md: this
    venue's host reclaims the page cache in multi-second windows
    (observed mid-bench: buff/cache collapsing to ~1 GB of 125), and
    when such a window lands on the cold phase a min-of-2 cannot
    recover (two same-session runs 17.0/17.8 s cold total vs 7.4/8.1 s
    clean, with resident sweeps in the SAME runs normal at 3.8-4.3 s).
    One extra sample per query narrows the poisoned-min odds without
    changing what a sample measures (same clearCache + build + toArrow
    cycle as r12-r14). Resident: the deployment story is a
    long-lived serving session (plans/serve.py) where a query's plan is
    built once and re-executed per request — each measured run goes
    through ``_reexecute`` (fresh QueryExecution over the kept analyzed
    plan): py4j plan construction and Catalyst analysis are skipped, but
    the FULL physical pipeline runs every time (scan, joins, shuffles,
    AQE, Arrow collect) — re-collecting one Dataset would instead reuse
    its cached shuffle map outputs and skip whole stages (see
    ``_reexecute``); nothing is cached (spark.catalog caches are cleared
    every run so operators that cache() intermediates recompute them).

    Resident runs as ``resident_sweeps`` SEPARATED sweeps over all
    queries (5 since r12: this VM's host reclaims page cache between
    sweeps unpredictably, so 3 samples often had zero quiet ones — 5
    keeps the min honest without changing the protocol shape); within
    each sweep every query gets one unmeasured warm run
    (page cache + AQE stats — the same immediately-preceding-run state
    the old consecutive protocol measured under, so each sample stays
    comparable to prior rounds' numbers) followed by one measured run.
    Venue noise on this machine is time-correlated (page-cache drops —
    BENCH history: r6->r7 resident ratio moved 3.2x->4.1x with zero plan
    changes), so spreading each query's samples across separated sweeps
    makes the per-query [min, median, max] spread an honest noise
    estimate instead of three samples from the same moment. (A fully
    interleaved no-warm variant was tried first and rejected: it
    measures page-cache eviction by the *other* queries, inflating
    resident above cold and breaking round-over-round continuity.)
    Returns ``(cold, resident_min, resident_spread)`` where spread maps
    each query to ``[min, median, max]`` seconds.
    """
    cold: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        runs: list[float] = []
        with _static_plan_policy(spark, spec):
            for measured in (False, *([True] * cold_runs)):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                df = spec.spark(spark, data_dir)
                df.toArrow()
                if measured:
                    runs.append(time.perf_counter() - t0)
        cold[name] = round(min(runs), 3)
    dfs = {name: REGISTRY[name].spark(spark, data_dir) for name in names}
    samples: dict[str, list[float]] = {name: [] for name in names}

    def _resident_run(name):
        # warm and measured runs each need their OWN fresh execution —
        # a shared one would let the measured run reuse the warm run's
        # shuffle outputs (see _reexecute)
        df = _reexecute(spark, dfs[name])
        if df is None:
            df = REGISTRY[name].spark(spark, data_dir)
        df.toArrow()

    for _sweep in range(resident_sweeps):
        for name in names:
            with _static_plan_policy(spark, REGISTRY[name]):
                spark.catalog.clearCache()
                _resident_run(name)  # warm
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                _resident_run(name)
                samples[name].append(time.perf_counter() - t0)
    resident = {name: round(min(s), 3) for name, s in samples.items()}
    spread = {
        name: [
            round(min(s), 3),
            round(statistics.median(s), 3),
            round(max(s), 3),
        ]
        for name, s in samples.items()
    }
    return cold, resident, spread


def time_duckdb(names, data_dir, sweeps=5):
    """The declared oracle SQL on DuckDB over the same parquet (the
    BASELINE.md comparison target); Arrow-materialized results (the same
    delivery work the Spark side's ``toArrow`` pays — protocol v3).

    Sweep shape MIRRORS the Spark resident protocol (ADVICE r12: the old
    min-of-3-consecutive-after-one-warm drew DuckDB's minimum from
    differently-conditioned samples than Spark's warm-then-measure
    pairs): ``sweeps`` separated sweeps over all queries, each query
    getting one unmeasured warm run immediately before its measured run,
    min over sweeps. This VM's host reclaims page cache aggressively
    (observed: ~1 GB cached immediately after a multi-GB bench read), so
    any single run can hit a transient IO stall; identical sweep shapes
    keep both minima honest. ``prewarm_files`` runs right before this
    phase (not only once per venue) for the same reason."""
    import duckdb

    prewarm_files(data_dir)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = os.path.join(data_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_names = [n for n in names if REGISTRY[n].oracle is not None]
    samples: dict[str, list[float]] = {n: [] for n in oracle_names}
    for _sweep in range(sweeps):
        for name in oracle_names:
            spec = REGISTRY[name]
            con.execute(spec.oracle).fetch_arrow_table()  # warm
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetch_arrow_table()
            samples[name].append(time.perf_counter() - t0)
    return {name: round(min(s), 3) for name, s in samples.items()}


#: the driver records only the LAST ~2000 chars of stdout; the one-line
#: JSON contract must stay under this (round 3's line outgrew the window)
LINE_BUDGET = 1900


def compact_line(out: dict, fell_back: bool = False) -> str:
    """Serialize the summary line, shedding prose before data.

    VERDICT r15 #1: the r15 line ran 22 chars over LINE_BUDGET and the old
    guard dropped the entire ``queries`` map, blanking the driver's
    per-query and scaling tables for the round. The ~650 chars of
    protocol-disclosure prose (layout/cache/action notes) are the right
    thing to shed first — they live in full in BENCH_DETAIL.json and are
    process-stable round over round — and the per-query maps (cold
    ``queries``, then ``queries_resident``) are the LAST things to go:
    they are what PERF_r*.json is computed from. ``out`` is compacted in
    place (BENCH_DETAIL is written pre-compaction by the caller).
    """
    if len(json.dumps(out)) > LINE_BUDGET and "layout_note" in out:
        for k in ("layout_note", "cache_protocol", "action_protocol"):
            out.pop(k, None)
        out["protocol_note"] = (
            "layout/cache/action protocol unchanged (r12 v3 + warm-warm); "
            "full disclosure text in BENCH_DETAIL.json"
        )
        if fell_back:
            out["protocol_note"] += (
                " (FALLBACK: ofRows seam unavailable — resident plans "
                "rebuilt per run, cold-shaped)"
            )
    line = json.dumps(out)
    if len(line) > LINE_BUDGET:  # still over: shed detail, never `queries`
        for k in ("scale_curve_resident_ratio", "protocol_note",
                  "resident_total_median", "resident_total_max",
                  "resident_median_ratio_vs_duckdb", "queries_resident"):
            out.pop(k, None)
            line = json.dumps(out)
            if len(line) <= LINE_BUDGET:
                break
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark("bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    names = [n for n, s in REGISTRY.items() if s.bench]

    # ---- primary venue: sf1 (10x replicated), Spark vs DuckDB ----
    sf1_cold: dict[str, float] = {}
    sf1_resident: dict[str, float] = {}
    sf1_spread: dict[str, list[float]] = {}
    sf1_duck: dict[str, float] = {}
    sf1_enabled = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
    if sf1_enabled:
        try:
            big_dir = build_sf1(sf_dir)
            # warm-warm cache protocol (VERDICT r11 #4): both engines read
            # page-cache-warm files every round, whether the replica was
            # just built or reused — denominators stay comparable
            prewarm_files(big_dir)
            sf1_cold, sf1_resident, sf1_spread = time_spark(spark, names, big_dir)
            sf1_duck = time_duckdb(names, big_dir)
        except Exception as e:  # noqa: BLE001 — fall back to sf0.1-only
            print(f"sf1 bench failed: {e!r}", file=sys.stderr)
            sf1_enabled = False

    # ---- secondary: sf0.1 (round-over-round continuity) ----
    cold01, resident01, spread01 = time_spark(spark, names, sf_dir)
    try:
        duck01 = time_duckdb(names, sf_dir)
    except Exception:  # noqa: BLE001 — baseline is informational
        duck01 = {}

    # ---- non-headline rows (ADVICE r14 low #5): r14 moved the benched
    # level-0 headline to the range-pruned serve shape (hta_level0_serve);
    # the full-export form stays measured and published HERE (BENCH_DETAIL
    # only, outside the headline totals) so pre-r14 BENCH rows, the
    # reference's full-export shape, and cross-engine comparisons remain
    # apples-to-apples.
    non_headline: dict = {}
    try:
        nh_names = [n for n in ("hta_level0",) if n in REGISTRY]
        if nh_names:
            nh_dir = big_dir if sf1_enabled else sf_dir
            nh_cold, nh_res, nh_spread = time_spark(
                spark, nh_names, nh_dir, cold_runs=1, resident_sweeps=3
            )
            try:
                nh_duck = time_duckdb(nh_names, nh_dir, sweeps=3)
            except Exception:  # noqa: BLE001 — informational
                nh_duck = {}
            non_headline = {
                "venue": "sf1"
                if sf1_enabled
                else os.path.basename(os.path.normpath(sf_dir)),
                "cold": nh_cold,
                "resident": nh_res,
                "resident_spread": nh_spread,
                "duckdb": nh_duck or None,
            }
    except Exception as e:  # noqa: BLE001 — never blocks the headline line
        print(f"non-headline bench skipped: {e!r}", file=sys.stderr)

    # ingest throughput: the reference's headline operational number is
    # sustained samples/s into the HTA store (BASELINE.md: MetricQ sustains
    # O(100k) samples/s with this db as archival sink). Measure the full
    # chain A2-A6 (filters + stateful delta + raw write + level recompute)
    # via backfill into a throwaway store.
    ingest_rate = None
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from metricq_db_hta_spark.queries.hta_queries import W0, samples
        from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

        src = samples(spark, sf_dir)
        # sustained-throughput measurement: 10 time-preserving replicas
        # under distinct metric names (per-metric monotonicity intact) so
        # the fixed per-job cost amortizes the way it does in a long-lived
        # service; a small unmeasured backfill first compiles the pipeline
        reps = 10
        big = src.crossJoin(spark.range(reps).withColumnRenamed("id", "rep")).select(
            F.concat_ws("_", "metric", "rep").alias("metric"),
            "ts_ns",
            "value",
            (F.col("event_id") * reps + F.col("rep")).alias("event_id"),
        )
        n = big.count()
        warm_store = tempfile.mkdtemp(prefix="bench_ingest_warm_")
        store = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            # two warm rounds: the tiny one compiles the pipeline, the
            # full-size one gets HotSpot past the write path's JIT
            # thresholds — a 2k-row warm alone leaves the measured run
            # ~20% under the steady-state rate a long-lived service
            # sustains (r12: 69k first run vs 105-118k runs 2-3)
            warm_svc = StreamingIngest(
                spark, warm_store, level_widths_ns=(W0, W0 * 10, W0 * 100)
            )
            warm_svc.backfill(src.limit(2_000))
            shutil.rmtree(warm_store, ignore_errors=True)
            StreamingIngest(
                spark, warm_store, level_widths_ns=(W0, W0 * 10, W0 * 100)
            ).backfill(big)
            svc = StreamingIngest(
                spark, store, level_widths_ns=(W0, W0 * 10, W0 * 100)
            )
            t0 = time.perf_counter()
            svc.backfill(big)
            ingest_rate = round(n / (time.perf_counter() - t0), 1)
        finally:
            shutil.rmtree(store, ignore_errors=True)
            shutil.rmtree(warm_store, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — informational, but not silent
        print(f"ingest bench skipped: {e!r}", file=sys.stderr)

    # 100k-key stateful-watermark throughput (SURVEY §7 risk 5 evidence,
    # paired with tests/test_streaming.py::test_stream_100k_key_state_rocksdb):
    # 300k samples across 100,000 metric keys through monotonic_stateful
    # with the RocksDB state-store provider — the per-key state scale the
    # reference never reaches (its fleet is 4,368 metrics) and the provider
    # a 100 TB deployment runs.
    state_rate = None
    state_rate_first = None
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from metricq_db_hta_spark.streaming.ingest_stream import (
            SAMPLE_SCHEMA,
            monotonic_stateful,
        )

        n_keys = 100_000
        base_ns = 1_700_000_000_000_000_000
        rows = (
            spark.range(n_keys)
            .select(
                F.concat(F.lit("m"), F.col("id")).alias("metric"),
                "id",
                F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i"),
            )
            .select(
                "metric",
                (F.lit(base_ns) + F.col("i") * F.lit(1_000_000_000)).alias("ts_ns"),
                (F.col("id") + F.col("i")).cast("double").alias("value"),
                (F.col("id") * 4 + F.col("i")).alias("event_id"),
            )
        )
        tmp = tempfile.mkdtemp(prefix="bench_state_")
        prev_provider = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", None
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            rows.coalesce(8).write.parquet(os.path.join(tmp, "in", "c1"))
            # Three trials, each a FRESH checkpoint + state store over the
            # same input; best-of wins (r13). The single-trial figure
            # r9-r12 recorded was dominated by one-time streaming-pipeline
            # compile/JIT (measured: ~7 s first trial vs ~2.1 s warm —
            # 42k vs 135-150k samples/s), so round-over-round deltas in it
            # tracked JVM warm-up, not the state path (the r11->r12 '88k
            # -> 73k regression' A/B'd as pure noise: interleaved runs of
            # both trees overlap at 124-150k warm). Steady-state is what
            # the reference's sustained O(100k)/s bar describes; the
            # compile-inclusive first trial is recorded alongside.
            first_rate = None
            best_dt = None
            for trial in range(3):
                cp = os.path.join(tmp, f"cp{trial}")
                stream = (
                    spark.readStream.schema(SAMPLE_SCHEMA)
                    .option("recursiveFileLookup", "true")
                    .parquet(os.path.join(tmp, "in"))
                )
                t0 = time.perf_counter()
                q = (
                    monotonic_stateful(stream)
                    .writeStream.outputMode("append")
                    .format("noop")
                    .option("checkpointLocation", cp)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination(300)
                if q.exception() is not None:
                    raise q.exception()
                dt = time.perf_counter() - t0
                if trial == 0:
                    first_rate = round(3 * n_keys / dt, 1)
                best_dt = dt if best_dt is None else min(best_dt, dt)
            state_rate = round(3 * n_keys / best_dt, 1)
            state_rate_first = first_rate
        finally:
            if prev_provider is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_provider
                )
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — informational, but not silent
        print(f"state bench skipped: {e!r}", file=sys.stderr)

    # resident-RPC throughput: the reference's actual read path is a
    # long-lived service answering repeated history requests
    # (src/db.cpp:124-128); this measures requests/sec through
    # HistoryServer.handle over a real store — 60 requests cycling the
    # three reference query types (Q1 timeline / Q3 aggregate / Q4 last
    # value) after a 6-request warm-up, in-process (no socket) so the
    # number is the engine's floor, not loopback TCP's.
    serve_rate = None
    serve_rate_conc = None
    try:
        import shutil
        import tempfile

        from metricq_db_hta_spark.plans.serve import HistoryServer
        from metricq_db_hta_spark.queries.hta_queries import (
            W0 as _W0,
            samples as _samples,
        )
        from metricq_db_hta_spark.streaming.ingest_stream import (
            StreamingIngest,
        )

        srv_store = tempfile.mkdtemp(prefix="bench_serve_")
        try:
            StreamingIngest(
                spark, srv_store, level_widths_ns=(_W0, _W0 * 10)
            ).backfill(_samples(spark, sf_dir).limit(20_000))
            srv = HistoryServer(spark, srv_store, [_W0, _W0 * 10])
            reqs = [
                {"type": "aggregate_timeline", "metric": "click",
                 "interval_max_ns": _W0 * 10},
                {"type": "aggregate", "metric": "view"},
                {"type": "last_value", "metric": "purchase"},
            ]
            for r in reqs * 2:  # warm-up: plans compiled, relations cached
                srv.handle(r)

            # Best-of-3 sweeps for BOTH rates (r13): single-shot serve
            # rates swing +/-20% on this venue (JIT warm-up of the serving
            # code path + page-cache reclaim — the same noise the query
            # benches already counter with min-of-N), so r11 vs r12
            # single-sample deltas were dominated by measurement, not
            # code. Sweep 1 doubles as the JIT warm-up for sweeps 2-3.
            import threading as _threading

            n_reqs = 60
            n_clients, per_client = 4, 15
            serial_rates: list[float] = []
            conc_rates: list[float] = []
            for _sweep in range(3):
                t0 = time.perf_counter()
                for i in range(n_reqs):
                    resp = srv.handle(reqs[i % len(reqs)])
                    if "error" in resp:
                        raise RuntimeError(resp["error"])
                serial_rates.append(n_reqs / (time.perf_counter() - t0))

                # concurrent throughput: the serial number above is
                # per-request LATENCY (plan-build + schedule + collect,
                # ~0.1 s floor); a resident server takes overlapping
                # clients, and Spark runs their small jobs concurrently —
                # this is the number a fleet of dashboards sees
                errs: list[str] = []

                def _client(ci: int) -> None:
                    for i in range(per_client):
                        r = srv.handle(reqs[(ci + i) % len(reqs)])
                        if "error" in r:
                            errs.append(r["error"])

                t0 = time.perf_counter()
                ts = [
                    _threading.Thread(target=_client, args=(c,))
                    for c in range(n_clients)
                ]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join(600)
                if errs:
                    raise RuntimeError(errs[0])
                conc_rates.append(
                    n_clients * per_client / (time.perf_counter() - t0)
                )
            serve_rate = round(max(serial_rates), 1)
            serve_rate_conc = round(max(conc_rates), 1)
        finally:
            shutil.rmtree(srv_store, ignore_errors=True)
    except Exception as e:  # noqa: BLE001 — informational, but not silent
        print(f"serve bench skipped: {e!r}", file=sys.stderr)

    # per-query floor: the smallest *real* query shape — a parquet scan plus
    # one shuffled aggregation — built fresh each run like the headline
    # queries. The headline total carries ~13x this; DuckDB's equivalent
    # floor is ~1 ms.
    floor_runs = []
    for m in (False, True, True):
        t0 = time.perf_counter()
        (
            load_table(spark, sf_dir, "region")
            .groupBy("r_regionkey")
            .count()
            .toArrow()
        )
        if m:
            floor_runs.append(time.perf_counter() - t0)
    spark_floor = round(min(floor_runs), 3)

    # ---- assemble output: sf1 is the primary number when available ----
    if sf1_enabled and sf1_cold:
        primary_cold, primary_res, primary_duck, sf = (
            sf1_cold, sf1_resident, sf1_duck, 1.0,
        )
    else:
        primary_cold, primary_res, primary_duck, sf = (
            cold01, resident01, duck01, 0.1,
        )
    total = round(sum(primary_cold.values()), 3)
    resident_total = round(sum(primary_res.values()), 3)
    out = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": primary_cold,
        "sf": sf,
        "spark_query_floor_sec": spark_floor,
        "resident_total": resident_total,
    }
    if sf == 1.0:
        out["sf_note"] = "10x-replicated-from-sf0.1"
        out["sf0.1_total"] = round(sum(cold01.values()), 3)
        out["sf0.1_resident_total"] = round(sum(resident01.values()), 3)
        if duck01:
            out["sf0.1_duckdb_total"] = round(sum(duck01.values()), 3)
    if ingest_rate is not None:
        out["ingest_samples_per_sec"] = ingest_rate
    if state_rate is not None:
        out["state_100k_keys_samples_per_sec"] = state_rate
        if state_rate_first is not None:
            out["state_100k_keys_first_trial"] = state_rate_first
    if serve_rate is not None:
        out["serve_requests_per_sec"] = serve_rate
    if serve_rate_conc is not None:
        out["serve_requests_per_sec_4clients"] = serve_rate_conc
    if primary_duck:
        dtot = sum(primary_duck.values())
        out["duckdb_total"] = round(dtot, 3)
        out["ratio_vs_duckdb"] = round(total / max(dtot, 1e-9), 2)
        out["resident_ratio_vs_duckdb"] = round(
            resident_total / max(dtot, 1e-9), 2
        )
        # layout disclosure (r8 ADVICE): these queries are timed over
        # pre-built bucketBy fact copies (one-time layout cost paid at
        # write time, outside the timed window) while DuckDB scans flat
        # parquet — not a same-layout comparison; sortmerge is the
        # identical-layout shuffled sentinel.
        out["layout_note"] = (
            "q3/q5/join_bucketed read prebuilt bucketed facts; text_stats/"
            "ingest_serve/counter_serve read ingest-time derived layouts "
            "(sources/derived.py); duckdb recomputes from flat parquet"
        )
        out["cache_protocol"] = (
            "warm-warm (prewarm_files before each engine phase; duckdb "
            "min over 5 warm-then-measure sweeps — the same sweep shape "
            "as Spark resident, so both minima are drawn from "
            "identically-conditioned samples)"
        )
        out["action_protocol"] = (
            "v3: Arrow-materialized results both engines (spark toArrow "
            "/ duckdb fetch_arrow_table); resident = fresh QueryExecution "
            "over the kept analyzed plan, full pipeline per run (was: "
            "noop sink, which discarded Spark results and re-ran "
            "Catalyst in the write wrapper every call)"
        )
        if _REEXECUTE_FELL_BACK:
            out["action_protocol"] += (
                " (FALLBACK: ofRows seam unavailable — resident plans "
                "rebuilt per run, cold-shaped)"
            )
        # the measured ratio-vs-scale curve (scripts/scale_sweep.py, full
        # 14-query set, same replication recipe): surfaced on the summary
        # line so the per-round artifact records where the 2x bar is met
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            with open(os.path.join(here, "SCALE_SWEEP.json")) as f:
                sweep = json.load(f)
            out["scale_curve_resident_ratio"] = {
                s: sweep[s]["ratio_resident"] for s in sorted(sweep)
            }
        except (OSError, ValueError, KeyError):
            pass
    # resident spread (VERDICT r7 next-step 3): per-sweep samples are
    # interleaved across queries, so median/max vs min quantifies the
    # venue noise a single min hides. The summary line carries the three
    # totals; per-query [min, med, max] goes to BENCH_DETAIL.json.
    primary_spread = sf1_spread if (sf1_enabled and sf1_cold) else spread01
    if primary_spread:
        out["resident_total_median"] = round(
            sum(v[1] for v in primary_spread.values()), 3
        )
        out["resident_total_max"] = round(
            sum(v[2] for v in primary_spread.values()), 3
        )
        if primary_duck:
            out["resident_median_ratio_vs_duckdb"] = round(
                out["resident_total_median"] / max(sum(primary_duck.values()), 1e-9), 2
            )
    # per-query resident timings ride the line too (VERDICT r15 #1: the
    # driver's per-query and scaling tables went empty in r15 because the
    # line outgrew the budget and the guard dropped `queries`)
    out["queries_resident"] = primary_res
    # Full per-query detail goes to a side file: the driver records only
    # the LAST ~2000 chars of stdout, so the one-line JSON contract must
    # stay well under that (round 3's line outgrew the window).
    detail = {
        "sf1": {
            "cold": sf1_cold or None,
            "resident": sf1_resident or None,
            "resident_spread": sf1_spread or None,
            "duckdb": sf1_duck or None,
        },
        "sf0.1": {
            "cold": cold01,
            "resident": resident01,
            "resident_spread": spread01,
            "duckdb": duck01 or None,
        },
        "non_headline": non_headline or None,
    }
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
            json.dump({**out, **detail}, f, indent=1)
    except OSError as e:
        print(f"detail write skipped: {e!r}", file=sys.stderr)
    print(compact_line(out, fell_back=_REEXECUTE_FELL_BACK))


if __name__ == "__main__":
    main()
