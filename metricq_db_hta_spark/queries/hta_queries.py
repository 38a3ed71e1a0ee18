"""Declared queries for the HTA domain (reference operators A1-A19) over the
``events`` fixture: ``event_type`` plays the metric name, ``ts`` the sample
time, ``value`` the sample value (FIXTURES.md §1).

Every query has a DuckDB oracle built from the same CTE definitions, with
the engine-defined integral/active_time semantics encoded identically
(operators/hta.py docstring).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.timeutil import ts_ns_auto
from metricq_db_hta_spark.operators import hta, ingest
from metricq_db_hta_spark.plans.history import (
    HistoryService,
    q1_regions_tiered,
    q3_segments_tiered,
)
from metricq_db_hta_spark.queries.base import (
    bsum,
    dsum,
    register,
    sql_bsum,
    sql_dsum,
)
from metricq_db_hta_spark.sources.tables import load_table

W0 = 3_600_000_000_000          # level-0 width: 1 h
W1 = W0 * 10                    # 10 h
W2 = W1 * 10                    # 100 h
LEVEL_WIDTHS = [W0, W1, W2]

# Fixed query window (events span 2024-01-01 .. 2024-01-30 UTC)
START_NS = 1_704_412_800_000_000_000  # 2024-01-05T00:00:00Z
END_NS = 1_705_708_800_000_000_000    # 2024-01-20T00:00:00Z

# Input-name mapping fixture (reference A2: e.g. foo.bar.power.100Hz ->
# foo.bar.power, /root/reference/src/async_hta_service.hpp:567-570).
MAPPING = [("click", "interaction.click"), ("view", "interaction.view")]


def samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> canonical (metric, ts_ns, value, event_id) sample stream.

    events.ts has shipped as both TIMESTAMP(NANOS)-as-long and a plain µs
    timestamp across testdata generations; ts_ns_auto normalizes either to
    the engine's canonical int64 ns at µs granularity — exactly what the
    DuckDB oracle's epoch_ns(ts) sees.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_type").alias("metric"),
        ts_ns_auto(e, "ts").alias("ts_ns"),
        "value",
        "event_id",
    )


# value is (store_path, levels): the store path rides along so the sweep
# below can rmtree the on-disk level store of an evicted entry — without it
# each evicted (app, sf_dir) leaked one mkdtemp dir permanently (r8 ADVICE)
_SERVICE_LEVELS: dict[tuple[str, str], tuple[str, dict[int, "DataFrame"]]] = {}


def service(spark: SparkSession, sf_dir: str) -> HistoryService:
    """HistoryService over MATERIALIZED level tables.

    The reference's core design is answering any-resolution queries from
    maintained rollups, not recomputing them per query
    (/root/reference/src/async_hta_service.hpp:361-441). This memoizes the
    level build per (session, sf_dir) into Parquet tables — the batch
    analogue of the streaming ingest's stored levels — so Q1/Q3 cost is a
    partition-pruned scan of the (log-sized) rollup, independent of raw
    history size. Raw-path queries (Q2 fallthrough, Q4) scan raw, as in
    the reference.

    The level scan DataFrames are memoized alongside the store under the
    same policy as ``sources.tables._RELATION_CACHE`` (keyed by
    applicationId, swept on session change): re-listing the per-metric
    partitioned level dirs cost ~0.2-0.4 s per plan build, and a resident
    service holds its relations exactly like the reference holds its
    open ``metric`` handles.
    """
    import tempfile

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    entry = _SERVICE_LEVELS.get(key)
    if entry is None:
        for stale in [k for k in _SERVICE_LEVELS if k[0] != key[0]]:
            stale_store, _ = _SERVICE_LEVELS.pop(stale)
            shutil.rmtree(stale_store, ignore_errors=True)
        raw = samples(spark, sf_dir)
        built = hta.build_levels(raw, W0, 10, n_levels=3)
        # fresh unique dir: a hash-derived path could collide with a
        # concurrent process writing the same fixture store
        store = tempfile.mkdtemp(prefix="hta_levels_")
        for w, lv in zip(LEVEL_WIDTHS, built):
            lv.repartition("metric").write.mode("overwrite").partitionBy(
                "metric"
            ).parquet(os.path.join(store, f"level_{w}"))
        levels = {
            w: spark.read.parquet(os.path.join(store, f"level_{w}"))
            for w in LEVEL_WIDTHS
        }
        entry = (store, levels)
        _SERVICE_LEVELS[key] = entry
    return HistoryService(raw=samples(spark, sf_dir), levels=dict(entry[1]))


# --------------------------------------------------------------------------
# shared oracle CTEs (DuckDB). delta_ns/integral semantics == operators/hta.py
# --------------------------------------------------------------------------

SAMPLES_CTE = """
samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value, event_id
  FROM events
)"""

DELTAS_CTE = """
deltas AS (
  SELECT metric, ts_ns, value,
         COALESCE(ts_ns - LAG(ts_ns) OVER (PARTITION BY metric ORDER BY ts_ns), 0) AS delta_ns
  FROM samples
)"""


def _level_cte(name: str, src: str, width: int, from_raw: bool) -> str:
    # sum/integral stay DECIMAL(38,6) through the cascade, mirroring
    # operators/hta.py exactly; a double round-trip between levels would
    # lose sub-integer digits of ~1e17-magnitude integrals.
    if from_raw:
        key = f"ts_ns - ts_ns % {width}"
        cols = (
            'MIN(value) AS minimum, MAX(value) AS maximum, '
            'SUM(CAST(value AS DECIMAL(38,6))) AS "sum", COUNT(*) AS "count", '
            f"{sql_bsum('CAST(FLOOR(value * delta_ns / 1000000.0) AS BIGINT)')} AS integral, "
            f"{sql_bsum('delta_ns')} AS active_time"
        )
    else:
        key = f"bucket_start_ns - bucket_start_ns % {width}"
        cols = (
            "MIN(minimum) AS minimum, MAX(maximum) AS maximum, "
            'SUM("sum") AS "sum", ' + sql_bsum('"count"') + ' AS "count", '
            f"{sql_bsum('integral')} AS integral, {sql_bsum('active_time')} AS active_time"
        )
    return f"""
{name} AS (
  SELECT metric, {key} AS bucket_start_ns, {cols}
  FROM {src}
  GROUP BY 1, 2
)"""


LEVELS_SQL = (
    "WITH" + SAMPLES_CTE + "," + DELTAS_CTE + ","
    + _level_cte("level0", "deltas", W0, from_raw=True) + ","
    + _level_cte("level1", "level0", W1, from_raw=False) + ","
    + _level_cte("level2", "level1", W2, from_raw=False)
)


def _present(df: DataFrame) -> DataFrame:
    """Cast the decimal-accumulated fields to the public double/long schema."""
    return df.select(
        *[c for c in df.columns if c not in ("sum", "count", "integral", "active_time")],
        F.col("sum").cast("double").alias("sum"),
        F.col("count").cast("long").alias("count"),
        F.col("integral").cast("long").alias("integral"),
        F.col("active_time").cast("long").alias("active_time"),
    )


# --------------------------------------------------------------------------
# A2+A3+A4: the ingest chain
# --------------------------------------------------------------------------


#: the chain A2->A4->A3 as oracle CTEs, shared by the from-scratch chain
#: query and the serving-path query (which must agree with it exactly)
_CHAIN_CTES = f"""
samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value, event_id FROM events
),
mapping(input, mapped) AS (VALUES {", ".join(f"('{i}', '{n}')" for i, n in MAPPING)}),
renamed AS (
  SELECT COALESCE(m.mapped, s.metric) AS metric, s.ts_ns, s.value, s.event_id
  FROM samples s LEFT JOIN mapping m ON s.metric = m.input
),
valid AS (
  SELECT * FROM renamed WHERE NOT isnan(value) AND NOT isinf(value)
),
kept AS (
  SELECT * FROM valid
  QUALIFY ts_ns > COALESCE(MAX(ts_ns) OVER (
      PARTITION BY metric ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
)"""


@register(
    "hta_ingest_chain",
    oracle=f"""
WITH {_CHAIN_CTES.strip()}
SELECT metric, COUNT(*) AS n, MIN(ts_ns) AS min_ts_ns, MAX(ts_ns) AS max_ts_ns
FROM kept GROUP BY metric
""",
    doc="Full reference ingest chain A2->A4->A3 (rename mapping, NaN/Inf "
    "filter, per-metric monotonicity high-watermark) — batch flavor; "
    "/root/reference/src/async_hta_service.hpp:251-328.",
    bench=True,
    static_plan=True,
)
def hta_ingest_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = samples(spark, sf_dir)
    out = ingest.ingest_batch(raw, MAPPING, metric_col="metric")
    return out.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.min("ts_ns").alias("min_ts_ns"),
        F.max("ts_ns").alias("max_ts_ns"),
    )


@register(
    "hta_ingest_serve",
    oracle=f"""
WITH {_CHAIN_CTES.strip()},
served AS (
  SELECT metric, ts_ns, value, event_id,
         COALESCE(ts_ns - LAG(ts_ns) OVER (PARTITION BY metric ORDER BY ts_ns), 0) AS delta_ns
  FROM kept
)
SELECT metric, COUNT(*) AS n, MIN(ts_ns) AS min_ts_ns, MAX(ts_ns) AS max_ts_ns,
       {sql_bsum('delta_ns')} AS active_time_ns
FROM served GROUP BY metric
""",
    doc="Serving-path per-metric summary over the COMMITTED raw store "
    "(sources/derived.py::raw_serve_table): the chain A2->A4->A3 plus the "
    "per-metric delta_ns lag ran once at write time — exactly what "
    "streaming ingest persists per microbatch (KEPT_SCHEMA/RAW_COLS carry "
    "delta_ns) — so a request is a zero-exchange bucket-aligned scan+agg "
    "with NO monotonicity window and NO lag (VERDICT r9 next-step 4). "
    "hta_ingest_chain stays as the from-scratch ingest-correctness query; "
    "DuckDB's oracle re-runs the full chain (bench layout_note). "
    "Reference parity: queries read the maintained store, never re-ingest "
    "(/root/reference/src/async_hta_service.hpp:361-441).",
    bench=True,
    static_plan=True,
    # one summary row per metric: 4 reduce tasks cover the tiny merge
    # without paying 32 launches (venue latency pin, r13 A/B)
    conf={"spark.sql.shuffle.partitions": "4"},
)
def hta_ingest_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.sources.derived import raw_serve_table

    kept = raw_serve_table(spark, sf_dir, samples, MAPPING)
    return kept.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.min("ts_ns").alias("min_ts_ns"),
        F.max("ts_ns").alias("max_ts_ns"),
        bsum("delta_ns").alias("active_time_ns"),
    )


# --------------------------------------------------------------------------
# A5: the rollup cascade
# --------------------------------------------------------------------------


@register(
    "hta_level0",
    oracle=LEVELS_SQL + """
SELECT metric, bucket_start_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM level0
""",
    doc="Level-0 rollup: six-field Aggregate record per (metric, 1h epoch "
    "bucket) — reference A5 with engine-defined integral semantics. "
    "NON-HEADLINE since r14: this is the full-table EXPORT form (compute "
    "and emit every bucket of history from raw) — a shape production "
    "never pays; ingest materializes the levels once and requests read "
    "them range-pruned (hta_level0_serve, the benched twin). Kept "
    "oracle-checked as the correctness anchor for the cascade; its "
    "honest full-export cost is documented in SCALE.md §6f.",
)
def hta_level0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _present(hta.level0(samples(spark, sf_dir), W0))


@register(
    "hta_level0_serve",
    oracle=LEVELS_SQL + f"""
SELECT metric, bucket_start_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM level0
WHERE bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
""",
    doc="Level-0 SERVING shape (r14, VERDICT r13 #3): a bounded request "
    "range read from the materialized level-0 table — what a production "
    "request actually pays (the cascade ran once at ingest; the request "
    "is a partition-pruned scan whose cost tracks the range, not history "
    "size). DuckDB's oracle recomputes level0 from raw, same layout-note "
    "asymmetry as hta_ingest_serve. hta_level0 remains the from-scratch "
    "full-export correctness anchor (non-headline).",
    bench=True,
    static_plan=True,
    # response rows bounded by range/width (15 days x 1h x |metrics|), so
    # the presentation merge is one tiny task at any corpus size — the
    # same group-bounded pin as hta_q1_aggregate_timeline
    conf={"spark.sql.shuffle.partitions": "1"},
)
def hta_level0_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(
        svc.aggregate_timeline(None, START_NS, END_NS, interval_max_ns=W0)
    )


@register(
    "hta_level1_rollup",
    oracle=LEVELS_SQL + """
SELECT metric, bucket_start_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM level1
""",
    doc="Level-1 rollup built by re-aggregating level 0 (mergeability of the "
    "Aggregate record — SURVEY §1.2).",
)
def hta_level1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lv0 = hta.level0(samples(spark, sf_dir), W0)
    return _present(hta.rollup(lv0, width_ns=W1))


# --------------------------------------------------------------------------
# Q1-Q4 via the HistoryService router
# --------------------------------------------------------------------------


@register(
    "hta_q1_aggregate_timeline",
    oracle=LEVELS_SQL + f"""
SELECT metric, bucket_start_ns, minimum, maximum,
       CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM level1
WHERE metric = 'click' AND bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
""",
    doc="Q1 AGGREGATE_TIMELINE: range scan at the coarsest level whose width "
    "<= interval_max (here 12h -> level1=10h); "
    "/root/reference/src/async_hta_service.hpp:361-392.",
    bench=True,
    static_plan=True,
    # response rows are bounded by the requested range / level width (the
    # protocol's contract — interval_max exists so responses stay small),
    # so the presentation sort is one tiny task at any corpus size (pin
    # sweep: 0.107 -> 0.056 s resident at sf1)
    conf={"spark.sql.shuffle.partitions": "1"},
)
def hta_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(
        svc.aggregate_timeline("click", START_NS, END_NS, interval_max_ns=12 * W0)
    )


@register(
    "hta_timeline_gapfill",
    oracle=LEVELS_SQL + f""",
spine AS (SELECT range AS bucket_start_ns FROM range({START_NS}, {END_NS}, {W0}))
SELECT 'purchase' AS metric, s.bucket_start_ns,
       l.minimum, l.maximum,
       CAST(COALESCE(l."sum", 0) AS DOUBLE) AS "sum",
       CAST(COALESCE(l."count", 0) AS BIGINT) AS "count",
       CAST(COALESCE(l.integral, 0) AS BIGINT) AS integral,
       CAST(COALESCE(l.active_time, 0) AS BIGINT) AS active_time
FROM spine s LEFT JOIN (SELECT * FROM level0 WHERE metric = 'purchase') l
  ON s.bucket_start_ns = l.bucket_start_ns
""",
    doc="Q1 AGGREGATE_TIMELINE over a dense spine: every level-0 bucket in "
    "[start, end) present, gaps filled with the Aggregate merge identity "
    "(count=0, zero sums, NULL min/max). Spine = spark.range (no data "
    "read) left-joined against the broadcast log-sized rollup slice — "
    "zero spine-side exchanges at any range length. The reference emits "
    "sparse timelines (/root/reference/src/async_hta_service.hpp:361-392); "
    "dense timelines are the server-side form dashboards want. (The plan "
    "is fully static — zero hash exchanges, pinned by "
    "test_new_query_plan_shapes — but QuerySpec.static_plan stays False: "
    "that flag is the BENCH executor's AQE-off policy and its extent is "
    "pinned to the exchange-budget table, which covers bench rows only.)",
)
def hta_timeline_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(
        svc.aggregate_timeline_gapfill(
            "purchase", START_NS, END_NS, interval_max_ns=W0
        )
    )


@register(
    "hta_pattern_aggregate",
    oracle=LEVELS_SQL + f"""
SELECT bucket_start_ns, COUNT(metric) AS n_metrics,
       MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral, {sql_bsum('active_time')} AS active_time
FROM level1
WHERE metric LIKE '%u%'
  AND bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
GROUP BY 1
""",
    doc="Fleet Q1 over a metric glob ('*u*' -> purchase+signup): ONE merged "
    "Aggregate timeline across all matching metrics — the cross-metric "
    "application of the rollup monoid "
    "(plans/history.py::aggregate_timeline_pattern). One pruned scan of "
    "the chosen level + one groupBy(bucket); n_metrics = metrics present "
    "per bucket. The reference serves per-metric only "
    "(/root/reference/src/async_hta_service.hpp:361-441); fleet "
    "dashboards otherwise fan out M requests and merge client-side.",
)
def hta_pattern_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(
        svc.aggregate_timeline_pattern("*u*", START_NS, END_NS, 12 * W0)
    )


@register(
    "hta_pattern_q3",
    oracle=LEVELS_SQL + f"""
SELECT COUNT(DISTINCT metric) AS n_metrics,
       MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral, {sql_bsum('active_time')} AS active_time
FROM level0
WHERE metric LIKE '%u%'
  AND bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
""",
    doc="Fleet Q3 over a metric glob: ONE merged Aggregate row across all "
    "matching metrics and the whole range "
    "(plans/history.py::aggregate_pattern) — the glob is a filter on the "
    "grouping key, so Catalyst pushes it through the per-metric "
    "aggregate to the level scans; one ungrouped merge collapses the "
    "per-metric records. Whole-range companion of hta_pattern_aggregate.",
)
def hta_pattern_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(svc.aggregate_pattern("*u*", START_NS, END_NS))


@register(
    "hta_q2_flex_raw",
    oracle=f"""
WITH {SAMPLES_CTE.split('AS', 1)[0].strip()} AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value, event_id FROM events
)
SELECT metric, ts_ns, value FROM samples
WHERE metric = 'purchase' AND ts_ns >= {START_NS} AND ts_ns < {END_NS}
""",
    doc="Q2 FLEX_TIMELINE raw branch: request finer than the finest level "
    "falls through to raw samples; "
    "/root/reference/src/async_hta_service.hpp:427-437.",
)
def hta_q2_flex_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return svc.flex_timeline("purchase", START_NS, END_NS, interval_max_ns=W0 // 2)


@register(
    "hta_q3_aggregate",
    oracle=LEVELS_SQL + f"""
SELECT metric, MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral, {sql_bsum('active_time')} AS active_time
FROM level0
WHERE bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
GROUP BY metric
""",
    doc="Q3 AGGREGATE: one merged Aggregate per metric over [start, end); "
    "/root/reference/src/async_hta_service.hpp:442-464.",
    bench=True,
    static_plan=True,
    # one merged row per metric: map-side partials bound the exchange to
    # |metrics| rows per scan task — one reduce task at any scale (pin
    # sweep: 0.255 -> 0.141 s resident at sf1)
    conf={"spark.sql.shuffle.partitions": "1"},
)
def hta_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    return _present(svc.aggregate(None, START_NS, END_NS))


# Retention-aware Q3 (plans/history.py::aggregate_tiered): fixed synthetic
# floors force every path of the availability-constrained decomposition —
# the W0 floor (Jan 10) blocks fine serving of the early range, the W1
# floor (Jan 3) pushes the coarse left edge, W2 is kept forever. The
# request starts Jan 2 06:00, so the decomposition must gap the sliver
# before W1's first intact bucket, serve the early interior from W1/W2,
# and only use W0 for the late edge. The oracle aggregates the FINEST
# level over exactly the covered segments (disjoint by construction),
# which is the ground truth the multi-level merge must hit bit-exactly
# (mergeability invariant) — on the un-expired fixture data every level
# row exists, so the differential isolates the segment/merge math.
TIER_START_NS = 1_704_175_200_000_000_000  # 2024-01-02T06:00:00Z
TIER_FLOORS = {
    W0: 1_704_844_800_000_000_000,  # 2024-01-10T00:00:00Z
    W1: 1_704_240_000_000_000_000,  # 2024-01-03T00:00:00Z
}
_TIER_SEGS, TIER_GAPS = q3_segments_tiered(
    TIER_START_NS, END_NS, LEVEL_WIDTHS, TIER_FLOORS
)
_TIER_COVER_PRED = " OR ".join(
    f"(bucket_start_ns >= {lo} AND bucket_start_ns < {hi})"
    for _, lo, hi in _TIER_SEGS
)


@register(
    "hta_q3_tiered",
    oracle=LEVELS_SQL + f"""
SELECT metric, MIN(minimum) AS minimum, MAX(maximum) AS maximum,
       CAST(SUM("sum") AS DOUBLE) AS "sum", {sql_bsum('"count"')} AS "count",
       CAST(SUM(integral) AS BIGINT) AS integral, {sql_bsum('active_time')} AS active_time
FROM level0
WHERE {_TIER_COVER_PRED}
GROUP BY metric
""",
    doc="Q3 under tiered retention: merged Aggregate over the maximal "
    "exactly-servable region, expired-raw history answered from retained "
    "coarse levels (degraded resolution, exact values), uncovered edge "
    "slivers reported, never silently clamped.",
)
def hta_q3_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    df, _gaps = svc.aggregate_tiered(None, TIER_START_NS, END_NS, TIER_FLOORS)
    return _present(df)


# Mixed-resolution timeline under the SAME fixed floors: the request asks
# for W0 resolution over [Dec 25, Jan 20); W0 survives only from Jan 10,
# W1 from Jan 3, W2 forever — so the timeline must serve the recent era
# at W0, the middle era at W1, and the early era (incl. the 100h bucket
# that covers the Jan 1-2 data) at W2, with width_ns on every row and
# sub-width alignment slivers at the tier boundaries. The oracle unions
# the per-region DuckDB level slices with the same bounds (computed by
# the pure function the hypothesis suite pins), so the differential
# isolates the per-level slicing + row shape.
TIER_TL_START_NS = 1_703_462_400_000_000_000  # 2023-12-25T00:00:00Z
_TIER_TL_REGIONS, TIER_TL_GAPS = q1_regions_tiered(
    TIER_TL_START_NS, END_NS, LEVEL_WIDTHS, TIER_FLOORS, W0
)
_LEVEL_NAME = {W0: "level0", W1: "level1", W2: "level2"}
_TIER_TL_UNION = "\nUNION ALL\n".join(
    f"""SELECT metric, bucket_start_ns, CAST({w} AS BIGINT) AS width_ns,
       minimum, maximum, CAST("sum" AS DOUBLE) AS "sum", "count",
       integral, active_time
FROM {_LEVEL_NAME[w]}
WHERE bucket_start_ns >= {lo} AND bucket_start_ns < {hi}"""
    for w, lo, hi in _TIER_TL_REGIONS
)


@register(
    "hta_q1_tiered_timeline",
    oracle=LEVELS_SQL + f"""
{_TIER_TL_UNION}
""",
    doc="Q1 under tiered retention: mixed-resolution timeline — each era "
    "at the finest retained width satisfying the requested resolution "
    "(RRD/Graphite fetch semantics), rows carry width_ns, tier-boundary "
    "slivers reported instead of silently skipped.",
)
def hta_q1_tiered_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    df, _gaps = svc.timeline_tiered(
        None, TIER_TL_START_NS, END_NS, W0, TIER_FLOORS
    )
    return _present(df)


@register(
    "hta_q4_last_value",
    oracle=f"""
WITH {SAMPLES_CTE.split('AS', 1)[0].strip()} AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value, event_id FROM events
)
SELECT metric, MAX(ts_ns) AS ts_ns, ARG_MAX(value, ts_ns) AS value
FROM samples GROUP BY metric
""",
    doc="Q4 LAST_VALUE: most recent raw sample per metric (max_by agg, no "
    "sort); /root/reference/src/async_hta_service.hpp:465-488.",
)
def hta_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return service(spark, sf_dir).last_value()


@register(
    "hta_delta_encode",
    oracle=LEVELS_SQL + f"""
SELECT metric, bucket_start_ns,
       bucket_start_ns - COALESCE(LAG(bucket_start_ns) OVER (
           PARTITION BY metric ORDER BY bucket_start_ns), 0) AS time_delta,
       CAST("sum" AS DOUBLE) AS "sum", "count"
FROM level1
WHERE bucket_start_ns >= {START_NS} AND bucket_start_ns < {END_NS}
""",
    doc="A12: delta-encoded response timestamps (time_delta[i] = t[i]-t[i-1] "
    "per metric); /root/reference/src/async_hta_service.hpp:377-380.",
)
def hta_delta_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    svc = service(spark, sf_dir)
    tl = _present(svc.aggregate_timeline(None, START_NS, END_NS, interval_max_ns=W1))
    return HistoryService.delta_encode(tl).select(
        "metric", "bucket_start_ns", "time_delta", "sum", "count"
    )


# --------------------------------------------------------------------------
# A14/A15: self-monitoring stats (conditional counting + derived rates)
# --------------------------------------------------------------------------

DAY_NS = 86_400_000_000_000


@register(
    "hta_stats_rates",
    oracle=f"""
WITH {SAMPLES_CTE.split('AS', 1)[0].strip()} AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value, event_id FROM events
)
SELECT metric, ts_ns - ts_ns % {DAY_NS} AS day_start_ns,
       COUNT(*) AS completed,
       CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS large,
       ROUND(COUNT(*) / 86400.0, 6) AS request_rate,
       ROUND({sql_dsum('value')} / 86400.0, 6) AS data_rate,
       ROUND(CASE WHEN COUNT(*) > 0 THEN {sql_dsum('value')} / COUNT(*) ELSE 0.0 END, 6)
           AS mean_value
FROM samples GROUP BY 1, 2
""",
    doc="A14/A15: windowed conditional counting and derived-rate projection "
    "with guarded division; /root/reference/src/db_stats.cpp:181-206.",
)
def hta_stats_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.functions.timeutil import bucket_start_ns

    df = samples(spark, sf_dir)
    g = df.groupBy(
        "metric", bucket_start_ns("ts_ns", DAY_NS).alias("day_start_ns")
    ).agg(
        F.count("*").alias("completed"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).cast("long").alias("large"),
        dsum("value").alias("__vsum"),
    )
    return g.select(
        "metric",
        "day_start_ns",
        "completed",
        "large",
        F.round(F.col("completed") / 86400.0, 6).alias("request_rate"),
        F.round(F.col("__vsum") / 86400.0, 6).alias("data_rate"),
        F.round(
            F.when(F.col("completed") > 0, F.col("__vsum") / F.col("completed"))
            .otherwise(0.0),
            6,
        ).alias("mean_value"),
    )


@register(
    "hta_subscription_list",
    oracle="SELECT input, name FROM (VALUES "
    + ", ".join(f"('{i}', '{n}')" for i, n in MAPPING)
    + ") AS t(input, name)",
    doc="A19: subscription-list projection of the metric config; "
    "/root/reference/src/async_hta_service.hpp:547-556.",
)
def hta_subscription_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.createDataFrame(MAPPING, ["input", "name"])


# --------------------------------------------------------------------------
# serving extensions over the committed store: linear resampling and
# percentile timelines
# --------------------------------------------------------------------------

#: resample grid step: 30 min
RESAMPLE_STEP_NS = 1_800_000_000_000


@register(
    "hta_resample_linear",
    oracle=f"""
WITH {_CHAIN_CTES.strip()},
sp AS (SELECT range AS pos FROM range({START_NS}, {END_NS}, {RESAMPLE_STEP_NS})),
m AS (SELECT ts_ns, value FROM kept WHERE metric = 'purchase'),
merged AS (
  SELECT pos, CAST(NULL AS DOUBLE) AS v, CAST(NULL AS BIGINT) AS sts, 1 AS is_spine FROM sp
  UNION ALL
  SELECT ts_ns, value, ts_ns, 0 FROM m
),
w AS (
  SELECT pos, is_spine,
    last_value(v IGNORE NULLS) OVER (ORDER BY pos, is_spine
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    last_value(sts IGNORE NULLS) OVER (ORDER BY pos, is_spine
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
    first_value(v IGNORE NULLS) OVER (ORDER BY pos, is_spine
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    first_value(sts IGNORE NULLS) OVER (ORDER BY pos, is_spine
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM merged
)
SELECT 'purchase' AS metric, pos AS ts_ns,
       ROUND(CASE WHEN prev_ts = pos THEN prev_v
             WHEN prev_ts IS NULL OR next_ts IS NULL THEN NULL
             ELSE prev_v + (next_v - prev_v)
                  * CAST(pos - prev_ts AS DOUBLE)
                  / CAST(next_ts - prev_ts AS DOUBLE) END, 6) AS value
FROM w WHERE is_spine = 1
""",
    doc="Linear resampling onto a regular 30-min grid over the COMMITTED "
    "(post-ingest, per-metric strictly monotonic) sample stream — the "
    "interpolating cousin of the gap-filled timeline for clients that "
    "want values, not buckets. Union-merge plan (operators/asof.py's "
    "trick, both directions over ONE sort): grid + samples unioned, "
    "last/first ignore-null window frames give both neighbors without "
    "two as-of joins; exact grid hits take the sample value (incl. a "
    "hit ON the last sample, which has no forward neighbor). No "
    "extrapolation: grid points outside the sample span are NULL.",
)
def hta_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.plans.history import resample_linear

    raw = samples(spark, sf_dir)
    kept = ingest.ingest_batch(raw, MAPPING, metric_col="metric")
    return resample_linear(
        kept, "purchase", START_NS, END_NS, RESAMPLE_STEP_NS
    )


@register(
    "hta_percentile_timeline",
    oracle="""
WITH samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
)
SELECT metric,
       ts_ns - ts_ns % 3600000000000 AS bucket_start_ns,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95
FROM samples
GROUP BY 1, 2
""",
    doc="Percentile timeline: exact interpolated p50/p95 per (metric, 1h "
    "bucket) — the distributional rollup dashboards want next to the "
    "min/max/avg the Aggregate record carries. Exact percentile holds "
    "each group's values during aggregation, bounded by bucket width x "
    "sample rate (fine at any corpus size since groups don't grow with "
    "history length); the MERGEABLE path for percentile *level tables* "
    "is approx_percentile's sketch, which trades the oracle-checkable "
    "exactness pinned here for rollup-cascade compatibility.",
)
def hta_percentile_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = samples(spark, sf_dir)
    return s.groupBy(
        "metric",
        (F.col("ts_ns") - F.col("ts_ns") % W0).alias("bucket_start_ns"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
    )


# --------------------------------------------------------------------------
# distributional level tables: mergeable fixed-bin histograms
# --------------------------------------------------------------------------

#: histogram domain (operators/hta.py defaults): [0, 512) in 32 bins of 16
_H_BIN_SQL = "CAST(GREATEST(0, LEAST(31, FLOOR((value - 0.0) / 16.0))) AS INTEGER)"


@register(
    "hta_histogram_level0",
    oracle=f"""
WITH samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
)
SELECT metric, ts_ns - ts_ns % {W0} AS bucket_start_ns,
       {_H_BIN_SQL} AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM samples GROUP BY 1, 2, 3
""",
    doc="Finest distributional level: sparse fixed-bin value histogram per "
    "(metric, 1h bucket) — the MERGEABLE summary that makes percentile "
    "timelines servable from maintained rollups (a percentile itself is "
    "not mergeable; integer bin counts are, bit-exactly, unlike "
    "approx_percentile's sketch). One exchange, integer-exact, "
    "oracle-checkable; resolution contract = bin width.",
)
def hta_histogram_level0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hta.histogram_level(samples(spark, sf_dir), W0)


@register(
    "hta_histogram_p95_rollup",
    oracle=f"""
WITH samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
),
h0 AS (
  SELECT metric, ts_ns - ts_ns % {W0} AS bucket_start_ns,
         {_H_BIN_SQL} AS bin, CAST(COUNT(*) AS BIGINT) AS n
  FROM samples GROUP BY 1, 2, 3
),
h1 AS (
  SELECT metric, bucket_start_ns - bucket_start_ns % {W1} AS bucket_start_ns,
         bin, CAST(SUM(n) AS BIGINT) AS n
  FROM h0 GROUP BY 1, 2, 3
),
c AS (
  SELECT *, SUM(n) OVER (PARTITION BY metric, bucket_start_ns) AS total,
         SUM(n) OVER (PARTITION BY metric, bucket_start_ns ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM h1
),
hits AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY metric, bucket_start_ns
              ORDER BY bin) AS hit_rank
  FROM c WHERE CAST(cum AS DOUBLE) >= 0.95 * CAST(total AS DOUBLE)
)
SELECT metric, bucket_start_ns, CAST(total AS BIGINT) AS count,
       ROUND(0.0 + 16.0 * (CAST(bin AS DOUBLE)
             + (0.95 * CAST(total AS DOUBLE) - CAST(cum - n AS DOUBLE))
               / CAST(n AS DOUBLE)), 6) AS p95_est
FROM hits WHERE hit_rank = 1
""",
    doc="p95 timeline served from MERGED histograms: level-0 bins rolled "
    "up to 10h buckets by integer sum, then the percentile walked from "
    "cumulative counts with one in-bin interpolation — no raw-data scan; "
    "this is the distributional analogue of the Aggregate rollup cascade "
    "(exact percentiles can't merge, bin counts can; accuracy = one bin "
    "width around the rank order statistic, pinned in tests).",
)
def hta_histogram_p95_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    h0 = hta.histogram_level(samples(spark, sf_dir), W0)
    h1 = hta.histogram_rollup(h0, W1)
    return hta.histogram_percentile(h1, 0.95)


@register(
    "hta_counter_rate",
    oracle=f"""
WITH samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
),
inc AS (
  SELECT metric, ts_ns,
         CASE WHEN prev IS NULL THEN NULL
              WHEN value - prev < 0 THEN value
              ELSE value - prev END AS increase,
         CASE WHEN prev IS NULL THEN NULL ELSE value - prev < 0 END AS is_reset
  FROM (SELECT *, LAG(value) OVER (PARTITION BY metric ORDER BY ts_ns) AS prev
        FROM samples)
)
SELECT metric, ts_ns - ts_ns % {W0} AS bucket_start_ns,
       CAST(ROUND(SUM(CAST(increase AS DECIMAL(38,6))), 6) AS DOUBLE) AS increase,
       CAST(SUM(CASE WHEN is_reset THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       ROUND(CAST(SUM(CAST(increase AS DECIMAL(38,6))) AS DOUBLE)
             / {W0 // 1_000_000_000}, 6) AS rate_per_s
FROM inc GROUP BY 1, 2
""",
    doc="Counter-rate timeline (the monitoring-system rate()/increase() "
    "pair): per-sample non-negative increase with counter-reset "
    "detection (a drop means restart; the post-reset reading is the "
    "increase - the standard under-estimate), bucketed to per-hour "
    "increase, reset count, and rate per second. One per-metric window "
    "+ one groupBy; increase sums in DECIMAL for order-independence. "
    "operators/hta.py::counter_increase.",
)
def hta_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    inc = hta.counter_increase(samples(spark, sf_dir))
    return inc.groupBy(
        "metric",
        (F.col("ts_ns") - F.col("ts_ns") % W0).alias("bucket_start_ns"),
    ).agg(*_counter_aggs())


def _counter_aggs() -> list:
    """Shared counter_rate output record (increase/resets/rate) — kept
    identical between the from-scratch and served-layout queries so the
    two differ only in plan, never in semantics."""
    dec = F.col("increase").cast("decimal(38,6)")
    return [
        F.round(F.sum(dec), 6).cast("double").alias("increase"),
        F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
        F.round(
            F.sum(dec).cast("double") / F.lit(W0 // 1_000_000_000), 6
        ).alias("rate_per_s"),
    ]


@register(
    "hta_counter_serve",
    oracle=f"""
WITH {_CHAIN_CTES.strip()},
inc AS (
  SELECT metric, ts_ns,
         CASE WHEN prev IS NULL THEN NULL
              WHEN value - prev < 0 THEN value
              ELSE value - prev END AS increase,
         CASE WHEN prev IS NULL THEN NULL ELSE value - prev < 0 END AS is_reset
  FROM (SELECT *, LAG(value) OVER (PARTITION BY metric ORDER BY ts_ns) AS prev
        FROM kept)
)
SELECT metric, ts_ns - ts_ns % {W0} AS bucket_start_ns,
       CAST(ROUND(SUM(CAST(increase AS DECIMAL(38,6))), 6) AS DOUBLE) AS increase,
       CAST(SUM(CASE WHEN is_reset THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       ROUND(CAST(SUM(CAST(increase AS DECIMAL(38,6))) AS DOUBLE)
             / {W0 // 1_000_000_000}, 6) AS rate_per_s
FROM inc GROUP BY 1, 2
""",
    doc="Serving-path counter_rate over the COMMITTED raw store "
    "(sources/derived.py::raw_serve_table, which persists prev_value "
    "exactly as streaming ingest's KEPT_SCHEMA does): each sample's "
    "increase/reset derives from the STORED previous value — no lag "
    "window, no exchange beyond the bucket-aligned groupBy — so request "
    "cost is a pruned scan regardless of history length. "
    "hta_counter_rate stays as the from-scratch window form; DuckDB's "
    "oracle re-runs the chain + lag (bench layout_note). Reference "
    "parity: reads serve from maintained state, never re-derive "
    "(/root/reference/src/async_hta_service.hpp:361-441).",
    bench=True,
    static_plan=True,
    # (metric, bucket) reduce side, bounded by range/width: 8 reduce
    # tasks vs 32 saves ~0.04 s of launch floor at sf1 (r13 A/B)
    conf={"spark.sql.shuffle.partitions": "8"},
)
def hta_counter_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.sources.derived import raw_serve_table

    kept = raw_serve_table(spark, sf_dir, samples, MAPPING)
    inc = hta.counter_increase_stored(kept)
    return inc.groupBy(
        "metric",
        (F.col("ts_ns") - F.col("ts_ns") % W0).alias("bucket_start_ns"),
    ).agg(*_counter_aggs())


@register(
    "hta_counter_fleet",
    oracle=f"""
WITH samples AS (
  SELECT event_type AS metric, epoch_ns(ts) AS ts_ns, value FROM events
),
inc AS (
  SELECT metric, ts_ns,
         CASE WHEN prev IS NULL THEN NULL
              WHEN value - prev < 0 THEN value
              ELSE value - prev END AS increase,
         CASE WHEN prev IS NULL THEN NULL ELSE value - prev < 0 END AS is_reset
  FROM (SELECT *, LAG(value) OVER (PARTITION BY metric ORDER BY ts_ns) AS prev
        FROM samples)
)
SELECT ts_ns - ts_ns % {W0} AS bucket_start_ns,
       CAST(ROUND(SUM(CAST(increase AS DECIMAL(38,6))), 6) AS DOUBLE) AS increase,
       CAST(SUM(CASE WHEN is_reset THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
       ROUND(CAST(SUM(CAST(increase AS DECIMAL(38,6))) AS DOUBLE)
             / {W0 // 1_000_000_000}, 6) AS rate_per_s,
       CAST(COUNT(DISTINCT metric) AS BIGINT) AS n_metrics
FROM inc GROUP BY 1
""",
    doc="FLEET counter rate (serve type counter_rate + pattern; "
    "HistoryService.counter_rate_timeline_pattern): per-bucket sum of "
    "every metric's increases — per-metric reset detection and baseline, "
    "then a cross-metric merge, valid because increases are additive "
    "across metrics exactly as across buckets (the same mergeability the "
    "fleet histogram uses for bins). One per-metric window + one groupBy.",
)
def hta_counter_fleet(spark: SparkSession, sf_dir: str) -> DataFrame:
    inc = hta.counter_increase(samples(spark, sf_dir))
    return inc.groupBy(
        (F.col("ts_ns") - F.col("ts_ns") % W0).alias("bucket_start_ns"),
    ).agg(
        *_counter_aggs(),
        F.count_distinct("metric").cast("long").alias("n_metrics"),
    )
