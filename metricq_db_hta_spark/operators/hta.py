"""Hierarchical Timeline Aggregation (HTA) as Spark DataFrame plans.

The reference maintains, per metric, a hierarchy of materialized rollup
levels with widths ``interval_min * interval_factor**k`` and answers history
queries from the coarsest sufficient level (SURVEY.md §1.3, operators A5/A7;
call sites /root/reference/src/async_hta_service.hpp:281-290,361-441). This
module re-expresses that as:

* ``level0(samples, width_ns)`` — the six-field Aggregate record per
  (metric, epoch-aligned bucket) tumbling window, computed with built-in
  JVM-side aggregates (one shuffle on the group key; map-side partial agg).
* ``rollup(level_k)`` — level k -> level k+1 re-aggregation. The Aggregate
  record is mergeable (min/max/sum/count/integral/active_time of a union is
  the pointwise min/max/sum — SURVEY §1.2), which is exactly Spark's
  partial/final aggregation contract, so a factor-F rollup is a plain
  groupBy over F buckets.

Engine-defined integral semantics (SURVEY §7 risk 1 — the reference snapshot
does not ship the hta library, so the edge attribution is *defined* here and
encoded identically in the DuckDB oracle): each sample carries
``delta_ns = ts_ns - lag(ts_ns) over (partition by metric order by ts_ns)``
(0 for the first sample of a metric) and contributes
``floor(value * delta_ns / 1e6)`` — the time-weighted slice quantized to
integer **value*milliseconds** — to the integral, and ``delta_ns`` to
active_time, of **the bucket containing its timestamp** (point attribution,
no edge splitting). Point attribution keeps the record exactly mergeable
across levels, which is the property the hierarchy needs; integer
quantization makes the integral a BIGINT whose sums are exact and
order-independent on any engine (a float integral at value*ns magnitudes
~1e17 cannot be compared reliably across engines: double->decimal casts
disagree — Spark uses shortest round-trip, DuckDB the exact binary
expansion — once ulp exceeds the comparison scale).

Scale notes (100 TB): the lag() window and the level-0 groupBy both hash on
``metric`` — a single shuffle serves both when the input is repartitioned by
metric first. Levels k>=1 re-aggregate level k-1 (each ~1/F the size of its
parent), so the whole cascade costs ~2x the level-0 pass. Storage should be
partitioned by (metric-bucket, time-range) for partition-pruned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.timeutil import bucket_start_ns

#: Aggregate record columns, in schema order
#: (/root/reference/src/async_hta_service.hpp:381-387).
AGG_FIELDS = ("minimum", "maximum", "sum", "count", "integral", "active_time")

DEFAULT_WIDTH_NS = 3_600_000_000_000  # 1 hour
DEFAULT_FACTOR = 10

#: exact accumulator type for sum/integral (see level0 docstring)
DECIMAL = "decimal(38,6)"


def with_delta(
    samples: DataFrame, metric_col: str = "metric", ts_col: str = "ts_ns"
) -> DataFrame:
    """Attach per-sample ``delta_ns`` (gap to the previous sample of the
    same metric; 0 for the first)."""
    w = Window.partitionBy(metric_col).orderBy(ts_col)
    return samples.withColumn(
        "delta_ns",
        (F.col(ts_col) - F.lag(ts_col, 1).over(w)).cast("long"),
    ).fillna({"delta_ns": 0})


def level0(
    samples: DataFrame,
    width_ns: int = DEFAULT_WIDTH_NS,
    metric_col: str = "metric",
    ts_col: str = "ts_ns",
    value_col: str = "value",
) -> DataFrame:
    """Level-0 rollup: six-field Aggregate per (metric, tumbling bucket).

    Input: one row per valid sample (already through the ingest filters,
    operators A3/A4). Output schema matches FIXTURES.md ``agg_level_k``.
    """
    df = with_delta(samples, metric_col, ts_col)
    return (
        df.groupBy(
            F.col(metric_col).alias("metric"),
            bucket_start_ns(ts_col, width_ns).alias("bucket_start_ns"),
        )
        .agg(
            F.min(value_col).alias("minimum"),
            F.max(value_col).alias("maximum"),
            # sum accumulates in DECIMAL(38,6): exact and order-independent,
            # so the rollup cascade is *bit*-mergeable (level k+1 from level
            # k == level k+1 from raw) — float sums would break that under
            # Spark's nondeterministic partial-merge order. integral is
            # BIGINT value*ms (module docstring). Presentation casts back.
            F.sum(F.col(value_col).cast(DECIMAL)).alias("sum"),
            F.count(value_col).alias("count"),
            F.sum(
                F.floor(F.col(value_col) * F.col("delta_ns") / F.lit(1_000_000.0))
            )
            .cast("long")
            .alias("integral"),
            F.sum("delta_ns").cast("long").alias("active_time"),
        )
    )


def rollup(level_k: DataFrame, width_ns: int) -> DataFrame:
    """Re-aggregate level k into a coarser level of width ``width_ns``
    (any multiple of level k's width). Exercises the mergeability property
    (SURVEY §5.3a): rolling up level k must equal computing the coarser
    level directly from raw.
    """
    return (
        level_k.groupBy(
            "metric",
            bucket_start_ns("bucket_start_ns", width_ns).alias("bucket_start_ns"),
        )
        .agg(
            F.min("minimum").alias("minimum"),
            F.max("maximum").alias("maximum"),
            # decimal-in, decimal-out (Spark: sum(decimal(38,6)) -> (38,6))
            F.sum("sum").alias("sum"),
            F.sum("count").cast("long").alias("count"),
            F.sum("integral").cast("long").alias("integral"),
            F.sum("active_time").cast("long").alias("active_time"),
        )
    )


def build_levels(
    samples: DataFrame,
    interval_min_ns: int = DEFAULT_WIDTH_NS,
    factor: int = DEFAULT_FACTOR,
    n_levels: int = 3,
    **cols,
) -> list[DataFrame]:
    """The full cascade: [level0, level1, ...] with widths
    ``interval_min_ns * factor**k`` (reference config triple,
    /root/reference/src/tools/metricq_importer/importer.py:83-91)."""
    levels = [level0(samples, interval_min_ns, **cols)]
    width = interval_min_ns
    for _ in range(1, n_levels):
        width *= factor
        levels.append(rollup(levels[-1], width_ns=width))
    return levels


# ---------------------------------------------------------------------------
# Distributional level tables: mergeable fixed-bin histograms (r10).
#
# The Aggregate record serves min/max/avg at any width, but a percentile is
# NOT mergeable — p95 of two buckets cannot be combined from their p95s, so
# exact-percentile serving (hta_percentile_timeline) must touch raw samples.
# The HTA answer is the same one the Aggregate record embodies: maintain a
# MERGEABLE summary per finest bucket and roll it up. Fixed-bin counts are
# the simplest mergeable distributional summary — integer-exact (so the
# rollup cascade is bit-mergeable and oracle-checkable, unlike
# approx_percentile's sketch), O(bins) per bucket, and any percentile is a
# deterministic walk of the cumulative counts with one in-bin linear
# interpolation (resolution = bin width, the explicit accuracy contract).
# ---------------------------------------------------------------------------

#: default histogram domain/resolution (engine config; values outside the
#: domain clamp into the edge bins, preserving counts and order statistics
#: up to the domain boundary)
HIST_LO = 0.0
HIST_HI = 512.0
HIST_BINS = 32


def histogram_level(
    samples: DataFrame,
    width_ns: int = DEFAULT_WIDTH_NS,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
    metric_col: str = "metric",
    ts_col: str = "ts_ns",
    value_col: str = "value",
) -> DataFrame:
    """Finest distributional level: (metric, bucket_start_ns, bin, n) —
    only non-empty bins are materialized (sparse form; merging is a plain
    SUM over (metric, coarser bucket, bin))."""
    w = (hi - lo) / bins
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(bins - 1), F.floor((F.col(value_col) - lo) / w)),
    ).cast("int")
    return samples.groupBy(
        F.col(metric_col).alias("metric"),
        bucket_start_ns(ts_col, width_ns).alias("bucket_start_ns"),
        b.alias("bin"),
    ).agg(F.count("*").cast("long").alias("n"))


def histogram_rollup(hist: DataFrame, width_ns: int) -> DataFrame:
    """Merge a histogram level into a coarser one: integer-exact, so
    rolling up equals binning the raw samples at the coarse width
    directly (the distributional mergeability property)."""
    return hist.groupBy(
        "metric",
        bucket_start_ns("bucket_start_ns", width_ns).alias("bucket_start_ns"),
        "bin",
    ).agg(F.sum("n").cast("long").alias("n"))


def histogram_percentile(
    hist: DataFrame,
    p: float,
    lo: float = HIST_LO,
    hi: float = HIST_HI,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Serve percentile p from a histogram level: per (metric, bucket),
    walk the cumulative bin counts to the first bin whose cumulative
    count reaches rank r = p * total, then interpolate linearly inside
    that bin — deterministic double arithmetic, identical in any engine
    (the DuckDB oracle runs the same walk). Accuracy contract: the
    selected bin brackets the rank-ceil(p*n) order statistic, so the
    estimate is within one bin width of that SAMPLE (pinned in tests);
    for tiny buckets this can differ more from the R-7 interpolated
    percentile, which blends samples that may sit bins apart.

    Plan shape: two windows over the (tiny, bins-bounded) histogram
    stream sharing one (metric, bucket) partitioning, then a first-hit
    filter — no raw-data scan anywhere; this is what makes percentile
    timelines servable from maintained rollups at any width.
    """
    w = (hi - lo) / bins
    keys = Window.partitionBy("metric", "bucket_start_ns")
    ordered = keys.orderBy("bin")
    cum = (
        hist.withColumn("total", F.sum("n").over(keys))
        .withColumn(
            "cum",
            F.sum("n").over(
                ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    r = F.lit(p) * F.col("total").cast("double")
    hits = cum.filter(F.col("cum").cast("double") >= r).withColumn(
        "hit_rank", F.row_number().over(ordered)
    )
    first_hit = hits.filter(F.col("hit_rank") == 1)
    # in-bin linear interpolation from the rank offset within the bin
    est = (
        F.lit(lo)
        + F.lit(w)
        * (
            F.col("bin").cast("double")
            + (r - (F.col("cum") - F.col("n")).cast("double"))
            / F.col("n").cast("double")
        )
    )
    return first_hit.select(
        "metric",
        "bucket_start_ns",
        F.col("total").alias("count"),
        F.round(est, 6).alias(f"p{int(p * 100)}_est"),
    )


def counter_increase(
    samples: DataFrame,
    metric_col: str = "metric",
    ts_col: str = "ts_ns",
    value_col: str = "value",
) -> DataFrame:
    """Monotonic-counter semantics over a sample stream: per sample, the
    non-negative increase since the previous sample of the same metric,
    with counter RESETS handled the way monitoring systems do — a drop
    (delta < 0) means the counter restarted, so the post-reset reading
    itself is the increase (the standard under-estimate: whatever
    accumulated between the last pre-reset sample and the restart is
    unknowable and counted as zero). The first sample of a metric
    contributes no increase (there is no interval it measures).

    Adds ``increase`` (double) and ``is_reset`` (boolean; NULL on each
    metric's first sample, like increase). One per-metric window — the
    same single exchange every ordered per-metric operator here pays.
    """
    w = Window.partitionBy(metric_col).orderBy(ts_col)
    prev = F.lag(value_col, 1).over(w)
    delta = F.col(value_col) - prev
    return samples.withColumn(
        "increase",
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(delta < 0, F.col(value_col).cast("double"))
        .otherwise(delta.cast("double")),
    ).withColumn(
        "is_reset",
        F.when(prev.isNull(), F.lit(None).cast("boolean")).otherwise(delta < 0),
    )


# ---------------------------------------------------------------------------
# Counter level tables: mergeable monotonic-counter summaries (r11).
#
# A counter_rate request served from raw scans an amount of history
# proportional to the requested range — the one request type whose cost
# grew with raw size. The HTA answer applies once more: the per-bucket
# summary (sum of increases, count of resets) is PLAINLY ADDITIVE under
# the attribution counter_increase already uses — each sample's increase
# (measured against the metric's previous kept sample, wherever it lives)
# is attributed to the bucket containing THAT sample — so fine->coarse
# merging is a SUM, exactly the partial/final aggregation contract the
# Aggregate cascade rides. Level 0 needs each sample's previous VALUE,
# which crosses bucket/partition/batch boundaries; rather than a raw-wide
# window per recompute, the stateful ingest filter emits ``prev_value``
# per kept sample (the same design as ``delta_ns``) and raw persists it,
# making the level-0 recompute a pure per-partition groupBy.
# ---------------------------------------------------------------------------


def counter_increase_stored(
    raw: DataFrame, value_col: str = "value"
) -> DataFrame:
    """``increase``/``is_reset`` from the stored ``prev_value`` column —
    no window, usable on any raw slice without cross-partition context.
    Rows from stores predating the column (no ``prev_value``) get NULLs,
    which under-counts exactly like the metric-first-sample rule."""
    if "prev_value" not in raw.columns:
        raw = raw.withColumn("prev_value", F.lit(None).cast("double"))
    prev = F.col("prev_value")
    delta = F.col(value_col) - prev
    return raw.withColumn(
        "increase",
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(delta < 0, F.col(value_col).cast("double"))
        .otherwise(delta.cast("double")),
    ).withColumn(
        "is_reset",
        F.when(prev.isNull(), F.lit(None).cast("boolean")).otherwise(delta < 0),
    )


def counter_level(
    raw: DataFrame,
    width_ns: int = DEFAULT_WIDTH_NS,
) -> DataFrame:
    """Finest counter level: (metric, bucket_start_ns, increase_sum,
    n_resets) from raw rows carrying ``prev_value``. ``increase_sum``
    accumulates in DECIMAL(38,6) — exact and order-independent, so the
    cascade is bit-mergeable like the Aggregate record's ``sum``; a
    bucket holding only a metric's first-ever sample has a NULL sum
    (no measured interval), which SUM-merges transparently."""
    return _counter_agg(counter_increase_stored(raw), width_ns)


def counter_level_recomputed(
    raw: DataFrame, width_ns: int = DEFAULT_WIDTH_NS
) -> DataFrame:
    """The independent-recompute twin of :func:`counter_level`: derives
    each increase from a per-metric lag window instead of the stored
    ``prev_value`` column, so an audit (fsck) validates the stored
    column rather than trusting it. Equal to ``counter_level`` on full
    raw; under a time-bounded scan the first visible sample per metric
    loses its predecessor (the same boundary-bucket caveat as the
    delta-dependent Aggregate fields)."""
    return _counter_agg(counter_increase(raw), width_ns)


def counter_level_rebuilt(
    raw: DataFrame, width_ns: int = DEFAULT_WIDTH_NS
) -> DataFrame:
    """The REPAIR form (``fsck.rebuild_levels``): baseline per sample is
    ``coalesce(stored prev_value, in-scope lag)``. Where the store
    persisted ``prev_value`` (r11+) the stored chain is authoritative and
    LOSSLESS — a metric's first retained row keeps its true cross-seam /
    pre-retention predecessor instead of being nulled by a scope-bounded
    lag (r12 review finding); where the column predates r11 (NULL
    mid-stream) the lag recompute is the only information there is. The
    two NULL meanings compose: a genuine first-ever sample has NULL in
    both, so the coalesce stays NULL — the correct no-measured-interval
    record."""
    if "prev_value" not in raw.columns:
        raw = raw.withColumn("prev_value", F.lit(None).cast("double"))
    w = Window.partitionBy("metric").orderBy("ts_ns")
    hybrid = raw.withColumn(
        "prev_value",
        F.coalesce(F.col("prev_value"), F.lag("value", 1).over(w)),
    )
    return _counter_agg(counter_increase_stored(hybrid), width_ns)


def _counter_agg(inc: DataFrame, width_ns: int) -> DataFrame:
    return inc.groupBy(
        "metric",
        bucket_start_ns("ts_ns", width_ns).alias("bucket_start_ns"),
    ).agg(
        F.sum(F.col("increase").cast(DECIMAL)).alias("increase_sum"),
        F.sum(F.when(F.col("is_reset"), 1).otherwise(0))
        .cast("long")
        .alias("n_resets"),
    )


def counter_rollup(level_k: DataFrame, width_ns: int) -> DataFrame:
    """Counter level k -> coarser width: plain SUMs (the additivity the
    attribution rule buys)."""
    return level_k.groupBy(
        "metric",
        bucket_start_ns("bucket_start_ns", width_ns).alias("bucket_start_ns"),
    ).agg(
        F.sum("increase_sum").alias("increase_sum"),
        F.sum("n_resets").cast("long").alias("n_resets"),
    )
