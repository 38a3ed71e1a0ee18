"""Structured Streaming ingest: the reference's write path as a streaming
job (SURVEY §3.1; /root/reference/src/async_hta_service.hpp:251-328).

Reference contract reproduced here:

  A1  chunked per-metric delivery  -> file streaming source (one parquet
      file per arriving chunk; swap for Kafka in production — the rest of
      the pipeline is source-agnostic)
  A2  input rename mapping         -> broadcast join with the config table
  A4  NaN/Inf validity filter      -> stateless predicate
  A3  per-metric monotonic drop    -> applyInPandasWithState keyed by
      metric holding the high-watermark ts; state survives microbatches
      and restarts (checkpointed), which is exactly the reference's
      "max_ts starts from metric.range().second" durability semantics
  A5  rollup cascade               -> per-batch partial Aggregate records
      MERGED into the stored level tables (the record is mergeable, so
      partial-from-batch + stored = exact — no reprocessing of raw)
  A6  flush/commit barrier         -> microbatch checkpoint commit
  A13 per-key serialization        -> per-key ordered state updates

The stateful filter also emits each kept sample's ``delta_ns`` (gap to the
previous *kept* sample of that metric, 0 for the first ever) — computed
against the state watermark so integral/active_time are exact across
microbatch boundaries.

Storage layout (Parquet; Delta would add ACID but is not in this
container): ``{store}/raw`` and ``{store}/level_<width>`` partitioned by
metric. Level maintenance uses dynamic partition overwrite of only the
touched metric partitions. At 100 TB the same design holds with
(metric_bucket, time_range) partitioning so a microbatch rewrites a
bounded slice; the merge cost is proportional to batch size + touched
bucket count, never to history size.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metricq_db_hta_spark.operators.ingest import apply_input_mapping
from metricq_db_hta_spark.streaming import store_meta

_log = logging.getLogger(__name__)

#: per-microbatch drops-log rows the driver may hold inline; beyond this
#: the drops aggregate is written distributed (see _process_batch)
_DROPS_INLINE = 1024

SAMPLE_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
    ]
)

KEPT_SCHEMA = StructType(
    [
        StructField("metric", StringType()),
        StructField("ts_ns", LongType()),
        StructField("value", DoubleType()),
        StructField("event_id", LongType()),
        StructField("delta_ns", LongType()),
        # previous kept sample's value (NULL on a metric's first sample
        # ever) — persisted to raw like delta_ns so the counter level
        # family recomputes per-partition without a raw-wide window
        StructField("prev_value", DoubleType()),
        # drop observability (A14; async_hta_service.hpp:292-306): dropped
        # samples since the previous kept sample of this metric, per class
        StructField("drops_mono_before", LongType()),
        StructField("drops_invalid_before", LongType()),
    ]
)

#: state-bucket count: the stateful filter's state key is
#: ``pmod(xxhash64(metric), STATE_BUCKETS)``, NOT the metric itself — one
#: state row per bucket holding the per-metric watermark map (see
#: monotonic_stateful). Like ``spark.sql.shuffle.partitions`` for a
#: stateful query, the count is part of the checkpoint contract: changing
#: it re-keys the state, so it must stay fixed for a checkpoint's
#: lifetime. Sizing: aim for ~10^2-10^4 metrics per bucket — 1024 buckets
#: carry 100k metrics at ~100 entries/bucket (~6 KB state blob) and 10^7
#: metrics at ~10^4 entries (~600 KB blob, still one RocksDB value).
STATE_BUCKETS = 1024

#: per-bucket state: the pickled {metric: (max_ts, pending_mono,
#: pending_invalid, last_value)} watermark map (last_value: the last
#: kept sample's value, NaN before any; pre-r11 3-tuples load with an
#: implied NaN). A binary blob instead of typed columns because the map
#: is variable-length per bucket; pickle of a str->tuple dict is stable
#: across workers (same interpreter).
BUCKET_STATE_SCHEMA = StructType([StructField("wm_blob", BinaryType())])


def _raw_cols(df: DataFrame) -> list:
    """Raw-table column list: the kept-sample schema minus the drop
    counters — the shared tolerant select (sources/rawstore.py), which
    synthesizes ``prev_value`` to NULL when the input predates the
    column, so every consumer sees one schema."""
    from metricq_db_hta_spark.sources.rawstore import raw_col_exprs

    return raw_col_exprs(df)


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """A1 live-source option over TCP: newline-delimited
    ``metric,ts_ns,value,event_id`` records (the dev/test stand-in for the
    reference's AMQP subscription, /root/reference/src/db.cpp:116-122).
    The socket source keeps no offsets, so delivery is at-most-once —
    production uses :func:`kafka_source`; the rest of the pipeline is
    identical either way."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )
    p = F.split(F.col("value"), ",")
    return lines.select(
        p.getItem(0).alias("metric"),
        p.getItem(1).cast("long").alias("ts_ns"),
        p.getItem(2).cast("double").alias("value"),
        p.getItem(3).cast("long").alias("event_id"),
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """A1 production source: Kafka topic with JSON sample payloads
    ``{"metric","ts_ns","value","event_id"}``. Replayable offsets +
    the streaming checkpoint give exactly-once into the store (the same
    ack-after-flush contract as the reference's completion handlers,
    async_hta_service.hpp:327).

    Requires the ``spark-sql-kafka`` package on the cluster classpath —
    not bundled in this container. Without it, ``readStream.load`` fails
    fast at construction with Spark's actionable find-data-source error
    pointing at the Kafka integration guide (contract-tested:
    tests/test_streaming.py::test_kafka_source_package_gate); there is
    no silent fallback.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), SAMPLE_SCHEMA).alias("s")
    ).select("s.*")


def _ns_to_date(c):
    """UTC date of an int64-ns timestamp (raw's partition key)."""
    return F.to_date(F.timestamp_micros(F.floor(c.cast("decimal(38,0)") / 1000).cast("long")))


def _ns_to_month(c):
    """UTC month of an int64-ns timestamp — the LEVEL tables' partition
    key. Levels are log-sized (a few rows per metric-day), so day
    partitions degenerate into thousands of 20-row files whose creation
    dominates the write (measured 22s of a 30s level update); month
    granularity keeps files sane while still pruning range scans."""
    return F.trunc(_ns_to_date(c), "month")


def monotonic_stateful(
    stream: DataFrame,
    seed_df: DataFrame | None = None,
    state_buckets: int = STATE_BUCKETS,
) -> DataFrame:
    """A3 as an arbitrary stateful operator, state-keyed by METRIC BUCKET.

    r9 measured the per-metric-keyed form at 19.0k samples/s on the
    100k-key RocksDB bench vs 87.9k/s for the batch chain — the cost was
    NOT the numpy math but the per-key harness: 100k state-store
    get/put round-trips and 100k three-row pandas frames per microbatch
    (Arrow slicing + iterator protocol per key). Re-keying the state by
    ``pmod(xxhash64(metric), state_buckets)`` amortizes both: one state
    row and ~(metrics/buckets) frames' worth of rows per bucket, with the
    per-metric watermarks held in the bucket's pickled dict. Semantics
    are IDENTICAL — a metric's rows land wholly in one bucket, rows
    process in arrival (event_id) order within the metric, and the
    watermark/pending-drop state carries exactly as before (pinned by the
    stream==batch equivalence tests and the restart/idempotency suite).
    Measured r10, same 300k-samples/100k-key RocksDB bench: 52k samples/s
    on the first (pipeline-compiling) run — the protocol r9's 19.0k was
    measured under — and 165-192k/s once the streaming pipeline is warm,
    i.e. the steady-state rate a long-lived ingest service sees.

    Within a bucket the math is grouped-vectorized — no per-metric Python
    loop over rows: rows sort by (metric, event_id) so metrics form
    contiguous runs; the per-row "running max of earlier arrivals" is a
    grouped cummax shifted one row (run starts reset to the sentinel) and
    max'd with the per-metric seed; keep mask, delta_ns and the per-class
    drop counts (cumsum diffs between kept rows) fall out as array ops.
    A dropped (non-monotonic) row's ts is by definition <= the prior
    running max, so including dropped rows in the cummax cannot change it
    — the cummax over *all* rows equals the running max over *kept* rows,
    which is what makes the one-pass vectorization exact. Only the
    per-UNIQUE-metric seed/pending extraction is a Python loop
    (~metrics/buckets iterations, dict gets — not per row).

    ``seed_df`` is a (metric, store_wm:long) DataFrame of per-metric max
    stored ts_ns, used when a metric has no streaming state yet (fresh
    checkpoint over a non-empty store, or streaming after a backfill). The
    reference seeds max_ts from ``metric.range().second`` — the largest
    *stored* timestamp — not from scratch
    (/root/reference/src/async_hta_service.hpp:258-269); without this, a
    fresh checkpoint could write samples at-or-below already-stored
    timestamps, violating the store-wide monotonicity contract the
    backfill docstring promises. The seed rides a stream-static LEFT JOIN
    on metric, so it stays distributed end to end — no per-metric dict is
    ever materialized on the driver (VERDICT r6 next-step 4: the previous
    dict seed collected one row per metric, a driver-memory bottleneck at
    10^7 metrics). The join shuffles both sides on metric — the same
    partitioning the stateful operator needs anyway, so AQE plans it into
    the exchange the groupBy already pays for.

    The state function is a nested closure with its own imports: Spark's
    Python workers do not have this package installed, so cloudpickle must
    serialize it by value (see operators/multimodal.py pickling note).
    """
    seeded = seed_df is not None
    if seeded:
        cols = [F.col("metric"), F.col("store_wm").cast("long")]
        # stores written before r11 seed no last value: the first kept
        # sample after restart gets a NULL prev_value (counter under-
        # count at the seam, same rule as a metric's first sample ever)
        if "store_lastv" in seed_df.columns:
            cols.append(F.col("store_lastv").cast("double"))
        else:
            cols.append(
                F.lit(None).cast("double").alias("store_lastv")
            )
        stream = stream.join(seed_df.select(*cols), on="metric", how="left")
    stream = stream.withColumn(
        "__bucket", F.pmod(F.xxhash64("metric"), F.lit(state_buckets))
    )

    def bucket_state_fn(key, pdfs, state):
        import pickle as _pickle

        import numpy as _np
        import pandas as _pd

        sentinel = _np.iinfo(_np.int64).min
        # {metric: (max_ts_or_sentinel, pending_mono, pending_invalid,
        #           last_value_or_nan)}
        wm = _pickle.loads(state.get[0]) if state.exists else {}
        dirty = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            dirty = True
            pdf = pdf.sort_values(["metric", "event_id"], kind="mergesort")
            codes, uniques = _pd.factorize(pdf["metric"], sort=False)
            ts = pdf["ts_ns"].to_numpy(_np.int64)
            vals = pdf["value"].to_numpy(_np.float64)
            valid = _np.isfinite(vals)
            # invalid samples never advance the watermark (the reference
            # rejects them before insert) — mask them out of the cummax
            ts_eff = _np.where(valid, ts, sentinel)
            # metrics are contiguous runs after the sort, and factorize
            # codes are appearance-ordered, so run j spans
            # [first_idx[j], last_idx[j]]
            _, first_idx = _np.unique(codes, return_index=True)
            last_idx = _np.append(first_idx[1:] - 1, len(codes) - 1)

            # per-unique-metric seed (state watermark, max'd with the
            # store watermark when a seed_df rides along — a backfill may
            # have advanced the STORE past this stream's checkpointed
            # watermark; without the max a resumed stream could write
            # at-or-below already-stored timestamps) + carried pendings
            if seeded:
                sw = pdf["store_wm"].to_numpy()
                slv = pdf["store_lastv"].to_numpy(_np.float64)
            n_u = len(uniques)
            base_u = _np.empty(n_u, dtype=_np.int64)
            pend_m_u = _np.zeros(n_u, dtype=_np.int64)
            pend_i_u = _np.zeros(n_u, dtype=_np.int64)
            lastv_u = _np.full(n_u, _np.nan, dtype=_np.float64)
            for j, u in enumerate(uniques):
                st = wm.get(u)
                if st is None:
                    b = sentinel
                elif len(st) == 3:  # pre-r11 state blob: no last value
                    b, pend_m_u[j], pend_i_u[j] = st
                else:
                    b, pend_m_u[j], pend_i_u[j], lastv_u[j] = st
                if seeded:
                    v = sw[first_idx[j]]
                    if not _pd.isna(v):
                        iv = int(v)
                        if iv > b:
                            b = iv
                            # the store's watermark wins -> its last
                            # stored value is the counter baseline
                            lastv_u[j] = slv[first_idx[j]]
                base_u[j] = b

            # running max of EARLIER arrivals within the metric: grouped
            # cummax shifted one row (run starts reset), max'd with seed
            cm = _pd.Series(ts_eff).groupby(codes, sort=False).cummax()
            cm = cm.to_numpy(_np.int64)
            prev = _np.empty_like(ts)
            prev[0] = sentinel
            prev[1:] = cm[:-1]
            prev[first_idx] = sentinel
            _np.maximum(prev, base_u[codes], out=prev)

            mono_ok = ts > prev
            keep = valid & mono_ok
            mono_drop = valid & ~mono_ok
            inv_drop = ~valid
            # grouped (per-metric) cumulative drop counts
            gm = (
                _pd.Series(mono_drop.astype(_np.int64))
                .groupby(codes, sort=False)
                .cumsum()
                .to_numpy(_np.int64)
            )
            gi = (
                _pd.Series(inv_drop.astype(_np.int64))
                .groupby(codes, sort=False)
                .cumsum()
                .to_numpy(_np.int64)
            )
            tot_m, tot_i = gm[last_idx], gi[last_idx]
            # defaults (metric had no kept row this chunk): pendings grow
            new_pm = pend_m_u + tot_m
            new_pi = pend_i_u + tot_i

            k_idx = _np.flatnonzero(keep)
            if k_idx.size:
                k_codes = codes[k_idx]
                k_first = _np.ones(k_idx.size, dtype=bool)
                k_first[1:] = k_codes[1:] != k_codes[:-1]
                k_last = _np.ones(k_idx.size, dtype=bool)
                k_last[:-1] = k_codes[1:] != k_codes[:-1]
                k_gm, k_gi = gm[k_idx], gi[k_idx]
                # drops since the previous kept sample of the metric
                # (A14 observability); state pendings attach to the first
                # kept row, batch-edge drops carry forward via new_p*
                pm = _np.empty_like(k_gm)
                pi = _np.empty_like(k_gi)
                pm[0] = 0
                pi[0] = 0
                pm[1:] = k_gm[:-1]
                pi[1:] = k_gi[:-1]
                pm[k_first] = 0
                pi[k_first] = 0
                mono_counts = k_gm - pm
                inv_counts = k_gi - pi
                fc = k_codes[k_first]
                mono_counts[k_first] += pend_m_u[fc]
                inv_counts[k_first] += pend_i_u[fc]
                lc = k_codes[k_last]
                new_pm[lc] = tot_m[lc] - k_gm[k_last]
                new_pi[lc] = tot_i[lc] - k_gi[k_last]

                prev_kept = prev[k_idx]
                delta = ts[k_idx] - prev_kept
                delta[prev_kept == sentinel] = 0  # first sample ever
                # previous KEPT sample's value: in-chunk grouped shift,
                # run starts seeded from state/store (NaN -> first
                # sample ever; Arrow's from_pandas maps NaN to NULL)
                k_vals = vals[k_idx]
                pv = _np.empty_like(k_vals)
                pv[0] = _np.nan
                pv[1:] = k_vals[:-1]
                pv[k_first] = lastv_u[k_codes[k_first]]
                kept = pdf.iloc[k_idx][
                    ["metric", "ts_ns", "value", "event_id"]
                ].assign(
                    delta_ns=delta,
                    prev_value=pv,
                    drops_mono_before=mono_counts,
                    drops_invalid_before=inv_counts,
                )
                yield kept
                # last kept value per metric carries into the new state
                lastv_u[k_codes[k_last]] = k_vals[k_last]

            # new per-metric watermark: seed max'd with the chunk's
            # grouped max of ts_eff (valid non-kept rows are <= the
            # running max by definition, so they cannot raise it)
            wm_u = _np.maximum(base_u, cm[last_idx])
            for j, u in enumerate(uniques):
                wm[u] = (
                    int(wm_u[j]),
                    int(new_pm[j]),
                    int(new_pi[j]),
                    float(lastv_u[j]),
                )
        if dirty:
            state.update((_pickle.dumps(wm, protocol=4),))

    return stream.groupBy("__bucket").applyInPandasWithState(
        bucket_state_fn,
        outputStructType=KEPT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_level_partials(kept: DataFrame, width_ns: int) -> DataFrame:
    """Six-field partial Aggregate records for one microbatch (delta_ns
    already exact from the stateful filter)."""
    bucket = (F.col("ts_ns") - (F.col("ts_ns") % F.lit(width_ns))).cast("long")
    return kept.groupBy("metric", bucket.alias("bucket_start_ns")).agg(
        F.min("value").alias("minimum"),
        F.max("value").alias("maximum"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("sum"),
        F.count("value").alias("count"),
        F.sum(F.floor(F.col("value") * F.col("delta_ns") / F.lit(1_000_000.0)))
        .cast("long")
        .alias("integral"),
        F.sum("delta_ns").cast("long").alias("active_time"),
    )


# NOTE: level maintenance recomputes touched buckets from raw rather than
# merging partials into stored records — merging is not replay-idempotent
# (a retried microbatch would double-apply its partial). The Aggregate
# record's mergeability (SURVEY §1.2) is still load-bearing: it is what
# makes the per-bucket recompute a plain partial/final hash aggregation,
# and operators/hta.py::rollup is the batch-side merge.


class StreamingIngest:
    """End-to-end streaming ingest service.

    ``start(input_dir)`` runs A1->A6 with ``availableNow`` (drain all
    pending chunks then stop — the test/backfill mode) or a processing-
    time trigger (service mode).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        level_widths_ns: tuple[int, ...] = (3_600_000_000_000,),
        mapping: DataFrame | None = None,
        raw_partition: str = "month",
        hist_widths_ns: tuple[int, ...] = (),
        counter_widths_ns: tuple[int, ...] = (),
    ) -> None:
        if raw_partition not in ("day", "month"):
            raise ValueError(f"raw_partition must be 'day' or 'month': {raw_partition}")
        # the level cascade builds each coarser level from the one below
        # (bucket truncation), which is only correct for ascending widths
        # where each is an integer multiple of its predecessor — validate
        # up front instead of serving silently wrong aggregates
        for widths in (level_widths_ns, hist_widths_ns, counter_widths_ns):
            for a, b in zip(widths, widths[1:]):
                if b <= a or b % a != 0:
                    raise ValueError(
                        f"level widths must ascend in integer multiples; got "
                        f"{b} after {a} in {widths}"
                    )
            if widths and widths[0] <= 0:
                raise ValueError(f"level width must be positive: {widths}")
        self.spark = spark
        self.store = store_dir
        self.widths = level_widths_ns
        # OPTIONAL distributional levels: per-(metric, bucket) fixed-bin
        # histograms maintained by the same touched-partition cascade as
        # the Aggregate levels (operators/hta.py histogram_* — integer
        # bin counts are mergeable, which is all the cascade needs);
        # empty tuple = off, zero cost
        self.hist_widths = hist_widths_ns
        # OPTIONAL counter levels: per-(metric, bucket) monotonic-counter
        # summaries (increase_sum, n_resets) — additive under the
        # attribute-to-the-later-sample rule, so the same cascade
        # maintains them; level 0 reads raw's stored prev_value column
        self.counter_widths = counter_widths_ns
        self.mapping = mapping
        # raw's time partition granularity. Month by default: raw data
        # density at reference scale (~40 samples/bucket, 1 Hz fleet) makes
        # day dirs degenerate into thousands of tiny files whose creation
        # dominates the write; parquet row-group min/max skipping on ts_ns
        # still prunes within a month. A deployment with denser metrics
        # flips to "day" — the planner prunes either layout.
        self.raw_partition = raw_partition

    # -- paths -------------------------------------------------------------
    @property
    def raw_path(self) -> str:
        return os.path.join(self.store, "raw")

    def level_path(self, width_ns: int) -> str:
        return os.path.join(self.store, f"level_{width_ns}")

    def hist_path(self, width_ns: int) -> str:
        return os.path.join(self.store, f"hist_{width_ns}")

    def counter_path(self, width_ns: int) -> str:
        return os.path.join(self.store, f"counter_{width_ns}")

    def checkpoint_path(self) -> str:
        return os.path.join(self.store, "_checkpoint")

    @property
    def commit_marker_path(self) -> str:
        return store_meta.marker_path(self.store)

    # -- durability (A6) ---------------------------------------------------
    # the marker format and batch-dir layout have ONE owner
    # (streaming/store_meta.py), shared with operators/maintenance.py —
    # these thin methods exist for call-site readability only
    def _raw_batches_on_disk(self) -> set[int]:
        return store_meta.raw_batches_on_disk(self.store)

    def _raw_present(self) -> bool:
        """True iff raw holds at least one batch directory. The bare
        ``os.path.exists(raw_path)`` test is wrong after retention fully
        expires a store: the root dir survives with ZERO batch dirs and a
        parquet read of it dies on schema inference — such a store must
        behave exactly like a fresh one (no watermark, fresh allocator,
        fresh_store level cascade)."""
        return bool(store_meta.raw_batches_on_disk(self.store))

    def _read_raw(self) -> DataFrame:
        """The writer-side authoritative raw view: everything on disk
        MINUS the exactly-once exclusions — retired batches (deferred-
        delete compaction sources whose rows live on in the dest) AND,
        while a compaction journal is pending, the journal's
        state-appropriate side (``writing``: the partial dest; ``written``:
        the surviving source duplicates). r14 review: filtering only
        retired let a backfill racing a live compaction read BOTH the
        verified dest and its not-yet-deleted sources and double-count
        every compacted row into recomputed level partitions. No filter is
        added in the common case, keeping the plan byte-identical to a
        bare read."""
        from metricq_db_hta_spark.sources.rawstore import read_raw

        raw = read_raw(self.spark, self.store)
        excluded = store_meta.excluded_batches_for_read(self.store)
        if excluded:
            raw = raw.filter(
                ~F.col("ingest_batch").isin([int(b) for b in excluded])
            )
        return raw

    def _commit(self, batch_ids: set[int]) -> None:
        """Atomic durability barrier (reference A6, metric.flush() at
        async_hta_service.hpp:308): after the level writes complete, add
        exactly the finished batch ids to the committed set. Incremental,
        not commit-everything-on-disk: a torn batch from an earlier crash
        may still be on disk, and committing it here would disable its
        recover() repair."""
        store_meta.update_commit_marker(self.store, add=batch_ids)

    def _committed_batches(self) -> set[int]:
        return store_meta.committed_batches(self.store)

    def recover(self) -> set[int]:
        """Crash-recovery contract. Raw is the source of truth and is
        self-healing (a crashed microbatch replays from the checkpoint and
        dynamic-overwrites exactly its own partitions); the LEVEL tables
        are derived state, so a crash between the raw write and the level
        commit can leave a level partition torn. Detection: any raw batch
        not covered by the commit marker. Repair: recompute those batches'
        touched level partitions from raw — the same recompute-not-merge
        path a live microbatch uses. Returns the recovered batch ids.

        Restarting the stream performs the same repair implicitly (the
        uncommitted batch replays); recover() is for serving reads from a
        store whose writer died and has not restarted.
        """
        self._settle_pending_compaction()
        # retired dirs (deferred-delete compaction sources awaiting
        # vacuum) are on disk but deliberately uncommitted — their rows
        # live on in the compaction dest, so "repairing" them here would
        # double-count level buckets and re-commit duplicates
        # excluded_batches_for_read, not just retired (r14 review): while
        # a LIVE compaction's journal is in the writing state its partial
        # dest is on disk and uncommitted — "repairing" levels from it and
        # committing it would bake half a batch into derived state
        suspect = (
            self._raw_batches_on_disk()
            - self._committed_batches()
            - store_meta.excluded_batches_for_read(self.store)
        )
        j = store_meta.read_journal(self.store)
        if j is not None:
            # a pending journal that survived the settle above belongs to
            # a LIVE compaction (skip_live): every id it names — dest AND
            # sources — is that compactor's to finish, never recover()'s
            # to adopt (early-committing its verified dest would double-
            # count rows against the still-committed sources)
            suspect -= {int(j["dest"]), *(int(b) for b in j["sources"])}
        if not suspect:
            return set()
        # the level recompute reads through the exactly-once writer view
        # (r14 review #2: the bare read_raw includes retired batches and a
        # pending journal's duplicate side — recomputing touched level
        # partitions from that double-counts every duplicated row into
        # derived state); suspect ids are never excluded, so the filter
        # below still sees them all
        raw = self._read_raw()
        kept = raw.filter(F.col("ingest_batch").isin([int(b) for b in suspect]))
        kept = kept.select(*_raw_cols(kept))
        if not kept.isEmpty():
            self._update_levels(kept.localCheckpoint(eager=True), raw)
        self._commit(suspect)
        return suspect

    # -- batch sink --------------------------------------------------------
    def _process_batch(self, kept: DataFrame, batch_id: int) -> None:
        """Retry-idempotent sink. foreachBatch may replay a batch after a
        mid-write failure, so nothing here may be an unconditional append:

        * raw is partitioned by (ingest_batch, metric, ts_month|ts_date);
          batch N's files all live under raw/ingest_batch=N/, so a replay
          reclaims that subtree and appends — rewriting exactly batch N's
          rows (the stateful filter's output for a replayed batch is
          identical: its state store is versioned per batch). No duplicate
          rows, ever. (r12: this replaced dynamic-partition overwrite,
          which reached the same end state at ~3x the write cost — see the
          raw-write comment below.)
        * level tables are NOT merged incrementally from partials (merging
          twice would double-count on replay); instead every touched bucket
          is RECOMPUTED from raw — which the raw write just made correct —
          and its (metric, bucket_month) partitions dynamically overwritten.
          Recompute cost is bounded by the batch's touched buckets (time
          locality), never full history. Exact because raw stores each
          sample's state-derived delta_ns (no cross-partition lag needed).
        """
        spark = kept.sparkSession
        # decided BEFORE the raw write: an empty store means raw will equal
        # exactly this batch's kept rows, unlocking the in-memory level
        # cascade below (no prior rows can exist in any partition)
        fresh_store = not self._raw_present()
        # eager checkpoint, not persist(): kept's lineage may read the very
        # store this method mutates (backfill's watermark join does) — the
        # raw write would invalidate a cache and silently recompute kept
        # against the post-write store (observed: watermark filter then
        # drops every row and the level maintenance no-ops)
        kept = kept.localCheckpoint(eager=True)
        try:
            if kept.isEmpty():
                return
            # A14 drop observability: per-metric skip counts into the drops
            # log + one rate-limited log line per microbatch (the
            # reference's LoggingConfig batches the same way)
            if "drops_mono_before" in kept.columns:
                drops = (
                    kept.groupBy("metric")
                    .agg(
                        F.sum("drops_mono_before").cast("long").alias("mono_drops"),
                        F.sum("drops_invalid_before")
                        .cast("long")
                        .alias("invalid_drops"),
                        F.count("*").alias("kept_samples"),
                    )
                    .filter((F.col("mono_drops") > 0) | (F.col("invalid_drops") > 0))
                )
                # Bounded driver materialization: the common case (a few
                # dropping metrics) collects at most _DROPS_INLINE+1 rows
                # and writes them in one tiny file, same cost as before;
                # past the bound the aggregate is written DISTRIBUTED and
                # the driver never holds one row per metric (VERDICT r6:
                # the previous unconditional collect() was a driver-memory
                # bottleneck at 10^7 metrics).
                head = drops.limit(_DROPS_INLINE + 1).collect()
                if head:
                    summary = {
                        r["metric"]: (r["mono_drops"], r["invalid_drops"])
                        for r in head[:20]
                    }
                    _log.info(
                        "ingest batch %s dropped samples (%s%d metrics shown): %s",
                        batch_id,
                        ">" if len(head) > 20 else "",
                        min(len(head), 20),
                        summary,
                    )
                    log_df = (
                        spark.createDataFrame(head, drops.schema).coalesce(1)
                        if len(head) <= _DROPS_INLINE
                        else drops  # recompute from the checkpointed batch
                    )
                    # partitioned by ingest_batch, same batch-subtree
                    # retry-idempotence as the raw write below: a replayed
                    # microbatch reclaims exactly its own batch's drop
                    # rows instead of appending them twice — via the same
                    # stage-then-swap as raw (ADVICE r12: never delete the
                    # committed subtree before the replacement is durable)
                    drops_root = os.path.join(self.store, "drops_log")
                    drops_dir = os.path.join(
                        drops_root, f"ingest_batch={int(batch_id)}"
                    )
                    if os.path.isdir(drops_dir):
                        staging = store_meta.replay_stage_path(
                            drops_root, int(batch_id)
                        )
                        # liveness marker BEFORE the job: keeps a racing
                        # maintenance settle from rmdir'ing the staging
                        # root under Spark's own mkdirs, and gives its
                        # pre-flight the refuse-live signal (r14)
                        store_meta.mark_replay_writer(drops_root)
                        try:
                            log_df.write.mode("overwrite").parquet(staging)
                            store_meta.swap_replayed_subtree(
                                drops_root, int(batch_id)
                            )
                        except BaseException:
                            # in-process crash: drop the writer flock so
                            # the next settle sees a provably dead writer,
                            # not a live one forever (marker stays — its
                            # mtime documents the recent write)
                            store_meta.release_replay_writer(drops_root)
                            raise
                    else:
                        (
                            log_df.withColumn(
                                "ingest_batch", F.lit(int(batch_id))
                            )
                            .write.mode("append")
                            .partitionBy("ingest_batch")
                            .parquet(drops_root)
                        )
            # A6: idempotent raw write (see docstring); (metric, time)
            # sub-partitioning gives Q2/Q4 range scans partition pruning
            if self.raw_partition == "day":
                tcol, texpr = "ts_date", _ns_to_date(F.col("ts_ns"))
            else:
                tcol, texpr = "ts_month", _ns_to_month(F.col("ts_ns"))
            # Idempotence WITHOUT dynamic overwrite (r12): every file this
            # write produces lives under raw/ingest_batch=<id>/ — the batch
            # id uniquely owns its subtree — so a replay only needs to
            # reclaim that subtree. Dynamic-partition overwrite reached the
            # same end state but paid its staging+commit machinery on EVERY
            # batch (measured 2.9 s vs 0.8 s for a 1M-row batch, ~30% of
            # backfill wall). The LEVEL tables keep dynamic overwrite:
            # their touched (metric, bucket_month) partitions are not
            # batch-owned.
            #
            # Replay reclaim is stage-then-swap, never delete-then-append
            # (ADVICE r12): rmtree before the append job left batch N's
            # rows absent from raw for the whole job if it failed, while
            # the marker still claimed N committed — maintenance run in
            # that window would bake the loss into level tables. Now the
            # replacement is written to raw/_replay_staging/<N> (readers
            # ignore the underscore dir), and the committed subtree is
            # touched only AFTER the new files are durable — two atomic
            # renames, every crash point settled by
            # store_meta.settle_replay_staging.
            replay_dir = store_meta.batch_dir(self.store, int(batch_id))
            writer = (
                kept.select(*_raw_cols(kept))
                .withColumn(tcol, texpr)
                # repartition on BOTH partition keys: with only the metric
                # key, each of a handful of tasks serially creates one
                # directory per date (measured 3x slower at 300 dates)
                .repartition("metric", tcol)
            )
            if os.path.isdir(replay_dir):
                staging = store_meta.replay_stage_path(
                    self.raw_path, int(batch_id)
                )
                # liveness marker BEFORE the job (see drops_log branch)
                store_meta.mark_replay_writer(self.raw_path)
                try:
                    (
                        writer.write.mode("overwrite")
                        .partitionBy("metric", tcol)
                        .parquet(staging)
                    )
                    store_meta.swap_replayed_subtree(
                        self.raw_path, int(batch_id)
                    )
                except BaseException:
                    # see drops_log branch: flock off, marker stays
                    store_meta.release_replay_writer(self.raw_path)
                    raise
            else:
                (
                    writer.withColumn("ingest_batch", F.lit(int(batch_id)))
                    .write.mode("append")
                    .partitionBy("ingest_batch", "metric", tcol)
                    .parquet(self.raw_path)
                )
            if fresh_store:
                # raw on disk == kept (just written to an empty store):
                # aggregate the already-checkpointed rows instead of
                # reading 10^6 rows back from disk
                raw = kept.select(*_raw_cols(kept))
            else:
                raw = self._read_raw()
            self._update_levels(kept, raw, fresh_store=fresh_store)
            # A6 durability barrier: the marker certifies THIS batch's
            # derived level state is fully on disk (see recover())
            self._commit({batch_id})
        finally:
            kept.unpersist()  # releases the checkpointed blocks

    def _update_levels(
        self, kept: DataFrame, raw: DataFrame, fresh_store: bool = False
    ) -> None:
        """A5: recompute every touched (metric, bucket_month) PARTITION of
        each level. Granularity matters twice over:

        - dynamic overwrite replaces whole date partitions, so recomputing
          only touched *buckets* would delete untouched buckets sharing a
          date;
        - level 0 recomputes from raw, but each coarser level CASCADES
          from the level just rewritten below it (the Aggregate record is
          mergeable) — recomputing every level from raw would re-scan raw
          once per level.

        ``fresh_store`` (the store was EMPTY before this batch — bulk
        import, the reference importer's case) cascades in memory: each
        level's recomputed rows are eagerly checkpointed and feed the next
        level directly, skipping every read-back from disk. Only valid on
        a fresh store: with prior history, an untouched lower-level month
        can still contribute to a touched coarser bucket that straddles a
        month boundary, so the general path must re-read the full lower
        level from disk (the semi-join then restricts it).

        The same recompute-touched-partitions cascade maintains the
        OPTIONAL distributional (histogram) levels — ``_update_cascade``
        is the shared engine, parameterized on the summary family
        (partials fn, merge fn, path layout); mergeability is the only
        property the cascade needs, and both the Aggregate record and
        integer bin counts have it.
        """
        from metricq_db_hta_spark.operators.hta import rollup

        self._update_cascade(
            kept, raw, self.widths, self.level_path,
            batch_level_partials, rollup, fresh_store,
        )
        if self.hist_widths:
            from metricq_db_hta_spark.operators.hta import (
                histogram_level,
                histogram_rollup,
            )

            self._update_cascade(
                kept, raw, self.hist_widths, self.hist_path,
                histogram_level, histogram_rollup, fresh_store,
            )
        if self.counter_widths:
            from metricq_db_hta_spark.operators.hta import (
                counter_level,
                counter_rollup,
            )

            self._update_cascade(
                kept, raw, self.counter_widths, self.counter_path,
                counter_level, counter_rollup, fresh_store,
            )

    def _update_cascade(
        self,
        kept: DataFrame,
        raw: DataFrame,
        widths: tuple[int, ...],
        path_fn,
        level0_fn,
        rollup_fn,
        fresh_store: bool = False,
    ) -> None:
        spark = kept.sparkSession
        lower_path: str | None = None
        lower_df: DataFrame | None = None
        ckpts: list[DataFrame] = []
        try:
            for width in widths:
                bucket = (
                    F.col("ts_ns") - (F.col("ts_ns") % F.lit(width))
                ).cast("long")
                touched = (
                    kept.select(
                        "metric", _ns_to_month(bucket).alias("bucket_month")
                    ).distinct()
                )
                if lower_path is None:
                    src = raw
                    src_bucket = (
                        src["ts_ns"] - (src["ts_ns"] % F.lit(width))
                    ).cast("long")
                else:
                    src = (
                        lower_df
                        if fresh_store and lower_df is not None
                        else spark.read.parquet(lower_path)
                    )
                    src_bucket = (
                        src["bucket_start_ns"]
                        - (src["bucket_start_ns"] % F.lit(width))
                    ).cast("long")
                relevant = src.join(
                    F.broadcast(touched),
                    (src["metric"] == touched["metric"])
                    & (_ns_to_month(src_bucket) == touched["bucket_month"]),
                    "left_semi",
                )
                if lower_path is None:
                    recomputed = level0_fn(relevant, width)
                else:
                    recomputed = rollup_fn(
                        relevant.drop("bucket_month"), width
                    )
                recomputed = recomputed.withColumn(
                    "bucket_month", _ns_to_month(F.col("bucket_start_ns"))
                )
                path = path_fn(width)
                if fresh_store:
                    # one compute into memory (level rows are log-sized),
                    # then both the write and the next level read blocks
                    recomputed = recomputed.localCheckpoint(eager=True)
                    ckpts.append(recomputed)
                # else: single job per level — no level reads its own
                # output path (level k scans raw or level k-1), so the
                # write action IS the materialization barrier; an eager
                # localCheckpoint here would double the compute without
                # the in-memory cascade consuming it
                writer = recomputed.repartition(
                    "metric", "bucket_month"
                ).write
                if fresh_store and not os.path.isdir(path):
                    # truly fresh table (no raw before this batch AND no
                    # table dir — e.g. not a tiered store whose raw fully
                    # expired while levels live on): append == dynamic
                    # overwrite at ~1/3 the write cost. A torn first
                    # batch that DID land raw re-enters as
                    # fresh_store=False and dynamic-overwrites the torn
                    # partitions (r12, same reasoning as the raw write).
                    writer = writer.mode("append")
                else:
                    writer = writer.mode("overwrite").option(
                        "partitionOverwriteMode", "dynamic"
                    )
                writer.partitionBy("metric", "bucket_month").parquet(path)
                lower_path = path
                lower_df = recomputed
        finally:
            for c in ckpts:
                c.unpersist()

    def _settle_pending_compaction(self, refuse_live: bool = False) -> None:
        """A torn compaction journal means raw may hold a row twice (the
        merged dest copy AND its undeleted sources) or a partial dest
        batch — either would poison any level recompute or watermark seed
        that reads raw. Every store entry point (recover, start, backfill)
        settles the journal FIRST via the maintenance module's
        rollback/roll-forward, not just the CLI compact path (round-7
        review finding: recover() on a crashed-compaction store used to
        'repair' level partitions from the duplicated raw and serve
        double-counted buckets forever)."""
        # local import: operators.maintenance is a consumer of this
        # module's store (via store_meta), not a dependency of it
        from metricq_db_hta_spark.operators.maintenance import (
            recover_compaction,
        )

        # a crashed replay swap is settled FIRST (ADVICE r12): the journal
        # rollback below and any level recompute read raw, which must hold
        # every marker-committed batch before they look.
        # refuse_live=True from start()/backfill() (ADVICE r14): those
        # entry points may run CONCURRENTLY with a live peer writer on the
        # same store (backfill while the stream replays, start while a
        # backfill replays) and must not rmtree its fresh staging;
        # recover() keeps the unconditional settle — it is the offline
        # repair path for a store whose writer died. The refusal is cheap
        # in practice: the marker-flock probe settles a provably dead
        # writer's leftovers immediately, so only a genuinely live peer
        # (flock held / fresh unknown-flock staging) triggers the
        # retriable wait-for-it error.
        for act in store_meta.settle_replay_staging(
            self.store, refuse_live=refuse_live
        ):
            _log.warning("settled torn replay swap: %s", act)
        # ... and a crash-interrupted deliberate removal (retention/erase
        # whole-batch-dir delete) finishes its marker de-commit, so the
        # marker never claims a deliberately removed batch
        for act in store_meta.settle_removal_intent(self.store):
            _log.warning("settled interrupted batch removal: %s", act)
        # skip_live (r14): a FRESH journal of either state belongs to a
        # compaction that is plausibly RUNNING — the writer neither raises
        # (a backfill racing a live compact is legal) nor settles (a
        # concurrent roll-forward would race the compactor's own source
        # deletes); its reads exclude the journal's pending side via
        # excluded_batches_for_read, and a dead compactor's journal ages
        # out and settles on the next entry
        action = recover_compaction(self.store, skip_live=True)
        if action not in ("none", "live"):
            _log.warning("settled torn compaction journal: %s", action)

    def _stored_watermarks_df(self) -> DataFrame | None:
        """Per-metric max stored ts_ns as a DataFrame — the reference's
        ``metric.range().second`` seed (async_hta_service.hpp:258-269).
        One long per metric, but never collected: the seed feeds
        :func:`monotonic_stateful` through a stream-static join, so at
        10^7 metrics it is a distributed table, not a driver dict. The
        eager localCheckpoint freezes the pre-start store snapshot —
        stream-static plans re-execute the static side every microbatch,
        and re-listing the raw path mid-stream would race the stream's
        own writes."""
        if not self._raw_present():
            return None
        raw = self._read_raw()
        # exclude batches the checkpoint WILL replay (offsets entry with
        # no commit record — crash between the raw write and the
        # checkpoint commit; at most one id): seeding their own rows into
        # the watermark would make the replay drop every one of them as
        # at-or-below the seed, breaking replay-output idempotence and,
        # on a partially-written crash, committing a batch whose level
        # contributions are silently missing (round-7 review finding).
        # Batches whose commits entry was merely PURGED past retention,
        # or a store under a rebuilt/fresh checkpoint (no offsets at
        # all), are NOT replayable and stay in the seed — a fresh
        # checkpoint re-drain must still drop re-read rows as
        # at-or-below the stored max.
        replayable = [int(b) for b in store_meta.replayable_batches(self.store)]
        if replayable:
            raw = raw.filter(~F.col("ingest_batch").isin(replayable))
        return (
            raw.groupBy("metric")
            .agg(
                F.max("ts_ns").alias("store_wm"),
                # the value AT the stored watermark: counter baseline for
                # the first streamed sample after a backfill/restart
                F.max_by("value", "ts_ns").alias("store_lastv"),
            )
            .localCheckpoint(eager=True)
        )

    # -- the query ---------------------------------------------------------
    def start(
        self,
        input_dir: str | None = None,
        available_now: bool = True,
        source: DataFrame | None = None,
        source_format: str = "parquet",
    ):
        """Run the A1->A6 pipeline from either the file chunk source
        (``input_dir``; ``source_format`` = parquet | csv | jsonl, the
        latter two schema-pinned with the interchange readers' options so
        an ``export`` dump streams back in) or any pre-built streaming
        DataFrame with SAMPLE_SCHEMA columns (``source`` — see
        :func:`socket_source` / :func:`kafka_source`). The pipeline is
        source-agnostic, matching the reference where AMQP delivery is
        the transport and the operator chain owns the semantics
        (db.cpp:116-122)."""
        if (input_dir is None) == (source is None):
            raise ValueError("pass exactly one of input_dir or source")
        self._settle_pending_compaction(refuse_live=True)
        if source is not None:
            stream = source
        else:
            reader = (
                self.spark.readStream.schema(SAMPLE_SCHEMA)
                .option("maxFilesPerTrigger", "8")
                .option("recursiveFileLookup", "true")  # chunks may be dirs
            )
            if source_format == "csv":
                from metricq_db_hta_spark.sources.formats import _CSV_OPTS

                # the SAME options as the batch readers, including
                # FAILFAST: a streamed chunk with a malformed row must
                # fail the batch loudly, not silently null it into a row
                # the validity filter then hides (sources/formats.py)
                stream = reader.options(**_CSV_OPTS, mode="FAILFAST").csv(
                    input_dir
                )
            elif source_format == "jsonl":
                stream = reader.options(mode="FAILFAST", timeZone="UTC").json(
                    input_dir
                )
            elif source_format == "parquet":
                stream = reader.parquet(input_dir)
            else:
                raise ValueError(
                    f"unknown source_format {source_format!r} - "
                    "parquet | csv | jsonl"
                )
        if self.mapping is not None:
            stream = apply_input_mapping(stream, self.mapping, "metric")
        # A4 validity runs INSIDE the stateful filter (invalid samples are
        # masked out of the watermark cummax) so dropped samples are
        # counted per class — the observability the reference gets from
        # its skip counters (async_hta_service.hpp:292-306)
        # store-wide A3: metrics unseen by the *checkpoint* still must not
        # regress below what the *store* already holds (fresh checkpoint
        # over existing data, or streaming after a backfill)
        kept = monotonic_stateful(stream, seed_df=self._stored_watermarks_df())
        writer = (
            kept.writeStream.outputMode("append")
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_path())
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime="5 seconds")
        return writer.start()

    def backfill(self, stream: DataFrame) -> None:
        """A18: bulk import (the reference's ``metricq_importer`` MySQL ETL,
        /root/reference/src/tools/metricq_importer/importer.py:197-249) —
        one batch DataFrame through the same chain and sink. Parallelism
        comes from partitions instead of the importer's worker queue.

        Store-consistency rules (A3 holds store-wide, not just per call):
        * rows at-or-below the store's per-metric watermark (max stored
          ts) are dropped, so re-running a backfill is a no-op and mixing
          backfill with streaming cannot write out-of-order samples;
        * the first new sample of a metric gets delta_ns measured against
          the stored watermark, keeping integral/active_time exact across
          the boundary;
        * backfills use a negative ingest_batch id namespace (streaming
          microbatches own the non-negative ids), so neither can clobber
          the other's idempotent-overwrite partitions.
        """
        from metricq_db_hta_spark.operators.hta import with_delta
        from metricq_db_hta_spark.operators.ingest import ingest_batch
        from metricq_db_hta_spark.operators.retention import raw_floor_ns

        self._settle_pending_compaction(refuse_live=True)
        filtered = ingest_batch(stream, self.mapping)
        # Retention guard: importing rows below the advertised raw floor
        # would make the level cascade recompute expired (metric,
        # bucket_month) partitions from the backfilled FRAGMENT alone,
        # overwriting the retained aggregate history for those buckets
        # with fragment aggregates — silent data loss in the one table
        # tier that was supposed to outlive raw. Reject loudly; the cost
        # is one limit-1 job, and only for stores that ran retention.
        # (Live streaming needs no guard: a new metric's ancient rows can
        # only touch ITS OWN partitions, which hold no retained history.)
        floor = raw_floor_ns(self.store)
        if floor and filtered.filter(F.col("ts_ns") < floor).limit(1).count():
            raise ValueError(
                f"backfill rows fall below the retention floor ({floor} ns) "
                "- expired ranges cannot be re-imported without first "
                "clearing _retention.json and the affected level history"
            )
        # id from the locked shared allocator, never computed locally:
        # a concurrent compaction allocating the same min(on_disk)-1 id
        # turns this append into a false "replay" that swaps over the
        # compaction dest (store_meta.allocate_negative_batch_id; fuzz
        # class 20, tests/test_live_writer_fuzz.py)
        batch_id = store_meta.allocate_negative_batch_id(self.store)
        wm = None
        if self._raw_present():
            raw = self._read_raw()
            wm = raw.groupBy("metric").agg(
                F.max("ts_ns").alias("__wm_ts"),
                F.max_by("value", "ts_ns").alias("__wm_lastv"),
            )
            # watermark filter BEFORE delta computation: a row's delta must
            # be measured against the previous *surviving* sample, never a
            # dropped one (kept-iff-greater-than-all-prior-and-wm is
            # exactly the reference's run with max_ts seeded from storage)
            filtered = filtered.join(F.broadcast(wm), "metric", "left").filter(
                F.col("__wm_ts").isNull() | (F.col("ts_ns") > F.col("__wm_ts"))
            )
        kept = with_delta(filtered)
        # previous kept sample's VALUE (the counter baseline), same
        # in-batch window with_delta pays; each metric's first batch row
        # falls back to the stored-watermark value across the boundary
        lag_w = Window.partitionBy("metric").orderBy("ts_ns")
        kept = kept.withColumn("prev_value", F.lag("value", 1).over(lag_w))
        if wm is not None:
            kept = (
                kept.withColumn(
                    "delta_ns",
                    F.when(
                        (F.col("delta_ns") == 0) & F.col("__wm_ts").isNotNull(),
                        F.col("ts_ns") - F.col("__wm_ts"),  # boundary to stored max
                    ).otherwise(F.col("delta_ns")),
                )
                .withColumn(
                    "prev_value",
                    F.coalesce(F.col("prev_value"), F.col("__wm_lastv")),
                )
                .drop("__wm_ts", "__wm_lastv")
            )
        self._process_batch(kept, batch_id=batch_id)

    def run_until_drained(
        self,
        input_dir: str,
        timeout_s: int = 300,
        source_format: str = "parquet",
    ) -> None:
        q = self.start(
            input_dir, available_now=True, source_format=source_format
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        if q.exception() is not None:
            raise q.exception()
