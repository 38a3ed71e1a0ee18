"""Streaming near-duplicate detection: incremental MinHash-LSH over a
document stream.

The batch LSH path (`operators/dedup.py`) answers "which documents in this
CORPUS are near-duplicates of each other". A training-data pipeline also
needs the incremental question: "is this NEWLY ARRIVED document a
near-duplicate of anything we have already accepted?" — the dedup gate in
front of a continuously-crawled corpus. This module is that gate as a
Structured Streaming pipeline:

* per microbatch, compute each incoming document's b x r band keys with
  the SAME wide-signature construction the batch path uses
  (``doc_shingles`` -> ``minhash_matrix`` -> band keys), so streaming and
  batch agree bit-for-bit on what a band key is;
* equi-join the batch's keys against the accumulated band-key STORE —
  any shared key is a candidate match (same b x r collision semantics as
  the batch bucket self-join), emitted to ``matches/``;
* append the batch's keys to the store under its batch id (replay writes
  the same partition — idempotent, like the raw sample store), so later
  batches see earlier documents.

Within-batch near-duplicates are also reported: the gate must catch a
crawler that submits two copies of a page in one batch, not just across
batches.

Replay semantics: foreachBatch is at-least-once, so a batch can rerun
after its keys landed but before the checkpoint committed. Two guards
make the rerun produce byte-identical output instead of spurious
self-matches (r8 ADVICE): the store probe reads only PRIOR batches
(``ingest_batch < batch_id`` — partition-pruned, so a replayed batch
never joins against its own previously-written keys), and the cross-store
join drops ``id_new == id_existing`` rows (a doc_id resubmitted across
batches is exact-dedup territory, not a near-dup candidate).

Scale notes (100 TB corpus, 1000 executors):

* The store holds b keys per accepted document (b=4 here): 10^10 docs ->
  4x10^10 rows of (band_key, doc_id) — a few TB. The per-batch lookup is
  an equi-join on ``band_key``; at that size the store must never be
  re-shuffled per batch. ``bucketed=True`` writes the store
  ``bucketBy(n_buckets, band_key)`` (same layout move as
  ``sources/bucketed.py`` for fact joins): the store scan then reports
  its hash partitioning and only the SMALL per-batch side exchanges —
  ``tests/test_neardup_stream.py`` pins the store-side plan at zero
  shuffle exchanges. Locally the default store is plain parquet — the
  join logic is identical, only the exchange placement changes.
* Nothing is ever collected to the driver; matches and keys flow
  DataFrame-to-parquet.
* Band keys are md5 strings of the banded signature — uniform, so the
  store join has no inherent skew. A pathological corpus (millions of
  byte-identical docs) concentrates one key; route those through the
  exact-dedup gate first (sha2 equality), which is the standard pipeline
  order anyway.

Reference parity: the reference has no streaming dedup (it is a metrics
store); this is Part-B/LLM engine surface. The streaming mechanics
(available-now drain, per-batch id, idempotent partition overwrite)
mirror ``ingest_stream.py`` A18.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from metricq_db_hta_spark.operators import dedup

#: LSH parameters — match operators/dedup.py defaults so streaming and
#: batch candidate sets are comparable
N_HASHES = 16
BANDS = 4

#: bucket count for the bucketed key store. A layout knob like
#: sources/bucketed.py N_BUCKETS: locally small (the fixture corpus is
#: hundreds of keys); on a cluster, size buckets to ~128 MB-1 GB of store
#: each.
N_KEY_BUCKETS = 8

MATCHES_SCHEMA = StructType(
    [
        StructField("id_new", LongType()),
        StructField("id_existing", LongType()),
        StructField("band_key", StringType()),
        StructField("ingest_batch", LongType()),
    ]
)


def band_keys_for(docs: DataFrame, n_hashes: int = N_HASHES, bands: int = BANDS) -> DataFrame:
    """(doc_id, band_key) rows for a document batch — the exact band-key
    construction of the batch LSH path (one groupBy over shingle tokens)."""
    rows_per_band = n_hashes // bands
    toks = dedup.doc_shingles(docs, distinct=False)
    sig = dedup.minhash_matrix(toks, n_hashes)
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(b),
                *[F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)],
            )
        )
        for b in range(bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*keys)).alias("band_key"))


class StreamingNearDup:
    """Incremental LSH dedup gate over a stream of (doc_id, text) rows.

    ``store_dir`` layout (default, plain-parquet store)::

        keys/ingest_batch=N/      accepted documents' (band_key, doc_id)
        matches/ingest_batch=N/   (id_new, id_existing, band_key) candidates

    With ``bucketed=True`` the keys live instead in a table bucketed on
    ``band_key`` (data under ``keys_bucketed/``), so the per-batch store
    probe never shuffles the store (see module docstring scale notes).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        *,
        bucketed: bool = False,
        n_buckets: int = N_KEY_BUCKETS,
    ) -> None:
        self.spark = spark
        self.store = store_dir
        self.bucketed = bucketed
        self.n_buckets = n_buckets
        self.keys_dir = os.path.join(store_dir, "keys")
        self.bucketed_keys_dir = os.path.join(store_dir, "keys_bucketed")
        self.matches_dir = os.path.join(store_dir, "matches")
        # deterministic per store dir, so a new session over the same
        # on-disk store re-registers the SAME table (recovery, below)
        digest = hashlib.sha256(os.path.abspath(store_dir).encode()).hexdigest()[:8]
        self.keys_table = f"ndup_keys_{digest}"

    # -- store access ------------------------------------------------------
    def _ensure_keys_table(self) -> None:
        """Register the bucketed keys table if this session hasn't yet.

        CREATE TABLE ... CLUSTERED BY over the existing LOCATION re-attaches
        the bucket spec to files written by a previous process — the
        in-memory catalog dies with the session, the data does not.
        """
        if self.spark.catalog.tableExists(self.keys_table):
            return
        self.spark.sql(
            f"""
            CREATE TABLE {self.keys_table}
                (doc_id BIGINT, band_key STRING, ingest_batch BIGINT)
            USING PARQUET
            CLUSTERED BY (band_key) SORTED BY (band_key)
                INTO {self.n_buckets} BUCKETS
            LOCATION '{self.bucketed_keys_dir}'
            """
        )

    def _stored_keys(self, before_batch: int) -> DataFrame | None:
        """The accumulated store restricted to batches BEFORE
        ``before_batch`` — the replay guard: a rerun of batch N must not
        see the keys its failed attempt already wrote (r8 ADVICE)."""
        if self.bucketed:
            self._ensure_keys_table()
            stored = self.spark.table(self.keys_table)
        else:
            try:
                stored = self.spark.read.parquet(self.keys_dir)
            except Exception:  # noqa: BLE001 — first batch: no store yet
                return None
        return stored.filter(F.col("ingest_batch") < F.lit(int(before_batch)))

    def _append_marker(self, batch_id: int) -> str:
        return os.path.join(self.store, "keys_markers", f"batch_{int(batch_id)}")

    def _append_keys(self, keys: DataFrame, batch_id: int) -> None:
        """Accept the batch's keys into the store, idempotently."""
        tagged = keys.withColumn("ingest_batch", F.lit(int(batch_id)))
        if not self.bucketed:
            # dynamic overwrite of the batch's own partition: replay
            # rewrites the same files
            tagged.write.mode("overwrite").partitionBy("ingest_batch").parquet(
                self.keys_dir
            )
            return
        # Bucketed table: the replay guard is a marker committed AFTER the
        # append (atomic tmp+rename, the store_meta A6 pattern) — not "any
        # visible row for this batch", because a crash during job commit
        # can leave a PARTIAL file set visible, and skipping on that
        # evidence would silently drop the rest of the batch's keys
        # forever (r9 ADVICE). Marker present -> the whole append landed,
        # skip. Marker absent -> append again, even if a torn attempt left
        # rows behind: the possible duplicate store rows only ever surface
        # as duplicate candidate matches, which process_batch's
        # ``matches.distinct()`` already collapses, so re-appending is the
        # self-healing path rather than a correctness risk.
        marker = self._append_marker(batch_id)
        if os.path.exists(marker):
            return
        self._ensure_keys_table()
        (
            tagged.select("doc_id", "band_key", "ingest_batch")
            .write.mode("append")
            .bucketBy(self.n_buckets, "band_key")
            .sortBy("band_key")
            .saveAsTable(self.keys_table)
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("committed\n")
        os.replace(tmp, marker)

    # -- the per-batch gate ------------------------------------------------
    def store_probe(self, keys: DataFrame, batch_id: int) -> DataFrame | None:
        """The cross-store candidate join for one batch's keys: new docs
        whose band key collides with any PRIOR batch's accepted key. The
        store side is never re-shuffled when ``bucketed`` (plan pinned in
        tests/test_neardup_stream.py); returns None before the first
        accepted batch."""
        new = keys.select(
            F.col("doc_id").alias("id_new"), F.col("band_key").alias("bk")
        )
        stored = self._stored_keys(before_batch=batch_id)
        if stored is None:
            return None
        return new.join(
            stored.select(
                F.col("doc_id").alias("id_existing"),
                F.col("band_key").alias("bk"),
            ),
            "bk",
        ).filter(F.col("id_new") != F.col("id_existing"))

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """One microbatch: emit candidate matches, then accept the batch's
        keys into the store. Replay-idempotent: matches overwrite the
        batch's own ``ingest_batch`` partition, keys go through
        :meth:`_append_keys`' guard, and the store probe excludes this
        batch's own keys from any prior attempt."""
        spark = self.spark
        keys = band_keys_for(docs)
        # one materialization serves the store probe, the within-batch
        # self-join and the store append (same barrier rationale as
        # operators/dedup.py — self-joins do not dedupe common subplans)
        keys = keys.localCheckpoint(eager=False)

        new = keys.select(
            F.col("doc_id").alias("id_new"), F.col("band_key").alias("bk")
        )
        cross = self.store_probe(keys, batch_id)
        within = new.join(
            keys.select(
                F.col("doc_id").alias("id_existing"), F.col("band_key").alias("bk")
            ),
            "bk",
        ).filter(F.col("id_new") > F.col("id_existing"))
        matches = within if cross is None else within.unionByName(cross)
        matches = (
            matches.select(
                "id_new", "id_existing", F.col("bk").alias("band_key")
            )
            .distinct()
            .withColumn("ingest_batch", F.lit(int(batch_id)))
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                matches.write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(self.matches_dir)
            )
            self._append_keys(keys, batch_id)
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # -- entry points ------------------------------------------------------
    def run_until_drained(self, input_dir: str, checkpoint: str | None = None) -> None:
        """Drain all pending document files (availableNow), gating each
        microbatch through :meth:`process_batch`."""
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
        stream = self.spark.readStream.schema(schema).parquet(input_dir)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.process_batch(df, bid)
            )
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.store, "_checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def matches(self) -> DataFrame:
        """All candidate matches emitted so far. Explicit schema: a gate
        that has accepted batches but never seen a candidate pair has a
        matches/ dir with no part files (dynamic overwrite of a zero-row
        frame), which schema inference cannot read (r8 ADVICE) — this
        returns the well-typed empty frame instead."""
        try:
            return self.spark.read.schema(MATCHES_SCHEMA).parquet(self.matches_dir)
        except Exception:  # noqa: BLE001 — no batch has ever written
            return self.spark.createDataFrame([], MATCHES_SCHEMA)
