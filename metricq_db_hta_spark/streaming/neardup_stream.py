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

Scale notes (100 TB corpus, 1000 executors):

* The store holds b keys per accepted document (b=4 here): 10^10 docs ->
  4x10^10 rows of (band_key, doc_id) — a few TB. The per-batch lookup is
  an equi-join on ``band_key``; at that size the store should be written
  bucketed on ``band_key`` (``sources/bucketed.py`` is the layout owner)
  so the probe joins bucket-aligned instead of shuffling the store per
  batch. Locally the store is plain parquet — the join plan is identical,
  only the exchange placement changes.
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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import dedup

#: LSH parameters — match operators/dedup.py defaults so streaming and
#: batch candidate sets are comparable
N_HASHES = 16
BANDS = 4


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

    ``store_dir`` layout::

        keys/ingest_batch=N/      accepted documents' (band_key, doc_id)
        matches/ingest_batch=N/   (id_new, id_existing, band_key) candidates
    """

    def __init__(self, spark: SparkSession, store_dir: str) -> None:
        self.spark = spark
        self.store = store_dir
        self.keys_dir = os.path.join(store_dir, "keys")
        self.matches_dir = os.path.join(store_dir, "matches")

    # -- store access ------------------------------------------------------
    def _stored_keys(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.keys_dir)
        except Exception:  # noqa: BLE001 — first batch: no store yet
            return None

    # -- the per-batch gate ------------------------------------------------
    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """One microbatch: emit candidate matches, then accept the batch's
        keys into the store. Replay-idempotent: both writes land in the
        batch's own ``ingest_batch`` partition via dynamic overwrite."""
        spark = self.spark
        keys = band_keys_for(docs)
        # one materialization serves the store probe, the within-batch
        # self-join and the store append (same barrier rationale as
        # operators/dedup.py — self-joins do not dedupe common subplans)
        keys = keys.localCheckpoint(eager=False)

        new = keys.select(
            F.col("doc_id").alias("id_new"), F.col("band_key").alias("bk")
        )
        stored = self._stored_keys()
        cross = None
        if stored is not None:
            cross = new.join(
                stored.select(
                    F.col("doc_id").alias("id_existing"),
                    F.col("band_key").alias("bk"),
                ),
                "bk",
            )
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
            (
                keys.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("ingest_batch")
                .parquet(self.keys_dir)
            )
        finally:
            if prev is not None:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    # -- entry points ------------------------------------------------------
    def run_until_drained(self, input_dir: str, checkpoint: str | None = None) -> None:
        """Drain all pending document files (availableNow), gating each
        microbatch through :meth:`process_batch`."""
        from pyspark.sql.types import LongType, StringType, StructField, StructType

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
        return self.spark.read.parquet(self.matches_dir)
