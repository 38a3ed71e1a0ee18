"""Streaming semantics tests (SURVEY §5.4): chunked delivery, out-of-order
and duplicate chunks across microbatches, checkpoint restart, and
equivalence with the batch ingest + rollup pipeline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import hta, ingest
from metricq_db_hta_spark.queries.hta_queries import W0, samples
from metricq_db_hta_spark.streaming.ingest_stream import StreamingIngest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow


@pytest.fixture()
def chunked_input(spark, sf_dir, tmp_path):
    """Split the events samples into 3 arrival chunks; chunk 3 re-delivers
    chunk 2 (duplicates) plus some artificially out-of-order rows."""
    src = samples(spark, sf_dir).orderBy("event_id").limit(600)
    rows = src.collect()
    c1, c2 = rows[:300], rows[300:]
    input_dir = tmp_path / "in"
    input_dir.mkdir()

    def write_chunk(name, data):
        spark.createDataFrame(data, schema=src.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(input_dir / name))

    write_chunk("chunk1", c1)
    write_chunk("chunk2", c2)
    # chunk3: exact duplicates of c2 (idempotence) with later event_ids
    dup = [
        (r["metric"], r["ts_ns"], r["value"], r["event_id"] + 1_000_000) for r in c2
    ]
    write_chunk("chunk3", dup)
    return str(input_dir), rows + [
        {"metric": m, "ts_ns": t, "value": v, "event_id": e}
        for m, t, v, e in dup
    ]


def test_stream_matches_batch(spark, sf_dir, tmp_path, chunked_input):
    input_dir, _ = chunked_input
    store = str(tmp_path / "store")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)

    # batch reference: same rows through the batch chain
    src = samples(spark, sf_dir).orderBy("event_id").limit(600)
    dup = src.withColumn("event_id", F.col("event_id") + 1_000_000).filter(
        F.col("event_id") >= 1_000_300
    )
    batch_kept = ingest.ingest_batch(src)  # dups add nothing (idempotence)

    raw = spark.read.parquet(svc.raw_path)
    assert raw.count() == batch_kept.count()
    sym = raw.select("metric", "ts_ns", "value").exceptAll(
        batch_kept.select("metric", "ts_ns", "value")
    )
    assert sym.count() == 0

    # level0 from streaming merges == batch level0 over the kept rows
    lv_stream = spark.read.parquet(svc.level_path(W0))
    lv_batch = hta.level0(batch_kept, W0)
    cols = ["metric", "bucket_start_ns", "minimum", "maximum", "count", "integral", "active_time"]
    diff = (
        lv_stream.select(*cols).exceptAll(lv_batch.select(*cols))
        .union(lv_batch.select(*cols).exceptAll(lv_stream.select(*cols)))
    )
    assert diff.count() == 0


def test_stream_restart_idempotent(spark, tmp_path, chunked_input):
    """Draining twice (restart from checkpoint, no new data) changes
    nothing — the checkpoint remembers processed files and state."""
    input_dir, _ = chunked_input
    store = str(tmp_path / "store2")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)
    n1 = spark.read.parquet(svc.raw_path).count()
    lv1 = spark.read.parquet(svc.level_path(W0)).agg(
        F.sum("count").alias("c")
    ).collect()[0]["c"]

    svc2 = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc2.run_until_drained(input_dir)
    assert spark.read.parquet(svc.raw_path).count() == n1
    lv2 = spark.read.parquet(svc.level_path(W0)).agg(
        F.sum("count").alias("c")
    ).collect()[0]["c"]
    assert lv2 == lv1


def test_stream_rename_mapping(spark, tmp_path, chunked_input):
    """A2 in the streaming path: input names rewritten before state."""
    input_dir, _ = chunked_input
    store = str(tmp_path / "store3")
    mapping = spark.createDataFrame(
        [("click", "interaction.click")], ["input", "name"]
    )
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,), mapping=mapping)
    svc.run_until_drained(input_dir)
    metrics = {
        r["metric"]
        for r in spark.read.parquet(svc.raw_path).select("metric").distinct().collect()
    }
    assert "interaction.click" in metrics
    assert "click" not in metrics


def test_stream_reconfigure_add_metric(spark, tmp_path, chunked_input):
    """A17: add-only runtime reconfiguration — a new input mapping appears
    between drains (config-table append); existing metrics unaffected
    (/root/reference/src/async_hta_service.hpp:206-247)."""
    input_dir, _ = chunked_input
    store = str(tmp_path / "store4")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)
    before = spark.read.parquet(svc.raw_path).count()

    # new chunk introduces a brand-new input stream name; reconfigured
    # service maps it to a logical metric
    newrows = [("sensor.raw", 1_800_000_000_000_000_000 + i, float(i), 5_000_000 + i)
               for i in range(10)]
    spark.createDataFrame(
        newrows, ["metric", "ts_ns", "value", "event_id"]
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(input_dir, "chunk4"))

    mapping = spark.createDataFrame([("sensor.raw", "sensor.power")], ["input", "name"])
    svc2 = StreamingIngest(spark, store, level_widths_ns=(W0,), mapping=mapping)
    svc2.run_until_drained(input_dir)

    raw = spark.read.parquet(svc2.raw_path)
    assert raw.count() == before + 10
    metrics = {r["metric"] for r in raw.select("metric").distinct().collect()}
    assert "sensor.power" in metrics and "sensor.raw" not in metrics


def test_stream_high_cardinality_state(spark, sf_dir, tmp_path):
    """State scale check: ~1000 metric keys through the stateful
    watermark (the reference fleet is 4368 metrics; SURVEY §7 risk 5).
    Verifies per-key isolation: every synthetic key's rows survive and
    cross-key interference is impossible."""
    src = (
        samples(spark, sf_dir)
        .withColumn(
            "metric",
            F.concat_ws("_", F.col("metric"), (F.col("event_id") % 200).cast("string")),
        )
    )
    input_dir = tmp_path / "in_hc"
    input_dir.mkdir()
    src.coalesce(1).write.mode("overwrite").parquet(str(input_dir / "c1"))
    svc = StreamingIngest(spark, str(tmp_path / "store_hc"), level_widths_ns=(W0,))
    svc.run_until_drained(str(input_dir))
    raw = spark.read.parquet(svc.raw_path)
    expect = ingest.ingest_batch(src)
    assert raw.count() == expect.count()
    assert raw.select("metric").distinct().count() == src.select("metric").distinct().count()


def test_stream_seeds_watermark_from_store(spark, sf_dir, tmp_path):
    """Store-wide A3 (ADVICE r1): a FRESH checkpoint over a non-empty store
    must not re-admit samples at-or-below the stored per-metric max, and
    the first genuinely-new sample's delta_ns measures the gap to the
    stored max (reference seeds max_ts from metric.range().second,
    async_hta_service.hpp:258-269)."""
    store = str(tmp_path / "store_seed")
    base_ts = 1_700_000_000_000_000_000
    old = [("m1", base_ts + i * 1_000_000_000, float(i), i) for i in range(5)]
    svc = StreamingIngest(spark, store, level_widths_ns=(3_600_000_000_000,))
    svc.backfill(spark.createDataFrame(old, ["metric", "ts_ns", "value", "event_id"]))
    stored_max = base_ts + 4 * 1_000_000_000

    # fresh checkpoint (new store dir would be same; checkpoint is inside
    # store but unused so far by streaming) — stream rows straddling the
    # stored watermark: two at/below (drop), two above (keep)
    newrows = [
        ("m1", stored_max, 99.0, 100),                    # == stored max: drop
        ("m1", stored_max - 1_000_000_000, 98.0, 101),    # below: drop
        ("m1", stored_max + 7_000_000_000, 50.0, 102),    # keep, delta = 7s
        ("m1", stored_max + 8_000_000_000, 51.0, 103),    # keep, delta = 1s
    ]
    input_dir = tmp_path / "in_seed"
    input_dir.mkdir()
    spark.createDataFrame(
        newrows, ["metric", "ts_ns", "value", "event_id"]
    ).coalesce(1).write.mode("overwrite").parquet(str(input_dir / "c1"))
    svc.run_until_drained(str(input_dir))

    raw = spark.read.parquet(svc.raw_path).filter(F.col("ts_ns") > stored_max)
    got = {(r["ts_ns"], r["delta_ns"]) for r in raw.collect()}
    assert got == {
        (stored_max + 7_000_000_000, 7_000_000_000),
        (stored_max + 8_000_000_000, 1_000_000_000),
    }
    # nothing at-or-below the stored max was re-admitted
    assert spark.read.parquet(svc.raw_path).count() == 5 + 2


def test_kafka_source_package_gate(spark):
    """VERDICT r6 next-step 6: the Kafka source must either construct a
    streaming frame with the sample schema (package on the classpath) or
    fail FAST at construction with Spark's actionable find-data-source
    error naming the Kafka integration guide — never a silent fallback
    or a deferred failure at first action."""
    from metricq_db_hta_spark.streaming.ingest_stream import kafka_source

    try:
        df = kafka_source(spark, "localhost:9092", "samples")
    except Exception as e:  # noqa: BLE001 — asserting the gate message
        msg = str(e)
        assert "kafka" in msg.lower(), msg
        assert "Failed to find data source" in msg, msg
        assert "Kafka Integration Guide" in msg, msg
    else:
        # container gained the package: the source must be a live plan
        # with exactly the ingest sample schema
        assert df.isStreaming
        assert df.columns == ["metric", "ts_ns", "value", "event_id"]


def test_stream_seed_join_100k_metrics_no_driver_collect(spark, tmp_path):
    """VERDICT r6 next-step 4: the store-watermark seed must stay
    distributed. 100,000 metric keys with per-key stored watermarks ride
    the stream-static seed join into the stateful filter, while
    ``DataFrame.collect`` / ``toPandas`` / ``toLocalIterator`` are BANNED
    on the driver for the whole build+run — a regression to the old
    per-metric driver dict fails loudly. Correctness: each key's
    at-watermark sample drops, the above-watermark sample survives with
    delta measured against the seeded store max."""
    from pyspark.sql import DataFrame as _DF

    from metricq_db_hta_spark.streaming.ingest_stream import (
        SAMPLE_SCHEMA,
        monotonic_stateful,
    )

    n_keys = 100_000
    base = 1_700_000_000_000_000_000
    sec = 1_000_000_000
    keys = spark.range(n_keys).select(
        F.concat(F.lit("m"), F.col("id")).alias("metric"), "id"
    )
    # per-key stored watermark: base + (id % 5) seconds
    seed_df = keys.select(
        "metric", (F.lit(base) + (F.col("id") % 5) * sec).alias("store_wm")
    )
    # two samples per key: one AT the stored watermark (must drop), one
    # 3s above it (must keep, delta = 3s against the seeded max)
    stream_rows = keys.select(
        "metric",
        "id",
        F.posexplode(
            F.array(
                (F.lit(base) + (F.col("id") % 5) * sec),
                (F.lit(base) + (F.col("id") % 5) * sec + 3 * sec),
            )
        ).alias("pos", "ts_ns"),
    ).select(
        "metric",
        "ts_ns",
        F.col("id").cast("double").alias("value"),
        (F.col("id") * 2 + F.col("pos")).alias("event_id"),
    )
    input_dir = tmp_path / "in_seed100k"
    input_dir.mkdir()
    out_dir = str(tmp_path / "out_seed100k")
    stream_rows.coalesce(4).write.parquet(str(input_dir / "c1"))

    def _banned(self, *a, **k):  # pragma: no cover - only on regression
        raise AssertionError("driver-side materialization in seed path")

    originals = {
        name: getattr(_DF, name)
        for name in ("collect", "toPandas", "toLocalIterator")
    }
    for name in originals:
        setattr(_DF, name, _banned)
    try:
        stream = (
            spark.readStream.schema(SAMPLE_SCHEMA)
            .option("recursiveFileLookup", "true")
            .parquet(str(input_dir))
        )
        q = (
            monotonic_stateful(stream, seed_df=seed_df)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "cp_seed100k"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise q.exception()
    finally:
        for name, fn in originals.items():
            setattr(_DF, name, fn)

    out = spark.read.parquet(out_dir)
    assert out.count() == n_keys  # exactly the above-watermark sample
    assert out.select("metric").distinct().count() == n_keys
    # every surviving row's delta is the 3s gap to the SEEDED store max
    bad = out.filter(F.col("delta_ns") != 3 * sec)
    assert bad.count() == 0, bad.limit(5).collect()


def test_socket_source_feeds_pipeline(spark, tmp_path):
    """A1 live-source parity: samples arriving over a TCP socket run the
    same A2-A6 pipeline (monotonic filter included) into the store."""
    import socket
    import threading
    import time as _time

    from metricq_db_hta_spark.streaming.ingest_stream import socket_source

    base = 1_750_000_000_000_000_000
    lines = [
        f"m1,{base + i * 1_000_000_000},{float(i)},{i}" for i in range(20)
    ] + [f"m1,{base},{99.0},{100}"]  # stale ts: monotonic filter drops it

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            _time.sleep(30)  # hold the connection while the query drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    store = str(tmp_path / "store_sock")
    svc = StreamingIngest(spark, store, level_widths_ns=(3_600_000_000_000,))
    src = socket_source(spark, "127.0.0.1", port)
    q = svc.start(source=src, available_now=False)
    try:
        deadline = _time.time() + 60
        n = 0
        while _time.time() < deadline:
            try:
                n = spark.read.parquet(svc.raw_path).count()
            except Exception:
                n = 0
            if n >= 20:
                break
            _time.sleep(1)
    finally:
        q.stop()
        srv.close()
    assert n == 20  # 20 monotonic samples in, the stale one dropped


def test_drop_counts_logged(spark, tmp_path):
    """A14 drop observability: the streaming path counts monotonic and
    NaN/Inf drops per metric into {store}/drops_log (round-1 'What's
    missing' #4 — drop_counts existed but nothing streaming emitted it)."""
    base = 1_760_000_000_000_000_000
    rows = [
        ("m1", base + 1_000_000_000, 1.0, 1),
        ("m1", base + 2_000_000_000, 2.0, 2),
        ("m1", base + 1_500_000_000, 9.0, 3),      # stale -> mono drop
        ("m1", base + 3_000_000_000, float("nan"), 4),  # invalid drop
        ("m1", base + 4_000_000_000, float("inf"), 5),  # invalid drop
        ("m1", base + 5_000_000_000, 5.0, 6),      # kept; carries the counts
    ]
    input_dir = tmp_path / "in_drops"
    input_dir.mkdir()
    spark.createDataFrame(
        rows, ["metric", "ts_ns", "value", "event_id"]
    ).coalesce(1).write.parquet(str(input_dir / "c1"))
    store = str(tmp_path / "store_drops")
    svc = StreamingIngest(spark, store, level_widths_ns=(3_600_000_000_000,))
    svc.run_until_drained(str(input_dir))

    assert spark.read.parquet(svc.raw_path).count() == 3  # 3 kept
    log = spark.read.parquet(os.path.join(store, "drops_log")).collect()
    assert len(log) == 1
    assert log[0]["metric"] == "m1"
    assert log[0]["mono_drops"] == 1
    assert log[0]["invalid_drops"] == 2

    # retry idempotence (ADVICE r2): a foreachBatch REPLAY of the same
    # microbatch must rewrite its own drop rows, not append them again
    kept = spark.read.parquet(svc.raw_path).select(
        "metric", "ts_ns", "value", "event_id", "delta_ns"
    )
    kept = kept.withColumn("drops_mono_before", F.lit(1).cast("long")).withColumn(
        "drops_invalid_before", F.lit(2).cast("long")
    )
    batch_id = log[0]["ingest_batch"]
    svc._process_batch(kept, batch_id)
    log2 = spark.read.parquet(os.path.join(store, "drops_log")).collect()
    assert len(log2) == 1, "replayed batch appended duplicate drop rows"


def test_stream_100k_key_state_rocksdb(spark, tmp_path):
    """Million-key-class state evidence (SURVEY §7 risk 5, VERDICT r5
    next-step 4): 100,000 distinct metric keys through the stateful
    watermark with the RocksDB state-store provider — the provider the
    100 TB deployment runs (SCALE.md), where per-key state must live
    off-heap/on-disk instead of an in-memory HDFS-backed map.

    Two availableNow runs against ONE checkpoint prove the state
    round-trips RocksDB across a query restart: run 2's below-watermark
    samples are dropped only because run 1's per-key max survived.
    Per-key correctness is asserted exactly on sampled keys and in
    aggregate (every key keeps exactly its monotone samples), and the
    RocksDB custom metrics in the query progress prove which provider
    held the state and that its footprint is bounded."""
    import glob

    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401
    from metricq_db_hta_spark.streaming.ingest_stream import (
        SAMPLE_SCHEMA,
        monotonic_stateful,
    )

    n_keys = 100_000
    base = 1_700_000_000_000_000_000
    sec = 1_000_000_000

    def chunk(specs):
        # specs: list of (sample_idx, ts_offset_ns); event_id encodes
        # arrival order (the state fn sorts by it within a batch)
        idx = F.explode(
            F.array(*[F.lit(i) for i, _ in specs])
        ).alias("i")
        off = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(i) for i, _ in specs]),
                F.array(*[F.lit(o) for _, o in specs]),
            ),
            F.col("i"),
        )
        return (
            spark.range(n_keys)
            .select(F.concat(F.lit("m"), F.col("id")).alias("metric"), "id", idx)
            .select(
                "metric",
                (F.lit(base) + off).alias("ts_ns"),
                (F.col("id") + F.col("i")).cast("double").alias("value"),
                (F.col("id") * 10 + F.col("i")).alias("event_id"),
            )
        )

    input_dir = tmp_path / "in_100k"
    input_dir.mkdir()
    out_dir = str(tmp_path / "out_100k")
    cp_dir = str(tmp_path / "cp_100k")
    # run 1: two ascending samples per key; run 2: one below-watermark
    # sample (must drop against run 1's state) + one later sample (keep)
    chunk([(0, 0), (1, 1 * sec)]).coalesce(4).write.parquet(
        str(input_dir / "c1")
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def drain():
            stream = (
                spark.readStream.schema(SAMPLE_SCHEMA)
                .option("recursiveFileLookup", "true")
                .parquet(str(input_dir))
            )
            q = (
                monotonic_stateful(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", cp_dir)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            if q.exception() is not None:
                raise q.exception()
            return q.lastProgress

        drain()
        assert spark.read.parquet(out_dir).count() == 2 * n_keys

        chunk([(2, 0), (3, 10 * sec)]).coalesce(4).write.parquet(
            str(input_dir / "c2")
        )
        progress = drain()

        out = spark.read.parquet(out_dir)
        # aggregate per-key correctness: every key kept exactly samples
        # 0,1,3 (sample 2 dropped against the restart-recovered watermark)
        assert out.count() == 3 * n_keys
        assert out.select("metric").distinct().count() == n_keys
        bad = out.groupBy("metric").agg(
            F.count("*").alias("n"), F.max("ts_ns").alias("mx")
        ).filter((F.col("n") != 3) | (F.col("mx") != base + 10 * sec))
        assert bad.count() == 0
        # exact spot-check on sampled keys: ts/delta/drop-count triplets
        for key_id in (0, 12_345, n_keys - 1):
            rows = {
                (r["ts_ns"], r["delta_ns"], r["drops_mono_before"])
                for r in out.filter(F.col("metric") == f"m{key_id}").collect()
            }
            assert rows == {
                (base, 0, 0),
                (base + 1 * sec, 1 * sec, 0),
                (base + 10 * sec, 9 * sec, 1),  # sample 2 dropped before it
            }, key_id

        # the state lived in RocksDB, and its footprint is bounded: the
        # provider's custom metrics only exist under RocksDB, memory usage
        # stays far below executor heap for 100k keys. State rows ==
        # STATE_BUCKETS, not metric count: the r10 bucketed re-key holds
        # 100k per-metric watermarks inside ~1024 bucket blobs (the
        # 2.8x-cold / ~9x-warm throughput redesign —
        # ingest_stream.monotonic_stateful docstring has the numbers).
        from metricq_db_hta_spark.streaming.ingest_stream import STATE_BUCKETS

        ops = progress["stateOperators"]
        assert ops and ops[0]["numRowsTotal"] == STATE_BUCKETS
        custom = ops[0]["customMetrics"]
        assert any(k.startswith("rocksdb") for k in custom), (
            "state store was not RocksDB: " + ",".join(sorted(custom))
        )
        # bounded footprint: 100k keys' state stays far below executor heap
        assert 0 < ops[0]["memoryUsedBytes"] < 2 << 30
        # and the checkpoint holds RocksDB sst/zip artifacts, not the
        # HDFS-backed provider's .delta files
        state_files = glob.glob(f"{cp_dir}/state/**/*", recursive=True)
        assert not any(f.endswith(".delta") for f in state_files)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )


def test_watermark_seed_excludes_replayable_batch(spark, tmp_path, chunked_input):
    """Code-review regression (round 7): a batch whose raw write landed
    but whose checkpoint commit record is missing WILL be replayed by the
    engine — seeding the store watermark from its own rows would make the
    replay drop every one of them (ts <= seed), breaking replay-output
    idempotence. Simulate the crash window by deleting the engine's
    commits record for the last batch and assert both the seed exclusion
    and end-to-end restart equivalence."""
    input_dir, _ = chunked_input
    store = str(tmp_path / "store_replay")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)
    n0 = spark.read.parquet(svc.raw_path).count()

    from metricq_db_hta_spark.streaming import store_meta

    ids = sorted(b for b in store_meta.raw_batches_on_disk(store) if b >= 0)
    victim = ids[-1]
    commits = os.path.join(store, "_checkpoint", "commits")
    os.remove(os.path.join(commits, str(victim)))
    crc = os.path.join(commits, f".{victim}.crc")  # hadoop checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)

    svc2 = StreamingIngest(spark, store, level_widths_ns=(W0,))
    seed = svc2._stored_watermarks_df()
    expected = (
        spark.read.parquet(svc.raw_path)
        .filter(F.col("ingest_batch") != victim)
        .groupBy("metric")
        .agg(
            F.max("ts_ns").alias("store_wm"),
            F.max_by("value", "ts_ns").alias("store_lastv"),
        )
    )
    assert seed.exceptAll(expected).count() == 0
    assert expected.exceptAll(seed).count() == 0

    # end-to-end: the engine replays the victim batch; its rows must be
    # KEPT (identical replay output) and the store must equal the
    # pre-crash state, with the commit record restored
    svc2.run_until_drained(input_dir)
    assert spark.read.parquet(svc.raw_path).count() == n0
    assert os.path.exists(
        os.path.join(store, "_checkpoint", "commits", str(victim))
    )


def test_fresh_checkpoint_redrain_is_noop(spark, tmp_path, chunked_input):
    """Review regression (round 7): a REBUILT checkpoint (corruption /
    state-format upgrade) has no offsets log, so nothing is replayable
    and the watermark seed must include every stored batch — re-draining
    the same input then drops all re-read rows as at-or-below the stored
    max. (The first gate implementation conflated 'commits entry missing'
    with 'replayable' and would have duplicated the whole store here.)"""
    import shutil as _sh

    input_dir, _ = chunked_input
    store = str(tmp_path / "store_fresh_ckpt")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    svc.run_until_drained(input_dir)
    n0 = spark.read.parquet(svc.raw_path).count()
    ids0 = sorted(
        int(x.split("=")[1])
        for x in os.listdir(svc.raw_path)
        if x.startswith("ingest_batch=")
    )

    _sh.rmtree(os.path.join(store, "_checkpoint"))
    svc2 = StreamingIngest(spark, store, level_widths_ns=(W0,))
    from metricq_db_hta_spark.streaming import store_meta

    assert store_meta.replayable_batches(store) == set()
    svc2.run_until_drained(input_dir)
    assert spark.read.parquet(svc.raw_path).count() == n0
    ids1 = sorted(
        int(x.split("=")[1])
        for x in os.listdir(svc.raw_path)
        if x.startswith("ingest_batch=")
    )
    assert ids1 == ids0  # no duplicate batches appeared


def test_stream_maintains_histogram_levels(spark, sf_dir, tmp_path, chunked_input):
    """Opt-in distributional levels (hist_widths_ns): the streaming
    cascade's hist tables equal the batch histogram over the same kept
    rows at both widths — multi-batch, with duplicate re-delivery (the
    recompute-not-merge design makes replay a non-event for histograms
    exactly as for Aggregate levels)."""
    input_dir, _ = chunked_input
    store = str(tmp_path / "store_hist")
    svc = StreamingIngest(
        spark, store, level_widths_ns=(W0,), hist_widths_ns=(W0, 10 * W0)
    )
    svc.run_until_drained(input_dir)

    src = samples(spark, sf_dir).orderBy("event_id").limit(600)
    batch_kept = ingest.ingest_batch(src)
    cols = ["metric", "bucket_start_ns", "bin", "n"]
    for width in (W0, 10 * W0):
        streamed = spark.read.parquet(svc.hist_path(width)).select(*cols)
        batch = hta.histogram_level(batch_kept, width).select(*cols)
        diff = streamed.exceptAll(batch).union(batch.exceptAll(streamed))
        assert diff.count() == 0, width
    # the Aggregate levels are untouched by the opt-in family
    assert spark.read.parquet(svc.level_path(W0)).count() > 0


def test_stream_ingests_csv_chunks(spark, sf_dir, tmp_path):
    """source_format='csv' streams schema-pinned CSV chunks through the
    identical pipeline: the store equals a parquet-chunk ingest of the
    same rows (the interchange contract extended to the streaming edge)."""
    from metricq_db_hta_spark.sources import formats

    src = samples(spark, sf_dir).orderBy("event_id").limit(400)

    csv_dir = tmp_path / "csv_chunks"
    csv_dir.mkdir()
    formats.write_csv(src.coalesce(1), str(csv_dir / "c0"))
    store_csv = str(tmp_path / "store_from_csv")
    StreamingIngest(
        spark, store_csv, level_widths_ns=(W0,)
    ).run_until_drained(str(csv_dir), source_format="csv")

    pq_dir = tmp_path / "pq_chunks"
    pq_dir.mkdir()
    src.coalesce(1).write.parquet(str(pq_dir / "c0"))
    store_pq = str(tmp_path / "store_from_pq")
    StreamingIngest(
        spark, store_pq, level_widths_ns=(W0,)
    ).run_until_drained(str(pq_dir))

    a = spark.read.parquet(f"{store_csv}/raw").select(
        "metric", "ts_ns", "value", "event_id", "delta_ns"
    )
    b = spark.read.parquet(f"{store_pq}/raw").select(
        "metric", "ts_ns", "value", "event_id", "delta_ns"
    )
    assert a.count() == b.count() > 0
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_stream_csv_malformed_row_fails_loudly(spark, tmp_path):
    """A malformed row in a streamed CSV chunk must FAIL the batch (same
    FAILFAST contract as the batch interchange readers), never silently
    null into a row the validity filter then hides."""
    import pytest

    chunk = tmp_path / "bad_csv"
    chunk.mkdir()
    (chunk / "c0.csv").write_text(
        "metric,ts_ns,value,event_id\n"
        "m1,1760000000000000000,1.5,1\n"
        "m1,not_a_timestamp,2.5,2\n"
    )
    store = str(tmp_path / "store_badcsv")
    svc = StreamingIngest(spark, store, level_widths_ns=(W0,))
    with pytest.raises(Exception, match="FAILFAST|Malformed|BadRecord"):
        svc.run_until_drained(str(chunk), source_format="csv")
