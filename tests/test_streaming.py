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
