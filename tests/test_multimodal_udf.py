"""Multimodal plumbing + approx-distinct accuracy tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import multimodal
from metricq_db_hta_spark.queries.relational import events_df
from metricq_db_hta_spark.sources.tables import load_table


@pytest.fixture()
def payloads(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return multimodal.with_binary_payload(docs)


def test_decode_metadata(spark, payloads):
    out = multimodal.decode_media(payloads).collect()
    assert len(out) == 50
    for r in out:
        assert r["width"] == r["n_bytes"] % 640 + 1
        assert len(r["checksum"]) == 64


def test_decode_strict_marks_real_decoder_slot(spark, payloads):
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        multimodal.decode_media(payloads, strict=True).collect()


def test_resize_pads_and_truncates(spark, payloads):
    out = multimodal.resize_media(payloads, width=16, height=16).collect()
    assert all(len(r["payload"]) == 256 for r in out)


def test_frame_sampling_fanout(spark, payloads):
    out = multimodal.sample_frames(payloads, n_frames=4, frame_bytes=64)
    pdf = out.toPandas()
    assert len(pdf) == 50 * 4
    assert set(pdf["frame_idx"]) == {0, 1, 2, 3}
    assert all(len(p) <= 64 for p in pdf["frame_payload"])


def test_real_decode_roundtrip(spark, sf_dir):
    """encode_fixture_media -> strict decode_media recovers the encoder's
    arithmetic dimensions for all three real formats, and the checksum is
    the sha256 of the actual payload bytes."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(60)
    enc = multimodal.encode_fixture_media(docs)
    raw = {r["doc_id"]: bytes(r["payload"]) for r in enc.collect()}
    out = multimodal.decode_media(enc, strict=True).collect()
    assert len(out) == 60
    seen_types = set()
    for r in out:
        i = r["doc_id"]
        seen_types.add(r["media_type"])
        if i % 3 == 2:
            assert (r["width"], r["height"]) == (i % 500 + 8, i % 2 + 1)
        else:
            assert (r["width"], r["height"]) == (i % 61 + 4, i % 37 + 4)
        assert r["n_bytes"] == len(raw[i])
        assert r["checksum"] == hashlib.sha256(raw[i]).hexdigest()
    assert seen_types == {"image/x-portable-pixmap", "image/bmp", "audio/wav"}


def test_decoder_handles_format_variants(spark):
    """PPM comments and top-down BMPs (negative height) parse correctly."""
    import struct

    ppm = b"P6\n# a comment\n12 7\n255\n" + b"\x00" * (3 * 12 * 7)
    stride = (3 * 5 + 3) // 4 * 4
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + stride * 9, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 5, -9, 1, 24, 0, stride * 9, 0, 0, 0, 0)
        + b"\x00" * (stride * 9)
    )
    df = spark.createDataFrame(
        [(1, ppm, "image/x-portable-pixmap"), (2, bmp, "image/bmp")],
        "doc_id long, payload binary, media_type string",
    )
    got = {r["doc_id"]: (r["width"], r["height"])
           for r in multimodal.decode_media(df, strict=True).collect()}
    assert got == {1: (12, 7), 2: (5, 9)}


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """The rows-only declared query's sketch stays within 5% of exact."""
    ev = events_df(spark, sf_dir)
    joined = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r["approx"] - r["exact"]) <= max(2, 0.05 * r["exact"])
