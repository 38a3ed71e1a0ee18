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


def test_png_roundtrip_pins_pixels_and_filters(spark, sf_dir):
    """r14 PNG graduation: encode_fixture_png -> decode_png_pixels must
    reconstruct EXACTLY the generator's pixel formula through zlib and
    all five row filters (doc heights >= 5 exercise Paeth)."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(60)
    enc = multimodal.encode_fixture_png(docs)
    out = {r["doc_id"]: r for r in multimodal.decode_png_pixels(enc).collect()}
    assert len(out) == 60
    saw_paeth = False
    for i, r in out.items():
        w, h = i % 29 + 4, i % 17 + 4
        assert (r["width"], r["height"]) == (w, h)
        assert r["decoded_n_bytes"] == 3 * w * h
        want = bytes((i + 31 * rr + j) % 256 for rr in range(h) for j in range(3 * w))
        assert r["pixel_sha256"] == hashlib.sha256(want).hexdigest(), i
        saw_paeth |= h >= 5
    assert saw_paeth, "fixture must include rows using filter 4 (Paeth)"


def test_png_decoder_spec_conformance_independent_of_encoder(spark):
    """The decoder is checked against a PNG built here from the spec
    directly (filter 0 rows only: chunk layout + inflate, no shared
    filter math with the encoder), so an encoder/decoder bug pair cannot
    cancel out."""
    import hashlib
    import struct
    import zlib

    w, h = 3, 2
    px = bytes(range(3 * w * h))  # 18 deterministic bytes
    stream = b"".join(
        b"\x00" + px[r * 3 * w : (r + 1) * 3 * w] for r in range(h)
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(stream))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    )
    (r,) = multimodal.decode_png_pixels(df).collect()
    assert (r["width"], r["height"], r["decoded_n_bytes"]) == (w, h, 3 * w * h)
    assert r["pixel_sha256"] == hashlib.sha256(px).hexdigest()
    # and the metadata path recognizes PNG without raising in strict mode
    meta = multimodal.decode_media(
        df.withColumn("media_type", F.lit("image/png")), strict=True
    ).collect()
    assert (meta[0]["width"], meta[0]["height"]) == (w, h)


def test_png_unknown_profile_raises(spark):
    """Non-RGB / 16-bit / interlaced PNGs are the documented extension
    point — a clear NotImplementedError, not silent wrong pixels."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    rgba = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03\x04"))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, rgba)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|profile"):
        multimodal.decode_png_pixels(df).collect()


def test_png_missing_ihdr_raises_value_error(spark):
    """ADVICE r14: a payload with a valid PNG magic but no IHDR chunk
    (truncated/hostile input) must fail inside the documented ValueError
    contract, not with an opaque ``3 * None`` TypeError."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    headless = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03"))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, headless)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="missing IHDR"):
        multimodal.decode_png_pixels(df).collect()
