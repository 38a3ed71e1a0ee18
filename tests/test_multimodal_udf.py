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

    # adjacent hostile shapes stay inside the ValueError contract too
    # (r15 review #5): a short IHDR body must not leak struct.error,
    # corrupt IDAT bytes must not leak zlib.error
    import struct

    short_ihdr = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIB", 2, 2, 8))  # 9 bytes, not 13
        + chunk(b"IEND", b"")
    )
    df2 = spark.createDataFrame(
        [(1, short_ihdr)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="IHDR truncated"):
        multimodal.decode_png_pixels(df2).collect()

    bad_idat = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", b"\xff\xfe\xfd\xfc")  # not a zlib stream
        + chunk(b"IEND", b"")
    )
    df3 = spark.createDataFrame(
        [(1, bad_idat)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="IDAT corrupt"):
        multimodal.decode_png_pixels(df3).collect()


# -- r15: GIF graduation (full LZW) -----------------------------------------


def test_gif_roundtrip_pins_palette_and_lzw(spark, sf_dir):
    """encode_fixture_gif -> decode_gif_pixels must recover EXACTLY the
    generator's index formula through real LZW (the largest fixture
    images emit >256 table entries, so the 9->10-bit width growth is
    exercised), then map through the palette to the pinned RGB bytes."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(60)
    enc = multimodal.encode_fixture_gif(docs)
    out = {r["doc_id"]: r for r in multimodal.decode_gif_pixels(enc).collect()}
    assert len(out) == 60
    palette = bytes(
        b for k in range(256) for b in (k, (31 * k) % 256, (77 * k) % 256)
    )
    saw_width_growth = False
    for i, r in out.items():
        w, h = i % 23 + 4, i % 13 + 4
        assert (r["width"], r["height"]) == (w, h)
        assert r["decoded_n_bytes"] == 3 * w * h  # RGB bytes, PNG-unit
        idx = bytes((i + 7 * j) % 256 for j in range(w * h))
        rgb = b"".join(palette[3 * k : 3 * k + 3] for k in idx)
        assert r["rgb_sha256"] == hashlib.sha256(rgb).hexdigest(), i
        # ~one LZW table entry is added per emitted code; >254 pixels
        # guarantees next_code crosses 512 and the code width grows
        saw_width_growth |= w * h > 300
    assert saw_width_growth, "fixture must include images forcing 10-bit codes"


def _gif_wrap(w, h, palette, lzw_body, min_code=8, ipacked=0):
    import struct

    subs = b"".join(
        bytes([len(lzw_body[o : o + 255])]) + lzw_body[o : o + 255]
        for o in range(0, len(lzw_body), 255)
    )
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        + palette
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        + bytes([min_code])
        + subs
        + b"\x00\x3b"
    )


def test_gif_decoder_spec_conformance_independent_of_encoder(spark):
    """The decoder is checked against GIF bitstreams built here from the
    spec directly — a literal-coded stream with interleaved CLEAR codes
    (never touching the engine encoder's compression paths) and a
    hand-packed KwKwK sequence — so an encoder/decoder bug pair cannot
    cancel out."""
    import hashlib

    palette = bytes(b for k in range(256) for b in (k, k, k))

    # (a) literal-only 9-bit coding with a CLEAR every 250 literals:
    # width never grows, every pixel is its own code
    w, h = 25, 20
    idx = bytes((11 * j) % 256 for j in range(w * h))
    codes = [256]
    for n, k in enumerate(idx):
        if n and n % 250 == 0:
            codes.append(256)  # CLEAR resets the decoder table mid-image
        codes.append(k)
    codes.append(257)  # END
    acc = nbits = 0
    body = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body.append(acc & 0xFF)
    gif_a = _gif_wrap(w, h, palette, bytes(body))

    # (b) the KwKwK case: codes [CLEAR, 97, 258, END] decode to 'a'+'aa'
    acc = nbits = 0
    body2 = bytearray()
    for c in (256, 97, 258, 257):
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            body2.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body2.append(acc & 0xFF)
    gif_b = _gif_wrap(1, 3, palette, bytes(body2))

    # (c) a 64x64 literal stream with NO clears, packed with the decoder
    # width schedule mirrored independently (grow at table 2^w - 1, cap
    # at 4096): drives the decoder through 10-, 11- and 12-bit reads and
    # the table-full steady state
    w3, h3 = 64, 64
    idx3 = bytes((j * j + 3 * j) % 256 for j in range(w3 * h3))
    acc = nbits = 0
    body3 = bytearray()
    width = 9
    table_len = 258
    n_data = 0
    for c in [256] + list(idx3) + [257]:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            body3.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if c not in (256, 257):
            n_data += 1
            if n_data >= 2 and table_len < 4096:
                table_len += 1
            if table_len == (1 << width) - 1 and width < 12:
                width += 1
    if nbits:
        body3.append(acc & 0xFF)
    gif_c = _gif_wrap(w3, h3, palette, bytes(body3))

    df = spark.createDataFrame(
        [(1, gif_a), (2, gif_b), (3, gif_c)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in multimodal.decode_gif_pixels(df).collect()}
    rgb_a = b"".join(palette[3 * k : 3 * k + 3] for k in idx)
    assert got[1]["decoded_n_bytes"] == 3 * w * h
    assert got[1]["rgb_sha256"] == hashlib.sha256(rgb_a).hexdigest()
    rgb_b = b"".join(palette[3 * 97 : 3 * 97 + 3] for _ in range(3))
    assert got[2]["decoded_n_bytes"] == 9
    assert got[2]["rgb_sha256"] == hashlib.sha256(rgb_b).hexdigest()
    rgb_c = b"".join(palette[3 * k : 3 * k + 3] for k in idx3)
    assert got[3]["decoded_n_bytes"] == 3 * w3 * h3
    assert got[3]["rgb_sha256"] == hashlib.sha256(rgb_c).hexdigest()


def test_gif_width_boundary_streams_roundtrip(spark, sf_dir):
    """r15 review (empirically confirmed pre-fix): a stream whose final
    data code count lands EXACTLY on the decoder's 2^w - 1 growth
    threshold (254 post-clear codes at 9 bits) used to write END one bit
    narrower than the decoder reads it. (127,2)/(2,127) give 254
    all-distinct pixels -> exactly 254 codes through the REAL encoder;
    (383,2) is a larger-stream smoke (dictionary matches make its exact
    code count data-dependent, so the 10/11-bit END boundaries are not
    deterministically reachable here — the decoder's wide-code reads are
    pinned by the independent 64x64 conformance stream)."""
    import hashlib

    palette = bytes(
        b for k in range(256) for b in (k, (31 * k) % 256, (77 * k) % 256)
    )
    docs = load_table(spark, sf_dir, "documents").limit(3)
    for w, h in ((127, 2), (2, 127), (383, 2)):
        enc = multimodal.encode_fixture_gif(docs, dims_override=(w, h))
        out = {
            r["doc_id"]: r
            for r in multimodal.decode_gif_pixels(enc).collect()
        }
        for i, r in out.items():
            assert (r["width"], r["height"]) == (w, h)
            assert r["decoded_n_bytes"] == 3 * w * h
            idx = bytes((i + 7 * j) % 256 for j in range(w * h))
            rgb = b"".join(palette[3 * k : 3 * k + 3] for k in idx)
            assert r["rgb_sha256"] == hashlib.sha256(rgb).hexdigest(), (
                w, h, i,
            )


def test_gif_hostile_payloads_stay_in_contract(spark):
    """Truncation/corruption raise the documented ValueError; interlace
    raises NotImplementedError (the extension point) — never struct
    errors or silent wrong pixels."""
    palette = bytes(b for k in range(256) for b in (k, k, k))

    # LZW stream with no END code
    acc = nbits = 0
    body = bytearray()
    for c in (256, 5):
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        body.append(acc & 0xFF)
    no_end = _gif_wrap(1, 1, palette, bytes(body))
    interlaced = _gif_wrap(2, 2, palette, bytes(body), ipacked=0x40)
    truncated = _gif_wrap(2, 2, palette, bytes(body))[:-4]
    cases = [
        (1, no_end, "truncated"),
        (2, interlaced, "interlaced"),
        (3, truncated, "truncated"),
        (4, b"GIF89a\x00", "header truncated"),
    ]
    for doc_id, payload, match in cases:
        df = spark.createDataFrame(
            [(doc_id, payload)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match=match):
            multimodal.decode_gif_pixels(df).collect()


# -- r15: JPEG graduation (baseline SOF0 grayscale) -------------------------


def _jpeg_reference(i, w, h):
    """Independent numpy model of the fixture's quantize round-trip (the
    decoder's expected output, since JPEG is lossy but deterministic):
    pad -> DCT -> quantize -> dequantize -> IDCT -> clamp -> crop."""
    import numpy as np

    from metricq_db_hta_spark.operators import multimodal as mm

    ZZ = mm._jpeg_zigzag()
    Q = np.empty(64)
    Q[ZZ] = mm.JPEG_FIXTURE_QUANT
    Q2 = Q.reshape(8, 8)
    T = np.zeros((8, 8))
    for u in range(8):
        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = cu / 2 * np.cos((2 * x + 1) * u * np.pi / 16)
    img = np.fromfunction(
        lambda r, c: (i + 5 * r + 3 * c) % 256, (h, w)
    ).astype(np.float64)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    ref = np.empty((ph, pw))
    for br in range(0, ph, 8):
        for bc in range(0, pw, 8):
            blk = pad[br : br + 8, bc : bc + 8] - 128.0
            qf = np.round((T @ blk @ T.T) / Q2)
            ref[br : br + 8, bc : bc + 8] = T.T @ (qf * Q2) @ T + 128.0
    return np.clip(np.round(ref[:h, :w]), 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_matches_independent_reference(spark, sf_dir):
    """encode_fixture_jpeg -> decode_jpeg_pixels must reproduce the
    independent numpy quantize-roundtrip reference EXACTLY (bit-for-bit:
    both sides compute the same float pipeline in the same container) —
    an entropy-coding bug cannot cancel against the reference because
    the reference never touches Huffman/zigzag/bitstream code. Docs
    cover multi-block images (w,h up to 32x18 -> 12 MCUs) so the DC
    prediction chain and EOB/run coding are exercised across blocks."""
    import hashlib

    import numpy as np

    docs = load_table(spark, sf_dir, "documents").limit(60)
    enc = multimodal.encode_fixture_jpeg(docs)
    out = {r["doc_id"]: r for r in multimodal.decode_jpeg_pixels(enc).collect()}
    assert len(out) == 60
    multi_mcu = 0
    for i, r in out.items():
        w, h = i % 25 + 8, i % 11 + 8
        assert (r["width"], r["height"]) == (w, h)
        assert r["decoded_n_bytes"] == w * h
        ref = _jpeg_reference(i, w, h)
        assert r["pixel_sha256"] == hashlib.sha256(ref.tobytes()).hexdigest(), i
        multi_mcu += (-(-w // 8)) * (-(-h // 8)) > 1
        # lossy-but-close: the reference itself must stay near the source
        src = np.fromfunction(
            lambda rr, cc: (i + 5 * rr + 3 * cc) % 256, (h, w)
        )
        inner = np.abs(ref.astype(int) - src.astype(int))
        # wrap-around rows (255->0 jumps) ring hard; median error stays low
        assert np.median(inner) <= 24, i
    assert multi_mcu > 30, "fixture must be dominated by multi-MCU images"


def test_jpeg_metadata_and_dims_override(spark, sf_dir):
    """decode_media reads JPEG dims from SOF in strict mode; a 64x24
    dims_override exercises a 24-MCU image through the full pipeline."""
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(3)
    enc = multimodal.encode_fixture_jpeg(docs, dims_override=(64, 24))
    meta = multimodal.decode_media(enc, strict=True).collect()
    assert all((m["width"], m["height"]) == (64, 24) for m in meta)
    out = {r["doc_id"]: r for r in multimodal.decode_jpeg_pixels(enc).collect()}
    for i, r in out.items():
        ref = _jpeg_reference(i, 64, 24)
        assert r["pixel_sha256"] == hashlib.sha256(ref.tobytes()).hexdigest()


def test_jpeg_hostile_and_unsupported_payloads_stay_in_contract(spark):
    """Truncation/corruption raise ValueError; the documented
    extension points (progressive SOF2, restart intervals) raise
    NotImplementedError — never opaque struct/numpy errors."""
    import struct

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    sof2 = (
        b"\xff\xd8"
        + seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    dri = b"\xff\xd8" + seg(0xFFDD, struct.pack(">H", 4))
    no_sof = b"\xff\xd8\xff\xd9"
    # a valid tiny JPEG truncated mid-entropy-data
    from metricq_db_hta_spark.operators import multimodal as mm

    cases = [
        (1, sof2, "beyond baseline"),
        (2, dri, "restart intervals"),
        (3, no_sof, "missing SOF"),
        (4, b"\x00\x11\x22", "no SOI"),
    ]
    for doc_id, payload, match in cases:
        df = spark.createDataFrame(
            [(doc_id, payload)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match=match):
            mm.decode_jpeg_pixels(df).collect()

    # truncated segment BODIES stay ValueError too (r15 third review:
    # bare IndexError leaked from body[8]/body[2] indexing)
    short_sof = b"\xff\xd8" + seg(
        0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1)  # no component fields
    )
    short_sos = b"\xff\xd8" + seg(
        0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    ) + seg(0xFFDA, b"\x01")
    for doc_id, payload, match in (
        (6, short_sof, "SOF0 component truncated"),
        (7, short_sos, "SOS header truncated"),
    ):
        df = spark.createDataFrame(
            [(doc_id, payload)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match=match):
            mm.decode_jpeg_pixels(df).collect()

    # truncated entropy stream: encode a real doc, chop the tail
    docs = spark.createDataFrame([(5,)], "doc_id long")
    (full,) = mm.encode_fixture_jpeg(docs).collect()
    chopped = bytes(full["payload"])[:-20]
    df = spark.createDataFrame([(5, chopped)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="truncated"):
        mm.decode_jpeg_pixels(df).collect()

    # decode_media: a JPEG-magic blob with no reachable SOF raises only
    # under strict=True; non-strict falls back to the fake decode (the
    # same truncation-guard pattern as PNG/GIF — r15 third review)
    blob = b"\xff\xd8"
    df = spark.createDataFrame(
        [(8, blob, "image/jpeg")],
        "doc_id long, payload binary, media_type string",
    )
    (meta,) = mm.decode_media(df, strict=False).collect()
    assert meta["width"] == len(blob) % 640 + 1  # fake-decode formula
    with pytest.raises(Exception, match="missing SOF"):
        mm.decode_media(df, strict=True).collect()


# -- r15: full WAV PCM decode + audio features ------------------------------


def test_wav_sample_decode_roundtrip(spark, sf_dir):
    """decode_wav_samples recovers the fixture's exact PCM buffer (sha)
    and features; RMS matches a test-side numpy recompute of the sample
    formula bit-for-bit (every intermediate is an exact integer in
    float64)."""
    import hashlib

    import numpy as np

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2
    ).limit(30)
    enc = multimodal.encode_fixture_media(docs)
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_wav_samples(enc).collect()
    }
    assert out
    for i, r in out.items():
        ch, fr = i % 2 + 1, i % 500 + 8
        ns = fr * ch
        assert (r["frames"], r["channels"], r["sample_rate"]) == (
            fr, ch, 8000,
        )
        assert r["n_samples"] == ns
        samples = np.array(
            [(i + j) % 32768 - 16384 for j in range(ns)], dtype=np.int64
        )
        pcm = samples.astype("<i2").tobytes()
        assert r["pcm_sha256"] == hashlib.sha256(pcm).hexdigest()
        want_rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
        assert r["rms"] == want_rms, i


def test_wav_hostile_and_unsupported_stay_in_contract(spark):
    """Non-PCM / 8-bit WAVs are the documented extension point; torn
    chunks and bad geometry raise ValueError."""
    import struct

    def wav(audio_fmt=1, bps=16, block=None, data=b"\x00\x00", chop=0):
        ch = 1
        block = ch * bps // 8 if block is None else block
        b = (
            b"RIFF"
            + struct.pack("<I", 36 + len(data))
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, audio_fmt, ch, 8000,
                          8000 * block, block, bps)
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )
        return b[: len(b) - chop] if chop else b

    cases = [
        (1, wav(audio_fmt=3), "beyond PCM"),           # IEEE float
        (2, wav(bps=8, data=b"\x00"), "beyond 16-bit"),
        (3, wav(block=4), "block align"),
        (4, wav(chop=1), "truncated"),
        (5, b"RIFFxxxxNOPE", "not a WAV"),
        (6, b"RIFF\x00\x00\x00\x00WAVE", "missing fmt"),
        (7, wav()[: 12 + 8 + 16], "missing data"),  # fmt only, no data
        (8, wav(data=b"\x00\x00\x00"), "odd-sized"),
        # zero channels: spec-invalid geometry that previously slipped
        # every guard (0 == 0*2 block-align; r15 review)
        (
            9,
            b"RIFF" + struct.pack("<I", 40) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 0, 8000, 0, 0, 16)
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4,
            "zero channels",
        ),
    ]
    for doc_id, payload, match in cases:
        df = spark.createDataFrame(
            [(doc_id, payload)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match=match):
            multimodal.decode_wav_samples(df).collect()
