"""Multimodal column plumbing (LLM-pipeline surface, SURVEY §2 Part B).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata, decoded lazily inside Arrow-batched Python workers
(``mapInPandas``), never on the driver; partition by content-defined key
so one oversized asset cannot skew a task.

The decode is REAL for the three uncompressed container formats a
pure-Python worker can parse without media libraries:

* **PPM (P6)** — header token parse (incl. ``#`` comments) -> (width,
  height)
* **BMP** (BITMAPINFOHEADER, 24bpp) — little-endian header fields ->
  (width, |height|)
* **WAV** (RIFF/WAVE, PCM) — chunk walk over ``fmt ``/``data`` ->
  (frames, channels) reported as (width, height)

* **PNG** (8-bit RGB, non-interlaced) — REAL stdlib decode, graduated
  r14: ``decode_media`` reads (width, height) from IHDR;
  ``decode_png_pixels`` runs the full zlib inflate + per-row filter
  reconstruction (all five spec filter types) to the raw pixel buffer.

* **GIF** (GIF87a/89a, non-interlaced) — REAL stdlib decode, graduated
  r15: ``decode_media`` reads (width, height) from the logical screen
  descriptor; ``decode_gif_pixels`` runs a complete GIF-flavor LZW
  decompression (variable 9->12-bit code widths, clear/end codes,
  KwKwK case, 4096-entry table cap) plus palette mapping to RGB.

* **JPEG** (baseline SOF0, 8-bit grayscale) — REAL stdlib+numpy decode,
  graduated r15: ``decode_media`` reads (width, height) from the SOF
  header; ``decode_jpeg_pixels`` runs the full pipeline — generic
  DQT/DHT parse, Huffman + DC-prediction + run-length entropy decode,
  dequantize, inverse zigzag, float IDCT. Progressive/color/12-bit/
  restart-interval JPEGs raise NotImplementedError.

Formats needing real codec libraries (MP3/H.264) remain the
extension point: ``decode_media(..., strict=True)`` raises
NotImplementedError for those, marking it exactly; with ``strict=False``
an unknown payload falls back to a deterministic fake decode so the
plumbing stays testable on arbitrary bytes.

``encode_fixture_media`` builds real payloads of all three formats from
the documents fixture (deterministic per doc_id, dimensions arithmetically
predictable — that is what makes the decode DuckDB-oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata emitted per decoded asset
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum", StringType()),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat the utf-8 bytes of ``text`` as an opaque
    media payload column (the testdata has no real media blobs)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for unknown formats: dimensions derived from
    the byte length. (Duplicated inside decode_media's worker closure — see
    the pickling NOTE there.)"""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def encode_fixture_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL media payloads from the documents fixture, one format per
    doc (``doc_id % 3``: PPM / BMP / WAV), deterministic in ``doc_id``:

    * PPM:  w = id%61+4, h = id%37+4, raw RGB bytes ``(id+i) % 256``
    * BMP:  same (w, h); 24bpp bottom-up rows padded to 4 bytes
    * WAV:  channels = id%2+1, frames = id%500+8, 8 kHz 16-bit PCM

    Dimensions and byte counts are pure arithmetic in doc_id, so the DuckDB
    oracle can pin the decode output without re-encoding binaries in SQL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def ppm(i: int) -> bytes:
            w, h = i % 61 + 4, i % 37 + 4
            body = bytes((i + j) % 256 for j in range(3 * w * h))
            return b"P6\n%d %d\n255\n" % (w, h) + body

        def bmp(i: int) -> bytes:
            w, h = i % 61 + 4, i % 37 + 4
            stride = (3 * w + 3) // 4 * 4
            img = b"".join(
                bytes((i + r + j) % 256 for j in range(3 * w))
                + b"\x00" * (stride - 3 * w)
                for r in range(h)
            )
            hdr = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
            )
            return hdr + info + img

        def wav(i: int) -> bytes:
            ch, frames, rate, bps = i % 2 + 1, i % 500 + 8, 8000, 16
            block = ch * bps // 8
            data = b"".join(
                struct.pack("<h", (i + j) % 32768 - 16384)
                for j in range(frames * ch)
            )
            return (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVEfmt "
                + struct.pack(
                    "<IHHIIHH", 16, 1, ch, rate, rate * block, block, bps
                )
                + b"data"
                + struct.pack("<I", len(data))
                + data
            )

        kinds = [
            (ppm, "image/x-portable-pixmap"),
            (bmp, "image/bmp"),
            (wav, "audio/wav"),
        ]
        for pdf in batches:
            enc, mt = [], []
            for i in pdf["doc_id"]:
                build, typ = kinds[int(i) % 3]
                enc.append(build(int(i)))
                mt.append(typ)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": enc, "media_type": mt}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=schema
    )


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode over ``(doc_id, payload, media_type)``.

    Real pure-Python parsers for PPM/BMP/WAV (see module docstring); for
    any other payload ``strict=True`` raises NotImplementedError (the
    PIL/ffmpeg extension point), ``strict=False`` falls back to the
    deterministic fake decode.
    """

    # NOTE: the closure must be fully self-contained (no references to
    # module-level names): this package is not installed on Spark's Python
    # workers, so cloudpickle must serialize everything by value — a module
    # global (e.g. _fake_decode) would be pickled by reference and fail to
    # import worker-side when the driver runs from another cwd.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def parse_ppm(p: bytes) -> tuple[int, int]:
            # token scan: magic, width, height, maxval; '#' starts a comment
            toks, i, n = [], 2, len(p)
            while len(toks) < 3 and i < n:
                while i < n and p[i : i + 1].isspace():
                    i += 1
                if p[i : i + 1] == b"#":
                    while i < n and p[i] != 0x0A:
                        i += 1
                    continue
                j = i
                while j < n and not p[j : j + 1].isspace():
                    j += 1
                toks.append(int(p[i:j]))
                i = j
            return toks[0], toks[1]

        def parse_bmp(p: bytes) -> tuple[int, int]:
            w, h = struct.unpack_from("<ii", p, 18)
            return w, abs(h)  # negative height = top-down rows

        def parse_wav(p: bytes) -> tuple[int, int]:
            # RIFF chunk walk: block_align from 'fmt ', frames from 'data'
            i, n = 12, len(p)
            channels = block_align = frames = None
            while i + 8 <= n:
                cid = p[i : i + 4]
                (size,) = struct.unpack_from("<I", p, i + 4)
                if cid == b"fmt ":
                    _, channels, _, _, block_align, _ = struct.unpack_from(
                        "<HHIIHH", p, i + 8
                    )
                elif cid == b"data":
                    frames = size // max(1, block_align or 1)
                i += 8 + size + (size & 1)  # chunks are word-aligned
            return int(frames), int(channels)

        def fake_decode(p: bytes) -> tuple[int, int]:
            n = len(p)
            return (n % 640 + 1, n % 480 + 1)

        def decode(p: bytes) -> tuple[int, int]:
            if p[:2] == b"P6":
                return parse_ppm(p)
            if p[:2] == b"BM":
                return parse_bmp(p)
            if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                return parse_wav(p)
            if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
                # IHDR is the first chunk: bytes 16..24 are (w, h). The
                # FULL pixel decode (inflate + filter reconstruction)
                # lives in decode_png_pixels; metadata extraction here
                # only needs the header (r14 PNG graduation). The length
                # guard keeps a truncated PNG-magic blob on the
                # arbitrary-bytes path below instead of a struct.error.
                w, h = struct.unpack_from(">II", p, 16)
                return int(w), int(h)
            if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
                # logical screen descriptor; the FULL pixel decode (LZW)
                # lives in decode_gif_pixels (r15 GIF graduation)
                w, h = struct.unpack_from("<HH", p, 6)
                return int(w), int(h)
            if p[:2] == b"\xff\xd8":
                # JPEG: walk marker segments to the SOF frame header
                # (r15 graduation; full decode in decode_jpeg_pixels).
                # A JPEG-magic blob with no reachable SOF stays on the
                # arbitrary-bytes path below under strict=False, the
                # same truncation-guard pattern as PNG/GIF above.
                j = 2
                while j + 9 <= len(p) and p[j] == 0xFF:
                    m, (ln,) = p[j + 1], struct.unpack_from(">H", p, j + 2)
                    if m in (0xC0, 0xC1, 0xC2, 0xC3):  # SOFn dims
                        _, fh, fw = struct.unpack_from(">BHH", p, j + 4)
                        return int(fw), int(fh)
                    if m in (0xD9, 0xDA):
                        break
                    j += 2 + ln
                if strict:
                    raise ValueError("JPEG missing SOF frame header")
            if strict:
                raise NotImplementedError(
                    "compressed/unknown media format (MP3/H.264 need real "
                    "codec libraries, not in this container; PNG/GIF/JPEG "
                    "are handled above)"
                )
            return fake_decode(p)

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            dims = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "checksum": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                }
            )

    return df.select("doc_id", "payload", "media_type").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def resize_media(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: Arrow-batched, deterministic stub (truncate/pad the
    payload to width*height bytes where a real resampler would go)."""

    def run(batches):
        import pandas as _pd

        n = width * height
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [width] * len(payloads),
                    "height": [height] * len(payloads),
                    "payload": [
                        (p + b"\x00" * n)[:n] for p in payloads
                    ],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_bytes: int = 256) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit ``n_frames``
    evenly spaced byte-slices per asset (1 input row -> n output rows; the
    real decoder slots in per frame). Shape matters here: the fan-out
    happens inside the Arrow batch, never on the driver."""

    def run(batches):
        import pandas as _pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(payload)
                stride = max(1, (len(p) - frame_bytes) // max(1, n_frames - 1))
                for i in range(n_frames):
                    start = min(i * stride, max(0, len(p) - frame_bytes))
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(p[start : start + frame_bytes])
            yield _pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# PNG: the one compressed image format stdlib can genuinely decode
# (zlib inflate + per-row filter reconstruction + struct chunk walk) —
# graduated from the strict-mode extension point in r14 the way the JDBC
# leg graduated in r13. JPEG/MP3/H.264 remain the documented
# NotImplementedError: they need real codec libraries this container
# does not ship.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

PNG_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("decoded_n_bytes", LongType()),
        StructField("pixel_sha256", StringType()),
    ]
)


def encode_fixture_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL PNG payloads (8-bit RGB, color type 2, non-interlaced),
    deterministic in ``doc_id``: w = id%29+4, h = id%17+4, raw pixel byte
    stream ``(id + 31*r + j) % 256`` for row r, byte j. Row r is encoded
    with filter type ``r % 5`` — decoding these files REQUIRES real
    Sub/Up/Average/Paeth reconstruction, not just a header read. The
    dimensions (and the reconstructed byte count 3*w*h) are pure
    arithmetic in doc_id, so the decode is DuckDB-oracle-checkable; the
    compressed size is zlib-version-dependent and deliberately NOT part
    of any oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        def filt(ftype: int, row: bytes, prev: bytes, bpp: int = 3) -> bytes:
            if ftype == 0:
                return row
            out = bytearray(len(row))
            for j, x in enumerate(row):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:  # 4: Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[j] = (x - pred) & 0xFF
            return bytes(out)

        def png(i: int) -> bytes:
            w, h = i % 29 + 4, i % 17 + 4
            stride = 3 * w
            prev = bytes(stride)
            stream = bytearray()
            for r in range(h):
                row = bytes((i + 31 * r + j) % 256 for j in range(stride))
                stream.append(r % 5)
                stream += filt(r % 5, row, prev)
                prev = row
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(stream)))
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [png(int(i)) for i in pdf["doc_id"]],
                    "media_type": ["image/png"] * len(pdf),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=schema
    )


def decode_png_pixels(df: DataFrame) -> DataFrame:
    """FULL PNG decode, Arrow-batched: struct chunk walk -> concatenated
    IDAT zlib inflate -> per-row filter reconstruction (all five filter
    types per the PNG spec) -> raw RGB pixel buffer. Emits the
    reconstructed byte count (== 3*w*h iff the inflate+unfilter produced
    exactly the spec'd amount of data) and the sha256 of the pixel
    buffer, which tests pin against the generator formula. Supports the
    fixture's profile (8-bit, color type 2 RGB, non-interlaced) and
    raises NotImplementedError for other PNG profiles — the same
    documented extension-point contract as JPEG."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct
        import zlib

        def unfilt(ftype: int, cur: bytes, prev: bytes, bpp: int = 3) -> bytes:
            if ftype == 0:
                return bytes(cur)
            out = bytearray(len(cur))
            for j, x in enumerate(cur):
                a = out[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"invalid PNG filter type {ftype}")
                out[j] = (x + pred) & 0xFF
            return bytes(out)

        def decode(p: bytes) -> tuple[int, int, bytes]:
            if p[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG payload")
            i, n = 8, len(p)
            idat = bytearray()
            w = h = None
            while i + 8 <= n:
                (size,) = struct.unpack_from(">I", p, i)
                tag = p[i + 4 : i + 8]
                body = p[i + 8 : i + 8 + size]
                if tag == b"IHDR":
                    if len(body) < 13:
                        # declared-size lies / truncation: stay inside
                        # the ValueError contract, not struct.error
                        raise ValueError(
                            f"PNG IHDR truncated ({len(body)} bytes)"
                        )
                    w, h, depth, ctype, _comp, _filt, ilace = struct.unpack(
                        ">IIBBBBB", body[:13]
                    )
                    if depth != 8 or ctype != 2 or ilace != 0:
                        raise NotImplementedError(
                            "PNG profile beyond 8-bit RGB non-interlaced: "
                            f"depth={depth} color_type={ctype} "
                            f"interlace={ilace}"
                        )
                elif tag == b"IDAT":
                    idat += body
                elif tag == b"IEND":
                    break
                i += 12 + size
            if w is None:
                # valid magic but the chunk walk found no IHDR (truncated
                # or hostile payload): fail inside the module's documented
                # ValueError contract, not with an opaque TypeError from
                # 3 * None below (ADVICE r14)
                raise ValueError("PNG missing IHDR chunk")
            try:
                stream = zlib.decompress(bytes(idat))
            except zlib.error as e:
                raise ValueError(f"PNG IDAT corrupt: {e}") from e
            stride = 3 * w
            if len(stream) != h * (1 + stride):
                raise ValueError(
                    f"PNG scanline stream is {len(stream)} bytes, "
                    f"expected {h * (1 + stride)}"
                )
            prev = bytes(stride)
            px = bytearray()
            for r in range(h):
                off = r * (1 + stride)
                row = unfilt(
                    stream[off], stream[off + 1 : off + 1 + stride], prev
                )
                px += row
                prev = row
            return w, h, bytes(px)

        for pdf in batches:
            out = {
                "doc_id": [],
                "width": [],
                "height": [],
                "decoded_n_bytes": [],
                "pixel_sha256": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode(bytes(payload))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["decoded_n_bytes"].append(len(px))
                out["pixel_sha256"].append(hashlib.sha256(px).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=PNG_DECODED_SCHEMA
    )


GIF_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("decoded_n_bytes", LongType()),
        StructField("rgb_sha256", StringType()),
    ]
)


def encode_fixture_gif(
    docs: DataFrame,
    id_col: str = "doc_id",
    dims_override: tuple[int, int] | None = None,
) -> DataFrame:
    """REAL GIF89a payloads (256-color global palette, non-interlaced),
    deterministic in ``doc_id``: w = id%23+4, h = id%13+4, palette index
    stream ``(id + 7*j) % 256``, palette entry k = (k, 31k%256, 77k%256).
    The index stream is REAL LZW-compressed (variable code width 9->12
    bits, clear/reset at table-full — the GIF flavor), and a Graphic
    Control Extension precedes the image so decoders must walk extension
    sub-blocks. Dimensions and the decoded index count w*h are pure
    arithmetic in doc_id (DuckDB-oracle-checkable); the compressed size
    depends on the LZW table evolution and is deliberately NOT part of
    any oracle.

    ``dims_override=(w, h)`` pins every doc to fixed dimensions — a test
    seam: the 9-bit END-width boundary (exactly 254 post-clear data
    codes: all-distinct pixels, no dictionary hits) is unreachable under
    the doc_id formula (254 = 2*127 has no factorization with both sides
    >= 4), so boundary tests encode (127, 2)/(2, 127) through the REAL
    encoder instead of hand-packing. The deeper 10/11-bit boundaries
    cannot be hit deterministically through this encoder (repeats past
    256 pixels create dictionary matches, making the code count
    data-dependent); the decoder's 10-12-bit width handling is pinned by
    the independently-packed 64x64 conformance stream instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def lzw(data: bytes, min_code: int = 8) -> bytes:
            clear, end = 1 << min_code, (1 << min_code) + 1
            out = bytearray()
            acc = [0, 0]  # bit accumulator, bit count (LSB-first packing)
            width = [min_code + 1]

            def emit(code: int) -> None:
                acc[0] |= code << acc[1]
                acc[1] += width[0]
                while acc[1] >= 8:
                    out.append(acc[0] & 0xFF)
                    acc[0] >>= 8
                    acc[1] -= 8

            table = {bytes([i]): i for i in range(1 << min_code)}
            next_code = [end + 1]
            emit(clear)
            s = b""
            for ch in data:
                sc = s + bytes([ch])
                if sc in table:
                    s = sc
                    continue
                emit(table[s])
                if next_code[0] < 4096:
                    table[sc] = next_code[0]
                    next_code[0] += 1
                    # canonical GIF rule (GIFLIB): grow when the next
                    # code to ASSIGN reaches 2^width — mirrored exactly
                    # by the decoder's len(table) == 2^width check
                    if next_code[0] == (1 << width[0]) and width[0] < 12:
                        width[0] += 1
                else:
                    emit(clear)
                    table = {bytes([i]): i for i in range(1 << min_code)}
                    next_code[0] = end + 1
                    width[0] = min_code + 1
                s = bytes([ch])
            if s:
                emit(table[s])
                # the final emit adds NO table entry on the encoder side,
                # but the decoder still adds one for it — its table can
                # hit the 2^w - 1 growth threshold on that add and read
                # END at the wider width. Mirror that here or a stream
                # whose final data code lands exactly on the boundary
                # (254/766/1790 post-clear codes) writes END one bit too
                # narrow (r15 review, empirically confirmed).
                if next_code[0] == (1 << width[0]) - 1 and width[0] < 12:
                    width[0] += 1
            emit(end)
            if acc[1]:
                out.append(acc[0] & 0xFF)
            return bytes(out)

        def gif(i: int) -> bytes:
            w, h = dims_override or (i % 23 + 4, i % 13 + 4)
            palette = b"".join(
                bytes((k, (31 * k) % 256, (77 * k) % 256)) for k in range(256)
            )
            idx = bytes((i + 7 * j) % 256 for j in range(w * h))
            body = lzw(idx)
            subs = b"".join(
                bytes([len(body[o : o + 255])]) + body[o : o + 255]
                for o in range(0, len(body), 255)
            )
            return (
                b"GIF89a"
                + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 colors
                + palette
                + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE (skippable)
                + b"\x2c"
                + struct.pack("<HHHHB", 0, 0, w, h, 0)  # no LCT/interlace
                + bytes([8])  # LZW minimum code size
                + subs
                + b"\x00\x3b"  # sub-block terminator + trailer
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [gif(int(i)) for i in pdf["doc_id"]],
                    "media_type": ["image/gif"] * len(pdf),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=schema
    )


def decode_gif_pixels(df: DataFrame) -> DataFrame:
    """FULL GIF decode, Arrow-batched, stdlib-only: header + logical
    screen descriptor parse, global color table read, extension-block
    walk, image descriptor, and a complete GIF-flavor LZW decompression
    (variable code width, clear/end codes, 12-bit table cap) back to the
    palette index stream, then palette mapping to the RGB buffer. Emits
    the decoded RGB byte count (== 3*w*h iff the LZW stream produced
    exactly the spec'd pixel count — the same unit as the PNG twin's
    decoded_n_bytes, r15 review #5) and the sha256 of the buffer, which
    tests pin against the generator formula. Interlaced images and
    local color tables beyond the fixture profile raise
    NotImplementedError (the same documented extension-point contract as
    non-baseline PNG); truncated or corrupt payloads raise ValueError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        def lzw_decode(data: bytes, min_code: int) -> bytes:
            clear, end = 1 << min_code, (1 << min_code) + 1
            base = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
            table = list(base)
            width = min_code + 1
            acc = nbits = pos = 0
            out = bytearray()
            prev: bytes | None = None
            n = len(data)
            while True:
                while nbits < width:
                    if pos >= n:
                        raise ValueError("GIF LZW stream truncated (no END)")
                    acc |= data[pos] << nbits
                    nbits += 8
                    pos += 1
                code = acc & ((1 << width) - 1)
                acc >>= width
                nbits -= width
                if code == clear:
                    table = list(base)
                    width = min_code + 1
                    prev = None
                    continue
                if code == end:
                    return bytes(out)
                if prev is None:
                    if code >= len(table):
                        raise ValueError("GIF LZW first code out of range")
                    entry = table[code]
                elif code < len(table):
                    entry = table[code]
                    if len(table) < 4096:  # table caps at 12-bit codes
                        table.append(prev + entry[:1])
                elif code == len(table) and len(table) < 4096:
                    entry = prev + prev[:1]  # the KwKwK case
                    table.append(entry)
                else:
                    raise ValueError("GIF LZW code out of range")
                out += entry
                # canonical decoder rule: the decoder's table runs ONE
                # entry behind the encoder's (the encoder adds its entry
                # with the emit; the decoder only learns it from the NEXT
                # code), so the width grows when the table reaches
                # 2^width - 1 — growing at 2^width would read one code
                # too many at the narrow width
                if len(table) == (1 << width) - 1 and width < 12:
                    width += 1
                prev = entry

        def decode(p: bytes) -> tuple[int, int, bytes]:
            if p[:6] not in (b"GIF87a", b"GIF89a"):
                raise ValueError("not a GIF payload")
            if len(p) < 13:
                raise ValueError("GIF header truncated")
            w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", p, 6)
            i = 13
            palette = b""
            if packed & 0x80:
                size = 3 * (2 << (packed & 0x07))
                palette = p[i : i + size]
                if len(palette) < size:
                    raise ValueError("GIF global color table truncated")
                i += size
            while i < len(p):
                b0 = p[i]
                if b0 == 0x21:  # extension: label + sub-blocks
                    i += 2
                    while i < len(p) and p[i]:
                        i += 1 + p[i]
                    i += 1
                elif b0 == 0x2C:  # image descriptor
                    if i + 10 > len(p):
                        raise ValueError("GIF image descriptor truncated")
                    _l, _t, iw, ih, ipacked = struct.unpack_from(
                        "<HHHHB", p, i + 1
                    )
                    i += 10
                    if ipacked & 0x40:
                        raise NotImplementedError(
                            "interlaced GIF beyond the fixture profile"
                        )
                    if ipacked & 0x80:
                        size = 3 * (2 << (ipacked & 0x07))
                        palette = p[i : i + size]  # local table wins
                        if len(palette) < size:
                            raise ValueError("GIF local color table truncated")
                        i += size
                    if i >= len(p):
                        raise ValueError("GIF LZW code size missing")
                    min_code = p[i]
                    i += 1
                    if not 2 <= min_code <= 11:
                        raise ValueError(
                            f"GIF LZW minimum code size {min_code} invalid"
                        )
                    body = bytearray()
                    while True:
                        if i >= len(p):
                            raise ValueError("GIF data sub-blocks truncated")
                        ln = p[i]
                        i += 1
                        if ln == 0:
                            break
                        body += p[i : i + ln]
                        i += ln
                    idx = lzw_decode(bytes(body), min_code)
                    if not palette:
                        raise ValueError("GIF image without a color table")
                    rgb = bytearray()
                    ncol = len(palette) // 3
                    for k in idx:
                        if k >= ncol:
                            raise ValueError(
                                f"GIF palette index {k} >= {ncol}"
                            )
                        rgb += palette[3 * k : 3 * k + 3]
                    return int(iw), int(ih), bytes(rgb)
                elif b0 == 0x3B:  # trailer: no image seen
                    break
                else:
                    raise ValueError(f"unknown GIF block 0x{b0:02x}")
            raise ValueError("GIF contains no image data")

        for pdf in batches:
            out = {
                "doc_id": [],
                "width": [],
                "height": [],
                "decoded_n_bytes": [],
                "rgb_sha256": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = decode(bytes(payload))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["decoded_n_bytes"].append(len(rgb))
                out["rgb_sha256"].append(hashlib.sha256(rgb).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=GIF_DECODED_SCHEMA
    )


JPEG_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("decoded_n_bytes", LongType()),
        StructField("pixel_sha256", StringType()),
    ]
)

#: the fixture's quantization table in zigzag order — mild, varying, and
#: deterministic; shared by the encoder and the pytest reference model
#: (the DECODER never sees this constant: it reads the table from DQT)
JPEG_FIXTURE_QUANT = [(k % 13) + 4 for k in range(64)]


def _jpeg_zigzag() -> list[int]:
    """The standard 8x8 zigzag index order, generated (not hardcoded):
    walk anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()
        order += [8 * r + c for r, c in diag]
    return order



def encode_fixture_jpeg(
    docs: DataFrame,
    id_col: str = "doc_id",
    dims_override: tuple[int, int] | None = None,
) -> DataFrame:
    """REAL baseline JPEG payloads (SOF0, 8-bit GRAYSCALE, no
    subsampling, no restart markers), deterministic in ``doc_id``:
    w = id%25+8, h = id%11+8, pixel (r, c) = (id + 5r + 3c) % 256.
    Full encode pipeline: edge-replication padding to 8x8 blocks, level
    shift, float64 2-D DCT-II, quantization by :data:`JPEG_FIXTURE_QUANT`
    (declared in DQT), zigzag, DC differencing, canonical Huffman coding
    with CUSTOM fixed-length tables declared in DHT (12 DC categories at
    4 bits, the 162-symbol AC alphabet at 8 bits — valid canonical JPEG
    tables with the all-ones codeword unused, so no spec-appendix
    constants are involved and the decoder must parse DHT generically),
    0xFF byte stuffing. JPEG is lossy: the decode oracle pins dimensions and byte
    counts; pixel EXACTNESS is pinned in pytest against an independent
    numpy reference of the same quantize round-trip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        # --- shared helpers (self-contained: see decode_media NOTE) ---
        def zigzag() -> list[int]:
            order = []
            for s in range(15):
                diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
                if s % 2 == 0:
                    diag.reverse()
                order += [8 * r + c for r, c in diag]
            return order

        ZZ = zigzag()
        QUANT = [(k % 13) + 4 for k in range(64)]
        dc_bits = [0] * 16
        dc_bits[3] = 12
        dc_vals = list(range(12))
        ac_bits = [0] * 16
        ac_bits[7] = 162
        ac_vals = [0x00, 0xF0] + [
            (r << 4) | s for r in range(16) for s in range(1, 11)
        ]

        def canonical_codes(bits, vals):
            out, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[vals[k]] = (code, ln)
                    code += 1
                    k += 1
                code <<= 1
            return out

        DC = canonical_codes(dc_bits, dc_vals)
        AC = canonical_codes(ac_bits, ac_vals)
        T = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                T[u, x] = cu / 2 * np.cos((2 * x + 1) * u * np.pi / 16)

        class BitWriter:
            def __init__(self):
                self.out = bytearray()
                self.acc = 0
                self.n = 0

            def put(self, code: int, length: int) -> None:
                self.acc = (self.acc << length) | (code & ((1 << length) - 1))
                self.n += length
                while self.n >= 8:
                    b = (self.acc >> (self.n - 8)) & 0xFF
                    self.out.append(b)
                    if b == 0xFF:
                        self.out.append(0x00)  # byte stuffing
                    self.n -= 8
                self.acc &= (1 << self.n) - 1

            def flush(self) -> bytes:
                if self.n:
                    pad = 8 - self.n
                    b = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
                    self.out.append(b)
                    if b == 0xFF:
                        self.out.append(0x00)
                    self.n = 0
                return bytes(self.out)

        def category(v: int) -> int:
            return int(v).bit_length() if v > 0 else int(-v).bit_length()

        def put_amplitude(bw, v: int, s: int) -> None:
            if s == 0:
                return
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)

        def seg(marker: int, body: bytes) -> bytes:
            return struct.pack(">HH", marker, len(body) + 2) + body

        def jpeg(i: int) -> bytes:
            w, h = dims_override or (i % 25 + 8, i % 11 + 8)
            img = np.fromfunction(
                lambda r, c: (i + 5 * r + 3 * c) % 256, (h, w)
            ).astype(np.float64)
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            img = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
            q2d = np.empty(64)
            q2d[ZZ] = QUANT  # DQT declares zigzag order; use natural here
            q2d = q2d.reshape(8, 8)
            bw = BitWriter()
            prev_dc = 0
            for br in range(0, ph, 8):
                for bc in range(0, pw, 8):
                    blk = img[br : br + 8, bc : bc + 8] - 128.0
                    F_ = T @ blk @ T.T
                    coef = np.round(F_ / q2d).astype(int)
                    zz = [int(coef.flat[k]) for k in ZZ]
                    diff = zz[0] - prev_dc
                    prev_dc = zz[0]
                    s = category(diff)
                    bw.put(*DC[s])
                    put_amplitude(bw, diff, s)
                    run = 0
                    last_nz = 0
                    for k in range(1, 64):
                        if zz[k]:
                            last_nz = k
                    for k in range(1, last_nz + 1):
                        if zz[k] == 0:
                            run += 1
                            continue
                        while run > 15:
                            bw.put(*AC[0xF0])  # ZRL
                            run -= 16
                        s = category(zz[k])
                        bw.put(*AC[(run << 4) | s])
                        put_amplitude(bw, zz[k], s)
                        run = 0
                    if last_nz < 63:
                        bw.put(*AC[0x00])  # EOB
            data = bw.flush()
            dqt = seg(0xFFDB, bytes([0x00]) + bytes(QUANT))
            sof = seg(
                0xFFC0,
                struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
            )
            dht = seg(
                0xFFC4,
                bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
                + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals),
            )
            sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
            return (
                b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [jpeg(int(i)) for i in pdf["doc_id"]],
                    "media_type": ["image/jpeg"] * len(pdf),
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        run, schema=schema
    )


def decode_jpeg_pixels(df: DataFrame) -> DataFrame:
    """FULL baseline JPEG decode, Arrow-batched, stdlib+numpy only:
    marker walk (APPn/COM skipped), generic DQT/DHT parsing (canonical
    Huffman reconstruction from bits+values — the decoder carries NO
    table constants of its own), SOF0 frame header, entropy-coded
    segment with 0xFF00 de-stuffing, Huffman + DC-prediction + run-
    length decode, dequantize, inverse zigzag, float64 IDCT, level
    shift, clamp, crop to (w, h). Emits the decoded byte count (== w*h
    for the grayscale profile iff every MCU decoded) and the sha256 of
    the gray pixel buffer; pytest pins pixels against an independent
    numpy quantize-roundtrip reference, so an encoder/decoder bug pair
    cannot cancel out. Progressive (SOF2), multi-component frames,
    12-bit precision and restart intervals raise NotImplementedError —
    the same documented extension-point contract as non-baseline PNG;
    truncated or corrupt payloads raise ValueError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        import numpy as np

        def zigzag() -> list[int]:
            order = []
            for s in range(15):
                diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
                if s % 2 == 0:
                    diag.reverse()
                order += [8 * r + c for r, c in diag]
            return order

        ZZ = zigzag()
        T = np.zeros((8, 8))
        for u in range(8):
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                T[u, x] = cu / 2 * np.cos((2 * x + 1) * u * np.pi / 16)

        def canonical_decode_table(bits, vals):
            table, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    table[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return table

        class BitReader:
            def __init__(self, data: bytes):
                self.d = data
                self.pos = 0
                self.acc = 0
                self.n = 0

            def bit(self) -> int:
                if self.n == 0:
                    if self.pos >= len(self.d):
                        raise ValueError(
                            "JPEG entropy data truncated mid-block"
                        )
                    self.acc = self.d[self.pos]
                    self.pos += 1
                    self.n = 8
                self.n -= 1
                return (self.acc >> self.n) & 1

            def bits(self, k: int) -> int:
                v = 0
                for _ in range(k):
                    v = (v << 1) | self.bit()
                return v

        def huff(br, table):
            code, ln = 0, 0
            while ln < 16:
                code = (code << 1) | br.bit()
                ln += 1
                if (ln, code) in table:
                    return table[(ln, code)]
            raise ValueError("JPEG Huffman code not in table")

        def extend(v: int, s: int) -> int:
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        def decode(p: bytes) -> tuple[int, int, bytes]:
            if p[:2] != b"\xff\xd8":
                raise ValueError("not a JPEG payload (no SOI)")
            i = 2
            quant: dict[int, list[int]] = {}
            dc_tabs: dict[int, dict] = {}
            ac_tabs: dict[int, dict] = {}
            w = h = None
            td = ta = tq = 0
            data = None
            while i + 4 <= len(p):
                if p[i] != 0xFF:
                    raise ValueError(f"JPEG marker sync lost at {i}")
                m = p[i + 1]
                if m == 0xD9:  # EOI before SOS
                    break
                (ln,) = struct.unpack_from(">H", p, i + 2)
                body = p[i + 4 : i + 2 + ln]
                if len(body) != ln - 2:
                    raise ValueError("JPEG segment truncated")
                if m == 0xDB:  # DQT
                    j = 0
                    while j < len(body):
                        pq, tq_id = body[j] >> 4, body[j] & 0x0F
                        if pq != 0:
                            raise NotImplementedError(
                                "16-bit quantization tables"
                            )
                        quant[tq_id] = list(body[j + 1 : j + 65])
                        if len(quant[tq_id]) != 64:
                            raise ValueError("JPEG DQT truncated")
                        j += 65
                elif m == 0xC4:  # DHT
                    j = 0
                    while j < len(body):
                        tc, th = body[j] >> 4, body[j] & 0x0F
                        bits = list(body[j + 1 : j + 17])
                        nv = sum(bits)
                        vals = list(body[j + 17 : j + 17 + nv])
                        if len(bits) != 16 or len(vals) != nv:
                            raise ValueError("JPEG DHT truncated")
                        tab = canonical_decode_table(bits, vals)
                        (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                        j += 17 + nv
                elif m == 0xC0:  # SOF0 baseline
                    if len(body) < 6:
                        raise ValueError("JPEG SOF0 header truncated")
                    prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
                    if prec != 8:
                        raise NotImplementedError("12-bit JPEG precision")
                    if nf != 1:
                        raise NotImplementedError(
                            "multi-component (color) JPEG frames"
                        )
                    if len(body) < 9:
                        raise ValueError("JPEG SOF0 component truncated")
                    # per-component fields: body[6]=id, body[7]=H/V
                    # sampling (moot for one component), body[8]=Tq
                    tq = body[8]
                elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                           0xCB, 0xCD, 0xCE, 0xCF):
                    raise NotImplementedError(
                        f"JPEG frame type 0xFF{m:02X} beyond baseline "
                        "sequential SOF0 (progressive/hierarchical/"
                        "arithmetic)"
                    )
                elif m == 0xDD:
                    raise NotImplementedError("JPEG restart intervals")
                elif m == 0xDA:  # SOS
                    if len(body) < 6:
                        raise ValueError("JPEG SOS header truncated")
                    ns = body[0]
                    if ns != 1:
                        raise NotImplementedError("multi-scan JPEG")
                    td, ta = body[2] >> 4, body[2] & 0x0F
                    # entropy data runs from after this segment to EOI;
                    # de-stuff 0xFF00 and stop at any real marker
                    j = i + 2 + ln
                    raw = bytearray()
                    while j < len(p):
                        b = p[j]
                        if b == 0xFF:
                            nxt = p[j + 1] if j + 1 < len(p) else None
                            if nxt == 0x00:
                                raw.append(0xFF)
                                j += 2
                                continue
                            break  # a real marker (EOI expected)
                        raw.append(b)
                        j += 1
                    data = bytes(raw)
                    break
                i += 2 + ln
            if w is None or h is None:
                raise ValueError("JPEG missing SOF0 frame header")
            if data is None:
                raise ValueError("JPEG missing SOS entropy data")
            if tq not in quant or td not in dc_tabs or ta not in ac_tabs:
                raise ValueError("JPEG references an undeclared table")
            q2d = np.empty(64)
            q2d[ZZ] = quant[tq]
            q2d = q2d.reshape(8, 8)
            br = BitReader(data)
            ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
            out = np.empty((ph, pw))
            prev_dc = 0
            for brow in range(0, ph, 8):
                for bcol in range(0, pw, 8):
                    zz = [0] * 64
                    s = huff(br, dc_tabs[td])
                    diff = extend(br.bits(s), s) if s else 0
                    prev_dc += diff
                    zz[0] = prev_dc
                    k = 1
                    while k < 64:
                        sym = huff(br, ac_tabs[ta])
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        size = sym & 0x0F
                        if k > 63:
                            raise ValueError(
                                "JPEG AC run past end of block"
                            )
                        zz[k] = extend(br.bits(size), size)
                        k += 1
                    coef = np.empty(64)
                    coef[ZZ] = zz
                    blk = T.T @ (coef.reshape(8, 8) * q2d) @ T
                    out[brow : brow + 8, bcol : bcol + 8] = blk + 128.0
            px = np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
            return int(w), int(h), px.tobytes()

        for pdf in batches:
            res = {
                "doc_id": [],
                "width": [],
                "height": [],
                "decoded_n_bytes": [],
                "pixel_sha256": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode(bytes(payload))
                res["doc_id"].append(doc_id)
                res["width"].append(w)
                res["height"].append(h)
                res["decoded_n_bytes"].append(len(px))
                res["pixel_sha256"].append(hashlib.sha256(px).hexdigest())
            yield pd.DataFrame(res)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=JPEG_DECODED_SCHEMA
    )


WAV_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frames", LongType()),
        StructField("channels", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("pcm_sha256", StringType()),
        StructField("rms", DoubleType()),
    ]
)


def decode_wav_samples(df: DataFrame) -> DataFrame:
    """FULL WAV PCM decode, Arrow-batched, stdlib+numpy only: RIFF chunk
    walk (fmt /data, word-aligned, unknown chunks skipped), 16-bit PCM
    sample extraction, per-doc audio features — the feature-extract step
    of a training-data audio pipeline. Emits frames/channels/rate from
    the header, the DECODED sample count (== frames*channels iff the
    data chunk held exactly the spec'd PCM), the sha256 of the
    little-endian sample buffer, and the RMS amplitude (float64 over all
    samples — SQL-expressible, so the DuckDB oracle can pin it to 6
    decimals from the fixture's arithmetic sample formula). Non-PCM
    encodings and bit depths other than 16 raise NotImplementedError;
    truncated/corrupt payloads raise ValueError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        import numpy as np

        def decode(p: bytes) -> tuple[int, int, int, int, bytes, float]:
            if p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                raise ValueError("not a WAV payload")
            i, n = 12, len(p)
            fmt = None
            data = None
            while i + 8 <= n:
                cid = p[i : i + 4]
                (size,) = struct.unpack_from("<I", p, i + 4)
                body = p[i + 8 : i + 8 + size]
                if len(body) != size:
                    raise ValueError(f"WAV chunk {cid!r} truncated")
                if cid == b"fmt ":
                    if size < 16:
                        raise ValueError("WAV fmt chunk truncated")
                    fmt = struct.unpack_from("<HHIIHH", body, 0)
                elif cid == b"data":
                    data = body
                i += 8 + size + (size & 1)  # chunks are word-aligned
            if fmt is None:
                raise ValueError("WAV missing fmt chunk")
            if data is None:
                raise ValueError("WAV missing data chunk")
            audio_fmt, channels, rate, _brate, block, bps = fmt
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV encoding {audio_fmt} beyond PCM"
                )
            if bps != 16:
                raise NotImplementedError(f"{bps}-bit WAV beyond 16-bit PCM")
            if channels < 1:
                raise ValueError("WAV declares zero channels")
            if block != channels * 2:
                raise ValueError(
                    f"WAV block align {block} != channels*2 ({channels * 2})"
                )
            if len(data) % 2:
                raise ValueError("WAV data chunk is odd-sized for 16-bit")
            samples = np.frombuffer(data, dtype="<i2")
            frames = len(samples) // channels
            rms = float(
                np.sqrt(np.mean(samples.astype(np.float64) ** 2))
            ) if len(samples) else 0.0
            return (
                frames,
                channels,
                rate,
                len(samples),
                hashlib.sha256(data).hexdigest(),
                rms,
            )

        for pdf in batches:
            out = {
                "doc_id": [],
                "frames": [],
                "channels": [],
                "sample_rate": [],
                "n_samples": [],
                "pcm_sha256": [],
                "rms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                fr, ch, rate, ns, sha, rms = decode(bytes(payload))
                out["doc_id"].append(doc_id)
                out["frames"].append(fr)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["n_samples"].append(ns)
                out["pcm_sha256"].append(sha)
                out["rms"].append(rms)
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=WAV_DECODED_SCHEMA
    )
