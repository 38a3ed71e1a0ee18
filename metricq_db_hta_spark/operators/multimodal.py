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

Formats needing real codec libraries (JPEG/MP3/H.264) remain the
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
            if strict:
                raise NotImplementedError(
                    "compressed/unknown media format (JPEG/MP3/H.264 need "
                    "real codec libraries, not in this container; PNG is "
                    "handled above)"
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


def encode_fixture_gif(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL GIF89a payloads (256-color global palette, non-interlaced),
    deterministic in ``doc_id``: w = id%23+4, h = id%13+4, palette index
    stream ``(id + 7*j) % 256``, palette entry k = (k, 31k%256, 77k%256).
    The index stream is REAL LZW-compressed (variable code width 9->12
    bits, clear/reset at table-full — the GIF flavor), and a Graphic
    Control Extension precedes the image so decoders must walk extension
    sub-blocks. Dimensions and the decoded index count w*h are pure
    arithmetic in doc_id (DuckDB-oracle-checkable); the compressed size
    depends on the LZW table evolution and is deliberately NOT part of
    any oracle."""

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
            emit(end)
            if acc[1]:
                out.append(acc[0] & 0xFF)
            return bytes(out)

        def gif(i: int) -> bytes:
            w, h = i % 23 + 4, i % 13 + 4
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
    the decoded index count (== w*h iff the LZW stream produced exactly
    the spec'd pixel count) and the sha256 of the RGB buffer, which
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

        def decode(p: bytes) -> tuple[int, int, int, bytes]:
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
                    return int(iw), int(ih), len(idx), bytes(rgb)
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
                w, h, n_idx, rgb = decode(bytes(payload))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["decoded_n_bytes"].append(n_idx)
                out["rgb_sha256"].append(hashlib.sha256(rgb).hexdigest())
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=GIF_DECODED_SCHEMA
    )
