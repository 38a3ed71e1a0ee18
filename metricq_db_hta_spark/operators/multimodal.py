"""Multimodal column plumbing (LLM-pipeline surface, SURVEY §2 Part B).

Images/audio/video are opaque ``binary`` payload columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch shape, partition
behavior of ``mapInPandas`` — is real and tested; the actual media decode
is STUBBED (this container ships no image/audio libraries): by default a
deterministic fake "decode" derives dimensions from the payload bytes, and
``decode_media(..., strict=True)`` raises NotImplementedError where a real
decoder (PIL/ffmpeg) would plug in.

At scale this is the canonical pattern: keep payloads in columnar storage,
decode lazily inside Arrow-batched Python workers (mapInPandas), never
collect to the driver; partition by content-defined key so one oversized
asset cannot skew a task.
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
    """Deterministic stand-in for image decode: dimensions derived from the
    byte length. Replace with PIL/ffmpeg in production. (Duplicated inside
    decode_media's worker closure — see the pickling NOTE there.)"""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def decode_media(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched decode over ``(doc_id, payload, media_type)``.

    ``strict=True`` raises NotImplementedError (no media libs here) —
    marking exactly where the real decoder goes.
    """

    # NOTE: the closure must be fully self-contained (no references to
    # module-level names): this package is not installed on Spark's Python
    # workers, so cloudpickle must serialize everything by value — a module
    # global (e.g. _fake_decode) would be pickled by reference and fail to
    # import worker-side when the driver runs from another cwd.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes) -> tuple[int, int]:
            n = len(payload)
            return (n % 640 + 1, n % 480 + 1)

        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in container"
                )
            payloads = pdf["payload"]
            dims = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "checksum": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in payloads
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
