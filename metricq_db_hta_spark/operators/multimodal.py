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
