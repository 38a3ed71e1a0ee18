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
