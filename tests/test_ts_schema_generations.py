"""The driver's testdata has shipped ``events.ts`` as two different Parquet
types across generations: TIMESTAMP(NANOS) (read as int64 ns under
``spark.sql.legacy.parquet.nanosAsLong``) and a plain µs timestamp.
``timeutil.ts_ns_auto`` must normalize both to the same canonical int64-ns
``ts_ns`` — this caught us once (CORRECTNESS_r04: 18 queries failed on the
generation change), so the equivalence is pinned here against synthetic
parquet written in each generation's shape.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from metricq_db_hta_spark.functions.timeutil import ts_ns_auto

#: µs-grain epoch instants covering pre-epoch, epoch, and far-future
MICROS = [-1_000_001, 0, 1, 123_456, 1_700_000_000_000_000, 4_102_444_800_000_000]


@pytest.fixture(scope="module")
def gen_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("ts_generations")
    ns = pa.table(
        {"ts": pa.array([m * 1000 for m in MICROS], type=pa.int64())}
    ).cast(pa.schema([("ts", pa.timestamp("ns"))]))
    pq.write_table(ns, os.path.join(d, "nanos.parquet"), store_schema=False)
    us = pa.table({"ts": pa.array(MICROS, type=pa.timestamp("us"))})
    pq.write_table(us, os.path.join(d, "micros.parquet"))
    return d


def _ts_ns_values(spark, path):
    df = spark.read.parquet(path)
    return [r.ts_ns for r in df.select(ts_ns_auto(df, "ts").alias("ts_ns")).collect()]


def test_both_generations_normalize_identically(spark, gen_dirs):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos = _ts_ns_values(spark, os.path.join(gen_dirs, "nanos.parquet"))
    micros = _ts_ns_values(spark, os.path.join(gen_dirs, "micros.parquet"))
    expected = sorted(m * 1000 for m in MICROS)
    assert sorted(nanos) == expected
    assert sorted(micros) == expected


def test_nanos_long_truncates_sub_micro(spark, gen_dirs):
    # a raw ns value off the µs grid truncates down to what DuckDB sees
    t = pa.table({"ts": pa.array([1_000_000_123_456_789], type=pa.int64())})
    p = os.path.join(gen_dirs, "raw_ns.parquet")
    pq.write_table(t, p)
    df = spark.read.parquet(p)
    [r] = df.select(ts_ns_auto(df, "ts").alias("ts_ns")).collect()
    assert r.ts_ns == 1_000_000_123_456_000
