"""Differential suite: every registered declared query runs on Spark and on
the DuckDB oracle over the same Parquet; canonicalized results must match
(SURVEY.md §5.1 — the primary correctness gate, mirroring the driver's t2)."""

from __future__ import annotations

import pytest

from metricq_db_hta_spark import oracle
from metricq_db_hta_spark.queries import REGISTRY

ORACLE_CHECKED = [n for n, s in REGISTRY.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in REGISTRY.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    mismatch = oracle.compare(df, duck, spec.oracle)
    assert mismatch is None, f"{name}: {mismatch.kind}: {mismatch.detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
