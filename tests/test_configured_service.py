"""Per-metric level configuration (reference importer semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metricq_db_hta_spark.operators import hta
from metricq_db_hta_spark.plans.config import (
    THIRTY_DAYS_NS,
    ConfiguredHistoryService,
    MetricLevelConfig,
)
from metricq_db_hta_spark.queries.hta_queries import END_NS, START_NS, W0, samples


def test_importer_default_widths():
    """1 s sampling, factor 10 -> 40 s, 400 s, ..., capped below 30 d
    (BASELINE.md 'finest rollup width' row: 5 levels at 1 Hz)."""
    c = MetricLevelConfig.from_sampling_interval("m", 1.0)
    w = c.widths()
    assert w[0] == 40 * 10**9
    assert len(w) == 5
    assert all(b == a * 10 for a, b in zip(w, w[1:]))
    assert w[-1] < THIRTY_DAYS_NS


def test_per_metric_routing(spark, sf_dir):
    raw = samples(spark, sf_dir)
    configs = [
        MetricLevelConfig("click", W0, 10),        # 1h, 10h, 100h
        MetricLevelConfig("purchase", W0 * 2, 5),  # 2h, 10h, 50h, 250h
    ]
    svc = ConfiguredHistoryService(raw, configs)
    # same interval_max routes to different widths per metric config
    assert svc.chosen_width("click", 11 * W0) == 10 * W0
    assert svc.chosen_width("purchase", 11 * W0) == 10 * W0
    assert svc.chosen_width("click", 3 * W0) == W0
    assert svc.chosen_width("purchase", 3 * W0) == 2 * W0

    # timeline values match a direct level build at the routed width
    tl = svc.aggregate_timeline("purchase", START_NS, END_NS, 3 * W0)
    direct = (
        hta.level0(raw.filter(F.col("metric") == "purchase"), 2 * W0)
        .filter(
            (F.col("bucket_start_ns") >= START_NS)
            & (F.col("bucket_start_ns") < END_NS)
        )
        .select(*tl.columns)
    )
    assert tl.exceptAll(direct).union(direct.exceptAll(tl)).count() == 0


def test_unconfigured_metric_rejected(spark, sf_dir):
    svc = ConfiguredHistoryService(
        samples(spark, sf_dir), [MetricLevelConfig("click", W0)]
    )
    with pytest.raises(KeyError, match="not configured"):
        svc.aggregate_timeline("error", START_NS, END_NS, W0)


def test_bad_configs_rejected():
    with pytest.raises(ValueError, match="interval_factor"):
        MetricLevelConfig("m", 10**9, interval_factor=1)
    with pytest.raises(ValueError, match="interval_min_ns"):
        MetricLevelConfig.from_sampling_interval("m", 0.0)
