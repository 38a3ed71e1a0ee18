"""Per-metric level configuration (reference parity: each metric carries
its own ``{interval_min, interval_factor, interval_max}`` triple, written
by the importer and stored per-db-token in CouchDB —
/root/reference/src/tools/metricq_importer/importer.py:83-91; SURVEY §1.3).

``MetricLevelConfig`` mirrors the importer's defaults:
``interval_min = sampling_interval * 40 * 1e9`` ns (~40 samples per finest
bucket) and ``interval_max`` = the largest level strictly below 30 days
(importer.py:70-81). ``ConfiguredHistoryService`` routes each query to the
queried metric's own level set; cross-metric queries group metrics by
config so each group scans its proper level table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from metricq_db_hta_spark.operators import hta
from metricq_db_hta_spark.plans.history import HistoryService, choose_level

THIRTY_DAYS_NS = 2_592_000_000_000_000  # importer.py:75-81 cap


@dataclass(frozen=True)
class MetricLevelConfig:
    name: str
    interval_min_ns: int
    interval_factor: int = 10

    def __post_init__(self) -> None:
        # widths() grows geometrically toward the 30-day cap; a factor < 2
        # or non-positive interval would loop forever
        if self.interval_min_ns <= 0:
            raise ValueError(f"interval_min_ns must be positive: {self}")
        if self.interval_factor < 2:
            raise ValueError(f"interval_factor must be >= 2: {self}")

    @classmethod
    def from_sampling_interval(
        cls, name: str, sampling_interval_s: float, factor: int = 10
    ) -> "MetricLevelConfig":
        """The importer's default: ~40 samples per finest bucket
        (importer.py:70-72)."""
        return cls(name, int(sampling_interval_s * 40 * 1e9), factor)

    def widths(self) -> list[int]:
        """Level widths interval_min * factor^k, capped below 30 days."""
        out, w = [], self.interval_min_ns
        while w < THIRTY_DAYS_NS:
            out.append(w)
            w *= self.interval_factor
        return out or [self.interval_min_ns]


class ConfiguredHistoryService:
    """Per-metric HTA: builds each config group's level cascade over its
    own metrics and routes queries by the queried metric's widths.

    Metrics sharing a config share level tables (the common case — the
    reference's importer assigns one config per sampling rate), so the
    number of physical tables tracks distinct configs, not metrics.
    """

    def __init__(self, raw: DataFrame, configs: list[MetricLevelConfig]) -> None:
        self.raw = raw
        self.configs = {c.name: c for c in configs}
        self._groups: dict[tuple[int, ...], HistoryService] = {}
        by_widths: dict[tuple[int, ...], list[str]] = {}
        for c in configs:
            by_widths.setdefault(tuple(c.widths()), []).append(c.name)
        for widths, names in by_widths.items():
            sub = raw.filter(raw["metric"].isin(names))
            cfg = self.configs[names[0]]
            built = hta.build_levels(
                sub, cfg.interval_min_ns, cfg.interval_factor, n_levels=len(widths)
            )
            self._groups[widths] = HistoryService(
                raw=sub, levels=dict(zip(widths, built))
            )

    def _service_for(self, metric: str) -> HistoryService:
        cfg = self.configs.get(metric)
        if cfg is None:
            raise KeyError(
                f"metric {metric!r} not configured (add-only reconfigure: "
                "append a MetricLevelConfig — reference A17)"
            )
        return self._groups[tuple(cfg.widths())]

    # the four query types, routed per metric ------------------------------
    def aggregate_timeline(self, metric, start_ns, end_ns, interval_max_ns):
        return self._service_for(metric).aggregate_timeline(
            metric, start_ns, end_ns, interval_max_ns
        )

    def flex_timeline(self, metric, start_ns, end_ns, interval_max_ns):
        return self._service_for(metric).flex_timeline(
            metric, start_ns, end_ns, interval_max_ns
        )

    def aggregate(self, metric, start_ns, end_ns):
        return self._service_for(metric).aggregate(metric, start_ns, end_ns)

    def last_value(self, metric=None):
        if metric is not None:
            return self._service_for(metric).last_value(metric)
        # fleet-wide: configured metrics only — the per-metric calls reject
        # unconfigured metrics, so the aggregate view must match
        configured = self.raw.filter(self.raw["metric"].isin(list(self.configs)))
        return HistoryService(raw=configured, levels={1: configured}).last_value()

    def chosen_width(self, metric: str, interval_max_ns: int) -> int | None:
        self._service_for(metric)  # uniform 'not configured' rejection
        return choose_level(list(self.configs[metric].widths()), interval_max_ns)
