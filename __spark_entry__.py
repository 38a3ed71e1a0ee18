"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's central query registry
(``metricq_db_hta_spark/queries``): every implemented operator from
SURVEY.md §2 is one registry entry carrying both the Spark callable and the
DuckDB oracle SQL, so ``queries()`` and ``oracle_sql()`` can never drift
apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from metricq_db_hta_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's core operator — the HTA level-0
    rollup (six-field Aggregate record per metric/bucket) on sf0.001."""
    return REGISTRY["hta_level0"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
