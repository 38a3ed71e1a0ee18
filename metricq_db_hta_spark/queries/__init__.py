"""Central query registry — single source of truth for the driver contract
(``__spark_entry__.py``), the pytest differential suite, and ``bench.py``.

Every implemented operator from SURVEY.md §2 has one entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the equivalent
DuckDB oracle SQL over the pre-registered table views. Column names/types are
aligned between the two by construction (FIXTURES.md §4 contract).
"""

from __future__ import annotations

from metricq_db_hta_spark.queries.base import REGISTRY, QuerySpec

# Importing the domain modules populates REGISTRY via register().
from metricq_db_hta_spark.queries import hta_queries  # noqa: F401
from metricq_db_hta_spark.queries import relational  # noqa: F401
from metricq_db_hta_spark.queries import relational2  # noqa: F401
from metricq_db_hta_spark.queries import llm  # noqa: F401
from metricq_db_hta_spark.queries import udf_queries  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec"]
