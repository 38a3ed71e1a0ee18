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
from metricq_db_hta_spark.queries import llm  # noqa: F401
from metricq_db_hta_spark.queries import udf_queries  # noqa: F401
from metricq_db_hta_spark.queries import relational2  # noqa: F401
from metricq_db_hta_spark.queries import hta_queries  # noqa: F401
from metricq_db_hta_spark.queries import relational  # noqa: F401

# Registry order is part of the driver contract: the correctness harness
# records the first 50 entries. Round 1 verified 49 queries green but left 29
# entries past position 50 with no driver oracle row. Reordering imports is
# not enough (modules import each other, so registration order follows the
# dependency graph, not this file), so we pin the never-checked entries to the
# front explicitly; previously-green queries take the later positions.
_FRONT = [
    # relational2 tail that imports pushed past the window
    "rel_null_handling",
    "rel_array_funcs",
    "rel_join_cross",
    # every llm_* / udf_* entry, plus the hta/rel entries registered late
    "hta_scope_boundaries",
    "hta_metadata_projection",
    "rel_agg_scalar_global",
]
_front = [n for n in _FRONT if n in REGISTRY]
_front += [n for n in REGISTRY if n.startswith(("llm_", "udf_")) and n not in _front]
_rest = [n for n in REGISTRY if n not in _front]
_ordered = {n: REGISTRY[n] for n in (*_front, *_rest)}
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec"]
