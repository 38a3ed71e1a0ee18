"""metricq_db_hta_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference ``metricq/metricq-db-hta``
(a MetricQ historical-data provider built on Hierarchical Timeline
Aggregation; see /root/reference/README.md).

Design (SURVEY.md §1.6, §7): the reference's semantics — the six-field
Aggregate record, the hierarchy of interval levels, the four history query
types, and the ingest contract (rename mapping, monotonicity filter,
NaN/Inf filter) — are re-expressed Spark-first: DataFrame/SQL plans over
partitioned Parquet for batch, Structured Streaming for ingest. Nothing of
the reference's C++/asio execution machinery is reproduced; Catalyst +
Tungsten are the execution engine.
"""

from metricq_db_hta_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
