from metricq_db_hta_spark.functions.timeutil import ts_ns, bucket_start_ns
from metricq_db_hta_spark.functions.arrays import dot, norm2, cosine_sim

__all__ = ["ts_ns", "bucket_start_ns", "dot", "norm2", "cosine_sim"]
