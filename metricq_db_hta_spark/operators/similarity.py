"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact top-k cosine for a (small) query set: broadcast
  the queries, JVM-side dot products (functions/arrays.py higher-order
  expressions — no Python UDF), rank per query. This is the correctness
  baseline; cost is |queries| x |corpus| and parallelizes per corpus
  partition.
* ivf_topk — the scale path: restrict each query's scan to its partition
  cell (here the precomputed ``label`` column stands in for a coarse
  quantizer / IVF assignment; at 100 TB the cell id comes from a trained
  centroid table broadcast-joined the same way). Equi-join on the cell key
  turns the cross product into a hash join — corpus scanned once, pairs
  bounded by cell sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.arrays import cosine_sim


def _ranked(
    pairs: DataFrame, k: int, query_id: str = "query_id", cand_id: str = "vec_id"
) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(cand_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", cand_id, "sim")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded when ids match)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    pairs = (
        corpus.crossJoin(q)
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", cosine_sim(vec_col, "q_vec"))
    )
    return _ranked(pairs, k, cand_id=id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """Approximate top-k: search only the query's own cell (IVF, nprobe=1)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.col(cell_col).alias("q_cell"),
        )
    )
    pairs = (
        corpus.join(q, corpus[cell_col] == q.q_cell)
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("sim", cosine_sim(vec_col, "q_vec"))
    )
    return _ranked(pairs, k, cand_id=id_col)


def cosine_pairs_within_cells(
    corpus: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by cell key (the
    all-pairs version of ivf_topk; pair count bounded by cell sizes)."""
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), F.col(cell_col).alias("cell")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), F.col(cell_col).alias("cell")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_sim("v_a", "v_b"))
        .filter(F.col("sim") >= threshold)
        .select("cell", "id_a", "id_b", "sim")
    )
