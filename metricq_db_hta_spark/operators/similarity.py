"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact top-k cosine for a (small) query set: broadcast
  the queries, rank per query. This is the correctness baseline; cost is
  |queries| x |corpus| and parallelizes per corpus partition.
* ivf_topk — the scale path: restrict each query's scan to its partition
  cell (here the precomputed ``label`` column stands in for a coarse
  quantizer / IVF assignment; at 100 TB the cell id comes from a trained
  centroid table broadcast-joined the same way). Equi-join on the cell key
  turns the cross product into a hash join — corpus scanned once, pairs
  bounded by cell sizes.

Execution strategy — "reshape to rows": per candidate pair, the vectors
are zipped and pos-exploded, and ONE whole-stage-codegen hash aggregation
computes sum(a*b), sum(a*a), sum(b*b) per pair. Why not the alternatives:
higher-order folds (F.aggregate) are CodegenFallback — interpreted,
~µs/element; a flat fixed-dim expression tree blows codegen's method
limits. The partial aggregate consumes each pair's rows contiguously in
array order, so the sums are the same left-associative folds DuckDB's
list_dot_product computes — bit-identical oracle results. (Caveat: under
partial-agg spill a pair's sum could split into two partials and
re-associate; irrelevant at verification scale, and at cluster scale the
1e-16 reassociation noise is far below the 1e-6 comparison contract.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairwise_cosine(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    key_cols: list[str],
) -> DataFrame:
    """(key_cols..., sim) — cosine per pair via zip/explode + one hash agg."""
    z = pairs.select(
        *key_cols,
        F.posexplode(
            F.arrays_zip(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        ).alias("i", "z"),
    )
    a = F.col("z.a").cast("double")
    b = F.col("z.b").cast("double")
    agg = z.groupBy(*key_cols).agg(
        F.sum(a * b).alias("__dot"),
        F.sum(a * a).alias("__na2"),
        F.sum(b * b).alias("__nb2"),
    )
    sim = F.when(
        (F.col("__na2") > 0) & (F.col("__nb2") > 0),
        F.col("__dot") / (F.sqrt("__na2") * F.sqrt("__nb2")),
    ).otherwise(F.lit(0.0))
    return agg.withColumn("sim", sim).drop("__dot", "__na2", "__nb2")


def _ranked(
    scored: DataFrame, k: int, query_id: str = "query_id", cand_id: str = "vec_id"
) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
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
    pairs = corpus.select(id_col, vec_col).crossJoin(q).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairwise_cosine(pairs, vec_col, "q_vec", [id_col, "query_id"])
    return _ranked(scored, k, cand_id=id_col)


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
            F.col(cell_col).alias("q_cell"),
            F.col(vec_col).alias("q_vec"),
        )
    )
    c = corpus.select(id_col, cell_col, vec_col)
    pairs = c.join(q, c[cell_col] == q.q_cell).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairwise_cosine(pairs, vec_col, "q_vec", [id_col, "query_id"])
    return _ranked(scored, k, cand_id=id_col)


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
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        F.col(cell_col).alias("cell"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        F.col(cell_col).alias("cell"),
    )
    pairs = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    scored = pairwise_cosine(pairs, "v_a", "v_b", ["cell", "id_a", "id_b"])
    return scored.filter(F.col("sim") >= threshold).select(
        "cell", "id_a", "id_b", "sim"
    )
