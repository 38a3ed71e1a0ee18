"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact top-k cosine for a bounded query set: the
  queries ship to every corpus partition, scoring is Arrow-vectorized
  (mapInArrow) with per-batch partial top-k, and only |partitions| x
  |q| x k candidates reach the final ranking shuffle. This is the
  correctness baseline AND the scan shape you want at 100 TB — cost is
  |queries| x |corpus| FLOPs but |pairs| never materializes as rows.
* ivf_topk — the scale path: restrict each query's scan to its partition
  cell (here the precomputed ``label`` column stands in for a coarse
  quantizer / IVF assignment; at 100 TB the cell id comes from a trained
  centroid table broadcast-joined the same way). Equi-join on the cell key
  turns the cross product into a hash join — corpus scanned once, pairs
  bounded by cell sizes.

Execution strategy for the JOIN-based paths (pairwise_cosine, used by
ivf_topk and embedding_neardup), two tiers (measured in BENCH_r01/r02):

* **known fixed dim** (the normal case — an embedding column has one
  dimensionality): flat whole-stage-codegen expressions. Each side's L2
  norm is computed ONCE per vector *before* the join (|corpus| + |q|
  norms, not |pairs|), and the per-pair work is a single ``dot_flat``
  — a plain left-associative expression tree Tungsten compiles. Same
  evaluation order as DuckDB's ``list_dot_product``, so oracle results
  are bit-comparable. Measured story (round-3 audit of the round-2
  1.44 s bench anomaly): the explode path was 44.6x DuckDB; the flat
  path's *eval* is fast only once HotSpot JITs the generated method —
  dim=64 exceeds the 8000-bytecode JIT refusal limit, so
  ``-XX:-DontCompileHugeMethods`` is set in ``session.get_spark``
  (4x on a 160k-pair scoring microbench: 2.85 s -> 0.71 s). What
  remains at sf0.1 (16k pairs) is NOT eval but per-run fixed cost:
  ~0.35 s driver-side plan build of the three 64-term expressions,
  plus AQE re-planning (~0.2 s) and multi-stage scheduling. The
  resident bench mode (plan built once, re-executed) measures ~0.9 s;
  a one-term variant of the same plan shape measures ~0.7 s — the
  expression is within ~0.2 s of the shape's floor, the rest is the
  query's 3-job structure (broadcast build, scoring, window).
* **unknown/huge dim fallback**: per candidate pair the vectors are
  zipped and pos-exploded, and one codegen hash aggregation computes
  sum(a*b), sum(a*a), sum(b*b) per pair — still no interpreted
  higher-order fold (F.aggregate is CodegenFallback, ~µs/element), but
  it pushes |pairs| x dim rows through an exchange, which is exactly
  what made the old bench number 44.6x. (Partial-agg spill could split
  a pair's sum and re-associate; irrelevant at verification scale and
  far below the 1e-6 comparison contract at cluster scale.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions.arrays import dot_flat, norm2_flat
from metricq_db_hta_spark.queries.base import davg


def _guarded_sim(dotv: Column, na: Column, nb: Column) -> Column:
    return F.when((na > 0) & (nb > 0), dotv / (na * nb)).otherwise(F.lit(0.0))


def pairwise_cosine(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    key_cols: list[str],
    dim: int | None = None,
) -> DataFrame:
    """(key_cols..., sim) — cosine per pair.

    With ``dim`` given, one flat codegen projection per pair (no shuffle);
    otherwise zip/explode + one hash agg (dim-agnostic fallback).
    """
    if dim is not None:
        na2 = dot_flat(a_col, a_col, dim)
        nb2 = dot_flat(b_col, b_col, dim)
        return pairs.select(
            *key_cols,
            _guarded_sim(
                dot_flat(a_col, b_col, dim), F.sqrt(na2), F.sqrt(nb2)
            ).alias("sim"),
        )
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
    sim = _guarded_sim(F.col("__dot"), F.sqrt("__na2"), F.sqrt("__nb2"))
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


#: bounded-collect guard for the query side of brute_force_topk: a "query
#: set" is metadata-sized by contract (like plans/serve.py's capped
#: collect); corpus-sized probes belong in a cell-blocked join
#: (ivf_topk / embedding_neardup).
MAX_COLLECTED_QUERIES = 4096

#: minimum bytes of source data a Python (Arrow) scoring task should
#: carry — see _python_stage_coalesce
_PY_STAGE_CHUNK_BYTES = 1 << 20


def _python_stage_coalesce(df: DataFrame, chunk_bytes: int = _PY_STAGE_CHUNK_BYTES) -> DataFrame:
    """Right-size task count for a Python (mapInPandas) stage.

    The session's ``spark.sql.files.openCostInBytes`` floor deliberately
    shatters small files into many splits — correct for JVM codegen
    stages (free parallelism) but wrong for Arrow/Python stages, where
    each task pays a fixed bridge cost (worker attach, closure unpickle,
    Arrow setup — measured ~15 ms/task). Coalesce so each task carries at
    least ~1 MiB of source bytes (sf1 sweep: 32 tasks = 0.52 s,
    4-8 tasks = 0.28-0.32 s, 1-2 tasks = 0.6 s — compute-starved).
    Scale-safe by construction: ``coalesce`` never increases partition
    count, so once natural splits reach maxPartitionBytes (any real
    deployment) this is a no-op; it only counters the fine-split floor
    on small inputs. Non-file sources / remote URIs: left untouched.
    """
    import math
    import os as _os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — sizing is best-effort
        return df
    if not files:
        return df
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            return df
        try:
            total += _os.path.getsize(u.path)
        except OSError:
            return df
    return df.coalesce(max(1, math.ceil(total / chunk_bytes)))


def _leftfold_dots(A, B):
    """acc = ((a0*b0) + a1*b1) + ... in index order, vectorized across the
    batch rows — the float64 op sequence per pair is bit-identical to the
    flat codegen expression and DuckDB's list_dot_product left fold."""
    acc = A[:, 0] * B[0]
    for i in range(1, A.shape[1]):
        acc = acc + A[:, i] * B[i]
    return acc


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded when ids match).

    Scale architecture (the 100 TB shape): the bounded query set (see
    MAX_COLLECTED_QUERIES) is shipped to every corpus partition, scoring
    runs Arrow-vectorized inside ``mapInArrow`` with a per-batch partial
    top-k, so at most |partitions| x |q| x k candidate rows — not |pairs|
    — reach the single tiny final ranking shuffle. Per-pair float ops are
    the same left-fold sequence as DuckDB's ``list_dot_product``, so
    results stay bit-comparable to the oracle (verified: identical rows
    to the former flat-codegen broadcast-join path, which this replaced
    after measuring 1.105 s vs 0.409 s at sf0.1 — the 64-term codegen
    expression never got hot enough for HotSpot to JIT at 16k pairs).
    mapInArrow rather than mapInPandas (r12): the corpus matrix is built
    by ONE fancy-indexed gather from the Arrow list column's flat values
    buffer instead of pandas materializing 160k per-row ndarray objects
    and a Python loop re-stacking them — the float32 -> float64 widening
    is exact, so the scored doubles are bit-identical to the pandas path.

    ``dim`` is used only as a fallback width when every query vector is
    NULL; otherwise the vectorized path infers width from the data.

    Contract guards (not silent narrowing): ids must be an integral
    column on both sides (the Arrow batches are scored as int64 —
    anything else raises up front with a clear error), and NULL or
    mis-sized vectors score ``sim = 0.0`` exactly like
    ``_guarded_sim``'s zero-norm branch on the join path.
    """
    import numpy as np

    integral = {"tinyint", "smallint", "int", "bigint"}
    for side, frame in (("corpus", corpus), ("queries", queries)):
        dt = dict(frame.dtypes).get(id_col)
        if dt not in integral:
            raise TypeError(
                f"brute_force_topk requires an integral id column; "
                f"{side}.{id_col} is {dt!r}"
            )

    # Arrow self-collection rather than .collect() (r16): collect() on a
    # limited plan runs take()'s incremental partition scaling — a small
    # query set spread over k scan partitions costs up to ~log4(k)+1
    # escalating JOBS (measured: 4 jobs / 0.28 s vs 1 job / 0.20 s at
    # sf1); toArrow executes the limited plan as ONE job. Values are
    # identical: array<double> -> Arrow list<float64> -> Python floats is
    # the same exact-double round trip the Row path performed.
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    ).limit(MAX_COLLECTED_QUERIES + 1).toArrow().to_pylist()
    if len(qrows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"brute_force_topk query set exceeds {MAX_COLLECTED_QUERIES} "
            "rows; use ivf_topk / a cell-blocked join for corpus-sized "
            "probe sets"
        )
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], f"query_id long, rank int, {id_col} long, sim double"
        )
    qdim = next(
        (len(r["q_vec"]) for r in qrows if r["q_vec"] is not None), dim or 0
    )
    qids = np.array([r["query_id"] for r in qrows], dtype=np.int64)
    # NULL / mis-sized query vectors become zero vectors: qn == 0 makes
    # every one of their sims 0.0 through the guard below.
    Q = np.array(
        [
            list(r["q_vec"])
            if r["q_vec"] is not None and len(r["q_vec"]) == qdim
            else [0.0] * qdim
            for r in qrows
        ],
        dtype=np.float64,
    )
    qn = np.sqrt(
        np.array([_leftfold_dots(Q[j : j + 1], Q[j])[0] for j in range(len(Q))])
    ) if qdim else np.zeros(len(qrows))

    def score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            if rb.column(0).null_count:
                # the pandas path raised on NULL ids (int64 coercion);
                # Arrow's to_numpy would silently produce garbage instead
                raise ValueError(
                    f"brute_force_topk: NULL {id_col} in corpus batch"
                )
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            la = rb.column(1)
            # list<float32|float64> taken apart buffer-wise: per-row
            # lengths (NULL rows -> 0), one flat values array excluding
            # NULL entries' slots (list_flatten respects validity), and
            # row starts as the running sum — slice-offset-safe without
            # touching raw offset buffers.
            lens = pc.fill_null(
                pc.list_value_length(la).cast(pa.int64()), 0
            ).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(la).to_numpy(zero_copy_only=False)
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            if la.null_count:
                notnull = pc.is_valid(la).to_numpy(zero_copy_only=False)
            else:
                notnull = np.ones(n, dtype=bool)
            # qdim == 0 (every query vector NULL and no dim fallback):
            # zero-length corpus vectors would otherwise pass the length
            # check, making A an (m, 0) matrix whose A[:, 0] accumulation
            # raises — mark everything invalid so vidx stays empty and
            # the documented sim = 0.0 path applies uniformly.
            valid = (
                notnull & (lens == qdim)
                if qdim
                else np.zeros(n, dtype=bool)
            )
            vidx = np.nonzero(valid)[0]
            nc = np.zeros(n)
            A = None
            if len(vidx):
                # ONE gather builds the (m, qdim) matrix; float32 ->
                # float64 widening is exact, so scores are bit-identical
                # to a per-row float64 conversion
                A = flat[
                    starts[vidx][:, None] + np.arange(qdim)
                ].astype(np.float64, copy=False)
                acc = A[:, 0] * A[:, 0]
                for i in range(1, A.shape[1]):
                    acc = acc + A[:, i] * A[:, i]
                nc[vidx] = np.sqrt(acc)
            out_q, out_id, out_sim = [], [], []
            for j in range(len(Q)):
                d = np.zeros(n)
                if A is not None:
                    d[vidx] = _leftfold_dots(A, Q[j])
                with np.errstate(invalid="ignore", divide="ignore"):
                    sim = np.where(
                        (nc > 0) & (qn[j] > 0), d / (nc * qn[j]), 0.0
                    )
                sidx = np.nonzero(ids != qids[j])[0]
                if not len(sidx):
                    continue
                # partial top-k by (-sim, id): a superset filter — the
                # exact global ranking happens in _ranked below
                order = np.lexsort((ids[sidx], -sim[sidx]))[: min(k, len(sidx))]
                sel = sidx[order]
                out_q.extend([qids[j]] * len(sel))
                out_id.extend(ids[sel])
                out_sim.extend(sim[sel])
            yield pa.record_batch(
                [
                    pa.array(np.array(out_q, dtype=np.int64), type=pa.int64()),
                    pa.array(np.array(out_id, dtype=np.int64), type=pa.int64()),
                    pa.array(
                        np.array(out_sim, dtype=np.float64), type=pa.float64()
                    ),
                ],
                names=["query_id", id_col, "sim"],
            )

    cand = _python_stage_coalesce(corpus.select(id_col, vec_col)).mapInArrow(
        score, f"query_id long, {id_col} long, sim double"
    )
    return _ranked(cand, k, cand_id=id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only the query's own cell (IVF, nprobe=1)."""
    qcols = [
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("q_cell"),
        F.col(vec_col).alias("q_vec"),
    ]
    if dim is not None:
        c = corpus.select(
            id_col,
            cell_col,
            F.col(vec_col).cast("array<double>").alias(vec_col),
            norm2_flat(vec_col, dim).alias("__nc"),
        )
        qcols_cast = qcols[:2] + [F.col(vec_col).cast("array<double>").alias("q_vec")]
        q = F.broadcast(
            queries.select(*qcols_cast, norm2_flat(vec_col, dim).alias("__nq"))
        )
        pairs = c.join(q, c[cell_col] == q.q_cell).filter(
            F.col(id_col) != F.col("query_id")
        )
        scored = pairs.select(
            id_col,
            "query_id",
            _guarded_sim(
                dot_flat(vec_col, "q_vec", dim), F.col("__nc"), F.col("__nq")
            ).alias("sim"),
        )
        return _ranked(scored, k, cand_id=id_col)
    q = F.broadcast(queries.select(*qcols))
    c = corpus.select(id_col, cell_col, vec_col)
    pairs = c.join(q, c[cell_col] == q.q_cell).filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = pairwise_cosine(pairs, vec_col, "q_vec", [id_col, "query_id"])
    return _ranked(scored, k, cand_id=id_col)


def kmeans_cells(
    corpus: DataFrame,
    k: int = 8,
    dim: int = 64,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, cell) — assignments only; see :func:`kmeans_fit` for the
    centroid table a multi-probe search needs."""
    asg, _ = _kmeans_impl(corpus, k, dim, rounds, vec_col, id_col)
    return asg


def _fold_dot(a: list[float], b: list[float]) -> float:
    """Driver-side left-fold dot: Python floats ARE IEEE doubles and the
    loop applies the identical op order, so this matches dot_flat bit for
    bit (used only for the k collected centroids' self-dots)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _kmeans_impl(
    corpus: DataFrame,
    k: int = 8,
    dim: int = 64,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """(assignments, centroids) — a TRAINED IVF coarse quantizer: deterministic
    k-means with ``rounds`` assignment rounds (``rounds - 1`` centroid
    updates), bit-reproducible in DuckDB SQL (the llm_similarity_topk_ivf
    oracle mirrors it clause for clause):

    * seeds: the k vectors with smallest ``md5(vec_id)`` (order-stable,
      pseudo-random spread, no RNG)
    * assignment: squared-L2 via ``vv - 2*<v,c> + cc`` with every dot a
      left-fold flat expression (same fold order as DuckDB
      ``list_dot_product``); ties broken by cell id — exact double
      compares, so both engines rank identically
    * update: per (cell, dimension) mean accumulated in DECIMAL(38,6)
      (order-independent exact sum — Spark's partial-merge order can't
      perturb it)

    r15 (optimization): centroids are COLLECTED each round (k x dim
    doubles — metadata-sized and corpus-independent, the same bounded-
    collect class as ``MAX_COLLECTED_QUERIES``; recomputed from parquet
    on every invocation, never memoized) and re-enter the next round as
    an 8-row broadcast LOCAL RELATION. The previous all-lazy form nested
    every round's centroid aggregation + per-vector row_number window
    into ONE deep Catalyst plan — round i's subtree contained round
    i-1's whole pipeline, so plan size grew geometrically with rounds
    (~5-8 s per IVF query at sf0.001, 2k vectors / 40 output rows: pure
    planning+codegen, not data). With a collected centroid table each
    round's plan is CONSTANT depth: scan -> crossJoin(broadcast 8-row
    LocalRelation) -> the same 64-term dot_flat dist expression the old
    form used (attribute x attribute — proven janino-compilable, unlike
    an 8 x 64-term all-literal projection, which exceeds generated-method
    limits and broke the vanilla-session driver contract when tried) ->
    groupBy(vec_id).min(struct(dist, cell)). The struct-min is the
    identical (dist, cell) lexicographic minimum the old row_number
    window picked (exact double compares), but it PARTIAL-aggregates
    map-side: the k candidate rows per vector collapse locally, so the
    exchange carries |corpus| rows instead of sorting k x |corpus|
    through a window. Measured + plan evidence in OPTIMIZATION_r15.md;
    results bit-identical (oracle unchanged, 3/3 diffcheck + vanilla
    driver-contract sim green).

    Scale shape unchanged: per round one linear pass over the corpus; at
    100 TB train on a sample and keep the final assignment full-corpus
    (same code path, sampled input). Cells that lose every member drop
    out (both engines identically). The driver holds k x dim doubles —
    never corpus-sized data.
    """
    e = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("vv", dot_flat("v", "v", dim))

    h = F.md5(F.col("vec_id").cast("string"))
    seed_rows = (
        e.select("vec_id", "v", h.alias("h")).orderBy("h", "vec_id").limit(k).collect()
    )
    # [(cell, c: list[double], cc)] — the literal centroid table
    cents = [
        (j, list(r.v), _fold_dot(list(r.v), list(r.v)))
        for j, r in enumerate(seed_rows)
    ]

    spark = corpus.sparkSession

    def _cent_df(cents_):
        return spark.createDataFrame(
            [(j, c, cc) for j, c, cc in cents_],
            "cell int, c array<double>, cc double",
        )

    def _assign(cents_):
        # argmin_j (dist_j, j) via min(struct(dist, cell)) — the same
        # (dist, cell) lexicographic minimum the old per-vector
        # row_number(ORDER BY dist, cell) picked (exact double compares).
        # dist keeps the original op order: (vv - 2.0*<v,c>) + cc, with
        # the centroid an ATTRIBUTE of the broadcast 8-row local relation
        # (the old, janino-proven expression shape). The groupBy
        # partial-aggregates map-side: the k candidate rows per vector
        # collapse inside the scan task, so the exchange carries one row
        # per vector. first(v) is deterministic by value — all k copies
        # of a vector's row carry the identical v.
        pairs = e.crossJoin(F.broadcast(_cent_df(cents_)))
        dist = F.col("vv") - F.lit(2.0) * dot_flat("v", "c", dim) + F.col("cc")
        return (
            pairs.select("vec_id", "v", dist.alias("dist"), "cell")
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "cell")).alias("__m"),
                F.first("v").alias("v"),
            )
            .select("vec_id", "v", F.col("__m.cell").alias("cell"))
        )

    for _ in range(rounds - 1):
        lng = _assign(cents).select("cell", F.posexplode("v").alias("pos", "val"))
        upd = (
            lng.groupBy("cell", "pos")
            .agg(davg("val").alias("avgval"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r.cell, {})[r.pos] = r.avgval
        cents = [
            (cell, c, _fold_dot(c, c))
            for cell in sorted(by_cell)
            for c in [[by_cell[cell][p] for p in sorted(by_cell[cell])]]
        ]

    asg = _assign(cents).select("vec_id", "cell")
    return asg, _cent_df(cents)


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    dim: int = 64,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids): assignments as in :func:`kmeans_cells`,
    plus the centroid table ``(cell, c, cc)`` the FINAL assignment used —
    the table a multi-probe search ranks against (probing must use the
    same centroids that defined the cells, or the probe order lies)."""
    return _kmeans_impl(corpus, k, dim, rounds, vec_col, id_col)


def ivf_probes(
    centroids: DataFrame,
    queries: DataFrame,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """(query_id, cell) — each query's ``nprobe`` nearest cells by squared
    L2 against the broadcast centroid table, ties by cell id (the same
    exact-double ranking rule as the k-means assignment, so the first
    probe is always the query's own cell)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qq", dot_flat("qv", "qv", dim))
    pairs = q.crossJoin(F.broadcast(centroids.select("cell", "c", "cc")))
    dist = F.col("qq") - F.lit(2.0) * dot_flat("qv", "c", dim) + F.col("cc")
    wr = Window.partitionBy("query_id").orderBy("dist", "cell")
    return (
        pairs.select("query_id", "cell", dist.alias("dist"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "cell")
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "cell",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k searching each query's ``nprobe`` nearest cells
    (IVF multi-probe — recovers most of nprobe=1's lost recall for
    near-boundary queries at ~nprobe/1x the scan cost). The probe list is
    |q| x nprobe rows, broadcast into an equi-join on the cell key; the
    corpus is still scanned once and only probed cells are scored."""
    probes = ivf_probes(centroids, queries, nprobe, vec_col, id_col, dim)
    c = corpus.select(
        id_col,
        F.col(cell_col).alias("__cell"),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        norm2_flat(vec_col, dim).alias("__nc"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("q_vec"),
            norm2_flat(vec_col, dim).alias("__nq"),
        )
    )
    cand = c.join(
        F.broadcast(probes), c["__cell"] == probes["cell"]
    ).join(q, "query_id").filter(F.col(id_col) != F.col("query_id"))
    scored = cand.select(
        id_col,
        "query_id",
        _guarded_sim(
            dot_flat(vec_col, "q_vec", dim), F.col("__nc"), F.col("__nq")
        ).alias("sim"),
    )
    return _ranked(scored, k, cand_id=id_col)


def cosine_pairs_within_cells(
    corpus: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by cell key (the
    all-pairs version of ivf_topk; pair count bounded by cell sizes)."""
    nrm = [norm2_flat(vec_col, dim).alias("__n")] if dim is not None else []
    vec = (
        F.col(vec_col).cast("array<double>").alias(vec_col)
        if dim is not None
        else F.col(vec_col)
    )
    proj = corpus.select(id_col, cell_col, vec, *nrm)
    a = proj.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        F.col(cell_col).alias("cell"),
        *([F.col("__n").alias("__na")] if dim is not None else []),
    )
    b = proj.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        F.col(cell_col).alias("cell"),
        *([F.col("__n").alias("__nb")] if dim is not None else []),
    )
    pairs = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    if dim is not None:
        scored = pairs.select(
            "cell", "id_a", "id_b",
            _guarded_sim(
                dot_flat("v_a", "v_b", dim), F.col("__na"), F.col("__nb")
            ).alias("sim"),
        )
    else:
        scored = pairwise_cosine(pairs, "v_a", "v_b", ["cell", "id_a", "id_b"])
    return scored.filter(F.col("sim") >= threshold).select(
        "cell", "id_a", "id_b", "sim"
    )
