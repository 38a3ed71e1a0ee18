"""Second batch of LLM-training-data-pipeline declared queries: PII
redaction, URL/domain blocklist filtering, chunk-level exact dedup,
sequence-length histograms, source mixing weights, and unigram-LM
negative-log-likelihood quality scoring.

The synthetic ``documents`` text contains no real PII/URLs, so the
redaction and domain queries derive a deterministic enriched column from
(doc_id, source) first — both engines compute the identical input from the
same parquet, and the regex/blocklist machinery is then exercised on text
where it genuinely fires. The operators themselves are the generic ones a
real corpus would use.

Regex portability: patterns restricted to the syntax subset Java
(``java.util.regex``, Spark) and RE2 (DuckDB) agree on — character
classes, ``\\d``, bounded repetition; no backreferences or lookaround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metricq_db_hta_spark.queries.base import (
    bsum,
    md5_bucket,
    register,
    sql_md5_bucket,
)
from metricq_db_hta_spark.queries.llm import docs

EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+"
PHONE_RE = "\\d{3}-\\d{4}"

# Deterministic PII enrichment shared by the Spark and oracle sides:
#   text || ' contact user<id>@example.com or call 555-<id%10000 lpad 4>'
_PII_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@example.com or call 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def _pii_text() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )


@register(
    "llm_pii_redact",
    oracle=f"""
WITH enriched AS (SELECT doc_id, {_PII_SQL} AS t FROM documents),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
         regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS rt
  FROM enriched)
SELECT doc_id, n_emails, n_phones,
       CAST(length(rt) AS BIGINT) AS redacted_len,
       md5(rt) AS redacted_md5
FROM red
""",
    doc="PII redaction pass: count and mask email/phone patterns per "
    "document (regexp_count + chained regexp_replace). Pure map-side "
    "stage — zero shuffles, whole-stage codegen, trivially 100 TB-safe. "
    "The md5 of the redacted text pins the exact replacement output, not "
    "just the match counts.",
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir).select("doc_id", _pii_text().alias("t"))
    rt = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.length(rt).cast("long").alias("redacted_len"),
        F.md5(rt).alias("redacted_md5"),
    )


_BLOCKED_DOMAINS = ["src3.example.com", "src7.example.com", "src11.example.com"]


@register(
    "llm_url_domain_filter",
    oracle=f"""
WITH u AS (
  SELECT doc_id, n_chars,
         regexp_extract('https://' || source || '.example.com/doc/' ||
                        CAST(doc_id AS VARCHAR),
                        'https://([a-z0-9.-]+)/', 1) AS domain
  FROM documents)
SELECT domain, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM u
WHERE domain NOT IN ({", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)})
GROUP BY domain
""",
    doc="URL/domain blocklist filter: extract the domain from a derived "
    "document URL (regexp_extract), drop blocklisted domains via a "
    "broadcast anti-join, aggregate survivors per domain. The blocklist "
    "relation (real pipelines: millions of rows, still MBs) broadcasts; "
    "the corpus is never shuffled before the final per-domain aggregate.",
)
def llm_url_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    with_dom = d.select(
        "doc_id",
        "n_chars",
        F.regexp_extract(url, "https://([a-z0-9.-]+)/", 1).alias("domain"),
    )
    block = F.broadcast(
        d.sparkSession.createDataFrame(
            [(b,) for b in _BLOCKED_DOMAINS], "domain string"
        )
    )
    return (
        with_dom.join(block, "domain", "left_anti")
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"), bsum("n_chars").alias("total_chars"))
    )


CHUNK_WORDS = 20


@register(
    "llm_chunk_dedup",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
c AS (
  SELECT doc_id,
         md5(array_to_string(
               words[(i*{CHUNK_WORDS}+1):(i*{CHUNK_WORDS}+{CHUNK_WORDS})],
               ' ')) AS chunk_md5
  FROM w,
       unnest(generate_series(
         0, CAST(ceil(len(words) / {CHUNK_WORDS}.0) AS INT) - 1)) AS t(i))
SELECT chunk_md5, COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs
FROM c GROUP BY chunk_md5 HAVING COUNT(*) > 1
""",
    doc=f"Chunk-level exact dedup: split each document into consecutive "
    f"{CHUNK_WORDS}-word chunks (the paragraph analog for this corpus), "
    "hash each, report chunks occurring more than once. Finds shared "
    "boilerplate/passages that document-level exact dedup misses and "
    "MinHash only scores in aggregate. One explode (bounded at "
    f"len/{CHUNK_WORDS} rows per doc) + one hash aggregate — the same "
    "shape as exact dedup, scale-safe.",
)
def llm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    words = F.split("text", " ")
    nchunks = F.ceil(F.size(words) / F.lit(float(CHUNK_WORDS))).cast("int")
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.md5(
                F.array_join(F.slice(words, i * CHUNK_WORDS + 1, CHUNK_WORDS), " ")
            ),
        )
    )
    c = d.select("doc_id", chunk.alias("chunk_md5"))
    return (
        c.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


BIN_CHARS = 50
MAX_BIN = 12


@register(
    "llm_length_histogram",
    oracle=f"""
SELECT least(CAST(floor(n_chars / {BIN_CHARS}) AS BIGINT), {MAX_BIN}) AS bin,
       COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY bin
""",
    doc=f"Sequence-length histogram ({BIN_CHARS}-char bins, top bin open): "
    "the batch-shape profile a training pipeline reads before choosing "
    "packing length / truncation policy. Single hash aggregate on a "
    "derived key; partial aggregation collapses each partition to "
    f"<= {MAX_BIN + 1} rows before the one tiny shuffle.",
)
def llm_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    bin_col = F.least(
        F.floor(F.col("n_chars") / BIN_CHARS).cast("long"), F.lit(MAX_BIN).cast("long")
    )
    return d.groupBy(bin_col.alias("bin")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        bsum("n_chars").alias("total_chars"),
    )


@register(
    "llm_source_mixing_weights",
    oracle="""
WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t,
               CAST(COUNT(*) AS DOUBLE) AS n_src FROM s)
SELECT source, n_docs, n_tokens,
       ROUND(n_tokens / t, 6) AS token_share,
       ROUND(t / (n_src * n_tokens), 6) AS mix_weight
FROM s, tot
""",
    doc="Per-source data-mixing weights: actual token share per source vs "
    "a uniform target share, and the resampling weight that equalizes "
    "them (weight = target_share / actual_share) — the standard knob for "
    "rebalancing a training mixture. The per-source aggregate is one "
    "shuffle; the corpus-total join is a broadcast of the already-tiny "
    "aggregate (|sources| rows), never a second pass over the corpus.",
)
def llm_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        bsum("size(split(text, ' '))").alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").cast("double").alias("t"),
        F.count("*").cast("double").alias("n_src"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("token_share"),
        F.round(F.col("t") / (F.col("n_src") * F.col("n_tokens")), 6).alias(
            "mix_weight"
        ),
    )


@register(
    "llm_unigram_logprob",
    oracle="""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
lm AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t FROM lm),
lp AS (SELECT word, ROUND(ln(c / t), 6) AS logp6 FROM lm, tot)
SELECT w.doc_id, COUNT(*) AS n_tokens,
       ROUND(-(CAST(SUM(CAST(logp6 AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)), 6) AS nll
FROM w JOIN lp USING (word)
GROUP BY w.doc_id
""",
    doc="Unigram-LM quality score: corpus unigram log-probabilities, then "
    "per-document mean negative log-likelihood — the cheap proxy for the "
    "perplexity filters (KenLM-style) real corpus pipelines gate on. "
    "Two passes over the token stream: one to build the LM (vocab-sized "
    "aggregate), one to score; the LM broadcasts (vocab << corpus at any "
    "scale) so scoring is map-side. Per-word log rounds to 6dp before the "
    "exact decimal sum, making the mean independent of both engine libm "
    "ulps and Spark's partial-merge order.",
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    lm = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = lm.agg(F.sum("c").cast("double").alias("t"))
    lp = lm.crossJoin(F.broadcast(tot)).select(
        "word", F.round(F.log(F.col("c") / F.col("t")), 6).alias("logp6")
    )
    DEC = "decimal(38,6)"
    return (
        w.join(F.broadcast(lp), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                -(F.sum(F.col("logp6").cast(DEC)).cast("double") / F.count("*")), 6
            ).alias("nll"),
        )
    )


@register(
    "llm_weighted_sample",
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t,
               CAST(COUNT(*) AS DOUBLE) AS n_src FROM s),
w AS (SELECT source, least(1.0, t / (n_src * n_tokens)) AS p FROM s, tot),
kept AS (
  SELECT d.doc_id, d.source, d.n_chars
  FROM documents d JOIN w USING (source)
  WHERE ({sql_md5_bucket('d.doc_id', salt='wsamp:', mod=10000)}) < p * 10000)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
       MIN(doc_id) AS min_doc_id
FROM kept GROUP BY source
""",
    doc="Weighted downsampling that APPLIES the mixing weights (see "
    "llm_source_mixing_weights): keep each document with probability "
    "min(1, target_share/actual_share) of its source, decided by a "
    "salted md5 bucket — deterministic across engines, runs, and cluster "
    "sizes, unlike rand()-based sampling. The per-source weight table "
    "(|sources| rows) broadcasts back over the corpus; one corpus pass "
    "for weights, one map-side filtered pass for the sample.",
)
def llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        bsum("size(split(text, ' '))").alias("n_tokens")
    )
    tot = s.agg(
        F.sum("n_tokens").cast("double").alias("t"),
        F.count("*").cast("double").alias("n_src"),
    )
    w = s.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0), F.col("t") / (F.col("n_src") * F.col("n_tokens"))
        ).alias("p"),
    )
    bucket = md5_bucket("doc_id", salt="wsamp:", mod=10000)
    return (
        d.join(F.broadcast(w), "source")
        .filter(bucket < F.col("p") * 10000)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            bsum("n_chars").alias("kept_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


# 8-word spans for cross-document duplicated-substring detection. Same
# parity construction as llm.SHINGLES_CTE (DuckDB 1-based list indexing,
# NULL-propagating || drops tail stubs) widened to n=8, and kept
# duplicate-sensitive: a span's multiplicity within a doc weights its
# contribution to that doc's duplicated fraction.
_SPANS_CTE = """
shingled AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id, token FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, GREATEST(1, len(w) - 7)),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
               || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]
           )) AS token
    FROM shingled
  ) WHERE token IS NOT NULL
)"""


@register(
    "llm_ngram_span_dedup",
    oracle=f"""
WITH {_SPANS_CTE.strip()},
td AS (SELECT token, doc_id, COUNT(*) AS k FROM spans GROUP BY 1, 2),
td2 AS (SELECT *, COUNT(*) OVER (PARTITION BY token) AS nd FROM td)
SELECT doc_id,
       CAST(SUM(k) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN nd > 1 THEN k ELSE 0 END) AS BIGINT) AS dup_spans,
       ROUND(CAST(SUM(CASE WHEN nd > 1 THEN k ELSE 0 END) AS DOUBLE)
             / CAST(SUM(k) AS DOUBLE), 6) AS dup_frac
FROM td2 GROUP BY doc_id
""",
    doc="Duplicated-span detection: per document, the fraction of its "
    "8-word token spans that also occur in at least one OTHER document — "
    "the substring-granular dedup signal (suffix-array exact-substring "
    "dedup in the training-data literature, approximated with fixed-k "
    "shingles; whole-doc MinHash misses partial overlap, this catches "
    "it). Scale shape: spans reduce to (token, doc) grain in ONE "
    "exchange of the span stream, cross-doc multiplicity is a window on "
    "that already-small grain, and the per-doc rollup is a groupBy on "
    "doc_id — no self-join, no candidate blowup; the token key is the "
    "8-gram text here (exact, oracle-checkable) and would be xxhash64(" 
    "token) at corpus scale (same plan, 8 bytes per key).",
)
def llm_ngram_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from metricq_db_hta_spark.operators import dedup

    return dedup.span_dup_stats(docs(spark, sf_dir), n_words=8)
