"""Deduplication operators for large-scale training-data pipelines.

All of these are engine surface beyond the reference (SURVEY §2 Part B,
"LLM-pipeline"); each is built from shuffle-conscious DataFrame primitives:

* exact_dedup        — sha2(text) + per-hash winner (one shuffle).
* minhash_signatures — portable MinHash: for seed i, ``min over tokens of
  md5(i || ':' || token)``. Using the *string* min of a cryptographic hash
  is a permutation-free MinHash variant: each seed induces an independent
  pseudo-random total order on the token universe, and the minimum under
  that order is the classic MinHash estimator. It is exactly reproducible
  in any engine with md5() — which is what lets the DuckDB oracle pin it.
* lsh_candidate_pairs — band the signature (b bands x r rows), bucket-join
  docs sharing a band key. Shuffles: explode tokens (1), band groupBy (1),
  self-join on band key (1). No cross join anywhere; at 100 TB the band
  join is the standard near-dup architecture (the bucket sizes, not the
  corpus size, bound the pair blowup).
* jaccard_pairs      — exact token-set Jaccard for candidate verification
  (or within explicit blocking keys).
* simhash            — 16-bit SimHash from md5-derived bit planes; bit j of
  a token's hash is ``ascii(md5(token)[j]) % 2``; fingerprint bit j is the
  sign of the sum of (2*bit-1) over distinct tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = " "


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per distinct text (content hash).

    Returns docs + ``content_hash`` + ``is_canonical``.
    """
    h = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy("content_hash").orderBy(id_col)
    return (
        docs.withColumn("content_hash", h)
        .withColumn("is_canonical", F.row_number().over(w) == 1)
    )


def _clustered_distinct(df: DataFrame, cluster_by: list[str] | None) -> DataFrame:
    """``distinct()``, hash-partitioned by ``cluster_by`` when given.

    r16 (guide §2.4 "two operations keyed the same way can share one
    exchange"): a bare ``distinct()`` exchanges on ALL columns, and a
    downstream join/groupBy keyed on a SUBSET re-shuffles the whole
    deduped stream again. Hash partitioning by the subset satisfies the
    distinct aggregate's clustering requirement too (partition keys ⊆
    required clustering), so repartitioning by the downstream key FIRST
    makes the distinct run in place and the consumer inherit the
    partitioning — one token-stream shuffle instead of two (or three for
    a self-join). Results identical; measured on llm_jaccard_blocked_pairs
    sf3: 15.3-22.1 → 10.7-11.7 s. Map-side partial aggregation still
    collapses duplicates per task before the exchange, so a hot token key
    costs no more than the join already paid on it."""
    if cluster_by:
        df = df.repartition(*cluster_by)
    return df.distinct()


def doc_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_by: list[str] | None = None,
) -> DataFrame:
    """(id, token) pairs, distinct tokens per doc (set semantics).

    ``cluster_by``: see :func:`_clustered_distinct` — pass the downstream
    join/groupBy key to share the dedup exchange with the consumer."""
    return _clustered_distinct(
        docs.select(
            id_col, F.explode(F.split(F.col(text_col), TOKEN_SPLIT)).alias("token")
        ),
        cluster_by,
    )


def doc_shingles(
    docs: DataFrame,
    n_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
    cluster_by: list[str] | None = None,
) -> DataFrame:
    """(id, token) pairs where token is a distinct n-word shingle.

    MinHash over *shingles* (not single words) is what makes LSH
    discriminate: with a small vocabulary, single-word sets are nearly
    identical across documents and every band bucket degenerates into the
    whole corpus (measured: 10M+ candidate pairs from 5k docs). Word
    n-grams restore a large token universe, so buckets contain only true
    near-duplicates. ``arrays_zip`` NULL-padding + NULL-propagating concat
    keeps the short-document edge case identical to the oracle's 1-based
    ``list[i]`` indexing (out-of-range -> NULL -> shingle dropped).
    """
    # r15: shingles are assembled MAP-SIDE from arrays_zip of the split
    # word array with its shifted slice()s — all codegen-native
    # array-at-once expressions, no window, no shuffle. The previous
    # posexplode + per-doc lead() window form shipped the ENTIRE word
    # stream through the window's Exchange (~10M rows at sf1) just to
    # reassemble adjacent words; with the zip form the word stream never
    # crosses an exchange, so a downstream per-doc aggregation (the
    # minhash groupBy) partial-aggregates map-side and shuffles one
    # signature row per doc (guide §2.3: aggregate before you shuffle —
    # measured llm_minhash_lsh_pairs cold 1.43 -> 1.01 s at sf1,
    # scripts/r15_ab_shingles.py; (doc_id, token) multiset pinned
    # identical at sf0.01 + sf1). The old quadratic traps remain real
    # and avoided: a transform() lambda runs interpreted (HOFs are
    # CodegenFallback) and per-ELEMENT indexing of a split() array
    # re-inlines the split into every access via project-collapsing
    # (measured 7-10s to shingle 5k docs) — zip/slice index nothing
    # element-wise. arrays_zip pads the shorter shifted slices with
    # NULL and the NULL-propagating concat drops the tail stubs,
    # exactly the rows the lead() form's NULL filter dropped.
    w = F.split(F.col(text_col), TOKEN_SPLIT)
    arrs = [w.alias("w0")] + [
        F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0))).alias(f"w{j}")
        for j in range(1, n_words)
    ]
    z = docs.select(id_col, F.explode(F.arrays_zip(*arrs)).alias("z"))
    parts = []
    for j in range(n_words):
        if j:
            parts.append(F.lit(" "))
        parts.append(F.col(f"z.w{j}"))
    out = z.select(id_col, F.concat(*parts).alias("token")).filter(
        F.col("token").isNotNull()  # NULL zip-pad = tail stubs dropped
    )
    # Pass distinct=False for duplicate-insensitive consumers (MIN-based
    # MinHash): skipping the set-semantics shuffle changes nothing about
    # their result and removes a full exchange over the token stream.
    # cluster_by: see _clustered_distinct — share the dedup exchange with
    # a downstream join/groupBy keyed on a subset of (id, token).
    return _clustered_distinct(out, cluster_by) if distinct else out


#: modulus for the Kirsch-Mitzenmacher hash family: smallest prime > 2^32
MINHASH_P = 4_294_967_311


def minhash_signatures(
    tokens: DataFrame, n_hashes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """(id, seed, minhash: bigint) — one row per (doc, seed).

    One md5 per token, split into two 32-bit halves (h1, h2); hash i is
    ``(h1 + i*h2) mod p`` (Kirsch-Mitzenmacher double hashing — the
    standard way to derive k independent-enough MinHash permutations from
    two base hashes). 16x less hashing than per-seed md5, integer rather
    than string minima, and still bit-reproducible in any engine that has
    md5 + integer arithmetic.
    """
    h = F.md5("token")
    hashed = tokens.withColumn(
        "h1", F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    ).withColumn("h2", F.conv(F.substring(h, 9, 8), 16, 10).cast("long"))
    seeds = tokens.sparkSession.range(n_hashes).withColumnRenamed("id", "seed")
    return (
        hashed.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(
            F.min((F.col("h1") + F.col("seed") * F.col("h2")) % MINHASH_P).alias(
                "minhash"
            )
        )
    )


def minhash_matrix(
    tokens: DataFrame, n_hashes: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """(id, mh0..mh{k-1}) — the MinHash signature in WIDE form: all k
    minima come out of ONE groupBy over the token stream (k conditional
    aggregates per row), instead of crossJoining tokens x seeds and
    shuffling k x |tokens| rows. Same Kirsch-Mitzenmacher values as
    :func:`minhash_signatures`, 16x less shuffle I/O at k=16 — the form
    the LSH banding path consumes.

    h1/h2 are a named PROJECTION below the aggregate (one md5 + two convs
    per token, guaranteed, instead of per-aggregate copies of the
    expression), and the k aggs are single F.expr strings — ~4x less
    plan-construction py4j round-tripping, measured 0.22 -> 0.06 s per
    build."""
    h = tokens.select(
        F.col(id_col),
        F.expr(
            "cast(conv(substring(md5(token), 1, 8), 16, 10) as bigint)"
        ).alias("h1"),
        F.expr(
            "cast(conv(substring(md5(token), 9, 8), 16, 10) as bigint)"
        ).alias("h2"),
    )
    aggs = [
        F.expr(f"min((h1 + {i} * h2) % {MINHASH_P}) as mh{i}")
        for i in range(n_hashes)
    ]
    return h.groupBy(id_col).agg(aggs[0], *aggs[1:])


def lsh_candidate_pairs_from_tokens(
    tokens: DataFrame, n_hashes: int = 16, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """LSH candidate pairs straight from the token stream: wide minhash
    (one shuffle over tokens), band keys as per-row projections over the
    signature columns (no second aggregation), stack to (id, band_key)
    rows, bucket self-join. Semantics identical to
    ``lsh_candidate_pairs(minhash_signatures(tokens))``."""
    rows_per_band = n_hashes // bands
    sig = minhash_matrix(tokens, n_hashes, id_col)
    keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(b),
                *[F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)],
            )
        )
        for b in range(bands)
    ]
    # lazy localCheckpoint, not cache(): both join sides share the one
    # materialization, and the blocks are released by the ContextCleaner
    # when the plan goes out of scope — an unpaired cache() leaked executor
    # storage memory per invocation in the resident serving mode
    band_keys = sig.select(
        id_col, F.explode(F.array(*keys)).alias("band_key")
    ).localCheckpoint(eager=False)
    a = band_keys.select(F.col(id_col).alias("id_a"), F.col("band_key").alias("bk_a"))
    b = band_keys.select(F.col(id_col).alias("id_b"), F.col("band_key").alias("bk_b"))
    return (
        a.join(b, (a.bk_a == b.bk_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame, n_hashes: int = 16, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH band bucket.

    The band key is ``md5(band | m_0 | ... | m_{r-1})`` where ``m_j`` is the
    minhash at *seed position* j within the band, extracted with a
    conditional aggregate (whole-stage codegen; no arrays, no HOFs). Two
    properties are load-bearing:

    * position-sensitive — docs whose band holds the same minhash *values*
      in different seed slots do NOT collide (standard b x r banding; a
      value-sorted key would inflate false positives beyond the published
      LSH guarantees);
    * band-qualified — the band index is part of the hash input, so equal
      signatures in *different* bands can never share a key. That lets the
      self-join use the single ``band_key`` column. (An earlier version
      joined on an unaliased ``band`` column from both sides of the same
      cached plan, which Spark resolves to one attribute — a trivially-true
      predicate — silently degrading the join to band_key alone.)
    """
    rows_per_band = n_hashes // bands
    # integer floor-division: DuckDB's double->int CAST rounds, Spark's
    # truncates — keep both sides on exact integer arithmetic
    sig = signatures.withColumn(
        "band", F.floor(F.col("seed") / rows_per_band).cast("int")
    )
    # one row per (doc, band, position) exists, so max() just selects it
    pos = [
        F.max(F.when(F.col("seed") % rows_per_band == j, F.col("minhash"))).alias(
            f"m{j}"
        )
        for j in range(rows_per_band)
    ]
    band_keys = (
        sig.groupBy(id_col, "band")
        .agg(*pos)
        .select(
            id_col,
            F.md5(
                F.concat_ws(
                    "|", F.col("band"), *[F.col(f"m{j}") for j in range(rows_per_band)]
                )
            ).alias("band_key"),
        )
    )
    # barrier: a self-join does NOT dedupe its common subplan — without it
    # Spark scans + shingles + hashes the corpus twice (visible as two full
    # pipelines in explain()). Lazy localCheckpoint over cache() so the
    # blocks free automatically with the plan (resident-mode leak fix).
    band_keys = band_keys.localCheckpoint(eager=False)
    a = band_keys.select(
        F.col(id_col).alias("id_a"), F.col("band_key").alias("bk_a")
    )
    b = band_keys.select(
        F.col(id_col).alias("id_b"), F.col("band_key").alias("bk_b")
    )
    return (
        a.join(b, (a.bk_a == b.bk_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    tokens: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity |A∩B| / |A∪B| for doc pairs.

    With ``pairs`` given, verifies only those candidates (the LSH pattern);
    otherwise all pairs sharing >= 1 token (use blocking upstream!).
    """
    sizes = tokens.groupBy(id_col).agg(F.count("*").alias("n_tok"))
    if pairs is not None:
        # push the candidate restriction BELOW the token self-join: only
        # candidate docs' tokens participate, so verification cost tracks
        # |candidates|, not corpus^2 (filtering after the join would make
        # the candidate set pointless at scale)
        cand_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .union(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        tokens = tokens.join(F.broadcast(cand_ids), id_col, "left_semi")
    ta = tokens.select(F.col(id_col).alias("id_a"), "token")
    tb = tokens.select(F.col(id_col).alias("id_b"), "token")
    inter = (
        ta.join(tb, ["token"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["id_a", "id_b"], "inner")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_tok").alias("n_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "jaccard"
    )


def span_dup_stats(
    docs: DataFrame,
    n_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span statistics: for each doc, how many of
    its ``n_words``-word token spans also occur in at least one OTHER
    document. Returns (id, n_spans, dup_spans, dup_frac) — docs shorter
    than ``n_words`` tokens have no spans and are absent.

    This is the substring-granular dedup signal (suffix-array
    exact-substring dedup in the training-data literature, approximated
    with fixed-k shingles): whole-document MinHash misses a paragraph
    copied between otherwise-different pages; this flags it.

    Scale shape: the span stream reduces to (token, doc) grain in ONE
    exchange, cross-doc multiplicity is a count window on that
    already-collapsed grain, and the per-doc rollup is a groupBy on the
    id — no self-join, no candidate-pair blowup anywhere. The span key
    here is the raw n-gram text (exact, oracle-checkable); at corpus
    scale swap in xxhash64(token) — same plan, 8-byte keys.
    """
    spans = doc_shingles(
        docs, n_words=n_words, text_col=text_col, id_col=id_col, distinct=False
    )
    td = spans.groupBy("token", id_col).agg(F.count("*").alias("k"))
    td = td.withColumn("nd", F.count("*").over(Window.partitionBy("token")))
    dup_k = F.when(F.col("nd") > 1, F.col("k")).otherwise(F.lit(0))
    return td.groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_spans"),
        F.sum(dup_k).cast("long").alias("dup_spans"),
        F.round(
            F.sum(dup_k).cast("double") / F.sum("k").cast("double"), 6
        ).alias("dup_frac"),
    )


def simhash16(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash fingerprint per doc (portable md5 bit planes)."""
    h = F.md5("token")
    bit_sums = [
        F.sum(F.ascii(F.substring(h, j + 1, 1)) % 2 * 2 - 1).alias(f"s{j}")
        for j in range(16)
    ]
    sums = tokens.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(id_col, fp.cast("long").alias("simhash"))


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Cluster near-duplicate pairs: (doc_id, cluster_id) where cluster_id
    is the minimum doc id reachable through the pair graph (deterministic
    canonical representative).

    Iterative min-label propagation over the edge list — the classic
    large-graph CC algorithm (each round: join labels to edges, take the
    min neighbor label, converge when no label changes). Rounds needed =
    graph diameter; near-dup clusters are shallow (usually 1-3 rounds).
    Each round is one join + one aggregation; the loop runs on the driver
    but all data stays distributed. localCheckpoint per round keeps the
    plan from growing linearly with iterations.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # returning partially-propagated labels would be silently wrong
        # (ADVICE r1): the caller either raises max_iterations or switches
        # to a large-star/small-star variant for high-diameter graphs
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the cap); raise "
            "max_iterations for chain-like pair graphs"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
