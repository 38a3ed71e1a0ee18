"""Text-analysis scalar functions (LLM-pipeline surface, SURVEY §2 Part B).

All JVM-side expressions (split/filter/transform higher-order functions),
deliberately portable so the DuckDB oracle can evaluate the identical
definitions: whitespace + regex tokenization, stopword-based quality
scoring, dictionary-overlap language id, and shingle fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny function-word dictionaries per language; the lang-id heuristic is
#: argmax of dictionary-hit counts with a fixed priority order for ties.
LANG_DICTS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "fast", "slow"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "y", "los"),
    "zh": ("de", "shi", "zai", "he"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to")

WORD_RE = "[A-Za-z]+|[0-9]+"


def tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: str | Column) -> Column:
    """Whitespace token count, as pure arithmetic: single-space split
    yields exactly (#spaces + 1) tokens (empties included, matching the
    oracle's len(string_split(text, ' '))), so counting spaces via
    length-after-replace avoids materializing the token array per row —
    verified value-identical to size(split(...)) over the full corpus
    (r9 sf10 probe; same integers, ~5% less scan-stage CPU)."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))) + F.lit(1)
    ).cast("long")


def regex_token_count(text: str | Column) -> Column:
    """BPE-ish pre-tokenizer count: alpha runs + digit runs."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(WORD_RE)).cast("long")


def _word_hits(text: str | Column, words: tuple[str, ...]) -> Column:
    """Count whitespace tokens exactly equal to one of ``words`` — as ONE
    regexp_count over space-padded text (whole-stage codegen) instead of a
    filter() higher-order function (CodegenFallback, interpreted per
    token). The lookahead keeps adjacent hits countable (" a of " — the
    separator space is shared between matches).

    Measured r10 (sf10 documents, interleaved A/B, 5 runs each): this
    single regex pass beats the ``_word_hits_arith`` replace-counting form
    0.50 s vs 0.75 s full-query resident — the 7 ``replace`` calls each
    allocate a fresh UTF8String (~2 KB garbage/row/word at 300-char docs)
    while the regex scan allocates nothing, so VERDICT r9's
    arithmetic-replace hypothesis is disproven and the regex form stays.
    The actual llm_text_stats scale fix is the ingest-time stats layout
    (sources/derived.py) — the bare text scan+agg floor (0.27 s sf10)
    already exceeds the 2x-of-DuckDB budget before any token math runs."""
    c = F.col(text) if isinstance(text, str) else text
    pat = " (" + "|".join(words) + ")(?= )"
    return F.regexp_count(
        F.concat(F.lit(" "), c, F.lit(" ")), F.lit(pat)
    ).cast("long")


def _word_hits_arith(text: str | Column, words: tuple[str, ...]) -> Column:
    """Regex-free twin of :func:`_word_hits`, kept for the differential
    test: double every separator space (adjacent hits then never share
    one — " a of " -> " a  of " makes " a " and " of " disjoint), pad both
    ends, and per word count occurrences of ``" w "`` via
    length-after-replace divided by match length. Value-identical on the
    full corpus + edge cases (empty/NULL/adjacent/repeated tokens), but
    measurably SLOWER than the regex pass (see _word_hits docstring), so
    it is not used on any hot path."""
    c = F.col(text) if isinstance(text, str) else text
    s = F.concat(F.lit(" "), F.replace(c, F.lit(" "), F.lit("  ")), F.lit(" "))
    n: Column | None = None
    for w in words:
        cnt = (
            F.length(s) - F.length(F.replace(s, F.lit(f" {w} "), F.lit("")))
        ) / F.lit(len(w) + 2)
        n = cnt if n is None else n + cnt
    assert n is not None
    return n.cast("long")


def stopword_count(text: str | Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    return _word_hits(text, words)


def quality_score(text: str | Column) -> Column:
    """Heuristic doc quality in [0,1]: blend of stopword ratio and mean
    token length (very short/degenerate tokens score low). Rounded to 6
    (division chain — keep cross-engine comparable)."""
    n = token_count(text)
    sw = stopword_count(text)
    c = F.col(text) if isinstance(text, str) else text
    mean_tok_len = F.length(c) / n  # includes separators; deterministic
    return F.round(
        F.least(
            F.lit(1.0),
            0.5 * (sw / n * 5.0) + 0.5 * F.least(F.lit(1.0), mean_tok_len / 8.0),
        ),
        6,
    )


def lang_scores(text: str | Column) -> list[Column]:
    """Dictionary-hit count per language, in LANG_DICTS order."""
    return [
        _word_hits(text, words).alias(f"score_{lang}")
        for lang, words in LANG_DICTS.items()
    ]


def shingles(text: str | Column, n: int = 8) -> Column:
    """Character n-gram shingles (array<string>), empty-safe."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - (n - 1)))
    return F.transform(idx, lambda i: F.substr(c, i, F.lit(n)))


def shingle_fingerprint(text: str | Column, n: int = 8) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    deterministic, engine-portable stand-in for a rolling-hash min
    (winnowing with window = whole doc).

    Scalar HOF form (interpreted per character) — convenient for ad-hoc
    expressions; the hot path is :func:`fingerprint_by_doc`, the codegen
    explode(sequence)+substring equivalent.
    """
    return F.array_min(F.transform(shingles(text, n), F.md5))


def fingerprint_by_doc(docs, id_col: str = "doc_id", text_col: str = "text", n: int = 8):
    """(id, fingerprint) — codegen equivalent of
    ``shingle_fingerprint`` per document.

    r15: one explode of ``sequence(1, greatest(1, len - n + 1))`` and a
    ``substring(text, i, n)`` per position — every shingle is sliced from
    the row's OWN text column map-side and projected straight to its md5,
    then ``groupBy(id).min`` partial-aggregates per doc locally, so the
    only exchange carries ONE row per doc. The previous form split the
    text into per-CHARACTER rows and reassembled shingles with n-1
    ``lead`` calls over a per-doc window: the whole character stream
    (~100-300M rows at sf1) crossed an Exchange + Sort before any
    reduction — measured 2.75 s minimum at sf1 with spill-driven tails
    under memory pressure vs 1.61 s for this form
    (scripts/r15_ab_fingerprint.py; fingerprints pinned identical at
    sf0.01 + sf1). HOF ``transform`` stays out for the original reason
    (CodegenFallback, ~µs/char interpreted).

    Short/empty docs: ``substring`` clamps at the end of the text and the
    sequence lower bound is 1, so a doc shorter than ``n`` fingerprints
    its whole text — identical to the scalar form's clamped ``substr``
    (and the oracle's ``GREATEST(1, len-7)`` bound).
    """
    c = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - (n - 1)))
    rows = docs.select(id_col, c.alias("__t"), F.explode(idx).alias("__i"))
    return (
        rows.select(
            id_col,
            F.md5(F.substring(F.col("__t"), F.col("__i"), F.lit(n))).alias("__h"),
        )
        .groupBy(id_col)
        .agg(F.min("__h").alias("fingerprint"))
    )


def word_bigrams(text: str | Column) -> Column:
    """Adjacent whitespace-token bigrams (array<string>); empty when the
    doc has fewer than two tokens. ``zip_with(tokens[:-1], tokens[1:])``
    — no explode, no window; per-doc arrays stay inside one projection."""
    t = tokens(text)
    n = F.size(t)
    return F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_ratio(text: str | Column) -> Column:
    """Within-document repetition: fraction of adjacent word-bigram slots
    occupied by a repeated bigram, ``1 - distinct/total`` (the
    Gopher-style duplicate-n-gram gate, n=2). 0.0 for docs with fewer
    than two tokens AND for NULL text: under Spark 4's ANSI default
    ``size(NULL)`` is NULL (not -1), so without the explicit isNull
    branch a NULL doc would propagate NULL into downstream averages
    while SQL oracles that COALESCE would count it as 0.0 — the two
    engines must take the 0.0 branch by construction. Two small-int
    counts divided identically on every engine — deterministic to the
    last bit."""
    b = word_bigrams(text)
    total = F.size(b)
    return F.when(total.isNull() | (total <= 0), F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(b)).cast("double") / total.cast("double")
    )


def normalize_text(text: str | Column) -> Column:
    """Canonical form for normalize-then-exact-dedup: lowercase, collapse
    every whitespace run to one space, trim. Identical RE2/Java regex
    semantics for the ``\\s+`` class on ASCII + Unicode spaces."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
