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
    """Whitespace token count."""
    return F.size(tokens(text)).cast("long")


def regex_token_count(text: str | Column) -> Column:
    """BPE-ish pre-tokenizer count: alpha runs + digit runs."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(WORD_RE)).cast("long")


def stopword_count(text: str | Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(text), lambda t: F.array_contains(arr, t))
    ).cast("long")


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
    out = []
    for lang, words in LANG_DICTS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out.append(
            F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))
            .cast("long")
            .alias(f"score_{lang}")
        )
    return out


def shingles(text: str | Column, n: int = 8) -> Column:
    """Character n-gram shingles (array<string>), empty-safe."""
    c = F.col(text) if isinstance(text, str) else text
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(c) - (n - 1)))
    return F.transform(idx, lambda i: F.substr(c, i, F.lit(n)))


def shingle_fingerprint(text: str | Column, n: int = 8) -> Column:
    """Document fingerprint: lexicographic min of md5(shingle) — a
    deterministic, engine-portable stand-in for a rolling-hash min
    (winnowing with window = whole doc)."""
    return F.array_min(F.transform(shingles(text, n), F.md5))
