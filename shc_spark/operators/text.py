"""Text-analysis operators for training-data pipelines.

All hot-path computation is JVM-side ``pyspark.sql.functions``
(whole-stage codegen, no Python in the loop) — at 100 TB these run as
a single scan stage with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword language-ID
# heuristic; chosen to be disjoint across languages
LANG_MARKERS = {
    "en": ["the", "and", "with", "from"],
    "de": ["der", "und", "nicht", "das"],
    "fr": ["le", "et", "les", "des"],
    "es": ["el", "los", "por", "una"],
    "zh": ["de5", "shi4", "zai4", "he2"],  # pinyin-ish markers for synthetic zh
}


def words(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish upper bound: split on word boundaries AND punctuation,
    count non-empty pieces — a cheap, deterministic stand-in for a real
    tokenizer's piece count."""
    pieces = F.split(text, r"[\s\p{Punct}]+")
    return F.size(F.filter(pieces, lambda p: p != ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0, 1]. Pure column expressions — one codegen'd
    projection."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_stop = F.size(
        F.filter(words(t), lambda w: w.isin(*[m for ms in LANG_MARKERS.values() for m in ms]))
    )
    avg_word_len = (n_alpha / F.greatest(n_tokens, F.lit(1))).cast("double")
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double")
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.2
    ).cast("double")
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(avg_word_len, 4).alias("q_avg_word_len"),
        F.round(punct_ratio, 4).alias("q_punct_ratio"),
        F.round(stop_ratio, 4).alias("q_stop_ratio"),
        F.round(score, 4).alias("q_score"),
    )


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: count marker hits per language,
    argmax wins (ties broken by language-code order). Returns 'und'
    when nothing matches."""
    ws = words(text)

    def marker_hits(markers):
        # single-arg lambda: pyspark passes (element, index) to 2-arg
        # lambdas, so the marker list must be captured via a factory
        return F.size(F.filter(ws, lambda w: w.isin(*markers)))

    scores = [
        F.struct(marker_hits(markers).alias("hits"), F.lit(code).alias("lang"))
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, n: int = 3) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct n-gram shingles. Identical content in any shingle
    permutation -> identical fingerprint; robust to duplicated
    paragraphs, cheap to compare (one string equality)."""
    sh = shingles(text, n)
    return F.md5(F.array_join(F.array_sort(sh), "\x01"))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (1-based
    element_at keeps the expression identical to the DuckDB oracle).

    Documents with fewer than n words yield an EMPTY array — guarded
    explicitly because Spark's sequence(1, 0) is the DESCENDING
    [1, 0], not [] (which would crash element_at)."""
    ws = words(text)
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(ws, i + k) for k in range(n)])  # noqa: E731
    return F.when(
        F.size(ws) >= n, F.array_distinct(F.transform(idx, gram))
    ).otherwise(F.array().cast("array<string>"))


def rolling_hash(text: Column, window: int = 8) -> Column:
    """Per-document min-of-rolling-hash (winnowing-style selector):
    min over crc32 of each window-gram — a cheap locality-sensitive
    scalar used for candidate bucketing."""
    sh = shingles(text, window)
    return F.array_min(F.transform(sh, lambda s: F.crc32(s)))
