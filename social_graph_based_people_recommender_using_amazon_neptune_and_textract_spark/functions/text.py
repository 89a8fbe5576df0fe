"""Text-analysis operators over the ``documents`` table (north-star
training-data pipeline surface, BASELINE.json): language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All built-in-function columns (JVM-side); each has a DuckDB oracle twin in
oracles.py. The analyzer is the engine-wide frozen tokenizer
(search.index.tokenize).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..search.index import tokenize

# Stopword profiles for the n-gram/stopword language heuristic. The corpus
# language tags in testdata are synthetic; the heuristic's *semantics*
# (argmax profile overlap with deterministic tie order) are what's tested.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "en": ["the", "a", "of", "and", "is", "not"],
    "es": ["el", "la", "de", "y", "es", "no"],
    "fr": ["le", "la", "de", "et", "est", "pas"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni"],
}
STOPWORDS_EN = LANG_PROFILES["en"]


def _profile_score(tokens: Column, words: list[str]) -> Column:
    """Number of tokens (with multiplicity) belonging to the profile."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(wl, x)))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predicted language = argmax profile score; ties broken by language
    code ascending; all-zero → 'und'. Returns (id_col, predicted_lang)."""
    toks = tokenize(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        *[
            _profile_score(toks, words).alias(f"s_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("und"))
    for l in langs:  # first (asc) language hitting the max wins
        pred = pred.when(F.col(f"s_{l}") == best, F.lit(l))
    return scored.select(F.col(id_col), pred.alias("predicted_lang"))


def quality_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features + composite score. Returns
    (id, n_tokens, n_chars, avg_token_len, stopword_ratio, quality_score);
    ratios rounded to 6dp (double), deterministic across engines."""
    toks = tokenize(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x)
        ).alias("token_chars"),
        _profile_score(toks, STOPWORDS_EN).alias("n_stop"),
    )
    nt = F.col("n_tokens")
    avg_len = F.when(nt > 0, F.col("token_chars") / nt).otherwise(F.lit(0.0))
    stop_ratio = F.when(nt > 0, F.col("n_stop") / nt).otherwise(F.lit(0.0))
    # Composite: in-range token count, reasonable word length, some stopwords.
    score = (
        F.when((nt >= 10) & (nt <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_len >= 3) & (avg_len <= 10), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return base.select(
        F.col(id_col),
        "n_chars",
        "n_tokens",
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token accounting: whitespace-split count, analyzer token count,
    distinct analyzer tokens. Returns (id, n_ws_tokens, n_tokens, n_distinct)."""
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    toks = tokenize(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalized bag-of-words fingerprint: md5 of the space-joined sorted
    distinct token set — content-defined identity generalizing the
    reference's content_id (upsert_bizcard_to_es.py:73-75, O21).
    Returns (id, fingerprint)."""
    toks = tokenize(F.col(text_col))
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks))).cast("binary")
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
