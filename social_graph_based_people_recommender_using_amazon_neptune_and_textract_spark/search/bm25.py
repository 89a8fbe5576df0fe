"""BM25 scoring (O27 multi_match relevance, es_search_bizcard.py:61-70).

Textbook BM25 with the ES 7.x defaults k1=1.2, b=0.75 and the Lucene idf
``ln(1 + (N - df + 0.5)/(df + 0.5))`` — a *declared deviation* from
bit-exact Lucene scores (SURVEY R2): the analyzer is frozen
(index.tokenize) and there are no coord/boost-norm factors.

Determinism contract with the DuckDB oracle: the arithmetic expression
SHAPE below is mirrored token-for-token in oracles.py so both engines
evaluate the same double-precision operation tree; final scores are
rounded to 6 decimals before ordering/comparison.

Scale architecture (how Lucene actually serves a query, re-expressed):

1. **Norms live in the index.** ``build_index`` denormalizes the document
   length ``dl`` into every postings row, so scoring never joins doclen.
2. **Corpus statistics are index metadata.** (N, avgdl) per corpus/field
   are collected ONCE per corpus (one tiny agg job over the pinned
   doclen) and memoized driver-side by the caller — exactly Lucene's
   in-memory ``CollectionStatistics``.
3. **Term statistics are a point lookup.** The term dictionary (token →
   df) is built at INDEX time (``build_index``'s ``vocab`` relation —
   Lucene's segment term dictionary) and pinned with the index; per query
   the df of each term is one small filter+collect over that
   vocabulary-sized relation (≤ terms×fields rows back), never a scan of
   the postings themselves. The postings-scan fallbacks
   (``term_dfs``/``term_dfs_by_field``) remain for callers without a
   prebuilt vocabulary.
4. **Scoring is a zero-join scan.** idf and avgdl enter the plan as
   literals (CASE chains over the ≤ terms×fields fetched pairs), so the
   whole query is postings-scan → filter → project → per-doc aggregate →
   TakeOrderedAndProject. No broadcast builds, no shuffled dimension
   joins — one shuffle total (the per-doc score aggregation).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def idf(n: int, df: int) -> float:
    """Lucene idf, computed driver-side from fetched statistics. Python
    floats are IEEE doubles — same operation tree as the previous
    in-plan ``F.ln`` form (scores are 6dp-rounded before comparison)."""
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def corpus_stats(doclen: DataFrame) -> tuple[int, float]:
    """(N, avgdl) for a single-field corpus — one tiny agg job. Callers
    memoize per corpus (index metadata, not per-query work).

    Empty corpus → (0, 0.0): ``avg`` over zero rows is NULL, and a query
    against an empty index must serve zero hits (the reference serves
    '[]' on any degenerate request, es_search_bizcard.py:98-106), not
    crash on ``float(None)``."""
    row = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n = int(row["n"])
    return n, (float(row["avgdl"]) if n else 0.0)


def corpus_stats_by_field(doclen: DataFrame) -> dict[str, tuple[int, float]]:
    """{field: (N, avgdl)} — per-field statistics as in Lucene."""
    rows = doclen.groupBy("field").agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()
    return {r["field"]: (int(r["n"]), float(r["avgdl"])) for r in rows}


def term_dfs(postings: DataFrame, terms: Sequence[str]) -> dict[str, int]:
    """{term: document frequency} — the per-query term-stats point
    lookup (≤ |terms| result rows regardless of corpus size)."""
    rows = (
        postings.filter(F.col("tok").isin(list(terms)))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    return {r["tok"]: int(r["df"]) for r in rows}


def term_dfs_by_field(
    postings: DataFrame, terms: Sequence[str]
) -> dict[tuple[str, str], int]:
    """{(field, term): df} — ≤ |terms|×|fields| result rows."""
    rows = (
        postings.filter(F.col("tok").isin(list(terms)))
        .groupBy("field", "tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    return {(r["field"], r["tok"]): int(r["df"]) for r in rows}


def vocab_dfs(vocab: DataFrame, terms: Sequence[str]) -> dict[str, int]:
    """{term: df} from the prebuilt term dictionary — a point lookup over
    the vocabulary-sized pinned relation."""
    rows = vocab.filter(F.col("tok").isin(list(terms))).collect()
    return {r["tok"]: int(r["df"]) for r in rows}


def vocab_dfs_by_field(
    vocab: DataFrame, terms: Sequence[str]
) -> dict[tuple[str, str], int]:
    """{(field, term): df} from the prebuilt per-field term dictionary."""
    rows = vocab.filter(F.col("tok").isin(list(terms))).collect()
    return {(r["field"], r["tok"]): int(r["df"]) for r in rows}


def _contrib(idf_col: Column, avgdl_col: Column) -> Column:
    """The shared BM25 contribution expression; shape mirrored in
    oracles.py:

        idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    """
    return (
        idf_col
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(1) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / avgdl_col)
        )
    )


def _case_chain(pairs: list[tuple[Column, float]]) -> Column:
    """CASE chain over a handful of (condition, literal) pairs; the
    fallthrough 0.0 is unreachable (rows are pre-filtered to the keys)."""
    out: Column | None = None
    for cond, val in pairs:
        out = F.when(cond, F.lit(val)) if out is None else out.when(cond, F.lit(val))
    return F.lit(0.0) if out is None else out.otherwise(F.lit(0.0))


def bm25_scores(
    postings: DataFrame,
    doclen: DataFrame,
    terms: Sequence[str],
    stats: tuple[int, float] | None = None,
    dfs: dict[str, int] | None = None,
) -> DataFrame:
    """Per-document BM25 score for the given query terms over a
    single-field postings index carrying ``dl``.

    Returns (id, score) for every document matching ≥1 term; ``score`` is
    rounded to SCORE_DECIMALS. Term dfs come from the caller's prebuilt
    term dictionary (``dfs=vocab_dfs(...)``) or one small lookup job;
    the scoring plan itself is a zero-join postings scan with a single
    per-doc aggregation."""
    n, avgdl = stats if stats is not None else corpus_stats(doclen)
    if n == 0:
        # Empty index: zero hits by definition — short-circuit to an empty
        # relation with the result schema (no term-stats job, no scan).
        return postings.select("id", F.lit(0.0).alias("score")).limit(0)
    if dfs is None:
        dfs = term_dfs(postings, terms)
    idf_col = _case_chain(
        [(F.col("tok") == t, idf(n, df)) for t, df in sorted(dfs.items())]
    )
    tf_q = postings.filter(F.col("tok").isin(list(dfs) or list(terms)))
    c = _contrib(idf_col, F.lit(avgdl))
    return tf_q.select("id", c.alias("c")).groupBy("id").agg(
        F.round(F.sum("c"), SCORE_DECIMALS).alias("score")
    )


def bm25_scores_by_field(
    postings: DataFrame,
    doclen: DataFrame,
    terms: Sequence[str],
    stats: dict[str, tuple[int, float]] | None = None,
    dfs: dict[tuple[str, str], int] | None = None,
) -> DataFrame:
    """Per-(document, field) BM25 — postings carry ``field`` and ``dl``;
    statistics (df, N, avgdl) are per-field as in Lucene. Returns
    (id, field[, doc-value cols], fscore) with fscore UNROUNDED (combined
    + rounded by the caller so best-fields max happens before rounding).

    Doc-value columns denormalized into the postings index (e.g. the
    bizcard ``owner`` used by O28 filter context) are carried through the
    aggregation untouched."""
    by_field = stats if stats is not None else corpus_stats_by_field(doclen)
    if dfs is None:
        dfs = term_dfs_by_field(postings, terms)
    idf_col = _case_chain(
        [
            ((F.col("field") == f) & (F.col("tok") == t), idf(*_nd(by_field, f, d)))
            for (f, t), d in sorted(dfs.items())
        ]
    )
    avgdl_col = _case_chain(
        [(F.col("field") == f, avgdl) for f, (_, avgdl) in sorted(by_field.items())]
    )
    doc_values = [c for c in postings.columns if c not in ("id", "field", "dl", "tok", "tf")]
    tf_q = postings.filter(F.col("tok").isin(list(terms)))
    c = _contrib(idf_col, avgdl_col)
    return (
        tf_q.select("id", "field", *doc_values, c.alias("c"))
        .groupBy("id", "field", *doc_values)
        .agg(F.sum("c").alias("fscore"))
    )


def _nd(by_field: dict[str, tuple[int, float]], f: str, df: int) -> tuple[int, int]:
    return by_field[f][0], df
