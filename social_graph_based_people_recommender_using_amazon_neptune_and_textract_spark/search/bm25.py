"""BM25 scoring (O27 multi_match relevance, es_search_bizcard.py:61-70).

Textbook BM25 with the ES 7.x defaults k1=1.2, b=0.75 and the Lucene idf
``ln(1 + (N - df + 0.5)/(df + 0.5))`` — a *declared deviation* from
bit-exact Lucene scores (SURVEY R2): the analyzer is frozen
(index.tokenize) and there are no coord/boost-norm factors.

Determinism contract with the DuckDB oracle: the arithmetic expression
SHAPE below is mirrored token-for-token in oracles.py so both engines
evaluate the same double-precision operation tree; final scores are
rounded to 6 decimals before ordering/comparison.

Scale: query terms filter the postings FIRST (tiny result), the df and
corpus-stats sides are broadcast, and the only post-filter shuffle is the
per-doc score aggregation; top-k lowers to TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
SCORE_DECIMALS = 6


def bm25_scores(
    postings: DataFrame, doclen: DataFrame, terms: Sequence[str]
) -> DataFrame:
    """Per-document BM25 score for the given query terms.

    Returns (id, score) for every document matching ≥1 term; ``score`` is
    rounded to SCORE_DECIMALS. Expression shape mirrored in oracles.py:

        ln(1 + (n - df + 0.5) / (df + 0.5))
          * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    """
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf_q = postings.filter(F.col("tok").isin(list(terms)))
    dfreq = tf_q.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    contrib = (
        tf_q.join(F.broadcast(dfreq), "tok")
        .join(doclen, "id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.ln(
        1 + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    c = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(1) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
    )
    return contrib.select("id", c.alias("c")).groupBy("id").agg(
        F.round(F.sum("c"), SCORE_DECIMALS).alias("score")
    )


def bm25_scores_by_field(
    postings: DataFrame, doclen: DataFrame, terms: Sequence[str]
) -> DataFrame:
    """Per-(document, field) BM25 — postings/doclen carry a ``field``
    column; statistics (df, avgdl) are per-field as in Lucene. Returns
    (id, field, fscore) with fscore UNROUNDED (combined + rounded by the
    caller so best-fields max happens before rounding)."""
    stats = doclen.groupBy("field").agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf_q = postings.filter(F.col("tok").isin(list(terms)))
    dfreq = tf_q.groupBy("field", "tok").agg(F.count(F.lit(1)).alias("df"))

    contrib = (
        tf_q.join(F.broadcast(dfreq), ["field", "tok"])
        .join(doclen, ["id", "field"])
        .join(F.broadcast(stats), "field")
    )
    idf = F.ln(
        1 + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    c = (
        idf
        * (F.col("tf") * F.lit(2.2))
        / (
            F.col("tf")
            + F.lit(1.2)
            * (F.lit(1) - F.lit(0.75) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        contrib.select("id", "field", c.alias("c"))
        .groupBy("id", "field")
        .agg(F.sum("c").alias("fscore"))
    )
