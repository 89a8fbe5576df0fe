"""Inverted-index construction (the auxiliary structure behind O27).

The reference delegates indexing to Elasticsearch (upsert_bizcard_to_es.py
:77-90); here the index is a postings DataFrame built with a frozen,
documented analyzer (SURVEY R2): ``lower`` + split on ``[^a-z0-9]+`` +
drop empties. All higher-order-function work (split/filter/explode) is
JVM-side, no Python UDFs.

Scale: tokenize+explode is a narrow flatMap; the tf aggregation shuffles
once on (id, token) with map-side combine; document-frequency aggregates
shuffle on token (stopword skew → AQE skew handling). At warehouse scale
the postings table is materialized to parquet bucketed by token so
query-time term lookups avoid a full shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(col: Column) -> Column:
    """Frozen analyzer: lowercase, split on non-alphanumeric, drop ''."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")


def build_index(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (postings, doclen, vocab):
    postings: (id, dl, tok, tf) — term frequency per document, with the
              document's token count denormalized alongside (Lucene keeps
              length norms IN the index; scoring then needs no doclen
              join — the postings scan alone carries everything);
    doclen:   (id, dl)          — token count per document (feeds the
              one-time corpus statistics (N, avgdl) fetch);
    vocab:    (tok, df)         — the term dictionary: document frequency
              per token, built AT INDEX TIME exactly as Lucene keeps term
              statistics in the segment dictionary. Per-query term stats
              are then a point lookup over this vocabulary-sized relation
              instead of a full postings scan (the round-4 bench showed
              the per-query df scan dominating warm search latency).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), tokenize(F.col(text_col)).alias("tokens")
    )
    doclen = toks.select("id", F.size("tokens").alias("dl"))
    postings = (
        toks.select("id", F.size("tokens").alias("dl"), F.explode("tokens").alias("tok"))
        .groupBy("id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return postings, doclen, vocab
