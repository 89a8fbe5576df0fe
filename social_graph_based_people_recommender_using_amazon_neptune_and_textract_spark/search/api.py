"""The search query surface (SURVEY §2.3, O26–O29c) — the Spark-native
equivalent of es_search_bizcard.py:51-106.

- O26 bool composition: scoring ``must`` (BM25) + non-scoring ``filter``
  (owner equality) — the filter excludes docs but does not change scores,
  matching ES filter-context semantics.
- O27 multi_match over (name^3, company, job_title, addr), best-fields:
  doc score = max over fields of boost * field-BM25.
- O28 term filter: owner == user.
- O29 top-k by (score desc, doc_id asc) — declared tie order (SURVEY R4).
- O29c envelope: hit struct (_index/_type/_id/_score/_source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bm25 import SCORE_DECIMALS, bm25_scores, bm25_scores_by_field
from .index import build_index, tokenize

SEARCH_FIELDS = [("name", 3.0), ("company", 1.0), ("job_title", 1.0), ("addr", 1.0)]


def _melt_fields(bizcards: DataFrame) -> DataFrame:
    """(doc_id, field, text) rows — one per searchable field."""
    pairs = ", ".join(f"'{f}', {f}" for f, _ in SEARCH_FIELDS)
    return bizcards.select(
        F.col("doc_id").alias("id"),
        F.expr(f"stack({len(SEARCH_FIELDS)}, {pairs}) as (field, text)"),
    )


def search_documents(documents: DataFrame, query: str, limit: int = 10) -> DataFrame:
    """Single-field BM25 top-k over the documents corpus.
    Returns (doc_id, score)."""
    terms = [t for t in _terms(query)]
    # The inverted index is THE materialized auxiliary structure (SURVEY
    # §3.2): persist the full postings/lengths once; each query is then a
    # term-filter + small aggregation over the cached index, exactly the
    # ES/Lucene serving shape. (Trade-off: the first build cannot push the
    # term filter into the explode — that is the point of an index.)
    postings, doclen = build_index(documents, "doc_id", "text")
    postings, doclen = postings.persist(), doclen.persist()
    scored = bm25_scores(postings, doclen, terms)
    return (
        scored.select(F.col("id").alias("doc_id"), "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
    )


def search_bizcards(
    bizcards: DataFrame, query: str | None, user: str | None = None, limit: int = 10
) -> DataFrame:
    """O26/O27/O28/O29: boosted multi-field search over alive bizcards.
    Returns (doc_id, owner, name, score).

    With no query keywords (the reference's ``{user}``-only case,
    es_search_bizcard.py:71-73 — the bool query carries only the filter
    clause), every matching doc is in ES *filter context* and scores 0.0;
    ranking degenerates to the declared doc_id tie order.
    """
    # alive feeds the melt AND the final hydration join — persist so the
    # (possibly expensive) upstream bizcards derivation runs once.
    alive = bizcards.filter(F.col("is_alive") == 1).persist()
    terms = [t for t in _terms(query)] if query else []

    if not terms:
        hits = alive.select(
            "doc_id", "owner", "name", F.lit(0.0).alias("score")
        )
        if user:
            hits = hits.filter(F.col("owner") == user)  # O28 filter context
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)

    melted = _melt_fields(alive)
    toks = melted.select(
        "id", "field", tokenize(F.col("text")).alias("tokens")
    )
    # Materialized per-field inverted index (see search_documents note).
    doclen = toks.select("id", "field", F.size("tokens").alias("dl")).persist()
    postings = (
        toks.select("id", "field", F.explode("tokens").alias("tok"))
        .groupBy("id", "field", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    fscores = bm25_scores_by_field(postings, doclen, terms)

    boost = F.when(F.col("field") == "name", F.lit(3.0)).otherwise(F.lit(1.0))
    scored = (
        fscores.select("id", (boost * F.col("fscore")).alias("boosted"))
        .groupBy("id")
        .agg(F.round(F.max("boosted"), SCORE_DECIMALS).alias("score"))
    )

    hydrated = scored.join(
        alive.select("doc_id", "owner", "name"), scored["id"] == F.col("doc_id")
    )
    if user:
        hydrated = hydrated.filter(F.col("owner") == user)  # O28 filter context
    return (
        hydrated.select("doc_id", "owner", "name", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
    )


def search_envelope(hits: DataFrame, index: str = "octember_bizcard", typ: str = "bizcard") -> DataFrame:
    """O29c: wrap ranked hits in the ES hit envelope
    (README.md:76-102 — _index/_type/_id/_score/_source)."""
    source_cols = [c for c in hits.columns if c not in ("score",)]
    return hits.select(
        F.lit(index).alias("_index"),
        F.lit(typ).alias("_type"),
        F.col("doc_id").alias("_id"),
        F.col("score").alias("_score"),
        F.struct(*source_cols).alias("_source"),
    )


def _terms(query: str) -> list[str]:
    import re

    return [t for t in re.split("[^a-z0-9]+", query.lower()) if t]
