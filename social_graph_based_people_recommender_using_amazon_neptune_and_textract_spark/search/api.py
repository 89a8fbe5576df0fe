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

from ..pinned import effective_key, memo, pinned
from .bm25 import (
    SCORE_DECIMALS,
    bm25_scores,
    bm25_scores_by_field,
    corpus_stats,
    corpus_stats_by_field,
    vocab_dfs,
    vocab_dfs_by_field,
)
from .index import build_index, tokenize

SEARCH_FIELDS = [("name", 3.0), ("company", 1.0), ("job_title", 1.0), ("addr", 1.0)]

def _memo_stats(doclen: DataFrame, by_field: bool, parent=None):
    """Per-corpus index statistics (N, avgdl) — Lucene's
    CollectionStatistics, computed once per corpus instead of
    re-aggregated per query. Cached through the pinned registry's scalar
    memo; ``parent`` is the index's effective pinned key, so releasing
    that index (or pinning a new snapshot under a different ``token``)
    serves fresh stats — the memo key embeds the parent, never just the
    doclen plan hash (two snapshots of one path share the plan hash)."""
    return memo(
        ("bm25_stats", by_field, parent if parent is not None else doclen.semanticHash()),
        lambda: corpus_stats_by_field(doclen) if by_field else corpus_stats(doclen),
        parent=parent,
    )


def _memo_dfs(vocab: DataFrame, terms, by_field: bool, parent=None):
    """Per-(index, term set) document frequencies — Lucene's
    TermStatistics, memoized on the index pin's lifecycle exactly like
    ``_memo_stats``: the vocabulary point-lookup collect runs once per
    (index, query terms), not once per search call."""
    return memo(
        (
            "vocab_dfs",
            by_field,
            parent if parent is not None else vocab.semanticHash(),
            tuple(terms),
        ),
        lambda: (
            vocab_dfs_by_field(vocab, terms)
            if by_field
            else vocab_dfs(vocab, terms)
        ),
        parent=parent,
    )


def _melt_fields(bizcards: DataFrame) -> DataFrame:
    """(id, owner, field, text) rows — one per searchable field; ``owner``
    rides along as a doc value (it feeds O28 filter context)."""
    pairs = ", ".join(f"'{f}', {f}" for f, _ in SEARCH_FIELDS)
    return bizcards.select(
        F.col("doc_id").alias("id"),
        "owner",
        F.expr(f"stack({len(SEARCH_FIELDS)}, {pairs}) as (field, text)"),
    )


def documents_index(
    documents: DataFrame, token=None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doclen, vocab) for the documents corpus — the materialized
    auxiliary structure (SURVEY §3.2), built + persisted ONCE per corpus
    via the pinned-relation registry and reused by every subsequent query
    (the ES/Lucene index/query split, upsert_bizcard_to_es.py:77-90 vs
    es_search_bizcard.py:59-84). ``pinned.release``/``release_all`` is the
    explicit DROP INDEX for long-lived sessions; ``token`` is the
    caller's corpus snapshot version — pass a new token after replacing
    the corpus files in place and a fresh index builds without any
    release procedure (pinned.py module docs)."""
    return pinned(
        ("doc_index", documents.semanticHash()),
        lambda: build_index(documents, "doc_id", "text"),
        token=token,
    )


def bizcard_index(
    bizcards: DataFrame, token=None
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(alive, postings, doclen, vocab) — the per-field bizcard index,
    pinned once per corpus (keys embed ``semanticHash``; ``token``
    versions in-place corpus swaps, see ``documents_index``). ``alive``
    is pinned too: it feeds the melt AND the final hydration join;
    ``vocab`` is the per-field term dictionary (field, tok, df) so query
    term stats are a point lookup, not a postings scan."""

    def _build():
        alive = bizcards.filter(F.col("is_alive") == 1)
        return (alive, *build_bizcard_postings(alive))

    return pinned(("bizcard_index", bizcards.semanticHash()), _build, token=token)


def build_bizcard_postings(
    alive: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(postings, doclen, vocab) derived from an alive-bizcards relation —
    the per-field index structure shared by the pinned whole-corpus index
    (``bizcard_index``) and the incremental per-batch maintainer
    (search/incremental.py): both produce identical rows for identical
    documents, which is what makes segment replacement sound."""
    toks = _melt_fields(alive).select(
        "id", "owner", "field", tokenize(F.col("text")).alias("tokens")
    )
    doclen = toks.select("id", "field", F.size("tokens").alias("dl"))
    postings = (
        toks.select(
            "id",
            "owner",
            "field",
            F.size("tokens").alias("dl"),
            F.explode("tokens").alias("tok"),
        )
        .groupBy("id", "owner", "field", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = postings.groupBy("field", "tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    return postings, doclen, vocab


def search_documents(
    documents: DataFrame,
    query: str,
    limit: int = 10,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    token=None,
) -> DataFrame:
    """Single-field BM25 top-k over the documents corpus.
    Returns (doc_id, score). Index built once per corpus (pinned);
    each query is a term-filter + small aggregation over it.

    Serving shape: pass ``index=documents_index(corpus)`` (built once,
    queried many times — the ES index/query split) and the query never
    touches the corpus relation at all. ``token`` versions in-place
    corpus swaps (see ``documents_index``)."""
    terms = [t for t in _terms(query)]
    if index is not None:
        postings, doclen, vocab = index
        parent = None
    else:
        postings, doclen, vocab = documents_index(documents, token=token)
        parent = effective_key(("doc_index", documents.semanticHash()), token)
    scored = bm25_scores(
        postings, doclen, terms,
        stats=_memo_stats(doclen, False, parent),
        dfs=_memo_dfs(vocab, terms, False, parent),
    )
    return (
        scored.select(F.col("id").alias("doc_id"), "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
    )


def search_bizcards(
    bizcards: DataFrame,
    query: str | None,
    user: str | None = None,
    limit: int = 10,
    index: tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None = None,
    token=None,
) -> DataFrame:
    """O26/O27/O28/O29: boosted multi-field search over alive bizcards.
    Returns (doc_id, owner, name, score).

    With no query keywords (the reference's ``{user}``-only case,
    es_search_bizcard.py:71-73 — the bool query carries only the filter
    clause), every matching doc is in ES *filter context* and scores 0.0;
    ranking degenerates to the declared doc_id tie order.

    Serving shape: pass ``index=bizcard_index(corpus)`` (the prebuilt
    (alive, postings, doclen) triple) and repeated queries share one
    index build — es_search_bizcard.py queries an index that
    upsert_bizcard_to_es.py built, it never re-indexes per request.
    """
    if index is not None:
        alive, postings, doclen, vocab = index
        parent = None
    else:
        alive, postings, doclen, vocab = bizcard_index(bizcards, token=token)
        parent = effective_key(("bizcard_index", bizcards.semanticHash()), token)
    terms = [t for t in _terms(query)] if query else []

    if not terms:
        hits = alive.select(
            "doc_id", "owner", "name", F.lit(0.0).alias("score")
        )
        if user:
            hits = hits.filter(F.col("owner") == user)  # O28 filter context
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(limit)

    fscores = bm25_scores_by_field(
        postings, doclen, terms,
        stats=_memo_stats(doclen, True, parent),
        dfs=_memo_dfs(vocab, terms, True, parent),
    )

    boost = F.when(F.col("field") == "name", F.lit(3.0)).otherwise(F.lit(1.0))
    scored = (
        fscores.select("id", "owner", (boost * F.col("fscore")).alias("boosted"))
        .groupBy("id", "owner")
        .agg(F.round(F.max("boosted"), SCORE_DECIMALS).alias("score"))
    )
    if user:
        # O28 filter context BEFORE ranking — owner is a doc value carried
        # in the postings index, so the filter needs no join at all.
        scored = scored.filter(F.col("owner") == user)
    topk = scored.orderBy(F.desc("score"), F.asc("id")).limit(limit)
    # Hydrate AFTER the limit (ES fetches _source only for the ranked
    # page): the join touches ≤ limit rows, AQE broadcasts it for free.
    return (
        topk.join(alive.select("doc_id", "name"), topk["id"] == F.col("doc_id"))
        .select("doc_id", "owner", "name", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def search_or_404(
    bizcards: DataFrame, query: str | None, user: str | None = None, limit: int = 10
) -> DataFrame:
    """O29b (es_search_bizcard.py:75): ``assert query_keywords or
    user_name`` — a request with neither parameter takes the except path
    and serves the empty result. DataFrame form: the empty relation with
    the standard hit schema (no job runs — Catalyst folds an empty
    LocalRelation)."""
    if not query and not user:
        spark = bizcards.sparkSession
        return spark.createDataFrame(
            [], "doc_id string, owner string, name string, score double"
        )
    return search_bizcards(bizcards, query, user=user, limit=limit)


def search_response(
    bizcards: DataFrame, query: str | None = None, user: str | None = None,
    limit: int = 10,
) -> dict:
    """The full lambda_handler response contract
    (es_search_bizcard.py:51-106): ``{statusCode, body, isBase64Encoded}``
    with body = JSON hit list. Neither query nor user → the assert fires
    → 404 with body '[]' (:98-106). This is the app/serving boundary —
    the one place a driver-side collect is the design, mirroring the
    Lambda that serialized ES hits into an HTTP body."""
    import json

    if not query and not user:
        return {"statusCode": 404, "body": "[]", "isBase64Encoded": False}
    hits = search_bizcards(bizcards, query, user=user, limit=limit)
    rows = [json.loads(r) for r in search_envelope(hits).toJSON().collect()]
    return {
        "statusCode": 200,
        "body": json.dumps(rows),
        "isBase64Encoded": False,
    }


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
