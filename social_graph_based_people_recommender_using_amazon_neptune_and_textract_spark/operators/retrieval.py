"""Chunk-grain retrieval — the RAG serve path the chunking tier points
at: sliding-window chunks (functions/text.sliding_chunks' windows) →
deterministic hashed chunk embeddings → chunk-dedup-filtered pinned
index → top-k retrieval per query with (doc_id, chunk_idx, start_tok)
provenance.

Embedding recipe (declared, both engines): the feature-hashing trick
(Weinberger et al. 2009, public) over the frozen analyzer's tokens —
token w maps to m = md5_long(w) mod 2D; dimension m mod D gets
contribution +1 if m < D else −1, summed with multiplicity over the
chunk. Pure modular integer arithmetic on the md5-derived hash, so the
vector is bit-identical in Spark and the DuckDB twin (the same idiom as
every dedup hash in operators/dedup.py). A chunk whose vector cancels
to exactly zero is unembeddable by declaration and dropped from both
index and query sides (n2 > 0).

Index rule: one entry per DISTINCT chunk fingerprint — the canonical
location is the (min doc, min chunk_idx) occurrence, the dedup family's
keep-min rule at chunk grain (chunk_dupes' contract): embedding the
same 64-token window twice skews neighbor lists toward boilerplate.

Scale: chunking + embedding is one zero-shuffle projection (row-local
explode, 16·|piece| adds per chunk, all JVM higher-order functions);
the dedup filter is ONE window shuffle keyed by the md5 fingerprint;
the index is pinned once per corpus (build-once, every query serves
from it). Queries are a handful of rows — broadcast. The brute variant
is the exact baseline (index × queries, linear in the index like every
`ann_*` baseline); the LSH variant is the scale path: candidates come
from a (bucket) equi-join against sign-LSH buckets computed at index
time — hash-partitioned, never all-pairs, the ann_lsh design at chunk
grain."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    SLIDING_CHUNK_OVERLAP,
    SLIDING_CHUNK_TOKENS,
    chunk_windows,
)
from ..pinned import pinned
from .dedup import md5_long
from .similarity import _plane_coef, cosine, dot

CHUNK_EMB_DIM = 16
CHUNK_QUERY_DOCS = [1, 2, 3]
CHUNK_TOPK = 5
CHUNK_LSH_BITS = 8


def _hashed_embedding(piece, dim: int = CHUNK_EMB_DIM):
    """array<double> feature-hash embedding of a token array. The sign
    bit and the dimension both come from m = h mod 2D (m < 32 keeps
    every division exact — h/D in doubles would lose bits above 2^53)."""
    hs = F.transform(piece, lambda w: md5_long(w) % F.lit(2 * dim))
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.aggregate(
            hs,
            F.lit(0.0),
            lambda acc, m: acc
            + F.when(
                m % dim == j,
                F.when(m >= dim, F.lit(-1.0)).otherwise(F.lit(1.0)),
            ).otherwise(F.lit(0.0)),
        ),
    )


def _embed_chunks_arrow(chunks: DataFrame, dim: int, id_col: str) -> DataFrame:
    """The feature-hash vector at the Arrow boundary: per chunk, one
    md5 per token (hashlib — bit-identical to ``md5_long``: first 15
    hex chars of md5(utf8), positive so ``%`` agrees across engines)
    and one ``np.bincount`` histogram over the 2D residues, v = plus
    counts − minus counts. Each v[j] is Σ±1 over the chunk's tokens —
    a small exact integer, so the count form is bit-identical to
    ``_hashed_embedding``'s per-dimension fold (integer adds are
    order-free in doubles below 2^53); pinned by the
    equivalence test in tests/test_round13_ops.py.

    Why Arrow (guide §4.2): the JVM form is a higher-order-function
    fold — Catalyst evaluates lambda functions INTERPRETED, per
    element, so the D-way scatter costs D·|piece| expression-tree walks
    per chunk (measured 6.1 s for 6.9k chunks at sf0.1, ~88% of the
    chunk-index build); the histogram is one vectorized pass. Row-local
    either way — the zero-shuffle contract is unchanged."""
    import numpy as np
    import pandas as pd

    two_d = 2 * dim
    out_schema = (
        f"{id_col} long, chunk_idx int, start_tok int, n_tokens long, "
        "chunk_fp string, v array<double>"
    )

    def _embed(batches):
        import hashlib

        for pdf in batches:
            pieces = pdf["piece"]
            lens = np.fromiter(
                (len(p) for p in pieces), dtype=np.int64, count=len(pieces)
            )
            if int(lens.sum()) == 0:
                flat_m = np.empty(0, dtype=np.int64)
            else:
                # Hash each DISTINCT token once (factorize), then gather:
                # chunks overlap and corpora repeat words, so the md5
                # count is vocabulary-sized, not token-sized.
                flat = np.concatenate([np.asarray(p, dtype=object) for p in pieces])
                codes, uniq = pd.factorize(flat, sort=False)
                res = np.fromiter(
                    (
                        int(
                            hashlib.md5(t.encode("utf-8")).hexdigest()[:15],
                            16,
                        )
                        % two_d
                        for t in uniq
                    ),
                    dtype=np.int64,
                    count=len(uniq),
                )
                flat_m = res[codes]
            seg = np.repeat(np.arange(len(pieces)), lens)
            hist = np.zeros((len(pieces), two_d), dtype=np.int64)
            np.add.at(hist, (seg, flat_m), 1)
            v = (hist[:, :dim] - hist[:, dim:]).astype(np.float64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "chunk_idx": pdf["chunk_idx"],
                    "start_tok": pdf["start_tok"],
                    "n_tokens": pdf["n_tokens"],
                    "chunk_fp": pdf["chunk_fp"],
                    "v": list(v),
                }
            )

    return chunks.mapInPandas(_embed, out_schema)


def chunk_embeddings(
    df: DataFrame,
    chunk_tokens: int = SLIDING_CHUNK_TOKENS,
    overlap: int = SLIDING_CHUNK_OVERLAP,
    dim: int = CHUNK_EMB_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Every chunk occurrence with its embedding — (id, chunk_idx,
    start_tok, n_tokens, chunk_fp, v, n2), zero-vector chunks dropped.
    One zero-shuffle row-local pass over ``chunk_windows``: identity,
    fingerprint and token count stay JVM columns; the feature-hash
    vector is one Arrow histogram per chunk (``_embed_chunks_arrow`` —
    bit-identical to the JVM fold ``_hashed_embedding``, which remains
    as the cross-checked reference)."""
    w = chunk_windows(df, chunk_tokens, overlap, id_col, text_col)
    p = F.col("piece")
    chunks = w.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.size(p).cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", p).cast("binary")).alias("chunk_fp"),
        p.alias("piece"),
    )
    emb = _embed_chunks_arrow(chunks, dim, id_col).withColumn(
        "n2",
        F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x),
    )
    return emb.filter(F.col("n2") > 0)


def _chunk_bucket(vcol, n_bits: int = CHUNK_LSH_BITS, dim: int = CHUNK_EMB_DIM):
    """Single-table sign-LSH bucket over the D-dim chunk embedding —
    same closed-form hyperplanes as operators/similarity.lsh_bucket,
    evaluated identically in the oracle."""
    acc = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(
            *[F.lit(_plane_coef(b, j)) for j in range(1, dim + 1)]
        )
        acc = acc + F.when(
            dot(vcol, plane) >= 0, F.lit(1 << b)
        ).otherwise(F.lit(0)).cast("long")
    return acc


def pinned_chunk_index(
    documents: DataFrame,
    chunk_tokens: int = SLIDING_CHUNK_TOKENS,
    overlap: int = SLIDING_CHUNK_OVERLAP,
) -> DataFrame:
    """The retrieval index: canonical chunk per distinct fingerprint
    with embedding, norm and LSH bucket — pinned once per corpus
    (build-once / serve-many, the IVF codebook contract). The dedup
    filter is the single fp-keyed window; everything else is row-local."""
    (idx,) = pinned(
        (
            "chunk_index",
            documents.semanticHash(),
            int(chunk_tokens),
            int(overlap),
        ),
        lambda: (
            chunk_embeddings(documents, chunk_tokens, overlap)
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy("chunk_fp").orderBy(
                        "doc_id", "chunk_idx"
                    )
                ),
            )
            .filter(F.col("_r") == 1)
            .drop("_r")
            .withColumn("bucket", _chunk_bucket(F.col("v"))),
        ),
    )
    return idx


def _chunk_queries(documents: DataFrame, query_docs: list[int]) -> DataFrame:
    """Chunk 0 of each query document — the retrieval probe text. Reads
    the raw chunk stream (a query is its own text, dedup-independent).

    Serve-side boundary choice: the probe set is a handful of rows, so
    the embedding runs as the JVM fold (``_hashed_embedding`` — the
    bit-identical reference form the Arrow histogram is equivalence-
    tested against) instead of ``_embed_chunks_arrow``: a per-serve
    Python worker round trip costs more than folding ≤|query_docs|
    chunks in Catalyst. The chunk-0 filter runs BEFORE the embedding
    (row-local, so reordering is value-identical) — only the probe
    chunks are embedded at all. The index side keeps the Arrow
    histogram, where the corpus-sized batch amortizes the boundary."""
    w = chunk_windows(documents.filter(F.col("doc_id").isin(query_docs)))
    return (
        w.filter(F.col("chunk_idx") == 0)
        .select(
            F.col("doc_id").alias("query_doc"),
            _hashed_embedding(F.col("piece")).alias("qv"),
        )
        .withColumn(
            "qn2",
            F.aggregate(F.col("qv"), F.lit(0.0), lambda acc, x: acc + x * x),
        )
        .filter(F.col("qn2") > 0)
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_doc").orderBy(
        F.desc("cos"), F.asc("neighbor_doc"), F.asc("chunk_idx")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


def _score(cand: DataFrame) -> DataFrame:
    return cand.select(
        "query_doc",
        F.col("doc_id").alias("neighbor_doc"),
        "chunk_idx",
        "start_tok",
        "n_tokens",
        "chunk_fp",
        F.round(
            cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
        ).alias("cos"),
    )


def chunks_ann_topk(
    documents: DataFrame,
    query_docs: list[int] | None = None,
    k: int = CHUNK_TOPK,
) -> DataFrame:
    """Exact chunk retrieval baseline: top-``k`` canonical chunks per
    query by cosine, same-document chunks excluded (retrieval serves
    OTHER documents' content). Returns (query_doc, neighbor_doc,
    chunk_idx, start_tok, n_tokens, chunk_fp, cos, rank) — the
    provenance tuple a retriever needs to highlight the source span.

    Scale: linear scan of the pinned index per query batch (queries
    broadcast); the LSH variant is the sublinear path."""
    qd = CHUNK_QUERY_DOCS if query_docs is None else query_docs
    idx = pinned_chunk_index(documents)
    q = _chunk_queries(documents, qd)
    cand = idx.crossJoin(F.broadcast(q)).filter(
        F.col("doc_id") != F.col("query_doc")
    )
    return _rank_topk(_score(cand), k)


def chunks_ann_lsh(
    documents: DataFrame,
    query_docs: list[int] | None = None,
    k: int = CHUNK_TOPK,
    n_bits: int = CHUNK_LSH_BITS,
) -> DataFrame:
    """Bucket-pruned chunk retrieval — the scale path: each query probes
    its own sign-LSH bucket plus every Hamming-1 flip (the standard
    multiprobe), candidates come from a (bucket) equi-join against the
    pinned index, survivors are exactly reranked. Same output contract
    as ``chunks_ann_topk``; recall < 1 by design, deterministic, and
    mirrored exactly by the oracle.

    Scale shape: probes are (n_bits+1) rows per query (tiny,
    broadcast); the candidate fetch is hash-partitioned on bucket —
    never all-pairs; rerank cost ≈ (n_bits+1)·|index|/2^bits per
    query."""
    qd = CHUNK_QUERY_DOCS if query_docs is None else query_docs
    idx = pinned_chunk_index(documents)
    q = _chunk_queries(documents, qd).withColumn(
        "qbucket", _chunk_bucket(F.col("qv"), n_bits)
    )
    flips = F.array(
        F.col("qbucket"),
        *[
            F.col("qbucket").bitwiseXOR(F.lit(1 << b))
            for b in range(n_bits)
        ],
    )
    probes = q.select(
        "query_doc", "qv", "qn2", F.explode(flips).alias("bucket")
    )
    # No candidate dedup needed: an index entry lives in exactly ONE
    # bucket and a query's probe set (qbucket + its n_bits Hamming-1
    # flips) is distinct values, so a (query_doc, doc_id, chunk_idx)
    # triple can match at most one probe row — the former
    # dropDuplicates was a provable no-op paying a full candidate
    # shuffle (guide §2.4: a distinct on already-unique data).
    cand = idx.join(F.broadcast(probes), "bucket").filter(
        F.col("doc_id") != F.col("query_doc")
    )
    return _rank_topk(_score(cand), k)
