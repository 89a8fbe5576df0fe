"""Round-12 operators: sliding-window RAG chunking (re-land of the r11
revert under a distinct name), Kneser-Ney trigram LM, kNN-graph
NN-Descent refinement, unified AV training manifest, streaming AV
dedup."""
import hashlib
import re

import pytest

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    plans as PL,
)

SF_001 = "/root/testdata/sf0.001"


# --- sliding-window chunking ------------------------------------------------

def _pytokens(txt):
    return [w for w in re.split("[^a-z0-9]+", txt.lower()) if w]


def test_sliding_chunks_coverage_overlap_and_provenance(spark):
    """Chunks tile the token array: chunk k starts at k·(C−O), every
    token is covered, consecutive chunks share exactly O tokens (except
    the partial tail), no chunk starts past the end, sub-chunk docs
    yield one chunk, empty docs none; start_tok is the 0-based token
    offset — verified against a direct Python reference."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        sliding_chunks,
    )

    texts = {
        1: " ".join(f"w{i}" for i in range(200)),   # multiple chunks
        2: "short doc",                              # one partial chunk
        3: "",                                       # no chunks
        4: " ".join(f"x{i}" for i in range(64)),     # exactly one chunk
        5: " ".join(f"y{i}" for i in range(65)),     # chunk + 17-token tail
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_tok"], r["n_tokens"], r["chunk_fp"]
        )
        for r in sliding_chunks(docs, 64, 16).collect()
    }
    want = {}
    for did, txt in texts.items():
        toks = _pytokens(txt)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= 64 else 1 + -(-(n - 64) // 48)
        for k in range(n_chunks):
            piece = toks[k * 48: k * 48 + 64]
            want[(did, k)] = (
                k * 48,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
    assert got == want
    assert (3, 0) not in got
    assert got[(5, 1)] == (
        48, 17, got[(5, 1)][2]
    )  # 65 tokens -> tail chunk of 65-48 at offset 48
    # every token covered: last chunk's start+len == n for doc 1
    last = max(k for d, k in got if d == 1)
    assert got[(1, last)][0] + got[(1, last)][1] == 200


def test_sliding_chunks_zero_shuffle_plan(spark):
    """Chunking is embarrassingly parallel: tokenize + sequence +
    row-local explode — ZERO Exchange operators in the physical plan."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        sliding_chunks,
    )

    docs = spark.read.parquet(f"{SF_001}/documents.parquet")
    df = sliding_chunks(docs)
    assert PL.exchange_count(df) == 0, PL.physical_plan(df)


def test_chunking_symbols_distinct_and_both_work(spark):
    """Collision regression for the r11 shadowing revert: BOTH chunkers
    are importable as distinct callables from the same module, and the
    same 65-token document exercises their DIFFERENT contracts —
    chunk_documents (width 50 / stride 40) emits a window at every
    stride start (2 chunks: 50@0, 25@40); sliding_chunks (64/16) never
    starts past the end (2 chunks: 64@0, 17@48)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        chunk_documents,
        sliding_chunks,
    )

    assert chunk_documents is not sliding_chunks
    assert chunk_documents.__name__ == "chunk_documents"
    assert sliding_chunks.__name__ == "sliding_chunks"

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(65)))],
        "doc_id long, text string",
    )
    legacy = {
        r["chunk_idx"]: r["n_chunk_tokens"]
        for r in chunk_documents(docs).collect()
    }
    sliding = {
        r["chunk_idx"]: (r["start_tok"], r["n_tokens"])
        for r in sliding_chunks(docs).collect()
    }
    assert legacy == {0: 50, 1: 25}
    assert sliding == {0: (0, 64), 1: (48, 17)}
