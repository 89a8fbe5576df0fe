"""Round-9 operators: BPE inference encode (apply a fitted merge table
to unseen text, batch + streaming) and the materialized stripped
corpus (write_clean_corpus)."""

from __future__ import annotations

import collections
import re

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    fsutil,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    text as T,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    dedup as D,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# --- brute-force reference: fit merges, then encode ANY word ---------------


def _ref_fit(texts, k):
    freq = collections.Counter()
    for t in texts:
        for w in [x for x in re.split("[^a-z0-9]+", t.lower()) if x]:
            freq[w] += 1
    words = {w: list(w) for w in freq}
    merges = []
    for _ in range(k):
        cnt = collections.Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                cnt[(a, b)] += freq[w]
        if not cnt:
            break
        best = min(cnt, key=lambda p: (-cnt[p], p))
        merges.append(best)
        for w in words:
            words[w] = _ref_apply_one(words[w], best)
    return merges


def _ref_apply_one(syms, pair):
    out = []
    for s in syms:
        if out and out[-1] == pair[0] and s == pair[1]:
            out[-1] = pair[0] + pair[1]
        else:
            out.append(s)
    return out


def _ref_encode_count(text, merges):
    n = 0
    for w in [x for x in re.split("[^a-z0-9]+", text.lower()) if x]:
        syms = list(w)
        for pair in merges:
            syms = _ref_apply_one(syms, pair)
        n += len(syms)
    return n


TRAIN = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that cat is the best cat",
    "mats and cats and rats",
]
# held-out: overlapping words, UNSEEN words (zebra, catapult), empty doc
HELDOUT = [
    "the zebra sat on a catapult",
    "cats rats bats",
    "",
    "thematic catalog",
]


def test_bpe_encode_matches_brute_force_on_unseen_words(spark):
    merges = _ref_fit(TRAIN, 5)
    got = {
        r["doc_id"]: r["n_subwords"]
        for r in T.bpe_encode_tokens_per_doc(
            _docs(spark, TRAIN), _docs(spark, HELDOUT), 5
        ).collect()
    }
    want = {
        i: _ref_encode_count(t, merges)
        for i, t in enumerate(HELDOUT)
        if _ref_encode_count(t, merges) > 0
    }
    assert got == want


def test_bpe_encode_on_training_corpus_reproduces_vocabulary_path(spark):
    """Applying the fitted merges to raw characters must reproduce the
    training segmentation (the Sennrich inference contract) — so on
    the training corpus itself the merge-replay path and the
    vocabulary-lookup path (bpe_tokens_per_doc) agree exactly."""
    docs = _docs(spark, TRAIN)
    via_vocab = {
        r["doc_id"]: r["n_subwords"]
        for r in T.bpe_tokens_per_doc(docs, 5).collect()
    }
    via_merges = {
        r["doc_id"]: r["n_subwords"]
        for r in T.bpe_encode_tokens_per_doc(docs, docs, 5).collect()
    }
    assert via_merges == via_vocab


def test_streaming_bpe_encode_equals_batch(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.rollup import (
        StreamingBpeEncode,
    )

    train = _docs(spark, TRAIN)
    held = _docs(spark, HELDOUT)
    merges = T.fitted_bpe_merges(train, 5)
    held.repartition(2).write.mode("overwrite").parquet(
        str(tmp_path / "landing")
    )
    enc = StreamingBpeEncode(spark, str(tmp_path / "wh"), merges)
    enc.run_available_now(
        str(tmp_path / "landing"),
        str(tmp_path / "ckpt"),
        "doc_id long, text string",
        max_files_per_trigger=1,
    )
    got = {
        r["doc_id"]: r["n_subwords"]
        for r in enc.table()
        .select("doc_id", F.col("value_sum").cast("long").alias("n_subwords"))
        .collect()
    }
    want = {
        r["doc_id"]: r["n_subwords"]
        for r in T.bpe_encode_tokens_per_doc(train, held, 5).collect()
    }
    assert got == want


# --- materialized stripped corpus ------------------------------------------


def test_write_clean_corpus_matches_fingerprints(spark, tmp_path):
    texts = [
        "A" * 40 + "unique tail one",
        "A" * 40 + "different tail x",
        "wholly original document body here",
    ]
    docs = _docs(spark, texts)
    out = str(tmp_path / "clean")
    clean = D.write_clean_corpus(docs, out, min_len=20)
    # the written text's md5 equals the fingerprint relation's clean_fp
    got = {
        r["doc_id"]: r["fp"]
        for r in clean.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
        ).collect()
    }
    want = {
        r["doc_id"]: r["clean_fp"]
        for r in D.strip_duplicated_spans(docs, min_len=20).collect()
    }
    assert got == want
    # n_removed rides along and matches too
    got_rm = {r["doc_id"]: r["n_removed"] for r in clean.collect()}
    want_rm = {
        r["doc_id"]: r["n_removed"]
        for r in D.strip_duplicated_spans(docs, min_len=20).collect()
    }
    assert got_rm == want_rm


def test_write_clean_corpus_swap_is_crash_safe(spark, tmp_path):
    """Overwriting an existing clean table goes through the swap
    protocol: a reader racing a crashed second write still finds a
    complete table (the old one)."""
    docs = _docs(spark, ["some text body", "other text body"])
    out = str(tmp_path / "clean")
    D.write_clean_corpus(docs, out, min_len=10)
    before = sorted(
        r["doc_id"] for r in spark.read.parquet(out).collect()
    )
    # simulate a crashed rewrite: half-written temp, live intact
    tmp, _ = fsutil.swap_siblings(out)
    fsutil.mkdirs(spark, f"{tmp}/_temporary/0")
    assert fsutil.recover_swap(spark, out) is False
    assert (
        sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
        == before
    )


def test_bounded_components_twin_matches_oracle():
    """bench.py's iterative temp-table components twin (timed at sf1
    where the recursive-CTE oracle cannot finish) must be result-
    identical to the declarative oracle the driver checks — the bench
    override swaps the PLAN, never the semantics."""
    import sys

    import duckdb

    sys.path.insert(0, "/root/repo")
    import bench
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        oracles,
    )

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')"
        )
        want = sorted(
            con.execute(oracles.ORACLES["graph_components"]).fetchall()
        )
        got = sorted(bench._duckdb_components(con))
        assert got == want, sf


def test_pinned_graph_serving_identical_and_rebuildable(spark):
    """r9 pinned serving for the iterative graph analytics: the pinned
    form must return exactly the live computation's rows, survive a
    release (rebuild on next serve), and register/free its backing
    checkpoints through the pin lifecycle."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank_topk,
        pinned_pagerank_topk,
        pinned_pymk_ppr,
        pymk_ppr,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        user_graph_edges,
    )

    e = user_graph_edges(spark, "/root/testdata/sf0.001")
    live = sorted(map(tuple, pagerank_topk(e, 20).collect()))
    served = sorted(map(tuple, pinned_pagerank_topk(e, 20).collect()))
    assert served == live
    live_ppr = sorted(map(tuple, pymk_ppr(e, 3, 10).collect()))
    served_ppr = sorted(map(tuple, pinned_pymk_ppr(e, 3, 10).collect()))
    assert served_ppr == live_ppr
    # release = the cache TTL; the next serve rebuilds identically
    PIN.release_all()
    CKPT.release_all(spark)
    assert sorted(map(tuple, pinned_pagerank_topk(e, 20).collect())) == live
    PIN.release_all()
    CKPT.release_all(spark)


def test_bpe_encode_degenerate_inputs(spark):
    """Empty training corpus → zero merges → every held-out word
    segments to characters; empty held-out corpus → empty result;
    token-free held-out docs emit no rows (the tokens_per_doc
    contract)."""
    empty = _docs(spark, [])
    held = _docs(spark, ["ab cd", "!!!", ""])
    out = {
        r["doc_id"]: r["n_subwords"]
        for r in T.bpe_encode_tokens_per_doc(empty, held, 5).collect()
    }
    assert out == {0: 4}  # a,b,c,d — chars; '!!!' and '' tokenize empty
    assert T.bpe_encode_tokens_per_doc(
        _docs(spark, TRAIN), empty, 5
    ).count() == 0
    assert T.fitted_bpe_merges(empty, 5) == []


def test_write_clean_corpus_empty_and_unicode(spark, tmp_path):
    """Empty corpus → empty (but readable) table; multibyte text round-
    trips through the char-positioned span fold unchanged when nothing
    is duplicated."""
    empty = _docs(spark, [])
    out = str(tmp_path / "c1")
    assert D.write_clean_corpus(empty, out, min_len=10).count() == 0
    uni = _docs(spark, ["héllo wörld ünïcode ß∂ƒ", "短い文書です"])
    out2 = str(tmp_path / "c2")
    back = {
        r["doc_id"]: r["text"]
        for r in D.write_clean_corpus(uni, out2, min_len=10).collect()
    }
    assert back == {0: "héllo wörld ünïcode ß∂ƒ", 1: "短い文書です"}


def test_ppr_cache_lru_bounds_pinned_sources(spark, monkeypatch):
    """pinned_pymk_ppr's per-source pins are LRU-bounded: with the cap
    forced to 2, pinning a third source must release the coldest one
    (recompute-on-next-request, never a correctness event)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph import (
        rank as R,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        user_graph_edges,
    )

    PIN.release_all()
    CKPT.release_all(spark)
    monkeypatch.setattr(R, "PPR_CACHE_CAP", 2)
    monkeypatch.setattr(R, "_PPR_LRU", None)
    e = user_graph_edges(spark, "/root/testdata/sf0.001")
    h = e.semanticHash()

    def key(src):
        return PIN.effective_key(("ppr", h, str(src), 3, 0.85))

    first = sorted(map(tuple, R.pinned_pymk_ppr(e, 3, 5, 3, 0.85).collect()))
    R.pinned_pymk_ppr(e, 5, 5, 3, 0.85).collect()
    assert key(3) in PIN.pinned_keys() and key(5) in PIN.pinned_keys()
    R.pinned_pymk_ppr(e, 7, 5, 3, 0.85).collect()  # evicts source 3
    assert key(3) not in PIN.pinned_keys()
    assert key(5) in PIN.pinned_keys() and key(7) in PIN.pinned_keys()
    # the evicted source recomputes identically on its next request
    assert (
        sorted(map(tuple, R.pinned_pymk_ppr(e, 3, 5, 3, 0.85).collect()))
        == first
    )
    PIN.release_all()
    CKPT.release_all(spark)


def test_neardup_contamination_finds_cross_split_leaks_only(spark):
    """A test document that near-duplicates a train document must
    surface; near-dup pairs WITHIN one split must not (they are a dedup
    concern, not leakage); unrelated documents never pair."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.contamination import (
        neardup_contamination,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest tonight"
    )
    rows = [
        (1, base, "train"),
        (2, base + " extra tail", "test"),       # cross-split leak
        (3, base + " extra tail", "train"),      # within-train dup of 2's text
        (4, "completely different content about spark physical plans "
            "and shuffle exchanges in a distributed engine", "test"),
        (5, base + " extra tail", "test"),       # within-test dup
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, split string"
    )
    got = {
        (r["train_doc_id"], r["test_doc_id"])
        for r in neardup_contamination(docs, threshold=0.5).collect()
    }
    # every (train, test) near-dup pair, nothing within-split, no doc 4
    assert got == {(1, 2), (3, 2), (1, 5), (3, 5)}
