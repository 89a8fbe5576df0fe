"""Degenerate-input sweep (SURVEY §5 edge cases): every text/dedup/
similarity operator must survive — with sane outputs, not just no
crash — empty strings, documents shorter than the shingle width,
exact-duplicate rows, and non-ASCII text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
    text as T,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    dedup as D,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search import (
    api as S,
)


@pytest.fixture(scope="module")
def weird(spark):
    rows = [
        (1, ""),                          # empty
        (2, "   \t  \n "),                # whitespace only
        (3, "ab"),                        # shorter than shingle width
        (4, "one two"),                   # 2 tokens < 3-shingle
        (5, "café über naïve 北京 東京"),   # non-ASCII
        (6, "dup dup dup identical row"),
        (7, "dup dup dup identical row"),  # exact duplicate of 6
        (8, "!!! ??? ... ---"),           # punctuation only
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_text_functions_survive(spark, weird):
    lang = {r["doc_id"]: r["predicted_lang"] for r in T.language_id(weird).collect()}
    assert set(lang) == set(range(1, 9))
    assert lang[1] == "und" and lang[8] == "und"

    q = {r["doc_id"]: r for r in T.quality_scores(weird).collect()}
    assert q[1]["n_tokens"] == 0 and q[1]["quality_score"] == 0.0
    assert q[2]["n_tokens"] == 0
    assert all(r["stopword_ratio"] >= 0.0 for r in q.values())

    tc = {r["doc_id"]: r for r in T.token_counts(weird).collect()}
    assert tc[1]["n_tokens"] == 0 and tc[8]["n_tokens"] == 0

    fp = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(weird).collect()}
    assert fp[6] == fp[7]          # identical content → identical identity
    assert fp[1] == fp[2] == fp[8]  # all tokenize to the empty bag


def test_dedup_family_survives(spark, weird):
    groups = {
        r["text_hash"]: r["n_docs"] for r in D.dedup_exact(weird).collect()
    }
    assert 2 in groups.values()  # the planted exact pair groups

    # shingle table: short/empty docs simply contribute no shingles
    sh = D.shingle_table(weird)
    docs_with_shingles = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert {1, 2, 3, 4, 8}.isdisjoint(docs_with_shingles)

    pairs = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.dedup_ngram_pairs(weird, threshold=0.3).collect()
    }
    assert (6, 7, 1.0) in pairs
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_minhash_lsh(weird, threshold=0.5).collect()
    }
    assert (6, 7) in lsh

    sim = {r["doc_id"]: r["simhash"] for r in D.simhash(weird).collect()}
    # docs with no tokens produce no tf rows → absent, not crashed
    assert 6 in sim and 7 in sim and sim[6] == sim[7]


def test_search_survives_empty_and_unicode(spark, weird):
    hits = S.search_documents(weird, "dup identical", limit=10).collect()
    assert {r["doc_id"] for r in hits} == {6, 7}
    # query of only non-indexed chars → no terms survive the analyzer
    none = S.search_documents(weird, "!!! ???", limit=10)
    assert none.count() == 0
    # unicode query must not crash; latin tokens can match doc 5
    uni = S.search_documents(weird, "café 北京", limit=10).collect()
    assert all(r["doc_id"] == 5 for r in uni)


def test_search_empty_corpus_serves_zero_hits(spark):
    """A non-empty query against an EMPTY corpus must serve zero hits —
    the reference's error path serves '[]' (es_search_bizcard.py:98-106),
    so the engine degrades to an empty result, not a float(None) crash
    (VERDICT r3 item 2)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    hits = S.search_documents(empty, "anything at all", limit=10)
    assert hits.count() == 0
    assert hits.columns == ["doc_id", "score"]

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.bm25 import (
        corpus_stats,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.index import (
        build_index,
    )

    _, doclen, _ = build_index(empty, "doc_id", "text")
    assert corpus_stats(doclen) == (0, 0.0)


def test_search_bizcards_empty_corpus(spark):
    """Multi-field search over an empty (or all-dead) bizcard corpus —
    zero hits with the standard hit schema, and the response envelope
    serves statusCode 200 with body '[]'."""
    cols = (
        "doc_id string, owner string, name string, email string, "
        "phone_number string, company string, job_title string, addr string, "
        "is_alive int"
    )
    empty = spark.createDataFrame([], cols)
    hits = S.search_bizcards(empty, "anything", limit=10)
    assert hits.count() == 0
    resp = S.search_response(empty, "anything")
    assert resp == {"statusCode": 200, "body": "[]", "isBase64Encoded": False}


def test_bpe_train_survives_degenerate_corpus(spark, weird):
    """BPE on the weird corpus: empty/whitespace/punct docs contribute
    no words; single-char tokens can't pair past full merge; non-ASCII
    words segment and merge like any other (the analyzer drops them —
    tokenizer splits on [^a-z0-9]+ — so only latin words train)."""
    out = T.bpe_train(weird, 8).collect()
    # merges exist (dup/identical/row/one/two/ab repeat chars)
    assert len(out) >= 1
    steps = [r["step"] for r in out]
    assert steps == list(range(1, len(out) + 1))
    # every merge's count is positive and merged = x || y
    for r in out:
        assert r["cnt"] >= 1 and r["merged"] == r["x"] + r["y"]


def test_bpe_train_all_empty_corpus_returns_zero_merges(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   ")], ["doc_id", "text"]
    )
    assert T.bpe_train(docs, 4).count() == 0


def test_bpe_subword_counts_weighted_by_frequency(spark, weird):
    """Total subword mass equals total corpus character mass of the
    trained words — merging never creates or destroys characters."""
    out = T.bpe_subword_counts(weird, 3, top=1000).collect()
    total_chars = sum(len(r["subword"]) * r["cnt"] for r in out)
    toks = weird.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("w")
    ).collect()
    assert total_chars == sum(len(r["w"]) for r in toks)


def test_dsir_no_target_docs_still_scores(spark, weird):
    """Empty target subset: smoothing keeps every log defined; scores
    are uniform-ish but finite."""
    w = T.dsir_weights(weird, F.lit(False)).collect()
    assert all(r["logratio"] is not None for r in w)


def test_source_mixture_single_source_is_unit_weight(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sampling import (
        source_mixture_weights,
    )

    docs = spark.createDataFrame(
        [(1, "a b c", "only"), (2, "d e", "only")],
        ["doc_id", "text", "source"],
    )
    rows = source_mixture_weights(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["p_natural"] == 1.0 and r["p_alpha"] == 1.0 and r["boost"] == 1.0


def test_bpe_pretoken_count_units(spark):
    """The GPT-2-style pre-tokenizer count exceeds the whitespace count
    on punctuation-attached text and agrees with hand counts."""
    docs = spark.createDataFrame(
        [(1, "Hello, world! It's 2024... really?"), (2, ""), (3, "naïve café 北京")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in T.token_counts(docs).collect()}
    assert got[1]["n_bpe_pretokens"] == 11  # hello , world ! it ' s 2024 ... really ?
    assert got[1]["n_bpe_pretokens"] > got[1]["n_ws_tokens"]
    assert got[2]["n_bpe_pretokens"] == 0
    assert got[3]["n_bpe_pretokens"] == 6  # na ï ve caf é 北京


def test_boilerplate_family_survives_weird_and_empty(spark, weird):
    """Boilerplate ops on degenerate text (empty / whitespace / short /
    unicode / punctuation-only / exact dups) and on an EMPTY corpus:
    every doc keeps a strip row, empty corpus yields empty relations."""
    w = weird.withColumn("source", F.lit("s"))
    grams = {(r["source"], r["gram"]) for r in D.boilerplate_grams(w).collect()}
    # only the exact-dup pair shares grams, and 2 docs < the 3-doc floor
    assert grams == set()
    got = {r["doc_id"]: r for r in D.strip_boilerplate(w).collect()}
    assert set(got) == set(range(1, 9))
    assert all(r["n_removed"] == 0 for r in got.values())
    stats = D.boilerplate_stats(w).collect()
    assert len(stats) == 1 and stats[0]["words_removed"] == 0

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert D.boilerplate_grams(empty).count() == 0
    assert D.strip_boilerplate(empty).count() == 0
    assert D.boilerplate_stats(empty).count() == 0


def test_soft_dedup_weights_no_duplicates_all_unit(spark, weird):
    """A corpus whose only cluster is the planted exact-dup pair: those
    two weigh 0.5, every other doc weighs 1.0."""
    got = {r["doc_id"]: r for r in D.soft_dedup_weights(weird).collect()}
    assert set(got) == set(range(1, 9))
    assert got[6]["cluster_size"] == 2 and got[6]["weight"] == 0.5
    assert got[7]["cluster_size"] == 2 and got[7]["weight"] == 0.5
    for d in (1, 2, 3, 4, 5, 8):
        assert got[d]["cluster_size"] == 1 and got[d]["weight"] == 1.0


def test_sq8_single_vector_corpus(spark):
    """One vector: every dimension is degenerate (range 0) -> all codes
    0 and the reconstruction is exactly the vector (the grid origin)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as SIM,
    )

    emb = spark.createDataFrame(
        [(1, [0.5, -2.0, 3.25])], "vec_id long, embedding array<float>"
    )
    stats, codes = SIM.pinned_sq8(emb)
    assert [list(r["codes"]) for r in codes.collect()] == [[0, 0, 0]]
    st = stats.first()
    assert list(st["ranges"]) == [0.0, 0.0, 0.0]
    assert list(st["mins"]) == [0.5, -2.0, 3.25]


def test_split_source_balance_single_doc(spark):
    """One doc: the grid still spans the FULL split domain — the doc's
    split has n=1, the two fully-empty splits appear as n=0 rows with
    n_expected=0 and chi2_term=0 (the 0-expected limit convention) —
    an entirely empty split is the most extreme skew and must be
    visible, not absent."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.quality import (
        split_source_balance,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sampling import (
        SPLIT_NAMES,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(1, "only doc", "solo")], "doc_id long, text string, source string"
    )
    rows = split_source_balance(docs).collect()
    assert {r["split"] for r in rows} == set(SPLIT_NAMES)
    (lived,) = {r["split"] for r in hash_split(docs, "doc_id").collect()}
    for r in rows:
        if r["split"] == lived:
            assert r["n"] == 1 and r["n_expected"] == 1.0
            assert r["chi2_term"] == 0.0
        else:
            assert r["n"] == 0 and r["n_expected"] == 0.0
            assert r["chi2_term"] == 0.0


def test_trigram_gate_degenerate_docs(spark, weird):
    """Docs with < 3 tokens score NULL with n_trigrams 0; the empty and
    whitespace-only docs do not crash the count tables."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        trigram_logprob_scores,
    )

    rows = {r["doc_id"]: r for r in trigram_logprob_scores(weird).collect()}
    assert set(rows) == {r["doc_id"] for r in weird.collect()}
    for did, r in rows.items():
        if r["n_trigrams"] == 0:
            assert r["trigram_logprob"] is None
        else:
            assert r["trigram_logprob"] is not None
    # empty and whitespace-only docs are trivially 0-trigram
    assert rows[1]["n_trigrams"] == 0 and rows[2]["n_trigrams"] == 0


def test_phash_corpus_without_images(spark):
    """An all-audio media table yields empty fingerprints, pairs, and
    clusters — the kind filter leaves nothing for the Arrow boundary."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        multimodal as M,
    )

    # doc_id % 3 == 1 -> kind audio
    docs = spark.createDataFrame(
        [(i, f"d{i}", "s") for i in range(1, 30, 3)],
        "doc_id long, text string, source string",
    )
    media = M.synth_media_aug(docs)
    assert media.filter(F.col("kind") == "image").count() == 0
    assert M.image_phash(media).count() == 0
    assert M.phash_pairs(media).count() == 0
    assert M.media_dup_clusters(media).count() == 0


def test_diversity_prune_single_vector_cells(spark):
    """Every cell holds exactly one vector: no neighbors exist, every
    vector keeps with NULL nn columns."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as S,
    )

    emb = spark.createDataFrame(
        [(i, [float(i + j) for j in range(64)], i) for i in range(4)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = S.diversity_prune(emb, k=3, min_cos=0.4).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["keep"] is True and r["nn_id"] is None and r["nn_cos"] is None


def test_media_manifest_empty_documents(spark):
    """An empty corpus produces an empty manifest (no crash in gates,
    closure, quota, or the prefix-sum packer)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.curation import (
        media_training_manifest,
    )

    docs = spark.createDataFrame([], "doc_id long, text string, source string")
    assert media_training_manifest(docs).count() == 0
