"""Search semantics: analyzer, BM25 ranking sanity, boost behavior, filter
context, envelope shape (O26–O29c)."""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    search as S,
)


def test_tokenize(spark):
    df = spark.createDataFrame([("Hello, World! x2  ",), ("",)], "t: string")
    got = [r["toks"] for r in df.select(S.tokenize(F.col("t")).alias("toks")).collect()]
    assert got == [["hello", "world", "x2"], []]


def _corpus(spark):
    rows = [
        (1, "spark spark spark join"),
        (2, "spark join"),
        (3, "join vector vector"),
        (4, "unrelated words only here"),
        (5, "spark"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_bm25_ranking_sanity(spark):
    docs = _corpus(spark)
    res = S.search_documents(docs, "spark", limit=10).collect()
    ids = [r["doc_id"] for r in res]
    # higher tf (with similar dl) ranks first; non-matching doc 4 absent
    assert ids[0] == 1
    assert 4 not in ids
    assert set(ids) == {1, 2, 5}
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_bm25_multi_term_accumulates(spark):
    docs = _corpus(spark)
    one = {r["doc_id"]: r["score"] for r in S.search_documents(docs, "spark", 10).collect()}
    two = {r["doc_id"]: r["score"] for r in S.search_documents(docs, "spark join", 10).collect()}
    assert two[2] > one[2]  # matching a second term increases the score


def test_best_fields_boost(spark):
    rows = [
        dict(doc_id="d1", owner="u1", name="alpha beta", company="zzz", job_title="qqq",
             addr="ppp", is_alive=1),
        dict(doc_id="d2", owner="u2", name="zzz", company="alpha beta", job_title="qqq",
             addr="ppp", is_alive=1),
    ]
    df = spark.createDataFrame(rows)
    res = {r["doc_id"]: r["score"] for r in S.search_bizcards(df, "alpha", limit=10).collect()}
    # same tf/dl/df profile, but name matches are boosted 3x
    # (scores are rounded to 6dp independently → approx)
    assert abs(res["d1"] - 3 * res["d2"]) < 5e-6


def test_filter_context_does_not_change_scores(spark):
    rows = [
        dict(doc_id="d1", owner="u1", name="alpha", company="c", job_title="j",
             addr="a", is_alive=1),
        dict(doc_id="d2", owner="u2", name="alpha", company="c", job_title="j",
             addr="a", is_alive=1),
    ]
    df = spark.createDataFrame(rows)
    unfiltered = {r["doc_id"]: r["score"] for r in S.search_bizcards(df, "alpha").collect()}
    filtered = {r["doc_id"]: r["score"] for r in S.search_bizcards(df, "alpha", user="u2").collect()}
    assert set(filtered) == {"d2"}
    assert filtered["d2"] == unfiltered["d2"]  # O28 is non-scoring


def test_user_only_search_is_filter_context(spark):
    """No query keywords → bool query with only the filter clause
    (es_search_bizcard.py:71-73); every hit scores 0.0, doc_id order."""
    rows = [
        dict(doc_id="d2", owner="u1", name="beta", company="c", job_title="j",
             addr="a", is_alive=1),
        dict(doc_id="d1", owner="u1", name="alpha", company="c", job_title="j",
             addr="a", is_alive=1),
        dict(doc_id="d3", owner="u2", name="gamma", company="c", job_title="j",
             addr="a", is_alive=1),
        dict(doc_id="d4", owner="u1", name="dead", company="c", job_title="j",
             addr="a", is_alive=0),
    ]
    df = spark.createDataFrame(rows)
    hits = S.search_bizcards(df, None, user="u1").collect()
    assert [r["doc_id"] for r in hits] == ["d1", "d2"]
    assert all(r["score"] == 0.0 for r in hits)


def test_dead_docs_excluded(spark):
    rows = [
        dict(doc_id="d1", owner="u1", name="alpha", company="c", job_title="j",
             addr="a", is_alive=1),
        dict(doc_id="d2", owner="u2", name="alpha", company="c", job_title="j",
             addr="a", is_alive=0),
    ]
    df = spark.createDataFrame(rows)
    assert {r["doc_id"] for r in S.search_bizcards(df, "alpha").collect()} == {"d1"}


def _demo_bizcards(spark):
    rows = [
        dict(doc_id="d1", owner="hyouk", name="sungmin kim", company="c",
             job_title="j", addr="a", is_alive=1),
        dict(doc_id="d2", owner="hyouk", name="bar lee", company="c",
             job_title="j", addr="a", is_alive=1),
        dict(doc_id="d3", owner="eddy", name="sungmin park", company="c",
             job_title="j", addr="a", is_alive=1),
    ]
    return spark.createDataFrame(rows)


def test_prebuilt_index_serves_many_queries(spark, monkeypatch):
    """Serving shape (es_search_bizcard.py's index/query split): an index
    built ONCE answers many queries. With the prebuilt triple passed in,
    the query path must never call the index builder — monkeypatching the
    builder to raise proves it — and results must match the self-building
    form."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search import (
        api,
    )

    df = _demo_bizcards(spark)
    want_q1 = [tuple(r) for r in S.search_bizcards(df, "sungmin").collect()]
    want_q2 = [
        tuple(r) for r in S.search_bizcards(df, "bar", user="hyouk").collect()
    ]

    idx = api.bizcard_index(df)

    def _boom(*a, **k):  # any rebuild attempt is a serving-shape bug
        raise AssertionError("index rebuilt on the query path")

    monkeypatch.setattr(api, "bizcard_index", _boom)
    got_q1 = [
        tuple(r)
        for r in S.search_bizcards(df, "sungmin", index=idx).collect()
    ]
    got_q2 = [
        tuple(r)
        for r in S.search_bizcards(
            df, "bar", user="hyouk", index=idx
        ).collect()
    ]
    assert got_q1 == want_q1 and got_q2 == want_q2
    assert got_q1 and got_q2


def test_search_param_sweep_o29b(spark):
    """O29b: the reference __main__'s 4-case sweep
    (es_search_bizcard.py:164-165) — {query+user}, {query}, {user}, {}.
    The first three serve 200 with ranked hits; the empty case fails the
    ``assert query_keywords or user_name`` (:75) and serves 404/'[]'
    (:98-106)."""
    import json

    b = _demo_bizcards(spark)

    r = S.search_response(b, query="sungmin", user="hyouk")
    assert r["statusCode"] == 200 and not r["isBase64Encoded"]
    assert [h["_id"] for h in json.loads(r["body"])] == ["d1"]

    r = S.search_response(b, query="kim")
    assert r["statusCode"] == 200
    assert [h["_id"] for h in json.loads(r["body"])] == ["d1"]

    r = S.search_response(b, user="hyouk")
    body = json.loads(r["body"])
    assert r["statusCode"] == 200
    assert [h["_id"] for h in body] == ["d1", "d2"]  # filter ctx, doc_id order
    assert all(h["_score"] == 0.0 for h in body)

    r = S.search_response(b)
    assert r == {"statusCode": 404, "body": "[]", "isBase64Encoded": False}


def test_search_or_404_empty_relation(spark):
    """DataFrame form of O29b: neither arg → empty relation with the
    standard hit schema, no job."""
    b = _demo_bizcards(spark)
    empty = S.search_or_404(b, None, None)
    assert empty.columns == ["doc_id", "owner", "name", "score"]
    assert empty.count() == 0
    assert S.search_or_404(b, "kim", None).count() == 1


def test_envelope(spark):
    docs = _corpus(spark)
    hits = S.search_documents(docs, "spark", limit=3)
    env = S.search_envelope(hits, index="idx", typ="t")
    row = env.collect()[0]
    assert row["_index"] == "idx" and row["_type"] == "t"
    assert row["_id"] == row["_source"]["doc_id"]
    assert isinstance(row["_score"], float)


def test_vocab_term_dictionary_matches_postings(spark):
    """The index-time term dictionary (vocab) must agree with dfs
    recomputed from the postings — the round-5 point-lookup path serves
    the same statistics as the old per-query postings scan, for every
    term in the corpus."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search import (
        api,
        bm25,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.index import (
        build_index,
    )

    docs = _corpus(spark)
    postings, _, vocab = build_index(docs, "doc_id", "text")
    all_terms = [r["tok"] for r in vocab.select("tok").distinct().collect()]
    assert bm25.vocab_dfs(vocab, all_terms) == bm25.term_dfs(postings, all_terms)

    b = _demo_bizcards(spark)
    _, bposts, _, bvocab = api.bizcard_index(b)
    bterms = [r["tok"] for r in bvocab.select("tok").distinct().collect()]
    assert bm25.vocab_dfs_by_field(bvocab, bterms) == bm25.term_dfs_by_field(
        bposts, bterms
    )
