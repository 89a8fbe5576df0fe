"""Incremental index maintenance (search/incremental.py): per-batch
create-or-replace must serve EXACTLY what a from-scratch index over the
LWW-merged corpus serves — including document updates (stale tokens
must vanish) and deletes (is_alive=0 tombstones)."""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    pinned as PIN,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search import (
    api,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.incremental import (
    IncrementalIndexer,
)

COLS = ["doc_id", "owner", "name", "company", "job_title", "addr", "is_alive"]


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows], COLS
    )


def _rows(df):
    return sorted(
        (r["doc_id"], r["owner"], r["name"], r["score"]) for r in df.collect()
    )


def _expect(spark, state, query, user=None):
    """From-scratch search over the LWW-merged corpus."""
    return _rows(api.search_bizcards(_df(spark, state.values()), query, user=user))


def test_incremental_equals_rebuild_through_updates_and_deletes(spark, tmp_path):
    PIN.release_all()
    ix = IncrementalIndexer(spark, str(tmp_path / "esix"))
    state = {}

    def apply(batch):
        ix.upsert(_df(spark, batch))
        for r in batch:
            state[r[0]] = r

    b1 = [
        ("d1", "u1", "alpha kim", "acme corp", "engineer", "seoul", 1),
        ("d2", "u1", "beta lee", "acme corp", "manager", "busan", 1),
        ("d3", "u2", "gamma park", "zenith ltd", "director", "seoul", 1),
    ]
    apply(b1)
    for q, u in [("alpha", None), ("seoul", None), (None, "u1")]:
        assert _rows(ix.search(q, user=u)) == _expect(spark, state, q, u), (q, u)

    # update d2 (unique token 'beta' replaced) + insert d4
    b2 = [
        ("d2", "u1", "delta lee", "acme corp", "vp", "busan", 1),
        ("d4", "u3", "epsilon choi", "acme corp", "intern", "daegu", 1),
    ]
    apply(b2)
    for q, u in [("delta", None), ("beta", None), ("acme", None)]:
        assert _rows(ix.search(q, user=u)) == _expect(spark, state, q, u), q
    # the stale token is GONE from the postings segment, not just outscored
    postings = ix.postings.read()
    assert postings.filter(
        (F.col("id") == "d2") & (F.col("tok") == "beta")
    ).count() == 0

    # delete d3, insert d5
    b3 = [
        ("d3", "u2", "gamma park", "zenith ltd", "director", "seoul", 0),
        ("d5", "u2", "zeta jung", "zenith ltd", "analyst", "seoul", 1),
    ]
    apply(b3)
    for q, u in [("gamma", None), ("seoul", None), (None, "u2")]:
        assert _rows(ix.search(q, user=u)) == _expect(spark, state, q, u), q
    assert ix.postings.read().filter(F.col("id") == "d3").count() == 0
    PIN.release_all()


def test_incremental_index_survives_restart(spark, tmp_path):
    PIN.release_all()
    root = str(tmp_path / "esix")
    ix1 = IncrementalIndexer(spark, root)
    ix1.upsert(_df(spark, [("d1", "u1", "alpha kim", "c", "j", "a", 1)]))

    # a NEW maintainer over the same root serves the same state and its
    # next upsert continues the LWW order (the re-indexed doc wins)
    ix2 = IncrementalIndexer(spark, root)
    assert [r["doc_id"] for r in ix2.search("alpha").collect()] == ["d1"]
    ix2.upsert(_df(spark, [("d1", "u1", "omega kim", "c", "j", "a", 1)]))
    assert ix2.search("alpha").count() == 0
    assert [r["name"] for r in ix2.search("omega").collect()] == ["omega kim"]
    PIN.release_all()


def test_incremental_index_degenerate_paths(spark, tmp_path):
    """search before any upsert is a caller error (ES index_not_found);
    a delete-only batch empties the index and serving degrades to zero
    hits rather than crashing."""
    import pytest

    PIN.release_all()
    ix = IncrementalIndexer(spark, str(tmp_path / "esix"))
    with pytest.raises(ValueError):
        ix.index()

    ix.upsert(_df(spark, [("d1", "u1", "alpha kim", "c", "j", "a", 1)]))
    assert ix.search("alpha").count() == 1

    # delete-only batch: the sole doc tombstoned
    ix.upsert(_df(spark, [("d1", "u1", "alpha kim", "c", "j", "a", 0)]))
    assert ix.postings.read().count() == 0
    assert ix.search("alpha").count() == 0
    assert ix.search(None, user="u1").count() == 0
    PIN.release_all()
