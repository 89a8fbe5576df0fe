"""Graph semantics on the reference's 11-record golden fixture: expected
vertices/edges, PYMK bag semantics (reciprocal edges count twice), and the
exclusion invariants (self / direct friends never recommended)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    graph as G,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    ingest,
)

from fixtures import bizcard_text_rows


def h(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:8]


@pytest.fixture(scope="module")
def graph(spark):
    text = spark.createDataFrame(bizcard_text_rows())
    v, e = ingest.graph_from_text(text)
    return v.cache(), e.cache()


def test_vertices(graph):
    v, _ = graph
    ids = {r["id"]: r["name"] for r in v.collect()}
    assert ids == {
        h("edy"): "Edy Kim",
        h("crong"): "Crong Lee",
        h("harry"): "Harry Jang",
        h("poby"): "Poby Kim",
        h("pororo"): "Pororo Kim",
        h("rody"): "Rody Park",
    }


def test_edges_no_self_loops_and_dedup(graph):
    _, e = graph
    edges = {(r["src"], r["dst"]) for r in e.collect()}
    assert e.count() == len(edges)  # deduped
    assert all(s != d for s, d in edges)  # no self-loops
    expected = {
        (h("edy"), h("crong")),
        (h("edy"), h("harry")),
        (h("edy"), h("poby")),
        (h("poby"), h("edy")),
        (h("poby"), h("pororo")),
        (h("poby"), h("rody")),
        (h("pororo"), h("crong")),
        (h("pororo"), h("harry")),
    }
    assert edges == expected


def test_pymk_edy_bag_semantics(graph):
    """edy↔poby is reciprocal ⇒ poby appears twice in edy's friend bag ⇒
    poby's neighbors get 2 paths each. Expected: pororo=4, rody=2."""
    v, e = graph
    res = [(r["name"], r["score"]) for r in G.pymk(v, e, "Edy Kim", 10).collect()]
    assert res == [("Pororo Kim", 4.0), ("Rody Park", 2.0)]


def test_pymk_excludes_self_and_friends(graph):
    v, e = graph
    for user in ["Edy Kim", "Poby Kim", "Pororo Kim", "Crong Lee"]:
        me = {r["id"] for r in v.filter(F.col("_name") == user.lower()).collect()}
        bi = G.symmetrize(e)
        friends = {
            r["dst"] for r in bi.join(
                v.filter(F.col("_name") == user.lower()).select(F.col("id").alias("mid")),
                F.col("src") == F.col("mid"),
            ).collect()
        }
        rec = {r["id"] for r in G.pymk(v, e, user, 10).collect()}
        assert not (rec & me), user
        assert not (rec & friends), user


def test_pymk_case_insensitive(graph):
    v, e = graph
    a = [(r["id"], r["score"]) for r in G.pymk(v, e, "EDY KIM", 10).collect()]
    b = [(r["id"], r["score"]) for r in G.pymk(v, e, "edy kim", 10).collect()]
    assert a == b and a


def test_pymk_unknown_user_empty(graph):
    v, e = graph
    assert G.pymk(v, e, "nobody", 10).count() == 0


def test_one_hop_paths(graph):
    v, e = graph
    pairs = {(r["src_name"], r["dst_name"]) for r in G.one_hop_paths(v, e).collect()}
    assert ("Edy Kim", "Crong Lee") in pairs
    assert len(pairs) == 8


def test_graph_counts(graph):
    v, e = graph
    row = G.graph_counts(v, e).collect()[0]
    assert (row["vertex_count"], row["edge_count"]) == (6, 8)


def test_vertex_lookup_and_edge_exists(graph):
    v, e = graph
    assert G.vertex_lookup(v, h("edy")).count() == 1
    assert G.edge_exists(e, h("edy"), h("poby")).collect()[0]["exists"] is True
    assert G.edge_exists(e, h("edy"), h("rody")).collect()[0]["exists"] is False


def test_pymk_all_consistent_with_single(graph):
    v, e = graph
    allrec = G.pymk_all(e, limit=10)
    edy = [
        (r["id"], r["score"])
        for r in allrec.filter(F.col("user_id") == h("edy"))
        .orderBy("rank")
        .collect()
    ]
    single = [(r["id"], r["score"]) for r in G.pymk(v, e, "Edy Kim", 10).collect()]
    assert edy == single


def test_pymk_hydrated_valuemap_shape(graph):
    """O36 full valueMap hydration (neptune_recommend_bizcard.py:69-72;
    README.md:184-199): every vertex prop minus id/_-prefixed, each
    list-wrapped; score a plain float; same candidates/order as pymk."""
    v, e = graph
    hyd = G.pymk_hydrated(v, e, "Edy Kim", 10)

    # no internal columns, props list-wrapped, score/id scalar
    assert "_name" not in hyd.columns and "cand_id" not in hyd.columns
    assert set(hyd.columns) == {
        "id", "name", "email", "phone_number", "company", "job_title", "score"
    }
    rows = hyd.collect()
    assert rows, "fixture user must have recommendations"
    plain = G.pymk(v, e, "Edy Kim", 10).collect()
    assert [(r["id"], r["score"]) for r in rows] == [
        (r["id"], r["score"]) for r in plain
    ]
    for r in rows:
        assert isinstance(r["name"], list) and len(r["name"]) == 1
        assert isinstance(r["company"], list)
        assert isinstance(r["score"], float)
        # list-wrapped name matches the plain hydration's scalar name
    names = {r["id"]: r["name"][0] for r in rows}
    assert names == {r["id"]: r["name"] for r in plain}


def test_shortest_paths_bfs(spark):
    """BFS on a known path graph + a disconnected vertex + a cycle."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        shortest_paths,
    )

    # 0-1-2-3-4 path, 5-6 disconnected, plus chord 0-2 making dist(2)=1
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (5, 6, 1.0), (0, 2, 1.0)],
        ["src", "dst", "weight"],
    )
    got = {r.id: r.dist for r in shortest_paths(e, 0, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}

    # hop bound cuts the tail
    got2 = {r.id: r.dist for r in shortest_paths(e, 0, max_hops=2).collect()}
    assert got2 == {0: 0, 1: 1, 2: 1, 3: 2}

    # isolated source: just itself
    got3 = {r.id: r.dist for r in shortest_paths(e, 99, max_hops=3).collect()}
    assert got3 == {99: 0}
