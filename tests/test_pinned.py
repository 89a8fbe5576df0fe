"""Pinned-relation registry: persist hygiene (no leaked storage after
release) and the index-once/query-many serving shape (the ES index/query
split, es_search_bizcard.py vs upsert_bizcard_to_es.py)."""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    graph as G,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    pinned as PIN,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    search as S,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
    physical_plan,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_search_index_built_once_released_clean(spark):
    """Two different queries over one corpus must share ONE pinned index
    build (no extra persisted RDDs on the second query), and release_all
    must return storage to baseline — the leak the long-lived-server
    hygiene contract forbids."""
    PIN.release_all()
    spark.catalog.clearCache()
    base = _n_persisted(spark)

    docs = tables.load_table(spark, SF, "documents")
    r1 = S.search_documents(docs, "spark join", limit=5).collect()
    after_q1 = _n_persisted(spark)
    assert after_q1 > base  # postings + doclen materialized

    r2 = S.search_documents(docs, "vector data", limit=5).collect()
    assert _n_persisted(spark) == after_q1  # index reused, not rebuilt
    assert len(PIN.pinned_keys()) == 1

    # The second query's plan must read the cached index, not rebuild it.
    q3 = S.search_documents(docs, "spark", limit=5)
    assert "InMemoryTableScan" in physical_plan(q3)

    assert PIN.release_all() == 1
    assert _n_persisted(spark) == base

    # Still correct after release (index rebuilds transparently).
    r1b = S.search_documents(docs, "spark join", limit=5).collect()
    assert r1 == r1b and len(r2) > 0
    PIN.release_all()


def test_pymk_no_net_persist_after_release(spark):
    """pymk pins the symmetrized edge view and the vertex relation once
    per corpus; release_all unpersists both — no net persisted RDDs."""
    PIN.release_all()
    spark.catalog.clearCache()
    base = _n_persisted(spark)

    v = tables.user_graph_vertices(spark, SF)
    e = tables.user_graph_edges(spark, SF)
    G.pymk(v, e, "user_3", 5).collect()
    grew = _n_persisted(spark)
    assert grew == base + 2  # the pinned bi view + the pinned vertices

    G.pymk_all(e, limit=3).count()
    assert _n_persisted(spark) == grew  # same bi reused across variants
    assert len(PIN.pinned_keys()) == 2

    PIN.release_all()
    assert _n_persisted(spark) == base


def test_bizcard_index_shared_across_query_shapes(spark):
    """Scored, filtered, and filter-only searches all serve from the same
    pinned bizcard index."""
    PIN.release_all()
    spark.catalog.clearCache()
    base = _n_persisted(spark)

    rows = [
        dict(doc_id="d1", owner="u1", name="alpha beta", company="c",
             job_title="j", addr="a", is_alive=1),
        dict(doc_id="d2", owner="u2", name="beta gamma", company="c",
             job_title="j", addr="a", is_alive=1),
    ]
    b = spark.createDataFrame(rows)
    S.search_bizcards(b, "alpha").collect()
    n1 = _n_persisted(spark)
    S.search_bizcards(b, "beta", user="u2").collect()
    S.search_bizcards(b, None, user="u1").collect()
    assert _n_persisted(spark) == n1
    assert len(PIN.pinned_keys()) == 1
    PIN.release_all()
    assert _n_persisted(spark) == base
