"""Round-5 extension operators: triangle counting, SCD2 history,
train/test contamination, corpus vocabulary head, transition counts.

Semantics on handcrafted graphs/logs plus the plan shapes that must
survive 100 TB (no nested-loop joins, single-shuffle windows)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    plans as PL,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
    document_frequency_topk,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.triangles import (
    triangle_stats,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.contamination import (
    contamination_report,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.scd import (
    scd2_history,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sessionize import (
    transition_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


# --------------------------------------------------------------------------
# triangles
# --------------------------------------------------------------------------


def test_triangles_known_graph(spark):
    # 4-clique {1,2,3,4} (4 triangles) + pendant 5-1 + isolated edge 6-7.
    pairs = list(combinations([1, 2, 3, 4], 2)) + [(5, 1), (6, 7)]
    row = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert row.triangle_count == 4
    # degrees: 1->4, 2..4->3, 5->1, 6,7->1; wedges = 6 + 3*3 + 0 = 15
    assert row.wedge_count == 15
    assert abs(row.clustering_coeff - round(12 / 15, 6)) < 1e-12


def test_triangles_direction_and_duplicate_invariant(spark):
    # Same undirected graph expressed with reversed + duplicated +
    # self-loop edges must count identically (canonicalization).
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 1)]
    a = triangle_stats(_edges(spark, base)).collect()[0]
    b = triangle_stats(_edges(spark, noisy)).collect()[0]
    assert (a.triangle_count, a.wedge_count) == (b.triangle_count, b.wedge_count) == (1, 3)


def test_triangles_wedge_free_graph_zero_coeff(spark):
    row = triangle_stats(_edges(spark, [(1, 2), (3, 4)])).collect()[0]
    assert row.triangle_count == 0
    assert row.wedge_count == 0
    assert row.clustering_coeff == 0.0


def test_triangles_plan_no_nested_loop(spark):
    """The wedge join and the closing semi-join must be equi-joins; the
    only cartesian allowed is the final 1x1 stat combine. At 100 TB a
    BroadcastNestedLoopJoin on the wedge stream is a non-starter."""
    df = triangle_stats(_edges(spark, list(combinations(range(8), 2))))
    plan = PL.physical_plan(df)
    # formatted explain lists each node twice (tree + details): count
    # distinct node ids, not substring hits
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
        _node_ids,
    )

    nlj = _node_ids(plan, r"BroadcastNestedLoopJoin")
    assert len(nlj) <= 1  # the 1x1 combine only
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# SCD2
# --------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_scd2_collapses_runs_and_chains_validity(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    rows = [
        (1, 7, t(0), "a"),
        (2, 7, t(1), "a"),  # same run
        (3, 7, t(2), "b"),  # change
        (4, 7, t(3), "b"),
        (5, 7, t(4), "a"),  # change back -> new run
        (6, 9, t(0), "x"),  # other user
    ]
    out = scd2_history(
        _events(spark, rows), ["user_id"], "ts", ["event_id"], "event_type"
    ).collect()
    u7 = sorted([r for r in out if r.user_id == 7], key=lambda r: r.valid_from)
    assert [r.event_id for r in u7] == [1, 3, 5]
    assert [r.event_type for r in u7] == ["a", "b", "a"]
    # validity chains with no gaps: valid_to == next valid_from
    assert u7[0].valid_to == u7[1].valid_from
    assert u7[1].valid_to == u7[2].valid_from
    assert u7[2].valid_to is None and u7[2].is_current
    assert sum(r.is_current for r in out) == 2  # one open run per user


def test_scd2_single_shuffle(spark):
    """Both windows share (key, ts, tiebreak) — Catalyst must plan ONE
    exchange; a second shuffle would double the cost of the biggest
    window op in the warehouse."""
    import datetime as dt

    df = _events(spark, [(1, 1, dt.datetime(2024, 1, 1), "a")])
    out = scd2_history(df, ["user_id"], "ts", ["event_id"], "event_type")
    assert PL.exchange_count(out) == 1


# --------------------------------------------------------------------------
# contamination
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, split string")


def test_contamination_flags_shared_8gram(spark):
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, f"prefix words then {leak} and a tail", "train"),
        (2, f"{leak} other content entirely here now", "test"),  # leaked
        (3, "totally different words with no overlap at all ok", "test"),
        (4, "short doc", "test"),  # < 8 tokens -> no shingles
        (5, "dev split docs are ignored by the audit entirely yes", "dev"),
    ]
    out = {
        r.doc_id: r
        for r in contamination_report(_docs(spark, rows)).collect()
    }
    assert set(out) == {2, 3, 4}  # test docs only, zero-overlap kept
    assert out[2].contaminated and out[2].n_overlap >= 1
    assert not out[3].contaminated and out[3].n_overlap == 0
    assert out[4].n_shingles == 0 and not out[4].contaminated
    # n_overlap never exceeds the doc's own shingle count
    assert all(r.n_overlap <= r.n_shingles for r in out.values())


def test_contamination_train_side_is_set_semantics(spark):
    """The same shingle in MANY train docs must count once per test
    shingle (fan-out 1) — this is the property that makes the join safe
    under power-law shingle frequency."""
    leak = "one two three four five six seven eight"
    rows = [(i, f"filler{i} {leak}", "train") for i in range(10)]
    rows.append((100, leak, "test"))
    out = contamination_report(_docs(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_overlap == 1 and out[0].n_shingles == 1


# --------------------------------------------------------------------------
# vocabulary head / transitions
# --------------------------------------------------------------------------


def test_document_frequency_topk_tie_order(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "c b a"), (4, "z")],
        "doc_id long, text string",
    )
    rows = document_frequency_topk(df, 3).collect()
    assert [(r.token, r.df) for r in rows] == [("a", 3), ("b", 3), ("c", 1)]


def test_document_frequency_topk_is_take_ordered(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert PL.has_take_ordered(document_frequency_topk(df, 5))


def test_transition_counts_conserve_rows(spark):
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)
    ev = spark.createDataFrame(
        [
            (1, 7, t(0), "click", 0.0),
            (2, 7, t(1), "view", 0.0),
            (3, 7, t(2), "view", 0.0),
            (4, 9, t(0), "error", 0.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    rows = transition_counts(ev).collect()
    got = {(r.prev_type, r.event_type): r.n for r in rows}
    assert got == {
        ("^", "click"): 1,
        ("click", "view"): 1,
        ("view", "view"): 1,
        ("^", "error"): 1,
    }
    assert sum(got.values()) == 4  # rows conserved
    assert sum(n for (p, _), n in got.items() if p == "^") == 2  # users


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------


def test_pagerank_mass_conservation_and_star_ordering(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank,
        pagerank_topk,
    )

    # star: hub 1 with leaves 2..6 — hub must outrank every leaf, total
    # mass ~1 (no dangling vertices under symmetrization)
    star = _edges(spark, [(1, i) for i in range(2, 7)])
    ranks = {r.id: r.rank for r in pagerank(star, iterations=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert all(ranks[1] > ranks[i] for i in range(2, 7))
    top = pagerank_topk(star, 3).collect()
    assert top[0].id == 1
    # leaves are symmetric: identical rounded ranks, id-ordered
    assert [r.id for r in top[1:]] == [2, 3]
    assert top[1].rank_norm == top[2].rank_norm


def test_pagerank_uniform_on_cycle(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank,
    )

    cyc = _edges(spark, [(i, (i + 1) % 6) for i in range(6)])
    ranks = [r.rank for r in pagerank(cyc, iterations=4).collect()]
    assert len(ranks) == 6
    assert max(ranks) - min(ranks) < 1e-12  # regular graph -> uniform


def test_pagerank_converged_matches_large_fixed_k(spark):
    """VERDICT r5 item 9: the tol-mode loop must land on the same ranks
    as a large fixed-K run at the declared 6dp rounding edge, and must
    stop well before the misuse guard (damped PageRank contracts
    geometrically). The registered query keeps the fixed-K path."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank,
        pagerank_converged,
    )

    # Irregular graph (star + tail + chord) so ranks are non-uniform.
    pairs = [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7), (2, 3)]
    edges = _edges(spark, pairs)
    conv = {r.id: round(r.rank, 6) for r in pagerank_converged(edges, tol=1e-9).collect()}
    fixed = {r.id: round(r.rank, 6) for r in pagerank(edges, iterations=80).collect()}
    assert conv == fixed
    CKPT.release_all(spark)


def test_pagerank_converged_raises_on_budget(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank_converged,
    )

    edges = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank_converged(edges, tol=0.0, max_iterations=2)
    CKPT.release_all(spark)


def test_pagerank_empty_graph(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank,
    )

    e = spark.createDataFrame([], "src long, dst long, weight double")
    assert pagerank(e).count() == 0


def test_pagerank_frees_checkpoint_scratch(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pagerank,
    )

    before = len(CKPT.live_ids())
    pagerank(_edges(spark, [(1, 2), (2, 3)]), iterations=3).count()
    # only the final state's checkpoint may remain tracked beyond what
    # was already live before the call
    assert len(CKPT.live_ids()) - before <= 1
    CKPT.release_all(spark)
    assert len(CKPT.live_ids()) == 0


# --------------------------------------------------------------------------
# unigram LM score / cube
# --------------------------------------------------------------------------


def test_unigram_logprob_values_and_null(spark):
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        unigram_logprob_scores,
    )

    df = spark.createDataFrame(
        [(1, "a a"), (2, "b"), (3, "??!")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    # corpus tokens: a a b -> T=3, tf(a)=2, tf(b)=1
    assert out[1].n_tokens == 2
    assert abs(out[1].unigram_logprob - round(math.log(2 / 3), 6)) < 1e-9
    assert abs(out[2].unigram_logprob - round(math.log(1 / 3), 6)) < 1e-9
    assert out[1].unigram_logprob > out[2].unigram_logprob  # common > rare
    assert out[3].n_tokens == 0 and out[3].unigram_logprob is None


def test_events_cube_has_all_slices_single_exchange(spark):
    import datetime as dt

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        events_cube,
    )

    ev = spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1, 3), "click", 1.0),
            (2, 7, dt.datetime(2024, 1, 1, 3), "view", 2.0),
            (3, 9, dt.datetime(2024, 1, 1, 5), "click", 4.0),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    rows = events_cube(ev).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2, 3}
    # the per-hour marginal ROLLUP cannot express: (NULL type, hr=3)
    marg = [r for r in rows if r.gid == 2 and r.hr == 3]
    assert len(marg) == 1 and marg[0].n == 2 and marg[0].value_sum == 3.0
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].n == 3
    # one scan, one aggregate shuffle (Expand feeds a single exchange)
    assert PL.exchange_count(events_cube(ev)) == 1


# --------------------------------------------------------------------------
# personalized PageRank / Q3 top-k / histogram
# --------------------------------------------------------------------------


def test_ppr_mass_and_locality(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        personalized_pagerank,
    )

    # path graph 1-2-3-4-5-6; source 1; K=3 supersteps reach at most
    # vertex 4 — vertices 5,6 must hold exactly 0 mass
    path = _edges(spark, [(i, i + 1) for i in range(1, 6)])
    r = {row.id: row.rank for row in personalized_pagerank(path, 1, iterations=3).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9  # mass conserved
    assert r[5] == 0.0 and r[6] == 0.0  # beyond K hops: exactly zero
    # mass sloshes on a path at small K (bipartite oscillation), so the
    # robust proximity facts are the SAME-parity comparisons:
    assert r[1] > r[3] > 0  # odd-step mass decays with distance
    assert r[2] > r[4] > 0  # even-step mass decays with distance


def test_pymk_ppr_excludes_source_and_friends(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.rank import (
        pymk_ppr,
    )

    # 1 knows 2,3; 2 knows 4; 3 knows 4,5 — PYMK(1) must suggest only
    # {4, 5}, with 4 (two paths) above 5 (one)
    g = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (3, 5)])
    rows = pymk_ppr(g, 1, 10).collect()
    assert [r.id for r in rows] == [4, 5]
    assert rows[0].ppr > rows[1].ppr


def test_topk_order_revenue_plan(spark):
    """Segment-filtered customer must broadcast; the k-row cut must be
    TakeOrderedAndProject, not a global sort materialization."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        topk_order_revenue,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    SF = "/root/testdata/sf0.001"
    df = topk_order_revenue(
        tables.load_table(spark, SF, "customer"),
        tables.load_table(spark, SF, "orders"),
        tables.load_table(spark, SF, "lineitem"),
    )
    assert PL.broadcast_join_count(df) >= 1
    assert PL.has_take_ordered(df)
    # both date predicates reach the parquet scans
    pushed = " ".join(PL.pushed_filters(df))
    assert "o_orderdate" in pushed and "l_shipdate" in pushed
    # r9: the fact-fact join is PINNED to a shuffle hash join — the
    # planner's estimate of the filtered lineitem undershoots the
    # broadcast threshold at small scale and broadcasting a FACT is a
    # driver OOM at 100 TB (and cost 3.5x at sf1).
    plan = PL.physical_plan(df)
    assert "ShuffledHashJoin" in plan, plan


def test_value_histogram_edge_buckets(spark):
    import datetime as dt

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        value_histogram,
    )

    ev = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1), "a", -3.0),   # underflow
            (2, 1, dt.datetime(2024, 1, 1), "a", 0.0),    # bucket 0 lower edge
            (3, 1, dt.datetime(2024, 1, 1), "a", 49.999), # bucket 0
            (4, 1, dt.datetime(2024, 1, 1), "a", 50.0),   # bucket 1 lower edge
            (5, 1, dt.datetime(2024, 1, 1), "a", 499.99), # bucket 9
            (6, 1, dt.datetime(2024, 1, 1), "a", 500.0),  # overflow
            (7, 1, dt.datetime(2024, 1, 1), "a", 780.0),  # overflow
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    got = {r.bucket: (r.n, r.bucket_lo) for r in value_histogram(ev).collect()}
    assert got[-1] == (1, -50.0)
    assert got[0] == (2, 0.0)
    assert got[1] == (1, 50.0)
    assert got[9] == (1, 450.0)
    assert got[10] == (2, 500.0)
    assert sum(n for n, _ in got.values()) == 7  # rows conserved


# --------------------------------------------------------------------------
# streaming session windows
# --------------------------------------------------------------------------


def test_streaming_sessions_merge_across_drains(spark, tmp_path):
    """A bridging event arriving in a LATER drain must fuse two open
    sessions into one — the mergeable-window semantics that forced the
    append-mode design (update+keyed-merge would strand the swallowed
    session's row)."""
    import datetime as dt

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.sessions import (
        StreamingSessionizer,
    )

    t0 = dt.datetime(2024, 1, 1)
    landing = str(tmp_path / "landing")
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double"
    # two events 20h apart: separate sessions under the 12h gap
    spark.createDataFrame(
        [(1, t0, 7, "a", 1.0), (2, t0 + dt.timedelta(hours=20), 7, "b", 2.0)],
        ddl,
    ).write.mode("overwrite").parquet(landing)
    s = StreamingSessionizer(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    s._drain(landing, ckpt, "48 hours", 300)
    # the bridge lands 10h in — both gaps now <= 12h -> ONE session
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(hours=10), 7, "c", 4.0)], ddl
    ).write.mode("append").parquet(landing)
    s.run_available_now(landing, ckpt)
    rows = s.current().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_events == 3 and r.value_sum == 7.0
    assert r.start_us == int(t0.timestamp() * 1_000_000)
    assert r.end_us == int((t0 + dt.timedelta(hours=20)).timestamp() * 1_000_000)


def test_streaming_sessions_empty_landing(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.sessions import (
        StreamingSessionizer,
    )

    landing = str(tmp_path / "landing")
    ddl = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame([], ddl).write.mode("overwrite").parquet(landing)
    s = StreamingSessionizer(spark, str(tmp_path / "wh"))
    s.run_available_now(landing, str(tmp_path / "ckpt"))  # no-op, no crash


# --------------------------------------------------------------------------
# link prediction (graph/linkpred.py)
# --------------------------------------------------------------------------


def test_jaccard_known_values(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.linkpred import (
        jaccard_pymk,
    )

    # 1-2, 1-3, 2-4, 3-4, 2-5: candidates of 1 are 4 (via 2 and 3) and 5
    # (via 2). N(1)={2,3}; N(4)={2,3} -> J=2/2=1.0; N(5)={2} -> J=1/2.
    rows = jaccard_pymk(
        _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (2, 5)]), 1, 10
    ).collect()
    got = {r.id: r.jaccard for r in rows}
    assert got == {4: 1.0, 5: 0.5}
    # order: score desc then id asc
    assert [r.id for r in rows] == [4, 5]


def test_adamic_adar_known_values(spark):
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.linkpred import (
        adamic_adar_pymk,
    )

    # same graph: deg(2)=3, deg(3)=2. AA(1,4)=1/ln3 + 1/ln2; AA(1,5)=1/ln3.
    rows = adamic_adar_pymk(
        _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (2, 5)]), 1, 10
    ).collect()
    got = {r.id: r.aa for r in rows}
    assert got == {
        4: round(1 / math.log(3) + 1 / math.log(2), 6),
        5: round(1 / math.log(3), 6),
    }


def test_linkpred_excludes_source_and_friends(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.linkpred import (
        adamic_adar_pymk,
        jaccard_pymk,
    )

    # triangle 1-2-3 plus 3-4: 2 and 3 are friends of 1; 2-1 and 3-1
    # back-walks must not resurface them or the source.
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    for fn, col in ((jaccard_pymk, "jaccard"), (adamic_adar_pymk, "aa")):
        ids = {r.id for r in fn(edges, 1, 10).collect()}
        assert ids == {4}, f"{col}: {ids}"


def test_linkpred_whale_routing_equivalence(spark, monkeypatch):
    """VERDICT r5 item 8: the WHALE_BROADCAST_CAP shuffle path of both
    link-prediction scores, exercised (same pattern as
    test_pymk_all_whale_salting_is_physical_only). With the cap forced
    to 0 every friend list is a 'whale': the broadcast hints are
    withheld and the scoring joins run as plain shuffle joins — which
    must be row-identical to the default broadcast routing, because the
    gate is a physical rewrite only."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph import (
        linkpred as LP,
    )

    # Hub-ish graph: 0 knows 1..9; sparse extra edges make distinct
    # candidate scores so the top-k ordering is exercised, not just sets.
    pairs = [(0, i) for i in range(1, 10)] + [
        (1, 10), (2, 10), (3, 10), (1, 11), (4, 12), (5, 12), (6, 12),
        (7, 12),
    ]
    edges = _edges(spark, pairs)

    def run():
        j = [(r.id, r.jaccard) for r in LP.jaccard_pymk(edges, 0, 10).collect()]
        a = [(r.id, r.aa) for r in LP.adamic_adar_pymk(edges, 0, 10).collect()]
        return j, a

    j_bcast, a_bcast = run()
    assert len(j_bcast) >= 3 and len(a_bcast) >= 3  # fixture is non-trivial

    monkeypatch.setattr(LP, "WHALE_BROADCAST_CAP", 0)
    # Routing proof, not just equivalence: under the forced-whale cap the
    # broadcast hint must be absent from the optimized scoring plan.
    plan_whale = (
        LP.jaccard_pymk(edges, 0, 10)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    j_shuffle, a_shuffle = run()
    assert j_shuffle == j_bcast
    assert a_shuffle == a_bcast

    monkeypatch.undo()
    plan_bcast = (
        LP.jaccard_pymk(edges, 0, 10)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # The 1-row source-degree crossJoin keeps one hint in both plans;
    # the friend-side hints (2 in jaccard) only exist under the default
    # cap, so the broadcast-hint count must strictly drop when forced.
    assert plan_bcast.count("broadcast") > plan_whale.count("broadcast")


def test_linkpred_topk_is_take_ordered(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.linkpred import (
        jaccard_pymk,
    )

    df = jaccard_pymk(_edges(spark, [(1, 2), (2, 3), (2, 4)]), 1, 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tfidf_top_terms_values_and_ties(spark):
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        tfidf_top_terms,
    )

    # 3 docs; "common" is in all 3 (idf=0); "rare" only in d1 (idf=ln3).
    docs = spark.createDataFrame(
        [
            ("d1", "common rare rare"),
            ("d2", "common zebra"),
            ("d3", "common"),
        ],
        "doc_id string, text string",
    )
    rows = tfidf_top_terms(docs, 2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.token, r.tfidf))
    # d1: rare (tf=2, idf=ln3) outranks common (0.0)
    assert by_doc["d1"][0] == ("rare", round(2 * math.log(3), 6))
    assert by_doc["d1"][1] == ("common", 0.0)
    # d3 has only one distinct token -> one row, no padding
    assert by_doc["d3"] == [("common", 0.0)]
    # d2: zebra (ln3) then common
    assert by_doc["d2"][0] == ("zebra", round(math.log(3), 6))


def test_tfidf_empty_and_null_docs(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [("d1", "alpha"), ("d2", ""), ("d3", None)],
        "doc_id string, text string",
    )
    rows = tfidf_top_terms(docs, 3).collect()
    # token-free docs yield no rows; N=3 still counts them in idf
    assert {r.doc_id for r in rows} == {"d1"}


# --------------------------------------------------------------------------
# data-quality audit (operators/quality.py)
# --------------------------------------------------------------------------


def test_dq_checks_detect_planted_defects(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        quality as Q,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,), (20,)], "pk long")
    # 99 misses; NULL FK counts as an orphan (references nothing)
    assert (
        Q.referential_orphan_count(child, parent, "fk", "pk", "n").collect()[0].n
        == 2
    )

    dup = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    assert Q.duplicate_key_count(dup, ["k", "v"], "n").collect()[0].n == 1
    assert Q.duplicate_key_count(dup, ["k"], "n").collect()[0].n == 1

    txt = spark.createDataFrame(
        [("x",), ("  ",), ("",), (None,)], "t string"
    )
    assert Q.null_or_blank_count(txt, "t", "n").collect()[0].n == 3


def test_dq_audit_one_row_and_clean_data(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        quality as Q,
    )

    child = spark.createDataFrame([(1, 10)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    out = Q.dq_audit(
        [
            Q.referential_orphan_count(child, parent, "fk", "pk", "orphans"),
            Q.duplicate_key_count(child, ["id"], "dups"),
        ]
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].orphans == 0 and rows[0].dups == 0


def test_running_totals_single_window_exchange(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    orders = tables.load_table(spark, "/root/testdata/sf0.001", "orders")
    df = W.customer_running_totals(orders, 5)
    # one shuffle serves both the cumulative frame and the rank cut
    assert PL.exchange_count(df) == 1, PL.physical_plan(df)
    plan = PL.physical_plan(df)
    assert plan.count("Window") >= 1


def test_running_totals_values(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    orders = spark.createDataFrame(
        [
            (1, 10, "2024-01-01", 100.0),
            (1, 11, "2024-01-02", 50.5),
            (2, 12, "2024-01-01", 10.0),
        ],
        "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    rows = {
        (r.o_custkey, r.order_seq): r.running_total
        for r in W.customer_running_totals(orders, 5).collect()
    }
    assert rows == {(1, 1): 100.0, (1, 2): 150.5, (2, 1): 10.0}


def test_cheapest_supplier_argmin_and_ties(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    li = spark.createDataFrame(
        # part 1: supp 7 avg 5.0 (2 lines), supp 3 avg 5.0 (1 line)
        #   -> tie on avg, lower suppkey (3) wins
        # part 2: only 2 lines total -> dropped by min_lines=3
        [
            (1, 7, 4.0),
            (1, 7, 6.0),
            (1, 3, 5.0),
            (2, 9, 1.0),
            (2, 9, 2.0),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    rows = W.cheapest_supplier_per_part(li, 3).collect()
    assert len(rows) == 1
    assert rows[0].l_partkey == 1 and rows[0].l_suppkey == 3
    assert rows[0].avg_price == 5.0


def test_trailing_24h_frame_boundaries(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    rows = [
        # user 1: events at t0, t0+1h, t0+24h (exactly 24h later: the
        # first event is OUTSIDE the trailing frame of the third —
        # frame is (now-24h, now], open on the left)
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 1, "2024-01-01 01:00:00", 2.0),
        (3, 1, "2024-01-02 00:00:00", 4.0),
        (4, 2, "2024-01-01 00:00:00", 8.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_id: (r.n_24h, r.value_24h) for r in W.user_trailing_24h(ev).collect()}
    assert got[1] == (1, 1.0)
    assert got[2] == (2, 3.0)
    # event 1 fell out (exactly 24h old), event 2 still inside
    assert got[3] == (2, 6.0)
    assert got[4] == (1, 8.0)


def test_trailing_24h_single_exchange(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    df = W.user_trailing_24h(
        tables.load_table(spark, "/root/testdata/sf0.001", "events")
    )
    assert PL.exchange_count(df) == 1, PL.physical_plan(df)


def test_chunking_overlap_and_boundaries(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            ("d1", " ".join(f"t{i}" for i in range(95))),  # 3 chunks
            ("d2", "only three tokens"),  # 1 chunk
            ("d3", ""),  # no chunks
            ("d4", None),  # no chunks
        ],
        "doc_id string, text string",
    )
    rows = chunk_documents(docs, width=50, stride=40).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, {})[r.chunk_idx] = r
    assert set(by) == {"d1", "d2"}
    assert sorted(by["d1"]) == [0, 1, 2]
    assert by["d1"][0].n_chunk_tokens == 50
    assert by["d1"][1].n_chunk_tokens == 50
    assert by["d1"][2].n_chunk_tokens == 15  # tail chunk truncates
    # overlap: chunk 1 starts at token 40
    assert by["d1"][1].chunk_text.split(" ")[0] == "t40"
    assert by["d2"][0].n_chunk_tokens == 3
    # no shuffle: chunking is per-document narrow work
    df = chunk_documents(docs)
    assert PL.exchange_count(df) == 0, PL.physical_plan(df)


def test_pivot_single_aggregate_and_zeros(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    ev = spark.createDataFrame(
        [(1, "click"), (1, "click"), (1, "view"), (2, "error")],
        "user_id long, event_type string",
    )
    rows = {r.user_id: r for r in W.user_event_pivot(ev).collect()}
    assert (rows[1].n_click, rows[1].n_view, rows[1].n_error) == (2, 1, 0)
    assert rows[2].n_error == 1 and rows[2].n_click == 0
    # Catalyst lowers a declared-domain pivot to ONE aggregate pass
    df = W.user_event_pivot(ev)
    assert PL.exchange_count(df) == 1, PL.physical_plan(df)


def test_spend_quartiles_deterministic_buckets(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    orders = spark.createDataFrame(
        [(c, c * 10, "2024-01-01", float(100 - c)) for c in range(8)],
        "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double",
    )
    rows = sorted(
        (r.custkey, r.quartile)
        for r in W.customer_spend_quartiles(orders).collect()
    )
    # spend desc = custkey asc here; 8 customers -> 2 per quartile
    assert rows == [(0, 1), (1, 1), (2, 2), (3, 2), (4, 3), (5, 3), (6, 4), (7, 4)]


# --------------------------------------------------------------------------
# k-core (graph/kcore.py)
# --------------------------------------------------------------------------


def test_kcore_known_graph(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.kcore import (
        kcore,
    )

    # 4-clique {1..4} + pendant chain 4-5-6: 3-core is exactly the clique
    # (pendants peel in two rounds), each with in-core degree 3.
    pairs = list(combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6)]
    rows = sorted((r.id, r.degree) for r in kcore(_edges(spark, pairs), 3).collect())
    assert rows == [(1, 3), (2, 3), (3, 3), (4, 3)]
    # 5-core of the same graph is empty
    assert kcore(_edges(spark, pairs), 5).count() == 0


def test_kcore_matches_reference_peeling(spark):
    import collections
    import random

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.kcore import (
        kcore,
    )

    rng = random.Random(7)
    pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    pairs = [(a, b) for a, b in pairs if a != b]

    def peel(es, k):
        es = {(min(a, b), max(a, b)) for a, b in es}
        while True:
            deg = collections.Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            weak = {v for v, d in deg.items() if d < k}
            if not weak:
                return sorted(deg.items())
            es = {(a, b) for a, b in es if a not in weak and b not in weak}

    for k in (2, 3, 4):
        got = sorted((r.id, r.degree) for r in kcore(_edges(spark, pairs), k).collect())
        assert got == peel(pairs, k), f"k={k}"


def test_kcore_frees_checkpoint_scratch(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.kcore import (
        kcore,
    )

    before = len(CKPT.live_ids())
    kcore(_edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4)]), 2).count()
    assert len(CKPT.live_ids()) - before <= 1
    CKPT.release_all(spark)


def test_kcore_one_job_per_round(spark):
    """The fixpoint probe rides the checkpoint materialization (an
    Observation edge count), so each peeling round is exactly ONE Spark
    job — no separate ``weak.limit(1).count()`` degree scan (r5 verdict
    item 7). AQE is disabled for the measurement because it splits one
    materialization into one job per shuffle stage, which would make the
    count nondeterministic; the invariant under test is per-round job
    count, not AQE's stage scheduling."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.kcore import (
        kcore,
    )

    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # Path 1-2-…-8, k=2: peels two endpoints per round — edge counts
        # 7→5→3→1→0, then one convergence round: 5 loop rounds + the
        # entry canonicalization = 6 materializations = 6 jobs.
        pairs = [(i, i + 1) for i in range(1, 8)]
        sc.setJobGroup("kcore-jobcount", "one job per peeling round")
        kcore(_edges(spark, pairs), 2)
        jobs = sc.statusTracker().getJobIdsForGroup("kcore-jobcount")
        assert len(jobs) == 6, f"expected 1 job/round (6 total), got {len(jobs)}"
    finally:
        sc.setJobGroup("kcore-jobcount-done", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        CKPT.release_all(spark)


def test_collocations_pmi_values_and_bound(spark):
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        collocations_topk,
    )

    # 4 docs; (a,b) co-occur in 2, dfs: a=3, b=2, c=1
    docs = spark.createDataFrame(
        [
            ("d1", "a b"),
            ("d2", "a b"),
            ("d3", "a c"),
            ("d4", "x y z"),
        ],
        "doc_id string, text string",
    )
    rows = {(r.x, r.y): (r.c_xy, r.pmi) for r in collocations_topk(docs, vocab_k=3, k=10).collect()}
    # vocab head (df desc, token asc) at k=3: a(3), b(2), c(1) — x,y,z out
    assert all(x in "abc" and y in "abc" for x, y in rows)
    assert rows[("a", "b")] == (2, round(math.log(4 * 2 / (3 * 2)), 6))
    assert rows[("a", "c")] == (1, round(math.log(4 * 1 / (3 * 1)), 6))
    assert ("b", "c") not in rows  # never co-occur


def test_collocations_takeordered_and_broadcast(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        collocations_topk,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    df = collocations_topk(
        tables.load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_multi_source_bfs_equals_per_source(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        multi_source_shortest_paths,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph import (
        shortest_paths,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (5, 6)]  # path + separate component
    e = _edges(spark, pairs)
    multi = {
        (r.src_id, r.id): r.dist
        for r in multi_source_shortest_paths(e, [1, 5], max_hops=4).collect()
    }
    for s in (1, 5):
        single = {r.id: r.dist for r in shortest_paths(e, s, max_hops=4).collect()}
        assert {k[1]: v for k, v in multi.items() if k[0] == s} == single
    # source 5's wave never crosses into the other component
    assert (5, 4) not in multi


# --- rolling active users (warehouse.rolling_active_users) -----------------


def test_wau_hand_computed_and_trailing_window(spark):
    """3 users, known activity: the trailing-7-day distinct count is
    exact, includes days where activity only lingers from the window,
    and a user active twice in one window counts once."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        rolling_active_users,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),  # same user+day: one user-day
        (2, "2024-01-03 09:00:00"),
        (1, "2024-01-05 08:00:00"),  # u1 twice inside one window: counts once
        (3, "2024-01-20 12:00:00"),  # isolated burst
    ]
    ev = spark.createDataFrame(rows, ["user_id", "s"]).select(
        "user_id", F.col("s").cast("timestamp").alias("ts")
    )
    wau = {
        str(r.day): r.active_users
        for r in rolling_active_users(ev, window_days=7).collect()
    }
    assert wau["2024-01-01"] == 1          # u1
    assert wau["2024-01-03"] == 2          # u1 (1st), u2
    assert wau["2024-01-05"] == 2          # u1 (deduped across two days), u2
    assert wau["2024-01-09"] == 2          # u2 (3rd) and u1 (5th) linger
    assert wau["2024-01-11"] == 1          # only u1's 5th remains in window
    assert wau["2024-01-12"] == 0 if "2024-01-12" in wau else True
    assert "2024-01-12" not in wau         # window empty -> no row
    assert wau["2024-01-20"] == 1          # u3
    assert wau["2024-01-26"] == 1          # u3 lingers through day+6
    assert "2024-01-27" not in wau


def test_wau_approx_drop_in_within_5pct(spark):
    """The declared 100 TB drop-in (approx_count_distinct, HLL++) stays
    within 5% of the exact per-day distinct on real-shaped data."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        rolling_active_users,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    exact = {str(r.day): r.active_users for r in rolling_active_users(ev).collect()}
    user_days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    spread = user_days.select(
        "user_id", F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("day")
    )
    approx = {
        str(r.day): r.au
        for r in spread.groupBy("day")
        .agg(F.approx_count_distinct("user_id").alias("au"))
        .collect()
    }
    assert exact.keys() == approx.keys()
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(1, 0.05 * n), (d, n, approx[d])


# --- landmark closeness (graph/traverse.closeness_from_landmarks) ----------


def test_closeness_landmarks_path_graph(spark):
    """Path 1-2-3-4-5, landmarks {1, 5}: hand-computed distance sums;
    landmark self rows excluded; unreachable vertices absent."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        closeness_from_landmarks,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], ["src", "dst"]
    )
    rows = {
        r.id: (r.n_reached, r.dist_sum, r.closeness)
        for r in closeness_from_landmarks(edges, [1, 5], max_hops=4).collect()
    }
    # vertex 3 is 2 from each landmark: 2 reached, sum 4, c = 0.5
    assert rows[3] == (2, 4, 0.5)
    # vertex 2: d(1)=1, d(5)=3 -> 2, 4, 0.5 ; vertex 4 symmetric
    assert rows[2] == (2, 4, 0.5) and rows[4] == (2, 4, 0.5)
    # landmark 1: excludes self, reaches 5 at 4 -> (1, 4, 0.25)
    assert rows[1] == (1, 4, 0.25) and rows[5] == (1, 4, 0.25)
    # 8, 9 reach no landmark -> no row
    assert 8 not in rows and 9 not in rows


# --- robust stats (warehouse.winsorized_stats / group_zscores) -------------


def test_winsorized_stats_clips_planted_outliers(spark):
    """100 unit values + two planted outliers per side: the outliers are
    counted as clipped and the winsorized mean stays near 1."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        winsorized_stats,
    )

    rows = [(i, "click", 1.0 + (i % 10) * 0.01) for i in range(100)]
    rows += [(100, "click", 1e6), (101, "click", 2e6),
             (102, "click", -1e6), (103, "click", -2e6)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    r = winsorized_stats(ev, lo_p=0.05, hi_p=0.95).collect()[0]
    assert r.n_clipped_low >= 2 and r.n_clipped_high >= 2
    assert 0.5 < r.winsorized_mean < 1.5, "outliers must not drag the mean"
    assert r.lo <= r.hi


def test_group_zscores_normalize_per_group(spark):
    """Each group's z-scores have ~0 mean and ~1 std, and a cross-group
    scale difference disappears after normalization."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        group_zscores,
    )

    rows = [(i, "a", float(i % 7)) for i in range(70)]
    rows += [(100 + i, "b", 1000.0 + 50.0 * (i % 5)) for i in range(50)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    z = group_zscores(ev).collect()
    for g in ("a", "b"):
        zs = [r.z for r in z if r.event_type == g]
        m = sum(zs) / len(zs)
        v = sum((x - m) ** 2 for x in zs) / (len(zs) - 1)
        assert abs(m) < 1e-6, (g, m)
        assert abs(v - 1.0) < 1e-3, (g, v)


def test_group_zscores_constant_group_yields_null_not_nan(spark):
    """A (near-)constant group's rounded moments can put the variance a
    hair below zero; the clamp must make std exactly 0 (never NaN via
    sqrt(negative)) and the z-scores NULL — matching the oracle, where
    an unclamped sqrt(negative) RAISES instead of returning NaN."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        group_zscores,
    )

    # 50 × 0.12341: ssq rounds DOWN at 4dp, pushing the rounded-moment
    # variance to -2.9e-8 — the exact latent-NaN case the clamp closes.
    rows = [(i, "const", 0.12341) for i in range(50)]
    rows += [(100 + i, "vary", float(i)) for i in range(10)]
    ev = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = group_zscores(ev).collect()
    const_z = [r.z for r in out if r.event_type == "const"]
    assert len(const_z) == 50
    assert all(z is None for z in const_z), const_z[:3]
    vary_z = [r.z for r in out if r.event_type == "vary"]
    assert all(z is not None and z == z for z in vary_z)


# --- monthly growth (warehouse.monthly_revenue_growth) ---------------------


def test_monthly_growth_survives_missing_months(spark):
    """A lag-12-rows window would mis-pair across a gap; the calendar
    join must yield NULL growth when the prior period is absent and
    exact ratios when present."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        monthly_revenue_growth,
    )

    rows = [
        (1, "1995-01-10", 100.0),
        (2, "1995-02-10", 150.0),
        # March missing entirely
        (3, "1995-04-10", 200.0),
        (4, "1996-01-10", 300.0),  # YoY vs 1995-01
        (5, "1996-02-10", 150.0),  # YoY vs 1995-02 -> 0.0
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "d", "o_totalprice"]
    ).select(
        "o_orderkey",
        F.col("d").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    g = {str(r.month): (r.revenue, r.mom_pct, r.yoy_pct)
         for r in monthly_revenue_growth(orders).collect()}
    assert g["1995-01-01"] == (100.0, None, None)
    assert g["1995-02-01"] == (150.0, 0.5, None)
    # April: prior month (March) missing -> NULL MoM, not a pair with Feb
    assert g["1995-04-01"] == (200.0, None, None)
    assert g["1996-01-01"] == (300.0, None, 2.0)
    assert g["1996-02-01"] == (150.0, -0.5, 0.0)


# --- mergeable HLL sketches (operators/sketches.py) ------------------------


def test_hll_rollup_within_error_bound(spark):
    """Monthly estimates from merged daily sketches stay within the HLL
    error envelope of the exact per-month distinct (lgK=12 → rse ~1.6%;
    assert 5% with a floor for small counts)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        monthly_distinct_users,
        monthly_distinct_users_exact,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    est = {str(r.month): r.users_est for r in monthly_distinct_users(ev).collect()}
    # the exact side IS the registered oracle-checked twin
    # (events_monthly_users_exact), so this bound chains the sketch to
    # a driver-hash-verified relation through the same scaffold
    exact = {
        str(r.month): r.users
        for r in monthly_distinct_users_exact(ev).collect()
    }
    assert est.keys() == exact.keys() and est
    for m, n in exact.items():
        assert abs(est[m] - n) <= max(2, 0.05 * n), (m, n, est[m])


def test_hll_merge_consistent_with_direct_sketch(spark):
    """Merging daily sketches must estimate ~the same as one direct
    sketch over the whole period — the mergeability contract that makes
    the persisted sketch table answer rollups without fact re-scans."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        daily_user_sketches,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    merged = (
        daily_user_sketches(ev)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(2, 0.05 * exact), (merged, exact)
    assert abs(direct - exact) <= max(2, 0.05 * exact), (direct, exact)


def test_new_r5_plans_have_no_nested_loop_and_broadcast_small_sides(spark):
    """Plan-shape pin for the late-r5 operators: no BroadcastNestedLoop
    anywhere; the broadcast-back operators (z-scores, winsorize, growth)
    actually broadcast their tiny aggregate sides."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        group_zscores,
        monthly_revenue_growth,
        rolling_active_users,
        winsorized_stats,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    for df, n_bc in [
        (rolling_active_users(ev), 0),
        (group_zscores(ev), 1),
        (winsorized_stats(ev), 1),
        (monthly_revenue_growth(orders), 2),
    ]:
        plan = PL.physical_plan(df)
        assert "BroadcastNestedLoop" not in plan
        assert PL.broadcast_join_count(df) >= n_bc
