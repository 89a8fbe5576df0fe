"""Round-6 operators: containment dedup, MAD outliers, cohort retention,
plus the convergence/probe devices added this round (their tests live in
test_round5_ops.py beside the operators they extend)."""

from __future__ import annotations

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# containment pairs (operators/dedup.py containment_pairs)
# --------------------------------------------------------------------------


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_known_values(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.dedup import (
        containment_pairs,
    )

    # doc 1's token run is embedded verbatim in doc 2: every one of doc
    # 1's 3 shingles occurs among doc 2's 5 → C(1→2)=1.0, C(2→1)=0.6.
    # doc 3 shares nothing.
    corpus = _corpus(
        spark,
        [
            (1, "one two three four five"),
            (2, "zero one two three four five six"),
            (3, "alpha beta gamma delta epsilon"),
        ],
    )
    rows = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in containment_pairs(corpus, threshold=0.7).collect()
    }
    assert rows == {(1, 2): 1.0}
    # lowering the threshold surfaces the reverse orientation too
    rows2 = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in containment_pairs(corpus, threshold=0.5).collect()
    }
    assert rows2 == {(1, 2): 1.0, (2, 1): 0.6}


def test_containment_exact_dups_both_orientations(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.dedup import (
        containment_pairs,
    )

    corpus = _corpus(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
    )
    rows = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in containment_pairs(corpus, threshold=0.7).collect()
    }
    assert rows == {(1, 2): 1.0, (2, 1): 1.0}


def test_containment_asymmetric_invisible_to_jaccard(spark):
    """The motivating case: a snippet inside a much longer doc — high
    containment, low Jaccard — must surface here and NOT in the
    Jaccard-thresholded ngram pairs."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.dedup import (
        containment_pairs,
        dedup_ngram_pairs,
    )

    snippet = "alpha bravo charlie delta echo"
    filler = " ".join(f"word{i} next{i} more{i}" for i in range(12))
    corpus = _corpus(spark, [(1, snippet), (2, f"{filler} {snippet}")])
    cont = {
        (r.doc_inner, r.doc_outer)
        for r in containment_pairs(corpus, threshold=0.9).collect()
    }
    assert (1, 2) in cont
    jac = dedup_ngram_pairs(corpus, threshold=0.3).collect()
    assert not jac  # jaccard ≈ 3/38 — the symmetric metric misses it


# --------------------------------------------------------------------------
# label propagation (graph/communities.py)
# --------------------------------------------------------------------------


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b), 1.0) for a, b in pairs],
        "src long, dst long, weight double",
    )


def _python_lpa(pairs, rounds=4):
    """Reference implementation of the EXACT declared rule: synchronous,
    most-frequent neighbor label, ties to smallest label."""
    import collections

    nbrs = collections.defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    labels = {v: v for v in nbrs}
    for _ in range(rounds):
        new = {}
        for v in nbrs:
            cnt = collections.Counter(labels[u] for u in nbrs[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return labels


def test_lpa_matches_reference_on_random_graphs(spark):
    import random

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.communities import (
        label_propagation,
    )

    rng = random.Random(11)
    pairs = {(rng.randrange(25), rng.randrange(25)) for _ in range(70)}
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r.id: r.community
        for r in label_propagation(_edges_df(spark, pairs)).collect()
    }
    assert got == _python_lpa(pairs)
    CKPT.release_all(spark)


def test_lpa_separates_bridged_cliques(spark):
    from itertools import combinations

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.communities import (
        label_propagation,
    )

    # Two 5-cliques joined by a single bridge: components would merge
    # them into one; LPA keeps the dense circles apart.
    a = list(combinations(range(5), 2))
    b = list(combinations(range(10, 15), 2))
    pairs = a + b + [(4, 10)]
    got = {
        r.id: r.community
        for r in label_propagation(_edges_df(spark, pairs)).collect()
    }
    left = {got[v] for v in range(5)}
    right = {got[v] for v in range(10, 15)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert got == _python_lpa(pairs)
    CKPT.release_all(spark)


# --------------------------------------------------------------------------
# MAD outliers (operators/warehouse.py mad_outliers)
# --------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_mad_outliers_known_values(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        mad_outliers,
    )

    # median 3, deviations [2,1,0,1,97] → MAD 1; rz(100)=0.6745*97=65.4265
    ev = _events(
        spark, [(i, "x", v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
    )
    rows = {r.event_id: (r.robust_z, r.is_outlier) for r in mad_outliers(ev).collect()}
    assert rows[4] == (65.4265, True)
    assert rows[2] == (0.0, False)
    assert rows[0] == (-1.349, False)
    assert [r for r, o in rows.values() if o] == [65.4265]


def test_mad_outliers_zero_mad_group_is_null_not_crash(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        mad_outliers,
    )

    # ≥ half the rows at the median → MAD 0 → NULL z, never an outlier
    ev = _events(spark, [(i, "z", v) for i, v in enumerate([5.0, 5.0, 5.0, 9.0])])
    rows = mad_outliers(ev).collect()
    assert all(r.robust_z is None for r in rows)
    assert all(r.is_outlier is False for r in rows)


def test_mad_outliers_robust_where_zscore_is_dragged(spark):
    """The reason MAD exists: the outlier inflates the std ~50x and so
    compresses its own classic z to ~4.4, while the modified z — whose
    MAD the outlier cannot move — reads ~133. 20 unit-spaced points +
    one at 1000."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        group_zscores,
        mad_outliers,
    )

    vals = [float(i) for i in range(20)] + [1000.0]
    ev = _events(spark, [(i, "x", v) for i, v in enumerate(vals)])
    z = {r.event_id: r.z for r in group_zscores(ev).collect()}
    rz = {r.event_id: r.is_outlier for r in mad_outliers(ev).collect()}
    assert abs(z[20]) < 4.5  # classic z dragged by its own outlier
    assert rz[20] is True  # modified z is not
    assert sum(rz.values()) == 1


def test_containment_matches_reference_on_random_corpora(spark):
    """Brute-force reference: with the df cap far above the corpus size
    every co-shingling pair is a candidate, so containment_pairs must
    equal exact shingle-set containment for all pairs sharing ≥1
    shingle. Random corpora over a tiny vocabulary force heavy shingle
    sharing."""
    import random

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.dedup import (
        containment_pairs,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 12))))
        for i in range(14)
    ]

    def shingles(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            if not inter:
                continue
            ca, cb = round(inter / len(sa), 6), round(inter / len(sb), 6)
            if ca >= 0.5:
                want[(ida, idb)] = ca
            if cb >= 0.5:
                want[(idb, ida)] = cb

    got = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in containment_pairs(_corpus(spark, docs), threshold=0.5).collect()
    }
    assert got == want


def test_mad_outliers_matches_statistics_reference(spark):
    """Reference: statistics.median on raw values and absolute
    deviations, with the operator's declared 6dp rounding edges."""
    import random
    import statistics

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        mad_outliers,
    )

    rng = random.Random(3)
    groups = {
        "a": [round(rng.uniform(-50, 50), 3) for _ in range(37)],
        "b": [round(rng.expovariate(0.1), 3) for _ in range(24)],
    }
    rows, want = [], {}
    eid = 0
    for g, vals in groups.items():
        med = round(statistics.median(vals), 6)
        mad = round(statistics.median(abs(v - med) for v in vals), 6)
        for v in vals:
            rz = round((v - med) * 0.6745 / mad, 6) if mad else None
            want[eid] = (rz, bool(rz is not None and abs(rz) > 3.5))
            rows.append((eid, g, float(v)))
            eid += 1
    got = {
        r.event_id: (r.robust_z, r.is_outlier)
        for r in mad_outliers(_events(spark, rows)).collect()
    }
    assert got == want


def test_kcore_and_lpa_degenerate_inputs(spark):
    """Empty and single-edge graphs must degrade, not crash, through
    the new fixpoint/round machinery."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.communities import (
        label_propagation,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.kcore import (
        kcore,
    )

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    assert kcore(empty, 2).count() == 0
    one = _edges_df(spark, [(1, 2)])
    assert kcore(one, 1).count() == 2
    assert kcore(one, 2).count() == 0
    got = {r.id: r.community for r in label_propagation(one).collect()}
    # a lone edge OSCILLATES under sync LPA (declared fixed-K semantics);
    # the reference implementation is the ground truth either way
    assert got == _python_lpa([(1, 2)])
    CKPT.release_all(spark)


# --------------------------------------------------------------------------
# pinned landmark sketch (graph/traverse.py pinned_landmark_distances)
# --------------------------------------------------------------------------


def test_landmark_sketch_built_once_and_shared(spark):
    """The landmark distance sketch is an index: the iterative BFS runs
    once per (graph, landmarks) pin, and both the raw-distance relation
    and the closeness aggregate serve from it. A second consumer must
    launch only its own aggregate jobs — the multi-superstep traversal
    (one job per hop via the tracked checkpoints) must not re-run."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        closeness_from_landmarks,
        pinned_landmark_distances,
    )

    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        pairs = [(i, i + 1) for i in range(1, 10)] + [(2, 7), (4, 9)]
        edges = _edges_df(spark, pairs)
        pinned_landmark_distances(edges, [1, 5], max_hops=3).count()  # build

        sc.setJobGroup("landmark-reuse", "serve from the pinned sketch")
        closeness_from_landmarks(edges, [1, 5], max_hops=3).count()
        jobs = sc.statusTracker().getJobIdsForGroup("landmark-reuse")
        # one aggregate job over the pinned relation — a re-run of the
        # 3-hop traversal would need >= 3 checkpoint jobs on top
        assert len(jobs) == 1, f"sketch not reused: {len(jobs)} jobs"
    finally:
        sc.setJobGroup("landmark-reuse-done", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        PIN.release_all()
        CKPT.release_all(spark)


# --------------------------------------------------------------------------
# count-min sketch (operators/sketches.py)
# --------------------------------------------------------------------------


def test_cms_estimate_dominates_exact_and_is_bounded(spark):
    """CMS never underestimates, and the overestimate is collision mass
    bounded by the sketch row sums (≤ N per depth). Skewed fixture: one
    heavy user among many light ones."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    rows = [(i, 7) for i in range(500)] + [
        (500 + i, i % 97 + 100) for i in range(400)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    out = {r.user_id: (r.exact_cnt, r.cms_est) for r in cms_heavy_hitters(ev, 5).collect()}
    assert out[7][0] == 500  # the heavy hitter leads with its exact count
    n = len(rows)
    for exact, est in out.values():
        assert est >= exact  # CMS property: only overestimates
        assert est <= n  # a counter can never exceed the stream length
    assert len(out) == 5


def test_cms_sketch_is_mergeable(spark):
    """Counters ADD: sketch(A ∪ B) == sketch(A) + sketch(B) bucket-wise
    — the partial-aggregation algebra that makes per-day sketches roll
    up without fact re-scans."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        cms_sketch,
    )

    a = spark.createDataFrame(
        [(i, i % 13) for i in range(200)], "event_id long, user_id long"
    )
    b = spark.createDataFrame(
        [(i, i % 7) for i in range(150)], "event_id long, user_id long"
    )
    whole = {
        (r.depth, r.bucket): r.cnt
        for r in cms_sketch(a.unionAll(b), "user_id").collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms_sketch(part, "user_id").collect():
            merged[(r.depth, r.bucket)] = merged.get((r.depth, r.bucket), 0) + r.cnt
    assert whole == merged


def test_streaming_cms_converges_to_batch(spark, tmp_path):
    """Drained incremental CMS counters must be IDENTICAL to the batch
    sketch of the full corpus (bucket-wise merge algebra), and a
    checkpointed re-drain over the same landing data must add nothing."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        StreamingCmsAccumulator,
        cms_sketch,
    )

    ev = spark.createDataFrame(
        [(i, i % 23) for i in range(600)], "event_id long, user_id long"
    )
    landing = str(tmp_path / "landing")
    ev.repartition(6).write.mode("overwrite").parquet(landing)

    acc = StreamingCmsAccumulator(spark, str(tmp_path / "wh"), "user_id")
    acc.run_available_now(
        landing, str(tmp_path / "ckpt"),
        "event_id long, user_id long", max_files_per_trigger=1,
    )
    want = {(r.depth, r.bucket): r.cnt for r in cms_sketch(ev, "user_id").collect()}
    got = {(r.depth, r.bucket): r.cnt for r in acc.counters().collect()}
    assert got == want

    acc.run_available_now(  # replay: checkpoint makes it a no-op
        landing, str(tmp_path / "ckpt"),
        "event_id long, user_id long", max_files_per_trigger=1,
    )
    again = {(r.depth, r.bucket): r.cnt for r in acc.counters().collect()}
    assert again == want


def test_streaming_cms_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch re-delivered after a crash
    between table swap and checkpoint commit must be skipped via the
    _applied_batch_id marker, not double-summed (r6 ADVICE, medium)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        StreamingCmsAccumulator,
    )

    ev = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "event_id long, user_id long"
    )
    acc = StreamingCmsAccumulator(spark, str(tmp_path / "wh"), "user_id")
    acc._process_batch(ev, 0)
    once = {(r.depth, r.bucket): r.cnt for r in acc.counters().collect()}
    assert acc._applied_batch_id() == 0

    acc._process_batch(ev, 0)  # retry of an already-applied batch
    assert {
        (r.depth, r.bucket): r.cnt for r in acc.counters().collect()
    } == once

    acc._process_batch(ev, 1)  # a genuinely new batch still lands
    doubled = {(r.depth, r.bucket): r.cnt for r in acc.counters().collect()}
    assert doubled == {k: 2 * v for k, v in once.items()}
    assert acc._applied_batch_id() == 1


# --------------------------------------------------------------------------
# retention cohorts (operators/warehouse.py retention_cohorts)
# --------------------------------------------------------------------------


def test_retention_cohorts_known_matrix(spark):
    import datetime

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        retention_cohorts,
    )

    def o(cust, day):
        return (cust, datetime.datetime.fromisoformat(day))

    orders = spark.createDataFrame(
        [
            o(1, "2024-01-05"),  # cohort Jan
            o(1, "2024-01-20"),  # same month — distinct-activity collapses
            o(1, "2024-02-11"),
            o(2, "2024-01-09"),  # cohort Jan, never returns
            o(3, "2024-02-02"),  # cohort Feb
            o(3, "2024-04-27"),
        ],
        "o_custkey long, o_orderdate timestamp",
    )
    rows = {
        (str(r.cohort_month), r.month_offset): (r.n_customers, r.retention)
        for r in retention_cohorts(orders).collect()
    }
    assert rows == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-02-01", 0): (1, 1.0),
        ("2024-02-01", 2): (1, 1.0),
    }


def test_round6_plan_shapes(spark):
    """The scale-relevant plan properties of the round-6 operators:
    mad_outliers broadcasts its two tiny stats relations instead of
    windowing raw rows; retention_cohorts likewise never sorts raw rows
    per group; cms_sketch is one Exchange (explode is narrow, the
    aggregate map-side-combines)."""
    import datetime

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sketches import (
        cms_sketch,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        mad_outliers,
        retention_cohorts,
    )

    ev = _events(spark, [(i, "x", float(i)) for i in range(50)])
    plan = mad_outliers(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan  # per-row z via join, never a raw-row window

    orders = spark.createDataFrame(
        [(i % 7, datetime.datetime(2024, 1 + i % 3, 1 + i % 25)) for i in range(60)],
        "o_custkey long, o_orderdate timestamp",
    )
    rplan = retention_cohorts(orders)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in rplan

    ev2 = spark.createDataFrame(
        [(i, i % 9) for i in range(100)], "event_id long, user_id long"
    )
    splan = cms_sketch(ev2, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert splan.count("Exchange") == 1  # one shuffle builds the sketch
    assert "partial_count" in splan  # map-side combine before it


def test_retention_cohorts_matches_reference(spark):
    """Full pure-Python reference on random order logs: distinct
    (customer, month) activity, cohort = min month, counts per
    (cohort, whole-month offset), retention vs the offset-0 cell."""
    import collections
    import datetime
    import random

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        retention_cohorts,
    )

    rng = random.Random(29)
    rows = [
        (
            rng.randrange(30),
            datetime.datetime(2023 + rng.randrange(2), rng.randrange(1, 13), rng.randrange(1, 28)),
        )
        for _ in range(400)
    ]
    activity = {(c, (d.year, d.month)) for c, d in rows}
    cohort = {}
    for c, m in activity:
        cohort[c] = min(cohort.get(c, m), m)
    cells = collections.Counter()
    for c, m in activity:
        cm = cohort[c]
        off = (m[0] - cm[0]) * 12 + (m[1] - cm[1])
        cells[(cm, off)] += 1
    want = {}
    for (cm, off), n in cells.items():
        want[(f"{cm[0]}-{cm[1]:02d}-01", off)] = (n, round(n / cells[(cm, 0)], 6))

    orders = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    got = {
        (str(r.cohort_month), r.month_offset): (r.n_customers, r.retention)
        for r in retention_cohorts(orders).collect()
    }
    assert got == want


def test_retention_cohorts_offset0_always_full(spark):
    import datetime
    import random

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        retention_cohorts,
    )

    rng = random.Random(13)
    rows = [
        (
            rng.randrange(40),
            datetime.datetime(2024, rng.randrange(1, 13), rng.randrange(1, 28)),
        )
        for _ in range(300)
    ]
    orders = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    out = retention_cohorts(orders).collect()
    zero = [r for r in out if r.month_offset == 0]
    assert zero and all(r.retention == 1.0 for r in zero)
    assert all(0.0 < r.retention <= 1.0 for r in out)
    # cohort sizes are monotone upper bounds for every later cell
    size = {str(r.cohort_month): r.n_customers for r in zero}
    assert all(r.n_customers <= size[str(r.cohort_month)] for r in out)
