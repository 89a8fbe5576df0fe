"""Physical-plan shape assertions (SURVEY §4): pin the plans we'd want at
100 TB so refactors that silently de-optimize fail here, not on a cluster.

Each test states the scale argument it protects."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    graph as G,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    plans as PL,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    search as S,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    upsert,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


def test_dim_join_broadcasts(spark):
    """customer ⋈ nation (25-row dim) must broadcast — a sort-merge join
    here would shuffle the full fact side at every scale."""
    bt = tables.bizcard_text_records(spark, SF)
    assert PL.broadcast_join_count(bt) >= 1
    assert PL.sort_merge_join_count(bt) == 0
    assert PL.exchange_count(bt) == 0


def test_one_hop_paths_hydration_broadcasts(spark):
    """O37's double vertex-name hydration must broadcast the (small)
    vertex dim on BOTH joins — a silent fallback to sort-merge would
    shuffle the full edge relation twice (the r3 bench regression
    suspicion; pinned so it can't happen unnoticed). At a scale where
    the vertex dim outgrows the broadcast threshold, co-located
    bucketing is the intended physical strategy — this test pins the
    small-dim regime the bench measures."""
    v = tables.user_graph_vertices(spark, SF)
    e = tables.user_graph_edges(spark, SF)
    p = G.one_hop_paths(v, e)
    assert PL.sort_merge_join_count(p) == 0, PL.physical_plan(p)
    assert PL.broadcast_join_count(p) >= 2


def test_pymk_single_user_never_shuffles_edges(spark):
    """Single-user PYMK: user row + friend set broadcast to both hop
    joins and the anti-join; the only shuffles are the groupBy on
    candidate id and the symmetrize union feeding the cache. The big
    edge table must NOT sort-merge."""
    v = tables.user_graph_vertices(spark, SF)
    e = tables.user_graph_edges(spark, SF)
    p = G.pymk(v, e, "user_3", 10)
    assert PL.sort_merge_join_count(p) == 0
    assert PL.broadcast_join_count(p) >= 3
    assert PL.has_take_ordered(p), "top-k must compile to TakeOrderedAndProject"


def test_pymk_all_shuffle_budget(spark):
    """Batch PYMK's shuffle count is the scale cost driver (every exchange
    moves Σdeg²-derived rows). Pin the budget so a refactor that adds an
    exchange — or degrades the whale/normal split into extra sort-merge
    passes — fails here. The bound is the measured distinct-exchange count
    of the intended plan (hop2 split + half-aggregate + anti-join +
    window), not a target; tightening it is welcome, exceeding it is not."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.pymk import (
        pymk_all,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.pinned import (
        release_all,
    )

    # drop both the block cache AND the pinned registry — a stale pinned
    # handle whose cache was cleared makes the plan repeat the bi subtree
    # per consumer with fresh node ids, inflating the count.
    release_all()
    spark.catalog.clearCache()
    e = tables.user_graph_edges(spark, SF)
    p = pymk_all(e)
    try:
        assert PL.exchange_count(p) <= 16, PL.physical_plan(p)
    finally:
        release_all()


def test_parquet_pushdown_and_pruning(spark):
    """Predicate + projection must reach the scan: reading 2 of 5 columns
    with a pushed range filter is the difference between scanning 100 TB
    and scanning what the query needs."""
    docs = (
        tables.load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    pushed = PL.pushed_filters(docs)
    assert any("LessThan(doc_id" in p for p in pushed), pushed
    schemas = PL.read_schema_columns(docs)
    assert schemas and schemas[0] == {"doc_id", "text"}, schemas


def test_search_topk_is_take_ordered(spark):
    """orderBy(desc(score)).limit(k) must never global-sort."""
    docs = tables.load_table(spark, SF, "documents")
    hits = S.search_documents(docs, "spark join vector", limit=10)
    assert PL.has_take_ordered(hits)


def test_latest_by_key_single_shuffle(spark):
    """The keyed upsert is one hash-partition shuffle + window; a second
    exchange would mean the partitioning wasn't reused by row_number."""
    ev = tables.load_table(spark, SF, "events")
    latest = upsert.latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    assert PL.exchange_count(latest) == 1


def test_bfs_frontier_broadcast_gated(spark):
    """The BFS frontier join must not force-broadcast an arbitrarily large
    frontier (hop-2 on a social graph can be most of the vertex set; a
    forced multi-GB broadcast OOMs at 100× scale). The hint is gated on
    the known frontier row count; above the bound the logical plan must
    carry NO broadcast hint — AQE picks the strategy from runtime sizes."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph import (
        traverse,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.model import (
        symmetrize,
    )

    e = tables.user_graph_edges(spark, SF)
    bi = symmetrize(e).select("src", "dst")
    dist = spark.createDataFrame([(1, 0)], "id long, dist int")
    frontier = dist.select("id")

    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    small = traverse.expand_frontier(
        bi, frontier, dist, 1, frontier_rows=1, broadcast_max=10
    )
    assert "strategy=broadcast" in analyzed(small)

    big = traverse.expand_frontier(
        bi, frontier, dist, 1, frontier_rows=11, broadcast_max=10
    )
    assert "strategy=broadcast" not in analyzed(big)


def test_bfs_result_invariant_to_broadcast_gate(spark):
    """Shuffle-join BFS (broadcast_max=0) must produce the identical
    distance map — the gate is a physical choice, not a semantic one."""
    e = tables.user_graph_edges(spark, SF)
    hinted = {tuple(r) for r in G.shortest_paths(e, 1, max_hops=3).collect()}
    gated = {
        tuple(r)
        for r in G.shortest_paths(e, 1, max_hops=3, broadcast_max=0).collect()
    }
    assert hinted == gated and len(hinted) > 1


def test_kmeans_broadcasts_centroids(spark):
    """k-means at scale: the N-side embedding table must stream against
    BROADCAST centroids (k rows) in every Lloyd pass — a sort-merge join
    or an N-side shuffle per iteration would move the full corpus once
    per round. Budget: the seed TakeOrdered + per-round mean aggregates
    only (4 exchanges at iters=2)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        clustering,
    )

    emb = tables.load_table(spark, SF, "embeddings")
    km = clustering.kmeans_assign(emb, k=4, iters=2)
    plan = PL.physical_plan(km)
    assert "BroadcastNestedLoopJoin" in plan  # crossJoin(broadcast(cents))
    assert PL.sort_merge_join_count(km) == 0
    assert PL.exchange_count(km) <= 4, plan


def test_curation_reuses_pinned_dedup_relations(spark):
    """The curation pipeline must consume the SAME pinned LSH relations
    as the standalone minhash query (shared semanticHash keys) — at
    100 TB, re-shingling the corpus for the pipeline would double the
    most expensive stage."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        curation,
        dedup as D,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.pinned import (
        pinned_keys,
        release_all,
    )

    release_all()
    spark.catalog.clearCache()
    corpus = D.aug_corpus(tables.load_table(spark, SF, "documents"))
    D.dedup_minhash_lsh(corpus, threshold=0.5).count()
    keys_after_dedup = set(pinned_keys())
    curation.curate(corpus).count()
    try:
        new_keys = set(pinned_keys()) - keys_after_dedup
        assert keys_after_dedup <= set(pinned_keys()), (
            "curation must not re-pin or replace the LSH relations"
        )
        assert {k[0] for k in new_keys} == {"text_gates"}, (
            f"curation may add only its gate-metadata pin, got {new_keys}"
        )
        # Different gate thresholds must REUSE the pinned gate metadata —
        # thresholds live outside the pin.
        keys_now = set(pinned_keys())
        curation.curate(corpus, lang="de", min_quality=0.2).count()
        assert set(pinned_keys()) == keys_now, (
            "a different (lang, min_quality) setting must not add pins"
        )
    finally:
        release_all()


def test_minhash_agg_reuses_doc_partitioning(spark):
    """by_doc's repartition(doc_id) must satisfy the signature groupBy —
    exactly one shuffle of raw text, none of the exploded shingle bag."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        dedup as D,
    )

    # plan-cache substitution from earlier tests' persisted shingle tables
    # would rewrite this plan; audit the uncached shape.
    spark.catalog.clearCache()
    corpus = D.aug_corpus(tables.load_table(spark, SF, "documents"))
    sigs = D.minhash_signatures(corpus)
    # repartition(text) = 1 exchange; groupBy(doc_id) must add none.
    assert PL.exchange_count(sigs) == 1, PL.physical_plan(sigs)


def test_pricing_summary_pushdown_single_exchange(spark):
    """Q1 shape: the shipdate filter reaches the parquet scan and the
    whole query is one partial+final aggregation — a second exchange
    would mean the combine isn't map-side."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    q1 = W.pricing_summary(tables.load_table(spark, SF, "lineitem"))
    assert any("l_shipdate" in f for f in PL.pushed_filters(q1)), (
        "shipdate filter must push into the scan"
    )
    assert PL.exchange_count(q1) == 1


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    """Bucketed layout (sources/bucketed.py): a self-join of the edge
    table on its bucket key must plan with ZERO Exchange operators —
    bucket co-location is the persistent answer to the per-query
    reshuffle of the big fact relations at 100 TB. The same join over
    the raw (unbucketed) files must show the shuffles it saves."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.bucketed import (
        read_bucketed,
        write_bucketed,
    )

    e = tables.user_graph_edges(spark, SF)
    write_bucketed(
        e, "edges_by_src_test", "src", n_buckets=4,
        path=str(tmp_path / "edges_bucketed"),
    )
    try:
        be = read_bucketed(spark, "edges_by_src_test")
        a = be.select(F.col("src").alias("k"), F.col("dst").alias("d1"))
        b = be.select(F.col("src").alias("k"), F.col("dst").alias("d2"))
        # disable auto-broadcast so the co-location (not a broadcast)
        # is what eliminates the exchanges
        saved_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "k")
            assert PL.exchange_count(joined) == 0, PL.physical_plan(joined)

            raw = spark.read.parquet(str(tmp_path / "edges_bucketed"))
            ra = raw.select(F.col("src").alias("k"), F.col("dst").alias("d1"))
            rb = raw.select(F.col("src").alias("k"), F.col("dst").alias("d2"))
            assert PL.exchange_count(ra.join(rb, "k")) >= 2
            # bucketing is physical only: identical join results
            assert joined.count() == ra.join(rb, "k").count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_abt)
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_by_src_test")


def test_region_revenue_broadcasts_dims(spark):
    """Q5 shape: nation and region ship as broadcasts; the lineitem fact
    path must never be the build side of anything."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    q5 = W.region_revenue(
        tables.load_table(spark, SF, "lineitem"),
        tables.load_table(spark, SF, "orders"),
        tables.load_table(spark, SF, "customer"),
        tables.load_table(spark, SF, "nation"),
        tables.load_table(spark, SF, "region"),
    )
    assert PL.broadcast_join_count(q5) >= 2


def test_pricing_rollup_single_scan_expand(spark):
    """ROLLUP must compile to ONE fact-table scan (filter pushed) feeding
    an Expand + single partial/final aggregate — not one job per grouping
    set; the device that makes subtotal reports affordable at 100 TB."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    df = W.pricing_rollup(tables.load_table(spark, SF, "lineitem"))
    plan = PL.physical_plan(df)
    assert "Expand" in plan
    assert len(PL.read_schema_columns(df)) == 1  # exactly one scan
    assert any("l_shipdate" in p for p in PL.pushed_filters(df))


def test_partitioned_layout_prunes_files(spark, tmp_path):
    """Date-partitioned layout (sources/partitioned.py): a one-day filter
    must reach the scan as a PartitionFilter and the file index must keep
    ONLY the matching day's files — the 100 TB log-query device."""
    import datetime

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.partitioned import (
        read_partitioned,
        write_partitioned,
    )

    ev = tables.load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_day")
    write_partitioned(
        ev.withColumn("event_date", F.to_date("ts")), path, "event_date"
    )
    t = read_partitioned(spark, path)
    day = datetime.date(2024, 1, 15)
    q = t.filter(F.col("event_date") == F.lit(day)).select("event_id")

    # the day predicate must be a PARTITION filter (file-index pruning),
    # fully consumed there — no residual row-level DataFilter remains.
    # executedPlan().toString() carries the scan's full filter detail.
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan, plan
    assert "= 2024-01-15" in plan, plan
    assert "DataFilters: []" in plan, plan
    # semantic equivalence with the unpartitioned filter
    base = ev.filter(F.to_date("ts") == F.lit(day)).count()
    assert q.count() == base and base > 0


def test_revenue_forecast_pushdown_and_no_joins(spark):
    """Q6 probe: all three predicates must reach the parquet scan; the
    plan has zero joins and a single global aggregate."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    df = W.revenue_forecast(tables.load_table(spark, SF, "lineitem"))
    pushed = " ".join(PL.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed
    plan = PL.physical_plan(df)
    assert "Join" not in plan
    # only the 4 needed columns are read
    assert len(PL.read_schema_columns(df)) <= 4


def test_orders_returns_semi_join(spark):
    """EXISTS form must plan as a semi join (no row multiplication) with
    the returnflag filter pushed into the lineitem scan."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        warehouse as W,
    )

    df = W.orders_with_returns_by_priority(
        tables.load_table(spark, SF, "orders"),
        tables.load_table(spark, SF, "lineitem"),
    )
    plan = PL.physical_plan(df)
    assert "LeftSemi" in plan, plan
    assert any("l_returnflag" in p for p in PL.pushed_filters(df))


def test_substring_dedup_no_nested_loop(spark):
    """Exact-substring dedup (operators/dedup.py duplicated_spans) must
    plan its candidate step as a shuffled/broadcast EQUI-join on the
    window text — a nested-loop anywhere means the prefix blocking
    regressed to all-pairs, which is quadratic at corpus scale."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        dedup as D,
    )

    df = D.duplicated_spans(tables.load_table(spark, SF, "documents"))
    plan = PL.physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # only the two needed columns reach any scan
    for cols in PL.read_schema_columns(df):
        assert cols <= {"doc_id", "text"}, cols
    # r8 verdict item 1: the ≥2-occurrences count must NOT be a window
    # over Window.partitionBy(gh) — an unbounded window partition
    # serializes every position of one hot boilerplate gram through a
    # single WindowExec task at 100 TB. The count must be a partial-
    # aggregated groupBy (map-side combined) joined back; the only
    # Window allowed anywhere in this plan is none at all.
    assert "Window" not in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_ses_levels_no_window_over_facts(spark):
    """SES (operators/timeseries.py ses_levels) must keep the sequential
    recurrence OUT of the distributed plan: one grouped month aggregate
    + one single-row collect_list fold — zero Window operators (a
    window over raw facts would sort the whole fact table per series at
    100 TB) and zero joins. Exchanges: month groupBy + the global
    1-row aggregate only."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.timeseries import (
        ses_levels,
    )

    df = ses_levels(
        tables.load_table(spark, SF, "orders"), "o_orderdate", "o_totalprice"
    )
    plan = PL.physical_plan(df)
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert PL.exchange_count(df) <= 2, plan
    # column pruning: only the two needed columns reach the scan
    for cols in PL.read_schema_columns(df):
        assert cols <= {"o_orderdate", "o_totalprice"}, cols


def test_weighted_paths_bounds_checkpoints(spark):
    """Bellman–Ford (graph/traverse.py weighted_shortest_paths) must
    free each superstep's tracked checkpoint as the next lands —
    live-checkpoint state is O(1) in the round count, or a 30-round run
    on a real cluster pins 30 copies of the distance relation."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        weighted_shortest_paths,
    )

    e = tables.user_graph_edges(spark, SF)
    before = CKPT.live_ids()
    d = weighted_shortest_paths(e, 3, max_hops=4)
    assert d.count() > 0
    added = CKPT.live_ids() - before
    # one localCheckpoint survives (the final round's); each round freed
    # its predecessor. localCheckpoint may persist 1-2 RDD ids per call.
    assert len(added) <= 2, added
    CKPT.free(spark, added)


def test_bpe_encode_broadcasts_vocabulary(spark):
    """Corpus-side BPE encode (functions/text.py bpe_tokens_per_doc)
    must broadcast the vocabulary-sized segment table against the
    exploded corpus — a sort-merge here shuffles the full corpus at
    every scale."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        bpe_tokens_per_doc,
    )

    df = bpe_tokens_per_doc(tables.load_table(spark, SF, "documents"), 2)
    # the returned relation is a materialized checkpoint; assert on the
    # plan the builder DECLARED by rebuilding the join un-checkpointed
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        _bpe_fit,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.search.index import (
        tokenize,
    )

    docs = tables.load_table(spark, SF, "documents")
    _m, words, ids, _s = _bpe_fit(docs, 2, "text")
    join = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
        .join(F.broadcast(words.select("word", F.size("syms").alias("n"))), "word")
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_subwords"))
    )
    assert PL.broadcast_join_count(join) >= 1, PL.physical_plan(join)
    assert PL.sort_merge_join_count(join) == 0
    assert df.count() > 0
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )

    CKPT.free(spark, ids)


def test_tfidf_broadcasts_document_frequency(spark):
    """TF-IDF top-k (functions/text.py tfidf_top_terms): the
    vocabulary-sized document-frequency dim must broadcast — a token-
    keyed shuffle of the full tf relation tripled the sf1 time (r8)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        tfidf_top_terms,
    )

    df = tfidf_top_terms(tables.load_table(spark, SF, "documents"))
    assert PL.broadcast_join_count(df) >= 1, PL.physical_plan(df)
    assert PL.sort_merge_join_count(df) == 0


def test_tfidf_broadcast_gated_on_vocabulary_estimate(spark, monkeypatch):
    """r8 ADVICE: the broadcast hint is honored regardless of actual
    size, so it must be GATED. With the planner's own auto-broadcast
    disabled, only an explicit hint can produce a BroadcastHashJoin —
    so the dfreq join broadcasts under the normal cap (hint present)
    and falls back to a shuffle join when the cap is forced to zero
    (a stand-in for a vocabulary outgrowing the broadcast limit).
    Results are identical either way (same equi-join)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions import (
        text as T,
    )

    docs = tables.load_table(spark, SF, "documents")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = T.tfidf_top_terms(docs)
        assert PL.broadcast_join_count(hinted) >= 1, PL.physical_plan(hinted)
        monkeypatch.setattr(T, "BROADCAST_DIM_CAP_BYTES", 0)
        gated = T.tfidf_top_terms(docs)
        assert PL.broadcast_join_count(gated) == 0, PL.physical_plan(gated)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_dsir_model_joins_broadcast(spark):
    """DSIR scoring (functions/text.py dsir_weights): both model-side
    joins (totals combine, per-bucket log-ratio) are constant-width —
    they must broadcast; a sort-merge would shuffle the per-doc feature
    relation against a 256-row model."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        dsir_weights,
    )

    df = dsir_weights(
        tables.load_table(spark, SF, "documents"), F.col("lang") == "en"
    )
    plan = PL.physical_plan(df)
    # per-bucket log-ratio joins as a broadcast hash join; the totals
    # combine is the house 1-row BroadcastNestedLoopJoin cross
    assert PL.broadcast_join_count(df) >= 1, plan
    assert PL.sort_merge_join_count(df) == 0
    assert "CartesianProduct" not in plan, plan


def test_training_manifest_mixture_broadcasts(spark):
    """Composed manifest (operators/curation.py training_manifest): the
    |sources|-row mixture dim must broadcast into the shard relation."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.curation import (
        training_manifest,
    )

    df = training_manifest(tables.load_table(spark, SF, "documents"))
    assert PL.broadcast_join_count(df) >= 1, PL.physical_plan(df)
    assert df.count() > 0


def test_new_text_queries_prune_columns(spark):
    """r8 text queries: only needed columns reach any parquet scan —
    a scan pulling unused columns multiplies 100 TB of IO."""
    import __spark_entry__ as E

    qs = E.queries()
    expected = {
        "docs_dsir_weights": {"doc_id", "text", "lang"},
        "docs_substring_stripped": {"doc_id", "text"},
        "split_decontaminated_train": {"doc_id", "text"},
    }
    for name, allowed in expected.items():
        df = qs[name](spark, SF)
        for cols in PL.read_schema_columns(df):
            assert cols <= allowed, (name, cols)


def test_bpe_encode_heldout_plan(spark):
    """BPE inference encode (functions/text.py bpe_encode_tokens_per_doc):
    the held-out corpus must never sort-merge against the segment-length
    dim — under the size gate the dim broadcasts (the corpus-side scan
    stays shuffle-free until the per-doc sum), and the k merge folds
    must collapse into projections, not joins or shuffles per merge."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        bpe_encode_tokens_per_doc,
    )

    docs = tables.load_table(spark, SF, "documents")
    df = bpe_encode_tokens_per_doc(docs, docs, 4)
    plan = PL.physical_plan(df)
    assert PL.sort_merge_join_count(df) == 0, plan
    assert PL.broadcast_join_count(df) >= 1, plan
    # shuffles: distinct-word agg, (train-side vocab aggregates), and
    # the final per-doc sum — NOT one per merge round (the folds are
    # collapsed column expressions). 4 merges must not add 4 exchanges.
    assert PL.exchange_count(df) <= 5, plan


def test_unigram_encode_broadcasts_piece_dim(spark):
    """Unigram-LM corpus encode (functions/text.py
    unigram_tokens_per_doc): the word → piece-count dim is vocabulary-
    sized (Heaps' law) and must broadcast into the exploded corpus scan
    — a sort-merge here shuffles the 100 TB side."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        unigram_tokens_per_doc,
    )

    df = unigram_tokens_per_doc(tables.load_table(spark, SF, "documents"))
    assert PL.broadcast_join_count(df) >= 1, PL.physical_plan(df)
    assert PL.sort_merge_join_count(df) == 0
    assert df.count() > 0
    PIN.release_all()


def test_quality_classifier_broadcasts_model(spark):
    """Classifier gate (functions/text.py quality_classifier_margin):
    the n_buckets-row weight relation is a constant dim — always
    broadcast, never a shuffle of the hashed-features side."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        quality_classifier_margin,
    )

    df = quality_classifier_margin(tables.load_table(spark, SF, "documents"))
    assert PL.broadcast_join_count(df) >= 1, PL.physical_plan(df)
    assert PL.sort_merge_join_count(df) == 0


def test_semantic_dedup_no_nested_loop(spark):
    """Semantic dedup (operators/dedup.py semantic_dedup): candidate
    pairs come from the k-means-cluster equi-join — the plan must show
    NO BroadcastNestedLoopJoin / CartesianProduct (all-pairs would be
    N² at any scale; the cluster id is the blocking key)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.dedup import (
        semantic_dedup,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.similarity import (
        semdedup_aug_embeddings,
    )

    emb = semdedup_aug_embeddings(tables.load_table(spark, SF, "embeddings"))
    df = semantic_dedup(emb, threshold=0.9)
    plan = PL.physical_plan(df)
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the 1-row centroid/total folds;
    # the PAIR join itself must be an equi-join on the cluster key
    assert "vec_a" not in [
        ln for ln in plan.splitlines() if "NestedLoop" in ln
    ], plan
    assert df.count() > 0
    PIN.release_all()


def test_knn_refine_no_cartesian_and_bounded_candidates(spark):
    """The NN-Descent round must stay candidate-bounded: the two-hop
    expansion is two EQUI-self-joins on the edge relation and the
    re-score is the blocked-pair Arrow group — no CartesianProduct and
    no data-sized NestedLoop anywhere in the plan (the only crossJoin
    in the similarity family is a 1-row centroid fold inside the seed
    graph build)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as S,
    )

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    emb = tables.load_table(spark, SF, "embeddings")
    df = S.knn_refine(emb, k=3, nprobe=1)
    plan = PL.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert df.count() > 0
    PIN.release_all()


def test_av_manifest_no_cartesian(spark):
    """The AV manifest composes only pinned/banded constituents — any
    CartesianProduct means a matcher regressed to all-pairs."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.curation import (
        media_training_manifest_av,
    )

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as PIN,
    )

    df = media_training_manifest_av(tables.load_table(spark, SF, "documents"))
    plan = PL.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert df.count() > 0
    PIN.release_all()


def test_kn_trigram_no_cartesian_no_force_broadcast(spark):
    """The KN scoring pass must stay a fan-out-1 equi-join chain over
    vocabulary-sized tables: no CartesianProduct, and the only
    nested-loop is the documented 1-row bigram-type-total fold."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        kn_trigram_logprob_scores,
    )

    df = kn_trigram_logprob_scores(tables.load_table(spark, SF, "documents"))
    plan = PL.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert df.count() > 0


def test_chunk_dupes_aggregate_only_plan(spark):
    """Chunk-grain dedup is aggregation over the zero-shuffle chunk
    explode: Catalyst lowers the countDistinct to the standard
    two-phase (fp, doc) → fp expansion — exactly the two
    fingerprint-keyed Exchanges, no joins, no windows."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        chunk_dupes,
    )

    df = chunk_dupes(tables.load_table(spark, SF, "documents"))
    plan = PL.physical_plan(df)
    assert PL.exchange_count(df) == 2, plan
    assert "Join" not in plan and "Window" not in plan, plan
