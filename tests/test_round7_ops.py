"""Round-7 operators: Gopher repetition metrics, domain quota /
stratified sample, bloom-pruned semi-join, distributed global rank +
NTILE tiling. Oracle parity runs via the registry (test_oracle_parity);
these tests pin the properties parity alone can't see — degenerate
inputs, routing equivalence, no-false-negative guarantees, plan shape.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
    lm_buckets,
    repetition_metrics,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    bloomjoin as BJ,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    quota as Q,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
    physical_plan,
)

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# repetition metrics
# --------------------------------------------------------------------------


def test_repetition_metrics_degenerate_inputs(spark):
    """Empty / sub-gram-width docs get NULL metrics and never gate;
    known repetitive strings produce the hand-computed fractions."""
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "a b"),
            (4, "x y x y x y x y"),
            (5, "u v w"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in repetition_metrics(docs).collect()
    }
    assert rows[1].n_tokens == 0 and rows[1].top_bigram_frac is None
    assert rows[2].dup_trigram_frac is None and not rows[2].repetitive
    # "a b": one bigram covering both tokens
    assert rows[3].top_bigram_frac == 1.0 and rows[3].dup_trigram_frac is None
    # "x y"×4 of 7 bigrams covers 8/8 tokens; 6 trigrams, 2 distinct
    assert rows[4].top_bigram_frac == 1.0
    assert rows[4].dup_trigram_frac == pytest.approx(4 / 6, abs=1e-6)
    assert rows[4].repetitive
    # all-distinct trigram doc: zero duplicate mass
    assert rows[5].dup_trigram_frac == 0.0


def test_repetition_metrics_total_over_corpus(spark):
    """The report stays total: one row per document regardless of
    token count."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert repetition_metrics(docs).count() == docs.count()


# --------------------------------------------------------------------------
# quota / stratified sample
# --------------------------------------------------------------------------


def test_domain_quota_salting_is_invisible(spark, monkeypatch):
    """The salted two-phase top-k must equal the plain per-domain rank
    for ANY salt fan-out — same device as the PYMK whale-route
    equivalence tests."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    outs = []
    for n_salts in (1, 4, 16):
        monkeypatch.setattr(Q, "N_SALTS", n_salts)
        outs.append(
            sorted(map(tuple, Q.domain_quota(docs, 7).collect()))
        )
    assert outs[0] == outs[1] == outs[2]
    # and the cap binds
    assert max(r[2] for r in outs[0]) == 7


def test_stratified_sample_hits_exact_allocation(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = {
        r.event_type: int(r.n * 0.2)  # floor for these row counts
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r.event_type: r.n
        for r in Q.stratified_sample(ev, 0.2)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# bloom-pruned semi-join
# --------------------------------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    """Every true-matching fact row survives the bloom pre-filter —
    the property that makes the downstream exact join sufficient."""
    fact = spark.range(0, 5000).select(F.col("id").alias("k"))
    dim = spark.range(0, 5000, 7).select(F.col("id").alias("dk"))
    got = sorted(
        r.k for r in BJ.bloom_pruned_semi_join(fact, "k", dim, "dk").collect()
    )
    assert got == list(range(0, 5000, 7))


def test_bloom_actually_prunes(spark):
    """With a selective dim side, the pre-filter drops the bulk of the
    fact rows BEFORE the join (false-positive rate stays near the
    sizing formula, not near 1)."""
    fact = spark.range(0, 20000).select(F.col("id").alias("k"))
    dim = spark.range(0, 200).select(F.col("id").alias("dk"))
    bits = BJ.bits_bytes(BJ.bloom_words(dim, "dk"))
    survivors = fact.filter(BJ.membership(F.col("k"), bits)).count()
    # 200 true keys; fp rate at n=200, m=2^18, k=3 is ~1e-8 — allow
    # slack up to 1% of the non-matching rows
    assert survivors < 200 + 0.01 * 19800


def test_bloom_words_deterministic_and_dense(spark):
    dim = spark.range(0, 300).select(F.col("id").alias("dk"))
    w1 = BJ.bloom_words(dim, "dk")
    w2 = BJ.bloom_words(dim.repartition(7), "dk")
    assert w1 == w2
    assert len(w1) == BJ.M_BITS // 64


# --------------------------------------------------------------------------
# global rank / ntile
# --------------------------------------------------------------------------


def test_global_row_number_matches_window_any_partitioning(spark):
    df = spark.range(0, 997).select(
        F.col("id"), F.pmod(F.xxhash64("id"), F.lit(1000)).alias("score")
    )
    want = {
        (r.id, r.score): r.rn
        for r in duck_rank(df)
    }
    for n_parts in (1, 3, 32):
        got = {
            (r.id, r.score): r.rn
            for r in global_row_number(
                df, [F.col("score").desc(), F.col("id").asc()], n_partitions=n_parts
            ).collect()
        }
        assert got == want


def duck_rank(df):
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    return [
        r
        for r in con.sql(
            "SELECT id, score, CAST(row_number() OVER "
            "(ORDER BY score DESC, id ASC) AS BIGINT) AS rn FROM t"
        ).fetchall()
        for r in [type("R", (), {"id": r[0], "score": r[1], "rn": r[2]})()]
    ]


@pytest.mark.parametrize(
    "n,k",
    [(15, 10), (10, 3), (4, 3), (7, 3), (2, 5), (100, 7), (1, 1)],
)
def test_ntile_from_rank_matches_sql_ntile(spark, n, k):
    """Exact NTILE — including (15, 10), the case where the tempting
    closed form floor((r-1)k/n)+1 diverges from the window function."""
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.sql(
            f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchall()
    ]
    df = spark.range(1, n + 1).select(
        ntile_from_rank(F.col("id"), F.lit(n), k).alias("b")
    )
    got = [r.b for r in df.orderBy("b").collect()]
    assert sorted(got) == sorted(want)
    # position-wise too (rank r -> bucket)
    df2 = spark.range(1, n + 1).select(
        F.col("id"), ntile_from_rank(F.col("id"), F.lit(n), k).alias("b")
    )
    got2 = [r.b for r in df2.orderBy("id").collect()]
    assert got2 == want


def test_lm_buckets_plan_has_no_global_window(spark):
    """The tiling must ride the range-partitioned rank: every Window
    node in the plan is PARTITIONED (by the range-partition id) —
    a global-order window would carry an empty partition spec over a
    SinglePartition exchange. (The one SinglePartition in the plan is
    the 1-row total-count aggregate feeding the broadcast — that's the
    scalar-combine device, not a sort.)"""
    import re

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical_plan(lm_buckets(docs))
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "__rank_pid" in spec, plan


# --------------------------------------------------------------------------
# SCD2 temporal join / exact quantiles
# --------------------------------------------------------------------------


def test_scd2_asof_join_known_log(spark):
    """Hand-built log: purchases land in the correct status run,
    equal-ts dim changes apply to same-ts facts (inclusive as-of), and
    facts before the first run are dropped (inner semantics)."""
    import datetime

    def e(eid, uid, ts, typ):
        return (eid, uid, datetime.datetime.fromisoformat(ts), typ)

    ev = spark.createDataFrame(
        [
            e(1, 1, "2024-01-01 00:00:00", "purchase"),  # before any dim
            e(2, 1, "2024-01-02 00:00:00", "signup"),
            e(3, 1, "2024-01-03 00:00:00", "purchase"),  # in signup run
            e(4, 1, "2024-01-04 00:00:00", "error"),
            e(5, 1, "2024-01-04 00:00:00", "purchase"),  # same-ts: error wins
            e(6, 1, "2024-01-05 00:00:00", "purchase"),  # still error run
            e(7, 2, "2024-01-01 00:00:00", "purchase"),  # user 2: no dim ever
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    # registry wrapper logic, inlined against this log
    from pyspark.sql import Window

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.asof import (
        asof_join,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.scd import (
        scd2_history,
    )

    dim_src = ev.filter(F.col("event_type").isin("signup", "error"))
    runs = scd2_history(dim_src, ["user_id"], "ts", ["event_id"], "event_type")
    w = Window.partitionBy("user_id", "valid_from").orderBy(
        F.col("event_id").desc()
    )
    dim = (
        runs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "valid_from",
            F.col("event_type").alias("status_type"),
            F.col("event_id").alias("status_event_id"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        facts, dim, ["user_id"], "ts", "valid_from",
        value_cols=["status_type", "status_event_id"],
        tie_break="status_event_id",
    ).filter(F.col("asof_status_type").isNotNull())
    out = {
        r.event_id: (r.asof_status_type, r.asof_status_event_id)
        for r in joined.collect()
    }
    assert out == {
        3: ("signup", 2),
        5: ("error", 4),
        6: ("error", 4),
    }


def test_exact_quantiles_match_rank_definition(spark):
    """Boundary q = value at sorted position ceil(q·n/k), verified
    against a sorted driver-side list, under several partition counts
    and with heavy duplicates."""
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.ranking import (
        exact_quantiles,
    )

    vals = [float(v % 17) for v in range(997)]  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    s = sorted(vals)
    want = {
        q: s[math.ceil(q * len(s) / 10) - 1] for q in range(1, 10)
    }
    for n_parts in (1, 5, 32):
        got = {
            r.q: r.boundary
            for r in exact_quantiles(df, "value", 10, n_partitions=n_parts).collect()
        }
        assert got == want


def test_exact_quantiles_small_n(spark):
    """n < k: several boundary ranks collapse to the same row — each q
    still reports (one row per q), and n=0 yields the empty relation."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.ranking import (
        exact_quantiles,
    )

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "value double")
    got = {r.q: r.boundary for r in exact_quantiles(df, "value", 10).collect()}
    assert set(got) == set(range(1, 10))
    import math

    s = [1.0, 2.0, 3.0]
    assert got == {q: s[math.ceil(q * 3 / 10) - 1] for q in range(1, 10)}

    empty = spark.createDataFrame([], "value double")
    assert exact_quantiles(empty, "value", 10).count() == 0


# --------------------------------------------------------------------------
# token entropy
# --------------------------------------------------------------------------


def test_token_entropy_known_values(spark):
    import math

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        token_entropy,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),               # zero tokens: NULL entropy
            (2, "same same same"), # one distinct token: H = 0
            (3, "a b c d"),        # uniform: H = ln(4)
            (4, "a a b"),          # H = ln(3) - (2 ln 2)/3
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in token_entropy(docs).collect()}
    assert rows[1].n_tokens == 0 and rows[1].entropy is None
    assert rows[2].entropy == 0.0 and rows[2].n_distinct == 1
    assert rows[3].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert rows[4].entropy == pytest.approx(
        math.log(3) - (2 * math.log(2)) / 3, abs=1e-6
    )


# --------------------------------------------------------------------------
# product quantization
# --------------------------------------------------------------------------


def test_pq_rerank_recall_floor(spark):
    """Declared recall: ADC-shortlist-100 + exact rerank recovers most
    of the brute-force top-10 even on uniform random vectors (PQ's
    worst case — no cluster structure). Pinned ≥ 0.7 at sf0.001."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    bf = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_bruteforce(emb, [0, 1, 2], 10).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_pq_rerank(emb, [0, 1, 2], 10).collect()
    }
    assert len(bf & pq) / len(bf) >= 0.7


def test_pq_codes_are_compressed_and_total(spark):
    """Every vector gets exactly M codes, each in [0, KSUB) — the
    8-bytes-per-vector compression contract."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        pinned as P,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    S.ann_pq(emb, [0], k=1).collect()  # builds + pins the index
    hit = [k for k in P.pinned_keys() if isinstance(k, tuple) and k and k[0] == "pq_index"]
    assert hit, "pq index not pinned"
    cents_all, codes_all = P._REGISTRY[hit[0]]
    n = emb.count()
    per_vec = codes_all.groupBy("vec_id").count().collect()
    assert len(per_vec) == n and all(r["count"] == S.PQ_M for r in per_vec)
    rng = codes_all.agg(F.min("code"), F.max("code")).first()
    assert rng[0] >= 0 and rng[1] < S.PQ_KSUB
    assert cents_all.count() == S.PQ_M * S.PQ_KSUB


def test_pq_adc_never_scans_raw_vectors_at_query_time(spark):
    """The scoring join reads the pinned code table and the broadcast
    distance table only — the query-side plan contains no per-neighbor
    64-dim fold (the aggregate over zip_with appears only in the tiny
    |Q|-row distance-table branch, which is broadcast)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = S.ann_pq(emb, [0, 1, 2], 10)
    plan = physical_plan(df)
    # the N-sized side enters through InMemoryTableScan (the pinned code
    # table), and every aggregate-fold sits under a BroadcastExchange
    assert "InMemoryTableScan" in plan


def test_repetition_metrics_is_shuffle_free(spark):
    """Every metric is a per-row expression — the plan must contain no
    shuffle exchange at all (the original (doc, width, gram) shuffle
    version benched 12 s at sf0.1; this form 0.6 s)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
        exchange_count,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert exchange_count(repetition_metrics(docs)) == 0


# --------------------------------------------------------------------------
# streaming domain quota
# --------------------------------------------------------------------------


def test_streaming_quota_converges_and_stays_bounded(spark, tmp_path):
    """Multi-batch drain ≡ batch domain_quota (the greedy-prune
    invariant: a dropped doc can never re-enter), state stays ≤
    |domains|·cap after EVERY batch, and a checkpointed re-drain adds
    nothing."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.quota import (
        StreamingQuotaAccumulator,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    landing = str(tmp_path / "landing")
    docs.repartition(5).write.mode("overwrite").parquet(landing)

    acc = StreamingQuotaAccumulator(spark, str(tmp_path / "wh"), cap=6)
    acc.run_available_now(
        landing, str(tmp_path / "ckpt"),
        "doc_id long, source string", max_files_per_trigger=1,
    )
    got = sorted(map(tuple, acc.kept().select("source", "doc_id", "rk").collect()))
    want = sorted(map(tuple, Q.domain_quota(docs, 6).select("source", "doc_id", "rk").collect()))
    assert got == want

    n_domains = docs.select("source").distinct().count()
    assert acc.kept().count() <= n_domains * 6

    acc.run_available_now(  # replay: checkpoint makes it a no-op
        landing, str(tmp_path / "ckpt"),
        "doc_id long, source string", max_files_per_trigger=1,
    )
    assert sorted(map(tuple, acc.kept().select("source", "doc_id", "rk").collect())) == want


def test_streaming_quota_batch_retry_skipped(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.quota import (
        StreamingQuotaAccumulator,
    )

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    acc = StreamingQuotaAccumulator(spark, str(tmp_path / "wh"), cap=4)
    acc._process_batch(docs, 0)
    once = sorted(map(tuple, acc.kept().collect()))
    assert acc._applied_batch_id() == 0
    acc._process_batch(docs, 0)  # replayed batch: skipped
    assert sorted(map(tuple, acc.kept().collect())) == once


# --------------------------------------------------------------------------
# harmonic centrality
# --------------------------------------------------------------------------


def test_harmonic_landmarks_known_graph(spark):
    """Path graph 1-2-3-4 with landmarks {1, 4}, max_hops=3:
    h(2) = 1/1 + 1/2, h(3) = 1/2 + 1/1, h(1) = h(4) = 1/3 (the other
    landmark only) — exact integer-sum form, no float-order edge."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        harmonic_from_landmarks,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r.id: (r.n_reached, r.harmonic) for r in
           harmonic_from_landmarks(edges, [1, 4], max_hops=3).collect()}
    assert got[2] == (2, 1.5)
    assert got[3] == (2, 1.5)
    assert got[1] == (1, pytest.approx(1 / 3, abs=1e-9))
    assert got[4] == (1, pytest.approx(1 / 3, abs=1e-9))


# --------------------------------------------------------------------------
# exponential smoothing
# --------------------------------------------------------------------------


def test_ses_levels_known_series(spark):
    """Hand-computed recurrence over three months (α=0.3), and the
    partition-layout invariance the sequential-fold design guarantees."""
    import datetime

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.timeseries import (
        ses_levels,
    )

    rows = [
        (datetime.datetime(2024, 1, 15), 100.0),
        (datetime.datetime(2024, 1, 20), 100.0),  # same month: sums to 200
        (datetime.datetime(2024, 2, 10), 300.0),
        (datetime.datetime(2024, 3, 5), 100.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    for n_parts in (1, 4):
        got = {
            r.month_us: (r.revenue, r.level)
            for r in ses_levels(df.repartition(n_parts), "ts", "v").collect()
        }
        # level1 = 200; level2 = .3*300 + .7*200 = 230; level3 = .3*100 + .7*230 = 191
        assert [v for _, v in sorted(got.items())] == [
            (200.0, 200.0),
            (300.0, 230.0),
            (100.0, 191.0),
        ]


# --------------------------------------------------------------------------
# streaming sum rollup (IVM)
# --------------------------------------------------------------------------


def test_streaming_rollup_converges_and_replays_safely(spark, tmp_path):
    """Multi-batch drain ≡ batch GROUP BY (decimal addition is
    associative), checkpointed re-drain adds nothing, and a direct
    batch retry is skipped via the marker."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.rollup import (
        StreamingSumRollup,
    )

    ev = spark.createDataFrame(
        [(f"k{i % 4}", float(i) + 0.25) for i in range(200)],
        "k string, v double",
    )
    landing = str(tmp_path / "landing")
    ev.repartition(5).write.mode("overwrite").parquet(landing)

    acc = StreamingSumRollup(spark, str(tmp_path / "wh"), ["k"], "v")
    acc.run_available_now(
        landing, str(tmp_path / "ckpt"),
        "k string, v double", max_files_per_trigger=1,
    )
    want = sorted(
        (r.k, r.n, r.s)
        for r in ev.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("v").cast("decimal(28,6)")).cast("double"), 4).alias("s"),
        )
        .collect()
    )
    got = sorted((r.k, r.n, r.value_sum) for r in acc.table().collect())
    assert got == want

    acc.run_available_now(  # replay: checkpoint no-op
        landing, str(tmp_path / "ckpt"),
        "k string, v double", max_files_per_trigger=1,
    )
    assert sorted((r.k, r.n, r.value_sum) for r in acc.table().collect()) == want

    before = acc._applied_batch_id()
    acc._process_batch(ev, before)  # re-delivered batch: skipped
    assert sorted((r.k, r.n, r.value_sum) for r in acc.table().collect()) == want


# --------------------------------------------------------------------------
# bucketed quantiles
# --------------------------------------------------------------------------


def test_bucketed_quantiles_error_bound_vs_exact(spark):
    """The histogram estimate must sit within one bucket width of the
    exact rank-based quantile — the declared error contract — and the
    bucket counts must merge additively (half+half ≡ whole)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        bucketed_quantiles,
        value_histogram,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    est = {
        (r.event_type, r.q): r.est_lo
        for r in bucketed_quantiles(ev, nbuckets=100).collect()
    }
    import math

    vals_by_type = {}
    for r in ev.select("event_type", "value").collect():
        vals_by_type.setdefault(r.event_type, []).append(r.value)
    width = 500.0 / 100
    for (t, q), lo in est.items():
        s = sorted(vals_by_type[t])
        exact = s[math.ceil(q * len(s)) - 1]
        assert lo <= exact < lo + width, (t, q, lo, exact)

    # additive merge: histograms of two halves sum to the whole
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = {
        (r.event_type, r.bucket): r.n
        for r in value_histogram(ev, 0.0, 500.0, 100).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in value_histogram(part, 0.0, 500.0, 100).collect():
            merged[(r.event_type, r.bucket)] = (
                merged.get((r.event_type, r.bucket), 0) + r.n
            )
    assert merged == whole


# --------------------------------------------------------------------------
# weighted shortest paths
# --------------------------------------------------------------------------


def test_weighted_paths_prefers_cheap_detour(spark):
    """Triangle where the 2-hop detour is cheaper than the direct edge:
    Bellman-Ford must pick the detour; hop bound must cut paths longer
    than the budget."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        weighted_shortest_paths,
    )

    edges = spark.createDataFrame(
        [(1, 4), (1, 2), (2, 4), (4, 5)], "src long, dst long"
    )
    # weights: direct 1-4 costs 10; detour 1-2 (3) + 2-4 (1) costs 4
    w = (
        F.when((F.col("src") + F.col("dst")) == 5, F.lit(10))
        .when((F.col("src") + F.col("dst")) == 3, F.lit(3))
        .when((F.col("src") + F.col("dst")) == 6, F.lit(1))
        .otherwise(F.lit(2))
        .cast("long")
    )
    got = {
        r.id: r.dist
        for r in weighted_shortest_paths(edges, 1, max_hops=3, weight=w).collect()
    }
    assert got[1] == 0
    assert got[2] == 3
    assert got[4] == 4   # detour beats the weight-10 direct edge
    assert got[5] == 6   # 1-2-4-5 within the 3-hop budget

    # hop bound: with max_hops=1 only direct edges resolve
    got1 = {
        r.id: r.dist
        for r in weighted_shortest_paths(edges, 1, max_hops=1, weight=w).collect()
    }
    assert got1[4] == 10 and 5 not in got1


# --------------------------------------------------------------------------
# BPE merge candidates / pinned weighted distances
# --------------------------------------------------------------------------


def test_bpe_merge_candidates_known_corpus(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        bpe_merge_candidates,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = [(r.x, r.y, r.cnt) for r in bpe_merge_candidates(docs, 3).collect()]
    # "a b" appears 3 times (twice in doc1, once in doc2); ties by pair asc
    assert rows[0] == ("a", "b", 3)
    assert set(rows[1:]) <= {("b", "a", 1), ("b", "c", 1), ("b", "x", 1)}


def test_weighted_distances_pin_serves_and_survives_release(spark):
    """Second call must hit the pin (no rebuild), and a blanket
    checkpoints.release_all must evict it cleanly (coupled lifecycles)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
        checkpoints as CKPT,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
        pinned_weighted_distances,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    edges = tables.user_graph_edges(spark, SF)
    first = sorted(
        map(tuple, pinned_weighted_distances(edges, 3, max_hops=2).collect())
    )
    again = sorted(
        map(tuple, pinned_weighted_distances(edges, 3, max_hops=2).collect())
    )
    assert first == again
    CKPT.release_all(spark)
    rebuilt = sorted(
        map(tuple, pinned_weighted_distances(edges, 3, max_hops=2).collect())
    )
    assert rebuilt == first
    CKPT.release_all(spark)


# --------------------------------------------------------------------------
# hashed features / snapshot change feed
# --------------------------------------------------------------------------


def test_hashed_features_sparse_and_bounded(spark):
    """Buckets stay in [0, n); a doc's total |weight| never exceeds its
    token count; identical docs hash identically (no vocabulary
    state)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.functions.text import (
        hashed_features,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta beta gamma"), (2, "alpha beta beta gamma"), (3, "")],
        "doc_id long, text string",
    )
    rows = hashed_features(docs, n_buckets=16).collect()
    by_doc: dict = {}
    for r in rows:
        assert 0 <= r.bucket < 16
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.weight))
    assert sorted(by_doc[1]) == sorted(by_doc[2])  # stateless determinism
    assert 3 not in by_doc  # empty doc: no feature rows
    assert sum(abs(w) for _, w in by_doc[1]) <= 4


def test_snapshot_changes_classification(spark):
    """Hand-built snapshots: one insert, one delete, one update (pre +
    post rows), unchanged rows never appear."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.table import (
        table_changes,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    got = sorted(
        (r.k, r._change) for r in table_changes(old, new, ["k"]).collect()
    )
    assert got == [
        (2, "update_post"),
        (2, "update_pre"),
        (3, "delete"),
        (4, "insert"),
    ]


# --------------------------------------------------------------------------
# negative edge sampling
# --------------------------------------------------------------------------


def test_negative_samples_are_true_non_edges(spark):
    """Every emitted pair must be a NON-edge (either direction) and
    never a self-loop; output is bounded by the positive count; the
    sampling is deterministic across partition layouts; and a
    (near-)complete graph degenerates to the empty relation — there is
    nothing to sample (the sf0.001 user graph is that case; the driver
    scale sf0.01 yields ~3.3k negatives)."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.linkpred import (
        negative_edge_samples,
    )

    # sparse ring over 50 vertices: plenty of non-edges
    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    neg = negative_edge_samples(edges)
    rows = [(r.u, r.v_neg) for r in neg.collect()]
    assert 0 < len(rows) <= 50
    real = {(i, (i + 1) % 50) for i in range(50)} | {
        ((i + 1) % 50, i) for i in range(50)
    }
    for u, v in rows:
        assert u != v and (u, v) not in real

    again = [
        (r.u, r.v_neg)
        for r in negative_edge_samples(edges.repartition(7)).collect()
    ]
    assert sorted(again) == sorted(rows)

    # complete graph: zero non-edges, empty output (not an error)
    complete = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "src long, dst long",
    )
    assert negative_edge_samples(complete).count() == 0


# --------------------------------------------------------------------------
# random walks
# --------------------------------------------------------------------------


def test_walks_follow_edges_and_are_deterministic(spark):
    """Every consecutive (step t → t+1) pair must be a real edge; every
    vertex walks exactly T+1 positions; repartitioning changes
    nothing."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.walks import (
        deterministic_walks,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
        tables,
    )

    edges = tables.user_graph_edges(spark, SF)
    walks = deterministic_walks(edges, steps=3)
    rows = [(r.walk_id, r.step, r.vertex) for r in walks.collect()]
    n_verts = (
        edges.select("src").union(edges.select("dst")).distinct().count()
    )
    assert len(rows) == n_verts * 4

    real = set()
    for r in edges.collect():
        real.add((r.src, r.dst))
        real.add((r.dst, r.src))
    path: dict = {}
    for wid, step, v in rows:
        path.setdefault(wid, {})[step] = v
    for wid, seq in path.items():
        assert seq[0] == wid
        for t in range(3):
            assert (seq[t], seq[t + 1]) in real

    again = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in deterministic_walks(edges.repartition(7), steps=3).collect()
    )
    assert again == sorted(rows)


# --------------------------------------------------------------------------
# interval overlap join
# --------------------------------------------------------------------------


def test_interval_overlap_matches_naive_range_join(spark):
    """The bucketized plan must land on EXACTLY the pairs the raw range
    predicate selects — including a multi-day session (pair counted
    once despite sharing many cells) and an open (current) status run."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.intervals import (
        sessions_status_overlap,
    )

    import datetime

    def e(eid, uid, ts, typ):
        return (eid, uid, datetime.datetime.fromisoformat(ts), typ, 1.0, "")

    ev = spark.createDataFrame(
        [
            # user 1: signup run open-ended from Jan 2; clicks spanning days
            e(1, 1, "2024-01-02 00:00:00", "signup"),
            e(2, 1, "2024-01-03 10:00:00", "click"),
            e(3, 1, "2024-01-03 10:10:00", "click"),
            # session before any run: no overlap row
            e(4, 2, "2024-01-01 09:00:00", "click"),
            e(5, 2, "2024-01-05 00:00:00", "error"),
            e(6, 2, "2024-01-06 00:00:00", "click"),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double, props string",
    )
    rows = sorted(
        (r.user_id, r.session_seq, r.status_event_id, r.status_type)
        for r in sessions_status_overlap(ev).collect()
    )
    # user 1: every session overlaps the open signup run (sessions: the
    # signup event itself is session 1, clicks are session 2)
    # user 2: the Jan-1 click session precedes the error run entirely;
    # the error event + Jan-6 click sessions overlap the open error run
    assert (1, 2, 1, "signup") in rows
    assert all(not (u == 2 and s == 1) for u, s, _, _ in rows)
    assert (2, 3, 5, "error") in rows


# --------------------------------------------------------------------------
# nation trade volume (Q7 shape)
# --------------------------------------------------------------------------


def test_nation_trade_plan_broadcasts_all_dims(spark):
    """The six-table plan must move ONE fact-fact shuffle join; both
    nation roles, supplier, and the reduced customer path must not add
    fact-sized exchanges (dims broadcast). Cross-border filter excludes
    same-nation pairs."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.warehouse import (
        nation_trade_volume,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.plans.audit import (
        physical_plan,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    s = spark.read.parquet(f"{SF}/supplier.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    df = nation_trade_volume(li, o, c, s, n)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    rows = df.collect()
    assert all(r.cust_nation != r.supp_nation for r in rows)
    assert len(rows) > 0
