"""Semantic tests for the dedup family and similarity search (planted
duplicates must be found; invariants on pairs and rankings)."""

import pytest
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    dedup as D,
    similarity as SIM,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources import (
    tables,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def aug(spark):
    return D.aug_corpus(tables.load_table(spark, SF, "documents")).cache()


def test_exact_dedup_finds_planted_copies(spark, aug):
    groups = D.dedup_exact(aug)
    dups = groups.filter(F.col("n_docs") > 1).collect()
    assert dups, "planted exact copies must form groups"
    # every %13 doc with nonempty deterministic text forms a pair
    for r in dups:
        assert r["n_docs"] >= 2
        assert r["canonical_doc_id"] < 1000000  # canonical is the original


def test_minhash_finds_planted_near_dups(spark, aug):
    pairs = D.dedup_minhash_lsh(aug, threshold=0.5).collect()
    assert pairs
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # near-dup copies (id+1e6, first 5 tokens dropped) should pair with
    # their originals for reasonably long docs
    docs = tables.load_table(spark, SF, "documents")
    long_near = [
        r["doc_id"]
        for r in docs.filter(
            (F.col("doc_id") % 10 == 0) & (F.length("text") > 300)
        ).collect()
    ]
    hits = sum(1 for d in long_near if (d, d + 1000000) in found)
    assert hits >= len(long_near) * 0.8, (hits, len(long_near))
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_ngram_jaccard_superset_of_lsh(spark, aug):
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_minhash_lsh(aug, threshold=0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_ngram_pairs(aug, threshold=0.5).collect()
    }
    # LSH may miss pairs (probabilistic recall) but must not invent any
    assert lsh <= exact


def test_ngram_df_cap_bounds_candidate_fanout(spark):
    """The shingle df-cap drops hot shingles from candidate generation
    only: docs related solely through a corpus-wide hot shingle produce
    no pair, while rare-shingle pairs survive with UNCAPPED-exact
    Jaccard (verification reads the full shingle table)."""
    hot = "the quick brown"  # one shared hot trigram across all docs
    rows = [(i, f"{hot} filler{i} x{i} y{i} z{i} w{i}") for i in range(8)]
    # 8 and 9: near-identical texts sharing several rare shingles
    rows += [
        (8, "alpha beta gamma delta epsilon zeta"),
        (9, "alpha beta gamma delta epsilon eta"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_ngram_pairs(
            corpus, threshold=0.05, shingle_df_cap=4
        ).collect()
    }
    assert (8, 9) in capped
    assert all(a == 8 for a, _ in capped), capped  # hot-only pairs dropped

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in D.dedup_ngram_pairs(
            corpus, threshold=0.05, shingle_df_cap=10**6
        ).collect()
    }
    assert capped <= uncapped and len(uncapped) > len(capped)


def test_simhash_near_dups_close(spark, aug):
    pairs = D.simhash_pairs(aug, max_hamming=8).collect()
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs}
    exact_pairs = [(k, v) for k, v in found.items() if k[1] - k[0] == 2000000]
    assert exact_pairs
    assert all(v == 0 for _, v in exact_pairs)  # identical text → same fp


def test_corpus_curation_gates(spark, aug):
    """Each curation gate must actually bite: planted exact copies
    (id+2e6) are never curated (non-canonical), near-dup copies (id+1e6)
    that pair with their original are dropped, survivors carry a valid
    split, and membership is deterministic."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        curation,
    )

    out = {r["doc_id"]: r["split"] for r in curation.curate(aug).collect()}
    assert out, "curation must keep a non-empty corpus"
    assert set(out.values()) <= {"train", "dev", "test"}

    # exact copies: canonical filter keeps the original, drops the copy
    copies = {r["doc_id"] for r in aug.filter(F.col("doc_id") >= 2000000).collect()}
    assert copies and not (copies & set(out))

    # near-dup drops: any verified pair's larger member is absent
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        dedup as D,
    )

    dropped = {r["doc_b"] for r in D.dedup_minhash_lsh(aug, 0.5).collect()}
    assert dropped and not (dropped & set(out))

    # deterministic: a second evaluation yields the identical mapping
    assert out == {
        r["doc_id"]: r["split"] for r in curation.curate(aug).collect()
    }


def test_ann_bruteforce_invariants(spark):
    emb = tables.load_table(spark, SF, "embeddings")
    res = SIM.ann_bruteforce(emb, [0, 1, 2], k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert len(rows) == 10
        assert all(r["neighbor_id"] != q for r in rows)
        cosines = [r["cos"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0 <= c <= 1.0 for c in cosines)


def test_ann_ivf_subset_of_probe_cluster(spark):
    emb = tables.load_table(spark, SF, "embeddings")
    res = SIM.ann_ivf(emb, [0, 1, 2], k=10).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    for r in res:
        assert labels[r["neighbor_id"]] == r["probe_label"]


def test_ann_ivf_nprobe_recall_monotone(spark):
    """nprobe is the recall knob: the top-k under nprobe=2 must be at
    least as close to brute force as nprobe=1 (per query, the recalled
    neighbor sets grow toward the exact set; clusters are disjoint so
    candidates strictly widen)."""
    emb = tables.load_table(spark, SF, "embeddings")
    qids = [0, 1, 2]

    def topk(df):
        by_q = {}
        for r in df.collect():
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return by_q

    exact = topk(SIM.ann_bruteforce(emb, qids, k=10))
    p1 = topk(SIM.ann_ivf(emb, qids, k=10, nprobe=1))
    p2 = topk(SIM.ann_ivf(emb, qids, k=10, nprobe=2))
    for q in qids:
        r1 = len(p1[q] & exact[q])
        r2 = len(p2[q] & exact[q])
        # a wider candidate pool can only push out a true top-k member in
        # favor of something globally better — which is itself top-k
        assert r2 >= r1, (q, r1, r2)


def test_embedding_near_dup_planted(spark):
    emb = tables.load_table(spark, SF, "embeddings")
    pairs = SIM.embedding_near_dup_pairs(SIM.aug_embeddings(emb), 0.99).collect()
    planted = {(r["vec_a"], r["vec_b"]) for r in pairs if r["vec_b"] - r["vec_a"] == 100000}
    n_expected = emb.filter(F.col("vec_id") % 20 == 0).count()
    assert len(planted) == n_expected
    assert all(r["cos"] >= 0.99 for r in pairs)


def test_ann_lsh_recall_and_determinism(spark):
    """LSH ANN: candidate restriction is approximate by design, but the
    probed top-k must (a) be deterministic, (b) agree with brute force
    on every pair it returns (exact rerank), and (c) recover a decent
    fraction of the true top-10 on the clustered test embeddings."""
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
        similarity as SIM,
    )
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
        load_table,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    lsh = SIM.ann_lsh(emb, [0, 1, 2], k=10)
    bf = SIM.ann_bruteforce(emb, [0, 1, 2], k=10)
    lsh_rows = {(r.query_id, r.neighbor_id): r.cos for r in lsh.collect()}
    bf_rows = {(r.query_id, r.neighbor_id): r.cos for r in bf.collect()}
    # exact rerank: every returned cosine equals the brute-force cosine
    bf_all = {
        (r.query_id, r.neighbor_id): r.cos
        for r in SIM.ann_bruteforce(emb, [0, 1, 2], k=10**6).collect()
    }
    for key, cos in lsh_rows.items():
        assert bf_all[key] == cos
    # recall@10 over the three queries on clustered data (measured ~0.5
    # with 3 tables; the floor guards against a silent bucketing break)
    hit = len(set(lsh_rows) & set(bf_rows))
    assert hit >= 12, f"recall too low: {hit}/30"
    # determinism
    again = {(r.query_id, r.neighbor_id): r.cos for r in SIM.ann_lsh(emb, [0, 1, 2], k=10).collect()}
    assert again == lsh_rows


def test_editdistance_pairs_planted_typos(spark):
    """Planted character-level corruption: the operator reports exact
    distances for typo-class pairs, ignores reworded (token-level) ones
    beyond the threshold, and pair output carries doc_a < doc_b."""
    from pyspark.sql import functions as F

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "the quick brown fox jumps over the lazy dog near the river bank"),  # dist 0
        (3, "the quick brown fox jumps over the lazy dog near the river bonk"),  # 1 sub
        (4, "the quick brown fox jump over the lazy dog near the river bank"),   # 1 del
        (5, "a completely different document about spark query planning"),
        (6, "entirely unrelated text concerning duckdb oracle comparisons"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.doc_a, r.doc_b): r.dist
        for r in D.dedup_editdistance_pairs(corpus, max_dist=2).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1
    assert pairs[(1, 4)] == 1
    assert pairs[(3, 4)] == 2  # sub + del compound
    assert all(a < b for a, b in pairs)
    assert not any(5 in p or 6 in p for p in pairs), "unrelated docs must not pair"


def test_editdistance_distance_matches_python_reference(spark):
    """Spark's levenshtein must agree with a reference DP on the exact
    normalized prefixes the operator compares (guards the cross-engine
    levenshtein-definition assumption the oracle also relies on)."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    rows = [
        (1, "lorem ipsum dolor sit amet consectetur adipiscing elit sed"),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit se"),
        (3, "lorem ipsum d0lor sit amet consectetur adipiscing elit sed!"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    norm = {r.doc_id: r.t for r in D._edit_norm(corpus).collect()}
    got = {
        (r.doc_a, r.doc_b): r.dist
        for r in D.dedup_editdistance_pairs(corpus, max_dist=5).collect()
    }
    for (a, b), d in got.items():
        assert d == lev(norm[a], norm[b])
    assert (1, 2) in got and (1, 3) in got
