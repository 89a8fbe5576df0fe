"""Similarity search over the ``embeddings`` table (north-star surface):
brute-force cosine top-k (exact baseline) and an IVF-style clustered
variant (the scale path), plus embedding-cosine near-dup pairs.

Vectors are ``array<float>``; all arithmetic is promoted to double with an
explicit, order-stable left-fold (zip_with + aggregate) so the DuckDB
oracle (list_transform + list_sum over the same element order) evaluates
the same operation tree. Cosines are rounded to 6dp before thresholds and
ordering.

Scale design:
- Brute force is O(Q·N) with Q broadcast — the right baseline shape; at
  100 TB the N side stays partitioned, never collected.
- IVF: coarse quantization by cluster (here: the given ``label`` column;
  a k-means fit would slot in identically), queries probe only their
  top-1 cluster → N/k candidate scans per query. Cluster centroids are a
  tiny broadcast table.
- Near-dup pairs block on the cluster id (label) to avoid the O(N²) cross
  join; exact copies planted by the augmented corpus land in the same
  cluster by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

DIM = 64


def _to_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b):
    """Order-stable left-fold dot product of two equal-length arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a):
    return dot(a, a)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _to_double(F.col(vec_col))
    return df.withColumn("v", v).withColumn("n2", norm2(v))


def cosine(va, vb, na2, nb2):
    # The fold-based dot is the FAST form here, not just the portable
    # one: measured 0.25 µs/row (Spark 4 evaluates higher-order lambdas
    # over unsafe array data efficiently) vs 2.4 µs/row for a 64-term
    # unrolled element_at chain, whose expression tree falls out of
    # whole-stage codegen (r10 microbench, 10M rows).
    return dot(va, vb) / (F.sqrt(na2) * F.sqrt(nb2))


def ann_bruteforce(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact cosine top-k per query vector (self excluded).
    Returns (query_id, neighbor_id, cos, rank)."""
    base = with_norm(embeddings.select("vec_id", "embedding"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    pairs = base.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def cluster_centroids(embeddings: DataFrame) -> DataFrame:
    """Element-wise mean embedding per label (IVF coarse codebook).
    Returns (label, centroid array<double>)."""
    pos = embeddings.select(
        "label", F.posexplode(_to_double(F.col("embedding"))).alias("pos", "x")
    )
    means = pos.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        means.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def ann_ivf(
    embeddings: DataFrame, query_ids: list[int], k: int = 10, nprobe: int = 1
) -> DataFrame:
    """IVF-style ANN: assign each query to its ``nprobe`` nearest
    centroids by cosine (tie → smallest label), then exact top-k over the
    union of the probed clusters only.
    Returns (query_id, probe_label, neighbor_id, cos, rank).

    ``nprobe`` is the recall/cost knob: candidates scanned grow ~linearly
    (nprobe·N/k_clusters per query) while recall approaches brute force;
    clusters are disjoint, so no dedup is needed across probes."""
    from ..pinned import pinned

    base = with_norm(embeddings.select("vec_id", "label", "embedding"))
    # The coarse codebook is built once per corpus and reused by every
    # query (IVF's train/search split) — pinned, releasable.
    (cents,) = pinned(
        ("ivf_centroids", embeddings.semanticHash()),
        lambda: (
            cluster_centroids(embeddings).withColumn(
                "cn2", norm2(F.col("centroid"))
            ),
        ),
    )
    return ivf_serve(base, cents, query_ids, k, nprobe)


def ivf_serve(
    base: DataFrame,
    cents: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobe: int = 1,
) -> DataFrame:
    """The IVF search path over an ALREADY-BUILT index — shared verbatim
    by batch ``ann_ivf`` (pinned codebook) and the incremental indexer
    (streaming/annindex.py), so ingest-time serving is expression-
    identical to the batch oracle. ``base``: (vec_id, label, v, n2);
    ``cents``: (label, centroid, cn2)."""
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "qn2",
        F.col("label").alias("probe_label"),
        F.round(
            cosine(F.col("qv"), F.col("centroid"), F.col("qn2"), F.col("cn2")), 6
        ).alias("ccos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("probe_label"))
    probe = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qv", "qn2", "probe_label")
    )
    cand = base.join(
        F.broadcast(probe), base["label"] == probe["probe_label"]
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "probe_label",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def aug_embeddings(embeddings: DataFrame) -> DataFrame:
    """Dup-augmented vectors: exact copies (vec_id%20==0 → +100000) —
    declared input for embedding near-dup detection."""
    base = embeddings.select("vec_id", "label", "embedding")
    copies = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "embedding"
    )
    return base.unionAll(copies)


def semdedup_aug_embeddings(embeddings: DataFrame) -> DataFrame:
    """NEAR-dup-augmented vectors — the SEMANTIC sibling of
    ``aug_embeddings``: the vec_id%20==0 copies (→ +100000) get their
    FIRST component shifted by +0.01 in double space, so the copy's
    cosine to its source is <1 but ≫ any unrelated pair's (the corpus
    max is ~0.47) — exactly the paraphrase-shaped duplicate a shingle
    pipeline cannot see. The embedding column is emitted as
    array<double> (perturbing AFTER the float32→double cast keeps both
    engines' arithmetic identical)."""
    base = embeddings.select(
        "vec_id", "label", _to_double(F.col("embedding")).alias("embedding")
    )
    copies = embeddings.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "label",
        F.transform(
            _to_double(F.col("embedding")),
            lambda x, i: F.when(i == 0, x + F.lit(0.01)).otherwise(x),
        ).alias("embedding"),
    )
    return base.unionAll(copies)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by cluster label.
    Returns (vec_a, vec_b, cos) with cos ≥ threshold, vec_a < vec_b."""
    base = with_norm(embeddings)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"),
        F.col("v").alias("va"), F.col("n2").alias("na2"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"),
        F.col("v").alias("vb"), F.col("n2").alias("nb2"),
    )
    pairs = a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(
            cosine(F.col("va"), F.col("vb"), F.col("na2"), F.col("nb2")), 6
        ).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


#: Random-hyperplane LSH width. 2^6 buckets at the test scale keeps
#: buckets dense enough for top-10 reranking; production tunes bits to
#: corpus size (buckets ~ N / desired-candidates).
LSH_BITS = 6
#: Independent hash tables — the recall lever (a true neighbor is missed
#: only if it splits from the query in EVERY table). 3 tables lift
#: measured recall@10 from ~0.3 (single table) to ~0.5 on the clustered
#: test embeddings at the cost of 3× index rows — the classic LSH trade;
#: production stacks more tables (or probes Hamming-2) for higher recall.
LSH_TABLES = 3


def _plane_coef(b: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1] —
    pure integer arithmetic (Knuth-style multiplier) evaluated
    IDENTICALLY in Python (literals here) and SQL (the oracle), so both
    engines hash every vector with the same planes. Not cryptographic;
    sign-LSH only needs direction diversity."""
    return ((b * 1009 + j) * 2654435761) % 2001 / 1000.0 - 1.0


def lsh_bucket(vcol, n_bits: int = LSH_BITS, table: int = 0):
    """Sign-LSH bucket id (Charikar's SimHash for vectors, public) for
    one hash table: bit b = sign(v · plane_{table·n_bits+b}); bucket =
    Σ 2^b. The dot is the same order-stable left fold as every vector
    op here, so the sign — and the bucket — is bit-identical across
    engines. Tables use disjoint plane ranges, so they are independent."""
    acc = F.lit(0).cast("long")
    for b in range(n_bits):
        plane = F.array(
            *[
                F.lit(_plane_coef(table * n_bits + b, j))
                for j in range(1, DIM + 1)
            ]
        )
        acc = acc + F.when(dot(vcol, plane) >= 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("long")
    return acc


def ann_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = LSH_BITS,
    n_tables: int = LSH_TABLES,
) -> DataFrame:
    """LSH-bucketed ANN: the hash-partitioned scale path next to IVF's
    clustered one. Every vector is sign-hashed into ``n_tables``
    independent buckets at index time (3× index rows — the classic LSH
    space-for-recall trade); a query probes, per table, its own bucket
    PLUS each Hamming-1 neighbor (flip one bit — the standard
    multiprobe that recovers near-boundary neighbors), the candidate
    union is deduped per (query, neighbor), and survivors are exactly
    reranked by cosine. Returns (query_id, neighbor_id, cos, rank) —
    rank ≤ k within the probed candidate set; recall < 1 by design,
    deterministic, and mirrored exactly by the oracle.

    Scale shape: bucketing is a narrow per-row expression (index time);
    the probe expansion is n_tables·(n_bits+1) rows per QUERY (tiny,
    broadcast); the candidate join is an equi-join on (table, bucket) —
    hash-partitioned, never all-pairs; rerank cost ≈
    n_tables·(n_bits+1)·N/2^bits per query before the pair dedup."""
    from ..pinned import pinned

    def _build_sig():
        base = with_norm(embeddings.select("vec_id", "embedding"))
        return (
            base.select(
                "vec_id",
                "v",
                "n2",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("tbl"),
                                lsh_bucket(F.col("v"), n_bits, t).alias("bucket"),
                            )
                            for t in range(n_tables)
                        ]
                    )
                ).alias("s"),
            ).select(
                "vec_id",
                "v",
                "n2",
                F.col("s.tbl").alias("tbl"),
                F.col("s.bucket").alias("bucket"),
            ),
        )

    # The signed table IS the LSH index — built once per (corpus, layout),
    # served from the pinned registry like the postings/LSH-band tables.
    (sig,) = pinned(
        ("lsh_sig", embeddings.semanticHash(), n_bits, n_tables), _build_sig
    )

    q = sig.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
        "tbl",
        "bucket",
    )
    # mask 0 = the query's own bucket; mask 2^b flips bit b (Hamming-1)
    masks = F.array(
        F.lit(0).cast("long"), *[F.lit(1 << b).cast("long") for b in range(n_bits)]
    )
    probes = q.select(
        "query_id", "qv", "qn2", "tbl", F.explode(masks).alias("mask"), "bucket"
    ).select(
        "query_id",
        "qv",
        "qn2",
        "tbl",
        F.col("bucket").bitwiseXOR(F.col("mask")).alias("bucket"),
    )
    cand = (
        sig.join(F.broadcast(probes), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- product quantization -------------------------------------------------

#: PQ geometry: M subspaces of DIM/M dims, KSUB centroids each. 4×16
#: dims × 4 codes ⇒ a vector compresses to 4 small ints (the memory
#: story: 8 bytes of codes vs 256 bytes of float32 — at 100 TB the
#: code table fits where the raw vectors cannot).
PQ_M = 4
PQ_KSUB = 8
PQ_ITERS = 2


def _pq_sub(base_full: DataFrame, m: int) -> DataFrame:
    """(vec_id, v, n2) restricted to subspace ``m``'s coordinates."""
    width = DIM // PQ_M
    v = F.slice(F.col("fv"), m * width + 1, width)
    return (
        base_full.select("vec_id", v.alias("v"))
        .withColumn("n2", norm2(F.col("v")))
    )


def ann_pq(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou/Douze/Schmid 2011, public): per subspace, a deterministic
    k-means codebook (operators/clustering.py — same seeds/rounding
    discipline) encodes every vector as its nearest sub-centroid; a
    query scores a neighbor as Σ_m ‖q_m − c_{m,code_m}‖² — M table
    lookups instead of a D-dim dot product. Returns
    (query_id, neighbor_id, adc, rank).

    Determinism across engines: each per-subspace partial distance is
    rounded to integer MICRO-units (round(d2·1e6) as a long) before the
    Σ, so the sum is exact integer arithmetic — no float-summation-order
    edge for the oracle to disagree on; ``adc`` is the one terminal
    division back to a double.

    Scale: the codebook fit is M tiny k-means (broadcast centroids);
    the code table is N·M small ints, partitioned; the query-side
    distance table is |Q|·M·KSUB rows — broadcast; scoring is ONE
    equi-join of the code table against that broadcast plus a map-side-
    combinable (query, neighbor) sum. Nothing touches raw vectors at
    query time — that is the PQ point."""
    from ..pinned import pinned

    from .clustering import _assign, kmeans_fit

    base_full = embeddings.select(
        "vec_id", _to_double(F.col("embedding")).alias("fv")
    )

    def _build():
        cent_rels = []
        code_rels = []
        for m in range(PQ_M):
            sub = _pq_sub(base_full, m)
            cents = kmeans_fit(sub, PQ_KSUB, PQ_ITERS)
            cent_rels.append(cents.withColumn("m", F.lit(m)))
            code_rels.append(
                _assign(sub, cents).select(
                    "vec_id",
                    F.lit(m).alias("m"),
                    F.col("cluster").alias("code"),
                )
            )
        cents_all = cent_rels[0]
        codes_all = code_rels[0]
        for r in cent_rels[1:]:
            cents_all = cents_all.unionByName(r)
        for r in code_rels[1:]:
            codes_all = codes_all.unionByName(r)
        return cents_all, codes_all

    cents_all, codes_all = pinned(
        ("pq_index", embeddings.semanticHash()), _build
    )

    # Query-side subspace table from ONE filtered scan: slice all M
    # subvectors of each query row and explode, instead of a PQ_M-way
    # union that re-scans the embeddings source once per subspace.
    width = DIM // PQ_M
    sub_structs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col("fv"), m * width + 1, width).alias("qv"),
            )
            for m in range(PQ_M)
        ]
    )
    qsubs = (
        base_full.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.explode(sub_structs).alias("s"))
        .select(
            "query_id",
            F.col("s.m").alias("m"),
            F.col("s.qv").alias("qv"),
        )
        .withColumn("qn2", norm2(F.col("qv")))
    )

    d2 = (
        F.col("qn2")
        + F.col("cn2")
        - 2 * dot(F.col("qv"), F.col("centroid"))
    )
    dtab = qsubs.join(F.broadcast(cents_all), "m").select(
        "query_id",
        "m",
        F.col("cluster").alias("code"),
        F.round(d2 * F.lit(1e6), 0).cast("long").alias("pi6"),
    )
    scored = (
        codes_all.join(F.broadcast(dtab), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pi6").cast("long").alias("adc_i6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_i6"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("adc_i6") / F.lit(1e6)).alias("adc"),
            "rank",
        )
    )


#: ADC shortlist size feeding the exact rerank — the standard PQ
#: serving shape (shortlist by codes, rerank the shortlist exactly).
PQ_SHORTLIST = 100


def ann_pq_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """PQ serving path: ADC shortlist of ``shortlist`` candidates per
    query (codes only — no raw vectors touched), then EXACT cosine over
    the shortlist alone. Returns (query_id, neighbor_id, cos, rank).

    Work at query time is output-sized: |Q|·shortlist exact distances,
    not |Q|·N — the recall/cost dial every production PQ system ships
    (declared recall on the synthetic corpus is measured in
    test_round7_ops; uniform random vectors are PQ's worst case, real
    clustered embeddings do far better)."""
    short = ann_pq(embeddings, query_ids, k=shortlist).select(
        "query_id", "neighbor_id"
    )
    base = with_norm(embeddings.select("vec_id", "embedding"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    scored = (
        base.join(short, base.vec_id == short.neighbor_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- int8 scalar quantization (SQ8) ---------------------------------------

#: Quantization levels per dimension (uint8 grid 0..255 — the faiss
#: ScalarQuantizer QT_8bit shape). At 100 TB this is THE storage story:
#: a 64-dim float32 vector is 256 B raw; its SQ8 codes are 64 B — a 4×
#: scan/IO reduction for every ANN probe that can tolerate the grid.
SQ8_LEVELS = 255

#: Approximate-scan shortlist feeding the exact rerank (same serving
#: shape as PQ_SHORTLIST: shortlist from compressed codes, rerank the
#: shortlist against raw vectors).
SQ8_SHORTLIST = 50


def sq8_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension training stats as ONE row: (mins array<double>,
    ranges array<double>) with ranges[i] = max_i − min_i. min/max are
    order-free aggregates — no float-summation-order edge — so the
    stats are bit-identical cross-engine. One corpus scan; 1-row
    result; broadcast to every consumer."""
    return _sq8_stats_of(
        embeddings.select(_to_double(F.col("embedding")).alias("v")), "v"
    )


def _sq8_stats_of(df: DataFrame, vec_col: str) -> DataFrame:
    """Grid-stats core over any (…, vec_col array<double>) relation —
    shared by the raw-vector grid and the projected-vector grid
    (ann_rp_sq8_rerank)."""
    pos = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    per_dim = pos.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return per_dim.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn", "mx"))),
            lambda s: s["mx"] - s["mn"],
        ).alias("ranges"),
    )


def _sq8_code_arr(v, mins, ranges):
    """codes[i] = floor((v[i] − mn[i]) · 255 / range[i] + 0.5), 0 when
    the dimension is degenerate (range 0). Every term is a plain IEEE
    double op in a FIXED order and floor is exact — the oracle spells
    the identical expression, so codes match bit-for-bit."""
    shifted = F.zip_with(v, mins, lambda x, mn: x - mn)
    return F.zip_with(
        shifted,
        ranges,
        lambda d, r: F.when(
            r > 0, F.floor(d * F.lit(float(SQ8_LEVELS)) / r + F.lit(0.5))
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )


def _sq8_recon_arr(codes, mins, ranges):
    """recon[i] = mn[i] + code[i] · (range[i] / 255) — grid-point
    reconstruction (codes sit ON the grid, so a vector at a grid point
    reconstructs exactly)."""
    scaled = F.zip_with(
        codes, ranges, lambda c, r: c * (r / F.lit(float(SQ8_LEVELS)))
    )
    return F.zip_with(scaled, mins, lambda s, mn: mn + s)


def pinned_sq8(embeddings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The SQ8 index pair, built once per corpus: ``stats`` (1 row —
    the trained per-dim grid) and ``codes`` (vec_id, codes array<int>)
    — the compressed table every approximate scan reads INSTEAD of the
    raw vectors. Train + encode is one stats scan + one encode scan."""
    from ..pinned import pinned

    def _build():
        stats = sq8_dim_stats(embeddings)
        codes = (
            embeddings.select(
                "vec_id", _to_double(F.col("embedding")).alias("v")
            )
            .crossJoin(F.broadcast(stats))
            .select(
                "vec_id",
                _sq8_code_arr(F.col("v"), F.col("mins"), F.col("ranges")).alias(
                    "codes"
                ),
            )
        )
        return stats, codes

    return pinned(("sq8_index", embeddings.semanticHash()), _build)


def sq8_codes(embeddings: DataFrame) -> DataFrame:
    """The materialized code table, rolled down for the cross-engine
    check: (vec_id, code_sum, code_fp) — code_sum is the exact integer
    sum of the 64 codes, code_fp the md5 of the comma-joined code
    string, so the hash covers every byte of the compressed vector."""
    _, codes = pinned_sq8(embeddings)
    s = F.aggregate(
        F.col("codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
    )
    return codes.select(
        "vec_id",
        s.alias("code_sum"),
        F.md5(
            F.array_join(
                F.transform(F.col("codes"), lambda c: c.cast("string")), ","
            ).cast("binary")
        ).alias("code_fp"),
    )


def ann_sq8_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = SQ8_SHORTLIST,
) -> DataFrame:
    """SQ8 serving path: the approximate scan reads ONLY the code table
    (reconstructing each candidate on the fly from its 64 bytes —
    asymmetric: the query stays full-precision), shortlists
    ``shortlist`` candidates per query by reconstructed cosine, then
    reranks the shortlist EXACTLY against raw vectors. Returns
    (query_id, neighbor_id, cos, rank).

    Scale: the hot loop scans N·64 B codes + a broadcast 1-row grid +
    a broadcast |Q|-row query relation; raw vectors are touched only
    for |Q|·shortlist rows — the output-sized rerank, identical to the
    PQ serving shape. Recall loss is bounded by the grid resolution
    (≤ range/510 per-coordinate reconstruction error), measured in
    tests rather than assumed."""
    stats, codes = pinned_sq8(embeddings)
    base = with_norm(embeddings.select("vec_id", "embedding"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    recon = _sq8_recon_arr(F.col("codes"), F.col("mins"), F.col("ranges"))
    cand = (
        codes.crossJoin(F.broadcast(stats))
        .select("vec_id", recon.alias("rv"))
        .withColumn("rn2", norm2(F.col("rv")))
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine(F.col("qv"), F.col("rv"), F.col("qn2"), F.col("rn2")), 6
            ).alias("acos"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    short = (
        cand.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    scored = (
        base.join(short, base.vec_id == short.neighbor_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- sparse random projection (Johnson–Lindenstrauss) ---------------------

#: Output dimensionality of the JL projection — the dim-reduction scale
#: path COMPLEMENTARY to quantization: SQ8/PQ shrink bytes-per-
#: coordinate, the projection shrinks the COORDINATE COUNT (64 → 16
#: doubles, and 64 → 16 B once composed with SQ8 codes downstream).
RP_DIM = 16

#: Projected-scan shortlist feeding the exact rerank (same serving
#: shape as SQ8_SHORTLIST / PQ_SHORTLIST, sized 2x larger): dropping
#: 48 of 64 dimensions costs more ranking fidelity than quantizing all
#: 64 (SQ8's per-coordinate error is bounded by the grid step;
#: truncation error is unbounded), so the projection path buys back
#: recall through its cheap shortlist — each candidate costs 16
#: multiply-adds vs 64, so shortlist 100 here scans FEWER flops than
#: shortlist 25 over raw vectors. On near-orthogonal uniform-random
#: corpora (the JL worst case, and exactly what the synthetic
#: embeddings table is) recall tops out low no matter the output dim —
#: measured 0.37-0.43 for dims 16-32 at shortlist 100 — while on
#: clustered embeddings (every real text/image encoder) the projected
#: ranking recovers the brute-force top-k almost exactly
#: (test-pinned >= 0.9 on a 5-cluster corpus).
RP_SHORTLIST = 100


def _rp_coef(i: int, j: int) -> float:
    """Deterministic sparse Achlioptas entry r[i][j] ∈ {−1, 0, +1} with
    density 1/3 — pure integer arithmetic evaluated IDENTICALLY in
    Python (literals here) and SQL (the oracle), the `_plane_coef`
    convention with a disjoint salt so projection rows and LSH planes
    are independent. The usual √(3/k) scale factor is dropped: it
    multiplies every output coordinate uniformly, and cosine is
    invariant under uniform scaling.

    The reduction uses the LARGE modulus 2001 (the `_plane_coef`
    convention) rather than % 6: with a mod-6 reduction the multiplier
    2654435761 ≡ 1 and 2003 ≡ −1 (mod 6), so the entry would depend
    only on (j − i) mod 6 — a period-6 circulant with 6 distinct rows
    and numeric rank 5, i.e. 11 of the 16 output coordinates would be
    linear copies. Mixing through % 2001 first keeps the full matrix
    rank (16, test-pinned) while preserving the 1/6 : 1/6 : 2/3
    Achlioptas split (334 : 333 : 1334 out of 2001)."""
    h = ((i * 2003 + j) * 2654435761) % 2001
    return 1.0 if h < 334 else (-1.0 if h < 667 else 0.0)


def rp_project(vcol):
    """array<double>[RP_DIM]: y_i = Σ_j v_j · r[i][j], each output
    coordinate the same order-stable left-fold dot as every vector op
    here — bit-identical cross-engine."""
    return F.array(
        *[
            dot(
                vcol,
                F.array(*[F.lit(_rp_coef(i, j)) for j in range(1, DIM + 1)]),
            )
            for i in range(1, RP_DIM + 1)
        ]
    )


def pinned_rp(embeddings: DataFrame) -> tuple[DataFrame]:
    """The projected base table (vec_id, pv array<double>[16], pn2),
    built once per corpus — the relation the approximate scan reads
    INSTEAD of raw vectors (16 doubles vs 64 floats: 2× bytes, 4× fewer
    multiply-adds per candidate; at 100 TB the projection runs in the
    ingest pass and the raw vectors never enter the serving path)."""
    from ..pinned import pinned

    def _build():
        base = embeddings.select(
            "vec_id", _to_double(F.col("embedding")).alias("v")
        )
        proj = base.select("vec_id", rp_project(F.col("v")).alias("pv"))
        return (proj.withColumn("pn2", norm2(F.col("pv"))),)

    return pinned(("rp_index", embeddings.semanticHash()), _build)


def rp_projections(embeddings: DataFrame) -> DataFrame:
    """The materialized projection, exploded for the cross-engine
    check: (vec_id, dim 1-based, val) with val rounded at 6dp — one row
    per output coordinate, so the hash covers every projected value
    without a float-to-string formatting edge."""
    (proj,) = pinned_rp(embeddings)
    return proj.select(
        "vec_id", F.posexplode(F.col("pv")).alias("dim0", "raw")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.round(F.col("raw"), 6).alias("val"),
    )


def ann_rp_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = RP_SHORTLIST,
) -> DataFrame:
    """JL serving path: the approximate scan scores 16-dim projected
    cosines over the pinned projection table (queries projected with
    the SAME matrix — JL preserves angles in expectation, so projected
    cosine ranks well), shortlists ``shortlist``, then reranks the
    shortlist EXACTLY against raw vectors. Returns
    (query_id, neighbor_id, cos, rank) — the same contract as the SQ8
    and PQ serving paths, making the three scale paths drop-in
    interchangeable behind one recall/cost dial."""
    (proj,) = pinned_rp(embeddings)
    base = with_norm(embeddings.select("vec_id", "embedding"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    qp = proj.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("pv").alias("qpv"),
        F.col("pn2").alias("qpn2"),
    )
    cand = (
        proj.crossJoin(F.broadcast(qp))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine(F.col("qpv"), F.col("pv"), F.col("qpn2"), F.col("pn2")),
                6,
            ).alias("acos"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    short = (
        cand.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    scored = (
        base.join(short, base.vec_id == short.neighbor_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- RP ∘ SQ8: project then quantize (16 bytes per vector) ----------------

def pinned_rp_sq8(embeddings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The composed index: SQ8-quantize the PINNED 16-dim projection —
    (stats16, codes16) with codes16 = (vec_id, codes array<int>[16]).
    The memory-hierarchy end point of the vector tier: 256 B raw
    float32 → 64 B SQ8 → 128 B projected doubles (16 f64; 64 B as f32)
    → **16 B projected codes**, a 16× scan reduction over raw — the
    shape a 100 TB ANN index actually ships (OPQ/IVFPQ-class systems
    compose reduction and quantization exactly like this). Both stages
    reuse the pinned family builds; the compose adds one 16-dim stats
    scan + one encode scan over the projection."""
    from ..pinned import pinned

    def _build():
        (proj,) = pinned_rp(embeddings)
        stats16 = _sq8_stats_of(proj, "pv")
        codes16 = (
            proj.crossJoin(F.broadcast(stats16))
            .select(
                "vec_id",
                _sq8_code_arr(F.col("pv"), F.col("mins"), F.col("ranges")).alias(
                    "codes"
                ),
            )
        )
        return stats16, codes16

    return pinned(("rp_sq8_index", embeddings.semanticHash()), _build)


def emb_rp_sq8_codes(embeddings: DataFrame) -> DataFrame:
    """The 16-byte composed code table, rolled down for the
    cross-engine check exactly like ``sq8_codes``: (vec_id, code_sum,
    code_fp)."""
    _, codes16 = pinned_rp_sq8(embeddings)
    s = F.aggregate(
        F.col("codes"), F.lit(0).cast("long"), lambda acc, c: acc + c
    )
    return codes16.select(
        "vec_id",
        s.alias("code_sum"),
        F.md5(
            F.array_join(
                F.transform(F.col("codes"), lambda c: c.cast("string")), ","
            ).cast("binary")
        ).alias("code_fp"),
    )


def ann_rp_sq8_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    shortlist: int = RP_SHORTLIST,
) -> DataFrame:
    """Composed serving path: the approximate scan reads ONLY the
    16-byte code table (reconstruct 16 dims on the fly, score against
    the query's FULL-PRECISION projection — asymmetric at both stages),
    shortlists ``shortlist``, exact-reranks against raw vectors.
    Returns (query_id, neighbor_id, cos, rank) — same contract as the
    SQ8 / PQ / RP paths. The grid step costs ≤ range/510 per projected
    coordinate on top of the projection's own distortion, so recall
    tracks ``ann_rp_rerank`` closely (test-pinned equal-or-near on the
    clustered corpus)."""
    stats16, codes16 = pinned_rp_sq8(embeddings)
    (proj,) = pinned_rp(embeddings)
    base = with_norm(embeddings.select("vec_id", "embedding"))
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    qp = proj.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("pv").alias("qpv"),
        F.col("pn2").alias("qpn2"),
    )
    recon = _sq8_recon_arr(F.col("codes"), F.col("mins"), F.col("ranges"))
    cand = (
        codes16.crossJoin(F.broadcast(stats16))
        .select("vec_id", recon.alias("rv"))
        .withColumn("rn2", norm2(F.col("rv")))
        .crossJoin(F.broadcast(qp))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine(F.col("qpv"), F.col("rv"), F.col("qpn2"), F.col("rn2")),
                6,
            ).alias("acos"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("acos"), F.asc("vec_id"))
    short = (
        cand.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    scored = (
        base.join(short, base.vec_id == short.neighbor_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine(F.col("qv"), F.col("v"), F.col("qn2"), F.col("n2")), 6
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


# --- batch kNN-join: the all-vectors kNN graph -----------------------------

#: Query/member sub-blocks per IVF cell for the kNN scorer's Arrow
#: groups (the semantic scorer's SEM_SCORE_BLOCKS device, bipartite
#: form): tasks = |cells|·B², replication factor of each vector row is
#: exactly B.
KNN_SCORE_BLOCKS = 8

#: Raw-cosine margin for the per-group shortlist: must exceed one 6dp
#: rounding bucket (1e-6) so every candidate that can tie into the
#: rounded top-k survives the raw pre-cut.
KNN_ROUND_MARGIN = 2e-6


def _group_topk_thresholds(gids, cos, kk):
    """Per-group k-th-largest shortlist thresholds, fully vectorized.

    ``gids`` are the pair rows' group keys (any int array), ``cos`` the
    raw scores. Returns (order, starts, counts, thresh) where ``order``
    sorts rows by (gid asc, cos desc), ``starts``/``counts`` delimit
    each group in that order, and ``thresh[g]`` is the group's k-th
    best raw cos minus KNN_ROUND_MARGIN (−inf for groups with ≤ kk
    rows — those keep everything). The k-th-largest VALUE from a
    descending sort is identical to the np.partition form the
    row-at-a-time scorer used, so shortlist membership is unchanged."""
    import numpy as np

    order = np.lexsort((-cos, gids))
    g_sorted = gids[order]
    c_sorted = cos[order]
    uniq, starts, counts = np.unique(
        g_sorted, return_index=True, return_counts=True
    )
    thresh = np.full(len(uniq), -np.inf)
    big = counts > kk
    thresh[big] = c_sorted[starts[big] + kk - 1] - KNN_ROUND_MARGIN
    return order, starts, counts, thresh


def knn_graph(
    embeddings: DataFrame, k: int = 10, nprobe: int = 1
) -> DataFrame:
    """Top-k neighbors for EVERY vector (the kNN graph) via the same
    IVF cell blocking as ``ann_ivf``, generalized from a broadcast
    query list to the whole corpus — the input SemDeDup / diversity
    pruning / graph-based ANN indexes (NN-Descent seeds, DiskANN
    builds) need at corpus scale. Returns
    (vec_id, neighbor_id, cos, rank ≤ k), self excluded, ties broken
    by neighbor_id — identical semantics to ``ann_ivf`` with every
    vector as a query.

    Spark shape (NO per-query broadcast, NO all-pairs):
    1. Probe assignment is a 1-row broadcast fold: the pinned centroid
       table (shared pin with ann_ivf) collapses to ONE row holding the
       (label, centroid, cn2) array; each vector picks its ``nprobe``
       nearest cells with pure array ops (transform → array_sort →
       slice) — zero shuffles, the house bounded-relation cross device.
       The sort key is (1 − ccos, label): ascending struct order ≡
       (cos DESC, label ASC) without a negative-zero hazard.
    2. Candidates come from ONE equi-join on the cell id — each vector
       meets only the ~nprobe·N/L vectors of its probed cells, never
       the corpus.
    3. Exact top-k per vector over the cell-bounded candidate set.

    Scale: shuffle volume is the candidate set (nprobe·N²/L rows),
    the irreducible cost of an exact-within-cells kNN graph — L (and
    nprobe) is the knob that bounds it; the window's per-key group is
    cell-sized, never corpus-sized. At 100 TB: centroids stay a tiny
    broadcast, the label join co-partitions with AQE skew handling,
    and output is exactly k·N rows."""
    from ..pinned import pinned

    base = with_norm(embeddings.select("vec_id", "label", "embedding"))
    (cents,) = pinned(
        ("ivf_centroids", embeddings.semanticHash()),
        lambda: (
            cluster_centroids(embeddings).withColumn(
                "cn2", norm2(F.col("centroid"))
            ),
        ),
    )
    cent_row = cents.agg(
        F.collect_list(F.struct("label", "centroid", "cn2")).alias("cs")
    )
    v, n2 = F.col("v"), F.col("n2")
    keyed = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            (
                F.lit(1.0)
                - F.round(
                    dot(v, c["centroid"]) / (F.sqrt(n2) * F.sqrt(c["cn2"])), 6
                )
            ).alias("key"),
            c["label"].alias("lbl"),
        ),
    )
    probes = (
        base.crossJoin(F.broadcast(cent_row))
        .select(
            "vec_id",
            "v",
            "n2",
            F.explode(
                F.slice(
                    F.transform(F.array_sort(keyed), lambda s: s["lbl"]),
                    1,
                    nprobe,
                )
            ).alias("probe_label"),
        )
    )
    # Scoring runs at the Arrow boundary, NOT as a JVM pair join: the
    # equi-join form materializes BOTH 64-double arrays into every
    # candidate row — 40M pairs × ~1 KB ≈ 40 GB of array copying at
    # sf1, measured 33.7 s for the cosine evaluation alone — the exact
    # failure mode the semantic-dedup scorer documents. Instead, each
    # (cell, query-block, member-block) becomes one applyInPandas group
    # (queries hash into KNN_SCORE_BLOCKS blocks and replicate over
    # member blocks, members vice versa — each array ships B times,
    # ~180 MB at sf1, instead of |cell| times), and numpy scores the
    # bipartite block ONCE per matrix.
    #
    # Bit-exactness: dots are the same strictly-sequential left fold as
    # the JVM/list_sum form (the semantic scorer's proof); the 6dp
    # round and the rank window stay JVM-SIDE on the raw doubles.
    # Python emits a per-(group, query) SUPERSET shortlist — everything
    # with raw cos ≥ (k-th best raw) − KNN_ROUND_MARGIN — because the
    # final rank orders by ROUNDED cos with id tie-break: a candidate
    # outside the raw top-k can still enter the rounded top-k only by
    # tying a raw-better candidate inside the same 1e-6 rounding
    # bucket, so the margin (2e-6 > one bucket width) is sufficient;
    # the final window then computes exact global ranks over the
    # ≤ B·shortlist rows per vector.
    b_q = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(KNN_SCORE_BLOCKS)).cast(
        "int"
    )
    q_rep = probes.select(
        F.col("vec_id"),
        F.col("probe_label").cast("long").alias("cell"),
        "v",
        "n2",
        F.lit(0).alias("role"),
        b_q.alias("qb"),
        F.explode(
            F.sequence(F.lit(0), F.lit(KNN_SCORE_BLOCKS - 1))
        ).alias("mb"),
    )
    m_rep = base.select(
        F.col("vec_id"),
        F.col("label").cast("long").alias("cell"),
        "v",
        "n2",
        F.lit(1).alias("role"),
        F.explode(
            F.sequence(F.lit(0), F.lit(KNN_SCORE_BLOCKS - 1))
        ).alias("qb"),
        b_q.alias("mb"),
    ).select("vec_id", "cell", "v", "n2", "role", "qb", "mb")

    kk = int(k)

    def _score(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "cos_raw": []}
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "cos_raw": "float64"}
        )
        qs = pdf[pdf["role"] == 0]
        ms = pdf[pdf["role"] == 1]
        if len(qs) == 0 or len(ms) == 0:
            return empty
        q_ids = qs["vec_id"].to_numpy()
        m_ids = ms["vec_id"].to_numpy()
        Qv = np.stack(qs["v"].to_numpy())
        Mv = np.stack(ms["v"].to_numpy())
        qn = np.sqrt(qs["n2"].to_numpy())
        mn = np.sqrt(ms["n2"].to_numpy())
        # Vectorized bipartite scoring (guide §4.2): one outer-product
        # accumulation per dimension replaces the per-query Python
        # loop. Each (i, m) element still receives Qv[i, j]·Mv[m, j] in
        # strictly ascending j order — the identical sequential fold,
        # bit-for-bit, as the row-at-a-time form it replaces.
        acc = np.zeros((len(q_ids), len(m_ids)))
        for j in range(Qv.shape[1]):
            acc += np.multiply.outer(Qv[:, j], Mv[:, j])
        cos = acc / np.multiply.outer(qn, mn)
        cos[np.equal.outer(q_ids, m_ids)] = -np.inf  # self-pairs
        flat = cos.ravel()
        rows = np.repeat(np.arange(len(q_ids)), len(m_ids))
        valid = flat > -np.inf
        flat, rows = flat[valid], rows[valid]
        cols = np.tile(np.arange(len(m_ids)), len(q_ids))[valid]
        if len(flat) == 0:
            return empty
        order, starts, counts, thresh = _group_topk_thresholds(
            rows, flat, kk
        )
        keep_sorted = flat[order] >= np.repeat(thresh, counts)
        sel = order[keep_sorted]
        return pd.DataFrame(
            {
                "vec_id": q_ids[rows[sel]],
                "neighbor_id": m_ids[cols[sel]],
                "cos_raw": flat[sel],
            }
        )

    raw = (
        q_rep.unionByName(m_rep)
        .groupBy("cell", "qb", "mb")
        .applyInPandas(_score, "vec_id long, neighbor_id long, cos_raw double")
    )
    scored = raw.select(
        "vec_id", "neighbor_id", F.round(F.col("cos_raw"), 6).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def pinned_knn_graph(
    embeddings: DataFrame, k: int = 10, nprobe: int = 1
) -> DataFrame:
    """``knn_graph`` as a PINNED per-(corpus, k, nprobe) index — the
    kNN graph is a build-once artifact (SemDeDup, diversity pruning,
    and any graph-ANN consumer read the same neighbors); every serve
    reads the k·N-row relation."""
    from ..pinned import pinned

    (g,) = pinned(
        ("knn_graph", embeddings.semanticHash(), int(k), int(nprobe)),
        lambda: (knn_graph(embeddings, k=k, nprobe=nprobe),),
    )
    return g


def diversity_prune(
    embeddings: DataFrame, k: int = 5, min_cos: float = 0.4, nprobe: int = 1
) -> DataFrame:
    """kNN-graph diversity pruning — the operation the all-vectors kNN
    graph exists to feed (SemDeDup §4 / SSL-prototypes shape): a vector
    is REDUNDANT when its nearest neighbor is close enough
    (cos ≥ min_cos) and has a smaller id (keep-min, the dedup family's
    canonical rule — exactly one survivor per mutually-close pair, no
    cascade ambiguity because the rule is a pure pairwise predicate).
    Returns (vec_id, nn_id, nn_cos, keep) for EVERY vector: nn is the
    rank-1 neighbor from ``knn_graph`` (NULL when the vector's probed
    cell holds no other vector), keep = NOT (nn_cos ≥ min_cos AND
    nn_id < vec_id).

    Scale: one filter over the pinned-shape kNN graph (rank = 1 rows,
    N rows total) + the left join back to the corpus id list — the
    graph is the expensive artifact and is built by ``knn_graph``'s
    cell-blocked plan; pruning adds nothing but a projection."""
    nn = pinned_knn_graph(embeddings, k=k, nprobe=nprobe).filter(
        F.col("rank") == 1
    ).select(
        "vec_id",
        F.col("neighbor_id").alias("nn_id"),
        F.col("cos").alias("nn_cos"),
    )
    return (
        embeddings.select("vec_id")
        .join(nn, "vec_id", "left")
        .select(
            "vec_id",
            "nn_id",
            "nn_cos",
            F.coalesce(
                ~(
                    (F.col("nn_cos") >= F.lit(float(min_cos)))
                    & (F.col("nn_id") < F.col("vec_id"))
                ),
                F.lit(True),
            ).alias("keep"),
        )
    )


def knn_refine(
    embeddings: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    rev_cap: int | None = None,
    rounds: int = 1,
) -> DataFrame:
    """NN-Descent refinement over the pinned kNN graph (Dong et al.
    2011, the standard graph-ANN build step ``knn_graph``'s docstring
    names as its consumer): "a neighbor of a neighbor is likely a
    neighbor" — each round expands every vector's candidate set to its
    two-hop neighborhood over the SYMMETRIZED current graph, re-scores
    exactly, keeps the global top-k. Because the seed graph's edges can
    cross IVF cells (a vector's probed cell is its nearest CENTROID's,
    not necessarily its own label's), the expansion recovers true
    neighbors the cell-bounded seed pass missed — recall improves
    monotonically round over round, and the current neighbors ride the
    candidate union so no (vec, rank) slot can regress (the keep-best
    invariant of NN-Descent).

    Determinism + boundedness: reverse edges are capped at ``rev_cap``
    (default k) per target — the k best in-edges by (cos DESC, vec_id
    ASC) — so the symmetrized degree is ≤ 2k and each round's candidate
    set ≤ 4k² per vector (NN-Descent's sampled reverse neighborhood,
    made deterministic by ranking instead of sampling; the r11
    hot-bucket lesson applied BEFORE the skew bites: in-degree hubs are
    exactly the skew that would otherwise square).

    ``rounds`` iterates the step (full NN-Descent runs to convergence;
    each extra round reaches one hop further across cell boundaries at
    the same bounded per-round cost). Intermediate round graphs ride
    TRACKED localCheckpoints (the iterative-operator house lifecycle:
    round i's scratch is freed as soon as round i+1 is materialized;
    the last intermediate stays alive backing the returned lazy plan
    and is reclaimed by the registry's release hooks).

    Spark shape per round: the expansion is two self-joins on the
    k·N-row edge relation (never touches vectors); re-scoring runs at
    the Arrow boundary with the same blocked-bipartite device as
    ``knn_graph`` — pairs land in their (hash(u), hash(w)) block-pair
    group alongside the ≤ B-replicated query/member vectors, numpy
    evaluates each group's pair list with the strictly-sequential
    per-dimension fold (bit-identical to the JVM/list_sum form), the
    6dp round and the exact rank window stay JVM-side. Shuffle volume
    per round is the candidate list (≤ 4k²N skinny id-pair rows) plus
    2·B·N vector rows; output is k·N."""
    from .. import checkpoints
    from ..pinned import pinned

    assert rounds >= 1
    g = pinned_knn_graph(embeddings, k=k, nprobe=nprobe)
    rcap = int(rev_cap) if rev_cap is not None else int(k)
    base = with_norm(embeddings.select("vec_id", "label", "embedding"))
    held: frozenset[int] | None = None
    for i in range(int(rounds)):
        if i == 0:
            # Round 1's symmetrized capped view derives from the PINNED
            # seed graph alone, so it is itself a build-once adjacency
            # index (the graph tier's pinned_bi precedent) — pinned per
            # (corpus, k, nprobe, rcap) and shared by every refine
            # serve off this seed; it feeds BOTH sides of the two-hop
            # self-join, which would otherwise recompute it twice.
            (und,) = pinned(
                (
                    "knn_und",
                    embeddings.semanticHash(),
                    int(k),
                    int(nprobe),
                    rcap,
                ),
                lambda: (_symmetrize_capped(g, rcap),),
            )
            und_ids: frozenset[int] = frozenset()
        else:
            # Later rounds symmetrize the PREVIOUS round's graph — a
            # per-call intermediate, so it rides a tracked
            # localCheckpoint instead of a pin (still materialized
            # once, not recomputed per join side).
            und, und_ids = checkpoints.checkpoint(
                _symmetrize_capped(g, rcap)
            )
        out = _nn_descent_round(base, g, und, k)
        if i < int(rounds) - 1:
            out, ids = checkpoints.checkpoint(out)
            # Round output is materialized: this round's symmetrized-
            # view scratch and the previous round's graph are both dead.
            if und_ids:
                checkpoints.free(out.sparkSession, und_ids)
            if held:
                checkpoints.free(out.sparkSession, held)
            held = ids
        else:
            # The final round's lazy plan still reads its symmetrized
            # view; a checkpointed one stays tracked and is reclaimed
            # with the round graph by the registry's release hooks.
            pass
        g = out
    return g


def pinned_knn_refined(
    embeddings: DataFrame,
    k: int = 10,
    nprobe: int = 1,
    rev_cap: int | None = None,
    rounds: int = 1,
) -> DataFrame:
    """The refined kNN graph as a PINNED per-(corpus, params) product —
    the graph-ANN serving model: NN-Descent is a BUILD step (its own
    docstring's contract), so the expand/re-score/top-k rounds execute
    once per corpus snapshot and every serve reads the k·N edge
    relation, exactly like the seed ``pinned_knn_graph`` it refines.
    The rounds' tracked checkpoints land in the pin's backing set
    (pinned's before/after diff), so either release hook reclaims the
    whole build and the bench's cold pass re-pays it."""
    from ..pinned import pinned

    rcap = int(rev_cap) if rev_cap is not None else int(k)
    (g,) = pinned(
        (
            "knn_refined",
            embeddings.semanticHash(),
            int(k),
            int(nprobe),
            rcap,
            int(rounds),
        ),
        lambda: (knn_refine(embeddings, k, nprobe, rcap, rounds),),
    )
    return g


def _symmetrize_capped(g: DataFrame, rcap: int) -> DataFrame:
    """The symmetrized rank-capped edge view of graph ``g``: forward
    edges plus the ≤ ``rcap`` best reverse edges per target
    (cos DESC, vec_id ASC), deduplicated — NN-Descent's deterministic
    sampled reverse neighborhood (see ``knn_refine``)."""
    wrev = Window.partitionBy("neighbor_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    rev = (
        g.withColumn("rr", F.row_number().over(wrev))
        .filter(F.col("rr") <= rcap)
        .select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )
    return g.select("vec_id", "neighbor_id").unionByName(rev).distinct()


def _nn_descent_round(
    base: DataFrame, g: DataFrame, und: DataFrame, k: int
) -> DataFrame:
    """One expand → re-score → top-k step over graph ``g``
    (vec_id, neighbor_id, cos, rank) with its materialized symmetrized
    view ``und`` (pinned or checkpointed by the caller — it feeds BOTH
    sides of the two-hop self-join), using the normalized corpus
    ``base`` (vec_id, v, n2). See ``knn_refine`` for the contract.
    The candidate list is NOT deduplicated relationally: every copy of
    a (u, w) pair lands in the same (blk(u), blk(w)) scorer group, so
    the scorer dedups with one vectorized np.unique instead of a full
    candidate-sized Exchange + aggregate (guide §2.4)."""
    twohop = (
        und.alias("a")
        .join(
            und.select(
                F.col("vec_id").alias("mid"),
                F.col("neighbor_id").alias("cand_id"),
            ),
            F.col("a.neighbor_id") == F.col("mid"),
        )
        .select("vec_id", "cand_id")
        .filter(F.col("vec_id") != F.col("cand_id"))
    )
    cand = twohop.unionByName(
        g.select("vec_id", F.col("neighbor_id").alias("cand_id"))
    )

    B = KNN_SCORE_BLOCKS
    blk = lambda c: F.pmod(F.xxhash64(c), F.lit(B)).cast("int")  # noqa: E731
    all_blocks = F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    null_v = F.lit(None).cast("array<double>")
    null_d = F.lit(None).cast("double")
    q_rep = base.select(
        "vec_id",
        F.lit(None).cast("long").alias("other_id"),
        "v",
        "n2",
        F.lit(0).alias("role"),
        blk(F.col("vec_id")).alias("qb"),
        all_blocks.alias("mb"),
    )
    m_rep = base.select(
        "vec_id",
        F.lit(None).cast("long").alias("other_id"),
        "v",
        "n2",
        F.lit(1).alias("role"),
        all_blocks.alias("qb"),
        blk(F.col("vec_id")).alias("mb"),
    ).select("vec_id", "other_id", "v", "n2", "role", "qb", "mb")
    p_rep = cand.select(
        "vec_id",
        F.col("cand_id").alias("other_id"),
        null_v.alias("v"),
        null_d.alias("n2"),
        F.lit(2).alias("role"),
        blk(F.col("vec_id")).alias("qb"),
        blk(F.col("cand_id")).alias("mb"),
    )

    kk = int(k)

    def _score_pairs(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "cos_raw": []}
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "cos_raw": "float64"}
        )
        ps = pdf[pdf["role"] == 2]
        if len(ps) == 0:
            return empty
        qs = pdf[pdf["role"] == 0]
        ms = pdf[pdf["role"] == 1]
        q_ids = qs["vec_id"].to_numpy()
        m_ids = ms["vec_id"].to_numpy()
        Qv = np.stack(qs["v"].to_numpy())
        Mv = np.stack(ms["v"].to_numpy())
        qn = np.sqrt(qs["n2"].to_numpy())
        mn = np.sqrt(ms["n2"].to_numpy())
        # Vectorized pair-list scoring (guide §4.2): one position
        # gather + one per-dimension column fold over the WHOLE pair
        # list replaces the per-vertex Python loop. Each pair row still
        # accumulates Qv[u, j]·Mv[w, j] in strictly ascending j order —
        # the identical sequential fold, bit-for-bit, as the
        # row-at-a-time form it replaces.
        qpos = pd.Index(q_ids).get_indexer(ps["vec_id"].to_numpy())
        mpos = pd.Index(m_ids).get_indexer(ps["other_id"].to_numpy())
        # Dedup the pair list here (np.unique on the packed position
        # key) instead of a candidate-sized distinct Exchange upstream:
        # every copy of a pair hashes into this same group.
        first = np.unique(
            qpos * np.int64(len(m_ids)) + mpos, return_index=True
        )[1]
        qpos, mpos = qpos[first], mpos[first]
        prod = Mv[mpos] * Qv[qpos]
        acc = np.zeros(prod.shape[0])
        for j in range(prod.shape[1]):
            acc = acc + prod[:, j]
        cos = acc / (qn[qpos] * mn[mpos])
        order, starts, counts, thresh = _group_topk_thresholds(
            qpos, cos, kk
        )
        keep_sorted = cos[order] >= np.repeat(thresh, counts)
        sel = order[keep_sorted]
        return pd.DataFrame(
            {
                "vec_id": q_ids[qpos[sel]],
                "neighbor_id": m_ids[mpos[sel]],
                "cos_raw": cos[sel],
            }
        )

    raw = (
        q_rep.unionByName(m_rep)
        .unionByName(p_rep)
        .groupBy("qb", "mb")
        .applyInPandas(
            _score_pairs, "vec_id long, neighbor_id long, cos_raw double"
        )
    )
    scored = raw.select(
        "vec_id", "neighbor_id", F.round(F.col("cos_raw"), 6).alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
