"""PageRank over the social graph — the iterative-analytics flagship
beyond BFS (traverse.py) and connected components (operators/
components.py).

Semantics: standard damped PageRank (Page et al., public) on the
bag-symmetrized edge view (model.symmetrize — the same ``both()``
multiplicity the reference's Gremlin traversal uses, SURVEY O38c). The
vertex domain is the set of edge endpoints; every such vertex has
degree >= 1 under symmetrization, so there is no dangling-mass special
case — isolated vertices (no edges at all) are excluded by declaration
and would hold exactly the teleport mass anyway.

Iteration k: r_{k+1}(v) = (1-d)/N + d * sum_{u->v} r_k(u)/deg(u).

Plan shape per superstep (the classic DataFrame PageRank):
  1. contribs: edges ⋈ state on the tail vertex — the edge side is the
     PINNED hash(src)-partitioned symmetrized view (model.pinned_bi,
     shared with PYMK), so only the vertex-sized state shuffles; the big
     edge relation is materialized and exchanged exactly once per
     process, not once per superstep;
  2. sum by head vertex — shuffle on dst, map-side partial agg;
  3. reattach degree: deg ⋈ agg on id — deg is pinned hash(id)-
     partitioned (model.pinned_bi_deg), no exchange on its side.
Each superstep's state is routed through the tracked-checkpoint
registry (checkpoints.py) so lineage depth stays O(1) per iteration and
the previous round's scratch RDDs are freed eagerly — the same
discipline as BFS/components.

Fixed iteration count keeps the operator a pure dataflow the DuckDB
oracle can mirror with K unrolled CTE rounds; float sums differ from
the oracle only in summation order (ulp-level), absorbed by the 6dp
round on the normalized rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free
from ..pinned import memo
from .model import pinned_bi_deg

DAMPING = 0.85
ITERATIONS = 3  # registered-query default; callers tune freely


def _supersteps(
    bi: DataFrame,
    deg: DataFrame,
    state: DataFrame,
    teleport_col,
    iterations: int,
    damping: float,
) -> DataFrame:
    """Shared damped-iteration loop: ``state`` is (id, d, r);
    ``teleport_col`` is the per-vertex teleport Column added each round.
    Returns the final state relation (still checkpoint-persisted —
    checkpoints.release_all is the caller-facing cleanup handle)."""
    spark = bi.sparkSession
    state_ids = frozenset()
    for _ in range(iterations):
        contribs = bi.join(state, bi["src"] == state["id"]).select(
            F.col("dst").alias("id"), (F.col("r") / F.col("d")).alias("c")
        )
        agg = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        nxt = deg.join(agg, "id").select(
            "id", "d", (teleport_col + F.lit(damping) * F.col("s")).alias("r")
        )
        state, ids = checkpoint(nxt)
        free(spark, state_ids, blocking=False)
        state_ids = ids
    return state


def pagerank(
    edges: DataFrame, iterations: int = ITERATIONS, damping: float = DAMPING
) -> DataFrame:
    """(id, rank) after ``iterations`` damped supersteps; ranks sum to ~1
    over the edge-endpoint vertex domain."""
    spark = edges.sparkSession
    bi, deg = pinned_bi_deg(edges)
    h = edges.semanticHash()
    n = memo(("graph_n", h), deg.count, parent=("graph_bi_deg", h))
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    teleport = (1.0 - damping) / n
    state = deg.withColumn("r", F.lit(1.0 / n))
    out = _supersteps(bi, deg, state, F.lit(teleport), iterations, damping)
    return out.select("id", F.col("r").alias("rank"))


def pagerank_topk(
    edges: DataFrame,
    k: int = 20,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """Top-k vertices by normalized rank (rank * N, mean 1.0, 6dp).

    Ordering is by the ROUNDED value then id — both engines order on
    identical quantities, so a pair separated by less than 5e-7 ties and
    falls to the deterministic id order instead of flapping on ulps.
    TakeOrderedAndProject: per-partition heaps, k-row driver result.
    """
    pr = pagerank(edges, iterations, damping)
    # normalize with a 1-row crossJoin of the vertex count (the same
    # 1x1 combine device as graph_counts) — no single-partition window
    total = pr.agg(F.count(F.lit(1)).alias("_n"))
    return (
        pr.crossJoin(total)
        .select(
            "id", F.round(F.col("rank") * F.col("_n"), 6).alias("rank_norm")
        )
        .orderBy(F.col("rank_norm").desc(), F.col("id").asc())
        .limit(k)
    )


def pagerank_converged(
    edges: DataFrame,
    tol: float = 1e-9,
    damping: float = DAMPING,
    max_iterations: int = 200,
) -> DataFrame:
    """(id, rank) iterated until the L∞ round-over-round delta drops to
    ``tol`` — the convergence-mode companion of the fixed-K ``pagerank``
    (which stays the registered, oracle-unrollable path).

    Same superstep plan as ``pagerank``; the only addition is that each
    round's new state keeps the previous rank beside it long enough for
    an ``Observation`` to measure max|r_new − r_old| DURING the eager
    checkpoint — the stopping probe costs zero extra Spark jobs (the
    kcore device). Damped PageRank is a contraction with factor
    ``damping``, so the delta decreases geometrically and the loop
    terminates for any tol > 0; ``max_iterations`` is a misuse guard
    that RAISES rather than returning an unconverged answer (the
    components.py convergence contract)."""
    spark = edges.sparkSession
    bi, deg = pinned_bi_deg(edges)
    h = edges.semanticHash()
    n = memo(("graph_n", h), deg.count, parent=("graph_bi_deg", h))
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    teleport = (1.0 - damping) / n
    state = deg.withColumn("r", F.lit(1.0 / n))
    state_ids: frozenset = frozenset()
    for _ in range(max_iterations):
        contribs = bi.join(state, bi["src"] == state["id"]).select(
            F.col("dst").alias("id"), (F.col("r") / F.col("d")).alias("c")
        )
        agg = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        nxt = (
            state.select("id", "d", F.col("r").alias("r_prev"))
            .join(agg, "id")
            .select(
                "id",
                "d",
                (F.lit(teleport) + F.lit(damping) * F.col("s")).alias("r"),
                "r_prev",
            )
        )
        obs = Observation()
        watched = nxt.observe(
            obs, F.max(F.abs(F.col("r") - F.col("r_prev"))).alias("delta")
        ).select("id", "d", "r")
        state, ids = checkpoint(watched)
        free(spark, state_ids, blocking=False)
        state_ids = ids
        if float(obs.get["delta"]) <= tol:
            return state.select("id", F.col("r").alias("rank"))
    raise RuntimeError(
        f"pagerank_converged(tol={tol}) did not converge within "
        f"{max_iterations} supersteps"
    )


def personalized_pagerank(
    edges: DataFrame,
    source_id,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """Personalized PageRank: the teleport vector concentrates on ONE
    source vertex, so rank mass measures proximity to that user — the
    random-walk generalization of PYMK's mutual-friend count (2-hop
    paths are exactly the walks PYMK counts; PPR also credits longer
    walks, damped). Same superstep loop and checkpoint discipline as
    ``pagerank``; after K iterations only vertices within K hops carry
    mass, everything else holds exactly 0 — the oracle mirrors this with
    a CASE teleport in each unrolled round. Returns (id, rank)."""
    spark = edges.sparkSession
    bi, deg = pinned_bi_deg(edges)
    h = edges.semanticHash()
    n = memo(("graph_n", h), deg.count, parent=("graph_bi_deg", h))
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")

    teleport = F.when(F.col("id") == source_id, F.lit(1.0 - damping)).otherwise(
        F.lit(0.0)
    )
    state = deg.withColumn(
        "r",
        F.when(F.col("id") == source_id, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    out = _supersteps(bi, deg, state, teleport, iterations, damping)
    return out.select("id", F.col("r").alias("rank"))


def pymk_ppr(
    edges: DataFrame,
    source_id,
    k: int = 10,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """People-you-may-know by personalized PageRank: PPR from the source,
    minus the source itself and its existing 1-hop friends — the same
    exclusion rule as the reference's Gremlin PYMK (aggregate('friends')
    … without('friends'), neptune_recommend_bizcard.py:60-67), with walk
    mass replacing the mutual-friend count as the score. Top-k orders on
    the 9dp-rounded rank (values live at 1e-2..1e-5; ulp noise is 1e-15)
    then id — deterministic, oracle-identical. Friends anti-join before
    the top-k so the heap never holds excluded vertices."""
    pr = personalized_pagerank(edges, source_id, iterations, damping)
    bi, _ = pinned_bi_deg(edges)  # point filter against the cached view
    friends = (
        bi.filter(F.col("src") == source_id)
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    return (
        pr.filter(F.col("id") != source_id)
        .join(friends, "id", "left_anti")
        .select("id", F.round("rank", 9).alias("ppr"))
        .filter(F.col("ppr") > 0)  # only vertices the walk actually reached
        .orderBy(F.col("ppr").desc(), F.col("id").asc())
        .limit(k)
    )


def pinned_pagerank(
    edges: DataFrame, iterations: int = ITERATIONS, damping: float = DAMPING
) -> DataFrame:
    """``pagerank`` as a PINNED index keyed per (edge set, K, d): the
    damped supersteps run once per corpus snapshot; serves — top-k,
    joins, rescoring — read the vertex-sized (id, rank) relation. The
    graph-analytics twin of the search index's posting pin: the
    reference's stores likewise serve precomputed structures, not
    per-request iteration. Release re-pays training (the bench's cold
    pass); the final superstep's tracked checkpoint rides the pin."""
    from ..pinned import pinned

    (pr,) = pinned(
        ("pagerank", edges.semanticHash(), int(iterations), float(damping)),
        lambda: (pagerank(edges, iterations, damping),),
    )
    return pr


def pinned_pagerank_topk(
    edges: DataFrame,
    k: int = 20,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """``pagerank_topk`` served from the pinned rank relation — same
    normalize + rounded-order + TakeOrderedAndProject tail, zero
    supersteps per request."""
    pr = pinned_pagerank(edges, iterations, damping)
    total = pr.agg(F.count(F.lit(1)).alias("_n"))
    return (
        pr.crossJoin(total)
        .select(
            "id", F.round(F.col("rank") * F.col("_n"), 6).alias("rank_norm")
        )
        .orderBy(F.col("rank_norm").desc(), F.col("id").asc())
        .limit(k)
    )


def pinned_pymk_ppr(
    edges: DataFrame,
    source_id,
    k: int = 10,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """``pymk_ppr`` with the per-source walk PINNED — the engine-native
    form of the reference's Redis PYMK result cache (O10:
    ``pymk:query_id:{md5(lower(user))}``, neptune_recommend_bizcard.py
    :87-99): a hot user's personalized walk is computed once per corpus
    snapshot and every request reads it; release is the TTL. The pin is
    per (edge set, source) — bounded by the hot-user working set, the
    same bound the reference's cache carries; cache.py implements the
    byte-level Redis contract at the app layer while this keeps the
    SERVING inside the engine. Concurrently pinned sources are LRU-
    bounded at ``PPR_CACHE_CAP`` (the Redis-maxmemory analogue): the
    coldest source's walk is released and recomputed on its next
    request, so a server answering arbitrary users holds a bounded
    working set instead of one vertex-sized pin per user forever."""
    from ..pinned import pinned

    key = (
        "ppr",
        edges.semanticHash(),
        str(source_id),
        int(iterations),
        float(damping),
    )
    (pr,) = pinned(
        key,
        lambda: (personalized_pagerank(edges, source_id, iterations, damping),),
    )
    _ppr_cache_admit(key)
    bi, _ = pinned_bi_deg(edges)
    friends = (
        bi.filter(F.col("src") == source_id)
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    return (
        pr.filter(F.col("id") != source_id)
        .join(friends, "id", "left_anti")
        .select("id", F.round("rank", 9).alias("ppr"))
        .filter(F.col("ppr") > 0)
        .orderBy(F.col("ppr").desc(), F.col("id").asc())
        .limit(k)
    )


#: Redis-maxmemory analogue for the per-source PPR cache: a long-lived
#: server answering PYMK for arbitrary users would otherwise grow one
#: vertex-sized pinned walk per distinct source forever (the unbounded
#: sibling of pinned.MEMO_CAP). LRU over sources; eviction = release =
#: the reference cache's TTL expiry — recompute on next request, never
#: a correctness event.
PPR_CACHE_CAP = 64
_PPR_LRU: "OrderedDict" = None  # created lazily (collections import below)


def _ppr_cache_admit(key) -> None:
    global _PPR_LRU
    from collections import OrderedDict

    from ..pinned import pinned_keys, release

    if _PPR_LRU is None:
        _PPR_LRU = OrderedDict()
    _PPR_LRU[key] = None
    _PPR_LRU.move_to_end(key)
    # Pins dropped externally (pinned.release_all in a bench cold pass,
    # evict_checkpoint_backed) leave stale LRU keys behind; purge them
    # first so a stale entry never counts against the cap — otherwise
    # the effective number of concurrently LIVE PPR pins sits below
    # PPR_CACHE_CAP until the stale slots age out.
    live = pinned_keys()
    for stale in [k for k in _PPR_LRU if k not in live]:
        del _PPR_LRU[stale]
    while len(_PPR_LRU) > PPR_CACHE_CAP:
        old, _ = _PPR_LRU.popitem(last=False)
        release(old)
