"""General k-hop traversal: BFS shortest paths as an iterative join loop
(the SURVEY §4 extension beyond PYMK's fixed 2 hops — the DataFrame
equivalent of a GraphX/Pregel superstep loop).

Algorithm: level-synchronous BFS. ``dist`` holds settled vertices,
``frontier`` the vertices discovered in the previous superstep; each
iteration expands the frontier one undirected hop, anti-joins the settled
set, and unions the result in. The loop is driver-side control flow but
all data stays distributed; per-level ``localCheckpoint`` truncates the
join lineage so plan depth stays O(1) per superstep instead of O(k)
(the classic iterative-join pitfall — without it, superstep k re-plans
all k-1 prior joins and the DAG grows quadratically).

Scale: each superstep is one join frontier⋈edges. The frontier is NOT
force-broadcast — on a social graph the hop-2 frontier can be a large
fraction of all vertices, and a forced broadcast of a multi-GB frontier
OOMs the driver/executors at 100× scale. Because each frontier is
localCheckpointed, its row count is known for free, so the broadcast hint
is gated on an explicit size bound (``broadcast_max`` rows); above it the
strategy is left to AQE/Catalyst (shuffle join on ``src``). The settled
set is only touched by an anti-join on its key. The converged result is
expressible as a recursive SQL CTE (the oracle) — the *incremental* loop
is what Spark adds: early exit on empty frontier, bounded lineage,
per-level stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free
from .model import symmetrize

#: Frontier row bound under which the broadcast hint is safe. ~1M ids of
#: 8-16 bytes is tens of MB serialized — inside Spark's default 8G
#: broadcast-table hard cap with a wide margin; beyond it, shuffle.
BROADCAST_FRONTIER_MAX = 1_000_000


def expand_frontier(
    bi: DataFrame, frontier: DataFrame, dist: DataFrame, hop: int, *,
    frontier_rows: int, broadcast_max: int = BROADCAST_FRONTIER_MAX,
) -> DataFrame:
    """One BFS superstep (un-checkpointed, for plan inspection): expand
    ``frontier`` one undirected hop and anti-join the settled ``dist``.
    Broadcast is hinted only when the known frontier size is under
    ``broadcast_max``; otherwise Catalyst/AQE picks the join strategy."""
    maybe_small = (
        F.broadcast(frontier) if frontier_rows <= broadcast_max else frontier
    )
    return (
        bi.join(maybe_small, bi["src"] == frontier["id"])
        .select(F.col("dst").alias("id"))
        .distinct()
        .join(dist, "id", "left_anti")
        .withColumn("dist", F.lit(hop).cast("int"))
    )


def shortest_paths(
    edges: DataFrame, source_id, max_hops: int = 4,
    broadcast_max: int = BROADCAST_FRONTIER_MAX,
) -> DataFrame:
    """Undirected BFS distances from ``source_id``: (id, dist) for every
    vertex reachable within ``max_hops`` (source included, dist 0)."""
    spark = edges.sparkSession
    bi = symmetrize(edges).select("src", "dst").persist()

    schema = edges.schema["src"].dataType
    dist = spark.createDataFrame([(source_id, 0)], ["id", "dist"]).select(
        F.col("id").cast(schema).alias("id"), F.col("dist").cast("int").alias("dist")
    )
    frontier = dist.select("id")
    frontier_rows = 1  # the source vertex
    dist_ids = frontier_ids = frozenset()

    for hop in range(1, max_hops + 1):
        # Eager tracked checkpoint: truncates lineage per superstep and
        # hands back a release handle for the round's scratch.
        nxt, nxt_ids = checkpoint(expand_frontier(
            bi, frontier, dist, hop,
            frontier_rows=frontier_rows, broadcast_max=broadcast_max,
        ))
        free(spark, frontier_ids, blocking=False)  # prev frontier consumed
        frontier_rows = nxt.count()  # cheap: nxt is checkpointed
        if frontier_rows == 0:
            free(spark, nxt_ids, blocking=False)
            break
        dist, new_ids = checkpoint(dist.unionByName(nxt))
        free(spark, dist_ids, blocking=False)  # superseded settled set
        dist_ids = new_ids
        frontier, frontier_ids = nxt.select("id"), nxt_ids

    free(spark, frontier_ids)  # the last frontier's data lives on in dist
    bi.unpersist()
    return dist


def multi_source_shortest_paths(
    edges: DataFrame,
    source_ids: list,
    max_hops: int = 4,
    broadcast_max: int = BROADCAST_FRONTIER_MAX,
) -> DataFrame:
    """Landmark BFS: distances from EVERY source in one traversal —
    (src_id, id, dist) for vertices within ``max_hops`` of each source.

    The naive form is |sources| sequential BFS jobs; this vectorizes
    them into one loop by widening the state key to (src_id, id): each
    superstep is STILL one frontier⋈edges join (the frontier carries all
    sources' waves at once), and the settled anti-join keys on the pair.
    This is the landmark-distance primitive behind distance-sketch
    estimators (Das Sarma et al., public): pick k landmarks, one
    traversal, k distance fields per vertex. Same tracked-checkpoint and
    gated-broadcast discipline as ``shortest_paths``; per-superstep cost
    scales with the UNION of the waves, not their sum, when waves
    overlap (the distinct collapses shared expansion work).
    """
    spark = edges.sparkSession
    bi = symmetrize(edges).select("src", "dst").persist()

    schema = edges.schema["src"].dataType
    dist = spark.createDataFrame(
        [(s, s, 0) for s in source_ids], ["src_id", "id", "dist"]
    ).select(
        F.col("src_id").cast(schema).alias("src_id"),
        F.col("id").cast(schema).alias("id"),
        F.col("dist").cast("int").alias("dist"),
    )
    frontier = dist.select("src_id", "id")
    frontier_rows = len(source_ids)
    dist_ids = frontier_ids = frozenset()

    for hop in range(1, max_hops + 1):
        maybe_small = (
            F.broadcast(frontier)
            if frontier_rows <= broadcast_max
            else frontier
        )
        expanded = (
            bi.join(maybe_small, bi["src"] == frontier["id"])
            .select("src_id", F.col("dst").alias("id"))
            .distinct()
            .join(dist, ["src_id", "id"], "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
        )
        if hop == max_hops:
            # Final hop: no further superstep reads this frontier, so
            # the empty-check count is pure overhead — skip it. The
            # union IS still checkpointed: returning the raw lineage
            # would re-run the final frontier join (and recompute
            # symmetrize(edges) once bi is unpersisted) on EVERY action
            # a consumer triggers — closeness aggregates then reuses
            # the result, paying the join twice. One eager checkpoint
            # costs the same as that first re-run and makes the result
            # self-contained, so the superseded scratch (and bi) can be
            # freed NOW instead of lingering until release_all.
            dist, _final_ids = checkpoint(dist.unionByName(expanded))
            free(spark, frontier_ids, blocking=False)
            free(spark, dist_ids, blocking=False)
            bi.unpersist()
            return dist
        nxt, nxt_ids = checkpoint(expanded)
        free(spark, frontier_ids, blocking=False)
        frontier_rows = nxt.count()
        if frontier_rows == 0:
            free(spark, nxt_ids, blocking=False)
            break
        dist, new_ids = checkpoint(dist.unionByName(nxt))
        free(spark, dist_ids, blocking=False)
        dist_ids = new_ids
        frontier, frontier_ids = nxt.select("src_id", "id"), nxt_ids

    free(spark, frontier_ids)
    bi.unpersist()
    return dist


def pinned_landmark_distances(
    edges: DataFrame, landmarks: list, max_hops: int = 4
) -> DataFrame:
    """The landmark distance sketch as a PINNED index, keyed per
    (edge relation, landmark set, hop budget).

    Landmark distances exist to be precomputed once and served many
    times — that is the entire premise of distance-sketch estimators
    (Das Sarma et al.): the k-landmark traversal is the index build,
    and distance/closeness queries are lookups against it. Both
    registered landmark queries (the raw distance relation and the
    closeness aggregate) share this one pin, so the iterative BFS runs
    once per (graph, landmarks) per process instead of once per query
    call — the same serving model as the BM25 postings and the LSH
    signature table.

    Lifecycle note: the pinned relation is backed by the traversal's
    final tracked checkpoint. The registries enforce the coupling:
    ``pinned()`` records the backing checkpoint ids, releasing this pin
    frees them, and ``checkpoints.release_all`` evicts the pin first —
    a caller invoking either hook alone can no longer strand a poisoned
    pin (r6 ADVICE)."""
    from ..pinned import pinned

    key = (
        "landmark_dists",
        edges.semanticHash(),
        tuple(landmarks),
        int(max_hops),
    )
    (d,) = pinned(
        key, lambda: (multi_source_shortest_paths(edges, landmarks, max_hops),)
    )
    return d


def closeness_from_landmarks(
    edges: DataFrame, landmarks: list, max_hops: int = 4
) -> DataFrame:
    """Landmark-estimated closeness centrality: for each vertex v,
    ``n_reached`` landmarks within ``max_hops``, their distance sum, and
    the estimate ĉ(v) = n_reached / Σ d(l, v) — the standard sampled
    closeness (exact closeness needs all-pairs distances, O(V·E) at
    100 TB; k landmarks give an unbiased-ranking estimate from ONE
    multi-source traversal, Das Sarma et al.'s sketch primitive).

    Self rows (a landmark's dist-0 to itself) are excluded so a
    landmark's own score is over the OTHER landmarks and the ratio is
    never 0/0; a vertex reaching no landmark has no row (declared).
    The division of two small exact integers is one correctly-rounded
    IEEE op — deterministic across engines; rounded at 9dp anyway to
    follow the house float-edge rule. Serves from the pinned landmark
    sketch (``pinned_landmark_distances``) — the traversal is the index
    build, this aggregate is the query."""
    d = pinned_landmark_distances(edges, landmarks, max_hops)
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum("dist").alias("dist_sum"),
        )
        .select(
            "id",
            "n_reached",
            "dist_sum",
            F.round(
                F.col("n_reached").cast("double") / F.col("dist_sum"), 9
            ).alias("closeness"),
        )
    )


def harmonic_from_landmarks(
    edges: DataFrame, landmarks: list, max_hops: int = 4
) -> DataFrame:
    """Landmark-estimated HARMONIC centrality: ĥ(v) = Σ 1/d(l, v) over
    reached landmarks — closeness' robust sibling (Boldi & Vigna 2014):
    unreachable landmarks contribute 0 instead of poisoning a sum, so
    no reachability filter is needed to keep scores comparable.

    Float discipline: Σ 1/d is summation-order-sensitive in IEEE, so
    the sum is computed EXACTLY as integers — Σ (L/d) with
    L = lcm(1..max_hops) (every d divides L), divided by L once at the
    end. Deterministic across engines and partitionings by
    construction, 9dp display round per the house rule.

    Serves from the same pinned landmark sketch as closeness — one
    traversal, two centrality queries."""
    import math

    lcm = math.lcm(*range(1, max_hops + 1))
    d = pinned_landmark_distances(edges, landmarks, max_hops)
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            F.sum((F.lit(lcm) / F.col("dist")).cast("long"))
            .cast("long")
            .alias("hsum"),
        )
        .select(
            "id",
            "n_reached",
            F.round(F.col("hsum") / F.lit(float(lcm)), 9).alias("harmonic"),
        )
    )


def weighted_shortest_paths(
    edges: DataFrame,
    source_id,
    max_hops: int = 4,
    weight: F.Column | None = None,
) -> DataFrame:
    """Hop-bounded WEIGHTED shortest paths from ``source_id`` —
    distributed Bellman–Ford: ``max_hops`` min-plus relaxation rounds,
    each one join dist⋈edges + a per-vertex min (both key-partitioned,
    map-side combined). The weighted sibling of ``shortest_paths``'
    BFS; hop-bounding makes the round count a declared constant instead
    of a negative-cycle hazard, and integer weights keep every distance
    exact. Returns (id, dist) = min path weight over walks of ≤
    ``max_hops`` edges (source included at 0).

    ``weight`` is a Column over (src, dst); defaults to the declared
    deterministic demo weight (src+dst) % 5 + 1 — symmetric, so the
    symmetrized view keeps w(u,v) = w(v,u).

    Scale: state is one (id, dist) relation; each round shuffles
    candidate relaxations keyed on dst with map-side min — never a
    frontier broadcast assumption; tracked checkpoints keep lineage
    O(1) per round (the house iterative discipline)."""
    spark = edges.sparkSession
    w = (
        weight
        if weight is not None
        else ((F.col("src") + F.col("dst")) % 5 + 1).cast("long")
    )
    bi = symmetrize(edges).select("src", "dst", w.alias("w")).persist()

    schema = edges.schema["src"].dataType
    dist = spark.createDataFrame([(source_id, 0)], ["id", "dist"]).select(
        F.col("id").cast(schema).alias("id"),
        F.col("dist").cast("long").alias("dist"),
    )
    dist_ids = frozenset()
    for _ in range(max_hops):
        cand = (
            bi.join(dist, bi["src"] == dist["id"])
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        relaxed = (
            dist.unionByName(cand)
            .groupBy("id")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        dist, new_ids = checkpoint(relaxed)
        free(spark, dist_ids, blocking=False)
        dist_ids = new_ids
    bi.unpersist()
    return dist


def pinned_weighted_distances(
    edges: DataFrame, source_id, max_hops: int = 4
) -> DataFrame:
    """The weighted distance relation as a PINNED index, keyed per
    (edge relation, source, hop budget) — the same serving model as
    ``pinned_landmark_distances``: the Bellman–Ford rounds are the
    index build, repeated queries are lookups. The pin records its
    backing tracked checkpoints (see pinned.py), so either release
    hook frees both."""
    from ..pinned import pinned

    key = (
        "weighted_dists",
        edges.semanticHash(),
        source_id,
        int(max_hops),
    )
    (d,) = pinned(
        key, lambda: (weighted_shortest_paths(edges, source_id, max_hops),)
    )
    return d
