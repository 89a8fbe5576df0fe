"""Label-propagation community detection (synchronous, deterministic).

Raghavan et al.'s near-linear-time community detection (public), the
semantic complement of connected components: components find structural
reachability, LPA finds densely-knit neighborhoods INSIDE a component —
the "friend circles" PYMK-style features feed on.

Determinism (the house rule — classic LPA breaks ties randomly, which
can never hash-match an oracle): synchronous rounds, every vertex
simultaneously adopts the most frequent label among its neighbors with
ties broken by SMALLEST label; a fixed round budget K unrolls into the
DuckDB oracle exactly like PageRank's supersteps. Sync LPA can oscillate
on bipartite-ish structures — fixed K is declared semantics, not a
convergence claim (the standard mitigation, since async update order is
inherently nondeterministic).

Plan per round:
1. neighbor labels: bs ⋈ labels on the tail vertex — bs is the PINNED
   set-symmetrized view hash-partitioned on src (shared with the
   link-prediction scores), so only the vertex-sized label relation
   shuffles per round;
2. (vertex, label) counts — one map-side-combined aggregate;
3. argmax by (count desc, label asc) as a STRUCT MAX aggregate —
   max(struct(c, -label)) picks highest count then smallest label with
   no per-vertex sort window (labels are non-negative vertex ids, so
   the negation is a faithful order reversal);
4. tracked checkpoint: O(1) lineage per round, eager scratch release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free
from .linkpred import _bs_deg

ROUNDS = 4  # registered-query default; callers tune freely


def label_propagation(edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """(id, community) after ``rounds`` synchronous propagation rounds
    over the set-symmetrized view; community labels are vertex ids."""
    spark = edges.sparkSession
    bs, _ = _bs_deg(edges)
    labels = (
        bs.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    label_ids: frozenset = frozenset()
    for _ in range(rounds):
        nbr = bs.join(labels, bs["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        counts = nbr.groupBy("id", "label").agg(F.count(F.lit(1)).alias("c"))
        picked = counts.groupBy("id").agg(
            F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias(
                "m"
            )
        )
        new = picked.select("id", (-F.col("m.nl")).alias("label"))
        labels, ids = checkpoint(new)
        free(spark, label_ids, blocking=False)
        label_ids = ids
    return labels.select("id", F.col("label").alias("community"))


def pinned_label_propagation(edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """``label_propagation`` as a PINNED index keyed per (edge set,
    rounds): community membership is a vertex-sized precomputed
    relation a graph store serves from, not a traversal per request —
    the K synchronous rounds run once per corpus snapshot, the bench's
    cold pass re-pays them after release."""
    from ..pinned import pinned

    (lp,) = pinned(
        ("lpa", edges.semanticHash(), int(rounds)),
        lambda: (label_propagation(edges, rounds),),
    )
    return lp


MOD_ROUNDS = 3  # registered-query default; callers tune freely


def modularity_communities(
    edges: DataFrame, rounds: int = MOD_ROUNDS
) -> DataFrame:
    """Deterministic synchronous modularity local-move (the Louvain
    phase-1 step, Blondel et al. 2008, made oracle-matchable) — the
    modularity-objective rung above LPA: LPA's frequency vote floods a
    single label across well-connected communities (the bridged-clique
    failure the tests pin), while the modularity gain penalizes a
    candidate community by its total degree mass, so dense blocks
    resist absorption.

    Per round every vertex i simultaneously evaluates the communities
    of its neighbors plus its own and moves to the argmax of the
    standard local-move gain. All comparisons are INTEGER — the gain is
    rational with denominator 2m, so both engines rank by the scaled
    form and no float tie can diverge:

        score(i→c) = 2m·k_in(i,c) − d_i·(Σtot(c) − d_i·[c = c_i])

    with k_in(i,c) = edges from i into c (current assignment),
    Σtot(c) = total degree of c's members, 2m = |directed symmetric
    edge set|; ties → smallest community label. Synchronous moves with
    pre-move Σtot are the declared semantics (async order is
    inherently nondeterministic — LPA's rule); a fixed round budget
    unrolls into the CTE twin exactly like LPA's. Output
    (id, community) with community = SMALLEST member id (canonical
    relabel, so labels are comparable across engines and rounds).

    Plan per round (mirrors LPA's): one vertex-sized label join per
    side — neighbor-community link counts are a map-side-combined
    aggregate over bs ⋈ labels; community totals are a
    community-count-sized aggregate of deg ⋈ labels; the 1-row 2m
    relation rides a broadcast crossJoin; argmax is the house
    max(struct) — no per-vertex sort window. Tracked checkpoints
    bound lineage."""
    spark = edges.sparkSession
    bs, deg = _bs_deg(edges)
    m2 = bs.groupBy().agg(F.count(F.lit(1)).alias("m2"))
    labels = (
        bs.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    label_ids: frozenset = frozenset()
    for _ in range(int(rounds)):
        stot = (
            labels.join(deg, "id")
            .groupBy("label")
            .agg(F.sum("d").alias("stot"))
        )
        nbr = bs.join(labels, bs["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        kin = nbr.groupBy("id", "label").agg(
            F.count(F.lit(1)).alias("kin")
        )
        cand = (
            kin.withColumn("cur", F.lit(0).cast("long"))
            .unionByName(
                labels.select(
                    "id",
                    "label",
                    F.lit(0).cast("long").alias("kin"),
                ).withColumn("cur", F.lit(1).cast("long"))
            )
            .groupBy("id", "label")
            .agg(F.max("kin").alias("kin"), F.max("cur").alias("cur"))
        )
        scored = (
            cand.join(deg, "id")
            .join(stot, "label")
            .crossJoin(F.broadcast(m2))
            .select(
                "id",
                "label",
                (
                    F.col("m2") * F.col("kin")
                    - F.col("d")
                    * (F.col("stot") - F.col("d") * F.col("cur"))
                ).alias("score"),
            )
        )
        picked = scored.groupBy("id").agg(
            F.max(
                F.struct(F.col("score"), (-F.col("label")).alias("nl"))
            ).alias("m")
        )
        new = picked.select("id", (-F.col("m.nl")).alias("label"))
        labels, ids = checkpoint(new)
        free(spark, label_ids, blocking=False)
        label_ids = ids
    canon = labels.groupBy("label").agg(F.min("id").alias("community"))
    return labels.join(canon, "label").select("id", "community")


def pinned_modularity_communities(
    edges: DataFrame, rounds: int = MOD_ROUNDS
) -> DataFrame:
    """``modularity_communities`` as a PINNED index keyed per (edge
    set, rounds) — the same serve-from-relation contract as LPA's."""
    from ..pinned import pinned

    (mc,) = pinned(
        ("modcom", edges.semanticHash(), int(rounds)),
        lambda: (modularity_communities(edges, rounds),),
    )
    return mc
