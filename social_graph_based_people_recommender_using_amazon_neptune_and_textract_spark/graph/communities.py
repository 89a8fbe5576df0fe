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
