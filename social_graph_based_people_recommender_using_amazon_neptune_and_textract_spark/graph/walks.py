"""Random-walk corpus generation — the training-sequence step of
DeepWalk/node2vec-style graph embeddings (Perozzi et al. 2014, public):
start one walker per vertex, take T neighbor steps, emit the visit
sequences a skip-gram trainer consumes.

Determinism: the "random" neighbor choice is the argmin of
``md5(step:walker:candidate)`` over the current vertex's neighbor SET —
a fixed pseudo-random draw both engines compute identically (the house
device: the md5 preference order of quota.py/sampling, applied per
step). Real deployments swap in a seeded RNG; the OPERATOR SHAPE — the
part that matters at 100 TB — is identical.

Scale shape per step: one walker⋈edges equi-join on the current vertex
plus ONE map-side-combinable ``min(struct(hash, candidate))`` aggregate
per walker — never a per-walker window sort over the neighbor fan-out
(a whale vertex's million neighbors partial-combine inside each task).
State is one (walker, position) row per walker; T steps = T such
rounds. Walk storage is the long-format (walk_id, step, vertex)
relation — directly the skip-gram pair generator's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import symmetrize


def deterministic_walks(edges: DataFrame, steps: int = 3) -> DataFrame:
    """One T-step walk per vertex. Returns (walk_id, step, vertex) with
    step 0 = the start vertex. Neighbor choice = min md5(step:walker:
    candidate) over the DISTINCT neighbor set (set semantics declared —
    bag multiplicity must not bias a deterministic draw)."""
    nbr = symmetrize(edges).select("src", "dst").distinct()
    starts = nbr.select(F.col("src").alias("walk_id")).distinct()
    out = starts.select(
        "walk_id",
        F.lit(0).alias("step"),
        F.col("walk_id").alias("vertex"),
    )
    cur = starts.select("walk_id", F.col("walk_id").alias("cur"))
    for t in range(1, steps + 1):
        h = F.md5(
            F.concat_ws(
                ":", F.lit(t), F.col("walk_id"), F.col("dst")
            ).cast("binary")
        )
        nxt = (
            cur.join(nbr, cur["cur"] == nbr["src"])
            .groupBy("walk_id")
            .agg(F.min(F.struct(h.alias("h"), F.col("dst").alias("v"))).alias("m"))
            .select("walk_id", F.col("m.v").alias("cur"))
        )
        out = out.unionByName(
            nxt.select(
                "walk_id", F.lit(t).alias("step"), F.col("cur").alias("vertex")
            )
        )
        cur = nxt
    return out


def skipgram_pairs(
    edges: DataFrame, steps: int = 3, window: int = 2
) -> DataFrame:
    """(center, context) co-occurrence counts over the walk corpus —
    the skip-gram training pairs a word2vec-style embedding trainer
    consumes (walks are sentences, vertices are words). Directed: every
    ordered pair within ``window`` positions, counted corpus-wide.
    Returns (u, v, cnt).

    Scale: the self-join is keyed on walk_id and its fan-out is a
    CONSTANT (≤ (T+1)·2·window pairs per walk — walk length is a design
    parameter, not data-sized), then one (u, v) map-side-combined
    count."""
    w = deterministic_walks(edges, steps)
    a = w.select("walk_id", F.col("step").alias("sa"), F.col("vertex").alias("u"))
    b = w.select("walk_id", F.col("step").alias("sb"), F.col("vertex").alias("v"))
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("sa") != F.col("sb"))
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
