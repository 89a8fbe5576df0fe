"""k-core decomposition by iterative peeling.

The k-core is the maximal subgraph in which every vertex keeps at least
k neighbors — the standard "dense part of the social graph" extraction
(Seidman 1983, public; the peeling algorithm is the textbook one):
repeatedly delete vertices whose CURRENT degree is below k until none
remain. PYMK-adjacent: recommendations inside a user's k-core are
between structurally-engaged users, not drive-by vertices.

Iterative discipline (same as components/BFS/PageRank):
- per round: degree aggregate over the surviving edge set, a weak-vertex
  filter, and two anti-joins that drop edges touching weak vertices —
  all key-partitioned shuffles, no broadcast assumptions (the weak set
  can be huge in early rounds);
- the surviving edge relation is routed through the tracked-checkpoint
  registry per round, so lineage stays O(1) and round N-1's scratch is
  freed as soon as round N materializes;
- **one Spark job per peeling round**: the fixpoint probe is an
  ``Observation`` edge count riding the eager-checkpoint materialization
  (weak vertices are exactly the vertices with ≥1 incident surviving
  edge and degree < k, so "no weak vertices" ⇔ "edge count unchanged").
  No separate ``weak.limit(1).count()`` job — at 100 TB that probe was
  a second full degree scan per round;
- the loop is a strict fixpoint: each round removes ≥1 vertex or stops,
  so rounds ≤ |V|; ``max_rounds`` is a misuse guard that RAISES rather
  than returning a silently-unconverged answer (the components.py
  convergence contract).

Peeling round count is the graph's degeneracy ordering depth — small in
practice (social graphs: tens). The DuckDB oracle unrolls a fixed round
budget; extra rounds past the fixpoint are no-ops (peeling is
idempotent once converged), so any budget ≥ the true depth matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free
from .triangles import canonical_edges


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _checkpoint_counted(df: DataFrame) -> tuple[DataFrame, frozenset, int]:
    """Eager tracked checkpoint that also returns the row count, measured
    by an ``Observation`` populated by the materialization job itself —
    the count costs zero extra Spark jobs."""
    obs = Observation()
    out, ids = checkpoint(df.observe(obs, F.count(F.lit(1)).alias("m")))
    return out, ids, int(obs.get["m"])


def kcore(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Vertices of the k-core with their within-core degree:
    (id, degree), degree ≥ k. Empty relation when no core exists.

    Every vertex in the degree relation has ≥1 incident surviving edge,
    so a weak vertex (degree < k) always removes ≥1 edge when peeled —
    the fixpoint test "no weak vertices remain" is EXACTLY "the edge
    count did not change this round", which the per-round checkpoint
    measures for free via :func:`_checkpoint_counted`."""
    spark = edges.sparkSession
    # Deliberately NOT the pinned tri layout: a persisted entry carries
    # its size statistics through every round's checkpoint, flipping the
    # weak-vertex anti-joins to broadcast plans (2 extra broadcast-build
    # jobs per round) — and this loop makes no broadcast assumptions
    # because the weak set can be huge in early rounds.
    e, e_ids, m_prev = _checkpoint_counted(canonical_edges(edges))
    for _ in range(max_rounds):
        deg = _degrees(e)
        weak = deg.filter(F.col("d") < k).select("v")
        wa = weak.select(F.col("v").alias("a"))
        wb = weak.select(F.col("v").alias("b"))
        nxt = e.join(wa, "a", "left_anti").join(wb, "b", "left_anti")
        e2, ids, m = _checkpoint_counted(nxt)
        if m == m_prev:
            # Fixpoint: nxt ≡ e, the fresh checkpoint is redundant scratch.
            # The returned plan reads the STILL-PERSISTED e (e_ids stay
            # live until the caller's release_all).
            free(spark, ids, blocking=False)
            return _degrees(e).select(
                F.col("v").alias("id"), F.col("d").alias("degree")
            )
        free(spark, e_ids, blocking=False)
        e, e_ids, m_prev = e2, ids, m
    raise RuntimeError(
        f"kcore(k={k}) did not converge within {max_rounds} peeling rounds"
    )
