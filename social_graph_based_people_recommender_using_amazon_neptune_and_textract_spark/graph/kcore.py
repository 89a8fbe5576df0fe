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

from pyspark.sql import DataFrame
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


def kcore(edges: DataFrame, k: int, max_rounds: int = 200) -> DataFrame:
    """Vertices of the k-core with their within-core degree:
    (id, degree), degree ≥ k. Empty relation when no core exists."""
    spark = edges.sparkSession
    e = canonical_edges(edges)
    e_ids: frozenset = frozenset()
    for _ in range(max_rounds):
        deg = _degrees(e)
        weak = deg.filter(F.col("d") < k).select("v")
        if weak.limit(1).count() == 0:
            out = deg.select(F.col("v").alias("id"), F.col("d").alias("degree"))
            return out
        wa = weak.select(F.col("v").alias("a"))
        wb = weak.select(F.col("v").alias("b"))
        nxt = e.join(wa, "a", "left_anti").join(wb, "b", "left_anti")
        e, ids = checkpoint(nxt)
        free(spark, e_ids, blocking=False)
        e_ids = ids
    raise RuntimeError(
        f"kcore(k={k}) did not converge within {max_rounds} peeling rounds"
    )
