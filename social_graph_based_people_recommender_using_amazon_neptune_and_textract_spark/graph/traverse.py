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

Scale: each superstep is one shuffle join frontier⋈edges (broadcast when
the frontier is small, which BFS frontiers on social graphs usually are
after hop 1 — AQE decides); the settled set is only touched by an
anti-join on its key. Equivalent converged result is expressible as a
recursive SQL CTE (the oracle) — the *incremental* loop is what Spark
adds: early exit on empty frontier, bounded lineage, per-level stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import symmetrize


def shortest_paths(
    edges: DataFrame, source_id, max_hops: int = 4
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

    for hop in range(1, max_hops + 1):
        nxt = (
            bi.join(F.broadcast(frontier), bi["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
            .localCheckpoint(eager=True)  # truncate lineage per superstep
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")

    bi.unpersist()
    return dist
