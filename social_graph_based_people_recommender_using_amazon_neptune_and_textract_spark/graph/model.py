"""Property-graph model as vertex/edge DataFrames (GraphFrames convention).

The reference stores a directed graph in Neptune (single ``person`` vertex
label, single ``knows`` edge label) but traverses it *undirected* via
Gremlin ``both()`` (neptune_recommend_bizcard.py:60-61). We therefore store
edges ONCE (directed, deduped, no self-loops — the invariants enforced by
upsert_bizcard_to_graph_db.py:98,104-109) and symmetrize lazily at read:
at 100 TB this halves edge storage and the reverse projection is a
narrow map-side transform, not a shuffle.

Bag semantics matter (SURVEY R1): if both u→v and v→u are stored,
``both()`` yields the neighbor twice (two paths) — ``symmetrize`` uses
``unionAll`` (no dedup) to preserve exactly that multiplicity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view of a directed edge list, bag semantics (O38c)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionAll(rev)


def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree per vertex (one row per vertex id).

    Scale: single shuffle on vertex id with map-side partial aggregation;
    celebrity-vertex skew is handled by AQE skew-join settings downstream.
    """
    return (
        symmetrize(edges)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def truncate(df: DataFrame) -> DataFrame:
    """O35: the reference's batched drop-until-empty loop
    (upsert_bizcard_to_graph_db.py:52-81) exists only to bound Neptune
    transaction sizes; the Spark semantic is an overwrite with an empty
    relation of the same schema."""
    return df.sparkSession.createDataFrame([], df.schema)


def graph_counts(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """O34: g.V().count() / g.E().count() as a single-row DataFrame."""
    v = vertices.agg(F.count(F.lit(1)).alias("vertex_count"))
    e = edges.agg(F.count(F.lit(1)).alias("edge_count"))
    return v.crossJoin(e)


def pinned_bi(edges: DataFrame) -> DataFrame:
    """The symmetrized edge view, pinned HASH-PARTITIONED on ``src`` once
    per edge relation — the clustered adjacency layout a graph store
    keeps. Every consumer that joins or aggregates on the tail vertex
    (PYMK's 2-hop self-join, PageRank/PPR supersteps, degree probes)
    reuses this one layout and shuffles only its small side; the single
    exchange is paid at pin materialization. The in-memory twin of the
    on-disk bucketed layout (sources/bucketed.py)."""
    from ..pinned import pinned  # local import: pinned has no deps on model

    (bi,) = pinned(
        ("graph_bi", edges.semanticHash()),
        lambda: (symmetrize(edges).repartition(F.col("src")),),
    )
    return bi


def pinned_bi_deg(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(bi, deg): the pinned symmetrized view plus the bag-degree table
    (id, d) derived from it — deg inherits hash(id) partitioning from the
    groupBy, so id-keyed joins against it skip their exchange too."""
    from ..pinned import pinned

    bi = pinned_bi(edges)
    (deg,) = pinned(
        ("graph_bi_deg", edges.semanticHash()),
        lambda: (
            bi.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            ),
        ),
    )
    return bi, deg
