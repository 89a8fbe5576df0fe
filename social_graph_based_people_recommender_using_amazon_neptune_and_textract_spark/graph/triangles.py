"""Triangle counting and global clustering coefficient.

A natural extension of the full-graph analytics family (graph/model.py
O34): the reference exposes whole-graph counts over the Neptune social
graph (vertex/edge totals, degrees); triangle count and the global
clustering coefficient are the next structural statistics an analyst
asks of a friendship graph, and PYMK's mutual-friend score is literally
a wedge count — triangles are the wedges that already closed.

Algorithm — degree-ordered edge orientation (the standard distributed
triangle-counting shape, per Suri & Vassilvitskii "Counting Triangles
and the Curse of the Last Reducer", WWW'11, and Cohen's MapReduce graph
patterns — both public):

1. Canonicalize to the undirected simple graph: ``a < b`` per edge,
   self-loops dropped, duplicates removed.
2. Orient every edge from its lower-degree endpoint to its
   higher-degree endpoint (ties by vertex id). Every vertex then has
   out-degree O(sqrt(m)) — a celebrity with a million followers emits
   its wedges from the *followers'* adjacency lists, never enumerating
   the 10^12 follower pairs. This is why the wedge join below survives
   power-law skew at 100 TB where naive id-ordering would not.
3. Wedge join: oriented edges self-joined on the tail vertex give each
   pair of out-neighbors once; a semi-join against the canonical edge
   set keeps the wedges whose far pair is itself an edge. Each triangle
   is produced exactly once (at its lowest-order vertex).

Shuffle budget: one distinct (canonical edges), one degree aggregation,
two degree-attach joins, one wedge self-join, one closing semi-join —
all equi-joins/aggs on bounded-fan-out keys; no broadcast assumptions,
no driver collect.

Wedge count (for the coefficient) is sum(d*(d-1)/2) over undirected
degrees — a second pass over the degree relation, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple edge set: columns (a, b) with a < b, deduped."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _undirected_degrees(e: DataFrame) -> DataFrame:
    """(v, d) over the canonical edge set."""
    return (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def oriented_edges(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient each canonical edge low-degree -> high-degree (ties: lower
    vertex id first). Columns (lo, hi)."""
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    et = e.join(da, "a").join(db, "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return et.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def pinned_tri_layout(
    edges: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(canonical e, undirected deg, degree-oriented o) pinned per edge
    relation — the wedge-analytics layout, a graph index in the same
    family as model.pinned_bi (bag view, PYMK/PageRank) and linkpred's
    set view: the canonicalize + degree + orient work happens once per
    process and every wedge-shaped consumer serves from it."""
    from ..pinned import pinned

    def _build():
        e = canonical_edges(edges)
        deg = _undirected_degrees(e)
        return e, deg, oriented_edges(e, deg)

    return pinned(("graph_tri_layout", edges.semanticHash()), _build)


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One-row relation: (triangle_count, wedge_count, clustering_coeff).

    ``clustering_coeff`` is the global (transitivity) coefficient
    3 * triangles / wedges, rounded to 6 decimals (0.0 on a wedge-free
    graph); the count columns are exact BIGINTs. Orientation is a
    *physical* choice — the counts are orientation-independent, which is
    what lets the DuckDB oracle use the simpler id-ordered join while
    this plan uses the skew-proof degree ordering. The layout triple is
    pinned (``pinned_tri_layout``); the wedge join + closing semi-join
    run per call.
    """
    e, deg, o = pinned_tri_layout(edges)

    # Wedges at each tail vertex: pairs of out-neighbors, each pair once.
    o1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("x"))
    o2 = o.select(F.col("lo").alias("u"), F.col("hi").alias("y"))
    # The canonical set has a < b; normalize each wedge pair to (min, max)
    # so the closing check is a plain two-column equi-join (hash-joinable
    # — a least/greatest join expression works too, but spelling it as
    # bare columns keeps the equi-key extraction obvious).
    wedge = (
        o1.join(o2, "u")
        .filter(F.col("x") < F.col("y"))
        .select(F.col("x").alias("wa"), F.col("y").alias("wb"))
    )
    closed = wedge.join(
        e,
        (F.col("wa") == F.col("a")) & (F.col("wb") == F.col("b")),
        "leftsemi",
    )
    tri = closed.agg(F.count(F.lit(1)).alias("triangle_count"))

    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - F.lit(1))) / F.lit(2))
        .cast("long")
        .alias("wedge_count")
    )
    out = tri.crossJoin(wedges)  # 1x1 — same device as graph_counts
    return out.select(
        "triangle_count",
        "wedge_count",
        F.when(F.col("wedge_count") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(3.0) * F.col("triangle_count") / F.col("wedge_count"), 6
            )
        )
        .alias("clustering_coeff"),
    )


def pinned_triangle_stats(edges: DataFrame) -> DataFrame:
    """``triangle_stats`` as a PINNED per-snapshot statistic: graph
    stores precompute transitivity alongside degrees/counts — the
    Σ over the wedge join runs once per corpus snapshot and serving
    reads the 1-row relation; release (the snapshot swap) re-pays it.
    The wedge layout underneath was already pinned; this pins the
    aggregate itself."""
    from ..pinned import pinned

    (stats,) = pinned(
        ("triangle_stats", edges.semanticHash()),
        lambda: (triangle_stats(edges),),
    )
    return stats
