"""Non-PYMK graph query surface (SURVEY §2.4: O30, O32, O34, O36, O37).

All are key-equality joins/filters over the vertices/edges DataFrames —
point lookups prune to a partition-local filter; hydration joins broadcast
whichever side is small (candidate lists) against the big vertex table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertex_lookup(vertices: DataFrame, vertex_id) -> DataFrame:
    """O30: g.V(id).limit(1) — point lookup on the vertex key."""
    return vertices.filter(F.col("id") == F.lit(vertex_id)).limit(1)


def edge_exists(edges: DataFrame, src, dst) -> DataFrame:
    """O32: does a directed knows-edge src→dst exist? (semi-join/point
    filter, upsert_bizcard_to_graph_db.py:104). Single boolean row."""
    return (
        edges.filter((F.col("src") == F.lit(src)) & (F.col("dst") == F.lit(dst)))
        .agg((F.count(F.lit(1)) > 0).alias("exists"))
    )


def one_hop_paths(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """O37: g.V().out().path().by('name') — all (src_name, dst_name) pairs
    (octember-bizcard-neptune.ipynb cell 17), via a double vertex join.

    Scale: both joins shuffle on vertex id; with vertices bucketed by id
    the joins are co-located. For small vertex dims Catalyst broadcasts.
    """
    vs = vertices.select(F.col("id").alias("_sid"), F.col("name").alias("src_name"))
    vd = vertices.select(F.col("id").alias("_did"), F.col("name").alias("dst_name"))
    return (
        edges.join(vs, edges["src"] == vs["_sid"])
        .join(vd, edges["dst"] == vd["_did"])
        .select("src_name", "dst_name")
    )


def hydrate(candidates: DataFrame, vertices: DataFrame, id_col: str = "id") -> DataFrame:
    """O36: valueMap hydration — join candidate ids back to vertex props,
    dropping internal (underscore-prefixed) columns per
    neptune_recommend_bizcard.py:70."""
    props = [c for c in vertices.columns if not c.startswith("_")]
    return candidates.join(
        vertices.select(*props), candidates[id_col] == vertices["id"]
    ).drop(vertices["id"])


def hydrate_valuemap(
    candidates: DataFrame, vertices: DataFrame, id_col: str = "id"
) -> DataFrame:
    """O36 as the reference serves it (neptune_recommend_bizcard.py:69-72):
    every vertex prop minus ``id``/underscore-prefixed, each LIST-WRAPPED —
    TinkerPop ``valueMap()`` returns every property as a list
    (``"name": ["Bar Lee"]``, README.md:184-199). The candidate's join key
    column is replaced by ``id``; all other candidate columns (``score``)
    pass through unwrapped, matching the reference's ``value['score'] =
    float(score)``.

    Scale: candidate lists are top-k rows — Catalyst broadcasts them
    against the big vertex table, so hydration is a map-side join."""
    props = [c for c in vertices.columns if c != "id" and not c.startswith("_")]
    wrapped = vertices.select(
        F.col("id").alias("_v_id"),
        *[F.array(F.col(c)).alias(c) for c in props],
    )
    return (
        candidates.join(wrapped, candidates[id_col] == F.col("_v_id"))
        .withColumn("id", F.col("_v_id"))
        .drop("_v_id", id_col)
    )
