"""Tracked-checkpoint hygiene: iterative operators (BFS, connected
components, shard packing) must free each round's scratch as they go and
leave only their FINAL result's checkpoint behind — releasable via
``checkpoints.release_all`` (the round-4 verdict's storage finding)."""

from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark import (
    checkpoints as CKPT,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.graph.traverse import (
    shortest_paths,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.components import (
    connected_components,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.packing import (
    token_shards,
)

from test_pinned import _n_persisted, _reset_storage


def test_bfs_frees_intermediate_rounds(spark):
    """A 6-hop chain BFS runs 6 supersteps; with per-round freeing the
    leftovers are the final ``dist`` checkpoint only — not one RDD per
    superstep — and release_all returns storage to zero."""
    base = _reset_storage(spark)
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["src", "dst"]
    )
    got = shortest_paths(chain, 0, max_hops=6)
    assert got.count() == 7
    leftovers = _n_persisted(spark) - base
    assert 1 <= leftovers <= 2  # final dist (+ nothing per-round)
    assert CKPT.release_all(spark) >= 1
    assert _n_persisted(spark) == base


def test_components_distributed_frees_rounds(spark):
    """Force the distributed pointer-jumping loop (collect_cap=0) on a
    chain — multiple rounds — and check only the final labels checkpoint
    survives the loop."""
    base = _reset_storage(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    labels = connected_components(pairs, collect_cap=0)
    got = labels.agg(F.count("*"), F.countDistinct("label")).collect()[0]
    assert (got[0], got[1]) == (13, 1)
    leftovers = _n_persisted(spark) - base
    assert 1 <= leftovers <= 2  # final labels only
    CKPT.release_all(spark)
    assert _n_persisted(spark) == base


def test_packing_checkpoint_released(spark):
    base = _reset_storage(spark)
    docs = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma") for i in range(20)],
        ["doc_id", "text"],
    )
    shards = token_shards(docs, budget=9)
    assert shards.count() == 20
    assert _n_persisted(spark) > base
    CKPT.release_all(spark)
    assert _n_persisted(spark) == base
