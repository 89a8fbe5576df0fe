"""Connected-components clustering and token-budget shard packing."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    packing as PKG,
)
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.components import (
    connected_components,
)


def _labels(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    return {
        r.node: r.label for r in connected_components(df, **kw).collect()
    }


def test_components_merge_transitively(spark):
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_components_long_chain_converges(spark):
    """A path graph is the worst case for neighbor propagation; the
    fixpoint must be exact on BOTH physical paths (driver union-find and
    the distributed loop — collect_cap=0 forces the loop)."""
    chain = [(i, i + 1) for i in range(12)]
    want = {i: 0 for i in range(13)}
    assert _labels(spark, chain) == want
    assert _labels(spark, chain, collect_cap=0) == want


def test_components_deep_chain_beats_diameter(spark):
    """Pointer jumping: a 64-node path (diameter 63) must converge well
    inside 63 neighbor-propagation rounds — ~log2(diameter) with the
    shortcut. max_rounds=10 would fail plain min-propagation.
    collect_cap=0 forces the distributed loop."""
    chain = [(i, i + 1) for i in range(63)]
    got = _labels(spark, chain, max_rounds=10, collect_cap=0)
    assert got == {i: 0 for i in range(64)}


def test_components_nonconvergence_raises(spark):
    """Exhausting max_rounds with labels still changing must raise, never
    return silently wrong cluster labels (VERDICT r3 item 3)."""
    import pytest

    chain = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1, collect_cap=0)


def test_components_driver_and_loop_agree(spark):
    """The collect-cap gate is a physical choice only: identical labels
    from the union-find and the distributed loop on a mixed graph."""
    pairs = [(5, 1), (2, 5), (9, 7), (20, 21), (21, 22), (22, 20), (1, 30)]
    assert _labels(spark, pairs) == _labels(spark, pairs, collect_cap=0)


def test_components_orientation_invariant(spark):
    """Pair orientation (a<b vs b<a) must not change components."""
    got = _labels(spark, [(5, 1), (2, 5), (9, 7)])
    assert got == {1: 1, 2: 1, 5: 1, 7: 7, 9: 7}


def _python_components(pairs):
    """Reference: min node id per component via repeated relaxation."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {n: n for n in adj}
    changed = True
    while changed:
        changed = False
        for n in adj:
            m = min([label[n]] + [label[x] for x in adj[n]])
            if m < label[n]:
                label[n] = m
                changed = True
    return label


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=24,
    )
)
def test_components_match_reference_on_random_graphs(spark, pairs):
    """Property: on random pair graphs BOTH physical strategies (driver
    union-find and the distributed pointer-jumping loop) agree with a
    pure-Python reference evaluation."""
    want = _python_components(pairs)
    assert _labels(spark, pairs) == want
    assert _labels(spark, pairs, collect_cap=0) == want


def _shard_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_shards_matches_sequential_packing(spark):
    rows = [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(200)]
    got = {
        r.doc_id: (r.n_tokens, r.shard_id)
        for r in PKG.token_shards(_shard_df(spark, rows), budget=50).collect()
    }
    acc = 0
    for i in range(200):
        n = i % 7 + 1
        assert got[i] == (n, acc // 50), f"doc {i}"
        acc += n


def test_token_shards_single_shard_when_budget_large(spark):
    rows = [(i, "a b c") for i in range(20)]
    out = PKG.token_shards(_shard_df(spark, rows), budget=10**9)
    assert {r.shard_id for r in out.collect()} == {0}


def test_token_shards_partition_invariant(spark):
    """The shard assignment is a function of the id order alone — not of
    input partitioning or the sampled range boundaries."""
    rows = [(i, " ".join(["w"] * (i % 5 + 1))) for i in range(300)]
    a = {
        (r.doc_id, r.shard_id)
        for r in PKG.token_shards(_shard_df(spark, rows), budget=37).collect()
    }
    b = {
        (r.doc_id, r.shard_id)
        for r in PKG.token_shards(
            _shard_df(spark, rows).repartition(7), budget=37, n_partitions=5
        ).collect()
    }
    assert a == b
