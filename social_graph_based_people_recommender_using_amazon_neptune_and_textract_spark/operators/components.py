"""Connected components over a pair graph — dedup cluster assignment.

The pair-emitting dedup operators (MinHash-LSH, SimHash, n-gram) answer
"which documents are near-duplicates of each other"; a curation pipeline
needs the transitive closure: ONE cluster id per document so exactly one
canonical representative survives (keep min doc_id). The reference has
no graph-clustering operator (its dedup is the exact content_id key,
upsert_bizcard_to_es.py:96-108); this belongs to the LLM-pipeline
extension family (SURVEY §4.3).

Algorithm: runtime-adaptive — driver-side union-find for small pair
graphs (≤ PAIR_COLLECT_CAP rows, one bounded collect, the PYMK
literal-inline device), distributed min-label propagation with pointer
jumping above it. The distributed form:

- Labels start as each node's own id; each round (1) joins the
  (persisted) symmetric edge list against current labels and takes the
  min of own and neighbor labels, then (2) SHORTCUTS: re-joins the label
  relation to itself so every node adopts its label's label (pointer
  jumping / path halving — the device behind the O(log n) round bounds
  of Kiveris et al., "Connected Components in MapReduce and Beyond").
  Neighbor-min alone needs diameter rounds (a 100 TB chain-shaped
  component would exceed any fixed cap); with the shortcut the label
  graph's depth roughly halves per round, so rounds ≈ log2(diameter) —
  a depth-2^25 component converges inside the default cap of 25.
- Tracked ``localCheckpoint`` (checkpoints.py) truncates the growing
  lineage (same device as k-hop BFS, graph/traverse.py); each round frees
  the previous round's scratch so in-flight storage is O(1), and the
  final labels checkpoint is released by ``checkpoints.release_all``
  when the caller is done. The loop exits when a round changes nothing. If the cap is ever exhausted with changes still occurring,
  the loop RAISES rather than returning silently wrong labels —
  non-convergence is a correctness failure, not a best-effort answer.
- 100 TB: the edge list is a pair table orders of magnitude smaller
  than the corpus (only docs with a near-dup appear at all); both join
  sides hash-partition on node id; AQE splits buckets skewed by hub
  documents. The convergence probe is a limit(1) count — one cheap job
  per round, not a full comparison materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free

#: Pair graphs at or below this row count are collected driver-side and
#: solved with union-find in one pass — the same runtime-adaptive device
#: as PYMK's FRIEND_SIDE_COLLECT_CAP: the iterative distributed loop pays
#: several scheduler round-trips per round, which dwarfs the work when the
#: near-dup pair graph is thousands of rows (the common case — only docs
#: with a near-dup appear at all). 100k pairs ≈ a few MB on the driver.
#: Larger graphs take the distributed pointer-jumping loop unchanged.
PAIR_COLLECT_CAP = 100_000


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 25,
    collect_cap: int = PAIR_COLLECT_CAP,
) -> DataFrame:
    """(node, label) — ``label`` is the minimum node id in the node's
    connected component. Only nodes appearing in ``pairs`` are returned
    (singletons are their own trivial cluster by definition).

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted while labels
    are still changing (cannot happen for components of diameter
    ≤ ~2^max_rounds thanks to the pointer-jumping shortcut, but a silent
    wrong answer is never acceptable).

    Physical strategy is runtime-adaptive: one ``limit(cap+1).collect()``
    probe; at or under ``collect_cap`` pairs the closure is solved
    driver-side (union-find, exact, no iteration); above it the
    distributed loop runs. Both produce identical labels (min node id
    per component) — pass ``collect_cap=0`` to force the loop."""
    head = pairs.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).limit(collect_cap + 1).collect() if collect_cap > 0 else None
    if head is not None and len(head) <= collect_cap:
        return _components_driver(
            pairs.sparkSession, head, pairs.schema[a_col].dataType
        )
    sym = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionAll(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .persist()
    )
    spark = pairs.sparkSession
    labels, labels_ids = checkpoint(
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    try:
        for _ in range(max_rounds):
            prop = sym.join(labels, sym["dst"] == labels["node"]).select(
                F.col("src").alias("node"), "label"
            )
            mins = (
                prop.unionAll(labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
            )
            # Pointer jumping: adopt the label's own label. Every label IS
            # a node in ``labels`` (it is some node's min so far), so the
            # inner join is total; one extra same-key join halves the
            # label-forest depth each round → O(log diameter) rounds.
            lut = labels.select(
                F.col("node").alias("_ln"), F.col("label").alias("_ll")
            )
            new, new_ids = checkpoint(
                mins.join(lut, mins["label"] == lut["_ln"])
                .select("node", F.least("label", "_ll").alias("label"))
            )
            changed = (
                new.join(labels.withColumnRenamed("label", "old"), "node")
                .filter(F.col("label") != F.col("old"))
                .limit(1)
                .count()
            )
            # Round N is materialized and the convergence probe has run:
            # round N-1's checkpoint is dead scratch — free it now so
            # in-flight storage stays O(1) rounds, not O(rounds).
            free(spark, labels_ids, blocking=False)
            labels, labels_ids = new, new_ids
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} "
                "rounds — labels were still changing in the final round; "
                "raise max_rounds (rounds needed ≈ log2(component diameter))"
            )
    finally:
        sym.unpersist()
    return labels


def _components_driver(spark, rows, dtype) -> DataFrame:
    """Exact driver-side closure for small pair graphs: union-find with
    union-by-min-root, so each root ends as the minimum node id of its
    component — identical labels to the distributed fixpoint."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row["a"], row["b"]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    schema = StructType(
        [StructField("node", dtype, False), StructField("label", dtype, False)]
    )
    return spark.createDataFrame(
        [(n, find(n)) for n in parent], schema
    )


def pinned_connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """``connected_components`` as a PINNED index keyed per pair graph —
    the serving model for full-graph membership: the iterative closure
    (the expensive part) runs once per corpus snapshot; every serve
    reads the vertex-sized (node, label) relation, exactly how a graph
    store serves a precomputed clustering next to degrees/counts.
    Either release hook drops it and the bench's cold pass re-pays the
    propagation. The backing tracked checkpoint rides the pin's
    lifecycle (pinned._CKPT_BACKED — the _bpe_fit_pinned precedent)."""
    from ..pinned import pinned

    (cc,) = pinned(
        ("components", pairs.semanticHash(), a_col, b_col),
        lambda: (connected_components(pairs, a_col=a_col, b_col=b_col),),
    )
    return cc
