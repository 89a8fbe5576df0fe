"""Connected components over a pair graph — dedup cluster assignment.

The pair-emitting dedup operators (MinHash-LSH, SimHash, n-gram) answer
"which documents are near-duplicates of each other"; a curation pipeline
needs the transitive closure: ONE cluster id per document so exactly one
canonical representative survives (keep min doc_id). The reference has
no graph-clustering operator (its dedup is the exact content_id key,
upsert_bizcard_to_es.py:96-108); this belongs to the LLM-pipeline
extension family (SURVEY §4.3).

Algorithm: distributed min-label propagation to fixpoint.

- Labels start as each node's own id; each round joins the (persisted)
  symmetric edge list against current labels and takes the min of own
  and neighbor labels; ``localCheckpoint`` truncates the growing lineage
  (same device as k-hop BFS, graph/traverse.py) and the loop exits when
  a round changes nothing.
- Rounds needed = graph diameter. Near-dup components are dense and
  shallow (near-cliques of mutual high-Jaccard neighbors), so 2-3
  rounds in practice. For adversarial long-chain graphs the O(log n)
  alternative is star contraction (Kiveris et al., "Connected
  Components in MapReduce and Beyond"); min-propagation is chosen here
  because each round is ONE join + ONE aggregate on the same hash key —
  no re-keying shuffle between rounds, and the label relation never
  grows beyond one row per node.
- 100 TB: the edge list is a pair table orders of magnitude smaller
  than the corpus (only docs with a near-dup appear at all); both join
  sides hash-partition on node id; AQE splits buckets skewed by hub
  documents. The convergence probe is a limit(1) count — one cheap job
  per round, not a full comparison materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, label) — ``label`` is the minimum node id in the node's
    connected component. Only nodes appearing in ``pairs`` are returned
    (singletons are their own trivial cluster by definition)."""
    sym = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionAll(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    try:
        for _ in range(max_rounds):
            prop = sym.join(labels, sym["dst"] == labels["node"]).select(
                F.col("src").alias("node"), "label"
            )
            new = (
                prop.unionAll(labels)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint()
            )
            changed = (
                new.join(labels.withColumnRenamed("label", "old"), "node")
                .filter(F.col("label") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new
            if changed == 0:
                break
    finally:
        sym.unpersist()
    return labels
