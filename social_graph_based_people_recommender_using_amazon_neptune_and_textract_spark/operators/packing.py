"""Token-budget shard packing — the training-data "sequence packing"
step: assign documents (contiguous by id) to output shards of roughly
``budget`` tokens each, so a training job reads balanced files.

shard_id(doc) = floor(exclusive_prefix_sum(n_tokens) / budget)
over the doc_id total order.

The naive Spark expression — ``sum(n) over (order by doc_id)`` with no
partition key — collapses every row into ONE task (Window with a global
order is single-partition): the classic 100 TB trap. The scale-correct
form is the textbook two-phase distributed prefix sum:

1. ``repartitionByRange`` on doc_id — range partition r holds a
   contiguous id span, and ranges ascend with partition id;
2. one small job collects per-partition token totals (≤ #partitions
   rows) and the driver prefix-sums them into per-partition offsets;
3. the per-row exclusive cumsum = the partition's offset (a literal
   CASE over ``spark_partition_id()``) + a window sum partitioned BY
   PARTITION ID — every task windows only its own range.

The assignment is independent of where the (sampled) range boundaries
fall — a prefix sum along a total order does not depend on how the
order is cut — but the partition ids CONSULTED in phase 2 must be the
ids SEEN in phase 3, so the ranged relation is localCheckpoint-ed
(materialized once, lineage severed) before both consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..checkpoints import checkpoint
from ..search.index import tokenize

#: Range partitions for the prefix sum. At cluster scale this tracks the
#: input partition count; locally 32 matches the task-thread count.
N_RANGE_PARTITIONS = 32


def token_shards(
    documents: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int = N_RANGE_PARTITIONS,
) -> DataFrame:
    """(doc_id, n_tokens, shard_id) — analyzer-token counts and the
    token-budget shard assignment. Deterministic: depends only on the
    (id → token count) mapping and ``budget``."""
    counted = documents.select(
        F.col(id_col), F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return weighted_shards(
        counted, budget, id_col=id_col, weight_col="n_tokens",
        n_partitions=n_partitions,
    )


def weighted_shards(
    weighted: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_partitions: int = N_RANGE_PARTITIONS,
) -> DataFrame:
    """The generic two-phase prefix-sum packer: ``weighted`` is
    (id, weight); returns (id, weight, shard_id) with
    shard_id = floor(exclusive_prefix_sum(weight)/budget) over the id
    total order. ``token_shards`` (tokens) and the media manifest
    (payload bytes) are thin front-ends — the unit differs, the
    distributed prefix sum does not."""
    # Tracked checkpoint: the returned DataFrame reads ``ranged``, so its
    # storage is released by checkpoints.release_all once consumed.
    ranged, _ = checkpoint(
        weighted.repartitionByRange(n_partitions, F.col(id_col))
        .withColumn("pid", F.spark_partition_id())
    )

    totals = ranged.groupBy("pid").agg(F.sum(weight_col).alias("t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += int(row["t"])

    off_col = None
    for pid, off in sorted(offsets.items()):
        cond = F.col("pid") == pid
        off_col = (
            F.when(cond, F.lit(off)) if off_col is None else off_col.when(cond, F.lit(off))
        )
    off_col = F.lit(0) if off_col is None else off_col.otherwise(F.lit(0))

    w = (
        Window.partitionBy("pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = off_col + F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return ranged.select(
        id_col,
        weight_col,
        F.floor(cum_excl / F.lit(float(budget))).cast("long").alias("shard_id"),
    )
