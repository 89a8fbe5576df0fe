"""Keyed last-write-wins upsert (O6 ES `_id` overwrite, O7 DynamoDB
update_item, O31 vertex property overwrite).

The reference gets idempotent upserts from its stores (same ES ``_id`` ⇒
overwrite, upsert_bizcard_to_es.py:77; DDB update_item keyed by image_id,
get_text_from_s3_image.py:111-137). In Spark the equivalent is
"keep the newest row per key":

    row_number() over (partition by key order by <version cols> desc) = 1

Scale: one shuffle on the key with map-side combine unavailable for
row_number — for heavy keys prefer ``max_by``-style aggregation when only
scalar columns are needed; both forms are exposed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """Keep the single newest row per key; ties broken by the full
    ``order_by`` column list (caller must make it a total order)."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
