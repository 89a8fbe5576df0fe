"""Bucketed-table layout — the persistent co-location device the join
docstrings elsewhere appeal to ("with vertices bucketed by id the joins
are co-located", graph/queries.py).

At 100 TB the dominant recurring cost of the graph/search workloads is
re-shuffling the big fact relations (edges, postings) on their join keys
for every query. Spark's answer is bucketing: write the table hash-
partitioned into a fixed number of buckets on the join key
(``bucketBy``), record the layout in the catalog, and every subsequent
equi-join or aggregation on that key reads the buckets co-located —
Catalyst drops the Exchange entirely (asserted in tests/test_plans.py).
This is the engine's equivalent of the reference's pre-sharded managed
stores: Kinesis shards (O2), ES index shards, Neptune's partitioned
storage are all fixed hash layouts maintained at WRITE time so reads
never reshuffle.

Bucket metadata lives in the session catalog, so reads must go through
``spark.table(name)`` — a bare ``spark.read.parquet(path)`` sees plain
files and re-shuffles. Bucket count is a layout constant chosen per
table (rule of thumb: total size / target partition size, rounded to a
power of two); both sides of a co-located join must agree on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table: hash-partitioned into
    ``n_buckets`` on ``bucket_col`` and sorted within buckets, so
    downstream equi-joins/aggs on that key need no Exchange (and the
    within-bucket sort feeds SortMergeJoin without a Sort)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — REQUIRED for the bucket layout to reach the
    planner (a raw path read sees unbucketed files)."""
    return spark.table(name)
