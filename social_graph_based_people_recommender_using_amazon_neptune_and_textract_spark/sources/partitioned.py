"""Date-partitioned table layout — the partition-PRUNING device, the
sibling of the bucketed layout's exchange elimination (bucketed.py).

At 100 TB the events table is an append-only log; virtually every query
against it carries a time predicate. Hive-style directory partitioning
on the event date turns that predicate into partition pruning at PLAN
time: the file index keeps only matching ``event_date=.../`` directories,
so a one-day query over a 30-day, 100 TB log lists and scans ~1/30 of
the files — before any row is read. This is the lakehouse twin of the
reference's time-keyed access patterns (Firehose's ``YYYY/MM/DD/HH`` S3
prefix layout on the archive bucket is exactly this device — O4's reader
already prunes on it).

Layout rules that matter at scale (encoded here, asserted in
tests/test_plans.py):

- Partition column granularity: daily — hourly at 100 TB would create
  24× the directories with median files far below the 128 MB sweet spot;
  coarser than daily stops pruning the dominant predicate.
- Small-file control: repartition on the partition column before the
  write, so each partition directory gets files from one task wave
  instead of #tasks × #days tiny files.
- Dynamic partition overwrite (``partitionOverwriteMode=dynamic``) so a
  late-data backfill of one day rewrites ONLY that directory, not the
  whole table — an idempotent per-partition upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Persist ``df`` Hive-partitioned on ``partition_col``. The
    pre-write repartition on the partition column bounds the file count
    per directory (one task's output per partition value per wave)."""
    (
        df.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Path read — partition columns come back from directory names;
    filters on them prune at the file index, never touching data files."""
    return spark.read.parquet(path)
