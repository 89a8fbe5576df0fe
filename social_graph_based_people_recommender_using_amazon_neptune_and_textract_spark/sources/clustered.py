"""Range-clustered table layout — the MIN/MAX FILE-SKIPPING device,
completing the physical-layout trio: bucketed.py (exchange elimination
on a join/agg key), partitioned.py (directory pruning on a low-
cardinality column), and this module (statistics skipping on a HIGH-
cardinality column that directory partitioning cannot hold — one
directory per user_id at 100 TB would be millions of directories).

``repartitionByRange(col)`` range-partitions rows (contiguous,
non-overlapping key ranges per output file) and ``sortWithinPartitions``
orders rows inside each file, so every parquet file/row-group carries
TIGHT, DISJOINT min/max statistics on the cluster column. A range
predicate then intersects ~(selectivity · #files) files; the parquet
reader drops the rest on footer stats without touching a data page —
the same contract Delta/Iceberg sell as Z-ORDER/liquid clustering in
the single-column case. (Multi-column interleaved clustering is a
space-filling-curve extension of exactly this write path.)

Contrast with partitioned.py: pruning there happens at PLAN time from
directory names and needs a low-cardinality column; here it happens at
SCAN time from footer stats and works for any orderable column, at the
cost of a one-time range shuffle per rewrite (a maintenance job, like
compaction — sources/compact.py).

The skipping evidence is structural and asserted in tests/test_sources:
per-file footer min/max ranges are pairwise non-overlapping (modulo a
shared boundary value, which the range partitioner may duplicate), so a
point/range predicate can intersect at most ceil(selectivity·N)+1 of N
files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Default output files per rewrite. At real scale this is
#: ceil(table_bytes / 128 MB) — mirrored from sources/compact.py; the
#: testdata default keeps enough files that skipping is observable.
DEFAULT_FILES = 8


def write_range_clustered(
    df: DataFrame, path: str, cluster_col: str, n_files: int = DEFAULT_FILES
) -> None:
    """Rewrite ``df`` range-clustered on ``cluster_col``: one range
    shuffle (sampled split points), an in-partition sort, one file per
    range. Overwrite-mode: clustering is a full-table maintenance
    rewrite, run on the compaction cadence, not per append."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def read_range_clustered(spark: SparkSession, path: str) -> DataFrame:
    """Plain path read — the layout needs no catalog support; skipping
    comes from parquet footer statistics the files already carry."""
    return spark.read.parquet(path)
