"""Incremental inverted-index maintenance — the reference's actual
serving architecture re-expressed.

The reference never re-indexes its corpus per query: upsert_bizcard_to_es
(:50-86) pushes each arriving batch of parsed bizcards INTO the live ES
index (create-or-replace by ``_id``), and es_search_bizcard (:59-84)
serves from whatever the index currently holds. The engine's pinned
``bizcard_index`` covers the per-snapshot rebuild shape; this module is
the per-batch maintenance shape for a long-lived ingest + serve loop.

Index state is three snapshot tables (streaming/table.py pointer
protocol, Hadoop-FS metadata — works on file:/, hdfs:/, s3a:/):

- ``alive``     (doc_id, owner, name, …, is_alive) — current live doc
                 set, LWW by doc_id; feeds hydration and the filter-only
                 query path.
- ``postings``  (id, owner, field, dl, tok, tf) — per-field postings.
- ``doclen``    (id, field, dl) — length norms for corpus statistics.

``upsert(batch)`` applies ES create-or-replace semantics: every doc_id
in the batch has its OLD index rows deleted (GroupedParquetTable group
replace — a row-level upsert would leak tokens the new text no longer
contains), and only ALIVE batch docs insert new rows; a batch row with
``is_alive = 0`` is therefore a document delete. Per batch the work is
O(batch postings) + one anti-join against the current segment — the
snapshot rewrite itself is the declared local simplification (at
warehouse scale the same merge is a Delta/Iceberg MERGE, and ES performs
the identical delete+insert inside its segment merge machinery).

``index()`` adapts the current snapshots to ``search_bizcards(index=…)``:
the term dictionary is derived from the postings snapshot at read time
(one vocabulary-sized aggregation — df counts are global, so maintaining
them incrementally would re-aggregate the same rows anyway).
Invariant (pinned by tests): after any sequence of upserts, serving
equals a from-scratch ``search_bizcards`` over the LWW-merged corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoints import checkpoint, free
from ..streaming.table import GroupedParquetTable, KeyedParquetTable
from .api import build_bizcard_postings, search_bizcards


class IncrementalIndexer:
    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.alive = KeyedParquetTable(
            spark, f"{out_dir}/alive", keys=["doc_id"], order_by=["_seq"]
        )
        self.postings = GroupedParquetTable(
            spark, f"{out_dir}/postings", group_keys=["id"]
        )
        self.doclen = GroupedParquetTable(
            spark, f"{out_dir}/doclen", group_keys=["id"]
        )

    def _next_seq(self) -> int:
        """Monotone batch sequence derived from the alive table's current
        snapshot id — survives process restarts, so LWW order holds
        across a maintainer that is stopped and resumed."""
        snap = self.alive.current_snapshot()
        return (int(snap.split("-")[1]) + 1) if snap else 1

    def upsert(self, batch: DataFrame) -> None:
        """Create-or-replace every document in ``batch`` (full bizcard
        rows: doc_id, owner, name, company, job_title, addr, is_alive).
        ``is_alive = 0`` rows delete the document from the index."""
        batch, ids = checkpoint(batch)  # read once, feed three sinks
        try:
            batch_ids = batch.select(F.col("doc_id").alias("id")).distinct()
            alive_rows = batch.filter(F.col("is_alive") == 1)
            new_postings, new_doclen, _ = build_bizcard_postings(alive_rows)
            self.postings.merge(new_postings, batch_ids)
            self.doclen.merge(new_doclen, batch_ids)
            # the alive table keys by doc_id; dead rows overwrite their
            # doc and are filtered out at read (LWW tombstone).
            self.alive.merge(batch.withColumn("_seq", F.lit(self._next_seq())))
        finally:
            free(self.spark, ids)

    def index(self) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
        """(alive, postings, doclen, vocab) over the CURRENT snapshots —
        the ``search_bizcards(index=…)`` contract. Raises if no batch was
        ever upserted (an index that does not exist is a caller error,
        matching ES's index_not_found)."""
        alive = self.alive.read()
        postings = self.postings.read()
        doclen = self.doclen.read()
        if alive is None or postings is None or doclen is None:
            raise ValueError(f"no index under {self.out_dir}: upsert first")
        alive = alive.filter(F.col("is_alive") == 1).drop("_seq")
        vocab = postings.groupBy("field", "tok").agg(
            F.count(F.lit(1)).alias("df")
        )
        return alive, postings, doclen, vocab

    def search(
        self, query: str | None, user: str | None = None, limit: int = 10
    ) -> DataFrame:
        """Serve from the current index state (es_search_bizcard over the
        live index)."""
        idx = self.index()
        return search_bizcards(idx[0], query, user=user, limit=limit, index=idx)
