"""Streaming MinHash-LSH near-duplicate detection — the incremental form
of operators/dedup.dedup_minhash_lsh, for ingest pipelines that must
surface near-dups as documents ARRIVE rather than in a nightly batch
(at crawl scale the corpus never stands still long enough for one).

Spark-first shape: ``foreachBatch`` over a document stream maintains the
LSH index as an accumulating parquet table of banded signature rows
(``(doc_id, band, sig)`` — operators/dedup.banded_signatures, the same
rows the batch operator derives transiently). Per micro-batch:

1. The batch's signatures are computed ONCE (the CPU-heavy
   tokenize→shingle→16-permutation work happens per document exactly
   once, at arrival — the whole point of the incremental form).
2. Candidate pairs are the band-bucket join of the batch's banded rows
   against the accumulated index PLUS the batch itself — a new document
   is compared only against buckets it lands in, never all-pairs. The
   old×old pairs were emitted by earlier batches, so the union over
   batches is EXACTLY the batch operator's candidate set (each pair is
   discovered when its later member arrives).
3. The batch's banded rows and raw texts are appended to the index /
   docs tables.

``near_dup_pairs`` then verifies exact Jaccard over the accumulated
candidates — restricted to candidate docs, the same
verification-restriction the batch operator uses — so on convergence
(stream fully drained) the output is row-identical to
``dedup_minhash_lsh`` on the same corpus: the oracle-checked contract.

Scale notes (100 TB):
- State is the banded-signature table: 4 small rows per document,
  partition-pruned by the bucket join; raw text is read again only for
  docs that land in some candidate pair.
- The per-batch bucket join shuffles only the BATCH's banded rows
  against the index's matching buckets (AQE broadcasts small batches).
- Hot buckets (boilerplate-heavy corpora) fan out exactly as in the
  batch operator; the accumulated-candidates table dedups on read.
- Verification cost is deferred and incremental-friendly: callers can
  verify per convergence point instead of per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D

DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


class StreamingNearDeduper:
    """Owns the LSH index (banded signatures), docs, and candidate-pair
    tables under ``out_dir``; availableNow drains a landing directory
    exactly once per checkpoint."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.index_dir = os.path.join(out_dir, "lsh_index")
        self.docs_dir = os.path.join(out_dir, "docs")
        self.cands_dir = os.path.join(out_dir, "cands")

    # -- per-batch increment ------------------------------------------------

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select("doc_id", "text")
        banded_b = D.banded_signatures(D.minhash_signatures(docs)).persist()
        try:
            new_side = banded_b.select(
                F.col("doc_id").alias("_new_id"), "band", "sig"
            )
            if os.path.isdir(self.index_dir):
                index = self.spark.read.parquet(self.index_dir)
                probe = index.unionByName(banded_b)
            else:
                probe = banded_b
            cands = (
                probe.select(F.col("doc_id").alias("_old_id"), "band", "sig")
                .join(new_side, ["band", "sig"])
                .filter(F.col("_old_id") != F.col("_new_id"))
                .select(
                    F.least("_old_id", "_new_id").alias("doc_a"),
                    F.greatest("_old_id", "_new_id").alias("doc_b"),
                )
                .distinct()
            )
            cands.write.mode("append").parquet(self.cands_dir)
            banded_b.write.mode("append").parquet(self.index_dir)
            docs.write.mode("append").parquet(self.docs_dir)
        finally:
            banded_b.unpersist()

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(DOC_STREAM_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(landing_dir)
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("streaming near-dup did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    # -- convergence-point reads -------------------------------------------

    def candidate_pairs(self) -> DataFrame:
        """Accumulated candidate pairs; a stream that never processed a
        batch (empty landing) has no tables on disk and serves the empty
        relation — degrade like every other degenerate input, don't
        crash on a missing path."""
        if not os.path.isdir(self.cands_dir):
            return self.spark.createDataFrame([], "doc_a long, doc_b long")
        return self.spark.read.parquet(self.cands_dir).distinct()

    def near_dup_pairs(self, threshold: float = 0.5) -> DataFrame:
        """(doc_a, doc_b, jaccard ≥ threshold) over everything ingested so
        far — on a drained stream, row-identical to the batch
        ``dedup_minhash_lsh`` (the oracle contract). Verification builds
        distinct shingle sets only for docs in some candidate pair."""
        if not os.path.isdir(self.docs_dir):
            return self.spark.createDataFrame(
                [], "doc_a long, doc_b long, jaccard double"
            )
        cands = self.candidate_pairs()
        docs = self.spark.read.parquet(self.docs_dir)
        cand_docs = (
            cands.select(F.col("doc_a").alias("doc_id"))
            .unionAll(cands.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        sh_cand = (
            D.shingle_bag(docs)
            .join(cand_docs, "doc_id")
            .dropDuplicates(["doc_id", "shingle"])
        )
        verified = D.verify_jaccard(cands, sh_cand)
        return verified.filter(F.col("jaccard") >= threshold)
