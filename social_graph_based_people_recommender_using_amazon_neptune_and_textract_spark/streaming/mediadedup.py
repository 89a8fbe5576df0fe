"""Streaming perceptual-hash image dedup — the incremental form of
operators/multimodal.phash_pairs, for media ingest pipelines that must
catch re-encoded copies as images ARRIVE (the LAION-crawl shape: the
fingerprint index is the persistent state, raw bytes are fingerprinted
once at ingest and never re-decoded).

Spark-first shape (the StreamingNearDeduper pattern, text→image): a
``foreachBatch`` stream of media rows maintains

- the BLOCKED fingerprint index: (media_id, dhash, byte) rows laid out
  ``partitionBy(blk, byteb)`` — 8 rows per image, one per hash byte,
  the same rows the batch operator derives transiently; equal
  (blk, byte) ⇒ equal byteb, so pruning the index read to the
  partitions the batch touches loses no candidate;
- a plain fingerprint table (media_id, dhash) for verification;
- an accumulating candidate-pair table, compacted to distinct rows.

Per micro-batch: fingerprint the batch's images ONCE (the pixel-level
Arrow work happens at arrival, never again), band-join the batch's
blocked rows against (pruned index ∪ batch), verify nothing yet —
verification is deferred to convergence reads, where exact Hamming over
the fingerprint table filters the accumulated candidates. Old×old pairs
were emitted when their later member arrived, so on a drained stream
``pairs()`` is row-identical to batch ``phash_pairs`` on the same
corpus: the oracle contract (streaming_media_phash reuses the
dedup_media_phash twin).

Scale: state is 8 small rows per image; per-batch work joins the
batch's blocked rows against only the touched (blk, byteb) buckets;
hamming is bit_count/xor, JVM-side. Candidate generation stays exact —
threshold 7 < 8 blocks (the batch operator's pigeonhole).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil

#: Landing schema of the media stream.
MEDIA_STREAM_SCHEMA = "media_id long, kind string, content binary"

#: Hash-byte buckets per block in the index layout: 8 blocks × 64
#: buckets = 512 partition directories.
N_BYTE_BUCKETS = 64


def _blocked(fps: DataFrame) -> DataFrame:
    """(media_id, dhash, blk, byte) — the 8 byte-block keys per
    fingerprint, the batch operator's banding."""
    return fps.select(
        "media_id",
        "dhash",
        F.expr(
            "stack(8, "
            + ", ".join(
                f"{i}, CAST(shiftright(dhash, {8 * i}) & 255 AS INT)"
                for i in range(8)
            )
            + ") as (blk, byte)"
        ),
    )


class StreamingImageDeduper:
    """Owns the blocked fingerprint index (partitioned by
    ``(blk, byteb)``), the fingerprint table, and the candidate-pair
    table under ``out_dir``; availableNow drains a landing directory
    exactly once per checkpoint."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_byte_buckets: int = N_BYTE_BUCKETS,
        compact_every: int = 8,
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.n_byte_buckets = n_byte_buckets
        self.compact_every = compact_every
        self.index_dir = f"{out_dir}/phash_index"
        self.fps_dir = f"{out_dir}/fps"
        self.cands_dir = f"{out_dir}/cands"

    def _exists(self, path: str) -> bool:
        return fsutil.exists(self.spark, path)

    def _byteb(self):
        return F.pmod(F.col("byte"), F.lit(self.n_byte_buckets))

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.multimodal import _image_phash_build

        fsutil.recover_swap(self.spark, self.cands_dir)
        fps_b = _image_phash_build(batch_df).select("media_id", "dhash")
        blocked_b = _blocked(fps_b).withColumn("byteb", self._byteb()).persist()
        try:
            new_side = blocked_b.select(
                F.col("media_id").alias("_new_id"), "blk", "byte"
            )
            if self._exists(self.index_dir):
                touched = blocked_b.select("blk", "byteb").distinct().collect()
                index = self.spark.read.parquet(self.index_dir)
                if touched:
                    # ONE isin over a combined key of the two partition
                    # columns — an OR-chain of up to 8×64 per-bucket
                    # conjunctions builds a Column tree deep enough to
                    # overflow the driver stack during expression
                    # conversion; the flat isin list is equivalent and
                    # still references only partition columns, so
                    # partition pruning applies.
                    keys = [
                        int(r["blk"]) * self.n_byte_buckets + int(r["byteb"])
                        for r in touched
                    ]
                    index = index.filter(
                        (
                            F.col("blk") * F.lit(self.n_byte_buckets)
                            + F.col("byteb")
                        ).isin(keys)
                    )
                probe = index.select("media_id", "blk", "byte").unionByName(
                    blocked_b.select("media_id", "blk", "byte")
                )
            else:
                probe = blocked_b.select("media_id", "blk", "byte")
            cands = (
                probe.select(F.col("media_id").alias("_old_id"), "blk", "byte")
                .join(new_side, ["blk", "byte"])
                .filter(F.col("_old_id") != F.col("_new_id"))
                .select(
                    F.least("_old_id", "_new_id").alias("media_a"),
                    F.greatest("_old_id", "_new_id").alias("media_b"),
                )
                .distinct()
            )
            cands.write.mode("append").parquet(self.cands_dir)
            blocked_b.select(
                "media_id", "dhash", "byte", "blk", "byteb"
            ).write.partitionBy("blk", "byteb").mode("append").parquet(
                self.index_dir
            )
            fps_b.write.mode("append").parquet(self.fps_dir)
        finally:
            blocked_b.unpersist()
        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            self.compact()

    INDEX_COMPACT_MIN_FILES = 8

    def compact(self) -> None:
        """Distinct-rewrite the candidate table (materialize-then-swap)
        and coalesce index buckets that accreted per-batch appends —
        the StreamingNearDeduper maintenance contract verbatim."""
        from ..sources import compact as C

        if self._exists(self.cands_dir):
            tmp = fsutil.prepare_swap(self.spark, self.cands_dir)
            self.spark.read.parquet(self.cands_dir).distinct().write.mode(
                "overwrite"
            ).parquet(tmp)
            fsutil.commit_swap(self.spark, self.cands_dir)
        if self._exists(self.index_dir):
            for blk in fsutil.list_names(self.spark, self.index_dir):
                if "=" not in blk:
                    continue
                blk_path = f"{self.index_dir}/{blk}"
                for leaf in fsutil.list_names(self.spark, blk_path):
                    if "=" not in leaf:
                        continue
                    leaf_path = f"{blk_path}/{leaf}"
                    if (
                        C.n_data_files(self.spark, leaf_path)
                        >= self.INDEX_COMPACT_MIN_FILES
                    ):
                        C.compact_dir(self.spark, leaf_path)

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(MEDIA_STREAM_SCHEMA)
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
            raise TimeoutError("streaming image dedup did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    # -- convergence-point reads -------------------------------------------

    def candidate_pairs(self) -> DataFrame:
        fsutil.recover_swap(self.spark, self.cands_dir)
        if not self._exists(self.cands_dir):
            return self.spark.createDataFrame([], "media_a long, media_b long")
        return self.spark.read.parquet(self.cands_dir).distinct()

    def pairs(self, max_hamming: int | None = None) -> DataFrame:
        """(media_a, media_b, hamming ≤ max_hamming) over everything
        ingested — on a drained stream, row-identical to batch
        ``phash_pairs`` (the oracle contract). Verification joins the
        fingerprint table twice; exact bit_count/xor Hamming.

        ``max_hamming`` defaults to the BATCH threshold
        (multimodal.PHASH_MAX_HAMMING) so the streaming pairs can never
        silently diverge from batch ``phash_pairs`` if the constant
        changes (ADVICE r11)."""
        if max_hamming is None:
            from ..operators.multimodal import PHASH_MAX_HAMMING

            max_hamming = PHASH_MAX_HAMMING
        if not self._exists(self.fps_dir):
            return self.spark.createDataFrame(
                [], "media_a long, media_b long, hamming int"
            )
        cands = self.candidate_pairs()
        # The fingerprint is a pure function of media_id, so duplicate
        # rows (a re-ingested id) collapse losslessly — the defensive
        # dedup keeps the twice-joined verification from multiplying
        # pair rows if an upstream replays.
        fps = self.spark.read.parquet(self.fps_dir).dropDuplicates(
            ["media_id"]
        )
        fa = fps.select(
            F.col("media_id").alias("media_a"), F.col("dhash").alias("fa")
        )
        fb = fps.select(
            F.col("media_id").alias("media_b"), F.col("dhash").alias("fb")
        )
        ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int")
        return (
            cands.join(fa, "media_a")
            .join(fb, "media_b")
            .select("media_a", "media_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )
