"""Streaming video/audio copy detection — the incremental form of
operators/multimodal.{video_dup_pairs, video_clip_pairs,
audio_dup_pairs}, generalizing StreamingImageDeduper (mediadedup.py)
from one fingerprint per image to MANY fingerprint units per media row
(sampled frames / audio windows) and from pair verification to
offset-consistent match counting.

State per deduper (under ``out_dir``):

- the unit fingerprint table (media_id, unit_idx, hash) — frames/
  windows are decoded and hashed ONCE at arrival, never re-decoded;
- one banded index per candidate generator, laid out
  ``partitionBy(blk, bucket)`` so each micro-batch probes only the
  buckets it touches (the image deduper's pruning device):
  * the 16-bit-block index (4 rows/unit) — the UNALIGNED generator,
    exact for Hamming ≤ UNALIGNED_MAX_HAMMING = 3 < 4 blocks and
    hot-bucket-safe on gradient-sign hashes (the r11 lesson: hot
    16-bit patterns are the square of the byte bias);
  * video only: the aligned (frame_idx, byte-block) index
    (8 rows/unit) — exact for the re-encode matcher's
    PHASH_MAX_HAMMING = 7 < 8 blocks; frame_idx in the join key keeps
    these buckets cool;
- an accumulating MEDIA-level candidate-pair table (distinct-compacted).

Per micro-batch: fingerprint the batch once, band-join each generator's
batch rows against (pruned index ∪ batch), record candidate media
pairs; verification is deferred to convergence reads. Candidate
generation is exact at the media level: a pair that qualifies for any
batch matcher has ≥ min_shared unit matches within its threshold, each
of which shares a banded block (pigeonhole), so the pair is recorded
when its later member arrives. The convergence reads re-join the unit
fingerprint table on both sides of the candidate pairs and re-derive
the EXACT batch semantics (aligned count / offset-grouped count) — on
a drained stream ``pairs_aligned()`` ≡ ``video_dup_pairs`` and
``pairs_offsets()`` ≡ ``video_clip_pairs`` / ``audio_dup_pairs`` on
the same corpus, which is why the streaming queries share the batch
oracles verbatim.

Scale: state is ≤ 12 small rows per fingerprint unit; per-batch work
joins the batch's banded rows against only touched buckets; reads
fan out candidates by units² per pair (units/media is a small
constant — the sampling stride's point), all bit_count/xor JVM-side.
Replay-idempotent: fps reads dropDuplicates on (media_id, unit_idx),
candidates read distinct, so a re-delivered batch changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from .mediadedup import MEDIA_STREAM_SCHEMA, N_BYTE_BUCKETS


def _banded16_rows(fps: DataFrame, hash_col: str, unit_col: str) -> DataFrame:
    """(media_id, unit, 4 × (blk, hword)) — the unaligned generator's
    banding (multimodal._banded16 over the streaming schema)."""
    return fps.select(
        "media_id",
        F.col(unit_col).alias("unit"),
        F.expr(
            "stack(4, "
            + ", ".join(
                f"{i}, CAST(shiftright({hash_col}, {16 * i}) & 65535 AS INT)"
                for i in range(4)
            )
            + ") as (blk, hword)"
        ),
    )


def _banded8_rows(fps: DataFrame, hash_col: str, unit_col: str) -> DataFrame:
    """(media_id, unit, 8 × (blk, byte)) — the aligned generator's
    byte-block banding (the image tier's, keyed per frame)."""
    return fps.select(
        "media_id",
        F.col(unit_col).alias("unit"),
        F.expr(
            "stack(8, "
            + ", ".join(
                f"{i}, CAST(shiftright({hash_col}, {8 * i}) & 255 AS INT)"
                for i in range(8)
            )
            + ") as (blk, byte)"
        ),
    )


class _StreamingCopyDeduper:
    """Shared machinery: index maintenance, pruned probing, candidate
    accumulation, compaction, the availableNow drain loop. Subclasses
    pin the fingerprinter and whether the aligned generator runs."""

    #: subclass contract
    HASH_COL = "hash"
    UNIT_COL = "unit_idx"
    ALIGNED = False

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_buckets: int = N_BYTE_BUCKETS,
        compact_every: int = 8,
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.fps_dir = f"{out_dir}/fps"
        self.cands_dir = f"{out_dir}/cands"
        self.idx16_dir = f"{out_dir}/idx16"
        self.idx8_dir = f"{out_dir}/idx8"

    # -- subclass hook -------------------------------------------------------

    def _fingerprint(self, batch_df: DataFrame) -> DataFrame:
        raise NotImplementedError

    # -- plumbing ------------------------------------------------------------

    def _exists(self, path: str) -> bool:
        return fsutil.exists(self.spark, path)

    def _probe_pairs(
        self,
        blocked_b: DataFrame,
        idx_dir: str,
        key_cols: list[str],
        bucket_of,
    ) -> DataFrame:
        """Media-level candidate pairs of one generator: batch rows
        band-join (pruned index ∪ batch); pairs normalized a < b."""
        new_side = blocked_b.select(
            F.col("media_id").alias("_new_id"), *key_cols
        )
        if self._exists(idx_dir):
            # Prune the index to buckets the batch actually touches via
            # a left-semi join against the batch's distinct (blk,
            # bucket) keys — no driver collect (r12 ADVICE: the two
            # extra jobs per generator per micro-batch dominated
            # single-file-trigger latency); the touched set is tiny so
            # the semi-join broadcasts.
            touched = F.broadcast(
                blocked_b.select("blk", bucket_of.alias("bucket")).distinct()
            )
            index = (
                self.spark.read.parquet(idx_dir)
                .join(touched, ["blk", "bucket"], "left_semi")
            )
            probe = index.select("media_id", *key_cols).unionByName(
                blocked_b.select("media_id", *key_cols)
            )
        else:
            probe = blocked_b.select("media_id", *key_cols)
        return (
            probe.select(F.col("media_id").alias("_old_id"), *key_cols)
            .join(new_side, key_cols)
            .filter(F.col("_old_id") != F.col("_new_id"))
            .select(
                F.least("_old_id", "_new_id").alias("media_a"),
                F.greatest("_old_id", "_new_id").alias("media_b"),
            )
            .distinct()
        )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        fsutil.recover_swap(self.spark, self.cands_dir)
        # Persist the UNIT fingerprints, not a banded view: the Arrow
        # fingerprinter (frame/window decode + hash) is the expensive
        # per-batch work and feeds both banded views plus the fps write.
        fps_b = self._fingerprint(batch_df).select(
            "media_id",
            F.col(self.UNIT_COL).alias("unit"),
            F.col(self.HASH_COL).alias("hash"),
        ).persist()
        try:
            b16 = _banded16_rows(fps_b, "hash", "unit").withColumn(
                "bucket", F.pmod(F.col("hword"), F.lit(self.n_buckets))
            )
            cands = self._probe_pairs(
                b16, self.idx16_dir, ["blk", "hword"],
                F.pmod(F.col("hword"), F.lit(self.n_buckets)),
            )
            if self.ALIGNED:
                b8 = _banded8_rows(fps_b, "hash", "unit").withColumn(
                    "bucket", F.pmod(F.col("byte"), F.lit(self.n_buckets))
                )
                cands = cands.unionByName(
                    self._probe_pairs(
                        b8, self.idx8_dir, ["unit", "blk", "byte"],
                        F.pmod(F.col("byte"), F.lit(self.n_buckets)),
                    )
                ).distinct()
            cands.write.mode("append").parquet(self.cands_dir)
            b16.select(
                "media_id", "hword", "blk", "bucket"
            ).write.partitionBy("blk", "bucket").mode("append").parquet(
                self.idx16_dir
            )
            if self.ALIGNED:
                b8.select(
                    "media_id", "unit", "byte", "blk", "bucket"
                ).write.partitionBy("blk", "bucket").mode("append").parquet(
                    self.idx8_dir
                )
            fps_b.write.mode("append").parquet(self.fps_dir)
        finally:
            fps_b.unpersist()
        if self.compact_every and (batch_id + 1) % self.compact_every == 0:
            self.compact()

    INDEX_COMPACT_MIN_FILES = 8

    def compact(self) -> None:
        """Distinct-rewrite the candidate table (materialize-then-swap)
        and coalesce index buckets that accreted per-batch appends —
        the StreamingImageDeduper maintenance contract."""
        from ..sources import compact as C

        if self._exists(self.cands_dir):
            tmp = fsutil.prepare_swap(self.spark, self.cands_dir)
            self.spark.read.parquet(self.cands_dir).distinct().write.mode(
                "overwrite"
            ).parquet(tmp)
            fsutil.commit_swap(self.spark, self.cands_dir)
        for idx_dir in (self.idx16_dir, self.idx8_dir):
            if not self._exists(idx_dir):
                continue
            for blk in fsutil.list_names(self.spark, idx_dir):
                if "=" not in blk:
                    continue
                blk_path = f"{idx_dir}/{blk}"
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
            raise TimeoutError("streaming AV dedup did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    # -- convergence-point reads ----------------------------------------------

    def candidate_pairs(self) -> DataFrame:
        fsutil.recover_swap(self.spark, self.cands_dir)
        if not self._exists(self.cands_dir):
            return self.spark.createDataFrame([], "media_a long, media_b long")
        return self.spark.read.parquet(self.cands_dir).distinct()

    def _verified(self, max_hamming: int) -> DataFrame:
        """(media_a, media_b, ua, ub, hamming ≤ max_hamming) — every
        unit match of every candidate pair; replay-proof (fps rows are
        a pure function of (media_id, unit), so dropDuplicates loses
        nothing)."""
        if not self._exists(self.fps_dir):
            return self.spark.createDataFrame(
                [],
                "media_a long, media_b long, ua int, ub int, hamming int",
            )
        fps = self.spark.read.parquet(self.fps_dir).dropDuplicates(
            ["media_id", "unit"]
        )
        fa = fps.select(
            F.col("media_id").alias("media_a"),
            F.col("unit").alias("ua"),
            F.col("hash").alias("ha"),
        )
        fb = fps.select(
            F.col("media_id").alias("media_b"),
            F.col("unit").alias("ub"),
            F.col("hash").alias("hb"),
        )
        ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
        return (
            self.candidate_pairs()
            .join(fa, "media_a")
            .join(fb, "media_b")
            .select("media_a", "media_b", "ua", "ub", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )

    def pairs_offsets(
        self,
        max_hamming: int | None = None,
        min_shared: int | None = None,
    ) -> DataFrame:
        """Offset-consistent copy pairs — on a drained stream,
        row-identical to the batch unaligned matcher
        (``video_clip_pairs`` / ``audio_dup_pairs``): matches grouped
        by (pair, unit offset), pair survives at ≥ min_shared matches
        on one offset. Defaults couple to the BATCH constants."""
        from ..operators.multimodal import (
            UNALIGNED_MAX_HAMMING,
            VIDEO_MIN_SHARED,
        )

        mh = UNALIGNED_MAX_HAMMING if max_hamming is None else max_hamming
        ms = VIDEO_MIN_SHARED if min_shared is None else min_shared
        return (
            self._verified(mh)
            .select(
                "media_a",
                "media_b",
                (F.col("ub") - F.col("ua")).cast("long").alias("unit_offset"),
            )
            .groupBy("media_a", "media_b", "unit_offset")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
            .filter(F.col("n_matched") >= ms)
        )


class StreamingVideoDeduper(_StreamingCopyDeduper):
    """Incremental video copy detection: frame-sampled pHashes at
    ingest, BOTH generators (aligned byte-block for re-encodes,
    16-bit-block for clips), both batch reads."""

    HASH_COL = "dhash"
    UNIT_COL = "frame_idx"
    ALIGNED = True

    def _fingerprint(self, batch_df: DataFrame) -> DataFrame:
        from ..operators.multimodal import _video_frame_phash_build

        return _video_frame_phash_build(batch_df)

    def pairs_aligned(
        self,
        max_hamming: int | None = None,
        min_shared: int | None = None,
    ) -> DataFrame:
        """Aligned re-encode pairs — on a drained stream, row-identical
        to batch ``video_dup_pairs``: ≥ min_shared SAME-frame_idx
        matches within max_hamming. Defaults couple to the batch
        constants (the ADVICE r11 rule)."""
        from ..operators.multimodal import (
            PHASH_MAX_HAMMING,
            VIDEO_MIN_SHARED,
        )

        mh = PHASH_MAX_HAMMING if max_hamming is None else max_hamming
        ms = VIDEO_MIN_SHARED if min_shared is None else min_shared
        return (
            self._verified(mh)
            .filter(F.col("ua") == F.col("ub"))
            .groupBy("media_a", "media_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
            .filter(F.col("n_matched") >= ms)
        )

    def pairs_clips(
        self,
        max_hamming: int | None = None,
        min_shared: int | None = None,
    ) -> DataFrame:
        """Batch ``video_clip_pairs`` contract: (media_a, media_b,
        frame_offset, n_matched)."""
        return self.pairs_offsets(max_hamming, min_shared).select(
            "media_a",
            "media_b",
            F.col("unit_offset").alias("frame_offset"),
            "n_matched",
        )


class StreamingAudioDeduper(_StreamingCopyDeduper):
    """Incremental audio copy detection: windowed fingerprints at
    ingest, the 16-bit unaligned generator (trimmed re-uploads are the
    default audio copy), the offset-consistent read."""

    HASH_COL = "whash"
    UNIT_COL = "window_idx"
    ALIGNED = False

    def _fingerprint(self, batch_df: DataFrame) -> DataFrame:
        from ..operators.multimodal import _audio_window_hash_build

        return _audio_window_hash_build(batch_df)

    def pairs(
        self,
        max_hamming: int | None = None,
        min_shared: int | None = None,
    ) -> DataFrame:
        """Batch ``audio_dup_pairs`` contract: (media_a, media_b,
        window_offset, n_matched)."""
        return self.pairs_offsets(max_hamming, min_shared).select(
            "media_a",
            "media_b",
            F.col("unit_offset").alias("window_offset"),
            "n_matched",
        )
