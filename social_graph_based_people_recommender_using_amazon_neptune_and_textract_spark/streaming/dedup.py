"""Streaming exact deduplication — the streaming form of
operators/dedup.dedup_exact, for ingest pipelines that must drop repeated
documents BEFORE landing them (a 100 TB crawl re-fetches the same page
constantly; deduping post-hoc doubles the storage bill).

Spark-first shape: ``dropDuplicatesWithinWatermark`` on the content hash.
The operator keeps ONE state row per distinct hash and emits the first
arrival; the event-time watermark bounds the state store — hashes older
than the delay are evicted, so memory is proportional to the dedup
horizon, not corpus history. Declared boundary: a duplicate arriving
later than the watermark delay re-emits (bounded-state exactness, the
same trade every streaming dedup makes). The emitted SET of hashes is
deterministic (= batch DISTINCT) even though which physical duplicate
wins within a micro-batch is not — queries/oracles compare the set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = "doc_id long, text string, ts timestamp"


class StreamingDeduper:
    """Owns the survivors table under ``out_dir``; availableNow drains a
    landing directory exactly once per checkpoint (replays are no-ops —
    pinned by tests)."""

    def __init__(self, spark: SparkSession, out_dir: str, delay: str = "1 hour") -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.delay = delay
        self.survivors_dir = os.path.join(out_dir, "survivors")

    def run_available_now(
        self, landing_dir: str, checkpoint_dir: str, timeout_s: int = 300
    ) -> None:
        stream = self.spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(
            landing_dir
        )
        deduped = (
            stream.select(
                "doc_id",
                F.md5(F.col("text").cast("binary")).alias("text_hash"),
                "ts",
            )
            .withWatermark("ts", self.delay)
            .dropDuplicatesWithinWatermark(["text_hash"])
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", self.survivors_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("streaming dedup did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def survivors(self) -> DataFrame:
        return self.spark.read.schema(
            "doc_id long, text_hash string, ts timestamp"
        ).parquet(self.survivors_dir)
