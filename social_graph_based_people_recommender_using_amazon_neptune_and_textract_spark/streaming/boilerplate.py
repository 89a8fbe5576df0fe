"""Streaming boilerplate strip: the ingest-time serving half of the
per-source boilerplate family (operators/dedup.py).

Production shape (CCNet applies its repeated-line filter at crawl
ingestion): the dictionary is TRAINED IN BATCH on the reference shard —
the pinned family relation — then FROZEN; every arriving micro-batch of
documents is stripped against it via the shared batch core
(strip_with_dictionary), so the drained table over a replayed corpus is
row-identical to the batch ``strip_boilerplate`` (the oracle contract).
A per-document result is complete within its micro-batch, so the keyed
upsert degenerates to an insert and replays converge (KeyedParquetTable
last-write-wins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import KeyedParquetTable

#: Landing schema of the document stream (doc_id + text + source — the
#: strip needs the document's own source to select its dictionary rows).
BOILER_STREAM_SCHEMA = "doc_id long, text string, source string"


class StreamingBoilerplateStrip:
    """Owns the stripped-doc table under ``out_dir``; ``boiler`` is the
    frozen (source, gram) dictionary relation."""

    def __init__(self, spark: SparkSession, out_dir: str, boiler: DataFrame) -> None:
        from .. import checkpoints

        self.spark = spark
        # The dictionary is frozen for the gate's lifetime: a TRACKED
        # eager checkpoint cuts its lineage once so every micro-batch
        # re-reads a materialized relation instead of re-running the
        # training plan, and the engine's release hooks can reclaim the
        # blocks (an untracked localCheckpoint would leak per gate).
        self.boiler, _ = checkpoints.checkpoint(boiler.select("source", "gram"))
        # Broadcast decision made ONCE here: the dictionary is frozen
        # for the gate's lifetime, so its size never changes — probing
        # Catalyst plan stats per micro-batch (the r10 shape) was a
        # driver round-trip for a constant answer.
        from ..operators.dedup import hint_boiler_dictionary

        self.boiler_hinted = hint_boiler_dictionary(self.boiler)
        self.table = KeyedParquetTable(
            spark, out_dir, keys=["doc_id"], order_by=["batch_id"]
        )

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import strip_with_dictionary

        rows = strip_with_dictionary(
            batch_df, self.boiler_hinted, prehinted=True
        ).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        self.table.merge(rows)

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(BOILER_STREAM_SCHEMA)
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
            raise TimeoutError("streaming boilerplate strip did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def stripped(self) -> DataFrame:
        """(doc_id, n_removed, clean_fp) over everything ingested so far
        — on a drained replay of the training corpus, row-identical to
        batch ``strip_boilerplate`` (oracle contract). Empty landing →
        empty relation, not a crash."""
        out = self.table.read()
        if out is None:
            return self.spark.createDataFrame(
                [], "doc_id long, n_removed long, clean_fp string"
            )
        return out.select("doc_id", "n_removed", "clean_fp")
