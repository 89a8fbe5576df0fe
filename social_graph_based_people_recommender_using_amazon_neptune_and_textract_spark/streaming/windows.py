"""Event-time windowed aggregation with watermark — the streaming
analytics surface (hourly event rollups) the reference lacks entirely
(it is processing-time only, SURVEY §1.2); added as part of the
training-pipeline extension surface.

Semantics:
- **event time**: windows bucket by the event's own ``ts``, not arrival;
- **watermark**: state for windows older than ``watermark`` behind the
  max seen event time is evicted — bounded state under unbounded
  streams, and the formal definition of "too late to count";
- **update output + keyed merge**: each micro-batch emits the windows it
  touched; the keyed sink keeps the latest row per window. Counts are
  monotone per key, so replays converge (same argument as the ingest
  sinks). Append mode would withhold the final windows forever on a
  drained stream (the watermark never advances past the last event) —
  a known trap this layout avoids.

The converged result equals the batch GROUP BY over the same inputs,
which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import KeyedParquetTable

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming (or batch) events → per-(window, event_type) rollup."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.unix_micros(F.col("window.end")).alias("window_end_us"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


class WindowedCounter:
    """Parquet landing dir → watermarked hourly rollup → keyed table."""

    def __init__(self, spark, warehouse_dir: str) -> None:
        self.spark = spark
        self.table = KeyedParquetTable(
            spark,
            f"{warehouse_dir.rstrip('/')}/event_windows",
            keys=["window_start_us", "event_type"],
            order_by=["n_events"],  # monotone per key ⇒ latest = max
        )

    def run_available_now(
        self, landing_dir: str, checkpoint_dir: str, timeout_s: int = 300
    ) -> None:
        stream = self.spark.readStream.schema(EVENTS_DDL).parquet(landing_dir)
        counts = windowed_event_counts(stream)

        def commit(batch: DataFrame, batch_id: int) -> None:
            self.table.merge(batch)

        q = (
            counts.writeStream.foreachBatch(commit)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("windowed counter did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def current(self) -> DataFrame | None:
        return self.table.read()
