"""Stream-static dimension enrichment — the micro-batch form of the
warehouse's broadcast dimension join.

The reference enriches every streamed record imperatively: each Lambda
invocation re-derives owner/company fields and re-reads lookup state per
record (upsert_bizcard_to_*). The Structured Streaming equivalent is a
STREAM-STATIC JOIN: the static dimension is analyzed once at plan time
and every micro-batch joins against it — with an explicit broadcast so
the stream side never shuffles. At 100 TB/day of events and a
million-row dimension this is the only shape that holds: per-batch work
is O(batch), state is zero (the join is stateless — the dim is static),
and the dim ships to executors once per query, not per batch.

The aggregation rides the PARTIAL-MERGE pattern: each batch appends its
per-group partial (count + exact DECIMAL sum) to the result table, and
the converged read merges partials with a second aggregation — both
legs associative, so the result is batch-count-independent (drain with
1 file per trigger or all at once: same relation, pinned by test).
Floats only become doubles at the display edge (round 4dp), per the
warehouse determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


class StreamingEnricher:
    """Enrich a parquet-landing event stream with a static dimension and
    maintain per-group totals in ``out_dir``."""

    def __init__(
        self,
        spark: SparkSession,
        dim: DataFrame,
        stream_key: str,
        dim_key: str,
        group_col: str,
        out_dir: str,
        stream_schema=None,
    ) -> None:
        self.spark = spark
        self.dim = dim.select(dim_key, group_col)
        self.stream_key = stream_key
        self.dim_key = dim_key
        self.group_col = group_col
        self.out_dir = out_dir
        self.stream_schema = stream_schema

    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        part = (
            batch.join(
                F.broadcast(self.dim),
                batch[self.stream_key] == self.dim[self.dim_key],
            )
            .groupBy(self.group_col)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast(DEC)).alias("vsum"),
            )
        )
        part.write.mode("append").parquet(self.out_dir)

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(self.stream_schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        q = (
            reader.parquet(landing_dir)
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)

    def result(self) -> DataFrame:
        """Merged per-group totals: (group, n, value_sum) — partials
        merge associatively, so the relation is drain-independent."""
        parts = self.spark.read.parquet(self.out_dir)
        return parts.groupBy(self.group_col).agg(
            F.sum("n").alias("n"),
            F.round(F.sum("vsum").cast("double"), 4).alias("value_sum"),
        )
