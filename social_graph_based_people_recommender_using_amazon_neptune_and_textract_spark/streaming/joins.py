"""Stream-stream windowed join — the streaming twin of
operators/rangejoin.bounded_range_join, for pipelines that must emit
(error, click-shortly-before) pairs as events ARRIVE (real-time
attribution / alerting) instead of in a batch sweep.

Spark-first shape: this is exactly what Structured Streaming's
stream-stream inner join with a time-range condition is for — both
sides carry an event-time watermark, the join condition bounds how far
apart matching rows can be, and the state store therefore retains each
side only for the window span plus the watermark delay. No foreachBatch,
no custom state: the built-in operator already implements the buffering,
cleanup, and cross-batch matching.

Convergence contract (the oracle): a drained stream emits EXACTLY the
batch operator's pair set — stream-stream inner joins match rows across
micro-batch boundaries through the state store, so batch boundaries
cannot lose or duplicate pairs. ``streaming_error_click_pairs`` shares
``events_error_click_pairs_5m``'s DuckDB oracle verbatim.

Scale notes (100 TB/day firehose):
- State is bounded by watermark + window: each side keeps ~(delay +
  span) of data per key, independent of stream history length.
- The join shuffles both sides on user_id once per micro-batch; skewed
  users are AQE-split in batch mode and bounded by the window in state.
- Late rows beyond the watermark are dropped on both sides — the same
  declared bounded-state trade as streaming/dedup.py. Size ``delay`` to
  the stream's real disorder bound: a replay/drain over files that are
  NOT roughly time-ordered needs a delay spanning the whole corpus, or
  the watermark races to the max timestamp after the first batch and
  everything later-arriving is dropped as late.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DOC_STREAM_SCHEMA  # noqa: F401  (shared schema doc)

EVENT_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


#: Reserved user id for watermark-advancing sentinel rows (the
#: sessions.py flush device); sentinel pairs never reach the output.
SENTINEL_USER = -1


class StreamingRangeJoiner:
    """Owns the emitted-pairs table under ``out_dir``; availableNow
    drains a landing directory of event files exactly once per
    checkpoint, emitting (error, click within ``window_s`` at-or-before)
    pairs per user.

    ``how="inner"`` (default) emits matches as both sides arrive.
    ``how="leftOuter"`` additionally emits every UNMATCHED error with
    NULL click columns — real-time attribution's "error with no
    preceding click" alert. Outer emission is WATERMARK-GATED: an
    unmatched left row is final only once the global watermark passes
    its window (no future click can match it), so a drained-stream
    flush needs the sessions.py sentinel device — ``drain()`` appends a
    far-future sentinel row to BOTH sides (the global watermark is the
    MIN across inputs) and re-drains, then the reserved user id is
    filtered from the output."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        window_s: int = 300,
        delay: str = "10 minutes",
        how: str = "inner",
    ) -> None:
        if how not in ("inner", "leftOuter"):
            raise ValueError(f"unsupported join type: {how}")
        self.spark = spark
        self.out_dir = out_dir
        self.window_s = window_s
        self.delay = delay
        self.how = how
        self.pairs_dir = f"{out_dir}/pairs"

    def run_available_now(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        reader = self.spark.readStream.schema(EVENT_STREAM_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(landing_dir)
        errors = (
            stream.filter(F.col("event_type") == "error")
            .select(
                F.col("event_id").alias("e_id"),
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("e_ts"),
            )
            .withWatermark("e_ts", self.delay)
        )
        clicks = (
            stream.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("c_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", self.delay)
        )
        pairs = errors.join(
            clicks,
            (F.col("e_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {self.window_s} SECONDS"))
            & (F.col("c_ts") <= F.col("e_ts")),
            self.how,
        ).select("e_id", "e_user", "e_ts", "c_id", "c_ts")
        q = (
            pairs.writeStream.format("parquet")
            .option("path", self.pairs_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("streaming range join did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def drain(
        self,
        landing_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ) -> None:
        """Drain the landing data; for ``leftOuter``, then flush
        withheld unmatched errors with a watermark-advancing sentinel
        on both sides and drain once more.

        FINAL-DRAIN CONTRACT (leftOuter only, same device as
        sessions.py): the sentinel rows are APPENDED INTO
        ``landing_dir`` itself — any other consumer of that directory
        sees two phantom user_id=``SENTINEL_USER`` events (filter them
        as ``pairs()`` does) — and they advance this checkpoint's
        watermark ~10 years past the observed max timestamp, so the
        checkpoint is FINAL: data landed after a leftOuter ``drain()``
        would be dropped as late on a re-drain against the same
        ``checkpoint_dir``. Treat leftOuter drain as the one-shot
        end-of-stream flush; to resume consumption instead, use a fresh
        checkpoint dir (and drop the sentinel files)."""
        import datetime as dt

        self.run_available_now(
            landing_dir, checkpoint_dir, max_files_per_trigger, timeout_s
        )
        if self.how != "leftOuter":
            return
        bounds = (
            self.spark.read.schema(EVENT_STREAM_SCHEMA)
            .parquet(landing_dir)
            .agg(F.max("ts").alias("hi"))
            .collect()[0]
        )
        if bounds.hi is None:
            return
        flush_at = bounds.hi + dt.timedelta(days=3650)
        sentinel = self.spark.createDataFrame(
            [
                (-1, flush_at, SENTINEL_USER, "error", 0.0, None),
                (-2, flush_at, SENTINEL_USER, "click", 0.0, None),
            ],
            EVENT_STREAM_SCHEMA,
        )
        sentinel.write.mode("append").parquet(landing_dir)
        self.run_available_now(
            landing_dir, checkpoint_dir, max_files_per_trigger, timeout_s
        )

    def pairs(self) -> DataFrame:
        return (
            self.spark.read.schema(
                "e_id long, e_user long, e_ts timestamp, c_id long, c_ts timestamp"
            )
            .parquet(self.pairs_dir)
            .filter(F.col("e_user") != SENTINEL_USER)
        )
