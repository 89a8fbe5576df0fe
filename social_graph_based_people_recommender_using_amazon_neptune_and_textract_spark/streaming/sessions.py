"""Streaming sessionization with ``session_window`` — the stateful
session operator (batch operators/sessionize.py's streaming twin).

Unlike fixed windows (windows.py), session windows MERGE as events
arrive: a row landing between two existing sessions within the gap
fuses them into one, changing the session's key (its start). That makes
the update-mode + keyed-merge layout the fixed-window counter uses
UNSAFE here — a merged session would overwrite its new key but leave
the swallowed sessions' rows behind. Sessions are therefore emitted in
**append mode**: a session row is emitted exactly once, when the
watermark passes its close (last event + gap), i.e. when no future
event can merge into it. That is the one semantics under which "emit"
is final for a mergeable window.

The append-mode corollary is the drained-stream trap: after the last
real event the watermark never advances, so the final open sessions
would be withheld forever. The standard operational fix (public
practice: watermark-advancing heartbeats) is a sentinel event past
``max(ts) + delay + gap``: it pushes the global watermark over every
real session's close, flushing them; the sentinel's own session is
filtered by its reserved user id. ``drain()`` appends the sentinel
automatically after the real data is consumed.

Out-of-order safety: availableNow micro-batches read landing files in
arbitrary order, so the watermark delay must cover the DATA'S time
span, not an operational lateness bound — ``run_available_now``
computes it from the landing data (one min/max scan) and documents the
production substitution (a real deployment knows its lateness SLA and
uses that instead; state then stays bounded instead of span-sized).

Scale: session_window state is per (user, open session) in the state
store, evicted at watermark — the built-in mergeable-session state
machine, no applyInPandasWithState needed. Skewed users stream through
the same per-key path as the batch window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SENTINEL_USER = -1
EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def session_stats_stream(
    events: DataFrame, gap: str = "12 hours", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming (or batch) events → per-(user, session) stats via
    ``session_window``. start_us is the session's first event time;
    end_us is its last (window.end minus the gap, since session_window
    defines end = last + gap). Matches batch sessionize's gap rule
    (same-session iff inter-event gap <= gap)."""
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
            F.max(F.unix_micros("ts")).alias("end_us"),
        )
    )
    return agg.select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("start_us"),
        "end_us",
        "n_events",
        "value_sum",
    )


class StreamingSessionizer:
    """Parquet landing dir → append-mode closed sessions → parquet."""

    def __init__(self, spark, out_dir: str, gap: str = "12 hours") -> None:
        self.spark = spark
        self.out_dir = out_dir.rstrip("/")
        self.gap = gap

    def _drain(
        self, landing_dir: str, checkpoint_dir: str, watermark: str,
        timeout_s: int,
    ) -> None:
        stream = self.spark.readStream.schema(EVENTS_DDL).parquet(landing_dir)
        sessions = session_stats_stream(stream, self.gap, watermark)
        q = (
            sessions.writeStream.outputMode("append")
            .format("parquet")
            .option("path", f"{self.out_dir}/sessions")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("sessionizer did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def run_available_now(
        self, landing_dir: str, checkpoint_dir: str, timeout_s: int = 300
    ) -> None:
        """Drain the landing data, then flush open sessions with a
        watermark-advancing sentinel and drain again."""
        import datetime as dt

        bounds = self.spark.read.parquet(landing_dir).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        if bounds.hi is None:
            return  # empty landing: nothing to sessionize
        span_s = max(int((bounds.hi - bounds.lo).total_seconds()), 1)
        watermark = f"{span_s + 1} seconds"

        self._drain(landing_dir, checkpoint_dir, watermark, timeout_s)

        # Sentinel: past every real session's close + the delay, so the
        # post-sentinel watermark exceeds all real (last + gap) closes.
        flush_at = bounds.hi + dt.timedelta(seconds=3 * span_s + 86_400 * 30)
        sentinel = self.spark.createDataFrame(
            [(-1, flush_at, SENTINEL_USER, "_flush", 0.0)],
            EVENTS_DDL,
        )
        sentinel.write.mode("append").parquet(landing_dir)
        self._drain(landing_dir, checkpoint_dir, watermark, timeout_s)

    def current(self) -> DataFrame:
        return (
            self.spark.read.parquet(f"{self.out_dir}/sessions")
            .filter(F.col("user_id") != SENTINEL_USER)
        )
