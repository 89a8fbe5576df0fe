"""Gap-based event sessionization — a training-data-pipeline staple
(user activity → sessions → per-session features) built purely from
window functions, no UDFs.

Two windows over (user_id, ts, event_id):
  1. ``lag`` marks a session break where the gap to the previous event
     exceeds the threshold;
  2. a running sum of break markers numbers the sessions per user.

Timestamps are compared in integer microseconds (``unix_micros``) so the
DuckDB oracle (``epoch_us``) is bit-identical — float epoch seconds
would diverge on subsecond boundaries.

Scale: both windows share ONE partitioning (user_id) and ordering, so
Catalyst plans a single shuffle + single sort; session stats aggregate on
(user_id, session) which that shuffle already clusters. Skewed users
(bots) are the known hazard — the window is per-user sequential by
nature; cap-and-salt or time-bucket pre-splitting is the mitigation at
the extreme tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 43200  # 12 h — testdata events are hours apart


def sessionize(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Adds (session_seq, session_id) to each event. A new session starts
    at the user's first event and whenever the gap from the previous
    event exceeds ``gap_s``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | (us - prev > gap_s * 1_000_000), 1
    ).otherwise(0)
    seq = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        seq.cast("int").alias("session_seq"),
        F.concat_ws("-", F.col("user_id"), seq).alias("session_id"),
    )


def session_stats(events: DataFrame, gap_s: int = DEFAULT_GAP_S) -> DataFrame:
    """Per-session rollup: bounds, size, distinct event types, value sum.
    Reuses the sessionize shuffle (same user_id clustering)."""
    s = sessionize(events, gap_s)
    us = F.unix_micros(F.col("ts"))
    return s.groupBy("user_id", "session_seq").agg(
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.round(F.sum("value"), 6).alias("value_sum"),
    )


def transition_counts(events: DataFrame) -> DataFrame:
    """Markov transition table over per-user event streams: how often
    event type A is immediately followed by B. Returns
    (prev_type, event_type, n) — first events (no predecessor) count
    under prev_type = '^' so rows are conserved.

    Shares sessionize's exact window spec (user_id, ts, event_id), so a
    composed plan pays the per-user shuffle once; the transition count
    itself is a map-side-combined aggregate over at most
    |event_types|^2 + |event_types| keys — tiny result, no skew hazard.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(F.col("event_type")).over(w)
    return (
        events.select(
            F.coalesce(prev, F.lit("^")).alias("prev_type"), "event_type"
        )
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
