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


def funnel_counts(
    events: DataFrame, stages: list[str] | None = None
) -> DataFrame:
    """Ordered funnel: how many users reached each stage IN ORDER —
    stage k counts users with a stage-k event strictly after their
    first qualifying stage-(k-1) event (first-touch semantics: each
    stage anchors at its EARLIEST qualifying time, the standard
    product-analytics funnel).

    Plan: one pass per stage over the (user-partitioned) events — stage
    k is a conditional min-timestamp aggregate joined back on user_id.
    Every join and aggregate shares the hash(user_id) partitioning, so
    stages after the first reuse the exchange (AQE coalesces); the
    per-stage state is one timestamp per user. Stage count is the
    funnel definition (3-5 in practice) — the linear pass count is the
    semantics, not a missed optimization: stage k's anchor cannot be
    known before stage k-1's.
    Returns (stage_idx, stage, n_users) with stage_idx the 1-based
    funnel position.
    """
    if stages is None:
        stages = ["view", "click", "purchase"]
    spark = events.sparkSession
    ev = events.select("user_id", "event_type", "ts")
    anchor = ev.filter(F.col("event_type") == stages[0]).groupBy("user_id").agg(
        F.min("ts").alias("t")
    )
    counts = [(1, stages[0], anchor)]
    for i, stage in enumerate(stages[1:], start=2):
        prev = counts[-1][2]
        nxt = (
            ev.filter(F.col("event_type") == stage)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append((i, stage, nxt))
    rows = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_users",
        )
        for i, name, df in counts
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
