"""Sessionization edge cases: gap exactly at threshold, single-event
users, interleaved users, stat rollups."""

from __future__ import annotations

from datetime import datetime, timezone

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators import (
    sessionize as SS,
)


def _ts(s):
    return datetime.fromtimestamp(1704067200 + s, tz=timezone.utc).replace(tzinfo=None)


def _events(spark, rows):
    return spark.createDataFrame(
        [(eid, _ts(sec), uid, et, val) for (eid, sec, uid, et, val) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_gap_boundary(spark):
    gap = 100
    ev = _events(spark, [
        (1, 0, 7, "a", 1.0),
        (2, 100, 7, "a", 1.0),   # exactly gap → SAME session (strict >)
        (3, 201, 7, "b", 1.0),   # 101 > gap → new session
        (4, 1000, 8, "a", 2.0),  # other user: own numbering
    ])
    got = {r.event_id: (r.session_seq, r.session_id) for r in SS.sessionize(ev, gap_s=gap).collect()}
    assert got == {1: (1, "7-1"), 2: (1, "7-1"), 3: (2, "7-2"), 4: (1, "8-1")}


def test_stats_rollup(spark):
    ev = _events(spark, [
        (1, 0, 7, "a", 1.5),
        (2, 10, 7, "b", 2.5),
        (3, 10_000, 7, "a", 1.0),
    ])
    stats = {(r.user_id, r.session_seq): r for r in SS.session_stats(ev, gap_s=100).collect()}
    s1 = stats[(7, 1)]
    assert (s1.n_events, s1.n_event_types, s1.value_sum) == (2, 2, 4.0)
    assert s1.end_us - s1.start_us == 10_000_000
    s2 = stats[(7, 2)]
    assert (s2.n_events, s2.value_sum) == (1, 1.0)


def test_funnel_first_touch_ordering(spark):
    from pyspark.sql import functions as F

    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.operators.sessionize import (
        funnel_counts,
    )

    rows = [
        # u1 completes in order
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-01 02:00:00"),
        # u2 clicks BEFORE first view, later click missing -> stops at view
        (2, "click", "2024-01-01 00:00:00"),
        (2, "view", "2024-01-01 01:00:00"),
        # u3 views and clicks, never purchases
        (3, "view", "2024-01-01 00:00:00"),
        (3, "click", "2024-01-01 00:30:00"),
        # u4 purchases without viewing -> never enters the funnel
        (4, "purchase", "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.stage: (r.stage_idx, r.n_users) for r in funnel_counts(ev).collect()}
    assert got == {"view": (1, 3), "click": (2, 2), "purchase": (3, 1)}
