"""Watermarked windowed aggregation: converged counts, replay
idempotency, and genuine late-data eviction across checkpointed runs."""

from __future__ import annotations

from datetime import datetime, timezone

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.windows import (
    WindowedCounter,
)


def _ts(hour, minute=0):
    return datetime(2024, 1, 1, hour, minute, tzinfo=timezone.utc).replace(tzinfo=None)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _counts(counter):
    return {
        (r.window_start_us, r.event_type): r.n_events
        for r in counter.current().collect()
    }


def test_windowed_counts_and_late_data(spark, tmp_path):
    landing, ckpt, wh = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "wh")
    counter = WindowedCounter(spark, wh)

    _write(spark, landing, [
        (1, _ts(0, 10), 7, "click", 1.0),
        (2, _ts(0, 50), 7, "click", 1.0),
        (3, _ts(1, 5), 8, "view", 2.0),
    ])
    counter.run_available_now(landing, ckpt)
    h0 = int(_ts(0).replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    h1 = int(_ts(1).replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    assert _counts(counter) == {(h0, "click"): 2, (h1, "view"): 1}

    # wave 2: event at hour 6 advances the watermark to 4:00; then wave 3
    # delivers an hour-0 event — beyond the 2h watermark → dropped.
    _write(spark, landing, [(4, _ts(6), 9, "click", 1.0)])
    counter.run_available_now(landing, ckpt)
    _write(spark, landing, [(5, _ts(0, 30), 7, "click", 1.0)])
    counter.run_available_now(landing, ckpt)

    got = _counts(counter)
    h6 = int(_ts(6).replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    assert got[(h6, "click")] == 1
    assert got[(h0, "click")] == 2, "late event beyond watermark must not count"


def test_windowed_replay_converges(spark, tmp_path):
    landing, wh = str(tmp_path / "in"), str(tmp_path / "wh")
    counter = WindowedCounter(spark, wh)
    _write(spark, landing, [
        (1, _ts(2), 7, "click", 1.0),
        (2, _ts(2, 30), 7, "click", 1.0),
    ])
    counter.run_available_now(landing, str(tmp_path / "ck1"))
    first = _counts(counter)
    # full replay with a fresh checkpoint → merge converges, no doubling
    counter.run_available_now(landing, str(tmp_path / "ck2"))
    assert _counts(counter) == first
