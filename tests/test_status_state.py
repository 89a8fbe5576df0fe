"""Stateful status machine (O7 streaming form): monotone transitions,
checkpointed state across waves, out-of-order immunity."""

from __future__ import annotations

import json
import os

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.status_state import (
    StatusTracker,
)


def _write_wave(dirpath: str, name: str, events: list[dict]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w", encoding="utf-8") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _status(tracker):
    return {r.image_id: (r.status, r.mts) for r in tracker.current().collect()}


def test_state_advances_across_waves(spark, tmp_path):
    landing, ckpt, wh = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "wh")
    tracker = StatusTracker(spark, wh)

    _write_wave(landing, "w1.json", [
        {"image_id": "a.jpg", "status": "START", "mts": "20240101000000"},
        {"image_id": "b.jpg", "status": "START", "mts": "20240101000000"},
    ])
    tracker.run_available_now(landing, ckpt)
    assert _status(tracker) == {
        "a.jpg": ("START", "20240101000000"),
        "b.jpg": ("START", "20240101000000"),
    }

    # wave 2: a advances twice; b only to PROCESS — state from wave 1 is
    # restored from the checkpoint, not recomputed
    _write_wave(landing, "w2.json", [
        {"image_id": "a.jpg", "status": "PROCESS", "mts": "20240101000001"},
        {"image_id": "a.jpg", "status": "END", "mts": "20240101000002"},
        {"image_id": "b.jpg", "status": "PROCESS", "mts": "20240101000001"},
    ])
    tracker.run_available_now(landing, ckpt)
    assert _status(tracker) == {
        "a.jpg": ("END", "20240101000002"),
        "b.jpg": ("PROCESS", "20240101000001"),
    }


def test_out_of_order_never_regresses(spark, tmp_path):
    landing, ckpt, wh = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "wh")
    tracker = StatusTracker(spark, wh)
    _write_wave(landing, "w1.json", [
        {"image_id": "x.jpg", "status": "END", "mts": "20240101000005"},
    ])
    tracker.run_available_now(landing, ckpt)
    # late, lower-rank events arrive after END
    _write_wave(landing, "w2.json", [
        {"image_id": "x.jpg", "status": "PROCESS", "mts": "20240101000009"},
        {"image_id": "x.jpg", "status": "START", "mts": "20240101000010"},
    ])
    tracker.run_available_now(landing, ckpt)
    assert _status(tracker) == {"x.jpg": ("END", "20240101000005")}


def test_single_run_multiple_events_per_key(spark, tmp_path):
    landing, ckpt, wh = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "wh")
    tracker = StatusTracker(spark, wh)
    _write_wave(landing, "w.json", [
        {"image_id": "m.jpg", "status": "START", "mts": "20240101000000"},
        {"image_id": "m.jpg", "status": "PROCESS", "mts": "20240101000001"},
        {"image_id": "m.jpg", "status": "END", "mts": "20240101000002"},
        {"image_id": "n.jpg", "status": "START", "mts": "20240101000003"},
    ])
    tracker.run_available_now(landing, ckpt)
    assert _status(tracker) == {
        "m.jpg": ("END", "20240101000002"),
        "n.jpg": ("START", "20240101000003"),
    }
