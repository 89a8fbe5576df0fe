"""O7 as a true streaming stateful operator: the per-image processing
status machine (START → PROCESS → END) via ``applyInPandasWithState``.

The reference keeps this state in DynamoDB — each pipeline stage calls
``update_item`` keyed by image_id (trigger_…:50-92, get_text_…:103-145),
so the table always shows each image's furthest stage. In a streaming
world status events arrive across micro-batches and possibly out of
order (Kinesis resharding, retries), so the operator must be *monotone*:
a late PROCESS after END must not regress the state.

State per key: (rank, mts) with rank START=0 < PROCESS=1 < END=2; an
incoming event wins iff (rank, mts) is greater. One row per updated key
per micro-batch is emitted (update semantics), which downstream merges
into the keyed status table.

This is the one operator family in the engine that is NOT expressible as
a single SQL query over a static table — its contract is incremental
(bounded state, per-batch emission) — though its *converged* result is,
which is what the driver's oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATUS_RANK = {"START": 0, "PROCESS": 1, "END": 2}
RANK_STATUS = {v: k for k, v in STATUS_RANK.items()}

OUTPUT_SCHEMA = "image_id string, status string, rank int, mts string"
STATE_SCHEMA = "rank int, mts string"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rank, mts = state.get if state.exists else (-1, "")
    for pdf in pdfs:
        for s, m in zip(pdf["status"], pdf["mts"]):
            r = STATUS_RANK.get(s, -1)
            if (r, m) > (rank, mts):
                rank, mts = r, m
    state.update((rank, mts))
    yield pd.DataFrame(
        [(key[0], RANK_STATUS.get(rank, "UNKNOWN"), rank, mts)],
        columns=["image_id", "status", "rank", "mts"],
    )


def track_status(status_events: DataFrame) -> DataFrame:
    """Streaming (image_id, status, mts) → per-key current status.
    Works on a streaming DataFrame; emits update rows per micro-batch."""
    return status_events.groupBy("image_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class StatusTracker:
    """Wires track_status between a JSON landing dir and the keyed status
    table; checkpointed state survives across runs, so later waves of
    events keep advancing (never regressing) each image's status."""

    def __init__(self, spark, warehouse_dir: str) -> None:
        from .table import KeyedParquetTable

        self.spark = spark
        self.table = KeyedParquetTable(
            spark,
            f"{warehouse_dir.rstrip('/')}/status_machine",
            keys=["image_id"],
            order_by=["rank", "mts"],
        )

    def run_available_now(
        self, landing_dir: str, checkpoint_dir: str, timeout_s: int = 300
    ) -> None:
        events = self.spark.readStream.schema(
            "image_id string, status string, mts string"
        ).json(landing_dir)
        current = track_status(events)

        def commit(batch: DataFrame, batch_id: int) -> None:
            self.table.merge(batch)

        q = (
            current.writeStream.foreachBatch(commit)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError("status stream did not drain in time")
        if q.exception() is not None:
            raise q.exception()

    def current(self) -> DataFrame | None:
        return self.table.read()
