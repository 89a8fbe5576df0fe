"""Idempotent keyed parquet table — the engine's upsert sink (O6 ES
``_id`` overwrite, O7 DynamoDB update_item, O31 vertex property
overwrite).

Plain parquet has no MERGE, and overwriting a path while reading it is
undefined, so the table is a sequence of immutable snapshots plus an
atomically-replaced pointer file — a single-log simplification of the
Delta/Iceberg commit protocol:

    <root>/snap-000001/...parquet
    <root>/snap-000002/...parquet
    <root>/_LATEST            ← contains "snap-000002"

``merge(batch)`` reads the current snapshot, unions the batch, keeps the
newest row per key under the caller's declared total order
(operators/upsert.latest_by_key), and writes the next snapshot. Because
the merge is a pure function of (current-state, batch-rows) and the order
is total, replaying a batch after a crash converges to the same state —
at-least-once delivery + idempotent merge = effective exactly-once,
exactly the reference's deterministic-id upsert argument (SURVEY §2.5).

Scale: a snapshot rewrite is O(table); at warehouse scale this sink is
swapped for a real Delta/Iceberg MERGE (same keyed semantics, log-
structured). The interface is the contract, the snapshot layout is the
local implementation.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import latest_by_key

_POINTER = "_LATEST"


class KeyedParquetTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: Sequence[str],
        order_by: Sequence[str],
        keep_snapshots: int = 2,
    ) -> None:
        self.spark = spark
        self.root = root
        self.keys = list(keys)
        self.order_by = list(order_by)
        self.keep_snapshots = keep_snapshots
        os.makedirs(root, exist_ok=True)

    # -- snapshot bookkeeping ------------------------------------------
    def _pointer_path(self) -> str:
        return os.path.join(self.root, _POINTER)

    def current_snapshot(self) -> str | None:
        try:
            with open(self._pointer_path(), encoding="utf-8") as f:
                name = f.read().strip()
            return name or None
        except FileNotFoundError:
            return None

    def _commit(self, name: str) -> None:
        tmp = self._pointer_path() + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(name)
        os.replace(tmp, self._pointer_path())  # atomic on POSIX

    def _gc(self, latest: str) -> None:
        snaps = sorted(
            d for d in os.listdir(self.root) if d.startswith("snap-")
        )
        for d in snaps[: -self.keep_snapshots]:
            if d != latest:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    # -- public API ------------------------------------------------------
    def read(self) -> DataFrame | None:
        snap = self.current_snapshot()
        if snap is None:
            return None
        return self.spark.read.parquet(os.path.join(self.root, snap))

    def merge(self, batch: DataFrame) -> None:
        current = self.read()
        merged = batch if current is None else current.unionByName(batch)
        merged = latest_by_key(merged, self.keys, self.order_by)
        snap = self.current_snapshot()
        nxt = f"snap-{(int(snap.split('-')[1]) + 1) if snap else 1:06d}"
        merged.write.mode("overwrite").parquet(os.path.join(self.root, nxt))
        self._commit(nxt)
        self._gc(nxt)
