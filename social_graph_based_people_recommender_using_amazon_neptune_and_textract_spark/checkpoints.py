"""Tracked ``localCheckpoint`` scratch — the storage-hygiene counterpart
of :mod:`.pinned` for ITERATIVE operators.

The iterative loops (connected components, k-hop BFS, shard packing) use
``localCheckpoint`` to truncate lineage each round — the standard device
for iterative DataFrame algorithms. But ``localCheckpoint`` persists an
RDD with NO release handle: ``DataFrame.unpersist()`` does not touch it,
``spark.catalog.clearCache()`` does not either, and the blocks live until
driver GC + ContextCleaner get around to them. A batch job never notices;
a long-lived server looping over clustering jobs accumulates one orphan
RDD per round per job (the round-4 verdict's storage-accounting finding).

This module is the missing handle:

- ``checkpoint(df)`` — eager ``localCheckpoint`` that records which new
  persistent RDD ids the call created; returns ``(checkpointed_df, ids)``.
- ``free(spark, ids)`` — unpersist exactly those ids NOW. Iterative loops
  call this on round N-1's scratch as soon as round N is materialized, so
  in-flight storage stays O(1) checkpoints instead of O(rounds).
- ``release_all(spark)`` — unpersist every tracked id still live: the
  explicit end-of-job cleanup for the FINAL result's checkpoint (which the
  operator must leave persisted because the returned DataFrame reads it).

Only call ``free``/``release_all`` after the derived DataFrames are fully
consumed (collected, written, or released): a freed local checkpoint
cannot be recomputed — that is the point of lineage truncation.

Id tracking is a before/after diff of the JVM's persistent-RDD map around
the ``localCheckpoint`` call; correct for the driver-side single-threaded
loops that use it (concurrent persists from another thread would be
misattributed — none of the engine's operators do that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: RDD ids created by ``checkpoint`` and not yet freed.
_LIVE: set[int] = set()


def _persistent_ids(spark: SparkSession) -> set[int]:
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


def checkpoint(df: DataFrame) -> tuple[DataFrame, frozenset[int]]:
    """Eager ``localCheckpoint`` with a release handle: returns the
    checkpointed DataFrame and the set of persistent-RDD ids the call
    created (pass to ``free`` when the round's scratch is dead)."""
    spark = df.sparkSession
    before = _persistent_ids(spark)
    out = df.localCheckpoint(eager=True)
    ids = frozenset(_persistent_ids(spark) - before)
    _LIVE.update(ids)
    return out, ids


def free(spark: SparkSession, ids, blocking: bool = True) -> None:
    """Unpersist the tracked ids (no-op for ids already collected by the
    ContextCleaner). DataFrames built on them become unrecomputable."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        _LIVE.discard(i)
        if jmap.containsKey(i):
            jmap.get(i).unpersist(blocking)


def release_all(spark: SparkSession, blocking: bool = True) -> int:
    """Free every tracked checkpoint still live (end-of-job hygiene hook;
    see module docstring for when this is safe). Returns how many ids
    were tracked.

    Pins built on tracked checkpoints (see ``pinned._CKPT_BACKED``) are
    evicted FIRST: a freed local checkpoint is unrecomputable, so a pin
    reading one would otherwise survive as a poisoned registry entry
    that crashes the next query (r6 ADVICE, pinned_landmark_distances)."""
    from . import pinned as _pinned

    _pinned.evict_checkpoint_backed()
    ids = list(_LIVE)
    free(spark, ids, blocking=blocking)
    return len(ids)


def live_ids() -> frozenset[int]:
    return frozenset(_LIVE)
