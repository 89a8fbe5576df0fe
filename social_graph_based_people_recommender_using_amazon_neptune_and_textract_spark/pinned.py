"""Process-level registry of pinned (persisted) auxiliary relations.

The reference keeps its auxiliary structures in managed services with
explicit lifecycles — the ES index lives until dropped
(upsert_bizcard_to_es.py:77-90), Neptune holds the graph until truncated.
The Spark-native equivalents (inverted-index postings, the symmetrized
edge view, LSH shingle bags) are persisted DataFrames — and a bare
``df.persist()`` inside a query function leaks storage in a long-lived
session because the caller has no handle to release it.

This registry is that handle:

- ``pinned(key, build)`` — return the cached relations for ``key``,
  building + persisting them exactly once per process. Keys embed the
  input DataFrame's ``semanticHash()``, so the same logical corpus reuses
  the same index while a different corpus builds its own (an ES index per
  distinct document set).
- ``release(key)`` / ``release_all()`` — unpersist and forget; the
  explicit DROP INDEX. Long-lived servers call this on corpus swap;
  tests assert storage returns to baseline.

Persist is lazy: pinning costs nothing until the first action touches the
relation, so registering an index for a corpus that is never queried with
scoring terms never computes it.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame

_REGISTRY: dict[Hashable, tuple[DataFrame, ...]] = {}


def pinned(
    key: Hashable, build: Callable[[], tuple[DataFrame, ...]]
) -> tuple[DataFrame, ...]:
    """Relations for ``key``, built + persisted at most once per process."""
    hit = _REGISTRY.get(key)
    if hit is not None:
        return hit
    dfs = tuple(df.persist() for df in build())
    _REGISTRY[key] = dfs
    return dfs


def release(key: Hashable) -> bool:
    """Unpersist and forget one pinned entry; True if it existed."""
    dfs = _REGISTRY.pop(key, None)
    if dfs is None:
        return False
    for df in dfs:
        df.unpersist()
    return True


def release_all() -> int:
    """Unpersist and forget every pinned entry; returns how many."""
    n = 0
    for key in list(_REGISTRY):
        release(key)
        n += 1
    return n


def pinned_keys() -> set[Hashable]:
    return set(_REGISTRY)
