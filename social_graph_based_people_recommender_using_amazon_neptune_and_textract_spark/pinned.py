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

Scalar memos ride the same lifecycle: ``memo(key, compute)`` caches
driver-side scalars derived from a pinned corpus (BM25 collection stats,
whale-degree probes). They are invalidated by the SAME ``release``/
``release_all`` paths as the relations they derive from, so the documented
corpus-swap procedure (release, re-pin) cannot serve stale statistics.

Aliasing caveat (documented limitation): keys embed
``DataFrame.semanticHash()`` — a 32-bit hash of the LOGICAL plan, not the
data. Re-reading the same path after its files were replaced in place
yields the identical plan hash, so a long-lived server swapping a corpus
*in place* MUST call ``release_all()`` (or ``release`` on the affected
keys) before re-querying; otherwise the old persisted index and memoized
stats are served. Callers that version their corpora can avoid the
procedure entirely by baking a snapshot token into the path (the idiomatic
Spark shape: immutable, versioned table locations).
"""

from __future__ import annotations

from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame

_REGISTRY: dict[Hashable, tuple[DataFrame, ...]] = {}
_MEMOS: dict[Hashable, object] = {}


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


def memo(key: Hashable, compute: Callable[[], object]) -> object:
    """Driver-side scalar derived from a pinned corpus, computed at most
    once per process and cleared by ``release``/``release_all`` alongside
    the relations it derives from."""
    if key not in _MEMOS:
        _MEMOS[key] = compute()
    return _MEMOS[key]


def release(key: Hashable) -> bool:
    """Unpersist and forget one pinned entry; True if it existed.
    Also drops every scalar memo (memo→relation dependencies are not
    tracked; over-invalidation is the safe direction — recompute is one
    small aggregate). Unpersist is blocking so storage accounting is
    deterministic for callers that assert on it."""
    _MEMOS.clear()
    dfs = _REGISTRY.pop(key, None)
    if dfs is None:
        return False
    for df in dfs:
        df.unpersist(blocking=True)
    return True


def release_all() -> int:
    """Unpersist and forget every pinned entry (and all scalar memos);
    returns how many relations were released."""
    n = 0
    for key in list(_REGISTRY):
        release(key)
        n += 1
    _MEMOS.clear()
    return n


def pinned_keys() -> set[Hashable]:
    return set(_REGISTRY)
