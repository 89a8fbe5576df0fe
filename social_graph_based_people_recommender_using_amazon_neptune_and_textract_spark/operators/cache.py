"""Query-result cache (O10) — the engine-side equivalent of the
reference's Redis layer (es_search_bizcard.py:77-89,
neptune_recommend_bizcard.py:87-99).

Semantics replicated exactly:
- key shape ``{prefix}:query_id:{md5(normalized query)}`` (+ ``:limit:{n}``
  for search, es_search_bizcard.py:77-78; lowercased user for PYMK,
  neptune_recommend_bizcard.py:87);
- TTL 600 s;
- ``nx=True`` set-if-absent, and empty results are never cached
  (es_search_bizcard.py:87-88 guards ``if ret``).

This caches *collected rows* (the reference caches the serialized HTTP
payload) — Spark-side plan caching is a different mechanism
(``df.persist``, used inside operators). Not correctness-bearing; it is
an app-layer accelerator, so there is no oracle query for it — unit
tests pin the contract instead.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, Row

DEFAULT_TTL_S = 600  # ex=10*60 in the reference


def search_cache_key(query: str, user: str | None, limit: int) -> str:
    raw = f"q={query or ''}&u={user or ''}"
    return f"es:query_id:{hashlib.md5(raw.encode()).hexdigest()}:limit:{limit}"


def pymk_cache_key(user_name: str) -> str:
    return f"pymk:query_id:{hashlib.md5(user_name.lower().encode()).hexdigest()}"


class ResultCache:
    """TTL + set-if-absent result cache keyed like the reference."""

    def __init__(self, ttl_s: int = DEFAULT_TTL_S, clock: Callable[[], float] = time.monotonic):
        self.ttl_s = ttl_s
        self._clock = clock
        self._store: dict[str, tuple[float, list[Row]]] = {}
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> list[Row] | None:
        entry = self._store.get(key)
        if entry is None:
            self.misses += 1
            return None
        expires, rows = entry
        if self._clock() >= expires:
            del self._store[key]
            self.misses += 1
            return None
        self.hits += 1
        return rows

    def set_nx(self, key: str, rows: list[Row]) -> bool:
        """Set-if-absent; empty results never cached (reference guard)."""
        if not rows or key in self._store:
            return False
        self._store[key] = (self._clock() + self.ttl_s, rows)
        return True

    def get_or_compute(self, key: str, compute: Callable[[], DataFrame]) -> list[Row]:
        cached = self.get(key)
        if cached is not None:
            return cached
        rows = compute().collect()
        self.set_nx(key, rows)
        return rows
