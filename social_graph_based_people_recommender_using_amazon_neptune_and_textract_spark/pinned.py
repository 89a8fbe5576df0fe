"""Process-level registry of pinned (persisted) auxiliary relations.

The reference keeps its auxiliary structures in managed services with
explicit lifecycles — the ES index lives until dropped
(upsert_bizcard_to_es.py:77-90), Neptune holds the graph until truncated.
The Spark-native equivalents (inverted-index postings, the symmetrized
edge view, LSH shingle bags) are persisted DataFrames — and a bare
``df.persist()`` inside a query function leaks storage in a long-lived
session because the caller has no handle to release it.

This registry is that handle:

- ``pinned(key, build, token=None)`` — return the cached relations for
  ``key``, building + persisting them exactly once per process. Keys
  embed the input DataFrame's ``semanticHash()``, so the same logical
  corpus reuses the same index while a different corpus builds its own
  (an ES index per distinct document set).
- ``release(key, token=None)`` / ``release_all()`` — unpersist and
  forget; the explicit DROP INDEX. Long-lived servers call this on
  corpus swap; tests assert storage returns to baseline.

Persist is lazy: pinning costs nothing until the first action touches the
relation, so registering an index for a corpus that is never queried with
scoring terms never computes it.

Scalar memos ride the same lifecycle: ``memo(key, compute)`` caches
driver-side scalars derived from a pinned corpus (BM25 collection stats,
whale-degree probes). A memo that declares its ``parent`` pinned key is
evicted precisely when that key is released; memos without a declared
parent are dropped on ANY successful release (over-invalidation is the
safe direction — recompute is one small aggregate). A ``release`` of a
key that was never pinned is a pure no-op: it returns False and
invalidates nothing. ``_MEMOS`` is LRU-bounded at ``MEMO_CAP`` so a
server that scores transient unpinned corpora forever (and never
releases anything) still has bounded driver memory; eviction just means
recompute on next use.

Aliasing caveat and the ``token`` remedy: keys embed
``DataFrame.semanticHash()`` — a 32-bit hash of the LOGICAL plan, not the
data. Re-reading the same path after its files were replaced in place
yields the identical plan hash, so a long-lived server swapping a corpus
*in place* would otherwise be served a MIXED snapshot: Spark's
``recacheByPath`` re-reads cached relations from the new files while the
driver-side memos keep the old snapshot's statistics — an inconsistency
worse than either clean snapshot. ``token`` is the caller-supplied
snapshot version (ingest batch
id, table snapshot, deploy stamp) mixed into the registry key: pin with
``token="v2"`` after the swap and a fresh index builds immediately — no
``release_all()`` required, and the old snapshot's index remains
releasable under its own token. Callers that version their corpus PATHS
(immutable table locations, the idiomatic Spark shape) never need either
procedure.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable

from pyspark.sql import DataFrame

_REGISTRY: dict[Hashable, tuple[DataFrame, ...]] = {}
#: effective pinned key -> tracked-checkpoint RDD ids its build created
#: (see :mod:`.checkpoints`). A pin backed by a tracked checkpoint is
#: unrecomputable once that checkpoint is freed, so the two registries
#: release together: ``release``/``release_all`` here free the backing
#: ids, and ``checkpoints.release_all`` evicts these pins FIRST instead
#: of leaving poisoned entries behind (r6 ADVICE on
#: pinned_landmark_distances — enforced for every pin, not documented
#: per-call-site).
_CKPT_BACKED: dict[Hashable, frozenset[int]] = {}
_MEMOS: dict[Hashable, object] = {}
#: pinned key -> the memo keys derived from it (precise eviction set).
_MEMO_DEPS: dict[Hashable, set[Hashable]] = {}
#: LRU bound on driver-side scalar memos. A long-lived server that scores
#: transient unpinned corpora (and never calls release) would otherwise
#: grow _MEMOS without limit; each entry is a tiny stats scalar, so 1024
#: is generous while keeping worst-case growth bounded. Eviction is
#: recompute-on-next-use, never a correctness event.
MEMO_CAP = 1024

#: Process-level pin telemetry (r8 verdict item 8: 10 new pins nudged
#: five warm queries +0.3 s and the pressure was unattributable).
#: hits = registry lookups served from cache; builds = build+persist
#: executions; releases = entries explicitly released (any hook).
#: ``stats()`` snapshots these plus the live counts; bench.py surfaces
#: the snapshot as the ``pins`` block so pressure regressions are
#: attributable round-over-round.
_STATS = {"hits": 0, "builds": 0, "releases": 0}

#: Effective keys touched (hit OR build) since the last snapshot —
#: consumer-set telemetry for schedulers that release a pin after its
#: last consumer has run (bench.py's cold pass, r11 verdict item 3:
#: 61 simultaneously-live pins inflated in-bench cold numbers ~1.7×
#: over standalone). Telemetry only; never consulted for correctness.
#: OPT-IN (r12 ADVICE): logging is dormant until the first
#: ``touched_keys_snapshot`` call arms it, so long-lived processes
#: that never snapshot (anything but a scheduler) accumulate nothing.
_TOUCHES: set[Hashable] = set()
_TOUCH_LOG_ARMED = False


def touched_keys_snapshot(clear: bool = True) -> set[Hashable]:
    """The EFFECTIVE registry keys touched since the last snapshot
    (hits and builds alike). ``clear`` resets the log so per-query
    attribution is a snapshot-run-snapshot bracket. The first call
    arms the (otherwise dormant) touch log."""
    global _TOUCH_LOG_ARMED
    _TOUCH_LOG_ARMED = True
    s = set(_TOUCHES)
    if clear:
        _TOUCHES.clear()
    return s


def stats() -> dict[str, int]:
    """Snapshot of pin telemetry: hits / builds / releases so far plus
    the number of currently live pinned entries and scalar memos."""
    return {**_STATS, "live": len(_REGISTRY), "memos": len(_MEMOS)}


def effective_key(key: Hashable, token: Hashable | None = None) -> Hashable:
    """The registry key actually used for ``(key, token)`` — exposed so
    callers can name the same entry for ``memo(parent=...)`` wiring."""
    return key if token is None else ("__token__", token, key)


def pinned(
    key: Hashable,
    build: Callable[[], tuple[DataFrame, ...]],
    token: Hashable | None = None,
) -> tuple[DataFrame, ...]:
    """Relations for ``key`` (under snapshot ``token``), built + persisted
    at most once per process."""
    k = effective_key(key, token)
    if _TOUCH_LOG_ARMED:
        _TOUCHES.add(k)
    hit = _REGISTRY.get(k)
    if hit is not None:
        _STATS["hits"] += 1
        return hit
    _STATS["builds"] += 1
    from . import checkpoints

    before = checkpoints.live_ids()
    dfs = tuple(df.persist() for df in build())
    # Before/after diffing over-attributes when build() itself pins an
    # inner entry (the inner pin's checkpoints would land in the OUTER
    # backing set, and releasing the outer pin would free checkpoints
    # the still-registered inner pin needs — the poisoned-pin failure
    # this registry exists to prevent). Subtract ids already owned by
    # any other registered pin.
    owned = set().union(set(), *_CKPT_BACKED.values())
    backing = checkpoints.live_ids() - before - owned
    if backing:
        _CKPT_BACKED[k] = frozenset(backing)
    _REGISTRY[k] = dfs
    return dfs


def pinned_layout(
    spark, key: Hashable, build: Callable[[], None]
) -> None:
    """Run ``build`` — a DISK-layout materialization (partitioned /
    range-clustered / Z-ordered rewrite) — at most once per process per
    key, riding the pin lifecycle: ``release``/``release_all`` forget
    the key, so the next caller rebuilds, which is exactly how the
    bench's cold pass charges index builds. Unlike ``pinned``, nothing
    data-sized is persisted in memory: the registry entry is a 1-row
    marker, the layout lives on disk, and callers re-read the PATH —
    so layout-dependent plan features (PartitionFilters, footer-stats
    skipping) stay in the served plan instead of being masked by an
    InMemoryRelation.

    Without this, a layout round-trip query pays the full table rewrite
    on EVERY execution — the r8 sf1 bench showed events_day_pruned's
    warm number (4.97 s) was ~all rewrite, drowning the pruned read the
    query exists to demonstrate."""

    def _build():
        build()
        return (spark.range(1),)

    pinned(key, _build)


def memo(
    key: Hashable,
    compute: Callable[[], object],
    parent: Hashable | None = None,
) -> object:
    """Driver-side scalar derived from a pinned corpus, computed at most
    once per process. ``parent`` is the EFFECTIVE pinned key the scalar
    derives from (see ``effective_key``): declared parents get precise
    eviction on that key's release; undeclared memos are cleared on any
    successful release."""
    if key in _MEMOS:
        _MEMOS[key] = _MEMOS.pop(key)  # refresh LRU position
    else:
        _MEMOS[key] = compute()
        while len(_MEMOS) > MEMO_CAP:
            evicted = next(iter(_MEMOS))
            del _MEMOS[evicted]
            for deps in _MEMO_DEPS.values():
                deps.discard(evicted)
    if parent is not None:
        _MEMO_DEPS.setdefault(parent, set()).add(key)
    return _MEMOS[key]


def release(key: Hashable, token: Hashable | None = None) -> bool:
    """Unpersist and forget one pinned entry; True if it existed.

    Memo eviction: the released key's declared memos are dropped
    precisely; memos with NO declared parent are dropped too (their
    provenance is unknown — over-invalidation is the safe direction).
    Releasing a key that was never pinned is a pure no-op (returns False,
    invalidates nothing — a previous revision wiped every memo here).
    Unpersist is blocking so storage accounting is deterministic for
    callers that assert on it."""
    return release_effective(effective_key(key, token))


def release_effective(k: Hashable, drop_orphan_memos: bool = True) -> bool:
    """``release`` addressed by the EFFECTIVE registry key (the form
    ``touched_keys_snapshot`` and ``pinned_keys`` return) — no token
    re-wrapping, so a scheduler can release exactly what it observed.

    ``drop_orphan_memos=False`` keeps memos with NO declared parent
    alive (declared-parent memos are still evicted with their pin).
    The orphan wipe exists for corpus SWAPS, where a memo of unknown
    provenance might describe the old snapshot; a scheduler releasing
    dead pins over an IMMUTABLE corpus (bench.py's cold pass) would
    otherwise wipe every orphan memo once per released pin and force
    repeated driver-side recomputes — each one a Spark job inside a
    timed section."""
    dfs = _REGISTRY.pop(k, None)
    if dfs is None:
        return False
    for df in dfs:
        df.unpersist(blocking=True)
    backing = _CKPT_BACKED.pop(k, None)
    if backing:
        from . import checkpoints

        checkpoints.free(dfs[0].sparkSession, backing, blocking=True)
    for mk in _MEMO_DEPS.pop(k, set()):
        _MEMOS.pop(mk, None)
    if drop_orphan_memos:
        tracked = set().union(set(), *_MEMO_DEPS.values())
        for mk in list(_MEMOS):
            if mk not in tracked:
                del _MEMOS[mk]
    # Prune dependency entries whose memo set has emptied (their parent
    # key may never be released again; the empty set would linger).
    for pk in [pk for pk, deps in _MEMO_DEPS.items() if not deps]:
        del _MEMO_DEPS[pk]
    _STATS["releases"] += 1
    return True


def release_all() -> int:
    """Unpersist and forget every pinned entry (and all scalar memos);
    returns how many relations were released."""
    n = 0
    for k in list(_REGISTRY):
        dfs = _REGISTRY.pop(k)
        for df in dfs:
            df.unpersist(blocking=True)
        backing = _CKPT_BACKED.pop(k, None)
        if backing:
            from . import checkpoints

            checkpoints.free(dfs[0].sparkSession, backing, blocking=True)
        n += 1
        _STATS["releases"] += 1
    _MEMOS.clear()
    _MEMO_DEPS.clear()
    return n


def evict_checkpoint_backed() -> int:
    """Release every pin whose build created tracked checkpoints —
    called by ``checkpoints.release_all`` so a blanket checkpoint sweep
    can never leave an unrecomputable (poisoned) pin behind. Returns
    the number of pins evicted."""
    n = 0
    for k in list(_CKPT_BACKED):
        dfs = _REGISTRY.pop(k, None)
        _CKPT_BACKED.pop(k, None)  # ids are about to be swept anyway
        if dfs is None:
            continue
        for df in dfs:
            df.unpersist(blocking=True)
        for mk in _MEMO_DEPS.pop(k, set()):
            _MEMOS.pop(mk, None)
        n += 1
        _STATS["releases"] += 1
    return n


def pinned_keys() -> set[Hashable]:
    return set(_REGISTRY)
