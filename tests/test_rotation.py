"""Invariants of the automated least-evidence-first registry rotation
(__spark_entry__._rotate): the driver hash-verifies only the FIRST 50
queries() entries per round, so the ordering IS the evidence policy."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

WINDOW = 50


def test_rotation_window_invariants():
    ordered = list(entrymod.queries())
    evidence = entrymod._driver_evidence()
    window = ordered[:WINDOW]

    # 1. Every never-driver-verified ORACLE-CHECKABLE query outranks
    #    every verified one (or the window is all-never, impossible
    #    here), so no new query can silently ship without a driver row
    #    while verified ones occupy its slot. Declared rows-only
    #    entries (no DuckDB twin by nature) are exempt: they can never
    #    turn hash-green, so they sort to the registry TAIL instead of
    #    permanently burning a window slot (r9 verdict item 1).
    checkable = set(entrymod.oracle_sql())
    never = [
        q
        for q in ordered
        if q not in evidence and q != entrymod._FLAGSHIP and q in checkable
    ]
    if len(never) <= WINDOW:
        missing = [q for q in never if q not in window]
        assert not missing, f"never-verified outside window: {missing}"

    # 1b. Rows-only entries sit strictly after every checkable entry,
    #     so all 50 window slots stay hash-verifiable.
    rows_only = [q for q in ordered if q not in checkable]
    if rows_only:
        first_rows_only = ordered.index(rows_only[0])
        last_checkable = max(ordered.index(q) for q in ordered if q in checkable)
        assert first_rows_only > last_checkable

    # 2. The flagship is pinned into the window every round.
    assert entrymod._FLAGSHIP in window

    # 3. Verified queries are ordered by ascending last-green round
    #    after the never-verified block (ties keep registration order).
    rounds = [evidence[q] for q in ordered if q in evidence and q != entrymod._FLAGSHIP]
    assert rounds == sorted(rounds)

    # 4. Rotation is a permutation of the canonical registry — nothing
    #    dropped, nothing duplicated.
    assert len(ordered) == len(set(ordered))
    assert set(ordered) == set(entrymod.oracle_sql()) | {
        q for q in ordered if q not in entrymod.oracle_sql()
    }


def test_rows_only_set_is_minimal():
    """Every registered query has an oracle except the declared
    rows-only set — which must stay exactly the HLL sketch query (r5
    verdict item: any future non-oracle query clears the same bar)."""
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert qs - oracles == {"events_monthly_users_hll"}
