"""Generate COVERAGE.md's rotation-cadence table from CORRECTNESS_r*.json.

Run from the repo root:  python tools/rotation_report.py
Prints a markdown table (query -> last driver-green round -> current
registry position) plus a staleness summary, using the SAME evidence
parser the registry ordering uses (``__spark_entry__._driver_evidence``),
so the table and the rotation can never disagree.
"""
from __future__ import annotations

import importlib.util
import re
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent


def registry_names() -> list[str]:
    """Canonical registry order, parsed textually (no Spark needed)."""
    names = []
    for line in (HERE / "__spark_entry__.py").read_text().splitlines():
        m = re.match(r'\s+"([a-z0-9_]+)": _q_[a-z0-9_]+,', line)
        if m:
            names.append(m.group(1))
    return names


def main() -> None:
    sys.path.insert(0, str(HERE))
    spec = importlib.util.spec_from_file_location(
        "_entry_rotation", HERE / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    evidence = mod._driver_evidence()
    names = registry_names()
    # Same rows-only rule as _rotate (r10): entries with no oracle twin
    # by nature sort to the registry tail, never burning a window slot.
    checkable = set(mod.oracle_sql())

    def sort_key(item):
        idx, name = item
        if name not in checkable:
            return (float("inf"), idx)
        rnd = float(evidence.get(name, 0))
        if name == mod._FLAGSHIP and rnd:
            rnd = 0.5
        return (rnd, idx)

    ordered = [n for _, n in sorted(enumerate(names), key=sort_key)]
    pos = {n: i + 1 for i, n in enumerate(ordered)}

    print("| Query | Last driver-green | Registry position (r-next) | In window |")
    print("|---|---|---|---|")
    for n in sorted(names, key=lambda n: (evidence.get(n, 0), pos[n])):
        last = f"r{evidence[n]}" if n in evidence else "never"
        print(f"| {n} | {last} | {pos[n]} | {'yes' if pos[n] <= 50 else ''} |")

    never = [n for n in names if n not in evidence and n in checkable]
    rows_only = [n for n in names if n not in checkable]
    by_round: dict[int, int] = {}
    for n in names:
        by_round[evidence.get(n, 0)] = by_round.get(evidence.get(n, 0), 0) + 1
    summary = ", ".join(
        f"{'never' if r == 0 else f'r{r}'}: {c}" for r, c in sorted(by_round.items())
    )
    print(f"\n{len(names)} queries — last-green distribution: {summary}.")
    if never:
        print(f"Never driver-verified ({len(never)}), all inside the next window: "
              + ", ".join(never))
    if rows_only:
        print(
            f"Declared rows-only ({len(rows_only)}), pinned to the registry "
            "tail (no window slot): " + ", ".join(rows_only)
        )


if __name__ == "__main__":
    sys.exit(main())
