"""Attestation census — derives the evidence-freshness ledger from the
committed CORRECTNESS_r*.json artifacts instead of hand-tracking it
(VERDICT r13 What's-wrong #3: the hand count said 370, recomputing
said 346 — this script is the single source of truth from now on).

For every name in the current registry it counts green driver
attestations across all CORRECTNESS_r*.json files on disk and prints:

* total registry names / names with >= 1 green driver row / never-
  attested names (should be exactly the current round's not-yet-graded
  fresh builds);
* names with EXACTLY ONE attestation (awaiting their first
  re-attestation since the original grade) — the number COVERAGE.md
  quotes each round;
* the per-round green/total tally so the rotation cadence is visible.

Usage: python scripts_attestation_census.py [--names]
"""

from __future__ import annotations

import glob
import json
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def green(row: dict) -> bool:
    """A green driver row: no error and every recorded check true.
    Rows-only checks (no hash fields) count when err is None and the
    row count matched."""
    if row.get("err") is not None:
        return False
    for k in ("rows_match", "schema_match", "hash_match"):
        if k in row and row[k] is False:
            return False
    return True


def main() -> None:
    import __spark_entry__ as E

    registry = set(E.queries())
    counts: Counter[str] = Counter()
    per_round: dict[str, str] = {}
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        greens = [n for n, row in rows.items() if green(row)]
        per_round[path.rsplit("/", 1)[-1]] = f"{len(greens)}/{len(rows)}"
        counts.update(greens)

    attested = {n for n in registry if counts[n] >= 1}
    never = sorted(registry - attested)
    once = sorted(n for n in registry if counts[n] == 1)
    extra = sorted(n for n in counts if n not in registry)

    print("per-round greens:", per_round)
    print(f"registry names: {len(registry)}")
    print(f"attested >=1:   {len(attested)}")
    print(f"never attested: {len(never)}" + (f" -> {never}" if never else ""))
    print(f"exactly once (awaiting first re-attestation): {len(once)}")
    print(f"retired names with historical greens: {len(extra)}"
          + (f" -> {extra}" if extra else ""))
    if "--names" in sys.argv:
        print("once:", once)


if __name__ == "__main__":
    main()
