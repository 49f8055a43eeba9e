#!/usr/bin/env python
"""Report driver-row coverage per registered query, for refreshing
__spark_entry__._PRIORITY each round.

The driver's correctness gate records only the FIRST 50 entries of
queries() per round, so queries outside that window accumulate no
fresh evidence. This prints, per query: which CORRECTNESS_r*.json
files contain a row for it and whether the last row was green —
queries with NO row ever should lead the next round's priority list.

Usage: python scripts/rotate_priority.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as ent

    registered = list(ent.queries())
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        rounds[rnd] = json.load(open(path))

    never, stale = [], []
    for name in registered:
        seen = {
            rnd: (
                "green"
                if (v := data.get(name)) and (v.get("hash_match") or v.get("err") == "no_oracle")
                else "RED"
            )
            for rnd, data in rounds.items()
            if name in data
        }
        if not seen:
            never.append(name)
        elif list(seen.values())[-1] == "RED":
            stale.append((name, seen))
        print(f"{name:32s} {seen or 'NEVER SAMPLED'}")

    print(f"\n{len(registered)} registered; {len(never)} never sampled, "
          f"{len(stale)} last-sampled red")
    if never:
        print("promote to the front of _PRIORITY:", ", ".join(never))
    for name, seen in stale:
        print(f"investigate {name}: {seen}")


if __name__ == "__main__":
    main()
