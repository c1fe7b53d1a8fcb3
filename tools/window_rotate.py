#!/usr/bin/env python
"""Driver-window rotation helper: compute each registered query's latest
driver-record round from the committed CORRECTNESS_r*.json files and print
the suggested next 50-slot window (changed-first names passed as args, then
oldest-record-first, then never-recorded).

Guards the two failure modes the hand-rolled r9 rotation hit:
- a CORRECTNESS name that no longer exists in the registry (overlap_global
  was renamed overlap_global_demo in r4) is reported, never emitted;
- registered queries with NO driver record ever are surfaced first so no
  query silently stays un-witnessed.

Usage: python tools/window_rotate.py [changed_name ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

WINDOW = 50


def latest_rounds() -> dict[str, int]:
    rounds: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rec = json.load(f)
        except ValueError:
            continue
        for name in rec:
            rounds[name] = max(rounds.get(name, 0), rnd)
    return rounds


def main() -> int:
    changed = list(dict.fromkeys(sys.argv[1:]))
    import __spark_entry__ as em

    registered = list(em.queries())
    oracled = set(em.oracle_sql())
    rounds = latest_rounds()

    stale = sorted(set(rounds) - set(registered))
    if stale:
        print(f"# {len(stale)} CORRECTNESS names no longer registered (renames?): {stale}")
    missing_changed = [n for n in changed if n not in registered]
    if missing_changed:
        print(f"# ERROR: changed names not registered: {missing_changed}")
        return 1

    never = [n for n in registered if n not in rounds and n not in changed]
    # Rows-only queries (no oracle_sql entry) sort LAST regardless of
    # vintage: the driver can only mark them no_oracle, so a window slot
    # spent on one buys no hash evidence (r9 verdict what's-wrong #3) —
    # they only rotate in once every oracle-backed query is fresher.
    backlog = sorted(
        (n for n in registered if n in rounds and n not in changed),
        key=lambda n: (n not in oracled, rounds[n], n),
    )
    window = (changed + never + backlog)[:WINDOW]
    print(f"# suggested {len(window)}-slot window: {len(changed)} changed, "
          f"{len(never)} never-recorded, rest oldest-record-first")
    rows_only_in = [n for n in window if n not in oracled]
    if rows_only_in:
        print(f"# note: {len(rows_only_in)} rows-only entries made the window "
              f"(every oracle-backed query is fresher): {rows_only_in}")
    prev = None
    for n in window:
        tag = "changed" if n in changed else ("never" if n in never else f"r{rounds[n]}")
        if tag != prev:
            print(f"    # --- {tag}")
            prev = tag
        print(f'    "{n}",')
    rest = [n for n in changed + never + backlog if n not in set(window)]
    if rest:
        print(f"# next-round queue head: {rest[:10]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
