#!/usr/bin/env python
"""Plan the next round's _CHECK_PRIORITY rotation mechanically.

The driver verifies the FIRST 50 registered queries per round, and the
judge requires every query's latest verdict to be at most 2 rounds old.
This tool reads the committed ROUND marker, every CORRECTNESS_r*.json
the driver has left behind, and the live registry, then prints:

  - each query's last-checked round (and age at the next judging),
  - the MANDATORY set for the round being planned (would cross the
    2-round bound if skipped: age >= 3, or never checked),
  - the budget left for new operators + touched queries + rotation fill,
  - a staleness forecast for the round after that.

Run it at the start of each round, before editing _CHECK_PRIORITY:

    python tools/rotation_planner.py            # plan ROUND+1's window
    python tools/rotation_planner.py --round N  # plan an explicit round

No Spark session is started (the registry imports are plan-only).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def load_history() -> tuple[dict[str, int], list[int]]:
    last_checked: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        rounds.append(rnd)
        with open(path) as f:
            for name in json.load(f):
                last_checked[name] = max(last_checked.get(name, 0), rnd)
    return last_checked, sorted(rounds)


def committed_round() -> int:
    with open(os.path.join(REPO, "ROUND")) as f:
        return int(f.read().strip())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round",
        type=int,
        default=None,
        help="round to plan (default: ROUND marker + 1 — the next round)",
    )
    args = ap.parse_args()

    from jena_fuseki_kafka_spark.queries import QUERIES

    last_checked, rounds = load_history()
    current = committed_round()
    planning = args.round if args.round is not None else current + 1

    # Project ONLY the single in-flight round (the one after the last
    # landed artifact) as checked with the CURRENT registered window:
    # the driver checks exactly these 50 at its snapshot.  This covers
    # both the tool's normal use (planning ROUND+1 mid-round, before
    # that round's artifact lands — ROUND is updated at round END, so
    # the in-flight round is ROUND+1) and the one-ahead forecast
    # (--round N+1 while round N is in flight; previously that errored
    # with an "unpayable" mandatory set because round N looked
    # unchecked).  Deliberately NOT projected: holes in history (a
    # missing/corrupted artifact for a round BELOW the last landed one
    # must surface its queries as mandatory, never be papered over),
    # and forecasts more than one round ahead (later windows are
    # re-planned each round; pretending they all equal today's window
    # would fabricate coverage).
    last_landed = max(rounds) if rounds else 0
    in_flight = last_landed + 1
    if planning > in_flight + 1:
        raise SystemExit(
            f"cannot plan round {planning}: only round {in_flight} is in "
            f"flight (last artifact r{last_landed}); windows beyond it are "
            "re-planned each round — plan at most one round ahead"
        )
    if planning > in_flight:
        projected = list(QUERIES)[:WINDOW]
        for name in projected:
            last_checked[name] = max(last_checked.get(name, 0), in_flight)
        print(
            f"note: CORRECTNESS_r{in_flight:02d}.json not on disk yet — "
            f"projecting the current {WINDOW}-slot window as checked in "
            f"round {in_flight}\n"
        )
    missing_history = [r for r in range(1, last_landed) if r not in rounds]
    if missing_history:
        print(
            f"WARNING: artifact hole(s) in history {missing_history} — NOT "
            "projected; affected queries fall back to their older verdicts "
            "and may surface as mandatory (conservative)\n"
        )

    by_round: dict[int, list[str]] = defaultdict(list)
    for name in QUERIES:
        by_round[last_checked.get(name, 0)].append(name)

    print(f"registry: {len(QUERIES)} queries; driver artifacts for rounds {rounds}")
    print(f"planning round {planning} (window = first {WINDOW} registered)\n")

    print("cohorts by last-checked round (age at the planned judging):")
    for rnd in sorted(by_round, reverse=True):
        names = by_round[rnd]
        age = planning - rnd if rnd else None
        label = f"r{rnd} (age {age})" if rnd else "NEVER CHECKED"
        print(f"  {label}: {len(names)}")

    mandatory = sorted(
        n for n in QUERIES
        if n not in last_checked or planning - last_checked[n] >= 3
    )
    print(f"\nMANDATORY for round {planning} ({len(mandatory)} — must lead the window):")
    for n in mandatory:
        print(f"  {n}  (last checked r{last_checked.get(n, 0) or '—'})")

    budget = WINDOW - len(mandatory)
    print(f"\nbudget after mandatory: {budget} slots for new ops + touched + fill")
    if len(mandatory) > WINDOW:
        print("ERROR: mandatory set exceeds the window — staleness debt is unpayable")
        return 1

    # forecast: whatever is NOT checked in the planned round ages one more.
    # The planned window can cover at most WINDOW of them; every slot spent
    # on a new or touched query instead adds one to the round after's
    # mandatory floor.
    at_bound_next = sorted(
        n for n in QUERIES
        if n in last_checked and (planning + 1) - last_checked[n] >= 3
    )
    floor = max(0, len(at_bound_next) - WINDOW)
    print(
        f"forecast for round {planning + 1}: {len(at_bound_next)} queries reach the "
        f"bound unless checked in round {planning}; its mandatory floor is "
        f"{floor} + one per window slot round {planning} spends on new or "
        f"touched queries."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
