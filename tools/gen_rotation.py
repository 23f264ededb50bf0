#!/usr/bin/env python
"""Compute the next round's gate-window rotation from the driver's
CORRECTNESS_r*.json artifacts (freshness standard, restated per VERDICT
r8 item 2: every registry query's latest GREEN driver row must be at
most FIVE rounds old — all registry names (211 as of r10: 201
oracle-backed plus 10 rows-only; the tool reads the live registry)
rotate through the same 50-slot window, so ceil(211/50) = 5 rounds is
the arithmetic floor for a full re-proof cycle; new queries must enter
the 50-slot window or they are never driver-proven).

Usage: python tools/gen_rotation.py [--new name1,name2,...]

Prints, in order:
  1. every registry query whose latest proof is the OLDEST round
     (the mandatory front of the next window), oldest first,
     oracle-backed before rows-only within a round;
  2. the --new (not-yet-registered or never-proven) names;
  3. fill candidates (next-oldest proofs) up to the 50-slot window,
and the leftover count that becomes the round-after's front list.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

WINDOW = 50


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", default="", help="comma-separated new-query names")
    args = ap.parse_args()
    new = [n for n in args.new.split(",") if n]

    from shifu_spark.queries import ORACLES, QUERIES

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(ch for ch in os.path.basename(path) if ch.isdigit()))
        for name, row in json.load(open(path)).items():
            # only GREEN rows are proofs: an oracle-backed hash-PASS, or a
            # rows-only check that actually ran (err == no_oracle with a
            # row count).  A FAIL row (hash_match falsy — e.g.
            # bin_avg_score r01, events_props_json r03) must NOT bump
            # `latest`, or the rotation would push exactly the regressed
            # query to the BACK of the next window while its last green
            # proof ages on.
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)

    reg = [n for n in QUERIES if n not in new]
    never = [n for n in reg if n not in latest]
    by_round: dict[int, list[str]] = {}
    for n in reg:
        if n in latest:
            by_round.setdefault(latest[n], []).append(n)

    ordered: list[str] = []
    for rnd in sorted(by_round):
        grp = by_round[rnd]
        ordered += sorted(n for n in grp if n in ORACLES)
        ordered += sorted(n for n in grp if n not in ORACLES)  # rows-only last

    window = (never + new + ordered)[:WINDOW]
    leftover = (never + new + ordered)[WINDOW:]
    print(f"# window ({len(window)} of {WINDOW}); registry={len(QUERIES)}")
    for n in window:
        tag = "NEW" if n in new or n in never else f"r{latest[n]:02d}"
        tag += "" if n in ORACLES or n in new else " rows-only"
        print(f'    "{n}",  # {tag}')
    print(f"# leftover (next round's mandatory front): {len(leftover)}")
    for n in leftover[:10]:
        print(f"#   {n} (r{latest.get(n, 0):02d})")
    if len(leftover) > 10:
        print(f"#   ... and {len(leftover) - 10} more")


if __name__ == "__main__":
    main()
