"""Compute the next driver-window ordering mechanically.

    python /root/repo/scripts/next_window.py [--limit N]

Reads every CORRECTNESS_r*.json ledger in the repo root and emits, in
window order:

  1. RED rows (any row whose most recent driver appearance failed) —
     these always front-load;
  2. NEVER-CHECKED rows (registered queries absent from every ledger),
     in current registry order;
  3. RE-CHECK rows: all driver-green rows, oldest last-green round
     first — so once the never-checked queue drains (~r10), the window
     becomes a rotating re-check sample and no green row goes more
     than ~(registry_size/50) rounds without re-verification.

Output is one query id per line (paste-ready for the registry window
tuple); --limit 50 trims to a driver window.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="trim to N rows")
    args = ap.parse_args()

    from graphsense_datafeed_spark import registry

    registry.load_all_operators()
    registered = list(registry.QUERIES)

    # last_seen[qid] = (round, green?) for the HIGHEST round mentioning it
    last_seen: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            ledger = json.load(fh)
        for qid, res in ledger.items():
            if res.get("err") == "no_oracle":
                # rows-only entry: the driver's weaker check is
                # "runs and returns >0 rows", not a hash match
                green = bool(res.get("spark_rows"))
            else:
                green = bool(
                    res.get("rows_match")
                    and res.get("schema_match")
                    and res.get("hash_match") is not False
                    and not res.get("err")
                )
            if qid not in last_seen or rnd > last_seen[qid][0]:
                last_seen[qid] = (rnd, green)

    red = [q for q in registered if q in last_seen and not last_seen[q][1]]
    never = [q for q in registered if q not in last_seen]
    recheck = sorted(
        (q for q in registered if q in last_seen and last_seen[q][1]),
        key=lambda q: (last_seen[q][0], registered.index(q)),
    )
    ordered = red + never + recheck
    if args.limit:
        ordered = ordered[: args.limit]
    for q in ordered:
        tag = (
            "RED"
            if q in red
            else "NEW"
            if q in never
            else f"green r{last_seen[q][0]}"
        )
        print(f"{q}  # {tag}")
    print(
        f"-- {len(red)} red, {len(never)} never-checked, "
        f"{len(recheck)} re-check candidates --",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
