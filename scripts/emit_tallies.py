"""Registry-emitted operator tallies (VERDICT r6 item 7) — the ONE
place the README/SURVEY headline counts come from:

    python /root/repo/scripts/emit_tallies.py          # check, exit 1 on drift
    python /root/repo/scripts/emit_tallies.py --write  # rewrite the status lines

Round 6 needed two fixup commits because the counts were maintained by
hand in three places; this generator derives them from the registry
(query count, exact-oracle count) and either verifies or rewrites the
exact tokens that drifted.  tests/test_round7_ops.py runs the check so
the suite fails the round the registry and the docs disagree.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

README = "/root/repo/README.md"
SURVEY = "/root/repo/SURVEY.md"


def counts() -> tuple[int, int]:
    from graphsense_datafeed_spark.registry import (
        ORACLES,
        QUERIES,
        load_all_operators,
    )

    load_all_operators()
    return len(QUERIES), len(ORACLES)


def _rules(nq: int, no: int) -> list[tuple[str, str, str]]:
    return [
        (README, r"\*\*\d+ registered queries\*\*",
         f"**{nq} registered queries**"),
        (README, r"\*\*\d+ of them with exact DuckDB oracles\*\*",
         f"**{no} of them with exact DuckDB oracles**"),
        (SURVEY, r"\*\*\d+ queries / \d+ exact oracles\*\*",
         f"**{nq} queries / {no} exact oracles**"),
    ]


def run(write: bool) -> int:
    nq, no = counts()
    rows_only = nq - no
    print(f"registry: {nq} queries, {no} exact oracles, "
          f"{rows_only} rows-only")
    drift = 0
    for path, pat, want in _rules(nq, no):
        text = open(path).read()
        hits = re.findall(pat, text)
        if not hits:
            print(f"MISSING token {pat!r} in {path}")
            drift += 1
            continue
        stale = [h for h in hits if h != want]
        if stale:
            if write:
                open(path, "w").write(re.sub(pat, want, text))
                print(f"rewrote {len(hits)} token(s) in {path}: {want}")
            else:
                print(f"DRIFT in {path}: {stale} != {want}")
                drift += 1
    if drift and not write:
        print("tallies drifted — run with --write")
        return 1
    print("tallies in sync" if not write else "tallies written")
    return 0


if __name__ == "__main__":
    raise SystemExit(run(write="--write" in sys.argv))
