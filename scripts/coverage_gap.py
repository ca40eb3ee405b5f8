#!/usr/bin/env python3
"""Driver-coverage gap report: diff the declared ``queries()`` registry
against the union of all recorded ``CORRECTNESS_r*.json`` driver rows
and print (a) queries that have NEVER had a driver-checked row, (b) the
round each checked query was last seen in — the judge's union-coverage
discipline folded into the repo (VERDICT r4 next-round item 7).

Parses the QUERIES literal from source (no Spark import needed) so it
runs in milliseconds; the declaration-order prefix of 50 is the window
the next driver round will check.

Usage: python scripts/coverage_gap.py [--repo DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys


def declared_queries(repo: str) -> list[str]:
    src = open(os.path.join(repo, "__spark_entry__.py")).read()
    m = re.search(
        r"QUERIES: dict\[str, Callable\[\[SparkSession, str\], DataFrame\]\]"
        r" = \{\n(.*?)\n\}\n",
        src,
        re.S,
    )
    if not m:
        raise SystemExit("could not locate the QUERIES literal")
    catalog = re.findall(r'^\s{4}"([a-z0-9_]+)":', m.group(1), re.M)
    # r11+: the driver order is imposed by a _R<N>_WINDOW repack after
    # the literal — mirror it (window first, then catalog order).  At
    # runtime the LAST repack executed wins, so if a future rotation
    # appends an _R<N+1>_WINDOW block instead of replacing the old one,
    # mirror the last match, not the first.
    ws = re.findall(r"^_R\d+_WINDOW = \[\n(.*?)\n\]\n", src, re.S | re.M)
    if not ws:
        return catalog
    window = re.findall(r'"([a-z0-9_]+)"', ws[-1])
    rest = [q for q in catalog if q not in set(window)]
    return window + rest


def driver_rows(repo: str) -> dict[str, list[int]]:
    seen: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        for name in json.load(open(path)):
            seen.setdefault(name, []).append(rnd)
    return seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument(
        "--strict",
        action="store_true",
        help="exit 1 if a never-checked query is outside the window "
        "(use when repacking the window at a round boundary; queries "
        "added MID-round legitimately wait for the next repack)",
    )
    args = ap.parse_args()

    declared = declared_queries(args.repo)
    seen = driver_rows(args.repo)

    never = [q for q in declared if q not in seen]
    window = declared[:50]
    pending = [q for q in never if q in window]

    print(f"declared queries: {len(declared)}")
    print(f"driver-checked at least once: {len([q for q in declared if q in seen])}")
    print(f"never driver-checked: {len(never)}")
    if never:
        for q in never:
            mark = " (in current window — next round)" if q in pending else ""
            print(f"  - {q}{mark}")
    last = sorted(
        ((q, max(r)) for q, r in seen.items() if q in declared),
        key=lambda t: (t[1], t[0]),
    )
    # full histogram FIRST: the r9 verdict planned a 10-slot rotation
    # off the truncated list below while 49 queries actually sat at
    # r4 — the whole distribution is what a window repack needs
    from collections import Counter

    hist = Counter(r for _, r in last)
    print(
        "last-checked histogram: "
        + ", ".join(f"r{r}: {n}" for r, n in sorted(hist.items()))
    )
    print("oldest driver evidence (rotation candidates, top 10):")
    for q, r in last[:10]:
        print(f"  - {q}: last checked r{r}")
    # a never-checked query outside the window cannot get a row next
    # round — a planning bug at a round boundary, expected transiently
    # for queries added mid-round (they wait for the next repack)
    unrotated = [q for q in never if q not in window]
    if unrotated:
        print(
            f"NOTE: {len(unrotated)} never-checked queries are outside "
            f"the 50-slot window (rotate at the next repack): {unrotated}"
        )
        if args.strict:
            sys.exit(1)


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        import os

        os._exit(0)
