#!/usr/bin/env python3
"""Controlled interleaved standalone floor check — the noise-resolution
method that settled the ann_projected_lsh (r8) and dedup_bloom_probe
(r9) weak flags, committed so it stops being a per-round ad-hoc script.

A weak-vs-floor flag from one bench run cannot distinguish a real
regression from a host-contention burst landing on that query.  This
harness alternates the suspect query with a CONTROL query of known
floor in one warmed session: if the control sits near its floor while
the suspect stays inflated, the regression is real; if both recover,
it was the host.  Report = per-pass times + min + min/floor for each.

Usage:
    python scripts/floor_check.py SUSPECT[=floor] [CONTROL[=floor]] \
        [--passes N] [--sf DIR]

Defaults: control ann_lsh=2.70, 5 passes, sf0.1.  Floors default to
the best recorded value in BENCH_local_r*.json / BENCH_r*.json.
"""

from __future__ import annotations

import gc
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recorded_floor(name: str) -> float | None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_*r*.json")):
        try:
            rec = json.load(open(path))
        except Exception:
            continue
        if "queries" not in rec and isinstance(rec.get("parsed"), dict):
            rec = rec["parsed"]
        if rec.get("sf") not in (0.1, "0.1"):
            continue
        t = rec.get("floors", {}).get(name) or rec.get("queries", {}).get(name)
        if isinstance(t, (int, float)):
            best = t if best is None else min(best, t)
    return best


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = [a for a in sys.argv[1:] if a.startswith("--")]
    if not args:
        print(__doc__)
        return 2
    passes = 5
    sf_dir = "/root/testdata/sf0.1"
    for o in opts:
        if o.startswith("--passes"):
            passes = int(o.split("=", 1)[1])
        elif o.startswith("--sf"):
            sf_dir = o.split("=", 1)[1]
    if len(args) == 1:
        args.append("ann_lsh=2.70")
    targets = []
    for a in args:
        name, _, fl = a.partition("=")
        targets.append((name, float(fl) if fl else recorded_floor(name)))

    import __spark_entry__ as em
    from subgraph_extractor_spark import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "floor_check", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    for name, _ in targets:
        if name not in qs:
            print(f"unknown query: {name}")
            return 2
    qs["a1_minmax_watermark"](spark, sf_dir).count()  # warm

    res: dict[str, list[float]] = {name: [] for name, _ in targets}
    for _ in range(passes):
        for name, _ in targets:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            res[name].append(round(time.time() - t0, 3))
            gc.collect()
    print(f"loadavg_end {round(os.getloadavg()[0], 2)}")
    for name, fl in targets:
        lo = min(res[name])
        ratio = f"{lo / fl:.2f}x" if fl else "n/a (no recorded floor)"
        print(f"{name}: {res[name]} min {lo} floor {fl} min/floor {ratio}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
