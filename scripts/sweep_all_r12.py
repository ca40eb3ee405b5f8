#!/usr/bin/env python3
"""r12 session 2 discovery sweep (guide §1.4): single noop-sink
execution of EVERY registry query NOT in the bench HEADLINE list —
the headline entries are profiled by profile_r12.py; this sweep hunts
for hidden full-materialization costs in the non-benched oracle faces
(the a13 lesson: count()-timed global aggregates hide their aggregate
expressions' true cost).

Single execution per query (no warmup): discovery only — candidates
get a proper isolated min-of-N before any change is justified.

Usage: python scripts/sweep_all_r12.py [out.json]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
       SWEEP_SKIP (comma-separated query names to skip)
"""

from __future__ import annotations

import json
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_all_r12.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    skip = set(
        s for s in os.environ.get("SWEEP_SKIP", "").split(",") if s
    )

    import bench as benchmod
    import __spark_entry__ as entrymod
    from subgraph_extractor_spark import get_spark

    spark = get_spark(
        "sweep_all_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    headline = set(benchmod.HEADLINE) | set(benchmod.HEADLINE_ONCE)
    names = [n for n in sorted(qs) if n not in headline and n not in skip]
    print(f"{len(names)} non-headline queries", flush=True)

    # prime JVM / parquet footers once
    qs["a1_minmax_watermark"](spark, sf_dir).count()

    import gc

    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
        except Exception as e:  # record, keep sweeping
            dt = -1.0
            print(f"ERR  {name}: {type(e).__name__}", flush=True)
        out[name] = dt
        print(f"{name}\t{dt}", flush=True)
        gc.collect()
        with open(out_path, "w") as f:
            json.dump(
                {"noop_single": out, "sf_dir": sf_dir, "cpus": cpus}, f
            )
    top = sorted(out.items(), key=lambda kv: -kv[1])[:25]
    print("\nTOP 25:", flush=True)
    for n, v in top:
        print(f"  {n}\t{v}", flush=True)


if __name__ == "__main__":
    main()
