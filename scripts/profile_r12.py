#!/usr/bin/env python3
"""Round-12 optimization profiler (guide §1): per-query noop-sink
timing + .explain("formatted") capture.

Usage:
    python scripts/profile_r12.py <out_suffix> [query ...]

For each named query (default: the full bench HEADLINE list) this
 - runs the query once untimed (JIT/codegen warm-up),
 - times N passes of full materialization through the noop sink
   (df.write.format("noop") — computes every column of every row,
   guide §1.4) and reports the min,
 - writes the formatted physical plan to plans/r11/<q>_<suffix>.txt.

The session mirrors bench.py exactly (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=32) so numbers are comparable with the bench
records; jobs are labelled (guide §1.5).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))

    import __spark_entry__ as entrymod
    import bench as benchmod
    from subgraph_extractor_spark import get_spark

    spark = get_spark(
        "profile_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = sys.argv[2:] or benchmod.HEADLINE
    os.makedirs(os.path.join(here, "plans", "r12"), exist_ok=True)

    # warm-up (same as bench)
    qs["a1_minmax_watermark"](spark, sf_dir).count()

    plans_only = os.environ.get("PROFILE_PLANS_ONLY", "") == "1"
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        if not plans_only:
            spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        # capture the formatted plan of a fresh build
        try:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(
                os.path.join(here, "plans", "r12", f"{name}_{suffix}.txt"),
                "w",
            ) as fh:
                fh.write(buf.getvalue())
        except Exception as e:  # plan capture must never kill the run
            print(f"plan capture failed for {name}: {e}", file=sys.stderr)
        if plans_only:
            print(f"{name}\tplan", flush=True)
            continue
        gc.collect()
        best = None
        for _ in range(n_passes):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
            gc.collect()
        out[name] = best
        print(f"{name}\t{best}", flush=True)

    print(json.dumps({"noop_min": out, "sf_dir": sf_dir, "passes": n_passes}))
    spark.stop()


if __name__ == "__main__":
    main()
