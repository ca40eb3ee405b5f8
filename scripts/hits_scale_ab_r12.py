#!/usr/bin/env python3
"""HITS edge double-persist A/B at sf1.0-class edge counts (VERDICT
r11 task #6): the shipped two-partitioned-persists shape (2x cached
footprint of the largest relation) vs one partitioned persist with a
per-round exchange for the dst-keyed view, vs the single unpartitioned
persist, on a synthesized power-law graph large enough that the score
side stops broadcasting (the SMJ regime the partitioning exists for).

Reuses scripts/hits_ab.py's unrolled per-variant runner (row sets
asserted identical) and graph_scale_bench's deterministic Zipf graph.

Usage: python scripts/hits_scale_ab_r12.py [n_edges] [passes]
       (default 2000000 2)
"""
from __future__ import annotations

import gc
import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "scripts"))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as papq  # noqa: E402

from graph_scale_bench import synth_powerlaw_edges  # noqa: E402
from hits_ab import run_variant  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = ["v1_two_part", "v5_single_src", "v0_plain"]
    spark = get_spark(
        "hits_scale_ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    src, dst = synth_powerlaw_edges(m)
    d = tempfile.mkdtemp(prefix="hits_scale_")
    papq.write_table(
        pa.table({"src": src, "dst": dst}), os.path.join(d, "edges.parquet")
    )
    ed = spark.read.parquet(os.path.join(d, "edges.parquet"))
    print(f"edges {ed.count()} nodes ~{max(1000, m // 10)}", flush=True)

    ref = None
    times = {v: [] for v in variants}
    for p in range(passes):
        for v in variants:
            gc.collect()
            spark.sparkContext.setJobDescription(f"hits_scale:{v}:p{p}")
            rows, total, marks = run_variant(spark, ed, v, iters=4)
            if ref is None:
                ref = rows
            assert rows == ref, f"VALUE DIVERGENCE in {v}"
            times[v].append(total)
            print(f"{v} pass{p}: {total:.2f}s", flush=True)
    for v in variants:
        print(v, "min", round(min(times[v]), 3),
              [round(t, 2) for t in times[v]], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
