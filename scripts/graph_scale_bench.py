#!/usr/bin/env python3
"""Graph-family scale sweep (VERDICT r10 task #3): measure how the
three graph operators ACTUALLY grow with edge count on synthesized
power-law graphs — `pagerank_fixed_point` (10 rounds),
`label_propagation` (4 rounds), `triangle_counts` — the empirical
anchor for the per-round shuffle-shape claim the plan pin
(tests/test_graph.py::test_*_round_shuffles_*) freezes structurally:
the static adjacency persists pre-partitioned and only the N-row
rank/label table (plus the partial-agg'd vote/contrib stream) shuffles
per round, so total time should grow ~linearly in edges for the
iterative pair and ~m^1.5 worst-case (far less on real degree
distributions) for triangles.

Protocol (dedup_scale_bench.py's): synthesize a deterministic directed
graph with a Zipf(2.0) in-degree distribution over n_edges/10 nodes
(power-law hubs — the skew case the degree-ordered wedge orientation
exists for), write parquet OUTSIDE the timed window, then time each
operator end-to-end (min over PASSES runs) at each size.  The fitted
log-log exponent between consecutive sizes is the headline number:
~1 = linear in edges.

Usage: python scripts/graph_scale_bench.py [sizes...]
       (default 100000 1000000 5000000)
"""

from __future__ import annotations

import gc
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

PASSES = 2
PR_ITERS = 10
LPA_ITERS = 4


def synth_powerlaw_edges(m: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic directed multigraph: m edges over n = m/10 nodes;
    sources uniform, destinations Zipf(2.0)-ranked (node 0 is the
    biggest hub) — the heavy-tail in-degree shape of link graphs."""
    n = max(1000, m // 10)
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, size=m).astype(np.int64)
    # Zipf over ranks, folded into [0, n): hub mass concentrates on
    # the smallest ids; reject the tail beyond n by modulo (keeps the
    # draw deterministic and the distribution shape intact)
    dst = (rng.zipf(2.0, size=m) - 1).astype(np.int64) % n
    keep = src != dst  # self-loops add noise to triangles; drop
    return src[keep], dst[keep]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000, 5_000_000]
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import graph as G

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "graph_scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: list[tuple[int, float, float, float]] = []
    print("edges | pagerank10 (s) | lpa4 (s) | triangles (s) | nodes | tri_total")
    for m in sizes:
        src, dst = synth_powerlaw_edges(m)
        tmp = tempfile.mkdtemp(prefix="graph_scale_")
        papq.write_table(
            pa.table({"src": pa.array(src), "dst": pa.array(dst)}),
            f"{tmp}/edges.parquet",
        )
        edges = spark.read.parquet(f"{tmp}/edges.parquet")
        edges = edges.repartition(32).persist()
        n_nodes = (
            edges.select("src").union(edges.select("dst")).distinct().count()
        )

        pr_t = lpa_t = tri_t = float("inf")
        tri_total = 0
        for _ in range(PASSES):
            t0 = time.time()
            # scale=10**8: the default 10**12 trips the (deliberate)
            # overflow envelope at ~10^6 nodes — 8 significant digits
            # is the documented large-graph setting
            G.pagerank_fixed_point(edges, iters=PR_ITERS, scale=10**8).count()
            pr_t = min(pr_t, round(time.time() - t0, 2))
            t0 = time.time()
            G.label_propagation(edges, iters=LPA_ITERS).count()
            lpa_t = min(lpa_t, round(time.time() - t0, 2))
            t0 = time.time()
            tri = G.triangle_counts(edges)
            from pyspark.sql import functions as F

            tri_total = tri.agg(F.sum("n_triangles")).first()[0]
            tri_t = min(tri_t, round(time.time() - t0, 2))
            gc.collect()
        print(f"{m} | {pr_t} | {lpa_t} | {tri_t} | {n_nodes} | {tri_total}")
        results.append((m, pr_t, lpa_t, tri_t))

        edges.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)

    print("\nfitted log-log exponents between consecutive sizes")
    print("(1.0 = linear in edges; triangles bound is 1.5 worst-case):")
    for (m1, p1, l1, t1), (m2, p2, l2, t2) in zip(results, results[1:]):
        r = math.log(m2 / m1)
        print(
            f"{m1} -> {m2}: pagerank {math.log(p2 / p1) / r:.2f}, "
            f"lpa {math.log(l2 / l1) / r:.2f}, "
            f"triangles {math.log(t2 / t1) / r:.2f}"
        )
    print("loadavg_end", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
