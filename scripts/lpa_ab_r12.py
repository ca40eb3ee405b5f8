#!/usr/bin/env python3
"""Round-12 A/B for label_propagation (graph_lpa — the most expensive
headline query): apply the pagerank round-fusion lesson (lazy
localCheckpoint per round, materialized by the final action — the r9
cadence table that pinned every-1 was measured with EAGER checkpoints
only), and re-test the adjacency persist's repartition("nbr") after
the r12 HITS finding that a cached repartition's partitioning is not
recognized by the join planner under AQE.

Variants (4 rounds, the q_graph_lpa configuration, part-co-order graph
at $SPARK_GRAFT_SF_DIR; label tables asserted identical):

  v0_eager1        — shipped: eager localCheckpoint every round.
  v1_lazy1         — lazy every round; one job at the final barrier.
  v2_lazy1_nopart  — v1 with the adjacency persisted UNPARTITIONED.
"""
from __future__ import annotations

import gc
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402


def run_variant(spark, edges, variant, iters=4):
    t0 = time.monotonic()
    eager = variant.startswith("v0") or variant.startswith("v3")
    ed = edges.select(F.col("src").alias("_a"), F.col("dst").alias("_b"))
    adj = ed.union(
        ed.select(F.col("_b").alias("_a"), F.col("_a").alias("_b"))
    ).select(F.col("_a").alias("node"), F.col("_b").alias("nbr"))
    if not variant.endswith("nopart"):
        adj = adj.repartition("nbr")
    adj = adj.persist()
    nodes = adj.select("node").distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(iters):
        nbr_votes = adj.join(
            labels.select(F.col("node").alias("nbr"), F.col("label")), "nbr"
        ).select("node", "label")
        votes = nbr_votes.unionByName(
            labels.select("node", "label")
        ).repartition("node")
        counted = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("_c")
        )
        labels = (
            counted.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_c")).alias("_nc"),
                        F.col("label").alias("label"),
                    )
                ).alias("_best")
            )
            .select("node", F.col("_best.label").alias("label"))
        )
        if i + 1 < iters:
            labels = labels.localCheckpoint(eager=eager)
    out = labels.localCheckpoint(eager=True)
    rows = sorted(map(tuple, out.collect()))
    adj.unpersist()
    return rows, time.monotonic() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    variants = sys.argv[1:] or ["v0_eager1", "v1_lazy1", "v2_lazy1_nopart"]
    spark = get_spark("lpa_ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    ed = entry._part_co_order_edges(spark, sf_dir).localCheckpoint(eager=True)

    ref = None
    times = {v: [] for v in variants}
    for p in range(int(os.environ.get("AB_PASSES", "3"))):
        for v in variants:
            gc.collect()
            spark.sparkContext.setJobDescription(f"lpa:{v}:p{p}")
            rows, total = run_variant(spark, ed, v)
            if ref is None:
                ref = rows
            assert rows == ref, f"VALUE DIVERGENCE in {v}"
            times[v].append(total)
    for v in variants:
        print(v, "min", round(min(times[v]), 3),
              [round(t, 2) for t in times[v]], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
