#!/usr/bin/env python3
"""Round-12 A/B harness for pagerank_fixed_point round fusion
(VERDICT r11 task #4: the CC lesson — ride the checkpoint on the next
consuming action instead of paying an eager barrier per cadence point).

Variants, hand-unrolled copies of the operator's loop (10 rounds,
d=85/100, the q_graph_pagerank configuration) over the part-co-order
graph at $SPARK_GRAFT_SF_DIR:

  v0_eager3  — shipped shape: eager localCheckpoint every 3 rounds
               (4 jobs: rounds 1-3, 4-6, 7-9, 10).
  v1_lazy3   — lazy localCheckpoint every 3 rounds; the FINAL eager
               checkpoint materializes the whole chain as ONE job
               (plans stay 3 rounds deep — each segment's plan reads
               the previous segment's checkpointed RDD).
  v2_lazy1   — lazy every round (plan depth 1 round; still one job).
  v3_eager1  — eager every round (the LPA cadence, for the curve).

Rows asserted identical across variants; interleaved min-of-3.
"""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators.graph import edge_outdegrees  # noqa: E402


def run_variant(spark, edges, variant, iters=10, scale=10**12,
                damping_num=85, damping_den=100):
    t0 = time.monotonic()
    cadence = 1 if ("lazy1" in variant or "eager1" in variant) else 3
    eager = variant.startswith("v0") or variant.startswith("v3e")
    ed = edge_outdegrees(edges, "src", "dst").select(
        F.col("src").alias("_src"),
        F.col("dst").alias("_dst"),
        F.col("_outdeg"),
    )
    if not variant.endswith("nopart"):
        ed = ed.repartition("_src")
    ed = ed.persist()
    node_set = (
        ed.select(F.col("_src").alias("node"))
        .union(ed.select(F.col("_dst").alias("node")))
        .distinct()
        .withColumn("_seed", F.lit(1))
    )
    nodes = (node_set if variant.endswith("nopart")
             else node_set.repartition("node")).persist()
    n_nodes = nodes.count()
    assert damping_num * n_nodes * scale < 1 << 63
    base = (damping_den - damping_num) * scale // damping_den
    base_term = F.when(F.col("_seed") == 1, F.lit(base)).otherwise(F.lit(0))
    start = F.when(F.col("_seed") == 1, F.lit(scale)).otherwise(F.lit(0))
    ranks = nodes.select("node", start.cast("long").alias("rank"))
    for i in range(iters):
        contribs = (
            ed.join(ranks, ed["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                F.expr("rank div _outdeg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                base_term
                + F.expr(
                    f"({damping_num} * coalesce(_s, 0L)) div {damping_den}"
                )
            )
            .cast("long")
            .alias("rank"),
        )
        if (i + 1) % cadence == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=eager)
    out = ranks.localCheckpoint(eager=True)
    rows = sorted(map(tuple, out.collect()))
    ed.unpersist()
    nodes.unpersist()
    return rows, time.monotonic() - t0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    variants = sys.argv[1:] or ["v0_eager3", "v1_lazy3", "v2_lazy1"]
    spark = get_spark("pagerank_ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    ed = entry._part_co_order_edges(spark, sf_dir)
    ed = ed.localCheckpoint(eager=True)  # shared input; derivation outside the A/B

    ref = None
    times = {v: [] for v in variants}
    for p in range(3):
        for v in variants:
            spark.sparkContext.setJobDescription(f"pagerank:{v}:p{p}")
            rows, total = run_variant(spark, ed, v)
            if ref is None:
                ref = rows
            assert rows == ref, f"VALUE DIVERGENCE in {v}"
            times[v].append(total)
    for v in variants:
        print(v, "min", round(min(times[v]), 3),
              [round(t, 2) for t in times[v]], flush=True)


if __name__ == "__main__":
    main()
