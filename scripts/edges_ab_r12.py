#!/usr/bin/env python3
"""A/B: _part_co_order_edges formulations (r12 session 2, guide §2.4).

A (shipped r11/r12): distinct(l_orderkey, l_partkey) -> LEAD window
   partitioned by l_orderkey -> filter dst not null.
   Plan: Exchange(l_orderkey, l_partkey) for the distinct +
   Exchange(l_orderkey) + per-partition sort for the window = TWO
   exchanges of the E-row stream before any consumer sees an edge.

B (candidate): groupBy(l_orderkey).agg(array_sort(collect_set)) ->
   explode adjacent index pairs.
   Plan: ONE Exchange(l_orderkey) with map-side partial collect_set;
   the sort is per-group over the (small) distinct-part arrays.

Equivalence: per order, distinct l_partkeys sorted ascending and
paired (p_i, p_{i+1}) — identical rows by construction; l_partkey is
NOT NULL (TPC-H schema), so collect_set's null-dropping and the
window's null-ordering never diverge.  Asserted below on BOTH the edge
stream and the full graph_lpa output.

Timing: same-session interleaved min-of-N of the full q_graph_lpa
(noop sink) with each edge builder — the consumer whose bench entry
this targets.
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import Window, functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import graph as graph_ops  # noqa: E402


def edges_a(li):
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .select(
            F.col("l_partkey").alias("src"),
            F.lead("l_partkey").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )


def edges_b(li):
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ps) - 2),"
                    " i -> struct(ps[i] AS src, ps[i+1] AS dst))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )


def lpa(edges):
    return graph_ops.label_propagation(edges, iters=4).select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("label"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "5"))
    spark = get_spark(
        "edges_ab_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # ---- equivalence: edge stream (with multiplicity) ----
    ea, eb = edges_a(li), edges_b(li)
    diff = ea.groupBy("src", "dst").count().exceptAll(
        eb.groupBy("src", "dst").count()
    )
    assert diff.isEmpty(), "edge streams differ"
    ca, cb = ea.count(), eb.count()
    assert ca == cb, (ca, cb)
    print(f"edge streams identical ({ca} rows)")

    # ---- equivalence: full consumer output ----
    la, lb = lpa(edges_a(li)), lpa(edges_b(li))
    assert la.exceptAll(lb).isEmpty() and lb.exceptAll(la).isEmpty()
    print("graph_lpa outputs identical")

    # ---- interleaved timing of the full consumer ----
    def run(tag, builder):
        spark.sparkContext.setJobDescription(f"edges_ab:{tag}")
        t0 = time.perf_counter()
        lpa(builder(li)).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for b in ("A", "B"):  # warm-up both
        run(b, edges_a if b == "A" else edges_b)
    times = {"A": [], "B": []}
    for _ in range(n):
        times["A"].append(run("A", edges_a))
        times["B"].append(run("B", edges_b))
    for k, v in times.items():
        print(f"{k}: min {min(v):.3f}  all {[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
