#!/usr/bin/env python3
"""A/B harness for hits_fixed_point variants at sf0.1 (round-11 opt).

Times each eager barrier (localCheckpoint) inside a hand-unrolled copy
of the operator so the per-round cost is visible, and A/Bs structural
variants in one session.  Usage:

    python scripts/hits_ab.py [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402


def edges_df(spark, sf_dir):
    import __spark_entry__ as entry

    return entry._part_co_order_edges(spark, sf_dir)


def run_variant(spark, ed_in, variant, iters=6, scale=10**12):
    """Unrolled hits_fixed_point with per-barrier timing."""
    t0 = time.monotonic()
    marks = []

    def mark(label):
        marks.append((label, time.monotonic() - t0))

    ed = ed_in.select(F.col("src").alias("_src"), F.col("dst").alias("_dst"))
    if variant in ("v0_plain",):
        ed_src = ed_dst = ed.persist()
    elif variant == "v5_single_src":
        # r12 (ADVICE): ONE partitioned persist; the dst-keyed view is
        # derived from the cached src view per round (one extra
        # exchange per round under the SMJ fallback, half the cached
        # footprint of the static E-row relation)
        ed_src = ed.repartition("_src").persist()
        ed_dst = ed_src.repartition("_dst")
    elif variant == "v3_group_part":
        # partition each view by the GROUP key of the half-round that
        # uses it: the score side broadcasts (measured plan), a
        # broadcast join preserves the streamed side's partitioning, so
        # the groupBy needs NO exchange at all
        ed_src = ed.repartition("_dst").persist()  # used by araw join
        ed_dst = ed.repartition("_src").persist()  # used by hraw join
    else:
        ed_src = ed.repartition("_src").persist()
        ed_dst = ed.repartition("_dst").persist()
    m = ed_src.count()
    assert m * scale < 1 << 63
    mark("edges_cached")
    nodes = (
        ed_src.select(F.col("_src").alias("node"))
        .union(ed_src.select(F.col("_dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    nodes.count()
    mark("nodes_cached")
    norm = (
        lambda col: F.expr(
            f"(CAST(coalesce(_raw, 0L) AS DECIMAL(38,0))"
            f" * CAST({scale} AS DECIMAL(38,0)))"
            f" div CAST(_mx AS DECIMAL(38,0))"
        )
        .cast("long")
        .alias(col)
    )
    sparse = variant == "v4_sparse"
    hubs = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    auths = None
    for i in range(iters):
        araw = (
            ed_src.join(hubs, ed_src["_src"] == hubs["node"])
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("hub").alias("_raw"))
        )
        amax = araw.agg(F.max("_raw").alias("_mx"))
        if sparse:
            auths = araw.crossJoin(F.broadcast(amax)).select(
                "node", norm("auth")
            )
        else:
            auths = (
                nodes.join(araw, "node", "left")
                .crossJoin(F.broadcast(amax))
                .select("node", norm("auth"))
            )
        if variant != "v2_hub_only":
            auths = auths.localCheckpoint(eager=True)
            mark(f"r{i}_auths")
        hraw = (
            ed_dst.join(auths, ed_dst["_dst"] == auths["node"])
            .groupBy(F.col("_src").alias("node"))
            .agg(F.sum("auth").alias("_raw"))
        )
        hmax = hraw.agg(F.max("_raw").alias("_mx"))
        if sparse:
            hubs = hraw.crossJoin(F.broadcast(hmax)).select(
                "node", norm("hub")
            )
        else:
            hubs = (
                nodes.join(hraw, "node", "left")
                .crossJoin(F.broadcast(hmax))
                .select("node", norm("hub"))
            )
        if i + 1 < iters or variant in ("v2_hub_only",):
            hubs = hubs.localCheckpoint(eager=True)
            mark(f"r{i}_hubs")
        if variant == "v2_hub_only" and i + 1 == iters:
            auths = auths.localCheckpoint(eager=True)
            mark(f"r{i}_auths_final")
    if sparse:
        out = (
            nodes.join(hubs, "node", "left")
            .join(auths, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub"),
                F.coalesce(F.col("auth"), F.lit(0)).cast("long").alias(
                    "auth"
                ),
            )
            .localCheckpoint(eager=True)
        )
    else:
        out = (
            hubs.join(auths, "node")
            .select("node", "hub", "auth")
            .localCheckpoint(eager=True)
        )
    mark("out")
    rows = sorted(map(tuple, out.collect()), key=str)
    ed_src.unpersist()
    if ed_dst is not ed_src:
        ed_dst.unpersist()
    nodes.unpersist()
    total = time.monotonic() - t0
    return rows, total, marks


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    variants = sys.argv[1:] or ["v0_plain", "v1_two_part", "v2_hub_only"]
    spark = get_spark("hits_ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ed = edges_df(spark, sf_dir)
    ed.count()  # warm the scan

    ref = None
    # interleave passes so JIT warm-up hits all variants evenly
    times = {v: [] for v in variants}
    for p in range(3):
        for v in variants:
            spark.sparkContext.setJobDescription(f"hits:{v}:p{p}")
            rows, total, marks = run_variant(spark, ed, v)
            if ref is None:
                ref = rows
            assert rows == ref, f"VALUE DIVERGENCE in {v}"
            times[v].append(total)
            if p == 0:
                deltas = [
                    (lbl, round(t - (marks[j - 1][1] if j else 0.0), 2))
                    for j, (lbl, t) in enumerate(marks)
                ]
                print(v, "pass0 barriers:", deltas, flush=True)
    for v in variants:
        print(v, "min", round(min(times[v]), 3), [round(t, 2) for t in times[v]], flush=True)


if __name__ == "__main__":
    main()
