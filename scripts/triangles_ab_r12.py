#!/usr/bin/env python3
"""r12 session 4 A/B: triangle_counts wedge-ordering filter.

Hypothesis (guide §2.2 — shuffle/probe fewer rows): the wedge
self-join emits BOTH orderings of every out-neighbor pair plus the
diagonal (d_u^2 rows per node) and relies on the closure join to drop
the ~half that can never close (the closing edge exists only in
orientation order).  Carrying each out-neighbor's degree in the
persisted oriented-edge table lets the wedge join apply the SAME
(degree, id) total order the orientation used — emitting only
d_u*(d_u-1)/2 closable-ordered wedges, >2x fewer closure probes and
wedge-row materializations, at the cost of one extra BIGINT per
persisted edge row.

Equivalence: a wedge (v, w) closes iff (v, w) is an oriented edge,
which requires k(v) < k(w) under the SAME key k = (degree, id) the
filter tests — so the filter drops only never-closing rows and each
triangle still materializes exactly once (from its lowest-k vertex).
Asserted below by full row-set equality of the final (node,
n_triangles) table on every pass.

Method: same-session interleaved min-of-N (host throttling discipline,
see OPTIMIZATION_r12.md "Host conditions"), noop sink.

RECORDED RESULT (run against the PRE-change library as variant A —
after the change shipped, graph_ops.triangle_counts IS variant B, so a
re-run measures B vs B): two runs at sf0.1, 1 196 000 clique edges —
min-of-3 6.441 vs 4.765 (1.35x) and min-of-4 5.203 vs 4.389 (1.19x),
row sets identical on every pass of both runs.
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def triangle_counts_ordered(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Variant B: triangle_counts with the wedge-ordering filter."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        e.join(deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("db").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    F.col("da").alias("dv"),
                )
            )
            .alias("o")
        )
        .select("o.u", "o.v", "o.dv")
    )
    ed = ed.persist()
    ed.count()
    l, r = ed.alias("l"), ed.alias("r")
    wedges = l.join(
        r,
        on=[
            F.col("l.u") == F.col("r.u"),
            (F.col("l.dv") < F.col("r.dv"))
            | (
                (F.col("l.dv") == F.col("r.dv"))
                & (F.col("l.v") < F.col("r.v"))
            ),
        ],
    ).select(
        F.col("l.u").alias("w_u"),
        F.col("l.v").alias("w_v"),
        F.col("r.v").alias("w_w"),
    )
    closing = ed.select(F.col("u").alias("w_v"), F.col("v").alias("w_w"))
    try:
        ed_bytes = int(
            ed._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        ed_bytes = None
    if ed_bytes is not None and ed_bytes <= 64 << 20:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, ["w_v", "w_w"])
    per_node = (
        tri.select(F.explode(F.array("w_u", "w_v", "w_w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.select(F.col("n").alias("node"))
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
        .localCheckpoint(eager=True)
    )
    ed.unpersist()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_passes = int(os.environ.get("AB_PASSES", "3"))

    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import graph as graph_ops
    import __spark_entry__ as entrymod

    spark = get_spark(
        "triangles_ab_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = (
        entrymod._t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    e = (
        li.alias("x")
        .join(
            li.alias("y"),
            on=[F.col("x.o") == F.col("y.o"), F.col("x.p") < F.col("y.p")],
        )
        .select(F.col("x.p").alias("src"), F.col("y.p").alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)  # shared input, outside the timed region
    )
    print("edges:", e.count(), flush=True)

    def run(fn, label):
        spark.sparkContext.setJobDescription(f"tri_ab:{label}")
        t0 = time.perf_counter()
        out = fn(e)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        return dt, out

    # warm both variants once (JIT parity), then interleave
    run(graph_ops.triangle_counts, "warmA")
    run(triangle_counts_ordered, "warmB")

    times_a, times_b = [], []
    for i in range(n_passes):
        ta, out_a = run(graph_ops.triangle_counts, f"A{i}")
        tb, out_b = run(triangle_counts_ordered, f"B{i}")
        # full row-set equality both ways
        d1 = out_a.exceptAll(out_b).count()
        d2 = out_b.exceptAll(out_a).count()
        assert d1 == 0 and d2 == 0, f"MISMATCH pass {i}: {d1}/{d2}"
        times_a.append(ta)
        times_b.append(tb)
        print(
            f"pass {i}: A={ta:.3f}  B={tb:.3f}  (rowsets identical)",
            flush=True,
        )
    print(
        f"min A (current) = {min(times_a):.3f}  "
        f"min B (ordered-wedge) = {min(times_b):.3f}  "
        f"speedup = {min(times_a) / min(times_b):.3f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
