#!/usr/bin/env python3
"""Plan captures for the r12 triangle_counts wedge-ordering filter.

triangle_counts eagerly checkpoints its result, so explaining the
query's return value shows only a checkpoint scan (the sketch_mg
lesson).  This dump rebuilds both variants' pipelines up to — but
excluding — the final localCheckpoint and writes the formatted plans:

    plans/r12/graph_triangles_before.txt  (r11 shape: unfiltered wedge join)
    plans/r12/graph_triangles_after.txt   (r12 shape: ordering predicate
                                           inside the wedge equi-join)

The inputs (clique edge table from q_graph_triangles' construction)
and every other operator are identical between the two dumps.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402


def build(e, ordered: bool):
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
        .select("o.u", "o.v", *(["o.dv"] if ordered else []))
    )
    ed = ed.persist()
    ed.count()
    l, r = ed.alias("l"), ed.alias("r")
    if ordered:
        cond = [
            F.col("l.u") == F.col("r.u"),
            (F.col("l.dv") < F.col("r.dv"))
            | (
                (F.col("l.dv") == F.col("r.dv"))
                & (F.col("l.v") < F.col("r.v"))
            ),
        ]
    else:
        cond = [F.col("l.u") == F.col("r.u")]
    wedges = l.join(r, on=cond).select(
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
    )
    return out, ed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from subgraph_extractor_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        "dump_triangles_plans_r12",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
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
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    for ordered, name in ((False, "before"), (True, "after")):
        out, ed = build(e, ordered)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        path = os.path.join(
            here, "plans", "r12", f"graph_triangles_{name}.txt"
        )
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        ed.unpersist()
        print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
