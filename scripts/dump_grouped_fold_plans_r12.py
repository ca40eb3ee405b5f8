#!/usr/bin/env python3
"""Capture the formatted plans of 4-level LAZY grouped-merge folds
(r12 single-reference rewrites) into plans/r12/, plus a plan-size
growth table per fold level — the linear-growth evidence the r11
verdict asked for (task #3)."""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import freq as FQ  # noqa: E402
from subgraph_extractor_spark.operators import quantiles as Q  # noqa: E402


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark("fold_plans_r12", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(here, "plans", "r12"), exist_ok=True)

    rows = [(i, f"g{i % 3}", f"k{i % 17}", i % 301) for i in range(400)]
    df = spark.createDataFrame(rows, "i long, grp string, key string, x long")
    shard_dfs = [df.filter((F.col("i") % 4) == s) for s in range(4)]

    mg_shards = [
        FQ.mg_summary_grouped(sd.select("grp", "key"), "key", 4, ["grp"])
        .localCheckpoint(eager=True)
        for sd in shard_dfs
    ]
    q_shards = [
        Q.quantile_summary_grouped(sd.select("grp", "x"), "x", 5, ["grp"])
        .localCheckpoint(eager=True)
        for sd in shard_dfs
    ]

    for name, shards, merge in (
        ("mg_merge_grouped", mg_shards,
         lambda acc, s: FQ.mg_merge_grouped(acc, s, 4, ["grp"])),
        ("quantile_merge_grouped", q_shards,
         lambda acc, s: Q.quantile_merge_grouped(acc, s, 5, ["grp"])),
    ):
        acc = shards[0]
        sizes = []
        for s in shards[1:]:
            acc = merge(acc, s)
            sizes.append(len(formatted(acc)))
        plan = formatted(acc)
        with open(
            os.path.join(here, "plans", "r12", f"{name}_lazyfold_after.txt"),
            "w",
        ) as fh:
            fh.write(
                f"== 4-shard fully-lazy left fold of {name} "
                f"(r12 single-reference rewrite) ==\n"
                f"formatted-plan bytes per fold level (levels 1..3): "
                f"{sizes}\n"
                f"(linear growth — the old two-reference shape grew "
                f"each level by a multiple of the previous plan)\n\n"
            )
            fh.write(plan)
        print(name, "plan bytes per level:", sizes, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
