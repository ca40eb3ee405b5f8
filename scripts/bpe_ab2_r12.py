#!/usr/bin/env python3
"""A/B: train_bpe full-recount argmax (SHIPPED) vs incremental
pair-count state (r12 session 2 candidate — measured SLOWER, rejected).

A (shipped, == bpe.train_bpe): every round re-explodes EVERY word's
   adjacent pairs and aggregates the full stream for the argmax.
B (rejected candidate, inlined below so the rejection stays
   reproducible): the pair-count table is checkpointed loop state
   updated by a signed delta over only the rows that contained the
   winning pair; the argmax aggregates the vocabulary-bounded pair
   table instead.

RESULT (sf0.1 documents, num_merges=20, min_count=2, local[32],
interleaved min-of-3, merge lists asserted identical):

    A_full_recount: min 5.386  all [6.052, 6.012, 5.386]
    B_incremental:  min 7.683  all [7.893, 7.683, 7.764]

B loses by ~2.3 s consistently: at this scale the distinct-pair table
is the same order of magnitude as the exploded pair stream, so the
argmax saves little, while B adds per-round state maintenance the full
recount never pays — a 3-way union + re-aggregate + localCheckpoint of
the pair table every round (block write + read per argmax).  The
correctness side was fine (a delta-algebra test over overlapping-run /
pair-re-creation / shrink-to-one-symbol corpora passed bit-equal), so
this is purely a measured performance rejection.
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import bpe  # noqa: E402


def _pair_weights(df, sign: int = 1):
    """(a, b, w) — every adjacent pair of every row, weighted by
    ``sign * freq`` (the signed form is B's delta algebra)."""
    w = (F.col("freq") * F.lit(sign)).alias("w") if sign != 1 else (
        F.col("freq").alias("w")
    )
    return (
        df.filter(F.size("syms") >= 2)
        .select(w, F.explode(bpe._adjacent_pairs()).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "w")
    )


def train_bpe_incremental(wf, num_merges, min_count=2):
    """The REJECTED candidate: incremental pair-count loop state."""
    state = (
        wf.select(
            "word", "freq", bpe.initial_symbols(F.col("word")).alias("syms")
        ).localCheckpoint(eager=True)
    )
    pc = (
        _pair_weights(state)
        .groupBy("a", "b")
        .agg(F.sum("w").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    merges = []
    for _ in range(num_merges):
        best = (
            pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        hit = bpe._contains_pair(a, b)
        new_state = (
            state.withColumn("_hit", hit)
            .withColumn(
                "syms",
                F.when(F.col("_hit"), bpe._merge_fold(a, b)).otherwise(
                    F.col("syms")
                ),
            )
            .localCheckpoint(eager=True)
        )
        pc = (
            pc.select("a", "b", F.col("cnt").alias("w"))
            .unionByName(_pair_weights(state.filter(hit), sign=-1))
            .unionByName(_pair_weights(new_state.filter(F.col("_hit"))))
            .groupBy("a", "b")
            .agg(F.sum("w").alias("cnt"))
            .filter(F.col("cnt") > 0)
            .localCheckpoint(eager=False)
        )
        state = new_state
    return merges


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "3"))
    spark = get_spark(
        "bpe_ab2_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wf = bpe.word_freqs(docs, "text").persist()
    wf.count()

    ma = bpe.train_bpe(wf, 20, 2)
    mb = train_bpe_incremental(wf, 20, 2)
    assert ma == mb, f"merge lists differ:\nA={ma}\nB={mb}"
    print(f"merge lists identical ({len(ma)} merges)")

    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"bpe_ab2:{tag}")
        t0 = time.perf_counter()
        fn(wf, 20, 2)
        return time.perf_counter() - t0

    times = {"A_full_recount": [], "B_incremental": []}
    for _ in range(n):
        times["A_full_recount"].append(run("A", bpe.train_bpe))
        times["B_incremental"].append(run("B", train_bpe_incremental))
    for k, v in times.items():
        print(f"{k}: min {min(v):.3f}  all {[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
