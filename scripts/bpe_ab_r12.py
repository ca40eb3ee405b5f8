#!/usr/bin/env python3
"""Round-12 A/B harness for the BPE merge-round kernel (VERDICT r11
task #1: sparse per-round merge).

Variants, all trained over the same persisted (word, freq) table at
$SPARK_GRAFT_SF_DIR with num_merges=20 / min_count=2 (the
text_bpe_train configuration):

  A  current  — Arrow pandas_udf merge kernel over EVERY word, eager
                localCheckpoint per round (bpe.train_bpe as shipped).
  B  filtered — same Arrow kernel, but only words containing the
                winning adjacent pair pass through it (filter + union).
  C  codegen  — pure-JVM aggregate() fold under a when(hit) guard:
                no Python boundary at all.
  D  codegen + lazy checkpoint — C with eager=False (re-test of r11
                rejection #8 now that the per-round compute is cheap).

Each variant is timed phase-split on the first pass (pair-agg collect
vs merge+checkpoint per round) and min-of-N end-to-end; merge lists
are asserted IDENTICAL across variants (left, right, count at every
rank).
"""

from __future__ import annotations

import gc
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import bpe as bpe_ops  # noqa: E402
from subgraph_extractor_spark.sources.readers import load_table  # noqa: E402

NUM_MERGES = 20
MIN_COUNT = 2


def _contains_pair(a: str, b: str):
    """True iff syms has (a, b) adjacent — codegen zip_with/exists.
    zip_with pads the shorter (shifted) side with NULL, which makes the
    final element's predicate NULL; exists() then yields NULL only when
    no TRUE exists, and a NULL when()-condition falls through to
    otherwise() — the unchanged-row branch — so padding is safe."""
    return (F.size("syms") >= 2) & F.exists(
        F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2, F.size("syms")),
            lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
        ),
        lambda v: v,
    )


def _merge_fold(a: str, b: str):
    """Left-to-right non-overlapping (a,b)->a+b replacement as a pure
    codegen aggregate() fold: append each symbol, fusing when the
    accumulator tail is `a` and the incoming symbol is `b`.  Because a
    fused symbol a+b can never equal `a` (b is non-empty), a symbol
    produced by a fusion never re-fuses — exactly merge_word()'s skip."""
    al, bl, fused = F.lit(a), F.lit(b), F.lit(a + b)

    def step(acc, s):
        return F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == al) & (s == bl),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(fused)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(F.col("syms"), F.array().cast("array<string>"), step)


def _train(wf, variant: str, phases: dict | None = None):
    state = (
        wf.select("word", "freq", bpe_ops.initial_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges = []
    for _ in range(NUM_MERGES):
        t0 = time.time()
        best = (
            state.filter(F.size("syms") >= 2)
            .select("freq", F.explode(bpe_ops._adjacent_pairs()).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if phases is not None:
            phases["argmax"] = phases.get("argmax", 0.0) + time.time() - t0
        if not best or best[0]["cnt"] < MIN_COUNT:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((a, b, cnt))
        t0 = time.time()
        if variant == "A":
            state = state.withColumn(
                "syms", bpe_ops._apply_merge_udf(a, b)(F.col("syms"))
            ).localCheckpoint(eager=True)
        elif variant == "B":
            hit = state.filter(_contains_pair(a, b)).withColumn(
                "syms", bpe_ops._apply_merge_udf(a, b)(F.col("syms"))
            )
            miss = state.filter(~_contains_pair(a, b) | F.isnull(_contains_pair(a, b)))
            state = hit.unionByName(miss).localCheckpoint(eager=True)
        elif variant in ("C", "D"):
            state = state.withColumn(
                "syms",
                F.when(_contains_pair(a, b), _merge_fold(a, b)).otherwise(
                    F.col("syms")
                ),
            ).localCheckpoint(eager=(variant == "C"))
        if phases is not None:
            phases["merge"] = phases.get("merge", 0.0) + time.time() - t0
    if variant == "D":
        # materialize the tail so timing is honest
        state.count()
    return merges


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "3"))
    variants = sys.argv[1:] or ["A", "B", "C", "D"]

    spark = get_spark("bpe_ab_r12", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    wf = bpe_ops.word_freqs(d, "text").persist()
    wf.count()

    ref = None
    results: dict[str, float] = {}
    for v in variants:
        # warm-up + phase split
        phases: dict[str, float] = {}
        spark.sparkContext.setJobDescription(f"bpe_ab:{v}:warmup")
        m = _train(wf, v, phases)
        if ref is None:
            ref = m
        assert m == ref, f"variant {v} merges differ: {m[:3]} vs {ref[:3]}"
        best = None
        for i in range(n):
            gc.collect()
            spark.sparkContext.setJobDescription(f"bpe_ab:{v}:pass{i}")
            t0 = time.time()
            m = _train(wf, v)
            dt = time.time() - t0
            assert m == ref
            best = dt if best is None else min(best, dt)
        results[v] = round(best, 3)
        print(
            f"variant {v}: min-of-{n} {best:.3f}s  "
            f"(warm phase split: argmax {phases.get('argmax', 0):.2f}s, "
            f"merge+ckpt {phases.get('merge', 0):.2f}s)",
            flush=True,
        )
    print("RESULTS", results)
    spark.stop()


if __name__ == "__main__":
    main()
