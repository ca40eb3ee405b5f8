#!/usr/bin/env python3
"""Round-12 A/B harness for the BPE merge-round kernel (VERDICT r11
task #1: sparse per-round merge).

Variants, all trained over the same persisted (word, freq) table at
$SPARK_GRAFT_SF_DIR with num_merges=20 / min_count=2 (the
text_bpe_train configuration):

  A  r11 shape — Arrow pandas_udf merge kernel over EVERY word, eager
                localCheckpoint per round (the pre-r12 train_bpe).
  B  filtered — same Arrow kernel, but only words containing the
                winning adjacent pair pass through it (filter + union).
                MEASURED FATAL: localCheckpoint keeps the union's
                partitioning, so partitions DOUBLE per round (131k
                tasks in one stage by round ~12).  Kept for the record.
  C  codegen  — pure-JVM aggregate() fold under a when(hit) guard:
                no Python boundary at all.  SHIPPED in r12 (train_bpe
                now uses bpe._contains_pair/_merge_fold).
  D  codegen + lazy checkpoint — C with eager=False (re-test of r11
                rejection #8 now that the per-round compute is cheap).

Measured (fresh sessions, min-of-3, sf0.1): A 11.28 s [13.14, 11.28,
11.48]; C 7.25 s [7.99, 7.38, 7.25]; warm merge-phase split A 14.2 s
vs C 4.6 s.  In-session cross-variant interference inflates whichever
variant runs second (C read 24.5 s right after A's 20 UDF-plan
checkpoints in one shared session), so the shipped comparison uses
fresh sessions per variant.

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


from subgraph_extractor_spark.operators.bpe import (  # noqa: E402
    _contains_pair,
    _merge_fold,
)
from pyspark.sql.functions import pandas_udf  # noqa: E402


def _apply_merge_udf(a: str, b: str):
    """The RETIRED r11 Arrow kernel (kept here as the A/B baseline —
    variants A/B replay the old shape against the shipped codegen
    fold)."""

    @pandas_udf("array<string>")
    def apply(col: pd.Series) -> pd.Series:
        return col.map(lambda s: bpe_ops.merge_word(list(s), a, b))

    return apply


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
                "syms", _apply_merge_udf(a, b)(F.col("syms"))
            ).localCheckpoint(eager=True)
        elif variant == "B":
            hit = state.filter(_contains_pair(a, b)).withColumn(
                "syms", _apply_merge_udf(a, b)(F.col("syms"))
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
    phase_split: dict[str, dict] = {}
    for v in variants:
        # warm-up + phase split
        phases: dict[str, float] = {}
        spark.sparkContext.setJobDescription(f"bpe_ab:{v}:warmup")
        m = _train(wf, v, phases)
        phase_split[v] = phases
        if ref is None:
            ref = m
        assert m == ref, f"variant {v} merges differ: {m[:3]} vs {ref[:3]}"
        print(
            f"variant {v} warm phase split: "
            f"argmax {phases.get('argmax', 0):.2f}s, "
            f"merge+ckpt {phases.get('merge', 0):.2f}s",
            flush=True,
        )
    # interleaved timed passes (host shows multi-second contention
    # bursts — interleaving keeps the A/B comparison within-window)
    times: dict[str, list] = {v: [] for v in variants}
    for i in range(n):
        for v in variants:
            gc.collect()
            spark.sparkContext.setJobDescription(f"bpe_ab:{v}:pass{i}")
            t0 = time.time()
            m = _train(wf, v)
            dt = time.time() - t0
            assert m == ref
            times[v].append(dt)
    results = {v: round(min(ts), 3) for v, ts in times.items()}
    for v in variants:
        print(v, "min", results[v], [round(t, 2) for t in times[v]], flush=True)
    print("RESULTS", results)
    spark.stop()


if __name__ == "__main__":
    main()
