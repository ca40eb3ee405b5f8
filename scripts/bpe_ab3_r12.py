#!/usr/bin/env python3
"""A/B: train_bpe string symbols (SHIPPED) vs integer symbol ids
(r12 session 2 candidate, guide §2.3 narrower types).

A (shipped, == bpe.train_bpe): symbol state is array<string>; every
   round's pair aggregate shuffles (string, string) keys and the merge
   fold compares/concats strings.
B (candidate): symbols are int ids (driver-side id<->string dict,
   seeded from the collected alphabet, one new id per learned merge).
   The pair aggregate groups by (int, int); the argmax tie-break maps
   ids back to strings via a literal map over the AGGREGATED table
   only (|distinct pairs| rows), so the (count DESC, left ASC,
   right ASC) order — and therefore every learned merge — is identical
   by construction.  The merge fold compares ints.

Merge lists asserted identical, then interleaved min-of-N timing.
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


def _adjacent_int_pairs():
    return F.expr(
        "transform(sequence(0, size(syms) - 2), "
        "i -> struct(syms[i] AS a, syms[i+1] AS b))"
    )


def _contains_int_pair(a: int, b: int):
    return (F.size("syms") >= 2) & F.exists(
        F.zip_with(
            F.col("syms"),
            F.slice(F.col("syms"), 2, F.size("syms")),
            lambda x, y: (x == F.lit(a)) & (y == F.lit(b)),
        ),
        lambda v: v,
    )


def _merge_int_fold(a: int, b: int, fused: int):
    al, bl, fl = F.lit(a), F.lit(b), F.lit(fused)

    def step(acc, s):
        return F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == al) & (s == bl),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(fl)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(F.col("syms"), F.array().cast("array<int>"), step)


def train_bpe_int(wf, num_merges, min_count=2):
    """Candidate: int-symbol state + string-exact argmax tie-break."""
    syms0 = bpe.initial_symbols(F.col("word"))
    alphabet = sorted(
        r[0]
        for r in wf.select(
            F.explode(F.array_distinct(syms0)).alias("s")
        )
        .distinct()
        .collect()
    )
    str2id = {s: i for i, s in enumerate(alphabet)}
    id2str = {i: s for s, i in str2id.items()}

    to_id = F.create_map(
        *[x for s, i in str2id.items() for x in (F.lit(s), F.lit(i))]
    )
    state = (
        wf.select(
            "freq",
            F.transform(syms0, lambda s: to_id[s]).alias("syms"),
        ).localCheckpoint(eager=True)
    )
    merges = []
    for _ in range(num_merges):
        id_to_str = F.create_map(
            *[x for i, s in id2str.items() for x in (F.lit(i), F.lit(s))]
        )
        best = (
            state.filter(F.size("syms") >= 2)
            .select("freq", F.explode(_adjacent_int_pairs()).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            # the tie-break must be on the STRING symbols — map the
            # |distinct pairs| aggregated rows, never the stream
            .select(
                "a",
                "b",
                "cnt",
                id_to_str[F.col("a")].alias("sa"),
                id_to_str[F.col("b")].alias("sb"),
            )
            .orderBy(F.desc("cnt"), F.asc("sa"), F.asc("sb"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        sa, sb = best[0]["sa"], best[0]["sb"]
        fused_str = sa + sb
        nid = len(id2str)
        id2str[nid] = fused_str
        merges.append((sa, sb, cnt))
        state = state.withColumn(
            "syms",
            F.when(
                _contains_int_pair(a, b), _merge_int_fold(a, b, nid)
            ).otherwise(F.col("syms")),
        ).localCheckpoint(eager=True)
    return merges


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "3"))
    spark = get_spark(
        "bpe_ab3_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    wf = bpe.word_freqs(docs, "text").persist()
    wf.count()

    ma = bpe.train_bpe(wf, 20, 2)
    mb = train_bpe_int(wf, 20, 2)
    assert ma == mb, f"merge lists differ:\nA={ma}\nB={mb}"
    print(f"merge lists identical ({len(ma)} merges)")

    def run(tag, fn):
        spark.sparkContext.setJobDescription(f"bpe_ab3:{tag}")
        t0 = time.perf_counter()
        fn(wf, 20, 2)
        return time.perf_counter() - t0

    times = {"A_strings": [], "B_int_ids": []}
    for _ in range(n):
        times["A_strings"].append(run("A", bpe.train_bpe))
        times["B_int_ids"].append(run("B", train_bpe_int))
    for k, v in times.items():
        print(f"{k}: min {min(v):.3f}  all {[round(x, 3) for x in v]}")


if __name__ == "__main__":
    main()
