#!/usr/bin/env python3
"""A/B: per-pair array_union Jaccard vs union-free carried-size form
(r12 session 3 — the prefix_filter_pairs union-free lesson generalized
to every minhash verify stage; guide §1.2 per-task work).

A (r11 shape): verify computes jaccard(a, b) per candidate pair — one
   array_intersect AND one array_union hash-set pass (the union also
   materializes a ~|A|+|B| array per pair).

B (shipped): per-doc distinct set sizes (size(array_distinct(_h)))
   are hoisted before the pair join; per pair the union size is the
   set-algebra identity |A∪B| = sa + sb - |A∩B| — ONE intersect pass
   + integer arithmetic.

BIT-identical for ANY input arrays (array_intersect/array_union
already apply set semantics; the identity holds over the distinct
views; sizes are exact in double; same final division) — asserted
below on the FULL output of all four minhash operators at bench
scale, jaccard values compared by repr.

The A passes monkeypatch jaccard_union_free back to the classic
per-pair form (sizes ignored) and _with_distinct_size to a lit(0)
column, reproducing the old plan up to one constant column.

Affected declared queries: dedup_minhash, dedup_minhash_portable,
dedup_minhash_recall, dedup_incremental, dedup_incremental_recall
(+ the test-covered prefix_filter_pairs_incremental).
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import dedup as dedup_ops  # noqa: E402

NEW_UF = dedup_ops.jaccard_union_free
NEW_WDS = dedup_ops._with_distinct_size


def set_variant(old: bool) -> None:
    if old:
        dedup_ops.jaccard_union_free = lambda a, b, sa, sb: dedup_ops.jaccard(
            a, b
        )
        dedup_ops._with_distinct_size = lambda sh, out_col="_s": sh.withColumn(
            out_col, F.lit(0)
        )
    else:
        dedup_ops.jaccard_union_free = NEW_UF
        dedup_ops._with_distinct_size = NEW_WDS


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "3"))
    spark = get_spark(
        "jaccard_uf_ab_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    new = d.filter(F.col("doc_id") % 2 == 1)
    old_corpus = d.filter(F.col("doc_id") % 2 == 0)

    ops = {
        "minhash_pairs": lambda: dedup_ops.minhash_dedup_pairs(
            d, "text", "doc_id", threshold=0.5
        ),
        "minhash_incremental": lambda: dedup_ops.minhash_dedup_incremental(
            new, old_corpus, "text", "doc_id", threshold=0.5
        ),
        "minhash_pairs_portable": lambda: dedup_ops.minhash_dedup_pairs_portable(
            d, "text", "doc_id", threshold=0.5
        ),
        "minhash_incremental_portable": (
            lambda: dedup_ops.minhash_dedup_incremental_portable(
                new, old_corpus, "text", "doc_id", threshold=0.5
            )
        ),
    }

    # ---- equivalence: full outputs, jaccard compared by repr ----
    for name, fn in ops.items():
        set_variant(True)
        a = sorted(
            (r["id_a"], r["id_b"], repr(r["jaccard"]))
            for r in fn().collect()
        )
        set_variant(False)
        b = sorted(
            (r["id_a"], r["id_b"], repr(r["jaccard"]))
            for r in fn().collect()
        )
        assert a == b, f"{name}: outputs differ"
        print(f"{name}: outputs identical ({len(a)} pairs)")

    # ---- interleaved timing, noop sink ----
    def run(name, old):
        set_variant(old)
        spark.sparkContext.setJobDescription(
            f"jaccard_uf_ab:{name}:{'A' if old else 'B'}"
        )
        t0 = time.perf_counter()
        ops[name]().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    try:
        for name in ops:
            run(name, True)
            run(name, False)
        times = {(name, v): [] for name in ops for v in ("A", "B")}
        for _ in range(n):
            for name in ops:
                times[(name, "A")].append(run(name, True))
                times[(name, "B")].append(run(name, False))
        for name in ops:
            a, b = min(times[(name, "A")]), min(times[(name, "B")])
            print(
                f"{name:30s} union {a:6.2f} -> union-free {b:6.2f}"
                f"  ({a / b:.2f}x)"
            )
    finally:
        set_variant(False)


if __name__ == "__main__":
    main()
