#!/usr/bin/env python3
"""Dedup scale sweep (r9 verdict task #5): measure how the two
sub-quadratic near-dup pipelines ACTUALLY grow with corpus size —
`minhash_dedup_pairs` (MinHash-LSH banding + exact verification) and
`prefix_filter_pairs` (AllPairs/PPJoin prefix filtering) — the
empirical anchor for the 100 TB claim, the same way
serving_scale_bench.py anchored the IVF-PQ nprobe/n_cells claim.

Protocol: synthesize a deterministic corpus of ~40-token documents
over a size-scaled vocabulary (uniform draws — gram collisions then
come only from the PLANTED near-duplicates, so candidate volume is
output-bound, the regime the sub-quadratic claim is about); every
10th document is a near-copy of its predecessor (one 4-token span
rewritten → shingle Jaccard ≈ 0.75).  Write to parquet OUTSIDE the
timed window, then time each operator end-to-end (pair generation +
exact verification + materialization), min over PASSES runs, at each
corpus size.  The fitted log-log exponent between consecutive sizes
is the headline number: ~1 = linear in documents, 2 = the quadratic
brute-force curve (the all-pairs theta-join measured 1041 s at a mere
sf0.1 — see q_dedup_ngram_jaccard — which is why no brute-force
column appears beyond the smallest size).

Usage: python scripts/dedup_scale_bench.py [sizes...]
       (default 25000 100000 250000)
"""

from __future__ import annotations

import gc
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

PASSES = 2
DOC_TOKENS = 40
DUP_EVERY = 10
THRESHOLD = 0.5


def synth_corpus(n: int, seed: int = 11) -> list[str]:
    """Deterministic ~40-token documents over a size-scaled vocabulary;
    every DUP_EVERY-th document near-copies its predecessor with one
    4-token span rewritten (planted near-dup, J ≈ 0.75)."""
    rng = np.random.RandomState(seed)
    vocab = max(20_000, n)
    toks = rng.randint(0, vocab, size=(n, DOC_TOKENS))
    for i in range(1, n, DUP_EVERY):
        toks[i] = toks[i - 1]
        pos = int(rng.randint(0, DOC_TOKENS - 4))
        toks[i, pos : pos + 4] = rng.randint(0, vocab, size=4)
    return [" ".join(f"t{v}" for v in row) for row in toks]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 100_000, 250_000]
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import dedup as D

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "dedup_scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: list[tuple[int, float, float, int, int]] = []
    print("corpus_n | minhash_lsh (s) | prefix_filter (s) | mh_pairs | pf_pairs")
    for n in sizes:
        texts = synth_corpus(n)
        tmp = tempfile.mkdtemp(prefix="dedup_scale_")
        papq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            ),
            f"{tmp}/docs.parquet",
        )
        docs = spark.read.parquet(f"{tmp}/docs.parquet")
        docs = docs.repartition(32).persist()
        docs.count()

        mh_t, pf_t, mh_pairs, pf_pairs = float("inf"), float("inf"), 0, 0
        for _ in range(PASSES):
            t0 = time.time()
            mh_pairs = D.minhash_dedup_pairs(
                docs, "text", "doc_id", threshold=THRESHOLD
            ).count()
            mh_t = min(mh_t, round(time.time() - t0, 2))
            t0 = time.time()
            pf_pairs = D.prefix_filter_pairs(
                docs, "doc_id", "text", threshold=THRESHOLD
            ).count()
            pf_t = min(pf_t, round(time.time() - t0, 2))
            gc.collect()
        print(f"{n} | {mh_t} | {pf_t} | {mh_pairs} | {pf_pairs}")
        results.append((n, mh_t, pf_t, mh_pairs, pf_pairs))

        docs.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)

    print("\nfitted log-log exponents between consecutive sizes")
    print("(1.0 = linear in documents, 2.0 = the brute-force curve):")
    for (n1, m1, p1, *_), (n2, m2, p2, *_) in zip(results, results[1:]):
        r = math.log(n2 / n1)
        print(
            f"{n1} -> {n2}: minhash {math.log(m2 / m1) / r:.2f}, "
            f"prefix {math.log(p2 / p1) / r:.2f}"
        )
    print("loadavg_end", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
