#!/usr/bin/env python3
"""Lexical-serving scale sweep: champion-list serving vs a full BM25
scan as the corpus grows — the measured anchor for the champion-list
pruning claim (cost O(|terms| * m) at ANY corpus size), the same
protocol as serving_scale_bench.py (ANN) and dedup_scale_bench.py
(dedup): state built OUTSIDE the timed window, serving timed min-of-N
at several corpus sizes.

Corpus: deterministic ~40-token documents over a FIXED 20k-word
vocabulary (lexical serving needs term overlap, unlike the dedup
sweep's collision-free draws); query = 3 mid-frequency terms.  The
champion state is materialized (persisted) like a deployment's standing
index; BM25 re-scans the corpus per query batch — exactly the
comparison the pruning exists to win.

Usage: python scripts/retrieval_scale_bench.py [sizes...]
       (default 25000 100000 250000)
"""

from __future__ import annotations

import gc
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

PASSES = 3
DOC_TOKENS = 40
VOCAB = 20_000
TERMS = ["t17", "t423", "t1871"]  # mid-frequency under the zipf draw


def synth_corpus(n: int, seed: int = 13) -> list[str]:
    rng = np.random.RandomState(seed)
    # zipf-ish: mixture of a small hot head and a uniform tail, so the
    # corpus has realistic df spread without degenerate stopwords
    hot = rng.randint(0, 2_000, size=(n, DOC_TOKENS // 2))
    tail = rng.randint(0, VOCAB, size=(n, DOC_TOKENS - DOC_TOKENS // 2))
    toks = np.concatenate([hot, tail], axis=1)
    return [" ".join(f"t{v}" for v in row) for row in toks]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 100_000, 250_000]
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import retrieval as R

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "retrieval_scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("corpus_n | champion_topk (s) | bm25_topk full scan (s) | champion state rows")
    for n in sizes:
        texts = synth_corpus(n)
        tmp = tempfile.mkdtemp(prefix="retr_scale_")
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

        # standing index: built + materialized OUTSIDE the timed window
        champs = R.champion_lists(docs, "doc_id", "text", m=16).persist()
        state_rows = champs.count()

        ch_t, bm_t = float("inf"), float("inf")
        for _ in range(PASSES):
            t0 = time.time()
            R.champion_topk(champs, TERMS, k=10).count()
            ch_t = min(ch_t, round(time.time() - t0, 3))
            t0 = time.time()
            R.bm25_topk(docs, "doc_id", "text", TERMS, k=10).count()
            bm_t = min(bm_t, round(time.time() - t0, 3))
            gc.collect()
        print(f"{n} | {ch_t} | {bm_t} | {state_rows}")

        champs.unpersist()
        docs.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    print("loadavg_end", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
