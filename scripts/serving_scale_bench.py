#!/usr/bin/env python3
"""One-off serving-scale bench (r8 verdict task #5): flat PQ ADC vs
IVF-PQ probed search at corpus sizes where the nprobe/n_cells saving
can actually show.

BASELINE.md's r8 "crossover" section argues from plan shape that the
IVF probe beats a flat ADC scan once the corpus dwarfs the fixed
probe-ranking overhead — but at the 2,500-vector fixture the claim is
not demonstrable.  This script MEASURES it: synthesize a clustered
corpus (seeded numpy — 64 Gaussian clusters in 64 dims, the structure
IVF exists to exploit), build the flat codes and the IVF-PQ index
OUTSIDE the timed window (amortized, like bucketed_build), then time
SEARCH ONLY — the same 200-query batch, k=3, min over 3 passes — at
several corpus sizes.  Results are copied into BASELINE.md's crossover
table.

Usage: python scripts/serving_scale_bench.py [sizes...]
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


def synth_corpus(n: int, dim: int = 64, n_clusters: int = 64, seed: int = 7):
    """Clustered float32 vectors: cluster centers ~N(0,1), members =
    center + N(0, 0.15) noise — deterministic."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    assign = rng.randint(0, n_clusters, size=n)
    vecs = centers[assign] + 0.15 * rng.standard_normal((n, dim)).astype(
        np.float32
    )
    return vecs.astype(np.float32)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [25_000, 100_000, 250_000]
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import pq as pq_ops

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "serving_scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    print(
        "corpus_n | flat pq_topk (s) | ivfpq c16 nprobe2 (s) | "
        "codes scanned flat | probed (expected n/8)"
    )
    for n in sizes:
        vecs = synth_corpus(n)
        tmp = tempfile.mkdtemp(prefix="serve_scale_")
        papq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(
                        list(vecs), type=pa.list_(pa.float32())
                    ),
                }
            ),
            f"{tmp}/emb.parquet",
        )
        emb = spark.read.parquet(f"{tmp}/emb.parquet")
        emb = emb.repartition(32).persist()
        emb.count()

        # index builds: OUTSIDE the timed window (amortized one-time
        # cost; the serving claim is about steady-state search)
        flat_books = pq_ops.pq_train_codebooks(
            emb, "embedding", "vec_id", m=8, k=8, iters=2
        )
        flat_codes = pq_ops.pq_encode(
            emb, "embedding", "vec_id", flat_books
        ).persist()
        flat_codes.count()
        cells, books, codes = pq_ops.ivfpq_build_index(
            emb, "embedding", "vec_id", n_cells=16, m=8, k_codes=8,
            iters_cells=2, iters_pq=2,
        )
        codes = codes.persist()
        codes.count()

        qbatch = emb.orderBy("vec_id").limit(200).persist()
        qbatch.count()

        flat_t, ivf_t = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.time()
            pq_ops.pq_topk(
                qbatch, flat_codes, "embedding", "vec_id", flat_books, k=3
            ).count()
            flat_t = min(flat_t, round(time.time() - t0, 3))
            t0 = time.time()
            pq_ops.ivfpq_search(
                qbatch, "embedding", "vec_id", cells, books, codes,
                nprobe=2, topk=3, n_queries=200, exclude_self=True,
            ).count()
            ivf_t = min(ivf_t, round(time.time() - t0, 3))
            gc.collect()
        print(f"{n} | {flat_t} | {ivf_t} | {n} | ~{n // 8}")

        qbatch.unpersist()
        flat_codes.unpersist()
        codes.unpersist()
        emb.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)
    print("loadavg_end", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
