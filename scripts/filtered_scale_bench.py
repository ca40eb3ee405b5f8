#!/usr/bin/env python3
"""Filtered-search scale sweep (r11 continuation): measure how the two
filtered-search faces ACTUALLY grow when label blocks grow with the
corpus — `filtered_quantized_topk` (exact within-block all-pairs) and
`filtered_banded_topk` (label + sign-LSH band candidates) — the
dedup_scale_bench protocol applied to the operator pair the sf1.0
full-headline sweep flagged (exact face 74x at 10x data, the worst
entry on the board).

Protocol: synthesize n float32 vectors (dim 64, N(0,1)) over a FIXED
label count (20), so blocks grow linearly with the corpus — the
production regime where a language/tenant partition is a constant
fraction of the data and the exact face's Σ_b |block|² goes
quadratic.  Every 10th vector is a planted SAME-LABEL near-duplicate
of its predecessor (v + 0.2·noise, cosine ≈ 0.98) — on uniform
Gaussian data band collisions then come (almost) only from the
planted structure, so banded candidate volume is output-bound, the
regime the sub-quadratic claim is about.  Write parquet OUTSIDE the
timed window; time each face end-to-end (min over PASSES); report the
planted-pair recall of the banded face AT EVERY SIZE — the scale
claim is only honest if recall does not decay as blocks grow.

The exact face is timed at the two smallest sizes only (the measured
~2 exponent makes larger points minutes-to-hours, exactly the point).

Usage: python scripts/filtered_scale_bench.py [sizes...]
       (default 15000 45000 135000)
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
N_LABELS = 20
DUP_EVERY = 10
DIM = 64


def synth_vectors(n: int, seed: int = 17):
    """(ids, labels, float32 vectors); every DUP_EVERY-th vector is a
    same-label near-copy of its predecessor (cosine ~= 0.98)."""
    rng = np.random.RandomState(seed)
    V = rng.normal(size=(n, DIM)).astype(np.float32)
    labels = (np.arange(n) % N_LABELS).astype(np.int32)
    for i in range(1, n, DUP_EVERY):
        V[i] = V[i - 1] + 0.2 * rng.normal(size=DIM).astype(np.float32)
        labels[i] = labels[i - 1]
    return np.arange(n, dtype=np.int64), labels, V


def planted_pairs(n: int):
    return [(i - 1, i) for i in range(1, n, DUP_EVERY)]


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [15_000, 45_000, 135_000]
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.operators import similarity as S

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "filtered_scale", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    print(
        "corpus_n | banded32 (s) | b32_pairs | b32_recall | "
        "banded128w (s) | b128_pairs | b128_recall | exact (s)"
    )
    for idx, n in enumerate(sizes):
        ids, labels, V = synth_vectors(n)
        tmp = tempfile.mkdtemp(prefix="filtered_scale_")
        papq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "label": pa.array(labels),
                    "embedding": pa.array(
                        list(V), type=pa.list_(pa.float32())
                    ),
                }
            ),
            f"{tmp}/emb.parquet",
        )
        emb = spark.read.parquet(f"{tmp}/emb.parquet")
        emb = emb.repartition(32).persist()
        emb.count()

        # two banding configs: the default (32 bits / 4 bands = 8-bit
        # rows) and the WIDE one (128 bits / 8 bands = 16-bit rows).
        # On structure-free uniform data an 8-bit row only divides the
        # within-block quadratic by a constant (~2^8 per band); the
        # float face's documented scale guidance is "raise band width
        # first as the corpus grows" — the wide config measures that
        # lever: 2^16 selectivity per band, recall held by 8 bands.
        planted = planted_pairs(n)
        cfg_out = {}
        for cfg_name, bits, bands in (
            ("banded32", 32, 4), ("banded128w", 128, 8),
        ):
            t_best, pairs_n, got = float("inf"), 0, set()
            for _ in range(PASSES):
                t0 = time.time()
                out = S.filtered_banded_topk(
                    emb, "embedding", "vec_id", ["label"], k=5,
                    bits=bits, bands=bands,
                )
                rows = out.select("query_id", "neighbor_id").collect()
                t_best = min(t_best, round(time.time() - t0, 2))
                pairs_n = len(rows)
                got = {(r["query_id"], r["neighbor_id"]) for r in rows}
                gc.collect()
            hits = sum(
                ((a, b) in got) + ((b, a) in got) for a, b in planted
            )
            cfg_out[cfg_name] = (t_best, pairs_n, hits / (2 * len(planted)))
        banded_t, banded_pairs_n, recall = cfg_out["banded32"]
        wide_t, wide_pairs_n, wide_recall = cfg_out["banded128w"]

        exact_t = None
        if idx < 2:  # the ~2-exponent face: two points suffice
            exact_t = float("inf")
            t0 = time.time()
            S.filtered_quantized_topk(
                emb, "embedding", "vec_id", ["label"], k=5
            ).count()
            exact_t = round(time.time() - t0, 2)
        print(
            f"{n} | {banded_t} | {banded_pairs_n} | {recall:.3f} | "
            f"{wide_t} | {wide_pairs_n} | {wide_recall:.3f} | "
            f"{exact_t if exact_t is not None else '-'}"
        )
        results.append((n, banded_t, wide_t, recall, wide_recall, exact_t))

        emb.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)

    print("\nfitted log-log exponents between consecutive sizes")
    print("(1.0 = linear in vectors; blocks grow with the corpus):")
    for (n1, b1, w1, *_, e1), (n2, b2, w2, *_, e2) in zip(
        results, results[1:]
    ):
        r = math.log(n2 / n1)
        line = (
            f"{n1} -> {n2}: banded32 {math.log(b2 / b1) / r:.2f}, "
            f"banded128w {math.log(w2 / w1) / r:.2f}"
        )
        if e1 and e2:
            line += f", exact {math.log(e2 / e1) / r:.2f}"
        print(line)
    print("loadavg_end", round(os.getloadavg()[0], 2))
    spark.stop()


if __name__ == "__main__":
    main()
