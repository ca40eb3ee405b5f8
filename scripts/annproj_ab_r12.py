#!/usr/bin/env python3
"""Round-12 interleaved A/B for projected_topk_portable's coarse
kernel (ann_projected): the r11 shape (full-row two-key lexsort
top-kk) vs the r12 shape (argpartition top-kk CLOSURE — emit every
candidate >= the kk-th value; the global merge window resolves the
boundary ties).  Both run inside the SAME session, interleaved, over
the sf0.1 embeddings; row sets asserted identical after the window.

Measured (interleaved min-of-3, per-tile kernel phase split on
stderr): select 8.1-11.2 s (lexsort) -> 0.13-0.15 s (closure); the
int64 matmul converges to ~1.0 s in-worker.  A split-to-float64 BLAS
matmul (exact under a 2^53 envelope guard, bit-identical results) was
measured and REJECTED: 14-30 s per tile inside the forked PySpark
worker vs ~1 s for the plain int64 path — the fork-inherited BLAS
threadpool misbehaves in workers (the same f64 matmul runs
milliseconds in the driver process).  Usage:

    python scripts/annproj_ab_r12.py [passes]
"""
from __future__ import annotations

import gc
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import Window, functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import ArrayType, LongType  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import similarity as sim  # noqa: E402
from subgraph_extractor_spark.sources.readers import load_table  # noqa: E402


def build(df, kernel: str, k=5, out_dim=32, in_dim=64, expand=30,
          seed="rp", scale_bits=10, phases=None):
    """projected_topk_portable with a selectable coarse kernel."""
    spark = df.sparkSession
    W = np.array(
        sim.int_projection_matrix(in_dim, out_dim, seed), dtype=np.int64
    ).T
    scale = float(1 << scale_bits)

    @pandas_udf(ArrayType(LongType()))
    def int_proj(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(
            vecs.map(lambda v: np.asarray(v, dtype=np.float64)).to_numpy()
        )
        Q = np.floor(M * scale).astype(np.int64)
        return pd.Series(list(Q @ W))

    @pandas_udf(LongType())
    def int_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        A = np.concatenate(a.to_numpy()).astype(np.int64, copy=False)
        B = np.concatenate(b.to_numpy()).astype(np.int64, copy=False)
        A = A.reshape(len(a), -1)
        B = B.reshape(len(b), -1)
        return pd.Series((A * B).sum(axis=1))

    S = sim._n_shards(df, None)
    # "new" mirrors the shipped r12 shape: work-bounded query tiles
    SQ = sim._n_query_tiles(
        df, S, row_bytes=in_dim * 8 + 16, inner_dim=out_dim
    ) if kernel == "new" else 1
    key = "_tile"
    id_type = dict(df.dtypes)["vec_id"]
    base = df.filter(F.col("embedding").isNotNull())
    proj = base.select(
        F.col("vec_id").alias("_id"), int_proj(F.col("embedding")).alias("_p")
    )
    qtiles = spark.range(SQ).select(F.col("id").cast("int").alias("_qt"))
    c = (
        proj.select(
            sim._shard_of(F.col("_id"), S).alias("_shard"),
            F.col("_id").alias("_cid"),
            F.col("_p").alias("_cv"),
        )
        .crossJoin(F.broadcast(qtiles))
        .select(
            (F.col("_qt") * S + F.col("_shard")).alias(key), "_cid", "_cv"
        )
    )
    shards = spark.range(S).select(F.col("id").cast("int").alias("_shard"))
    q = (
        proj.select(
            F.col("_id").alias("_qid"),
            F.col("_p").alias("_qv"),
            sim._shard_of(F.col("_id"), SQ).alias("_qt"),
        )
        .crossJoin(F.broadcast(shards))
        .select(
            (F.col("_qt") * S + F.col("_shard")).alias(key), "_qid", "_qv"
        )
    )
    kk_target = k * expand
    MASK = np.iinfo(np.int64).min + 1

    def shard_topk(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "_pdot": pd.Series([], dtype="int64"),
                }
            )
        t0 = time.time()
        if kernel == "old":
            Q = np.stack(
                qpdf["_qv"].map(
                    lambda v: np.asarray(v, dtype=np.int64)
                ).to_numpy()
            )
            C = np.stack(
                cpdf["_cv"].map(
                    lambda v: np.asarray(v, dtype=np.int64)
                ).to_numpy()
            )
        else:
            Q = np.concatenate(qpdf["_qv"].to_numpy()).astype(
                np.int64, copy=False
            ).reshape(len(qpdf), -1)
            C = np.concatenate(cpdf["_cv"].to_numpy()).astype(
                np.int64, copy=False
            ).reshape(len(cpdf), -1)
        t1 = time.time()
        c_ids = cpdf["_cid"].to_numpy()
        q_ids = qpdf["_qid"].to_numpy()
        D = Q @ C.T  # both variants: int64 matmul (see header note)
        t2 = time.time()
        for i, qid in enumerate(q_ids):
            D[i, c_ids == qid] = MASK
        kk = min(kk_target, D.shape[1])
        if kernel == "old":
            cid_b = np.broadcast_to(c_ids, D.shape)
            order = np.lexsort((cid_b, -D), axis=1)[:, :kk]
            dots = np.take_along_axis(D, order, axis=1).ravel()
            cids = np.take_along_axis(cid_b, order, axis=1).ravel()
            qcol = np.repeat(q_ids, kk)
            keep = dots != MASK
            out = pd.DataFrame(
                {
                    "query_id": qcol[keep],
                    "neighbor_id": cids[keep],
                    "_pdot": dots[keep],
                }
            )
        else:
            part = np.argpartition(-D, kk - 1, axis=1)[:, :kk]
            cutoff = np.take_along_axis(D, part, axis=1).min(
                axis=1, keepdims=True
            )
            rows, cols = np.nonzero(D >= cutoff)
            dots = D[rows, cols]
            keep = dots != MASK
            out = pd.DataFrame(
                {
                    "query_id": q_ids[rows[keep]],
                    "neighbor_id": c_ids[cols[keep]],
                    "_pdot": dots[keep],
                }
            )
        t3 = time.time()
        # kernel phase timing rides stderr (executor log) — and a
        # driver-side accumulator-free print is enough for ONE task
        print(
            f"KERNEL {kernel}: stack {t1-t0:.2f}s matmul {t2-t1:.2f}s "
            f"select {t3-t2:.2f}s rows_out {len(out)}",
            file=sys.stderr, flush=True,
        )
        return out

    scored = (
        q.groupby(key)
        .cogroup(c.groupby(key))
        .applyInPandas(
            shard_topk,
            schema=f"query_id {id_type}, neighbor_id {id_type}, _pdot long",
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("_pdot").desc(), F.col("neighbor_id").asc()
    )
    coarse = (
        scored.withColumn("_cr", F.row_number().over(wc))
        .filter(F.col("_cr") <= kk_target)
        .select("query_id", "neighbor_id")
    )
    qint = base.select(
        F.col("vec_id").alias("_iid"),
        sim.quantize_int_vec(F.col("embedding"), scale_bits).alias("_iq"),
    )
    pairs = (
        coarse.join(
            qint.select(
                F.col("_iid").alias("query_id"), F.col("_iq").alias("_qa")
            ),
            "query_id",
        )
        .join(
            qint.select(
                F.col("_iid").alias("neighbor_id"), F.col("_iq").alias("_qb")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            int_dot(F.col("_qa"), F.col("_qb")).alias("qdot"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "qdot", "rank")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("annproj_ab", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()
    variants = ["old", "new"]
    ref = None
    times = {v: [] for v in variants}
    # one untimed warm-up each
    for v in variants:
        rows = sorted(map(tuple, build(emb, v).collect()))
        if ref is None:
            ref = rows
        assert rows == ref, f"VALUE DIVERGENCE in {v}"
    for i in range(n):
        for v in variants:
            gc.collect()
            spark.sparkContext.setJobDescription(f"annproj:{v}:p{i}")
            t0 = time.time()
            build(emb, v).count()
            times[v].append(time.time() - t0)
    for v in variants:
        print(v, "min", round(min(times[v]), 3),
              [round(t, 2) for t in times[v]], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
