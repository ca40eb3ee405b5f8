"""Similarity search over embedding columns (array<float>).

Driver-mandated extension (BASELINE.json): approximate-nearest-neighbor
over ``embeddings.embedding``.

Two tiers:

- ``brute_force_topk``    — exact top-k by cosine: per-query ranking via a
  window over the cross product.  Correctness baseline; O(Q x N) but fully
  vectorized JVM-side (higher-order functions, no Python), and the corpus
  side broadcasts when small.
- ``lsh_bucketed_pairs`` / ``ann_topk_lsh`` — the scale path: random
  hyperplane sign-LSH.  Each vector gets a compact bit signature computed
  from FIXED pseudo-random hyperplanes (deterministic literals, seeded);
  candidates share a signature band, so the join is an equi-join on
  (band, band_value) — shuffle keys only, never a cross product.

All vector math is built-in Catalyst HOFs (zip_with + aggregate), i.e.
sequential left-fold dot products — deterministic bit-for-bit, which the
differential harness relies on.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    broadcast_corpus: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    Output: (query_id, neighbor_id, rank) — rank 1 = most similar,
    deterministic tie-break on neighbor id.  Self-matches are excluded
    when queries and corpus share the id space.

    Scale notes: the corpus side is broadcast (no shuffle) when it fits;
    at larger corpus sizes flip to ``ann_topk_lsh``.  The per-query top-k
    is a rank-filter window — Spark executes it as a running
    WindowExec after an in-partition sort of each query's candidates.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    if broadcast_corpus:
        c = F.broadcast(c)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("_sim", cosine_similarity(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 13) -> list[list[float]]:
    """Fixed pseudo-random Gaussian hyperplanes — literals in the plan, so
    signatures are reproducible across runs/sessions/clusters."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).tolist()


def sign_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Array of sign bits (int 0/1), one per hyperplane."""
    return F.array(
        *[
            F.when(
                dot(vec, F.array(*[F.lit(float(w)) for w in plane])) >= 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            for plane in planes
        ]
    )


def lsh_bucketed_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int = 64,
    bits: int = 64,
    bands: int = 16,
    seed: int = 13,
) -> DataFrame:
    """Candidate pairs sharing at least one LSH signature band.
    Output: (id_a, id_b), id_a < id_b."""
    rows = bits // bands
    planes = _hyperplanes(dim, bits, seed)
    sig = df.select(
        F.col(id_col).alias("_id"),
        sign_signature(F.col(vec_col), planes).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "", F.transform(F.slice(F.col("_sig"), b * rows + 1, rows), lambda x: x.cast("string"))
                    ).alias("val"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.val")
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.val") == F.col("r.val"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def ann_topk_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    dim: int = 64,
    bits: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to LSH candidate
    pairs.  Output (query_id, neighbor_id, rank) like brute_force_topk;
    recall measured against the exact baseline in tests."""
    pairs = lsh_bucketed_pairs(df, vec_col, id_col, dim, bits, bands)
    sym = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    scored = (
        sym.join(vecs.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_v", "_va")
        .join(vecs.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumn("_sim", cosine_similarity(F.col("_va"), F.col("_v")))
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("_sim").desc(), F.col("id_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id_a").alias("query_id"),
            F.col("id_b").alias("neighbor_id"),
            "rank",
        )
    )
