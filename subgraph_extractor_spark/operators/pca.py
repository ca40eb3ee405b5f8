"""Exact second-moment statistics over an embedding corpus + PCA
whitening on top.

Embedding post-processing (PCA dimension reduction, whitening /
decorrelation, ABTT-style top-component removal) starts from one
object: the d x d covariance of the corpus.  At 100 TB the only sane
way to get it is the classic tree aggregation of per-partition partial
X^T X — never a row explosion into (i, j) pairs (a d^2 amplification
of the corpus), never a driver-side matrix accumulation over
``collect()``.

This module computes the statistics EXACTLY, on the repo's integer
fixed-point discipline (operators/clustering.py quantization): per
Arrow batch a numpy int64 ``Q^T Q`` / column sum / row count, partials
fold through ONE map-side-combined groupBy, and the centered comoment

    M[i][j] = n * sum(q_i q_j) - sum(q_i) * sum(q_j)      (= n^2 * cov)

is assembled in DECIMAL(38,0) (its magnitude is bounded by
n^2 * 2^(2*scale_bits + 2), past BIGINT for large corpora — exact
decimal arithmetic is engine-portable where a float accumulation is
not).  The full (i, j, n, sum_i, sum_j, comoment) table is therefore
bit-portable and full-value oracle-checkable against a DuckDB unnest
replay — distributed exact covariance, certified cross-engine.

``pca_whiten`` eigendecomposes the d x d comoment on the driver
(bounded model state — the same artifact class as k-means centroids)
and applies the whitening projection with the batched-BLAS Arrow
kernel pattern of ``similarity.random_projection_arrow``.  Eigenvalues
and eigenvectors are float (LAPACK), so the projection itself is
python-replica-tested rather than SQL-oracled — the same split as
BM25's log-idf face; the covariance input it consumes IS oracled.

int64 safety inside the kernel: |q| <= 2^(scale_bits+1), so a product
is <= 2^(2*scale_bits+2) and a per-batch sum over B rows needs
B * 2^(2*scale_bits+2) < 2^63 — at the default scale_bits=16 that is
B < 2^27 rows per Arrow batch (real batches are ~10^4).  numpy wraps
silently, so the kernel raises ValueError per batch when
rows * max|q|^2 would exceed 2^63 (measured against the batch's
actual magnitudes, not the unit-scale assumption); the cross-batch
fold runs in Spark BIGINT under ANSI (hard error on overflow), and the
final comoment in exact DECIMAL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_comoments(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale_bits: int = 16,
) -> DataFrame:
    """(i, j, n, sum_i, sum_j, comoment) for the upper triangle
    (i <= j) of the quantized corpus — comoment = n^2 * covariance
    (population), an exact DECIMAL(38,0) carried as a string so it
    survives pandas round-trips losslessly at any magnitude (the
    repo's >2^53-integer convention).

    One mapInPandas pass emits d*(d+3)/2 + 1 partial rows per Arrow
    batch (the flattened upper-triangle P, the column sums as (i, -1)
    rows, and one (-1, -1) count row); ONE groupBy(i, j) folds
    partials.  Nothing about the plan depends on corpus size except
    the scan."""
    scale = float(1 << scale_bits)
    limit = (1 << 63) - 1

    def _partials(batches):
        for pdf in batches:
            rows = [
                v for v in pdf[vec_col].tolist()
                if v is not None and len(v) == dim
            ]
            out_i, out_j, out_v = [], [], []
            if rows:
                q = np.floor(
                    np.asarray(rows, dtype=np.float64) * scale
                ).astype(np.int64)
                # silent-wrap guard: numpy int64 wraps, so the batch
                # must fit the envelope BEFORE the matmul.  Bounded
                # against the ACTUAL max |q| of this batch (not the
                # unit-scale assumption), and raised explicitly — a
                # bare assert is stripped under `python -O`.
                m = int(np.abs(q).max())
                if q.shape[0] * m * m >= limit:
                    raise ValueError(
                        "pca comoment batch overflow envelope: "
                        f"{q.shape[0]} rows * max|q|^2 ({m}^2) >= 2^63;"
                        " lower scale_bits or spark.sql.execution."
                        "arrow.maxRecordsPerBatch"
                    )
                p = q.T @ q
                s = q.sum(axis=0)
                for i in range(dim):
                    for j in range(i, dim):
                        out_i.append(i)
                        out_j.append(j)
                        out_v.append(int(p[i, j]))
                    out_i.append(i)
                    out_j.append(-1)
                    out_v.append(int(s[i]))
            out_i.append(-1)
            out_j.append(-1)
            out_v.append(len(rows))
            yield pd.DataFrame({"i": out_i, "j": out_j, "v": out_v})

    partials = df.select(vec_col).mapInPandas(
        _partials, schema="i int, j int, v long"
    )
    folded = (
        partials.groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .persist()
    )
    try:
        n_anchor = folded.filter(
            (F.col("i") == -1) & (F.col("j") == -1)
        ).select(F.col("v").alias("_n"))
        sums = folded.filter(
            (F.col("j") == -1) & (F.col("i") >= 0)
        ).select(F.col("i").alias("_si"), F.col("v").alias("_s"))
        prods = folded.filter(F.col("j") >= 0).select("i", "j", "v")
        dec = "decimal(38,0)"
        out = (
            prods.join(
                sums.withColumnRenamed("_si", "i").withColumnRenamed(
                    "_s", "sum_i"
                ),
                "i",
            )
            .join(
                sums.withColumnRenamed("_si", "j").withColumnRenamed(
                    "_s", "sum_j"
                ),
                "j",
            )
            .crossJoin(F.broadcast(n_anchor))
            .select(
                "i",
                "j",
                F.col("_n").alias("n"),
                "sum_i",
                "sum_j",
                (
                    F.col("_n").cast(dec) * F.col("v").cast(dec)
                    - F.col("sum_i").cast(dec) * F.col("sum_j").cast(dec)
                )
                .cast(dec)
                .cast("string")
                .alias("comoment"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        folded.unpersist()


def comoments_oracle_sql(
    table: str,
    vec_col: str,
    dim: int,
    scale_bits: int = 16,
) -> str:
    """DuckDB replay of :func:`embedding_comoments`: the quantized
    long-format unnest joined with itself on the row id, i <= j —
    fixture-scale ground truth for the tree-aggregated kernel (the
    d^2 row amplification this replay takes is exactly what the
    operator avoids at scale).  HUGEINT throughout, comoment rendered
    as a string like the Spark side."""
    scale = 1 << scale_bits
    return f"""
        WITH ql AS MATERIALIZED (
            SELECT rid, gi - 1 AS i, v
            FROM (
                SELECT ROW_NUMBER() OVER () AS rid,
                       generate_subscripts(q, 1) AS gi, unnest(q) AS v
                FROM (
                    SELECT list_transform({vec_col},
                        x -> CAST(floor(CAST(x AS DOUBLE) * {scale})
                                  AS BIGINT)) AS q
                    FROM {table}
                    WHERE {vec_col} IS NOT NULL
                      AND len({vec_col}) = {dim}))),
        nn AS (SELECT COUNT(DISTINCT rid) AS n FROM ql),
        s AS (SELECT i, CAST(SUM(v) AS BIGINT) AS sv
              FROM ql GROUP BY i),
        p AS (
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(a.v * b.v) AS HUGEINT) AS pv
            FROM ql a JOIN ql b ON a.rid = b.rid AND a.i <= b.i
            GROUP BY a.i, b.i)
        SELECT p.i, p.j,
               CAST(nn.n AS BIGINT) AS n,
               si.sv AS sum_i,
               sj.sv AS sum_j,
               CAST(nn.n::HUGEINT * p.pv
                    - si.sv::HUGEINT * sj.sv::HUGEINT
                    AS VARCHAR) AS comoment
        FROM p
        JOIN s si ON si.i = p.i
        JOIN s sj ON sj.i = p.j
        CROSS JOIN nn
    """


def pca_components(
    comoments: DataFrame, dim: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Eigendecomposition of the collected comoment matrix (d x d —
    bounded model state).  Returns (eigenvalues desc, eigenvectors as
    rows, n).  Float from here on (LAPACK) — see module docstring."""
    rows = comoments.collect()
    n = int(rows[0]["n"]) if rows else 0
    m = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        v = float(int(r["comoment"])) / (n * n) if n else 0.0
        m[r["i"], r["j"]] = v
        m[r["j"], r["i"]] = v
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order].T, n


def remove_top_components(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int = 1,
    scale_bits: int = 16,
    out_col: str = "_abtt",
) -> DataFrame:
    """All-but-the-top (Mu & Viswanath, ICLR 2018): subtract the mean
    and project OFF the top-``k`` principal components — the standard
    embedding post-processing that removes the dominant common-
    direction energy and measurably improves cosine-similarity tasks.
    Same covariance input (oracled) and batched-BLAS Arrow projection
    shape as :func:`pca_whiten`; floats from the eigendecomposition on
    (python-replica-tested)."""
    stats = embedding_comoments(df, vec_col, dim, scale_bits)
    _, vecs, n = pca_components(stats, dim)
    if n == 0:
        raise ValueError("remove_top_components: empty corpus")
    mean_rows = {
        r["i"]: r["sum_i"] / n / (1 << scale_bits)
        for r in stats.filter(F.col("i") == F.col("j")).collect()
    }
    mean = np.array([mean_rows[i] for i in range(dim)])
    top = vecs[:k]  # k x dim, orthonormal rows

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def _abtt(s: pd.Series) -> pd.Series:
        vals_ = s.tolist()
        valid = [
            (ix, v)
            for ix, v in enumerate(vals_)
            if v is not None and len(v) == dim
        ]
        out = [None] * len(vals_)
        if valid:
            x = np.asarray([v for _, v in valid], dtype=np.float64) - mean
            y = x - (x @ top.T) @ top
            for (ix, _), row in zip(valid, y):
                out[ix] = [float(c) for c in row]
        return pd.Series(out)

    return df.withColumn(out_col, _abtt(F.col(vec_col)))


def pca_whiten(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    scale_bits: int = 16,
    eps: float = 1e-9,
    out_col: str = "_white",
) -> DataFrame:
    """Project every embedding onto the top-``k`` principal components
    and rescale each to unit variance (PCA whitening).  The covariance
    comes from :func:`embedding_comoments` (oracled); the projection
    applies ``(x - mean) @ W.T`` per Arrow batch — the
    random_projection_arrow shape: map-only, batched BLAS, NULL/
    wrong-length rows project to NULL."""
    stats = embedding_comoments(df, vec_col, dim, scale_bits)
    vals, vecs, n = pca_components(stats, dim)
    if n == 0:
        raise ValueError("pca_whiten: empty corpus")
    mean_rows = {
        r["i"]: r["sum_i"] / n / (1 << scale_bits)
        for r in stats.filter(F.col("i") == F.col("j")).collect()
    }
    mean = np.array([mean_rows[i] for i in range(dim)])
    scale_back = float(1 << scale_bits)
    std = np.sqrt(np.maximum(vals[:k], 0.0)) / scale_back + eps
    w = vecs[:k] / std[:, None]

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def _whiten(s: pd.Series) -> pd.Series:
        vals_ = s.tolist()
        valid = [
            (ix, v)
            for ix, v in enumerate(vals_)
            if v is not None and len(v) == dim
        ]
        out = [None] * len(vals_)
        if valid:
            x = np.asarray([v for _, v in valid], dtype=np.float64)
            y = (x - mean) @ w.T
            for (ix, _), row in zip(valid, y):
                out[ix] = [float(c) for c in row]
        return pd.Series(out)

    return df.withColumn(out_col, _whiten(F.col(vec_col)))
