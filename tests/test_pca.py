"""Exact embedding comoments + PCA whitening (operators/pca.py)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import pca


def _rows(seed, n, dim):
    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


def _df(spark, rows, parts=7):
    return spark.createDataFrame(
        [(v,) for v in rows], "vec array<float>"
    ).repartition(parts)


def _ref_comoments(rows, dim, scale_bits=16):
    s = 1 << scale_bits
    q = [
        [math.floor(float(np.float32(x)) * s) for x in v]
        for v in rows
        if v is not None and len(v) == dim
    ]
    n = len(q)
    out = {}
    for i in range(dim):
        for j in range(i, dim):
            p = sum(r[i] * r[j] for r in q)
            si = sum(r[i] for r in q)
            sj = sum(r[j] for r in q)
            out[(i, j)] = (n, si, sj, str(n * p - si * sj))
    return out


def test_comoments_match_reference(spark):
    rows = _rows(3, 80, 6)
    got = {
        (r["i"], r["j"]): (r["n"], r["sum_i"], r["sum_j"], r["comoment"])
        for r in pca.embedding_comoments(_df(spark, rows), "vec", 6).collect()
    }
    assert got == _ref_comoments(rows, 6)


def test_comoments_partitioning_invariance_and_dirty_rows(spark):
    rows = _rows(5, 40, 4)
    dirty = rows + [None, [0.1, 0.2]]  # NULL + wrong length drop out
    df_dirty = spark.createDataFrame(
        [(v,) for v in dirty], "vec array<float>"
    )
    a = {
        (r["i"], r["j"]): r["comoment"]
        for r in pca.embedding_comoments(
            df_dirty.coalesce(1), "vec", 4
        ).collect()
    }
    b = {
        (r["i"], r["j"]): r["comoment"]
        for r in pca.embedding_comoments(
            df_dirty.repartition(11), "vec", 4
        ).collect()
    }
    c = {
        (r["i"], r["j"]): r["comoment"]
        for r in pca.embedding_comoments(_df(spark, rows), "vec", 4).collect()
    }
    assert a == b == c
    n = pca.embedding_comoments(df_dirty, "vec", 4).collect()[0]["n"]
    assert n == 40


def test_whitened_covariance_is_identity(spark):
    # correlated 2-blob data in 4 dims; whitening the top 3 components
    # must produce (empirically) unit variance, zero covariance
    rng = random.Random(9)
    rows = []
    for _ in range(300):
        t = rng.uniform(-1, 1)
        rows.append(
            [t + rng.gauss(0, 0.05), -t + rng.gauss(0, 0.05),
             0.5 * t + rng.gauss(0, 0.05), rng.gauss(0, 0.3)]
        )
    out = pca.pca_whiten(_df(spark, rows), "vec", 4, k=3)
    y = np.asarray([r["_white"] for r in out.collect()])
    assert y.shape == (300, 3)
    cov = np.cov(y.T, bias=True)
    assert np.allclose(cov, np.eye(3), atol=0.05)


def test_whiten_null_and_wrong_length_rows_stay_null(spark):
    rows = _rows(11, 30, 4)
    df = spark.createDataFrame(
        [(v,) for v in rows] + [(None,), ([0.1],)], "vec array<float>"
    )
    out = pca.pca_whiten(df, "vec", 4, k=2).collect()
    nulls = [r for r in out if r["_white"] is None]
    assert len(nulls) == 2
    assert all(len(r["_white"]) == 2 for r in out if r["_white"] is not None)


def test_whiten_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "vec array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca.pca_whiten(df, "vec", 4, k=2)


def test_remove_top_components_kills_dominant_direction(spark):
    # data = strong shared direction + small noise: after ABTT(k=1)
    # the projection onto the removed component is ~0 and the result
    # is orthogonal to it; other variance survives.
    rng = random.Random(21)
    d1 = np.array([1.0, 1.0, 1.0, 1.0]) / 2.0
    rows = []
    for _ in range(200):
        t = rng.uniform(-2, 2)
        noise = np.array([rng.gauss(0, 0.1) for _ in range(4)])
        rows.append([float(x) for x in (t * d1 + noise)])
    out = pca.remove_top_components(_df(spark, rows), "vec", 4, k=1)
    y = np.asarray([r["_abtt"] for r in out.collect()])
    # projections onto the dominant direction vanish
    assert np.abs(y @ d1).max() < 0.15
    # residual noise energy survives (not the zero map)
    assert np.abs(y).max() > 0.05


def test_remove_top_components_null_rows(spark):
    rows = _rows(23, 20, 4)
    df = spark.createDataFrame(
        [(v,) for v in rows] + [(None,)], "vec array<float>"
    )
    out = pca.remove_top_components(df, "vec", 4, k=1).collect()
    assert sum(1 for r in out if r["_abtt"] is None) == 1


def test_comoments_batch_overflow_raises(spark):
    """ADVICE r6: the per-batch numpy guard must survive `python -O`
    (explicit ValueError, not assert) and bound against the ACTUAL
    max |q| — scale_bits=32 puts a unit vector's q at ~2^32, so even
    one row exceeds rows*max|q|^2 < 2^63."""
    df = _df(spark, [[0.9, 0.9], [0.5, -0.5]], parts=1)
    with pytest.raises(Exception, match="overflow envelope"):
        pca.embedding_comoments(df, "vec", 2, scale_bits=32).collect()
