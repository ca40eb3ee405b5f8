"""Deterministic distributed k-means — integer fixed-point Lloyd's.

Embedding-space clustering is the organizing primitive of several
curation recipes this repo already ships pieces of: SemDeDup prunes
within clusters, cluster-balanced sampling caps each region of
embedding space, and IVF ANN (operators/similarity.py:365) routes
queries through a KMeans partition of the corpus.  The IVF build uses
``pyspark.ml`` KMeans — float arithmetic, seed-dependent, and not
checkable across engines.  This module supplies clustering as a
first-class *auditable* operator instead: every step is exact integer
arithmetic, so the full (id, cluster) assignment is bit-portable and
DuckDB-verifiable by unrolling Lloyd iterations as chained CTEs — the
same full-value-oracle discipline as the PageRank family
(operators/graph.py:248).

Arithmetic contract:

    q[i]     = floor(float64(emb[i]) * 2^scale_bits)    (exact: the
               float32->float64 widening is lossless and multiplying by
               a power of two only shifts the exponent, so the floor
               sees the true value — no cross-engine rounding anywhere)
    dist(x,c) = sum_i (x[i] - c[i])^2                   (exact BIGINT)
    assign(x) = argmin_j (dist(x, c_j), j)              (ties -> lowest
               centroid index, via lexicographic struct/tuple order)
    c'_j[i]  = fdiv(sum_{x in j} x[i], n_j)             (mathematical
               floor division, expressed as (s - pmod(s, n)) / n so
               both engines compute the identical value for negative
               sums; empty clusters keep their previous centroid)

Initial centroids are the quantized vectors of the ``k`` smallest ids —
deterministic, data-derived, no RNG.

Overflow envelope: |q[i]| <= 2^(scale_bits + 1) for unit-scale
embeddings, so a per-dimension squared term is <= 2^(2*scale_bits + 2)
and a d-dim distance <= d * 2^(2*scale_bits + 2) — at the defaults
(scale_bits=16, d<=4096) that is < 2^48.  Per-cluster per-dim sums are
bounded by N * 2^(scale_bits + 1): 2^63 head-room up to N ~ 2^46 rows.

Scale shape (per iteration): the assignment is a pure whole-stage-
codegen expression over literal centroid arrays (k * d literals — a few
hundred for typical curation ks), so it costs a map pass with NO
Python and NO join; the centroid update is ONE groupBy(cluster) with
``d`` SUM columns + a COUNT, which Spark partial-aggregates map-side —
the only thing that crosses the wire per iteration is k * (d + 1)
partial-state numbers per map task, and the only thing the driver ever
holds is the k x d centroid matrix itself (the same bounded model-state
artifact as pyspark.ml KMeans and the BPE per-round argmax).  Nothing
else is collected; the corpus is scanned once per iteration from the
persisted quantized projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window


def quantized_vectors(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    scale_bits: int = 16,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, [carry_cols...,] q) — the exact integer projection of
    ``vec_col``.  ``carry_cols`` pass metadata through map-only (the
    IVF-PQ code table uses this to carry filter columns without an
    id join)."""
    scale = float(1 << scale_bits)
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in (carry_cols or [])],
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("q"),
    )


def _fdiv(s: int, n: int) -> int:
    """Mathematical floor division on Python ints (Python's // already
    floors; spelled out to mirror the SQL/Spark formula)."""
    return (s - ((s % n) + n) % n) // n


def _raise_if_out_of_envelope(dim: int, max_q: int, n_rows: int) -> None:
    """Hard error when the exact integer arithmetic could exceed 2^63:
    the codegen distance sums d*(2*max|q|)^2 per row and the centroid
    fold sums n*max|q| per dimension (Python ints here, cannot wrap)."""
    if dim * (2 * max_q) ** 2 >= (1 << 63) or n_rows * max_q >= (1 << 63):
        raise ValueError(
            "kmeans overflow envelope: need dim*(2*max|q|)^2 and "
            f"n*max|q| under 2^63, got dim={dim} max|q|={max_q} "
            f"n={n_rows}; lower scale_bits"
        )


def _check_envelope(q, dim: int) -> None:
    """Dedicated wrap-proof envelope probe (one bounded aggregate of
    abs/greatest over longs — overflow-free by construction).  Only
    run on the pass-1 failure path: the happy path reads the same
    stats off the first Lloyd groupBy for free."""
    stats = q.select(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.aggregate(
                "q",
                F.lit(0).cast("long"),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            )
        ).alias("m"),
    ).first()
    _raise_if_out_of_envelope(dim, int(stats["m"] or 0), int(stats["n"]))


def _assign_kernel(centroids: list[list[int]]):
    """Arrow-kernel twin of :func:`_assign_expr` for the TRAINING loop:
    one numpy int64 distance matrix + argmin per batch.  Value-identical
    to the codegen expression — numpy int64 arithmetic is exact (and
    wraps like a JVM long, so the overflow envelope contract is
    unchanged), and ``np.argmin`` returns the FIRST minimal index,
    which IS the (dist, j) lexicographic tie-break.

    Why a kernel here and codegen in :func:`assign_to_centroids`: the
    training loop rebuilds the k x d literal tensor EVERY iteration, so
    each Lloyd pass pays Catalyst analysis + codegen for a fresh
    ~k*d-term expression tree — a fixed multi-second tax per iteration
    at any data size (the ann_lsh_portable / _qtable_udf lesson, r9
    verdict task #3 applied to training).  The standing-model
    assignment face compiles its expression once and composes
    Python-free with downstream plans — it keeps the codegen form."""
    C = np.array(centroids, dtype=np.int64)  # (k, d)

    @pandas_udf("int")
    def assign(q: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="int32")
        Q = np.stack(
            q.map(lambda v: np.asarray(v, dtype=np.int64)).to_numpy()
        )
        d = Q[:, None, :] - C[None, :, :]
        dist = (d * d).sum(axis=2)  # (n, k) exact int64
        return pd.Series(dist.argmin(axis=1).astype(np.int32))

    return assign


def _assign_expr(centroids: list[list[int]]):
    """argmin_j (dist(q, c_j), j) as one codegen expression over
    literal centroid arrays — lexicographic struct min gives the
    lowest-index tie-break."""
    dists = []
    for j, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(int(v)).cast("long") for v in c])
        d = F.aggregate(
            F.zip_with(F.col("q"), lit_c, lambda x, cc: (x - cc) * (x - cc)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        dists.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*dists))["j"].alias("cluster")


def kmeans_train_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 4,
    scale_bits: int = 16,
) -> list[list[int]]:
    """Lloyd's over the exact integer projection; returns the converged
    k x d centroid matrix (bounded model state — persist it and score
    future batches with :func:`assign_to_centroids`, the incremental
    face)."""
    q = quantized_vectors(df, vec_col, id_col, scale_bits).persist()
    try:
        head = q.select("q").first()
        if head is None:
            raise ValueError("empty corpus: no vectors to cluster")
        dim = len(head["q"])
        seeds = q.orderBy("id").limit(k).collect()
        if len(seeds) < k:
            raise ValueError(f"k={k} exceeds corpus size {len(seeds)}")
        centroids = [list(r["q"]) for r in seeds]

        for it in range(iters):
            # overflow-envelope runtime check (the dsir guard
            # discipline): the codegen distance sums d*(2*max|q|)^2
            # per row and the centroid fold sums n*max|q| per
            # dimension — both must stay under 2^63 or a non-ANSI
            # session would wrap silently inside the expression.  The
            # n/max|q| probe rides the FIRST Lloyd pass's groupBy (no
            # dedicated corpus scan per call): max|q| itself cannot
            # wrap (|q| elements are honest longs from floor(float *
            # scale)), so even if pass 1's distances DID wrap, the
            # post-pass check still sees the true envelope and raises
            # before any result escapes — pass-1 sums are discarded by
            # the raise.
            envelope = (
                [
                    F.max(
                        F.aggregate(
                            "q",
                            F.lit(0).cast("long"),
                            lambda acc, x: F.greatest(acc, F.abs(x)),
                        )
                    ).alias("_mq")
                ]
                if it == 0
                else []
            )
            try:
                sums = (
                    q.select(
                        _assign_kernel(centroids)(F.col("q")).alias(
                            "cluster"
                        ),
                        "q",
                    )
                    .groupBy("cluster")
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        *[
                            F.sum(F.element_at("q", i + 1)).alias(f"s{i}")
                            for i in range(dim)
                        ],
                        *envelope,
                    )
                    .collect()
                )
            except Exception:
                # an ANSI session surfaces an out-of-envelope input as
                # a JVM arithmetic error inside pass 1 before the
                # rode-along probe returns — re-derive the envelope
                # with the wrap-proof probe (abs/greatest of longs) so
                # the caller gets the documented actionable error; any
                # other failure re-raises untouched
                _check_envelope(q, dim)
                raise
            if it == 0:
                n_rows = sum(int(row["n"]) for row in sums)
                max_q = max(
                    (int(row["_mq"]) for row in sums if row["_mq"] is not None),
                    default=0,
                )
                _raise_if_out_of_envelope(dim, max_q, n_rows)
            nxt = [list(c) for c in centroids]  # empty clusters carry over
            for row in sums:
                nxt[row["cluster"]] = [
                    _fdiv(int(row[f"s{i}"]), int(row["n"]))
                    for i in range(dim)
                ]
            centroids = nxt
        return centroids
    finally:
        q.unpersist()


def assign_to_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[int]],
    scale_bits: int = 16,
) -> DataFrame:
    """(id, cluster) for every row against a STANDING centroid matrix —
    the incremental/streaming face of clustering (new batches score
    against persisted centroids without retraining, exactly as
    ``pq.pq_encode`` scores against standing codebooks).  Map-only
    whole-stage codegen; bit-identical to the assignment a full
    retrain's final pass would produce for the same centroids."""
    q = quantized_vectors(df, vec_col, id_col, scale_bits)
    return q.select("id", _assign_expr(centroids)).withColumnRenamed(
        "id", id_col
    )


def kmeans_fixed_point(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 4,
    scale_bits: int = 16,
) -> DataFrame:
    """Full Lloyd's over the exact integer projection; returns the
    final (id, cluster) assignment for every input row.

    The returned DataFrame's plan is the pure-codegen assignment
    expression over the converged literal centroids — downstream
    consumers (balanced sampling, SemDeDup-style pruning) compose with
    it without touching Python."""
    centroids = kmeans_train_centroids(
        df, vec_col, id_col, k, iters, scale_bits
    )
    return assign_to_centroids(df, vec_col, id_col, centroids, scale_bits)


def kmeans_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 4,
    scale_bits: int = 16,
) -> str:
    """DuckDB replay of :func:`kmeans_fixed_point` — Lloyd iterations
    unrolled as chained CTEs over a LONG-format (id, dim, value)
    projection, every operation the identical exact integer op.

    Centroids live as (j, i, c) rows; distances are an equi-join on the
    dimension index + an integer SUM; the argmin replays the
    (dist, index) lexicographic tie-break with a QUALIFY row_number;
    the update replays fdiv via the same pmod identity.  Integer SUMs
    come back as HUGEINT, so every aggregate is cast to BIGINT."""
    scale = 1 << scale_bits
    parts = [
        f"""q AS MATERIALIZED (
            SELECT {id_col} AS id,
                   list_transform({vec_col},
                       x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)
                   ) AS q
            FROM {table})""",
        """ql AS MATERIALIZED (
            SELECT id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS v
            FROM q)""",
        f"""c0 AS (
            SELECT CAST(rn - 1 AS INT) AS j, i, v AS c
            FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY id) AS rn
                  FROM q ORDER BY id LIMIT {k}) s
            JOIN ql USING (id))""",
    ]
    for t in range(iters):
        parts.append(
            f"""a{t} AS (
            SELECT id, j FROM (
                SELECT ql.id, c.j,
                       CAST(SUM((ql.v - c.c) * (ql.v - c.c)) AS BIGINT) AS d
                FROM ql JOIN c{t} c USING (i)
                GROUP BY ql.id, c.j)
            QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, j) = 1)"""
        )
        parts.append(
            f"""c{t + 1} AS (
            SELECT p.j, p.i,
                   CASE WHEN u.n IS NULL THEN p.c
                        ELSE CAST((u.s - ((u.s % u.n) + u.n) % u.n) // u.n
                                  AS BIGINT)
                   END AS c
            FROM c{t} p
            LEFT JOIN (
                SELECT a.j, ql.i,
                       CAST(SUM(ql.v) AS BIGINT) AS s,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM a{t} a JOIN ql ON ql.id = a.id
                GROUP BY a.j, ql.i
            ) u ON u.j = p.j AND u.i = p.i)"""
        )
    # final assignment against the converged centroids
    parts.append(
        f"""afinal AS (
        SELECT id, j FROM (
            SELECT ql.id, c.j,
                   CAST(SUM((ql.v - c.c) * (ql.v - c.c)) AS BIGINT) AS d
            FROM ql JOIN c{iters} c USING (i)
            GROUP BY ql.id, c.j)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY d, j) = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id AS {id_col}, CAST(j AS INT) AS cluster FROM afinal"
    )


def cluster_balanced_sample(
    assignments: DataFrame,
    id_col: str,
    per_cluster: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-cluster cap — at most ``per_cluster`` rows
    survive from each cluster, chosen by md5(seed, id) rank (the repo's
    standing engine-portable pseudo-order, operators/sampling.py), so a
    dominant region of embedding space cannot drown the training mix —
    the curation face of clustering (cluster-balanced data selection).

    One window partitioned by cluster; with k small the per-cluster
    sort is the bounded cost, and the md5 rank makes the survivor set
    independent of partitioning and engine."""
    h = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string")))
    rn = F.row_number().over(
        Window.partitionBy("cluster").orderBy(h.asc(), F.col(id_col).asc())
    )
    return (
        assignments.withColumn("_rn", rn)
        .filter(F.col("_rn") <= per_cluster)
        .drop("_rn")
    )
