"""Integer fixed-point k-means (operators/clustering.py) vs a verbatim
single-process Python reference, plus the deterministic balanced cap."""

import random

from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import clustering


# ---------------------------------------------------------------- reference

def _quantize(vec, scale_bits=16):
    s = 1 << scale_bits
    out = []
    for x in vec:
        import math
        out.append(math.floor(float(x) * s))
    return out


def _ref_kmeans(rows, k, iters, scale_bits=16):
    """rows: list of (id, [float...]).  Mirrors the documented contract
    literally: seed = k smallest ids, argmin (dist, j), fdiv update,
    empty clusters carry over."""
    q = {i: _quantize(v, scale_bits) for i, v in rows}
    seeds = sorted(q)[:k]
    cents = [list(q[i]) for i in seeds]

    def assign(cs):
        a = {}
        for i, v in q.items():
            best = min(
                (sum((x - c) * (x - c) for x, c in zip(v, cj)), j)
                for j, cj in enumerate(cs)
            )
            a[i] = best[1]
        return a

    for _ in range(iters):
        a = assign(cents)
        nxt = [list(c) for c in cents]
        for j in range(k):
            members = [q[i] for i in a if a[i] == j]
            if members:
                n = len(members)
                nxt[j] = [
                    (s - ((s % n) + n) % n) // n
                    for s in (sum(col) for col in zip(*members))
                ]
        cents = nxt
    return assign(cents)


def _spark_kmeans(spark, rows, k, iters):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "id long, vec array<float>",
    ).repartition(5)
    out = clustering.kmeans_fixed_point(df, "vec", "id", k=k, iters=iters)
    return {r["id"]: r["cluster"] for r in out.collect()}


def test_kmeans_matches_python_reference(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    assert _spark_kmeans(spark, rows, k=5, iters=3) == _ref_kmeans(
        rows, k=5, iters=3
    )


def test_kmeans_separated_blobs_recover_structure(spark):
    # ids interleaved across blobs (id = i*3 + b) so the deterministic
    # k-smallest-id seeding starts with one seed per blob — with all
    # seeds in one blob Lloyd's can legitimately converge to a local
    # optimum that splits it, which is k-means behaviour, not a bug.
    rng = random.Random(3)
    rows = []
    for b, center in enumerate([(-5.0, -5.0), (5.0, 5.0), (-5.0, 5.0)]):
        for i in range(20):
            rows.append(
                (i * 3 + b,
                 [center[0] + rng.uniform(-0.5, 0.5),
                  center[1] + rng.uniform(-0.5, 0.5)])
            )
    got = _spark_kmeans(spark, rows, k=3, iters=4)
    assert got == _ref_kmeans(rows, k=3, iters=4)
    # each ground-truth blob lands in exactly one cluster
    for b in range(3):
        assert len({got[i * 3 + b] for i in range(20)}) == 1
    assert len({got[0], got[1], got[2]}) == 3


def test_kmeans_tiebreak_and_empty_cluster_carry(spark):
    # Seeds are ids 0,1,2 with q0 == q1 == (0,0).  Iter 1: points 0,1
    # tie between c0 and c1 -> the lexicographic (dist, j) tie-break
    # sends both to the LOWER index 0; cluster 1 is empty and must
    # carry its (0,0) centroid over unchanged rather than divide by
    # zero.  Point 5 drags c0 off the origin, so in iter 2 the
    # carried-over cluster 1 — still exactly at (0,0) — recaptures
    # points 0,1 while 5 stays with c0: the carry is observable in the
    # final assignment, not just the absence of a crash.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [0.9, 0.9]),
        (3, [0.89, 0.9]),
        (4, [0.9, 0.88]),
        (5, [0.01, -0.01]),
    ]
    got = _spark_kmeans(spark, rows, k=3, iters=3)
    assert got == _ref_kmeans(rows, k=3, iters=3)
    assert got[0] == got[1] == 1
    assert got[5] == 0
    assert got[2] == got[3] == got[4] == 2


def test_kmeans_partitioning_invariance(spark):
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
    df1 = spark.createDataFrame(
        [(i, v) for i, v in rows], "id long, vec array<float>"
    ).coalesce(1)
    df8 = spark.createDataFrame(
        [(i, v) for i, v in rows], "id long, vec array<float>"
    ).repartition(8)
    a1 = {
        r["id"]: r["cluster"]
        for r in clustering.kmeans_fixed_point(df1, "vec", "id", 4, 2).collect()
    }
    a8 = {
        r["id"]: r["cluster"]
        for r in clustering.kmeans_fixed_point(df8, "vec", "id", 4, 2).collect()
    }
    assert a1 == a8


def test_balanced_sample_caps_and_determinism(spark):
    rng = random.Random(19)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(80)]
    df = spark.createDataFrame(
        [(i, v) for i, v in rows], "id long, vec array<float>"
    )
    asg = clustering.kmeans_fixed_point(df, "vec", "id", k=3, iters=2)
    capped = clustering.cluster_balanced_sample(asg, "id", per_cluster=7, seed=1)
    got = [(r["id"], r["cluster"]) for r in capped.collect()]
    # cap respected per cluster
    from collections import Counter
    sizes = Counter(c for _, c in got)
    assert all(v <= 7 for v in sizes.values())
    # full clusters hit the cap exactly
    full = Counter(r["cluster"] for r in asg.collect())
    for c, n in full.items():
        assert sizes[c] == min(7, n)
    # deterministic on re-run and different partitioning
    again = clustering.cluster_balanced_sample(
        clustering.kmeans_fixed_point(
            df.repartition(11), "vec", "id", k=3, iters=2
        ),
        "id", per_cluster=7, seed=1,
    )
    assert sorted(got) == sorted(
        (r["id"], r["cluster"]) for r in again.collect()
    )
    # a different seed picks a different survivor set (overwhelmingly)
    other = clustering.cluster_balanced_sample(asg, "id", per_cluster=7, seed=2)
    assert {r["id"] for r in other.collect()} != {i for i, _ in got}


def test_kmeans_k_exceeds_corpus_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])], "id long, vec array<float>"
    )
    import pytest

    with pytest.raises(ValueError):
        clustering.kmeans_fixed_point(df, "vec", "id", k=5, iters=1)


def test_assign_to_centroids_matches_full_run_and_scores_new_batch(spark):
    rng = random.Random(29)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(70)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "id long, vec array<float>",
    )
    cents = clustering.kmeans_train_centroids(df, "vec", "id", k=4, iters=2)
    inc = {
        r["id"]: r["cluster"]
        for r in clustering.assign_to_centroids(
            df, "vec", "id", cents
        ).collect()
    }
    full = {
        r["id"]: r["cluster"]
        for r in clustering.kmeans_fixed_point(
            df, "vec", "id", k=4, iters=2
        ).collect()
    }
    assert inc == full
    # a NEW batch scores against the standing centroids without retrain
    new_rows = [(100 + i, [rng.uniform(-1, 1) for _ in range(6)])
                for i in range(10)]
    ndf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in new_rows],
        "id long, vec array<float>",
    )
    got = {
        r["id"]: r["cluster"]
        for r in clustering.assign_to_centroids(
            ndf, "vec", "id", cents
        ).collect()
    }
    # python replay of the documented argmin contract
    import math
    for i, v in new_rows:
        q = [math.floor(float(x) * 65536) for x in v]
        best = min(
            (sum((a - c) * (a - c) for a, c in zip(q, cj)), j)
            for j, cj in enumerate(cents)
        )[1]
        assert got[i] == best


def test_kmeans_empty_corpus_raises_valueerror(spark):
    import pytest
    df = spark.createDataFrame([], "id long, vec array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        clustering.kmeans_train_centroids(df, "vec", "id", k=2, iters=1)


def test_kmeans_overflow_envelope_raises(spark):
    """ADVICE r6: out-of-envelope quantized magnitudes must raise the
    documented ValueError instead of silently wrapping in a non-ANSI
    session (scale_bits=31 puts max|q| ~2^31, so dim*(2*max|q|)^2
    crosses 2^63 even for dim=2)."""
    import pytest
    df = spark.createDataFrame(
        [(0, [0.9, 0.9]), (1, [0.8, -0.7]), (2, [0.1, 0.2])],
        "id long, vec array<float>",
    )
    with pytest.raises(ValueError, match="overflow envelope"):
        clustering.kmeans_train_centroids(
            df, "vec", "id", k=2, iters=1, scale_bits=31
        )
