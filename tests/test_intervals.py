"""Interval overlap join: brute-force equality, bucket-boundary and
negative-timeline cases, canonical-bucket dedup (no distinct), plan
shape (equi-join, no BNLJ)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import intervals as iv


def _brute_pairs(rows):
    out = set()
    for i, (ida, k, s, e) in enumerate(rows):
        for idb, k2, s2, e2 in rows[i + 1 :]:
            if k == k2 and s <= e2 and s2 <= e:
                a, b = sorted((ida, idb))
                out.add((k, a, b, min(e, e2) - max(s, s2) + 1))
    return out


def test_overlap_pairs_match_bruteforce(spark):
    rnd = random.Random(42)
    rows = []
    for i in range(120):
        k = rnd.randint(0, 3)
        s = rnd.randint(-500, 2000)
        e = s + rnd.randint(0, 400)  # spans several width-100 buckets
        rows.append((i, k, s, e))
    df = spark.createDataFrame(rows, ["id", "k", "start", "end"])
    got = {
        (r["k"], r["id_a"], r["id_b"], r["overlap_len"])
        for r in iv.interval_overlap_pairs(
            df, "id", ["k"], bucket_width=100
        ).collect()
    }
    assert got == _brute_pairs(rows)


def test_overlap_exact_boundary_touch_counts(spark):
    # closed intervals: touching at a single instant IS an overlap of
    # length 1; one instant apart is not
    rows = [(1, 0, 0, 10), (2, 0, 10, 20), (3, 0, 21, 30)]
    df = spark.createDataFrame(rows, ["id", "k", "start", "end"])
    got = {
        (r["id_a"], r["id_b"], r["overlap_len"])
        for r in iv.interval_overlap_pairs(
            df, "id", ["k"], bucket_width=7
        ).collect()
    }
    assert got == {(1, 2, 1)}


def test_overlap_keys_partition(spark):
    # identical intervals under different keys never pair
    rows = [(1, 0, 0, 10), (2, 1, 0, 10)]
    df = spark.createDataFrame(rows, ["id", "k", "start", "end"])
    assert iv.interval_overlap_pairs(df, "id", ["k"]).count() == 0


def test_two_sided_join_carries_payload_and_avoids_bnlj(spark):
    l = spark.createDataFrame(
        [(1, 0, 0, 100, "a"), (2, 0, 300, 400, "b")],
        ["lid", "k", "start", "end", "tag"],
    )
    r = spark.createDataFrame(
        [(7, 0, 50, 60, 9.5), (8, 0, 500, 600, 1.0)],
        ["rid", "k", "start", "end", "score"],
    )
    out = iv.interval_overlap_join(l, r, ["k"], bucket_width=64)
    rows = out.collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["l_lid"] == 1 and row["r_rid"] == 7
    assert row["l_tag"] == "a" and row["r_score"] == 9.5
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _brute_union_len(rows):
    from collections import defaultdict

    pts = defaultdict(set)
    n = defaultdict(int)
    for _, k, s, e in rows:
        n[k] += 1
        pts[k].update(range(s, e + 1))
    return {k: (n[k], len(pts[k])) for k in pts}


def test_interval_union_length_matches_bruteforce(spark):
    rnd = random.Random(7)
    rows = [
        (i, rnd.randint(0, 2), rnd.randint(0, 300), 0) for i in range(80)
    ]
    rows = [(i, k, s, s + rnd.randint(0, 40)) for (i, k, s, _) in rows]
    df = spark.createDataFrame(rows, ["id", "k", "start", "end"])
    got = {
        r["k"]: (r["n_intervals"], r["covered_len"])
        for r in iv.interval_union_length(df, ["k"]).collect()
    }
    assert got == _brute_union_len(rows)


def test_interval_union_length_counts_overlap_once(spark):
    rows = [(1, 0, 0, 9), (2, 0, 5, 14), (3, 0, 20, 29)]
    df = spark.createDataFrame(rows, ["id", "k", "start", "end"])
    r = iv.interval_union_length(df, ["k"]).collect()[0]
    assert (r["n_intervals"], r["covered_len"]) == (3, 25)


def test_contains_relation_matches_bruteforce(spark):
    rnd = random.Random(11)
    rows = []
    for i in range(100):
        k = rnd.randint(0, 2)
        s = rnd.randint(0, 800)
        e = s + rnd.randint(0, 200)
        rows.append((i, k, s, e))
    rows.append((900, 0, 100, 150))  # planted identical pair:
    rows.append((901, 0, 100, 150))  # contains must hold BOTH ways
    l = spark.createDataFrame(rows, ["lid", "k", "start", "end"])
    r = spark.createDataFrame(rows, ["rid", "k", "start", "end"])
    got = {
        (row["l_lid"], row["r_rid"])
        for row in iv.interval_overlap_join(
            l, r, ["k"], bucket_width=64, relation="contains"
        ).collect()
    }
    expected = {
        (a, b)
        for a, ka, sa, ea in rows
        for b, kb, sb, eb in rows
        if ka == kb and sa <= sb and eb <= ea
    }
    assert got == expected
    # identical intervals contain each other (both directions present)
    assert (900, 901) in got and (901, 900) in got

    import pytest as _pytest
    with _pytest.raises(ValueError):
        iv.interval_overlap_join(l, r, ["k"], relation="meets")
