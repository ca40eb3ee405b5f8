"""Integer fixed-point HITS (graph.hits_fixed_point): full-value
agreement with a plain-Python reference and the DuckDB oracle unroll,
plus the semantic sanity HITS is supposed to deliver."""

from collections import defaultdict

import duckdb
import pytest

from subgraph_extractor_spark.operators.graph import (
    hits_fixed_point,
    hits_oracle_sql,
)


def py_hits(edges, iters=8, scale=10**12):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {n: scale for n in nodes}
    a = {}
    for _ in range(iters):
        araw = defaultdict(int)
        for u, v in edges:
            araw[v] += h[u]
        mx = max(araw.values())
        a = {n: (araw.get(n, 0) * scale) // mx for n in nodes}
        hraw = defaultdict(int)
        for u, v in edges:
            hraw[u] += a[v]
        mx = max(hraw.values())
        h = {n: (hraw.get(n, 0) * scale) // mx for n in nodes}
    return {n: (h[n], a[n]) for n in nodes}


EDGES = [
    (1, 10), (2, 10), (3, 10),       # 10: strong authority
    (1, 11), (2, 11),                # 11: weaker authority
    (1, 12),
    (10, 20),                        # authorities can also point out
    (5, 5),                          # self-loop
    (1, 10),                         # parallel edge counts twice
]


def _run_spark(spark, edges, iters=8):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    out = hits_fixed_point(df, iters=iters)
    return {r["node"]: (r["hub"], r["auth"]) for r in out.collect()}


def test_hits_matches_python_reference(spark):
    assert _run_spark(spark, EDGES) == py_hits(EDGES)


def test_hits_matches_duckdb_oracle(spark):
    got = _run_spark(spark, EDGES, iters=4)
    vals = ", ".join(f"({s}, {d})" for s, d in EDGES)
    sql = hits_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4
    )
    ora = {
        int(n): (int(h), int(a))
        for n, h, a in duckdb.sql(sql).fetchall()
    }
    assert got == ora


def test_hits_semantics(spark):
    got = _run_spark(spark, EDGES)
    # node 1 links to all three authorities -> best hub (normalized max)
    assert got[1][0] == 10**12
    assert all(got[n][0] < got[1][0] for n in got if n != 1)
    # node 10 has the most in-links from good hubs -> best authority
    assert got[10][1] == 10**12
    assert all(got[n][1] < got[10][1] for n in got if n != 10)
    # 11 (two good hubs) outranks 12 (one) as an authority
    assert got[11][1] > got[12][1]
    # pure sink 20 is no hub; pure sources 1,2,3 are no authorities
    assert got[20][0] == 0
    assert got[2][1] == 0


def test_hits_partitioning_invariance(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long").coalesce(1)
    df8 = spark.createDataFrame(EDGES, "src long, dst long").repartition(8)
    a = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_fixed_point(df1, iters=3).collect()
    }
    b = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_fixed_point(df8, iters=3).collect()
    }
    assert a == b


def test_hits_envelope_and_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        hits_fixed_point(df, iters=0)
    with pytest.raises(ValueError, match="envelope"):
        hits_fixed_point(df, scale=1 << 62)
