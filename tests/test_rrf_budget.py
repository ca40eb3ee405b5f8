"""Reciprocal-rank fusion (retrieval.rrf_fuse) and token-budget
mixture selection (sampling.token_budget_mixture) vs Python refs."""

import hashlib
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import retrieval, sampling


# ------------------------------------------------------------------- RRF

def _ref_rrf(lists, k0=60, scale_bits=20):
    scale = 1 << scale_bits
    score, n = defaultdict(int), defaultdict(int)
    for lst in lists:
        for doc, rank in lst:
            score[doc] += scale // (k0 + rank)
            n[doc] += 1
    return {d: (n[d], score[d]) for d in score}


def _rank_df(spark, lst):
    return spark.createDataFrame(lst, "doc_id long, rank int")


def test_rrf_matches_reference(spark):
    l1 = [(1, 1), (2, 2), (3, 3), (4, 4)]
    l2 = [(3, 1), (1, 2), (5, 3)]
    l3 = [(5, 1), (1, 3), (9, 9)]
    got = {
        r["doc_id"]: (r["n_lists"], r["rrf_score"])
        for r in retrieval.rrf_fuse(
            [_rank_df(spark, x) for x in (l1, l2, l3)], k0=60
        ).collect()
    }
    assert got == _ref_rrf([l1, l2, l3])


def test_rrf_consensus_beats_single_list_top(spark):
    # doc 1 is mid-rank in all three lists; doc 7 tops one list only.
    l1 = [(1, 2), (7, 1), (2, 3)]
    l2 = [(1, 2), (8, 1), (3, 3)]
    l3 = [(1, 2), (9, 1), (4, 3)]
    out = retrieval.rrf_fuse(
        [_rank_df(spark, x) for x in (l1, l2, l3)], topk=3
    ).collect()
    best = min(out, key=lambda r: r["fused_rank"])
    assert best["doc_id"] == 1 and best["n_lists"] == 3
    assert best["fused_rank"] == 1


def test_rrf_topk_and_tiebreak(spark):
    # docs 2 and 3 get identical score profiles -> lower id ranks first
    l1 = [(2, 1), (3, 2)]
    l2 = [(3, 1), (2, 2)]
    out = {
        r["doc_id"]: r["fused_rank"]
        for r in retrieval.rrf_fuse(
            [_rank_df(spark, l1), _rank_df(spark, l2)], topk=2
        ).collect()
    }
    assert out == {2: 1, 3: 2}


def test_rrf_empty_input_raises(spark):
    with pytest.raises(ValueError):
        retrieval.rrf_fuse([])


# ---------------------------------------------------------- token budget

def _ref_budget(rows, budgets, salt="budget"):
    # rows: (id, dom, w)
    by_dom = defaultdict(list)
    for i, d, w in rows:
        if d in budgets and w > 0:
            hx = hashlib.md5(f"{salt}{i}".encode()).hexdigest()
            by_dom[d].append((hx, i, w))
    keep = {}
    for d, items in by_dom.items():
        cum = 0
        for hx, i, w in sorted(items):
            if cum < budgets[d]:
                cum += w
                keep[i] = (d, w, cum)
            else:
                break
    return keep


def _budget_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, dom string, w long")


def test_budget_matches_reference(spark):
    rows = [(i, ["web", "code", "books"][i % 3], 10 + i % 7) for i in range(120)]
    budgets = {"web": 100, "code": 37, "books": 0}
    got = {
        r["doc_id"]: (r["dom"], r["weight"], r["cum_tokens"])
        for r in sampling.token_budget_mixture(
            _budget_df(spark, rows), "doc_id", "dom", F.col("w"), budgets
        ).collect()
    }
    assert got == _ref_budget(rows, budgets)


def test_budget_boundary_doc_included_and_total_covers_budget(spark):
    rows = [(i, "web", 10) for i in range(50)]
    out = sampling.token_budget_mixture(
        _budget_df(spark, rows), "doc_id", "dom", F.col("w"), {"web": 95}
    ).collect()
    total = sum(r["weight"] for r in out)
    # 9 docs reach 90 < 95, the 10th crosses -> 100 tokens, 10 docs
    assert len(out) == 10 and total == 100
    assert max(r["cum_tokens"] for r in out) == 100


def test_budget_unknown_domain_and_nonpositive_weight_drop(spark):
    rows = [(0, "web", 5), (1, "junk", 5), (2, "web", 0), (3, "web", -2)]
    out = sampling.token_budget_mixture(
        _budget_df(spark, rows), "doc_id", "dom", F.col("w"), {"web": 100}
    ).collect()
    assert {r["doc_id"] for r in out} == {0}


def test_budget_partitioning_invariance(spark):
    rows = [(i, "a" if i % 2 else "b", 1 + i % 5) for i in range(200)]
    budgets = {"a": 60, "b": 45}
    a = sampling.token_budget_mixture(
        _budget_df(spark, rows).coalesce(1), "doc_id", "dom",
        F.col("w"), budgets,
    ).collect()
    b = sampling.token_budget_mixture(
        _budget_df(spark, rows).repartition(13), "doc_id", "dom",
        F.col("w"), budgets,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_budget_validation(spark):
    df = _budget_df(spark, [(0, "web", 1)])
    with pytest.raises(ValueError):
        sampling.token_budget_mixture(df, "doc_id", "dom", F.col("w"), {})
    with pytest.raises(ValueError):
        sampling.token_budget_mixture(
            df, "doc_id", "dom", F.col("w"), {"web": -1}
        )
