"""Plan-invariant sweep over the ENTIRE queries() surface: every query
must build a physical plan (analysis + optimization, no execution) free
of accidental scale-killers.  This is the cheap regression net for the
100 TB design rules: a refactor that silently turns an equi-join into a
cartesian product or a nested-loop join fails here, not in a 1000-executor
postmortem.

Whitelists are DOCUMENTED exceptions:
- cartesian/BNLJ from the exact brute-force baselines (the documented
  exact ground-truth side of similarity/near-dup contracts), and
- BNLJ from crossJoin-ing single-row aggregate anchors in the
  error-bound contracts (1-row x 1-row is not a scale concern).
"""

import pytest

import __spark_entry__ as em

# queries whose DEFINITION includes an exact all-pairs baseline or a
# 1-row contract crossJoin — the only places a non-equi join may appear
ALLOWED_NON_EQUI = {
    # documented exact brute-force baselines (cross/theta joins)
    "j4_similarity_topk",
    "emb_neardup",
    "ann_lsh_recall",
    "ann_ivf",
    "sim_topk_quantized",  # recall contract: brute-force baseline + anchors
    # IVF-PQ recall contract: 5-query broadcast exact-L2 baseline +
    # 1-row contract anchors (the ann_ivf pattern in the ADC metric)
    "ann_ivfpq_recall",
    # deliberate broadcast-replication of the SMALL query set onto every
    # corpus shard (the right asymmetry: corpus shuffles once, queries
    # are tiny) — shows up as a BNLJ with a bounded broadcast side
    "sim_topk_matmul",
    # error-bound contracts: crossJoin of single-row aggregates
    "dedup_minhash_recall",
    "dedup_incremental_recall",
    "corpus_overlap",
    "a10_approx_distinct",
    "a11_approx_percentile",
    # scalar-subquery shape: 1-row global-average anchor crossJoined
    # into the filter (TPC-H Q22's AVG(c_acctbal) subquery)
    "tpch_q22_shape",
    # same shape: Q11's 1-row grand-total threshold broadcast back
    "tpch_q11_shape",
    # same shape: BM25's 1-row corpus-stats anchor broadcast back
    "text_bm25",
    # same shape: histogram-percentile's 1-row exact anchor crossJoin
    "a13_histogram_percentile",
    # exactness contract: crossJoin of three single-row count anchors
    "dedup_bloom_probe",
    # count-min contract: 1-row total-tokens anchor crossJoined in
    "text_heavy_hitters",
    # theta/range formulations that are themselves the operator under
    # test and are bucketed/bounded by construction
    "j5_range_join",
    "j7_state_asof",
    # exact cosine all-pairs baseline (the documented fixture-scale
    # truth side of the SemDeDup survivor oracles)
    "pipeline_semdedup",
    "pipeline_semdedup_best",
    # quantized MaxSim: deliberate broadcast of the SMALL query set
    # onto the corpus (the retrieval asymmetry, same as
    # sim_topk_matmul) — scoring is all-pairs by definition of the
    # rerank contract
    "sim_maxsim_quantized",
    # IR-eval run construction (quantized_dot_topk): same deliberate
    # broadcast of the 50-query batch onto the corpus; the metrics
    # stage itself is pure equi-joins (and ann_filtered — the
    # equi-join-pruned filtered search — needs no entry at all)
    "retrieval_eval",
    # binary-quantized Hamming search: the same deliberate broadcast of
    # the 50-query batch onto the corpus (coarse pass scans packed
    # 1-bit signatures — dim/32 words per pair); the rerank face's
    # second stage is pure id equi-joins
    "ann_hamming",
    "ann_hamming_rerank",
    # champion-list build: the 1-row n_docs corpus-stats anchor
    # crossJoined into the state (the BM25 corpus-stats shape)
    "retrieval_champion",
    # Misra-Gries summaries: 1-row (n_total, err, C) anchors
    # crossJoined into <= m-row bounded state at build and per merge
    "sketch_mg_heavy_hitters",
    # sharded-matmul coarse pass broadcast-replicates the query set per
    # shard (same documented asymmetry as sim_topk_matmul), and the
    # recall contract crossJoins 1-row anchors
    "ann_projected",
    "ann_projected_recall",
    # projected+LSH composition: the LSH coarse pass itself is pure
    # band equi-join (no BNLJ — that is the point); only the RECALL
    # CONTRACT's brute-force baseline + 1-row anchors are non-equi
    "ann_projected_lsh_recall",
    # classifier contract: crossJoin of three single-row count anchors
    "quality_classifier",
    # KMV overlap: 1x1 crossJoin of two single-row corpus sketch tables
    # (kilobytes each) — the sketch-vs-sketch comparison IS the operator
    "sketch_kmv_overlap",
    # PQ ADC search: deliberate broadcast of the SMALL query-table side
    # (n_queries rows of m x k ADC lookup tables) onto the compressed
    # code table — the same documented retrieval asymmetry as
    # sim_topk_matmul / sim_maxsim_quantized; per-pair work is m
    # element_at lookups over 8-byte codes, never the raw vectors
    "ann_pq",
    # DSIR weights: the 1-row (Zt, Zr) totals anchor crossJoined into
    # the B-row generated bucket domain (the BM25 corpus-stats shape)
    "pipeline_dsir_scores",
}

_BAD_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    out = {}
    for name, fn in em.queries().items():
        df = fn(spark, sf_dir)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_every_query_builds_a_plan(plans):
    assert len(plans) == len(em.queries())
    for name, plan in plans.items():
        assert plan, name


def test_no_accidental_cartesian_or_nested_loop(plans):
    offenders = {
        name: [n for n in _BAD_NODES if n in plan]
        for name, plan in plans.items()
        if name not in ALLOWED_NON_EQUI
        and any(n in plan for n in _BAD_NODES)
    }
    assert not offenders, (
        "non-equi join nodes outside the documented exceptions: "
        f"{offenders}"
    )


def test_range_scan_keeps_pushed_filters(plans):
    # the one invariant worth asserting globally: the flagship range
    # scan still reaches the parquet reader as PushedFilters
    assert "PushedFilters: [" in plans["s1_range_scan"]
