"""Bigram-LM operators: hand-corpus counts, novelty evidence, mergeable
model state, and the float log-prob face vs a pure-python replica."""

import math

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import lm


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "a dog sat"),
            (4, None),
            (5, "   "),
            (6, "single"),
        ],
        ["doc_id", "text"],
    )


def test_bigram_counts_hand_corpus(ref):
    got = {
        (r["w1"], r["w2"]): r["cnt"]
        for r in lm.bigram_counts(ref, "text").collect()
    }
    assert got == {
        ("the", "cat"): 2,
        ("cat", "sat"): 1,
        ("sat", "on"): 1,
        ("on", "the"): 1,
        ("the", "mat"): 1,
        ("cat", "ran"): 1,
        ("a", "dog"): 1,
        ("dog", "sat"): 1,
    }
    pruned = lm.bigram_counts(ref, "text", min_count=2)
    assert [
        (r["w1"], r["w2"], r["cnt"]) for r in pruned.collect()
    ] == [("the", "cat", 2)]


def test_unigram_counts_null_and_blank_are_empty(ref):
    got = {r["word"]: r["cnt"] for r in lm.unigram_counts(ref, "text").collect()}
    assert got["the"] == 3 and got["single"] == 1
    # doc1: 6 tokens, doc2: 3, doc3: 3, doc4 (NULL): 0, doc5 (blank): 0,
    # doc6: 1 — an exact total so tokenizer/null-handling drift fails loudly
    assert sum(got.values()) == 13


def test_novelty_evidence_and_gate(spark, ref):
    model = lm.bigram_counts(ref.filter(F.col("doc_id") <= 2), "text")
    scored = spark.createDataFrame(
        [
            (10, "the cat sat quietly"),  # the-cat HIT, cat-sat HIT, sat-quietly miss
            (11, "totally novel words"),  # 2 bigrams, 0 hits
            (12, "single"),               # 0 bigrams
            (13, None),                   # 0 bigrams
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_hits"], r["novelty_le_50"])
        for r in lm.score_novelty(scored, "doc_id", "text", model).collect()
    }
    assert got == {
        10: (3, 2, True),
        11: (2, 0, False),
        12: (0, 0, True),
        13: (0, 0, True),
    }


def test_bigram_model_is_mergeable_state(spark, ref):
    """Counts from disjoint corpus halves ADD to the single-pass model —
    the property that makes the LM incremental state like aggstate /
    histogram (retrain = merge, never rescan history)."""
    a = lm.bigram_counts(ref.filter(F.col("doc_id") % 2 == 0), "text")
    b = lm.bigram_counts(ref.filter(F.col("doc_id") % 2 == 1), "text")
    merged = (
        a.unionByName(b)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = lm.bigram_counts(ref, "text")
    got = {(r["w1"], r["w2"]): r["cnt"] for r in merged.collect()}
    want = {(r["w1"], r["w2"]): r["cnt"] for r in full.collect()}
    assert got == want


def test_log_prob_matches_python_replica(spark, ref):
    model_uni = lm.unigram_counts(ref, "text")
    model_bi = lm.bigram_counts(ref, "text")
    scored = spark.createDataFrame(
        [(20, "the cat sat on a mat today"), (21, "single"), (22, None)],
        ["doc_id", "text"],
    )
    k = 0.5
    got = {
        r["doc_id"]: (r["n_bigrams"], r["log_prob"], r["avg_log_prob"])
        for r in lm.score_log_prob(
            scored, "doc_id", "text", model_uni, model_bi, k=k
        ).collect()
    }

    uni = {r["word"]: r["cnt"] for r in model_uni.collect()}
    bi = {(r["w1"], r["w2"]): r["cnt"] for r in model_bi.collect()}
    v = len(uni) + 1

    def replica(text):
        toks = text.lower().strip().split()
        pairs = list(zip(toks, toks[1:]))
        lps = [
            math.log((bi.get(p, 0) + k) / (uni.get(p[0], 0) + k * v))
            for p in pairs
        ]
        return len(lps), sum(lps), (sum(lps) / len(lps) if lps else None)

    n, lp, avg = replica("the cat sat on a mat today")
    assert got[20][0] == n
    assert got[20][1] == pytest.approx(lp, rel=1e-12)
    assert got[20][2] == pytest.approx(avg, rel=1e-12)
    assert got[21] == (0, 0.0, None)
    assert got[22] == (0, 0.0, None)
