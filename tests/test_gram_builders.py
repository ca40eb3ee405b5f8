"""Equivalence pins for the vectorized gram builders.

word_shingles / _word_ngrams / _bigrams were reformulated from
transform-over-sequence HOF lambdas (interpreted per element) to
arrays_zip-of-shifted-slices, and the passage k-gram explosion to an
Arrow kernel.  Several full-value oracles hash the downstream results
bit-exactly, so these builders must keep EXACT output identity —
content, multiplicity, and order — not just set equality.  Each test
pins the Spark formulation against an independent pure-Python reference
over the fixture corpus plus adversarial short/empty/repeated texts.
"""

import re

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import passages as passage_ops
from subgraph_extractor_spark.operators.dedup import (
    tokens,
    tokens_or_empty,
    word_shingles,
)
from subgraph_extractor_spark.operators.lm import _bigrams
from subgraph_extractor_spark.operators.text_analysis import _word_ngrams

# matches the operators' tokenizer contract: lower, SQL trim, Java \s+
_SPLIT = re.compile(r"[\t\n\x0b\f\r ]+")

EDGE_TEXTS = [
    (1, None),
    (2, ""),
    (3, "   "),
    (4, "one"),
    (5, "one two"),
    (6, "one two three"),
    (7, "a a a a a"),
    (8, "A  B\tC\nD"),
    (9, "x y z x y z x y z"),
]


def _py_tokens(text):
    if text is None:
        return None
    t = text.lower().strip(" ")
    if t == "":
        return []
    return _SPLIT.split(t)


def _py_sliding(toks, n):
    if toks is None or len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _docs(spark, sf_dir):
    fixture = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    edges = spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")
    return fixture.unionByName(edges)


@pytest.mark.parametrize("n", [2, 3, 5])
def test_word_shingles_match_python_reference(spark, sf_dir, n):
    d = _docs(spark, sf_dir)
    rows = d.select(
        "doc_id", "text", word_shingles(F.col("text"), n).alias("s")
    ).collect()
    for r in rows:
        toks = _py_tokens(r["text"])
        if toks is None:
            assert r["s"] is None, r
            continue
        # distinct, first-occurrence order — exactly array_distinct
        exp = list(dict.fromkeys(_py_sliding(toks, n)))
        assert r["s"] == exp, (r["doc_id"], r["s"], exp)


@pytest.mark.parametrize("n", [2, 3])
def test_word_ngrams_keep_multiplicity_and_order(spark, sf_dir, n):
    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    rows = d.select(
        "doc_id", "text", _word_ngrams(F.col("text"), n).alias("g")
    ).collect()
    for r in rows:
        # _word_ngrams splits WITHOUT the empty-string guard of tokens()
        t = r["text"].lower().strip(" ")
        toks = _SPLIT.split(t)
        exp = _py_sliding(toks, n)
        assert r["g"] == exp, (r["doc_id"], r["g"], exp)


def test_bigrams_match_python_reference(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rows = d.select(
        "doc_id",
        "text",
        _bigrams(tokens_or_empty(F.col("text"))).alias("b"),
    ).collect()
    for r in rows:
        toks = _py_tokens(r["text"]) or []
        exp = [
            {"w1": toks[i], "w2": toks[i + 1]} for i in range(len(toks) - 1)
        ]
        got = [{"w1": x["w1"], "w2": x["w2"]} for x in r["b"]]
        assert got == exp, (r["doc_id"], got, exp)


@pytest.mark.parametrize("k", [3, 8])
def test_passage_gram_kernel_matches_hof_twin(spark, sf_dir, k):
    """The Arrow gram kernel must be byte-identical to the codegen HOF
    form it replaced on the hot path (positions included)."""
    d = _docs(spark, sf_dir)
    hof = d.select(
        "doc_id",
        F.explode(passage_ops._gram_structs(F.col("text"), k)).alias("g"),
    ).select("doc_id", "g.pos", "g.gram")
    arr = d.select(
        "doc_id",
        F.explode(
            passage_ops._gram_structs_arrow(tokens_or_empty(F.col("text")), k)
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.gram")
    assert hof.exceptAll(arr).count() == 0
    assert arr.exceptAll(hof).count() == 0
    assert hof.count() == arr.count()
