"""Duplicate-passage (substring-level) dedup: span semantics, removal,
hash-family agreement, and a hand-built boilerplate corpus with a known
answer."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import passages as P

BOILER = "terms of service apply to all content on this site always"
#          0     1  2       3     4  5   6       7  8    9    10  (11 tokens)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1: unique prose + boilerplate suffix (first occurrence —
        # survives everywhere)
        (1, "alpha beta gamma delta epsilon zeta eta theta " + BOILER),
        # doc 2: different prose + the same boilerplate (later copy —
        # must be spanned and removed)
        (2, "one two three four five six seven eight nine " + BOILER),
        # doc 3: boilerplate sandwiched between unique halves
        (3, "red orange yellow green blue indigo violet pink "
            + BOILER
            + " cyan magenta teal maroon navy olive silver gold"),
        # doc 4: no duplication at all
        (4, "completely unique text with nothing repeated anywhere here at all ok"),
        # doc 5: empty
        (5, ""),
        # doc 6: internal self-repetition (same 8-gram twice in one doc)
        (6, "x1 x2 x3 x4 x5 x6 x7 x8 filler x1 x2 x3 x4 x5 x6 x7 x8"),
        # doc 7: NULL text — must behave like empty, not poison counters
        (7, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spans_known_corpus(corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in P.duplicate_passage_spans(corpus, "doc_id", "text", k=8)
        .collect()
    }
    n_b = len(BOILER.split())  # 11 boilerplate tokens
    # doc 1 holds the corpus-first occurrence: no span
    assert not any(d == 1 for d, *_ in spans)
    # doc 2: boilerplate occupies tokens [9, 9+11) — spanned exactly
    assert (2, 9, 9 + n_b) in spans
    # doc 3: boilerplate at tokens [8, 8+11)
    assert (3, 8, 8 + n_b) in spans
    # docs 4/5/7: untouched (7 is NULL text)
    assert not any(d in (4, 5, 7) for d, *_ in spans)
    # doc 6: the second copy of the 8-gram starts at token 9
    assert (6, 9, 17) in spans
    assert len(spans) == 3


def test_removal_known_corpus(corpus):
    out = {
        r.doc_id: r
        for r in P.remove_duplicate_passages(corpus, "doc_id", "text", k=8)
        .collect()
    }
    assert len(out) == 7
    # NULL text behaves like empty text
    assert out[7].clean_text == ""
    assert out[7].n_tokens_kept == 0 and out[7].n_tokens_removed == 0
    # later boilerplate copies are cut, prose survives
    assert out[2].clean_text == "one two three four five six seven eight nine"
    assert out[3].clean_text == (
        "red orange yellow green blue indigo violet pink "
        "cyan magenta teal maroon navy olive silver gold"
    )
    # first occurrence keeps its boilerplate
    assert out[1].clean_text.endswith(BOILER)
    assert out[1].n_tokens_removed == 0
    # untouched / empty docs pass through
    assert out[4].n_tokens_removed == 0
    assert out[5].clean_text == "" and out[5].n_tokens_kept == 0
    # self-repetition: second copy removed
    assert out[6].clean_text == "x1 x2 x3 x4 x5 x6 x7 x8 filler"
    # invariant: kept + removed == total tokens
    for r in out.values():
        total = len(r.clean_text.split()) if r.clean_text else 0
        assert r.n_tokens_kept == total


def test_overlapping_grams_merge_to_one_span(spark):
    # a 12-token duplicated passage yields 5 overlapping duplicate
    # 8-grams — they must merge into ONE maximal span, not five
    passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"
    df = spark.createDataFrame(
        [(1, passage + " unique1 unique2"), (2, "other stuff here " + passage)],
        ["doc_id", "text"],
    )
    spans = P.duplicate_passage_spans(df, "doc_id", "text", k=8).collect()
    assert len(spans) == 1
    (s,) = spans
    assert (s.doc_id, s.span_start, s.span_end) == (2, 3, 15)


def test_hash_families_agree(spark, sf_dir):
    # xxhash64 (production) and sha256 (oracle-portable) pick identical
    # spans on the fixture corpus — the hash only keys the shuffle
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(
        map(tuple, P.duplicate_passage_spans(
            docs, "doc_id", "text", k=8, hash_name="xxhash64").collect())
    )
    b = sorted(
        map(tuple, P.duplicate_passage_spans(
            docs, "doc_id", "text", k=8, hash_name="sha256").collect())
    )
    assert a == b
    with pytest.raises(ValueError):
        P.duplicate_passage_spans(docs, "doc_id", "text", hash_name="fnv")


def test_first_occurrence_is_corpus_global_order(spark):
    # the keeper is the smallest (doc_id, pos) — swap doc ids and the
    # kept/removed roles swap with them
    passage = "q1 q2 q3 q4 q5 q6 q7 q8"
    for keeper, loser in [(1, 2), (2, 7)]:
        df = spark.createDataFrame(
            [(keeper, passage), (loser, passage)], ["doc_id", "text"]
        )
        out = {r.doc_id: r.n_tokens_removed
               for r in P.remove_duplicate_passages(df, "doc_id", "text", k=8)
               .collect()}
        assert out[keeper] == 0
        assert out[loser] == 8
