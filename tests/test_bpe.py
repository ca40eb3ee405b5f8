"""Distributed BPE trainer vs a faithful single-process Sennrich
reference, plus encode/reconstruct properties."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.bpe import (
    END_OF_WORD,
    encode_corpus,
    encode_words,
    merge_table,
    merge_word,
    train_bpe,
    word_freqs,
)


def ref_train(freqs: dict, num_merges: int, min_count: int = 2):
    """Sennrich's algorithm verbatim: overlapping pair counts over the
    word-frequency table, argmax with (count DESC, left, right) ties,
    left-to-right non-overlapping merge application."""
    vocab = {w: (list(w) + [END_OF_WORD], f) for w, f in freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pairs[k] = pairs.get(k, 0) + f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        vocab = {
            w: (merge_word(s, a, b), f) for w, (s, f) in vocab.items()
        }
    return merges


def test_merge_word_non_overlapping():
    assert merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_word(["x", "y"], "a", "b") == ["x", "y"]


def test_train_matches_reference(spark):
    rows = [
        ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip()
    ]
    docs = spark.createDataFrame([(1, rows[0])], ["doc_id", "text"])
    wf = word_freqs(docs, "text")
    got = train_bpe(wf, num_merges=10, min_count=2)
    want = ref_train(
        {r["word"]: r["freq"] for r in wf.collect()}, 10, 2
    )
    assert got == want
    assert len(got) > 0


def test_train_matches_reference_on_fixture(spark, sf_dir):
    from subgraph_extractor_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    wf = word_freqs(docs, "text").persist()
    got = train_bpe(wf, num_merges=8, min_count=2)
    want = ref_train(
        {r["word"]: r["freq"] for r in wf.collect()}, 8, 2
    )
    wf.unpersist()
    assert got == want
    # best-count sequence is non-increasing (new pairs are bounded by
    # the count of the merge that created them)
    counts = [c for _, _, c in got]
    assert counts == sorted(counts, reverse=True)


def test_early_stop_on_min_count(spark):
    docs = spark.createDataFrame([(1, "q w e r t y")], ["doc_id", "text"])
    wf = word_freqs(docs, "text")
    # every word is a single char: the only pairs are (char, </w>) with
    # count 1 each -> min_count=2 stops immediately
    assert train_bpe(wf, num_merges=5, min_count=2) == []


def test_encode_words_reconstructs(spark):
    docs = spark.createDataFrame(
        [(1, "lower lowest newest new")], ["doc_id", "text"]
    )
    wf = word_freqs(docs, "text")
    merges = train_bpe(wf, num_merges=6, min_count=1)
    enc = encode_words(wf.select("word"), merges)
    for r in enc.collect():
        joined = "".join(r["tokens"])
        assert joined == r["word"] + END_OF_WORD, r


def test_encode_corpus_preserves_order(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ba"), (2, "ba ab")], ["doc_id", "text"]
    )
    wf = word_freqs(docs, "text")
    merges = train_bpe(wf, num_merges=4, min_count=1)
    out = {r["doc_id"]: r["tokens"] for r in
           encode_corpus(docs, "text", "doc_id", merges).collect()}
    # concatenating tokens per doc reproduces the word sequence with
    # end-of-word markers between words
    assert "".join(out[1]) == "ab" + END_OF_WORD + "ab" + END_OF_WORD + "ba" + END_OF_WORD
    assert "".join(out[2]) == "ba" + END_OF_WORD + "ab" + END_OF_WORD


def test_merge_table_shape(spark):
    mt = merge_table(spark, [("a", "b", 7), ("ab", "c", 3)])
    rows = mt.collect()
    assert [(r["rank"], r["left"], r["right"], r["pair_count"]) for r in rows] == [
        (1, "a", "b", 7),
        (2, "ab", "c", 3),
    ]


def test_merge_word_matches_sennrich_regex_property():
    """merge_word == Sennrich's regex replace (non-overlapping,
    left-to-right) for random symbol sequences and random pairs."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    syms_st = st.lists(
        st.sampled_from(["a", "b", "c", "ab", "bc", "</w>"]),
        min_size=0,
        max_size=12,
    )

    @settings(max_examples=300, deadline=None)
    @given(syms_st, st.sampled_from(["a", "b", "c", "ab"]),
           st.sampled_from(["a", "b", "c", "bc", "</w>"]))
    def check(syms, a, b):
        # Sennrich: spaces separate symbols; replace 'a b' by 'ab'
        pattern = re.compile(
            r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)"
        )
        want = pattern.sub(
            (a + b).replace("\\", "\\\\"), " ".join(syms)
        ).split(" ") if syms else []
        want = [w for w in want if w != ""]
        assert merge_word(list(syms), a, b) == want, (syms, a, b)

    check()


def test_codegen_merge_fold_equals_merge_word(spark):
    """r12: the pure-codegen aggregate() fold that replaced the Arrow
    merge kernel is exactly merge_word on every tricky shape —
    overlapping runs (a == b), fused-symbol re-adjacency, multi-char
    symbols, pair-free words — and the contains-pair guard returns
    pair-free rows untouched."""
    from pyspark.sql import functions as F

    from subgraph_extractor_spark.operators.bpe import (
        _contains_pair,
        _merge_fold,
        merge_word,
    )

    cases = [
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b"], "a", "b"),
        (["a", "a", "b"], "a", "b"),
        (["a", "b", "b"], "a", "b"),
        (["x", "y"], "a", "b"),
        (["ab", "b", "ab", "b"], "ab", "b"),
        (["l", "o", "w", "</w>"], "o", "w"),
        (["ow", "</w>"], "ow", "</w>"),
        (["b"], "a", "b"),
    ]
    for syms, a, b in cases:
        df = spark.createDataFrame([(syms,)], "syms array<string>")
        got = df.select(
            F.when(_contains_pair(a, b), _merge_fold(a, b))
            .otherwise(F.col("syms"))
            .alias("m")
        ).collect()[0]["m"]
        assert list(got) == merge_word(list(syms), a, b), (syms, a, b)
