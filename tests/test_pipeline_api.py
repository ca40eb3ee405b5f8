"""Fluent CorpusPipeline: chains reproduce the individual operators'
semantics, stay lazy, and compose end to end."""

import os

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.pipeline import CorpusPipeline
from subgraph_extractor_spark.sources import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_chain_matches_manual_composition(spark, docs):
    got = (
        CorpusPipeline(docs)
        .dedup_exact()
        .quality_gate(min_tokens=40, max_punct_ratio=0.1)
        .split("train")
        .df
    )
    from subgraph_extractor_spark.operators.dedup import exact_dedup
    from subgraph_extractor_spark.operators.sampling import split_assign

    text = F.col("text")
    n_tokens = F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, "[.,;:!?]", "")
    )
    want = (
        exact_dedup(docs, "text", "doc_id")
        .filter(
            (n_tokens >= 40)
            & (n_punct / F.greatest(F.length(text), F.lit(1)) <= 0.1)
        )
        .filter(split_assign(F.col("doc_id")) == "train")
    )
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in want.select("doc_id").collect())
    assert got.count() > 0


def test_chain_is_lazy_single_plan(spark, docs):
    p = (
        CorpusPipeline(docs)
        .quality_gate()
        .split("train")
        .shuffle_shards(4, "ep0")
    )
    # no action has run; the chain is one analyzable plan
    plan = p.df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in plan or "InMemory" in plan


def test_decontaminate_drops_benchmark_copies(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated content about spark pipelines here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    out = CorpusPipeline(corpus).decontaminate(bench, n=3, threshold=0.5).df
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_temperature_mix_and_shards_compose(spark, docs):
    out = (
        CorpusPipeline(docs)
        .temperature_mix("lang", tau=2.0)
        .shuffle_shards(4, "ep0")
        .df
    )
    rows = out.collect()
    assert rows and {"shard", "pos"} <= set(out.columns)
    assert "_stratum" not in out.columns and "_rk" not in out.columns


def test_write_shards_action(spark, docs, tmp_path):
    path = os.path.join(str(tmp_path), "out")
    CorpusPipeline(docs.select("doc_id", "text")).quality_gate().write_shards(
        path, 4, "ep0"
    )
    back = spark.read.parquet(path)
    assert back.count() > 0 and "shard" in back.columns


def test_minhash_and_passage_steps_run(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta " * 3),
            (2, "alpha beta gamma delta epsilon zeta eta theta " * 3),
            (3, "entirely different text with its own unique words here now"),
        ],
        ["doc_id", "text"],
    )
    out = CorpusPipeline(corpus).dedup_minhash(threshold=0.5).df
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]  # doc 2 is the near-dup loser
    cleaned = CorpusPipeline(corpus).remove_duplicate_passages(k=8).df
    assert cleaned.count() == 3  # text cut, rows kept


def test_takedown_exact_and_near_dup_expansion(spark):
    """Listed ids go; byte-exact copies under other ids go
    (exact_copy); near-duplicate edits go via transitive cluster
    expansion (near_dup); unrelated docs stay; the audit carries the
    strongest reason per id."""
    from subgraph_extractor_spark.pipeline import takedown

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = spark.createDataFrame(
        [
            (1, base),                         # listed
            (2, base),                         # exact copy of 1
            (3, base + "tail edit here"),      # near-dup of 1
            (4, base + "tail edit here x"),    # near-dup of 3 (chain)
            (5, "completely different content about spark engines "
                "and parquet files and shuffle partitions " * 4),
            (6, "another unrelated document with its own words "
                "entirely disjoint from anything removed " * 4),
        ],
        "doc_id long, text string",
    )
    removals = spark.createDataFrame([(1,)], "doc_id long")
    kept, audit = takedown(docs, removals, "doc_id", "text",
                           near_dups=True, threshold=0.5)
    reasons = {r["doc_id"]: r["reason"] for r in audit.collect()}
    assert reasons[1] == "listed"
    assert reasons[2] == "exact_copy"
    assert reasons[3] == "near_dup" and reasons[4] == "near_dup"
    assert set(reasons) == {1, 2, 3, 4}
    assert sorted(r["doc_id"] for r in kept.collect()) == [5, 6]


def test_takedown_exact_only_and_fluent_step(spark):
    from subgraph_extractor_spark.pipeline import CorpusPipeline, takedown

    docs = spark.createDataFrame(
        [(1, "aaa bbb ccc"), (2, "aaa bbb ccc"), (3, "xxx yyy zzz")],
        "doc_id long, text string",
    )
    removals = spark.createDataFrame([(2,), (99,)], "doc_id long")
    kept, audit = takedown(docs, removals, near_dups=False)
    # id 99 is not in the corpus: no audit row, no effect
    assert {r["doc_id"]: r["reason"] for r in audit.collect()} == {
        1: "exact_copy", 2: "listed"
    }
    assert [r["doc_id"] for r in kept.collect()] == [3]
    # fluent step keeps the surviving corpus
    out = CorpusPipeline(docs).takedown(removals, near_dups=False).df
    assert [r["doc_id"] for r in out.collect()] == [3]


def test_corpus_diff_statuses(spark):
    from pyspark.sql import functions as F

    from subgraph_extractor_spark.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma EDITED"), (4, ""), (5, "delta")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, "doc_id", "text").collect()
    }
    # 1 removed, 2 unchanged (suppressed), 3 changed, 4 NULL->'' is
    # byte-equal under the coalesce discipline (suppressed), 5 added
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_corpus_diff_digests_and_empty(spark):
    import hashlib

    from subgraph_extractor_spark.pipeline import corpus_diff

    old = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    new = spark.createDataFrame([(9, "world")], "doc_id long, text string")
    rows = corpus_diff(old, new, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0]["status"] == "changed"
    assert rows[0]["old_digest"] == hashlib.sha256(b"hello").hexdigest()
    assert rows[0]["new_digest"] == hashlib.sha256(b"world").hexdigest()
    same = corpus_diff(old, old, "doc_id", "text").collect()
    assert same == []
