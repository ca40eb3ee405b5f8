"""Sharded Bloom membership sketch: no false negatives, bounded FPR,
merge associativity, and exactness of the Bloom-accelerated incremental
dedup (must equal the plain anti-join path row-for-row)."""

import math

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import bloom as B
from subgraph_extractor_spark.operators import dedup as D

SHARDS, BITS, HASHES = 8, 1 << 16, 7


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.range(5000).select(
        F.concat(F.lit("corpus-"), F.col("id")).alias("k")
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def sketch(corpus):
    sk = B.bloom_build(corpus, "k", num_shards=SHARDS, num_bits=BITS,
                       num_hashes=HASHES)
    sk.cache().count()
    return sk


def test_no_false_negatives(corpus, sketch):
    probed = B.bloom_probe(corpus, "k", sketch, num_shards=SHARDS)
    assert probed.filter(~F.col("maybe_in_corpus")).count() == 0


def test_fpr_within_theoretical_envelope(spark, sketch):
    novel = spark.range(20000).select(
        F.concat(F.lit("novel-"), F.col("id")).alias("k")
    )
    fp = (
        B.bloom_probe(novel, "k", sketch, num_shards=SHARDS)
        .filter(F.col("maybe_in_corpus"))
        .count()
    )
    # per-shard load n~625, m=65536, k=7 -> fpr ~ (1-e^(-kn/m))^k
    fpr = (1 - math.exp(-HASHES * 625 / BITS)) ** HASHES
    assert fp <= max(20, 3 * fpr * 20000)


def test_merge_equals_single_pass(corpus, sketch):
    lo = corpus.filter(F.col("k") < "corpus-3")
    hi = corpus.filter(F.col("k") >= "corpus-3")
    parts = B.bloom_build(lo, "k", SHARDS, BITS, HASHES).unionByName(
        B.bloom_build(hi, "k", SHARDS, BITS, HASHES)
    )
    merged = {
        r["shard"]: bytes(r["bitmap"])
        for r in B.bloom_merge(parts).collect()
    }
    single = {r["shard"]: bytes(r["bitmap"]) for r in sketch.collect()}
    assert merged == single


def test_merge_rejects_mixed_geometry(spark, corpus):
    a = B.bloom_build(corpus, "k", SHARDS, BITS, HASHES)
    b = B.bloom_build(corpus, "k", SHARDS, BITS * 2, HASHES)
    with pytest.raises(Exception, match="mixed num_bits"):
        B.bloom_merge(a.unionByName(b)).collect()


def test_incremental_bloom_path_is_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    corpus_digests = corpus.select(
        F.sha2(F.col("text"), 256).alias("content_sha256")
    ).distinct()
    corpus_digests.cache().count()
    sketch = B.bloom_build(
        corpus_digests, "content_sha256", SHARDS, BITS, HASHES
    )
    sketch.cache().count()
    # batch = dups (odd ids whose text may collide with even) + novel text
    batch = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" NOVEL")))
        .otherwise(F.col("text")),
    )
    plain = D.exact_dedup_incremental(batch, "text", "doc_id", corpus_digests)
    fast = B.exact_dedup_incremental_bloom(
        batch, "text", "doc_id", corpus_digests, sketch, num_shards=SHARDS
    )
    a = {tuple(r) for r in plain.select("doc_id", "content_sha256").collect()}
    b = {tuple(r) for r in fast.select("doc_id", "content_sha256").collect()}
    assert a == b and len(a) > 0


def test_sketch_table_survives_parquet_roundtrip(spark, corpus, sketch,
                                                 tmp_path):
    """Durability: the sketch is a plain DataFrame — write to parquet,
    read back, merge with a fresh batch, and probes behave identically
    to the all-in-memory path."""
    store = str(tmp_path / "bloom_store")
    sketch.write.parquet(store)
    stored = spark.read.parquet(store)
    extra = spark.range(5000, 6000).select(
        F.concat(F.lit("corpus-"), F.col("id")).alias("k")
    )
    refreshed = B.bloom_merge(
        stored.unionByName(
            B.bloom_build(extra, "k", SHARDS, BITS, HASHES)
        )
    )
    both = corpus.unionByName(extra)
    probed = B.bloom_probe(both, "k", refreshed, num_shards=SHARDS)
    assert probed.filter(~F.col("maybe_in_corpus")).count() == 0


def test_probe_empty_sketch_flags_all_false(spark, corpus):
    empty = B.bloom_build(
        corpus.filter(F.lit(False)), "k", SHARDS, BITS, HASHES
    )
    probed = B.bloom_probe(corpus, "k", empty, num_shards=SHARDS)
    assert probed.filter(F.col("maybe_in_corpus")).count() == 0
    assert probed.count() == corpus.count()
