"""The error-bound contracts must be FALSIFIABLE — a contract that says
TRUE on garbage input is vacuous.  Feed deliberately-bad approximate
results into the contract helpers and assert the booleans flip."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from subgraph_extractor_spark.operators import similarity as sim_ops
from subgraph_extractor_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_ann_recall_contract_fails_on_garbage_neighbors(spark, emb):
    """An 'ANN' that returns self-invented neighbor ids far outside the
    id space can hit zero true pairs — recall_ge must be False."""
    ids = emb.select(F.col("vec_id").alias("query_id"))
    garbage = ids.select(
        "query_id",
        (F.col("query_id") + 10_000_000).alias("neighbor_id"),
        F.lit(1).alias("rank"),
    )
    out = em._ann_recall_contract(emb, garbage, 0.70).collect()[0]
    assert out["recall_ge_070"] is False
    assert out["n_queries"] == emb.count()


def test_ann_recall_contract_passes_on_exact_input(spark, emb):
    """Feeding the exact baseline itself gives recall 1.0 — the boolean
    the oracle side emits."""
    exact = sim_ops.brute_force_topk(emb, emb, "embedding", "vec_id", k=5)
    out = em._ann_recall_contract(emb, exact, 0.70).collect()[0]
    assert out["recall_ge_070"] is True


def test_exact_jaccard_pairs_matches_ngram_operator(spark, sf_dir):
    """The contracts' shared ground-truth helper must agree with the
    independently-oracled dedup_ngram_jaccard formulation (same
    shingles, same jaccard) at the same threshold."""
    from subgraph_extractor_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        F.col("doc_id").alias("_id"),
        dedup_ops.word_shingles(F.col("text"), 3).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    l, r = sh.alias("l"), sh.alias("r")
    want = {
        (row["id_a"], row["id_b"])
        for row in (
            l.join(r, F.col("l._id") < F.col("r._id"))
            .withColumn("j", dedup_ops.jaccard(F.col("l._sh"), F.col("r._sh")))
            .filter(F.col("j") >= 0.5)
            .select(
                F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b")
            )
            .collect()
        )
    }
    got = {
        (row["id_a"], row["id_b"])
        for row in em._exact_jaccard_pairs(spark, sf_dir, 0.5).collect()
    }
    assert got == want and got
