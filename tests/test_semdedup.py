"""SemDeDup-style semantic dedup: cluster survivors, score rules, and
partition/consistency properties against the pair graph."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.dedup import duplicate_clusters
from subgraph_extractor_spark.operators.semdedup import (
    cluster_representatives,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # ids 1..9; pairs form clusters {1,2,3} (transitive chain), {5,6};
    # 4, 7, 8, 9 are singletons
    df = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(1, 10)], ["doc_id", "score"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    return df, pairs


def test_min_id_survivors(spark, corpus):
    df, pairs = corpus
    out = semantic_dedup(df, pairs, "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 4, 5, 7, 8, 9]
    # original columns preserved
    assert out.columns == df.columns


def test_best_score_survivors(spark, corpus):
    df, pairs = corpus
    # score = 10 - id, so the HIGHEST score is the LOWEST id — flip the
    # score to make the rule pick the highest id instead
    flipped = df.withColumn("score", -F.col("score"))
    out = semantic_dedup(flipped, pairs, "doc_id", score_col="score")
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4, 6, 7, 8, 9]


def test_score_tie_breaks_to_lowest_id(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], ["doc_id", "score"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = semantic_dedup(df, pairs, "doc_id", score_col="score")
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_alternative_clusters_fn_equivalent(spark, corpus):
    df, pairs = corpus
    a = semantic_dedup(df, pairs, "doc_id")
    b = semantic_dedup(df, pairs, "doc_id", clusters_fn=duplicate_clusters)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_survivor_properties_on_fixture_embeddings(spark, sf_dir):
    """Partition property on real data: survivors + losers = corpus; no
    two members of one cluster survive; every loser's cluster has
    exactly one surviving representative."""
    from subgraph_extractor_spark.operators.dedup import (
        duplicate_clusters_star,
        embedding_neardup_pairs,
    )
    from subgraph_extractor_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=0.3
    ).select("id_a", "id_b")
    pairs = pairs.persist()
    out = semantic_dedup(emb, pairs, "vec_id")
    survivors = {r["vec_id"] for r in out.select("vec_id").collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert survivors <= all_ids
    clusters = duplicate_clusters_star(pairs)
    by_cluster = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["member_id"])
    paired_ids = set().union(*by_cluster.values()) if by_cluster else set()
    # unpaired ids all survive
    assert (all_ids - paired_ids) <= survivors
    for members in by_cluster.values():
        assert len(members & survivors) == 1, members
    pairs.unpersist()


def test_cluster_representatives_default_rule(spark):
    clusters = spark.createDataFrame(
        [(7, 1), (3, 1), (9, 2)], ["member_id", "cluster_id"]
    )
    reps = {
        r["cluster_id"]: r["rep_id"]
        for r in cluster_representatives(clusters).collect()
    }
    assert reps == {1: 3, 2: 9}
