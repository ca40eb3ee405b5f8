"""Bucketed co-located joins (no Exchange) and transitive duplicate
clustering."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from subgraph_extractor_spark.operators.dedup import duplicate_clusters
from subgraph_extractor_spark.sources import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    joined = bucketed_join(spark, "b_orders", "b_lineitem", on="o_orderkey")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert joined.count() == lineitem.count()  # FK join keeps all lineitems


def test_duplicate_clusters_transitive(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        ["id_a", "id_b"],
    )
    labels = {
        r["member_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1,          # chain a-b-c collapses
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20,  # 4-chain
    }
