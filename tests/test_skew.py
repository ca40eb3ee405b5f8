"""Salted aggregation / join must be result-identical to their plain
counterparts while spreading hot keys across n_salts shuffle keys."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import skew
from subgraph_extractor_spark.sources import load_table


def test_salted_agg_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        tuple(r)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("l_orderkey").alias("mn"),
            F.max("l_orderkey").alias("mx"),
        )
        .collect()
    }
    salted = {
        tuple(r)
        for r in skew.salted_agg(
            li.withColumn("qd", F.col("l_quantity").cast("decimal(18,2)")),
            ["l_returnflag"],
            {
                "s": ("qd", "sum"),
                "c": ("qd", "count"),
                "mn": ("l_orderkey", "min"),
                "mx": ("l_orderkey", "max"),
            },
            salt_src="l_orderkey",
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # skewed build side keyed by returnflag-ish low-cardinality key
    dim = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = {tuple(r) for r in li.join(dim, "l_partkey").collect()}
    salted = {
        tuple(r)
        for r in skew.salted_join(
            li, dim, on=["l_partkey"], salt_src="l_orderkey", n_salts=4
        ).collect()
    }
    assert salted == plain


def test_non_decomposable_agg_rejected(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        skew.salted_agg(
            li, ["l_returnflag"], {"a": ("l_quantity", "avg")},
            salt_src="l_orderkey",
        )
