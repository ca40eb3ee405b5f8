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


def test_aqe_skew_join_splits_hot_partition(spark):
    """The engine leans on AQE for runtime skew handling (README scale
    design) — prove it actually fires: a join with one hot key, skew
    thresholds scaled down to test size, must show skew=true on the
    SortMergeJoin in the FINAL adaptive plan (i.e. the hot partition was
    split into multiple tasks instead of one straggler)."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 195k of 200k rows land on key 0 vs a uniform probe side: the
        # key-0 shuffle partition dwarfs every other.  (The hot key must
        # be DATA-dependent — a literal key constant-folds into a
        # cartesian-with-filter and never reaches the skew-join rule.)
        hot = spark.range(200_000).select(
            F.when(F.col("id") < 195_000, F.lit(0))
            .otherwise(F.col("id") % 50)
            .cast("long")
            .alias("k"),
            F.col("id").alias("payload"),
        )
        probe = spark.range(2_000).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("p2")
        )
        # aggregate ON TOP of the join and read that DataFrame's own
        # query execution after the action — df.count() would spawn a
        # separate execution whose final adaptive plan we can't reach.
        # sum(payload) keeps the distinct-valued payload column flowing
        # through the shuffle: counting alone would column-prune down to
        # the constant hot key, which compresses below any threshold.
        counted = hot.join(probe, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
        )
        # key 0: (195000 + 100) hot rows x 40 probe rows; keys 1-49: 100 x 40
        assert counted.collect()[0]["n"] == 195_100 * 40 + 49 * 100 * 40
        plan = counted._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE skew split did not fire:\n{plan}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
