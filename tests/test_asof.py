"""As-of join, range join, state-as-of-block."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import asof


def test_asof_backward(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 15)], ["k", "t"]
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 18, "b"), (2, 99, "z")], ["k", "rt", "v"]
    )
    out = asof.asof_join(left, right, "k", "t", "rt", ["v"])
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    # t=10 matches rt=10 (<= inclusive), t=20 -> rt=18, t=5 -> none
    assert got == {(1, 10): "a", (1, 20): "b", (1, 5): None, (2, 15): None}


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 10), (1, 19)], ["k", "t"])
    right = spark.createDataFrame([(1, 12, "x"), (1, 19, "y")], ["k", "rt", "v"])
    out = asof.asof_join(left, right, "k", "t", "rt", ["v"], direction="forward")
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == {(1, 10): "x", (1, 19): "y"}


def test_range_join_equals_naive(spark, sf_dir):
    from subgraph_extractor_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    iv = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("lo"), (F.col("event_id") + 300).alias("hi"),
        F.col("user_id").alias("iv_user"),
    )
    fast = asof.range_join(ev, iv, "event_id", "lo", "hi", bucket_width=128)
    naive = ev.join(
        iv, (F.col("event_id") >= F.col("lo")) & (F.col("event_id") < F.col("hi"))
    )
    fast_set = {(r["event_id"], r["lo"]) for r in fast.collect()}
    naive_set = {(r["event_id"], r["lo"]) for r in naive.collect()}
    assert fast_set == naive_set and fast_set


def test_state_as_of_block(spark):
    versions = spark.createDataFrame(
        [
            ("e1", 100, 200, "v1"),
            ("e1", 200, None, "v2"),
            ("e2", 150, None, "v1"),
            ("e3", 300, None, "v1"),
        ],
        ["id", "block_range_start", "block_range_end", "val"],
    )
    live = asof.state_as_of_block(versions, 250)
    got = {(r["id"], r["val"]) for r in live.collect()}
    assert got == {("e1", "v2"), ("e2", "v1")}
    live150 = asof.state_as_of_block(versions, 150)
    got150 = {(r["id"], r["val"]) for r in live150.collect()}
    assert got150 == {("e1", "v1"), ("e2", "v1")}
