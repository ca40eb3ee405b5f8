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


def test_asof_nearest_matches_pandas(spark):
    """'nearest' must agree with pandas merge_asof(direction='nearest')
    on tie-free data, and ties must break to the backward side (our
    documented rule)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(1, 4, 60),
            "t": rng.choice(np.arange(0, 600, 2), 60, replace=False),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(1, 4, 40),
            "rt": rng.choice(np.arange(1, 601, 2), 40, replace=False),
            "v": [f"v{i}" for i in range(40)],
        }
    )  # odd right times vs even left times -> no |d| ties possible
    want_pd = pd.merge_asof(
        left_pd.sort_values("t"),
        right_pd.sort_values("rt"),
        left_on="t",
        right_on="rt",
        by="k",
        direction="nearest",
    )
    want = {
        (int(r.k), int(r.t)): (None if pd.isna(r.v) else r.v)
        for r in want_pd.itertuples()
    }
    out = asof.asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        "k",
        "t",
        "rt",
        ["v"],
        direction="nearest",
    )
    got = {(r["k"], r["t"]): r["v"] for r in out.collect()}
    assert got == want

    # tie: |10-8| == |10-12| -> backward wins
    left = spark.createDataFrame([(1, 10)], ["k", "t"])
    right = spark.createDataFrame(
        [(1, 8, "back"), (1, 12, "fwd")], ["k", "rt", "v"]
    )
    tie = asof.asof_join(
        left, right, "k", "t", "rt", ["v"], direction="nearest"
    ).collect()
    assert tie[0]["v"] == "back"
