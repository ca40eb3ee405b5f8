"""Time-series resample/gap-fill and cohort retention on hand corpora."""

from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.timeseries import (
    cohort_retention,
    epoch_bucket,
    resample_counts,
)

DAY = 86400


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "sec", "value"])


def test_resample_fills_gaps_with_zeros(spark):
    # user 1 active day 0 and day 3 -> days 1, 2 must appear with 0
    rows = [(1, 0, 1.0), (1, 10, 2.0), (1, 3 * DAY + 5, 4.0),
            (2, DAY, 8.0)]
    out = resample_counts(_ev(spark, rows), "sec", "user_id", DAY, "value")
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["sum_value"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (2, 3.0),
        (1, DAY): (0, 0.0),
        (1, 2 * DAY): (0, 0.0),
        (1, 3 * DAY): (1, 4.0),
        (2, DAY): (1, 8.0),
    }


def test_resample_without_value_col(spark):
    rows = [(1, 0, 1.0), (1, 2 * DAY, 1.0)]
    out = resample_counts(_ev(spark, rows), "sec", "user_id", DAY)
    assert "sum_value" not in out.columns
    assert out.count() == 3


def test_epoch_bucket_integer_floor(spark):
    df = spark.range(1).select(
        epoch_bucket(F.lit(100_000), 3600).alias("b")
    )
    assert df.head()["b"] == 100_000 - 100_000 % 3600


def test_cohort_retention_offsets(spark):
    W = 604800
    rows = [
        # cohort week 0: users 1, 2; user 1 returns weeks 1 and 2,
        # user 2 never returns
        (1, 0, 0.0), (1, W + 5, 0.0), (1, 2 * W + 5, 0.0),
        (2, 10, 0.0),
        # cohort week 1: user 3, returns week 2; duplicate visits in
        # one week count once
        (3, W + 1, 0.0), (3, W + 2, 0.0), (3, 2 * W + 9, 0.0),
    ]
    out = cohort_retention(_ev(spark, rows), "sec", "user_id", W)
    got = {
        (r["cohort"], r["period_offset"]): r["n_active"]
        for r in out.collect()
    }
    assert got == {
        (0, 0): 2, (0, 1): 1, (0, 2): 1,
        (W, 0): 1, (W, 1): 1,
    }


def test_funnel_min_chain_semantics(spark):
    rows = [
        # user 1 completes the full funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        # user 2: click BEFORE view, then no later click -> stops at view
        (2, 10, "click"), (2, 20, "view"), (2, 30, "buy"),
        # user 3: tie on the boundary counts (click at view's instant)
        (3, 10, "view"), (3, 10, "click"),
        # user 4: never views
        (4, 5, "click"), (4, 6, "buy"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "sec", "event_type"])
    from subgraph_extractor_spark.operators.timeseries import funnel_counts

    out = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_counts(
            ev, "sec", "user_id", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert out == {1: ("view", 3), 2: ("click", 2), 3: ("buy", 1)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_counts(ev, "sec", "user_id", "event_type", [])


def test_sliding_counts_membership(spark):
    # interval 10, hop 5: event at t=12 belongs to windows 5 and 10;
    # t=4 belongs to -5 (hop-aligned: 0 and -5... floor((4-10)/5)*5+5 = -5) and 0
    ev = spark.createDataFrame([(12,), (4,)], ["sec"])
    from subgraph_extractor_spark.operators.timeseries import sliding_counts

    got = {
        r["window_start"]: r["n_events"]
        for r in sliding_counts(ev, "sec", 10, 5).collect()
    }
    assert got == {-5: 1, 0: 1, 5: 1, 10: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_counts(ev, "sec", 10, 3)


def test_ohlc_downsample_matches_python_reference(spark):
    from subgraph_extractor_spark.operators import timeseries as ts_ops

    rows = [
        # (key, sec, id, value) — bucket width 10; id breaks ts ties
        ("a", 3, 1, 5.0), ("a", 1, 2, 9.0), ("a", 9, 3, 2.0),
        ("a", 1, 1, 7.0),              # same ts as id 2 — id 1 wins open
        ("a", 12, 4, 4.0),             # second bucket, single tick
        ("b", 5, 1, 1.0), ("b", 5, 2, 8.0),  # all ties on ts
    ]
    df = spark.createDataFrame(rows, ["k", "sec", "eid", "v"])
    got = {
        (r["k"], r["bucket_start"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_ticks"]
        )
        for r in ts_ops.ohlc_downsample(
            df, ["k"], F.col("sec"), F.col("v"), 10,
            order_tiebreak=F.col("eid"),
        ).collect()
    }
    assert got == {
        ("a", 0): (7.0, 9.0, 2.0, 2.0, 4),
        ("a", 10): (4.0, 4.0, 4.0, 4.0, 1),
        ("b", 0): (1.0, 8.0, 1.0, 8.0, 2),
    }

    import pytest as _pytest
    with _pytest.raises(ValueError):
        ts_ops.ohlc_downsample(df, ["k"], F.col("sec"), F.col("v"), 0)


def test_interpolate_resample_linear_and_exact_hits(spark):
    from subgraph_extractor_spark.operators.timeseries import (
        interpolate_resample,
    )

    # key 1: observations at t=0 (v=10) and t=200 (v=30); grid step 50
    # -> grid at 0,50,100,150,200 with linear values 10,15,20,25,30.
    # key 2: one observation exactly on a grid point -> reproduced.
    rows = [
        (1, 0, 10.0), (1, 200, 30.0),
        (2, 100, 7.5),
        # key 3: span contains no grid point -> no output rows
        (3, 60, 1.0), (3, 90, 2.0),
    ]
    df = spark.createDataFrame(rows, "k long, t long, v double").select(
        "k", F.col("t").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r["k"], r["grid_ts"]): r["value"]
        for r in interpolate_resample(df, "ts", "k", "v", 50).collect()
    }
    assert out == {
        (1, 0): 10.0, (1, 50): 15.0, (1, 100): 20.0,
        (1, 150): 25.0, (1, 200): 30.0,
        (2, 100): 7.5,
    }


def test_interpolate_resample_same_second_collapse_and_invariance(spark):
    from subgraph_extractor_spark.operators.timeseries import (
        interpolate_resample,
    )

    rows = [(1, 0, 4.0), (1, 0, 2.0), (1, 100, 12.0)]  # t=0 collapses to 2.0
    df = spark.createDataFrame(rows, "k long, t long, v double").select(
        "k", F.col("t").cast("timestamp").alias("ts"), "v"
    )
    a = sorted(map(tuple, interpolate_resample(
        df.coalesce(1), "ts", "k", "v", 50).collect()))
    b = sorted(map(tuple, interpolate_resample(
        df.repartition(7), "ts", "k", "v", 50).collect()))
    assert a == b
    got = {(k, t): v for k, t, v in a}
    assert got[(1, 0)] == 2.0
    assert got[(1, 50)] == 7.0
    assert got[(1, 100)] == 12.0
