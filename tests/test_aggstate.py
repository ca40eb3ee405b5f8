"""Exact mergeable aggregate state: merge == single-pass (bitwise),
pass-through of one-sided groups, associativity, mismatch guard."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import aggstate as A


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_single_pass_bitwise(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    full = A.finalize_aggregates(
        A.aggregate_state(li, ["l_returnflag"], "l_extendedprice")
    )
    inc = A.finalize_aggregates(
        A.merge_aggregate_states(
            A.aggregate_state(
                li.filter(F.col("l_orderkey") % 3 == 0),
                ["l_returnflag"], "l_extendedprice"),
            A.merge_aggregate_states(
                A.aggregate_state(
                    li.filter(F.col("l_orderkey") % 3 == 1),
                    ["l_returnflag"], "l_extendedprice"),
                A.aggregate_state(
                    li.filter(F.col("l_orderkey") % 3 == 2),
                    ["l_returnflag"], "l_extendedprice"),
            ),
        )
    )
    # three-way nested merge, bit-identical to the one-shot aggregate
    assert _rows(inc) == _rows(full)


def test_one_sided_groups_pass_through(spark):
    a = A.aggregate_state(
        spark.createDataFrame([("x", 1.0), ("x", 3.0)], ["g", "v"]),
        ["g"], "v")
    b = A.aggregate_state(
        spark.createDataFrame([("y", 10.0)], ["g", "v"]), ["g"], "v")
    out = {r.g: r for r in
           A.finalize_aggregates(A.merge_aggregate_states(a, b)).collect()}
    assert out["x"].n == 2 and out["x"].sum_v == 4.0 and out["x"].avg_v == 2.0
    assert out["y"].n == 1 and out["y"].min_v == 10.0 and out["y"].max_v == 10.0


def test_nulls_are_uncounted(spark):
    df = spark.createDataFrame(
        [("g", 2.0), ("g", None)], "g string, v double")
    st = A.aggregate_state(df, ["g"], "v")
    (r,) = A.finalize_aggregates(st).collect()
    assert r.n == 1 and r.sum_v == 2.0 and r.avg_v == 2.0


def test_state_schema_mismatch_raises(spark):
    a = A.aggregate_state(
        spark.createDataFrame([("x", 1.0)], ["g", "v"]), ["g"], "v")
    with pytest.raises(ValueError, match="state column mismatch"):
        A.merge_aggregate_states(a, a.drop("st_min"))
