"""Mergeable histogram state: merge == single-pass bitwise, geometry
guard, clamping, percentile bound, batch-boundary independence."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import histogram as H


def _state_rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_single_pass(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    full = H.histogram_state(li, "l_extendedprice", 0.0, 120000.0, 240)
    inc = H.merge_histogram_states(
        H.histogram_state(li.filter(F.col("l_orderkey") % 2 == 0),
                          "l_extendedprice", 0.0, 120000.0, 240),
        H.histogram_state(li.filter(F.col("l_orderkey") % 2 == 1),
                          "l_extendedprice", 0.0, 120000.0, 240),
    )
    assert _state_rows(inc) == _state_rows(full)


def test_geometry_mismatch_raises(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    a = H.histogram_state(df, "v", 0.0, 10.0, 10)
    b = H.histogram_state(df, "v", 0.0, 10.0, 20)
    with pytest.raises(ValueError, match="geometry mismatch"):
        H.merge_histogram_states(a, b)
    with pytest.raises(ValueError, match="bad histogram geometry"):
        H.histogram_state(df, "v", 10.0, 0.0, 10)


def test_nan_excluded_like_null(spark):
    # floor(NaN) casts to 0 in Spark — without the filter NaN rows
    # would silently inflate bin 0 (and the same cast hard-errors on
    # other engines)
    df = spark.createDataFrame(
        [(float("nan"),), (1.0,), (None,)], "v double")
    st = {r.bin: r.n for r in
          H.histogram_state(df, "v", 0.0, 10.0, 10).collect()}
    assert st == {1: 1}  # only the 1.0 row (bin 1); NaN/NULL excluded


def test_percentile_range_guard(spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    st = H.histogram_state(df, "v", 0.0, 10.0, 10)
    with pytest.raises(ValueError, match="outside"):
        H.percentiles_from_histogram(st, [1.5])
    with pytest.raises(ValueError, match="outside"):
        H.percentiles_from_histogram(st, [0.0])


def test_out_of_range_clamps_to_edge_bins(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (99.0,), (None,)],
        "v double")
    st = {r.bin: r.n for r in
          H.histogram_state(df, "v", 0.0, 10.0, 10).collect()}
    assert st[0] == 2          # -5.0 clamped + 0.0
    assert st[9] == 3          # 9.9 + 10.0 (right edge) + 99.0 clamped
    assert sum(st.values()) == 5  # NULL excluded


def test_hard_bound_vs_nearest_rank_quantile(spark):
    # the GUARANTEED bound: est in (v, v + width] where v is the
    # nearest-rank quantile — including the sparse-bin case where the
    # interpolated quantile_cont anchor sits several bins away
    vals = [0.5, 9.5]  # p=0.5 interpolates to 5.0, nearest-rank is 0.5
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    st = H.histogram_state(df, "v", 0.0, 10.0, 10)
    (r,) = H.percentiles_from_histogram(st, [0.5]).collect()
    import math

    sv = sorted(vals)
    rank_v = sv[max(0, math.ceil(0.5 * len(sv)) - 1)]  # nearest-rank
    assert rank_v < r.est <= rank_v + 1.0  # one bin width = 1.0


def test_multiple_ps_single_pass_and_empty_guard(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    st = H.histogram_state(li, "l_extendedprice", 0.0, 120000.0, 240)
    out = H.percentiles_from_histogram(st, [0.1, 0.5, 0.9])
    assert {r.p for r in out.collect()} == {0.1, 0.5, 0.9}
    with pytest.raises(ValueError, match="non-empty"):
        H.percentiles_from_histogram(st, [])


def test_percentile_bound_one_bin_width(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    st = H.histogram_state(li, "l_extendedprice", 0.0, 120000.0, 240)
    est = {r.p: r.est for r in
           H.percentiles_from_histogram(st, [0.1, 0.5, 0.9, 0.99]).collect()}
    exact = li.agg(*[
        F.percentile("l_extendedprice", F.lit(p)).alias(str(p))
        for p in [0.1, 0.5, 0.9, 0.99]
    ]).collect()[0]
    # vs the INTERPOLATED anchor this is a fixture observation (dense
    # bins), not the operator guarantee — see the nearest-rank test for
    # the hard bound
    for p in [0.1, 0.5, 0.9, 0.99]:
        assert 0.0 <= est[p] - exact[str(p)] <= 500.0, (p, est[p], exact[str(p)])


def test_three_way_merge_any_boundaries(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parts = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    mk = lambda d: H.histogram_state(d, "l_extendedprice", 0.0, 120000.0, 64)  # noqa: E731
    m = H.merge_histogram_states(
        H.merge_histogram_states(mk(parts[0]), mk(parts[1])), mk(parts[2]))
    full = mk(li)
    est_m = sorted(map(tuple, H.percentiles_from_histogram(m, [0.5]).collect()))
    est_f = sorted(map(tuple, H.percentiles_from_histogram(full, [0.5]).collect()))
    assert est_m == est_f
