"""Table profiling: hand-corpus expectations, approx mode, one-scan
plan shape, unknown-column guard."""

import pytest

from subgraph_extractor_spark.operators import profile as P


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "b", 2.5),
            (2, "a", None),
            (3, "a", -1.0),
            (4, None, 2.5),
        ],
        "id bigint, s string, v double",
    )


def test_profile_values(tbl):
    out = {r.col_name: r for r in P.profile_table(tbl).collect()}
    assert set(out) == {"id", "s", "v"}
    r = out["id"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (4, 0, 4)
    assert (r.min_num, r.max_num) == (1.0, 4.0)
    assert r.min_str is None and r.max_str is None
    r = out["s"]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (4, 1, 2)
    assert (r.min_str, r.max_str) == ("a", "b")
    assert r.min_num is None
    r = out["v"]
    assert (r.n_nulls, r.n_distinct) == (1, 2)
    assert (r.min_num, r.max_num) == (-1.0, 2.5)


def test_column_subset_and_guard(tbl):
    assert P.profile_table(tbl, ["s"]).count() == 1
    with pytest.raises(ValueError, match="unknown columns"):
        P.profile_table(tbl, ["nope"])


def test_approx_mode_close_and_no_expand(tbl, spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_orderkey", "l_partkey", "l_quantity"]
    exact = {r.col_name: r.n_distinct
             for r in P.profile_table(li, cols).collect()}
    approx = P.profile_table(li, cols, exact_distinct=False)
    for r in approx.collect():
        assert abs(r.n_distinct - exact[r.col_name]) <= 0.1 * exact[r.col_name]
    # approx mode must plan WITHOUT the multi-distinct Expand
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        P.profile_table(li, cols)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # documented cost of exact mode
