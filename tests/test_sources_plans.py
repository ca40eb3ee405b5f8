"""Source readers (CSV/JSON round-trips, S10) and physical-plan shape
assertions: predicate pushdown reaching the parquet scan, column pruning,
broadcast joins where dims are small — the properties that decide whether
these plans survive a 100 TB scale-up (SURVEY §4)."""

import os

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.sources import load_table, range_scan
from subgraph_extractor_spark.sources.readers import read_csv, read_json


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    nation.write.option("header", "true").csv(csv_path)
    nation.write.json(json_path)

    back_csv = read_csv(spark, csv_path, schema=nation.schema)
    back_json = read_json(spark, json_path, schema=nation.schema)
    orig = {tuple(r) for r in nation.collect()}
    assert {tuple(r) for r in back_csv.collect()} == orig
    assert {tuple(r) for r in back_json.collect()} == orig


def test_range_scan_pushes_filter_to_parquet(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    scanned = range_scan(
        li, "l_orderkey", 100, 500, drop=("l_partkey",)
    ).select("_block_number", "l_quantity")
    plan = _executed_plan(scanned)
    # the half-open range must reach the scan as PushedFilters
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_orderkey,100" in plan
    assert "LessThan(l_orderkey,500" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    narrow = li.select("l_orderkey", "l_quantity")
    plan = _executed_plan(narrow)
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:300]


def test_small_dims_broadcast(spark, sf_dir):
    import __spark_entry__ as m

    plan = _executed_plan(m.queries()["j1_catalog_join_chain"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_hash_not_nested_loop(spark, sf_dir):
    import __spark_entry__ as m

    plan = _executed_plan(m.queries()["j5_range_join"](spark, sf_dir))
    # the bucketed rewrite must produce an equi-join (hash/broadcast-hash),
    # never BroadcastNestedLoopJoin over the raw range predicate
    assert "NestedLoop" not in plan


def test_whole_stage_codegen_on_agg_path(spark, sf_dir):
    import __spark_entry__ as m

    df = m.queries()["a3_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE: codegen spans appear once the final plan is picked
    plan = _executed_plan(df)
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan tree
    assert "*(" in plan and "isFinalPlan=true" in plan
    assert "HashAggregate" in plan
