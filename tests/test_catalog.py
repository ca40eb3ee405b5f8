"""Catalog discovery (FIXTURES.md §A3): the 3-way LEFT join resolving
active subgraphs to schema + watermarks (reference cli.py:72-92), the
extractable-table listing, and column-type introspection."""

import pytest
from pyspark.sql import Row

from subgraph_extractor_spark.catalog import (
    column_types,
    discover_subgraphs,
    extractable_tables,
)


@pytest.fixture(scope="module")
def catalog(spark):
    ds = spark.createDataFrame(
        [
            Row(subgraph="SUBGRAPHIPFS", name="sgd1", network="xdai", active=True),
            Row(subgraph="OLDIPFS", name="sgd0", network="xdai", active=False),
            Row(subgraph="NOVERSION", name="sgd2", network="xdai", active=True),
        ]
    )
    sv = spark.createDataFrame(
        [
            Row(deployment="SUBGRAPHIPFS", id="internalversion1"),
            Row(deployment="OLDIPFS", id="internalversion0"),
            Row(deployment="NOVERSION", id="internalversionX"),
        ]
    )
    s = spark.createDataFrame(
        [
            Row(name="my_test_subgraph", current_version="internalversion1"),
            Row(name="stale_subgraph", current_version=None),
        ]
    )
    sd = spark.createDataFrame(
        [
            Row(
                deployment="SUBGRAPHIPFS",
                earliest_block_number=18000000,
                latest_ethereum_block_number=19000000,
                synced=True,
                failed=False,
            )
        ]
    )
    return ds, sv, s, sd


def test_discover_subgraphs_golden(spark, catalog):
    """Mirrors the reference's golden discovery result
    (tests/test_get_column_info.py:42-58): one active, currently-versioned
    subgraph resolving to schema sgd1 with its block watermarks."""
    out = discover_subgraphs(*catalog).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row == {
        "label": "my_test_subgraph",
        "id": "internalversion1",
        "subgraph_deployment": "SUBGRAPHIPFS",
        "subgraph_table_schema": "sgd1",
        "earliest_block": 18000000,
        "latest_block": 19000000,
    }


def test_discovery_uses_broadcast_joins(spark, catalog):
    plan = discover_subgraphs(*catalog)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_extractable_tables(spark):
    cols = spark.createDataFrame(
        [
            Row(table_schema="sgd1", table_name="prepaid_card", column_name="block_range", data_type="int4range"),
            Row(table_schema="sgd1", table_name="prepaid_card", column_name="vid", data_type="bigint"),
            Row(table_schema="sgd1", table_name="ask", column_name="block_range", data_type="int4range"),
            Row(table_schema="sgd1", table_name="_metadata_tbl", column_name="id", data_type="text"),
        ]
    )
    out = [r["table_name"] for r in extractable_tables(cols).collect()]
    assert out == ["ask", "prepaid_card"]  # ordered, no block_range-less tables


def test_column_types(spark):
    cols = spark.createDataFrame(
        [
            Row(table_schema="sgd1", table_name="ask", column_name="id", data_type="text"),
            Row(table_schema="sgd1", table_name="ask", column_name="price", data_type="numeric"),
            Row(table_schema="sgd2", table_name="ask", column_name="other", data_type="text"),
        ]
    )
    assert column_types(cols, "sgd1", "ask") == {"id": "text", "price": "numeric"}
