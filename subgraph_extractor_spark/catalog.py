"""Catalog discovery — graph-node's deployment metadata as DataFrame ops.

The reference resolves subgraph label → (ipfs hash, schema, block
watermarks) with one 3-way LEFT-join SQL query over graph-node's catalog
tables (reference cli.py:72-92), re-run redundantly by three helpers
(cli.py:95-107).  Here it is a single DataFrame plan over four catalog
DataFrames (from JDBC, Parquet, or test fixtures per FIXTURES.md §A3) —
the dims are tiny, so every join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def discover_subgraphs(
    deployment_schemas: DataFrame,
    subgraph_version: DataFrame,
    subgraph: DataFrame,
    subgraph_deployment: DataFrame,
) -> DataFrame:
    """All active, currently-versioned subgraphs with their schema and
    block watermarks.  Mirrors the reference's discovery query semantics:
    LEFT joins  ds←sv (ds.subgraph = sv.deployment), sv←s
    (s.current_version = sv.id), ds←sd (sd.deployment = ds.subgraph);
    filter ds.active AND s.current_version IS NOT NULL; int-cast the
    numeric watermark columns (cli.py:74-91)."""
    ds = deployment_schemas.alias("ds")
    sv = F.broadcast(subgraph_version.alias("sv"))
    s = F.broadcast(subgraph.alias("s"))
    sd = F.broadcast(subgraph_deployment.alias("sd"))
    return (
        ds.join(sv, F.col("ds.subgraph") == F.col("sv.deployment"), "left")
        .join(s, F.col("s.current_version") == F.col("sv.id"), "left")
        .join(sd, F.col("sd.deployment") == F.col("ds.subgraph"), "left")
        .filter(F.col("ds.active") & F.col("s.current_version").isNotNull())
        .select(
            F.col("s.name").alias("label"),
            F.col("sv.id").alias("id"),
            F.col("ds.subgraph").alias("subgraph_deployment"),
            F.col("ds.name").alias("subgraph_table_schema"),
            F.col("sd.earliest_block_number").cast("int").alias("earliest_block"),
            F.col("sd.latest_ethereum_block_number").cast("int").alias("latest_block"),
        )
    )


def extractable_tables(columns_catalog: DataFrame) -> DataFrame:
    """Tables eligible for extraction = tables having a ``block_range``
    column (reference cli.py:366-380): filter → distinct → order."""
    return (
        columns_catalog.filter(F.col("column_name") == "block_range")
        .select("table_name")
        .distinct()
        .orderBy("table_name")
    )


def column_types(columns_catalog: DataFrame, schema: str, table: str) -> dict:
    """Column → type mapping for one table (reference cli.py:56-69).
    Driver-side dict (it parameterizes plan construction, not data)."""
    rows = (
        columns_catalog.filter(
            (F.col("table_schema") == schema) & (F.col("table_name") == table)
        )
        .select("column_name", "data_type")
        .collect()
    )
    return {r["column_name"]: r["data_type"] for r in rows}
