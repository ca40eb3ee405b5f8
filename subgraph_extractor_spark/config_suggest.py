"""Config suggestion — the non-interactive core of the reference's
``subgraph_config_generator`` entry point (cli.py:383-487, SURVEY §3.2).

The reference walks the user through a terminal menu and then emits YAML
with per-table defaults: the standard partition-size stack
(cli.py:450-456) and, for every unbounded-numeric column, a uint64
mapping clamped at uint64-max with a validity flag (cli.py:458-484).
This function produces the same config dict from a schema inspection, so
callers can wrap any UX (or none) around it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# month / week / day / ~90 min of 5-second blocks (reference default)
DEFAULT_PARTITION_SIZES = [1024 * 512, 1024 * 128, 1024 * 16, 1024]

UINT64_MAX = 2**64 - 1


def _is_unbounded_numeric(dt: T.DataType) -> bool:
    """The carrier types a graph-node uint256 column lands in on our
    side: wide decimals (Parquet/JDBC) — reference: Postgres `numeric`."""
    return isinstance(dt, T.DecimalType) and dt.precision > 18


def suggest_table_config(
    df: DataFrame,
    block_column: str = "_block_number",
    partition_sizes: list[int] | None = None,
) -> dict:
    """Default extraction config for one entity table: partition stack +
    a clamped-uint64 mapping (with validity column) per numeric column,
    originals kept as bytes (numeric_columns)."""
    numeric_cols = [
        f.name for f in df.schema.fields if _is_unbounded_numeric(f.dataType)
    ]
    column_mappings = {
        c: {
            f"{c}_uint64": {
                "type": "uint64",
                "max_value": UINT64_MAX,
                "default": 0,
                "validity_column": f"{c}_uint64_valid",
            }
        }
        for c in numeric_cols
    }
    # bookkeeping columns the reference always drops from exports
    # (cli.py:53: vid, block_range)
    bookkeeping = [
        c
        for c in ("vid", "block_range", "block_range_start", "block_range_end")
        if c in df.columns
    ]
    conf: dict = {
        "partition_sizes": list(partition_sizes or DEFAULT_PARTITION_SIZES),
        "block_column": block_column,
    }
    if bookkeeping:
        conf["drop_columns"] = bookkeeping
    if numeric_cols:
        conf["numeric_columns"] = numeric_cols
        conf["column_mappings"] = column_mappings
    return conf


def suggest_config(
    name: str,
    version: str,
    subgraph: str,
    tables: dict[str, DataFrame],
    partition_sizes: list[int] | None = None,
) -> dict:
    """Full dataset config (the shape run_extraction consumes)."""
    return {
        "name": name,
        "version": version,
        "subgraph": subgraph,
        "tables": {
            t: suggest_table_config(df, partition_sizes=partition_sizes)
            for t, df in tables.items()
        },
    }
