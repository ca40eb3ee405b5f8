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


def interactive_config(
    name: str,
    version: str,
    subgraph: str,
    tables: dict[str, DataFrame],
    *,
    input_fn=input,
    echo=print,
    preview_rows: int = 10,
    partition_sizes: list[int] | None = None,
) -> dict:
    """Curses-free interactive twin of :func:`suggest_config` — the
    reference's ``config_generator`` flow (cli.py:383-487) re-expressed
    as a plain prompt loop so it runs anywhere a TTY (or a scripted
    stdin) exists, no TerminalMenu dependency:

    1. table multi-select with live ``LIMIT 10`` previews
       (``p <i>`` previews a table, reference cli.py:429-434;
       '', 'all', or a comma list of indices/names selects);
    2. per selected table, multi-select WHICH unbounded-numeric columns
       get the clamped-uint64 mapping (reference cli.py:466-484;
       '' or 'all' maps every one — the non-interactive default —
       'none' maps none; unmapped numerics still export as bytes via
       ``numeric_columns``, the reference's fallback).

    Accepting every default produces a dict IDENTICAL to
    :func:`suggest_config` (the tested contract).  ``input_fn`` /
    ``echo`` exist so tests drive the loop with scripted stdin."""
    names = sorted(tables)
    echo("Please select the tables you want to extract")
    for i, t in enumerate(names):
        echo(f"  [{i}] {t}")
    echo("('' or 'all' = every table; 'p <i>' previews LIMIT "
         f"{preview_rows}; or a comma list of indices/names)")
    chosen: list[str] | None = None
    while chosen is None:
        raw = input_fn("tables> ").strip()
        if raw.startswith("p ") or raw.startswith("p\t"):
            tok = raw[1:].strip()
            t = (
                names[int(tok)]
                if tok.isdigit() and int(tok) < len(names)
                else tok
            )
            if t not in tables:
                echo(f"no such table: {t}")
                continue
            echo(tables[t].limit(preview_rows).toPandas().to_string())
            continue
        if raw in ("", "all"):
            chosen = list(names)
            continue
        picks, ok = [], True
        for item in raw.split(","):
            item = item.strip()
            t = (
                names[int(item)]
                if item.isdigit() and int(item) < len(names)
                else item
            )
            if t not in tables:
                echo(f"no such table: {item}")
                ok = False
                break
            if t not in picks:
                picks.append(t)
        if ok and picks:
            chosen = picks

    conf: dict = {
        "name": name,
        "version": version,
        "subgraph": subgraph,
        "tables": {},
    }
    for t in chosen:
        tc = suggest_table_config(
            tables[t], partition_sizes=partition_sizes
        )
        numeric = tc.get("numeric_columns", [])
        if numeric:
            echo(
                f"These columns in table {t} are unbounded-numeric and "
                "will be exported as bytes unless mapped — which should "
                "be mapped to uint64?"
            )
            for i, c in enumerate(numeric):
                echo(f"  [{i}] {c}")
            echo("('' or 'all' = every column; 'none' = keep all as bytes)")
            sel: list[str] | None = None
            while sel is None:
                raw = input_fn(f"{t} mappings> ").strip()
                if raw in ("", "all"):
                    sel = list(numeric)
                elif raw == "none":
                    sel = []
                else:
                    picks, ok = [], True
                    for item in raw.split(","):
                        item = item.strip()
                        c = (
                            numeric[int(item)]
                            if item.isdigit() and int(item) < len(numeric)
                            else item
                        )
                        if c not in numeric:
                            echo(f"no such column: {item}")
                            ok = False
                            break
                        if c not in picks:
                            picks.append(c)
                    if ok:
                        sel = picks
            if set(sel) != set(numeric):
                mappings = {
                    c: m
                    for c, m in tc["column_mappings"].items()
                    if c in set(sel)
                }
                if mappings:
                    tc["column_mappings"] = mappings
                else:
                    del tc["column_mappings"]
        conf["tables"][t] = tc
    return conf
