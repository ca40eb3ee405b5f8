"""Command-line entry points — parity with the reference's console
scripts (setup.py:36-41): ``subgraph_extractor`` (run an extraction from
a YAML config) and ``subgraph_config_generator`` (emit a default config),
re-based on Parquet-staged entity tables instead of a live Postgres.

Usage::

    python -m subgraph_extractor_spark extract \
        --config config.yaml --tables-dir ./entities --output ./out
    python -m subgraph_extractor_spark suggest-config \
        --tables-dir ./entities --name my_extract --version 0.0.1 \
        --subgraph QmHASH --output config.yaml

``--tables-dir`` holds one ``<table>.parquet`` file/dir per entity table,
each carrying the block column (default ``_block_number``).  Watermarks
default to the min/max block across the configured tables, exactly the
role graph-node's catalog watermarks play for the reference
(cli.py:95-107).
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml


def _no_active_session() -> bool:
    """True when this process/thread has no live SparkSession yet.

    Commands stop only sessions they created: invoked in-process (a
    test, a notebook, another Spark app), ``get_spark`` reuses the
    host's session and ``spark.stop()`` here would kill the host's
    SparkContext out from under it (the r11 pytest cascade class)."""
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() is None


def _load_tables(spark, tables_dir: str, names):
    out = {}
    for name in names:
        path = os.path.join(tables_dir, f"{name}.parquet")
        if not os.path.exists(path):
            path = os.path.join(tables_dir, name)
        out[name] = spark.read.parquet(path)
    return out


def _block_range(tables: dict, config: dict) -> tuple[int, int]:
    from pyspark.sql import functions as F

    lo, hi = None, None
    for tname, tconf in config["tables"].items():
        col = tconf.get("block_column", "_block_number")
        row = tables[tname].agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        if row["lo"] is None:
            continue
        lo = row["lo"] if lo is None else min(lo, row["lo"])
        hi = row["hi"] if hi is None else max(hi, row["hi"])
    if lo is None:
        raise SystemExit("no rows in any configured table")
    return int(lo), int(hi)


def cmd_extract(args) -> int:
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.extract import run_extraction

    with open(args.config, "r", encoding="utf-8") as fh:
        config = yaml.safe_load(fh)
    owns_session = _no_active_session()
    spark = get_spark("subgraph-extract")
    tables = _load_tables(spark, args.tables_dir, config["tables"])
    if args.earliest is not None and args.latest is not None:
        lo, hi = args.earliest, args.latest
    else:
        lo, hi = _block_range(tables, config)
    written = run_extraction(spark, config, tables, args.output, lo, hi)
    for t, files in written.items():
        print(f"{t}: {len(files)} partition files committed")
    if owns_session:
        spark.stop()
    return 0


def cmd_suggest_config(args) -> int:
    from subgraph_extractor_spark import get_spark
    from subgraph_extractor_spark.config_suggest import (
        interactive_config,
        suggest_config,
    )

    owns_session = _no_active_session()
    spark = get_spark("subgraph-config")
    names = [
        f[: -len(".parquet")]
        for f in sorted(os.listdir(args.tables_dir))
        if f.endswith(".parquet")
    ]
    tables = _load_tables(spark, args.tables_dir, names)
    if getattr(args, "interactive", False):
        # the reference config_generator's menu walk (cli.py:383-487)
        # as a plain prompt loop; accepting every default emits the
        # same YAML as the non-interactive path
        conf = interactive_config(
            args.name, args.version, args.subgraph, tables
        )
    else:
        conf = suggest_config(args.name, args.version, args.subgraph, tables)
    with open(args.output, "w", encoding="utf-8") as fh:
        yaml.safe_dump(conf, fh)
    print(f"wrote {args.output} ({len(names)} tables)")
    if owns_session:
        spark.stop()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="subgraph_extractor_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="run an incremental extraction")
    ex.add_argument("--config", required=True)
    ex.add_argument("--tables-dir", required=True)
    ex.add_argument("--output", required=True)
    ex.add_argument("--earliest", type=int, default=None)
    ex.add_argument("--latest", type=int, default=None)
    ex.set_defaults(fn=cmd_extract)

    sg = sub.add_parser("suggest-config", help="emit a default config")
    sg.add_argument("--tables-dir", required=True)
    sg.add_argument("--name", required=True)
    sg.add_argument("--version", default="0.0.1")
    sg.add_argument("--subgraph", required=True)
    sg.add_argument("--output", required=True)
    sg.add_argument(
        "--interactive",
        action="store_true",
        help="prompt-loop table/column selection with LIMIT-10 previews "
        "(the reference config_generator flow, curses-free)",
    )
    sg.set_defaults(fn=cmd_suggest_config)

    args = parser.parse_args(argv)
    return args.fn(args)


def main_extract(argv=None) -> int:
    """Console-script alias shaped like the reference's
    ``subgraph_extractor`` entry point (reference setup.py:37): straight
    to extraction, no subcommand."""
    return main(["extract", *(argv if argv is not None else sys.argv[1:])])


def main_suggest_config(argv=None) -> int:
    """Console-script alias shaped like the reference's
    ``subgraph_config_generator`` entry point (reference setup.py:38)."""
    return main(
        ["suggest-config", *(argv if argv is not None else sys.argv[1:])]
    )


if __name__ == "__main__":
    sys.exit(main())
