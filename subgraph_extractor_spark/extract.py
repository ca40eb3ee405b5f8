"""End-to-end incremental extraction pipeline (Spark-first redesign).

Reference lifecycle (cli.py:275-339; SURVEY §3): config gate → watermark
read → hierarchical partition plan → per-partition Postgres scan → column
mapping/typing → one Parquet file per partition in hive-style dirs →
consolidated ``_metadata`` manifest → watermark commit.  The reference
executes this as a sequential single-threaded loop, one SQL query + one
pandas materialization + one file per partition (cli.py:296-326).

Spark-first redesign — same observable layout and commit semantics, but the
data path is ONE distributed job per table instead of a driver loop:

1.  Each row is assigned its (partition_size, start_partition,
    end_partition) with pure Catalyst arithmetic: the delta cover is
    summarized into a handful of contiguous same-size segments, so the
    assignment is an O(#segments) CASE over ``floor(block / size) * size``
    — whole-stage codegen, no UDF, no per-partition query.
2.  Rows outside the delta (already-exported or incomplete-tail blocks)
    are filtered out by the same segment predicate — on Parquet sources
    this prunes at row-group min/max level.
3.  One shuffle repartitions by the partition tuple (so each planned
    partition becomes exactly one output file), rows sorted by block
    within partitions (files are block-sorted like the reference's ORDER BY,
    cli.py:44), then a single ``partitionBy(...).parquet`` write with
    dynamic partition overwrite → idempotent re-writes for crash recovery.
4.  Planned partitions that received zero rows still get an (empty, typed)
    Parquet file — the reference writes them too and the manifest needs the
    complete cover (SURVEY §4.2).
5.  Commit ordering preserved: data files → per-table ``_metadata``
    manifest → dataset watermark (cli.py:312-339; crash-recovery contract
    tested in the reference at tests/test_get_column_info.py:181-225).

At 100 TB this means: full scan parallelism, one shuffle keyed by the
partition tuple (naturally balanced — partitions are fixed block ranges),
and no driver-side data movement at all.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass

import pandas as pd  # module-level: applyInPandas type hints resolve here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from subgraph_extractor_spark import fsio
from subgraph_extractor_spark.functions.mappings import (
    compile_column_mappings,
    enforce_assertions,
)
from subgraph_extractor_spark.plans.config_gate import ensure_config_unchanged
from subgraph_extractor_spark.plans.manifest import write_consolidated_metadata
from subgraph_extractor_spark.plans.partitions import (
    Partition,
    get_partitions,
    plan_delta,
)
from subgraph_extractor_spark.plans.watermark import read_watermark, write_watermark

PARTITION_COLS = ["partition_size", "start_partition", "end_partition"]
BLOCK_COLUMN = "_block_number"


@dataclass(frozen=True)
class Segment:
    """A maximal run of contiguous, same-size partitions in a cover."""

    size: int
    lo: int
    hi: int


def segments_of(cover: list[Partition]) -> list[Segment]:
    """Merge a partition set into contiguous same-size segments; this is
    what keeps the row→partition assignment O(#segments), independent of
    the number of partitions."""
    out: list[Segment] = []
    for p in sorted(cover):
        if out and out[-1].size == p.size and out[-1].hi == p.start:
            out[-1] = Segment(p.size, out[-1].lo, p.end)
        else:
            out.append(Segment(p.size, p.start, p.end))
    return out


def assign_partitions(
    df: DataFrame, block_col: str, delta: list[Partition]
) -> DataFrame:
    """Tag each row with its delta partition tuple and drop rows outside
    the delta.  Pure Catalyst: CASE over contiguous segments +
    floor-alignment arithmetic."""
    segs = segments_of(delta)
    if not segs:
        return df.limit(0).withColumns(
            {c: F.lit(None).cast("long") for c in PARTITION_COLS}
        )
    b = F.col(block_col)
    size_expr = F.lit(None).cast("long")
    # Build reversed so the first segment ends up as the outermost WHEN.
    for s in reversed(segs):
        size_expr = (
            F.when((b >= F.lit(s.lo)) & (b < F.lit(s.hi)), F.lit(s.size))
            .otherwise(size_expr)
        )
    df = df.withColumn("partition_size", size_expr).filter(
        F.col("partition_size").isNotNull()
    )
    start = (F.floor(b / F.col("partition_size")) * F.col("partition_size")).cast(
        "long"
    )
    return df.withColumn("start_partition", start).withColumn(
        "end_partition", (start + F.col("partition_size")).cast("long")
    )


def partition_dir(table_dir: str, p: Partition) -> str:
    return fsio.join(
        table_dir,
        f"partition_size={p.size}",
        f"start_partition={p.start}",
        f"end_partition={p.end}",
    )


def _list_partition_files(table_dir: str, p: Partition) -> list[str]:
    """Data files of one partition dir, as paths in table_dir's scheme."""
    d = partition_dir(table_dir, p)
    fs, local = fsio.resolve(d)
    return [
        fsio.join(d, f)
        for f in fsio.listdir(fs, local)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    ]


def _write_empty_partition(empty_table, d: str) -> str:
    import pyarrow.parquet as pq

    fs, local = fsio.resolve(d)
    fsio.makedirs(fs, local)
    path = posixpath.join(local, "part-empty.parquet")
    pq.write_table(empty_table, path, filesystem=fs)
    return path


# --------------------------------------------------------------------------
# arrow sink — reference-exact export schema, any fsio destination
# --------------------------------------------------------------------------

_PA_UINTS = {"uint8", "uint16", "uint32", "uint64"}


def target_arrow_schema(
    df: DataFrame,
    block_column: str = BLOCK_COLUMN,
    uint_columns: dict[str, str] | None = None,
):
    """The export schema the reference writes (cli.py:20-21, 147-155):
    Spark has no unsigned types, so mapped uintN columns widen in-flight
    and narrow back to pyarrow uintN at the sink; the block column is
    always uint32 (cli.py:111)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    base = to_arrow_schema(df.schema)
    uint_map = {
        "uint8": pa.uint8(),
        "uint16": pa.uint16(),
        "uint32": pa.uint32(),
        "uint64": pa.uint64(),
    }
    overrides = dict(uint_columns or {})
    overrides.setdefault(block_column, "uint32")
    fields = []
    for f in base:
        if f.name in overrides:
            fields.append(pa.field(f.name, uint_map[overrides[f.name]]))
        else:
            fields.append(f)
    return pa.schema(fields)


def write_partition_files_arrow(
    tagged: DataFrame,
    table_dir: str,
    target_schema,
    block_column: str = BLOCK_COLUMN,
) -> list[tuple[int, int, int, int]]:
    """Distributed reference-fidelity sink: one pyarrow Parquet file per
    planned partition, written ON EXECUTORS via applyInPandas, block-sorted
    within the file (reference ORDER BY, cli.py:44), with the exact target
    schema (uint32 block column — Spark's own writer cannot emit unsigned
    Parquet types).  Destination is anything fsio resolves (local, s3://,
    s3a://, gs://, mock://) — executors open the filesystem themselves, so
    nothing funnels through the driver.

    One shuffle keyed by the partition tuple (same as the Spark-native
    sink); the returned action result is one row per written partition:
    (partition_size, start_partition, end_partition, n_rows).
    """
    schema_bytes = target_schema.serialize().to_pybytes()
    data_cols = [f.name for f in target_schema]
    # The mock:// test scheme resolves via this env var; long-lived Python
    # workers may predate the test's env, so it rides in the closure.
    import os as _os

    mock_root = _os.environ.get("SPARK_GRAFT_MOCK_FS_ROOT")

    def write_group(key, pdf):  # no hints: (key, pdf) eval type is explicit
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        if mock_root:
            os.environ["SPARK_GRAFT_MOCK_FS_ROOT"] = mock_root

        tgt = pa.ipc.read_schema(pa.BufferReader(schema_bytes))
        size, start, end = (int(key[0]), int(key[1]), int(key[2]))
        pdf = pdf.sort_values(block_column, kind="mergesort")
        tbl = pa.Table.from_pandas(
            pdf[data_cols], schema=tgt, preserve_index=False
        )
        fs, base = fsio.resolve(table_dir)
        d = posixpath.join(
            base,
            f"partition_size={size}",
            f"start_partition={start}",
            f"end_partition={end}",
        )
        fsio.makedirs(fs, d)
        pq.write_table(tbl, posixpath.join(d, "part-00000.parquet"), filesystem=fs)
        return pd.DataFrame(
            {
                "partition_size": [size],
                "start_partition": [start],
                "end_partition": [end],
                "n_rows": [len(pdf)],
            }
        )

    written = tagged.groupBy(*PARTITION_COLS).applyInPandas(
        write_group,
        schema=(
            "partition_size long, start_partition long, "
            "end_partition long, n_rows long"
        ),
    )
    return [
        (r["partition_size"], r["start_partition"], r["end_partition"], r["n_rows"])
        for r in written.collect()  # 1 row per partition: plan metadata
    ]


def extract_table(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    delta: list[Partition],
    cover: list[Partition],
    block_column: str = BLOCK_COLUMN,
    sort_within: bool = True,
    sink: str = "spark",
    arrow_schema=None,
) -> list[str]:
    """Write all delta partitions of one table in one distributed job,
    top up empty partitions, and commit the manifest over the full cover.
    Returns the manifest's file list.

    ``sink="spark"`` uses Spark's native parquet writer (fastest; signed
    Parquet types; destination must be a Hadoop-visible URI).
    ``sink="arrow"`` uses the distributed pyarrow sink — reference-exact
    export schema (uint32 block column, cli.py:20-21,147) and any
    fsio-resolvable destination.
    """
    if delta:
        tagged = assign_partitions(df, block_column, delta)
        if sink == "arrow":
            if arrow_schema is None:
                arrow_schema = target_arrow_schema(df, block_column)
            write_partition_files_arrow(
                tagged, table_dir, arrow_schema, block_column
            )
            missing = [
                p for p in delta if not _list_partition_files(table_dir, p)
            ]
            for p in missing:
                _write_empty_partition(
                    arrow_schema.empty_table(), partition_dir(table_dir, p)
                )
        else:
            writer = tagged.repartition(*[F.col(c) for c in PARTITION_COLS])
            if sort_within:
                writer = writer.sortWithinPartitions(
                    *PARTITION_COLS, block_column
                )
            # Per-write option, NOT a session conf: mutating the shared
            # session's partitionOverwriteMode would silently change later
            # callers' overwrite-writes.
            (
                writer.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*PARTITION_COLS)
                .parquet(table_dir)
            )
            # Empty planned partitions still need typed placeholder files.
            missing = [
                p for p in delta if not _list_partition_files(table_dir, p)
            ]
            if missing:
                empty = (
                    assign_partitions(df, block_column, delta)
                    .drop(*PARTITION_COLS)
                    .limit(0)
                    .toArrow()
                )
                for p in missing:
                    _write_empty_partition(empty, partition_dir(table_dir, p))

    # Every cover partition MUST have files on disk (delta partitions were
    # just written — empties included; the rest were committed by earlier
    # runs).  A hole means lost/deleted data: omitting it from the manifest
    # would silently shrink the committed snapshot, so fail loudly instead.
    files: list[str] = []
    for p in cover:
        pf = _list_partition_files(table_dir, p)
        if not pf:
            raise RuntimeError(
                f"cover partition {p.as_tuple()} of {table_dir} has no data "
                "files on disk; refusing to commit a manifest with holes "
                "(was the dataset directory modified outside the pipeline?)"
            )
        files.extend(pf)
    if files:
        write_consolidated_metadata(table_dir, files)
    return files


def run_extraction(
    spark: SparkSession,
    config: dict,
    tables: dict[str, DataFrame],
    output_dir: str,
    earliest_block: int,
    latest_block: int,
    sink: str = "spark",
) -> dict[str, list[str]]:
    """The library entry point, mirroring the reference's ``extract()``
    (cli.py:275-339): pure function of (config, sources, output), with
    re-entrant incremental semantics.

    ``config`` shape (reference tests/test_get_column_info.py:16-25 +
    README.md:46-97)::

        name: str, version: str, subgraph: str
        tables:
          <name>:
            partition_sizes: [524288, 32768, 1024]
            block_column: _block_number        # optional, ours
            numeric_columns: [...]             # uint256-carrier columns
            column_mappings: {src: {dest: {type, downscale?, max_value?,
                                           default?, validity_column?}}}
            drop_columns: [vid, block_range]   # optional
    """
    dataset_dir = fsio.join(output_dir, config["name"], config["version"])
    ensure_config_unchanged(dataset_dir, config)

    previous = read_watermark(dataset_dir)
    prev_latest = previous.get("latest_block")
    # Plan the already-extracted cover from the STORED watermark's earliest
    # (reference cli.py:302-304) — if earliest shifted between runs, planning
    # from the current earliest would mark never-written partitions as done.
    prev_earliest = previous.get("earliest_block")

    written: dict[str, list[str]] = {}
    for table_name, tconf in config["tables"].items():
        sizes = tconf["partition_sizes"]
        block_col = tconf.get("block_column", BLOCK_COLUMN)
        df = tables[table_name]

        compiled = compile_column_mappings(
            tconf.get("column_mappings"), tconf.get("numeric_columns", ())
        )
        enforce_assertions(df, compiled)
        out_df = compiled.apply(df).drop(*tconf.get("drop_columns", ()))

        cover = get_partitions(earliest_block, latest_block, sizes)
        prev_cover = (
            get_partitions(
                prev_earliest if prev_earliest is not None else earliest_block,
                prev_latest,
                sizes,
            )
            if prev_latest is not None
            else None
        )
        delta = plan_delta(prev_cover, cover)

        table_dir = fsio.join(
            dataset_dir,
            "data",
            f"subgraph={config['subgraph']}",
            f"table={table_name}",
        )
        arrow_schema = (
            target_arrow_schema(out_df, block_col, compiled.arrow_types)
            if sink == "arrow"
            else None
        )
        written[table_name] = extract_table(
            spark,
            out_df,
            table_dir,
            delta,
            cover,
            block_column=block_col,
            sink=sink,
            arrow_schema=arrow_schema,
        )

    # Watermark LAST — the run-level commit point (cli.py:329-339).
    write_watermark(dataset_dir, earliest_block, latest_block)
    return written
