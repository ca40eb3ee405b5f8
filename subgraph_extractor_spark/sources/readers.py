"""DataFrame sources.

The reference reads row-oriented Postgres via pandas.read_sql
(reference cli.py:38-52); this engine reads columnar Parquet (the staged
corpus at /root/testdata) plus CSV/JSON, and documents the JDBC path for a
live graph-node database.  All readers return plain DataFrames so Catalyst
can push filters/projections into the scan — verify with
``df.explain("formatted")``: look for PushedFilters / ReadSchema.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def ntz_epoch_micros(col: Column) -> Column:
    """Epoch micros (long) of a TIMESTAMP_NTZ column interpreted as naive
    UTC, independent of spark.sql.session.timeZone.

    A plain ``cast("timestamp")`` interprets the naive value in the
    SESSION zone — on a driver-provided session with a non-UTC zone that
    shifts every fixture instant by the zone offset (skewing watermarks,
    windows and oracle comparisons).  NTZ *arithmetic* is wall-clock and
    therefore zone-free: the interval since the NTZ epoch, cast to
    decimal seconds, is the naive-UTC epoch time on any session."""
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return (
        (col - epoch).cast("decimal(30,6)") * F.lit(1_000_000)
    ).cast("long")


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType (UTC-normalized micros).

    Fixture generations vary: TIMESTAMP(NANOS) parquet (read as epoch-nanos
    LongType under spark.sql.legacy.parquet.nanosAsLong=true) or naive
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ when NTZ inference is on —
    e.g. a driver-provided session configured before our confs applied).
    Both land on TimestampType truncated to micros, exactly what DuckDB's
    CAST(ts AS TIMESTAMP) yields, so oracle comparisons align and
    event-time watermarks (which reject NTZ) work.  Both conversions are
    session-timezone-independent (the fixtures are naive UTC; a non-UTC
    driver session must not shift them)."""
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    elif isinstance(ts_type, T.TimestampNTZType):
        df = df.withColumn(
            "ts", F.timestamp_micros(ntz_epoch_micros(F.col("ts")))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (schema normalized)."""
    if name == "events":
        # per-key tolerance: one non-settable conf must not block the
        # other (matching session.configure)
        for k, v in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def range_scan(
    df: DataFrame,
    block_column: str,
    start: int,
    end: int,
    drop: tuple[str, ...] = (),
    block_alias: str = "_block_number",
) -> DataFrame:
    """The reference's core scan (S1, cli.py:24-53): select rows whose
    version-start block falls in the half-open range [start, end), derive
    ``_block_number`` from the interval lower bound, drop bookkeeping
    columns (vid, block_range — cli.py:53).

    Spark-first: the filter is a Catalyst predicate, so on Parquet it
    becomes a PushedFilter + row-group min/max skip; on JDBC it becomes a
    WHERE pushdown — same physical behaviour the reference hand-rolled in
    SQL, but parallel across executors.
    """
    c = F.col(block_column)
    out = df.filter((c >= F.lit(start)) & (c < F.lit(end)))
    if block_alias != block_column:
        out = out.withColumn(block_alias, c)
    return out.drop(*[d for d in drop if d != block_alias])


def read_csv(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    opts = {"header": "true", "inferSchema": "false" if schema else "true"}
    opts.update(options)
    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    """ORC scan — Spark's built-in columnar alternative to Parquet
    (schema embedded, predicate pushdown and column pruning work the
    same as the parquet path; asserted in tests/test_sources.py).
    DuckDB has no ORC reader, so ORC-sourced queries are certified by
    round-trip + plan tests rather than a driver oracle row."""
    return spark.read.options(**options).orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options):
    """ORC sink, partitioning options as for the parquet writer."""
    df.write.options(**options).mode(mode).orc(path)


def jdbc_numeric_as_text(
    table: str, columns: list[str], numeric_columns: list[str]
) -> str:
    """Pushdown subquery for lossless uint256 ingestion (SURVEY §4.1):
    Postgres ``numeric`` holding uint256 exceeds Spark's JDBC decimal
    mapping, so unbounded-numeric columns are projected ``::text`` at the
    source (mirroring the reference's text-mode read, cli.py:38-52 with
    coerce_float=False) and decoded Spark-side with
    ``functions.uint256.decimal_str_to_uint256_be``.

    ``columns`` comes from catalog introspection (catalog.column_info) —
    JDBC needs the explicit list because the subquery replaces ``table``.
    """
    sel = ", ".join(
        f"{c}::text AS {c}" if c in set(numeric_columns) else c
        for c in columns
    )
    alias = table.replace(".", "_").replace('"', "")
    return f"(SELECT {sel} FROM {table}) AS numeric_safe_{alias}"


def jdbc_scan_options(
    url: str,
    table: str,
    block_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
    **options,
) -> dict[str, str]:
    """The option set for a range-partitioned JDBC scan — pure and
    unit-testable (the live .load() is a thin wrapper below).

    partitionColumn/lowerBound/upperBound/numPartitions make Spark issue
    ``num_partitions`` disjoint WHERE-bounded queries in parallel — the
    distributed version of the reference's sequential per-partition query
    loop (cli.py:296-326).  With ``numeric_columns`` set, ``dbtable``
    becomes the numeric-as-text pushdown subquery.
    """
    if numeric_columns and not columns:
        raise ValueError(
            "numeric_columns requires the explicit column list "
            "(from catalog.column_info) to build the pushdown query"
        )
    dbtable = (
        jdbc_numeric_as_text(table, columns, numeric_columns)
        if numeric_columns
        else table
    )
    out = {
        "url": url,
        "dbtable": dbtable,
        "partitionColumn": block_column,
        "lowerBound": str(int(lower)),
        "upperBound": str(int(upper)),
        "numPartitions": str(int(num_partitions)),
        # graph-node block numbers are integers; disable fetch conversion
        # surprises and keep server-side cursors streaming
        "fetchsize": options.pop("fetchsize", "10000"),
    }
    out.update({k: str(v) for k, v in options.items()})
    return out


def decode_jdbc_numerics(df: DataFrame, numeric_columns: list[str]) -> DataFrame:
    """Decode ::text-projected unbounded numerics to the 32-byte-BE
    carrier (the same column names, as in the reference's export)."""
    from subgraph_extractor_spark.functions.uint256 import (
        decimal_str_to_uint256_be,
    )

    return df.withColumns(
        {c: decimal_str_to_uint256_be(F.col(c)) for c in numeric_columns}
    )


def read_jdbc_range_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    block_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    columns: list[str] | None = None,
    numeric_columns: list[str] | None = None,
    **options,
) -> DataFrame:
    """Range-partitioned JDBC scan of a live graph-node Postgres; see
    jdbc_scan_options for the contract (option construction and the
    lossless numeric-as-text route are unit-tested; the live connection
    needs a JDBC driver jar on the cluster classpath)."""
    opts = jdbc_scan_options(
        url,
        table,
        block_column,
        lower,
        upper,
        num_partitions,
        columns,
        numeric_columns,
        **options,
    )
    df = spark.read.format("jdbc").options(**opts).load()
    if numeric_columns:
        df = decode_jdbc_numerics(df, numeric_columns)
    return df
