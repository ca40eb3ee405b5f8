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

from pyspark.sql import DataFrame, SparkSession
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


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet; with
    spark.sql.legacy.parquet.nanosAsLong=true it arrives as epoch-nanos
    LongType.  Truncate to microseconds (exactly what DuckDB's
    CAST(ts AS TIMESTAMP) does) so oracle comparisons align."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (schema normalized)."""
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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


def read_jdbc_range_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    block_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 32,
    **options,
) -> DataFrame:
    """JDBC scan of a live graph-node Postgres, range-partitioned on the
    block column so executors read disjoint slices in parallel — the
    distributed version of the reference's sequential per-partition query
    loop (cli.py:296-326).

    Precision caveat (SURVEY §4.1): Postgres ``numeric`` holding uint256
    exceeds Spark's Decimal(38); for lossless ingestion project such
    columns as text in a pushdown query and decode with
    functions.uint256.decimal_str_to_uint256_be.  Untested here (no
    Postgres in the test environment) — kept thin and documented.
    """
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", block_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .options(**options)
        .load()
    )
