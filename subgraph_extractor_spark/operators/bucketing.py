"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant join cost is the shuffle.  Writing both sides of a
recurring join bucketed BY THE JOIN KEY (``bucketBy(n, key).sortBy(key)``)
lets Spark plan a SortMergeJoin with NO Exchange on either side: each
bucket pair joins locally.  This module wraps the write/read pattern and
is proven by a plan assertion in tests (no Exchange under the join).

Bucketed tables require the session catalog (saveAsTable) — works with
the local Derby metastore + spark-warehouse dir out of the box.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed, bucket-sorted managed table.
    Drops any previous table AND its orphaned warehouse directory (a
    crashed session can leave the location without catalog metadata).

    The input is repartitioned on the bucket key first — without it,
    EVERY input task writes up to ``num_buckets`` files (tasks x buckets
    open writers and output files: at cluster scale that is a
    small-files explosion and a memory hazard).  Repartitioned, each
    task holds exactly one bucket's rows and writes exactly one file."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).replace("file:", "")
    shutil.rmtree(os.path.join(warehouse, table_name.lower()), ignore_errors=True)
    (
        df.repartition(num_buckets, bucket_col)
        .write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket counts Spark elides both shuffles (verify: no Exchange in the
    plan below the SortMergeJoin).  The merge hint keeps the planner from
    choosing a broadcast join (whose BroadcastExchange would mask the
    co-location) on small inputs — at the scale bucketing targets, SMJ is
    what the planner picks anyway."""
    left = spark.table(left_table).hint("merge")
    return left.join(spark.table(right_table), on=on, how=how)
