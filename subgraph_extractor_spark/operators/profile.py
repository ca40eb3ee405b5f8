"""Table profiling: per-column statistics in one pass over the data.

The reference exposes column-type introspection (SURVEY §2 S3:
``get_column_info``); this is the data-side counterpart a pipeline
actually runs before ingesting a new corpus — row/null/distinct counts
and min/max per column, emitted as one tidy row per column.

One full scan, regardless of column count: all per-column aggregates
live in a single ``agg`` (Catalyst plans the multi-distinct via one
Expand — data is read once, multiplied |distinct-cols| times in the
map stage).  At 100 TB use ``exact_distinct=False``: HLL
``approx_count_distinct`` replaces the Expand entirely — one plain
partial+final aggregation, the mode a profiling pass over a petabyte
corpus actually runs.  Exact mode exists because it makes the operator
bit-checkable against a SQL oracle (and is fine up to ~10 columns of
moderate cardinality).

min/max are emitted in TYPED columns (``min_num``/``max_num`` for
numeric columns, ``min_str``/``max_str`` for strings) rather than cast
to one string column: engines disagree on float→string rendering
(1e20 vs 1.0E20), and a profile that silently reformats values is a
profile you can't diff across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str).  String min/max use binary collation (both
    Spark and DuckDB defaults).  min/max are emitted ONLY for numeric
    and string columns; every other type (date, timestamp, boolean,
    array, struct, map, binary) profiles counts with NULL min/max —
    a NULL there means "type not min/max-profiled", not "all null"
    (read n_nulls for that)."""
    cols = columns if columns is not None else df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    n_distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs, pieces = [], []
    for i, c in enumerate(cols):
        dt = schema[c]
        aggs.append(F.count(F.lit(1)).alias(f"_n_{i}"))
        aggs.append(F.count(c).alias(f"_nn_{i}"))
        aggs.append(n_distinct(c).alias(f"_nd_{i}"))
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        if is_num or is_str:
            aggs.append(F.min(c).alias(f"_min_{i}"))
            aggs.append(F.max(c).alias(f"_max_{i}"))
        pieces.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"_n_{i}").alias("n_rows"),
                (F.col(f"_n_{i}") - F.col(f"_nn_{i}")).alias("n_nulls"),
                F.col(f"_nd_{i}").alias("n_distinct"),
                (
                    F.col(f"_min_{i}").cast("double")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_max_{i}").cast("double")
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("max_num"),
                (
                    F.col(f"_min_{i}")
                    if is_str
                    else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"_max_{i}")
                    if is_str
                    else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return (
        df.agg(*aggs)
        .select(F.explode(F.array(*pieces)).alias("_p"))
        .select("_p.*")
    )
