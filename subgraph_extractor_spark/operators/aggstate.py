"""Exact mergeable aggregate state — incremental view maintenance.

The sibling sketch tables (`operators/sketches.py`, `bloom.py`,
`freq.py`) keep *approximate* mergeable state.  This module is the
exact counterpart for the algebraic aggregates, the standing rollup a
continuously-ingested warehouse actually serves from:

    state(batch)                       one groupBy over the NEW data only
    merge(state_a, state_b)            one groupBy over two small state
                                       tables — history is NEVER rescanned
    finalize(state)                    pure projection (no shuffle)

Every supported aggregate is algebraic (Gray et al., "Data Cube",
ICDE'96): COUNT and SUM add, MIN/MAX take extrema, AVG finalizes from
(sum, count).  SUMs are carried in DECIMAL(38,6), so merge order can
never change a bit — the merged rollup is bit-identical to a
single-pass groupBy over the union, which is exactly the contract the
driver query certifies.

At 100 TB: the state table is |groups| rows regardless of history
length; refresh cost is O(new batch) + O(|groups|).  Store the state
bucketed by the group key (operators/bucketing.py) and the merge
groupBy needs no exchange on the standing side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STATE_DECIMAL = "decimal(38,6)"


def aggregate_state(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Per-group algebraic state over ``value_col``:
    (groups..., st_count, st_sum, st_min, st_max).  One shuffle on the
    group key; partial aggregation runs map-side as usual."""
    bad = [c for c in [*group_cols, value_col] if c.startswith("st_")]
    if bad:
        raise ValueError(
            f"column names {bad} collide with the st_* state namespace"
        )
    v = F.col(value_col).cast(_STATE_DECIMAL)
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("st_count"),
        F.sum(v).alias("st_sum"),
        F.min(v).alias("st_min"),
        F.max(v).alias("st_max"),
    )


def merge_aggregate_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two state tables into one.  Groups present in only one side
    pass through; COUNT/SUM add, MIN/MAX take extrema.  Input column
    sets must match (both came from ``aggregate_state``)."""
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"state column mismatch: {sorted(a.columns)} vs "
            f"{sorted(b.columns)}"
        )
    group_cols = [c for c in a.columns if not c.startswith("st_")]
    return (
        a.unionByName(b)
        .groupBy(*group_cols)
        .agg(
            F.sum("st_count").alias("st_count"),
            F.sum("st_sum").alias("st_sum"),
            F.min("st_min").alias("st_min"),
            F.max("st_max").alias("st_max"),
        )
    )


def finalize_aggregates(state: DataFrame) -> DataFrame:
    """Serve the rollup from state: count/sum/min/max/avg.  Pure
    projection — no shuffle, no history.  avg is the one double: a
    single division of the exact decimal sum by the exact count."""
    group_cols = [c for c in state.columns if not c.startswith("st_")]
    return state.select(
        *group_cols,
        F.col("st_count").alias("n"),
        F.col("st_sum").cast("double").alias("sum_v"),
        F.col("st_min").cast("double").alias("min_v"),
        F.col("st_max").cast("double").alias("max_v"),
        (
            F.col("st_sum").cast("double")
            / F.col("st_count").cast("double")
        ).alias("avg_v"),
    )
