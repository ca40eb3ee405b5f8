"""Mergeable-sketch operators: incremental distinct counting over a
continually-ingested corpus via Apache DataSketches HLL (the
`hll_sketch_agg` / `hll_union_agg` surface Spark 4 exposes natively).

The 100 TB pattern this enables: distinct-count state is a PER-GROUP
BINARY SKETCH table (kilobytes per group), maintained incrementally —
each new batch is sketched alone (touching only the new data) and
union-merged into the standing sketch table.  Answering "distinct users
per event type over all time" then reads the sketch table, never the
history.  Contrast with `approx_count_distinct`, which answers one query
but keeps no mergeable state, and with exact distinct, which reshuffles
the full history on every refresh.

All heavy lifting is JVM-side Datasketches (no Python in the path); the
estimate error model is the HLL standard error for the chosen lgConfigK
(default 12 -> ~1.6% RSE; the contracts below bound at 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` values — the unit
    of incremental state.  One shuffle on the group key; sketch size is
    O(2^lg_config_k) bytes per group regardless of input volume."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(
            "_sketch"
        )
    )


def merge_sketch_tables(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-merge any number of per-group sketch tables (stacked with
    unionByName) back to one sketch per group.  This is the incremental
    refresh: old-state ∪ new-batch sketches, shuffling only sketch rows
    (kilobytes per group), never the underlying history."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("_sketch")).alias("_sketch")
    )


def estimate_distinct(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Read the sketch table: per-group approximate distinct count."""
    return sketches.select(
        *group_cols,
        F.hll_sketch_estimate(F.col("_sketch")).alias("n_distinct_est"),
    )
