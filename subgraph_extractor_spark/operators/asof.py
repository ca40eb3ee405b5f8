"""As-of joins and range (interval/point) joins.

The reference's data model is interval-shaped — every entity version
carries a ``block_range`` validity interval (SURVEY §2.3: "state as of
block B" is a contains-point query the reference never runs because it
drops the upper bound; the fixture keeps both bounds so the engine exposes
it).  Spark has no native as-of/range join, so these are compositions of
built-in operators chosen for their scale shape:

- ``asof_join``  — union + watermark-window: tag both sides, sort by
  (key, time), and carry the last right-side value forward with
  ``last(..., ignorenulls=True)``.  One shuffle on the key, one
  in-partition sort — the classic scalable as-of plan (no per-row probes,
  no cross product).
- ``range_join`` — bucketed interval join: intervals are exploded to the
  fixed-width buckets they overlap, points are bucketed by arithmetic,
  and the join becomes an equi-join on the bucket plus a residual
  predicate.  This turns what Spark would otherwise plan as a
  BroadcastNestedLoopJoin into a shuffle/broadcast HASH join — the
  difference between O(n*m) and O(n + m + output) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time (direction='backward'; 'forward' gives the
    earliest right row with right_time >= left_time; 'nearest' the row
    with the smallest absolute time distance, ties to the backward side)
    sharing ``key`` — the full pandas ``merge_asof`` direction set.

    Implementation (union trick): right rows become markers carrying their
    values; a window ordered by (time, side) lets ``last(ignorenulls)``
    propagate the prevailing marker onto each left row.  Equal timestamps
    match (<=): markers sort before left rows at the same time.
    'nearest' runs both directional windows over the SAME unioned input
    (one shuffle — the second window reuses the hash partitioning; the
    two sorts differ only in the side tie-break) and picks per row by
    comparing the two distances.
    """
    lt, rt = F.col(left_time), F.col(right_time)
    marked_right = right.select(
        F.col(key).alias("_k"),
        rt.alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    marked_left = left.select(
        "*",
        F.col(key).alias("_k"),
        lt.alias("_t"),
        F.lit(1).alias("_side"),
        *[F.lit(None).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = marked_left.unionByName(marked_right, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = {c: F.last(f"_v_{c}", ignorenulls=True).over(w) for c in value_cols}
    elif direction == "forward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = {c: F.first(f"_v_{c}", ignorenulls=True).over(w) for c in value_cols}
    elif direction == "nearest":
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        marker_t = F.when(F.col("_side") == 0, F.col("_t"))
        bt = F.last(marker_t, ignorenulls=True).over(wb)
        ft = F.first(marker_t, ignorenulls=True).over(wf)
        use_backward = ft.isNull() | (
            bt.isNotNull() & ((F.col("_t") - bt) <= (ft - F.col("_t")))
        )
        picked = {
            c: F.when(
                use_backward, F.last(f"_v_{c}", ignorenulls=True).over(wb)
            ).otherwise(F.first(f"_v_{c}", ignorenulls=True).over(wf))
            for c in value_cols
        }
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )

    out = unioned.withColumns(picked).filter(F.col("_side") == 1)
    return out.select(
        *[c for c in left.columns],
        *[F.col(c).alias(c) for c in value_cols],
    ).drop("_k", "_t", "_side", *[f"_v_{c}" for c in value_cols])


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    lo <= point < hi, via fixed-width bucketing.

    ``bucket_width`` should be on the order of the typical interval length:
    each interval lands in (len/width + 1) buckets, each point in exactly
    one, and the equi-join on bucket carries the real work.  The residual
    range predicate filters bucket-mates that don't actually overlap.
    """
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long"),
                # hi is exclusive: last contained point is hi-1
                F.floor((F.col(hi_col) - 1) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on="_bucket", how=how).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")


def state_as_of_block(
    versions: DataFrame,
    block: int,
    entity_col: str = "id",
    lo_col: str = "block_range_start",
    hi_col: str = "block_range_end",
) -> DataFrame:
    """The reference-latent query (SURVEY §2.3): current state of every
    entity as of a block — versions whose validity interval contains the
    block; NULL upper bound = still live."""
    b = F.lit(block)
    return versions.filter(
        (F.col(lo_col) <= b) & (F.col(hi_col).isNull() | (F.col(hi_col) > b))
    )
