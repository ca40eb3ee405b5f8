"""Interval overlap join — the two-sided generalization of the
point-in-range join (`__spark_entry__.q_j5_range_join`): pairs of
INTERVALS that overlap, optionally within partition keys.

The relational shape behind concurrency analytics (overlapping
shipments per supplier, concurrent sessions per user), conflict
detection (double-booked resources), and time-range dedup.  A naive
formulation is a theta-join (``l.start <= r.end AND r.start <=
l.end``) — Spark plans that as a BroadcastNestedLoopJoin, quadratic
work and the exact anti-pattern this repo's plan-invariant test bans.

Scale shape instead: explode each interval into the fixed-width
time buckets it touches, equi-join on (partition keys, bucket) —
Catalyst plans a plain shuffled hash join — and verify true overlap in
codegen.  A pair overlapping several buckets would duplicate, so
instead of a ``distinct`` barrier the join keeps ONLY the canonical
bucket: the bucket containing ``greatest(l.start, r.start)`` (the
first instant both intervals are live, which both sides' explosions
necessarily cover).  One shuffle, no dedup pass, no BNLJ.

Bucket width is the knob: work is Σ per-bucket occupancy², so pick W
near the median interval length (each interval then touches O(1)
buckets while buckets stay small); degenerate hot buckets are the same
skew problem as every equi-join here (salt or cap as needed).

Reference parity: none (no interval surface in the reference's 531
LoC); relational extension of SURVEY §2.5 J5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucketed(
    df: DataFrame,
    keys: list[str],
    start: str,
    end: str,
    width: int,
    side: str,
) -> DataFrame:
    s, e = F.col(start).cast("long"), F.col(end).cast("long")
    # integer `div`, not floor(double /): double division loses exactness
    # past 2^53 (block-number timelines), and `div` is the same bucketing
    # the canonical-bucket filter uses, which is all correctness needs
    return df.select(
        *keys,
        s.alias(f"{side}_start"),
        e.alias(f"{side}_end"),
        F.explode(
            F.sequence(
                F.expr(f"CAST({start} AS BIGINT) div {width}"),
                F.expr(f"CAST({end} AS BIGINT) div {width}"),
            )
        ).alias("_bkt"),
        *[
            F.col(c).alias(f"{side}_{c}")
            for c in df.columns
            if c not in keys and c not in (start, end)
        ],
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    start: str = "start",
    end: str = "end",
    bucket_width: int = 86_400,
    relation: str = "overlaps",
) -> DataFrame:
    """All (left, right) pairs sharing ``keys`` whose closed intervals
    ``[start, end]`` satisfy ``relation``:

      * ``"overlaps"`` (default) — any shared instant
      * ``"contains"`` — the LEFT interval fully contains the right
        (``l_start <= r_start AND r_end <= l_end``; the Allen
        contains/during pair, for "which maintenance window swallowed
        this outage" style questions)

    Both relations ride the same bucketed plan: contains ⊂ overlaps, so
    the shared-bucket candidate generation stays COMPLETE, the
    canonical-bucket filter (``greatest(l_start, r_start) div W`` —
    under contains that is always r_start's bucket, covered by both
    sides) keeps single emission, and only the verified predicate
    changes.  Boundaries cast to long (epoch seconds, block numbers,
    any integer timeline); intervals with ``end < start`` produce
    nothing.  Non-key/non-boundary columns come along prefixed ``l_``
    / ``r_``."""
    preds = {
        "overlaps": (F.col("l_start") <= F.col("r_end"))
        & (F.col("r_start") <= F.col("l_end")),
        "contains": (F.col("l_start") <= F.col("r_start"))
        & (F.col("r_end") <= F.col("l_end")),
    }
    if relation not in preds:
        raise ValueError(
            f"relation must be one of {sorted(preds)}, got {relation}"
        )
    lb = _bucketed(left, keys, start, end, bucket_width, "l")
    rb = _bucketed(right, keys, start, end, bucket_width, "r")
    canonical = (
        F.expr(f"greatest(l_start, r_start) div {bucket_width}")
        == F.col("_bkt")
    )
    return (
        lb.join(rb, [*keys, "_bkt"])
        .filter(preds[relation] & canonical)
        .drop("_bkt")
    )


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    keys: list[str],
    start: str = "start",
    end: str = "end",
    bucket_width: int = 86_400,
) -> DataFrame:
    """Self-join face: unordered pairs (id_a < id_b) of overlapping
    intervals within ``keys`` — concurrent-activity detection.  Output:
    keys + (id_a, id_b, overlap_len) where ``overlap_len`` is the
    closed-interval overlap length ``min(end) - max(start) + 1``."""
    base = df.select(id_col, *keys, start, end)
    j = interval_overlap_join(
        base, base, keys, start, end, bucket_width
    ).filter(F.col(f"l_{id_col}") < F.col(f"r_{id_col}"))
    return j.select(
        *keys,
        F.col(f"l_{id_col}").alias("id_a"),
        F.col(f"r_{id_col}").alias("id_b"),
        (
            F.least(F.col("l_end"), F.col("r_end"))
            - F.greatest(F.col("l_start"), F.col("r_start"))
            + F.lit(1)
        ).alias("overlap_len"),
    )


def interval_union_length(
    df: DataFrame,
    keys: list[str],
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Total covered length of the UNION of closed intervals per key —
    utilization/coverage analytics (days a supplier had anything in
    flight, seconds a user had any session open).  Overlaps count once;
    the sum-of-lengths naive answer double-counts.

    Classic gaps-and-islands: within each key, order by (start, end),
    an interval starts a new island when its start exceeds the running
    max end of everything before it, islands sum (max end - min start
    + 1).  Two window passes + one aggregate over the SAME key-ordered
    exchange — Catalyst reuses the sort, so it is one shuffle end to
    end.  Keys are the parallelism unit (same contract as every
    windowed operator here): a single key with billions of intervals
    needs a range re-partition, the multi-key corpus case does not.
    Output: keys + (n_intervals, covered_len)."""
    from pyspark.sql import Window

    s, e = F.col(start).cast("long"), F.col(end).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_s").asc(), F.col("_e").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.select(*keys, s.alias("_s"), e.alias("_e")).withColumn(
        "_prev_max_e", F.max("_e").over(w)
    ).withColumn(
        "_new_island",
        F.when(
            F.col("_prev_max_e").isNull()
            | (F.col("_s") > F.col("_prev_max_e")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_s").asc(), F.col("_e").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn(
        "_island", F.sum("_new_island").over(w2)
    )
    return (
        islands.groupBy(*keys, "_island")
        .agg(
            F.min("_s").alias("_is"),
            F.max("_e").alias("_ie"),
            F.count(F.lit(1)).alias("_n"),
        )
        .groupBy(*keys)
        .agg(
            F.sum("_n").alias("n_intervals"),
            F.sum(F.col("_ie") - F.col("_is") + 1).alias("covered_len"),
        )
    )
