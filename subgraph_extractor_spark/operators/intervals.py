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
) -> DataFrame:
    """All (left, right) pairs sharing ``keys`` whose closed intervals
    ``[start, end]`` overlap.  Boundaries cast to long (epoch seconds,
    block numbers, any integer timeline); intervals with ``end <
    start`` produce nothing.  Non-key/non-boundary columns come along
    prefixed ``l_`` / ``r_``."""
    lb = _bucketed(left, keys, start, end, bucket_width, "l")
    rb = _bucketed(right, keys, start, end, bucket_width, "r")
    overlap = (F.col("l_start") <= F.col("r_end")) & (
        F.col("r_start") <= F.col("l_end")
    )
    canonical = (
        F.expr(f"greatest(l_start, r_start) div {bucket_width}")
        == F.col("_bkt")
    )
    return lb.join(rb, [*keys, "_bkt"]).filter(overlap & canonical).drop(
        "_bkt"
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
