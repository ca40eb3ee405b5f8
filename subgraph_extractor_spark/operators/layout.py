"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB, scan cost is dominated by how much data the engine can SKIP:
parquet row-group / file min-max statistics prune a scan only when the
file layout clusters the filtered columns.  Sorting by one column gives
perfect pruning on that column and none on the others; interleaving the
bits of several columns (the Z-order / Morton curve, the standard
lakehouse `OPTIMIZE ZORDER BY` technique) gives good pruning on ALL of
them simultaneously: a range predicate on any participating column maps
to a bounded set of Z-curve segments, so most files fall wholly outside
the predicate's min-max envelope.

Everything here is pure codegen integer arithmetic (shifts, masks, ors)
— no UDFs, exactly mirrorable in ANSI SQL for the differential oracle —
and the layout write is one `repartitionByRange` (range-partitioner
sampling, one shuffle) + in-partition sort, the same cost shape as any
global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bit_interleave(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` of each column round-robin
    (col0 bit0 -> out bit0, col1 bit0 -> out bit1, ...).  Sum of
    shift/mask terms — constant-folded into one codegen expression."""
    n = len(cols)
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return out


def zorder_key(df_cols: list[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key over already-normalized non-negative integer
    columns: each input is clamped into [0, 2^bits) by masking its low
    ``bits``, then bit-interleaved.  ``bits`` x len(cols) must stay
    within a signed 64-bit key (<= 62 total bits).

    Inputs should be rank- or range-normalized first (e.g. value scaled
    into 16-bit space) — Z-order clusters by the bit prefixes, so the
    normalization choice decides the clustering resolution.
    """
    n = len(df_cols)
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols exceeds a 63-bit key")
    mask = (1 << bits) - 1
    normalized = [
        c.cast("bigint").bitwiseAND(F.lit(mask)) for c in df_cols
    ]
    return _bit_interleave(normalized, bits)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for multi-column data skipping: compute the Z-key,
    range-partition on it (contiguous curve segments per output file),
    and sort within partitions so row groups inside each file are tight
    too.  Write the result with any sink; every output file then covers
    a small min-max envelope in EVERY participating column.

    One shuffle (range partitioner with reservoir-sampled bounds — the
    same mechanism as a global sort, skew-proof because bounds come from
    the sampled key distribution, not fixed ranges).
    """
    # Range-normalize every column into the full 2^bits key space first:
    # interleaving RAW values wastes the high bit positions of any column
    # whose domain is smaller than the others' (those bits are constant
    # zero), collapsing the curve back into a single-column sort.  The
    # min/max scalars are a one-row driver artifact (like a range
    # partitioner's sampled bounds), not a data collect.
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_mn"), F.max(c).alias(f"{c}_mx")]
    stats = df.agg(*aggs).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = stats[f"{c}_mn"], stats[f"{c}_mx"]
        if mx is None or mn is None or mx == mn:
            scaled.append(F.lit(0).cast("bigint"))
        else:
            scaled.append(
                F.floor(
                    (F.col(c) - F.lit(mn)).cast("double")
                    / F.lit(float(mx - mn))
                    * F.lit(float(top))
                ).cast("bigint")
            )
    keyed = df.withColumn("_zkey", zorder_key(scaled, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
    )


def minmax_pruning_stats(
    df: DataFrame, layout_col: str, probe_cols: list[str]
) -> DataFrame:
    """Per-partition min/max envelope of ``probe_cols`` under the
    current partitioning — the planning-time statistic that decides how
    many files a range predicate can skip.  Used by tests to assert that
    a Z-ordered layout has (much) tighter envelopes than a single-column
    sort on every probed column."""
    part = df.withColumn("_pid", F.spark_partition_id())
    aggs = []
    for c in probe_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return part.groupBy("_pid").agg(*aggs)


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact global 1-based row rank under a TOTAL order — without the
    single-partition window ``ROW_NUMBER() OVER (ORDER BY ...)`` plans
    to (the classic driver-melting anti-pattern: every row through one
    task).  The scale shape instead:

    1. ``repartitionByRange`` on the order columns (sampled range
       boundaries — each partition holds one contiguous key range);
    2. ``sortWithinPartitions`` + ``monotonically_increasing_id``,
       whose layout is ``partition_id * 2^33 + local_row_index`` — so
       the LOCAL sort position comes out of the id arithmetic with no
       window and no extra shuffle;
    3. per-partition row counts (an ``n_partitions``-row table) fold
       into cumulative offsets with one window over that TINY table
       (the PPS two-level-prefix-sum shape), broadcast back;
    4. rank = offset + local index + 1.

    The ranks are partition-boundary-independent — hence deterministic
    and oracle-checkable against the naive global window — PROVIDED
    ``order_cols`` is a total order (include a tie-breaking key; with
    ties, which equal row gets which rank would depend on the sampled
    boundaries).  Ascending order; rank descending by negating or
    inverting the column.  Per-partition row counts must stay below
    2^33 (the monotonic-id local field) — at default parallelism that
    is ~10^10 rows per partition before it matters.

    Use cases: percentile features (rank / n), exact top-p corpus
    truncation, rank-based calibration of quality scores.  Output:
    the input columns + ``rank_col``.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    parts = (
        df.repartitionByRange(n_partitions, *order_cols)
        if n_partitions is not None
        else df.repartitionByRange(*order_cols)
    )
    mid = F.monotonically_increasing_id()
    local = parts.sortWithinPartitions(*order_cols).select(
        "*",
        F.shiftrightunsigned(mid, 33).alias("_pid"),
        (mid.bitwiseAND(F.lit((1 << 33) - 1))).alias("_local"),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.col("_off") + F.col("_local") + 1)
        .drop("_pid", "_local", "_off")
    )
