"""Mergeable equi-width histogram state + incremental percentiles.

Exact percentiles need the full dataset every time (a9_percentiles);
``approx_percentile`` answers one query but keeps no mergeable state.
This module is the percentile face of the incremental-state family
(`aggstate`, `sketches`, `bloom`, `freq`): a fixed-geometry equi-width
histogram is a *mergeable* summary — per-bin counts add — so a standing
histogram table absorbs each new batch without rescanning history, and
any percentile is served from the |bins|-row state with a HARD error
bound of one bin width on the value axis.

Everything is deterministic and SQL-expressible (bin index is a single
floor-divide; the estimate is a cumulative-count walk), so unlike most
quantile sketches (t-digest/KLL, which are merge-order-sensitive) the
merged state — and therefore the served percentile — is bit-identical
to the single-pass histogram whatever the batch boundaries.  That is
the property the driver query certifies against a DuckDB oracle.

Geometry (lo, hi, bins) is part of the state's identity: merging
mismatched geometries raises.  Values outside [lo, hi) clamp into the
edge bins (documented: the error bound then holds only inside the
range; track min/max alongside via ``aggstate`` if the domain drifts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GEOM_COLS = ("hist_lo", "hist_hi", "hist_bins")


def bin_of(value: Column, lo: float, hi: float, bins: int) -> Column:
    """Equi-width bin index with edge clamping — one codegen floor-div;
    the identical expression runs on any SQL engine."""
    width = (hi - lo) / bins
    raw = F.floor((value.cast("double") - lo) / width).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def histogram_state(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """(bin, n, hist_lo, hist_hi, hist_bins) — one row per non-empty
    bin.  One |bins|-bounded shuffle; geometry rides along so merges
    can refuse mismatched state."""
    if not (hi > lo) or bins < 1:
        raise ValueError(f"bad histogram geometry: [{lo}, {hi}) x {bins}")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bin_of(F.col(value_col), lo, hi, bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("hist_lo", F.lit(float(lo)))
        .withColumn("hist_hi", F.lit(float(hi)))
        .withColumn("hist_bins", F.lit(int(bins)))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-bin counts add.  Refuses mismatched geometries — a merged
    histogram over different bin edges is silently meaningless."""
    geoms = (
        a.select(*_GEOM_COLS)
        .unionByName(b.select(*_GEOM_COLS))
        .distinct()
        .collect()
    )
    if len(geoms) > 1:
        raise ValueError(f"histogram geometry mismatch: {geoms}")
    return (
        a.unionByName(b)
        .groupBy("bin", *_GEOM_COLS)
        .agg(F.sum("n").alias("n"))
        .select("bin", "n", *_GEOM_COLS)
    )


def percentiles_from_histogram(
    state: DataFrame, ps: list[float]
) -> DataFrame:
    """(p, est) for each requested percentile: the UPPER edge of the
    first bin whose cumulative count reaches p * total.  Estimate error
    is at most one bin width for in-range data; the walk runs over the
    |bins|-row state only.  Deterministic: cumulative counts are exact
    integers, the threshold comparison is done in integers scaled by
    1e6 (p as parts-per-million), and the edge value is a single
    lo + (bin+1) * width double expression."""
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = state.withColumn(
        "_cum", F.sum("n").over(w_cum)
    ).withColumn("_total", F.sum("n").over(Window.partitionBy()))
    ests = []
    for p in ps:
        ppm = int(round(p * 1_000_000))
        hit = (
            ranked.filter(
                F.col("_cum") * 1_000_000 >= F.col("_total") * ppm
            )
            .orderBy("bin")
            .limit(1)
            .select(
                F.lit(p).alias("p"),
                (
                    F.col("hist_lo")
                    + (F.col("bin") + 1)
                    * (
                        (F.col("hist_hi") - F.col("hist_lo"))
                        / F.col("hist_bins")
                    )
                ).alias("est"),
            )
        )
        ests.append(hit)
    out = ests[0]
    for e in ests[1:]:
        out = out.unionByName(e)
    return out
