"""Mergeable equi-width histogram state + incremental percentiles.

Exact percentiles need the full dataset every time (a9_percentiles);
``approx_percentile`` answers one query but keeps no mergeable state.
This module is the percentile face of the incremental-state family
(`aggstate`, `sketches`, `bloom`, `freq`): a fixed-geometry equi-width
histogram is a *mergeable* summary — per-bin counts add — so a standing
histogram table absorbs each new batch without rescanning history, and
any percentile is served from the |bins|-row state with a hard error
bound of one bin width against the nearest-rank quantile (see
``percentiles_from_histogram`` for the exact contract and how
interpolating anchors differ).

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
    v = F.col(value_col).cast("double")
    return (
        # NULL and NaN both excluded: Spark's floor(NaN) casts to 0 —
        # NaN rows would silently inflate bin 0 (and the same cast is a
        # hard error on other engines, so excluding them is also what
        # keeps the expression portable)
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(v))
        .groupBy(bin_of(F.col(value_col), lo, hi, bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("hist_lo", F.lit(float(lo)))
        .withColumn("hist_hi", F.lit(float(hi)))
        .withColumn("hist_bins", F.lit(int(bins)))
    )


def merge_histogram_states(
    a: DataFrame, b: DataFrame, check_geometry: bool = True
) -> DataFrame:
    """Per-bin counts add.  Refuses mismatched geometries — a merged
    histogram over different bin edges is silently meaningless.

    The geometry check runs the two state plans once (cheap when the
    states are persisted tables — the normal standing-state case; for
    one-shot in-plan composition where both states were just built with
    the same literals, pass ``check_geometry=False`` to skip the extra
    computation).  Grouping by the geometry columns keeps the merge
    itself mismatch-safe either way: mismatched bins never add, they
    surface as conflicting geometry rows downstream."""
    if check_geometry:
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
    first bin whose cumulative count reaches ceil-at(p * total) — i.e.
    the bin containing the nearest-rank p-th value.  The walk runs over
    the |bins|-row state only, ONCE for all requested percentiles (the
    p list explodes against the ranked state; no per-p re-scan).

    Error contract: for in-range data, est lies in (v, v + width] where
    v is the NEAREST-RANK quantile (the smallest value with cumulative
    frequency >= p) — a hard one-bin-width bound on that definition.
    Against an INTERPOLATING quantile (SQL ``quantile_cont`` /
    Spark ``percentile``) the difference can exceed a bin width when
    the interpolation crosses sparse bins; anchor contracts to the
    interpolated value are corpus observations, not guarantees.

    Deterministic: cumulative counts are exact integers, the threshold
    comparison is integer (p scaled to parts-per-million), the edge is
    a single lo + (bin+1) * width double expression."""
    if not ps:
        raise ValueError("ps must be non-empty")
    bad = [p for p in ps if not (0.0 < p <= 1.0)]
    if bad:
        raise ValueError(f"percentiles outside (0, 1]: {bad}")
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = state.withColumn(
        "_cum", F.sum("n").over(w_cum)
    ).withColumn("_total", F.sum("n").over(Window.partitionBy()))
    targets = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"),
                F.lit(int(round(p * 1_000_000))).alias("ppm"),
            )
            for p in ps
        ]
    )
    return (
        ranked.select(
            "bin", "_cum", "_total", *_GEOM_COLS,
            F.explode(targets).alias("_t"),
        )
        .filter(F.col("_cum") * 1_000_000 >= F.col("_total") * F.col("_t.ppm"))
        .groupBy(F.col("_t.p").alias("p"), *_GEOM_COLS)
        .agg(F.min("bin").alias("_bin"))
        .select(
            "p",
            (
                F.col("hist_lo")
                + (F.col("_bin") + 1)
                * (
                    (F.col("hist_hi") - F.col("hist_lo"))
                    / F.col("hist_bins")
                )
            ).alias("est"),
        )
    )
