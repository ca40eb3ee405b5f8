"""Order-insensitive dataset content fingerprints — the equality
certificate for data versioning: did two pipelines / two clusters / two
engines produce the SAME corpus, without sorting or moving either copy?

Construction: canonicalize each row to a string (null-tagged,
unit-separator-joined), hash with md5, take the first 60 bits as an
integer term, and SUM the terms modulo the Mersenne prime 2^61-1.
Addition is commutative, so the fingerprint is independent of row
order and partitioning; md5 and integer mod are bit-identical on every
engine, so the certificate transfers across systems (the driver query
replays it in DuckDB verbatim).  A 60-bit multiset-sum fingerprint
detects any single-row difference with probability ~1 - 2^-60 (an
adversary can forge collisions — this is an integrity check against
mistakes, not tampering; use per-row sha256 manifests for the latter).

Plan shape: one map-side projection (codegen md5 + conv) and ONE
all-partial aggregate — no shuffle of data, only the per-partition
partial sums.  Per-group fingerprints shuffle one row per group.

Reference parity: none (the reference trusts file bytes); this serves
the same role as its `_metadata` manifest but at ROW level and across
layouts — two exports with different partitioning get the same
fingerprint iff they hold the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Cross-engine caveat: the canonical form CASTs columns to string, and
# float-to-string rendering is engine-specific ("1e-07" vs "0.0000001").
# Cross-ENGINE certificates should cover int/string/bool/decimal columns
# (or pre-rounded floats); same-engine re-runs may fingerprint anything.
MERSENNE_61 = (1 << 61) - 1
_SEP = "\x1f"  # ASCII unit separator: unlikely in data, stable everywhere
_NULL = "\x1eNULL\x1e"  # RS-wrapped so no real string collides


def row_canonical(cols: list[str]) -> Column:
    """Null-tagged, separator-joined canonical string of the row —
    concat_ws alone erases NULL/''/'missing-column' distinctions, so
    every column is coalesced through an explicit NULL sentinel."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]
    return F.concat_ws(_SEP, *parts)


def row_term(cols: list[str]) -> Column:
    """60-bit integer hash term of a row (first 15 hex digits of md5) —
    small enough that decimal(38) sums never overflow below ~10^20
    rows."""
    return F.conv(
        F.substring(F.md5(row_canonical(cols)), 1, 15), 16, 10
    ).cast("decimal(38,0)")


def dataset_fingerprint(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: (n_rows, fingerprint) where fingerprint = sum of row
    terms mod 2^61-1.  Equal iff the two DataFrames hold the same row
    MULTISET over ``cols`` (default: all columns, sorted by name for a
    stable contract)."""
    cols = sorted(df.columns) if cols is None else list(cols)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # coalesce: the EMPTY corpus gets the well-defined certificate 0,
        # not NULL (NULL = NULL comparisons would report spurious diffs)
        (F.coalesce(F.sum(row_term(cols)), F.lit(0)) % F.lit(MERSENNE_61))
        .cast("long")
        .alias("fingerprint"),
    )


def grouped_fingerprints(
    df: DataFrame, group_col: str, cols: list[str] | None = None
) -> DataFrame:
    """Per-group (group, n_rows, fingerprint) — the incremental form:
    compare two exports group by group (e.g. per partition, per shard,
    per day) and re-ship only the groups whose certificates differ."""
    cols = (
        sorted(c for c in df.columns if c != group_col)
        if cols is None
        else list(cols)
    )
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(row_term(cols)) % F.lit(MERSENNE_61))
        .cast("long")
        .alias("fingerprint"),
    )


def merge_fingerprints(fps: DataFrame) -> DataFrame:
    """Combine per-batch/per-group certificates into the union's
    certificate WITHOUT rescanning data: modular sums add, so
    fingerprint(A ∪ B) = (fp_A + fp_B) mod 2^61-1 and row counts add —
    the incremental/streaming face (fold each micro-batch's one-row
    certificate into standing state; bit-identical to fingerprinting
    the full corpus in one pass, merge-order-free)."""
    return fps.agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        (F.sum(F.col("fingerprint").cast("decimal(38,0)"))
         % F.lit(MERSENNE_61)).cast("long").alias("fingerprint"),
    )
