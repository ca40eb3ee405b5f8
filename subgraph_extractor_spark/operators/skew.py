"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a handful of heavy keys (a popular token contract, an empty
document fingerprint, a bot user_id) will serialize a shuffle: every row
of the hot key lands on one reducer.  AQE's skew-join splitting
(spark.sql.adaptive.skewJoin, on in session.py) handles the join case at
runtime; these operators are the explicit, plan-level version for
aggregations and for joins AQE can't split (e.g. under a required
distribution), using the classic salting rewrite:

- salted aggregation: groupBy(keys + salt) partial -> groupBy(keys)
  final.  Both stages are hash aggregations with map-side combine; the
  hot key's rows spread over ``n_salts`` reducers in stage one.
- salted join: the skewed (probe) side gets a deterministic salt in
  [0, n); the build side is replicated n times, once per salt value; the
  join key becomes (key, salt).  Build-side blowup is n x — use for
  moderate n and bounded build sides.

Salts are deterministic (hash of a unique column, never rand()) so plans
stay re-runnable and results reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# final-stage recombination for each decomposable aggregate
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(unique_col: str | Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a unique-ish column."""
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    group_keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs``: output_name -> (column, fn) with fn in sum|count|min|max.
    Equivalent to ``df.groupBy(group_keys).agg(...)`` for decomposable
    aggregates, but the first shuffle key space is group_keys x n_salts.
    """
    for name, (_, fn) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"{name}: {fn!r} is not decomposable; allowed: "
                f"{sorted(_DECOMPOSABLE)}"
            )
    salted = df.withColumn("_salt", salt_column(salt_src, n_salts))
    partial = salted.groupBy(*group_keys, "_salt").agg(
        *[
            _DECOMPOSABLE[fn][0](col).alias(f"_p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*group_keys).agg(
        *[
            _DECOMPOSABLE[fn][1](f"_p_{name}").alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: list[str],
    salt_src: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the build side
    replicated once per salt value.  Semantically identical to
    ``skewed.join(build, on, how)`` for inner/left joins."""
    s = skewed.withColumn("_salt", salt_column(salt_src, n_salts))
    b = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = s.join(b, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
