"""Config-driven column-mapping compiler.

The reference applies a per-column transform pass driven by the YAML config
(reference cli.py:110-168; spec README.md:46-97): optional integer
``downscale`` (floor division), optional ``max_value``/``default`` clamp
with a companion boolean ``validity_column``, then a type cast; unmapped
``numeric`` columns default to the 32-byte-BE bytes codec, and the original
column is always kept as bytes alongside any mappings (README.md:90).

Here each mapping compiles to a Catalyst Column expression tree —
``F.when`` / ``F.floor`` / ``cast`` — applied in one ``withColumns`` pass,
so the whole transform stays inside whole-stage codegen (no Python in the
hot path except the uint256 codec itself).

Fidelity notes (SURVEY §7.2):
- downscale uses **floor** division (pandas ``//``, "divide and floor" per
  README.md:77-88) — ``F.floor(a / b)``, not SQL ``div`` (truncation).
- the reference's pyarrow ``types`` dict implements only a subset of the
  README's documented type list and KeyErrors on the rest (cli.py:147-155
  vs README.md:92-97); this compiler implements the full documented set.
- without max_value, an out-of-range value must fail the extraction, not
  wrap (README.md:63-66; the reference's ``safe=False`` cast at cli.py:167
  wraps silently — deviation documented in SURVEY §4.2, we prefer the
  README contract): enforced via ``strict_range_check`` exprs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from subgraph_extractor_spark.functions.uint256 import uint256_to_be_bytes

_INT64_MAX = 2**63 - 1


def _num_lit(v) -> Column:
    """Literal for config numbers: ints beyond int64 (uint64 max, clamp
    bounds, Numeric38 domains) must become Decimal literals — a plain
    F.lit raises NumberFormatException in the JVM."""
    import decimal

    if isinstance(v, int) and abs(v) > _INT64_MAX:
        return F.lit(decimal.Decimal(v))
    return F.lit(v)

# README.md:92-97 documented export types -> Spark SQL types.  Spark has no
# unsigned integers: each uintN widens to the next signed type that holds
# its full domain; uint64 needs Decimal(20,0) (SURVEY §1.2).
SPARK_TYPE_FOR_MAPPING = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float32": "float",
    "float64": "double",
    "Numeric38": "decimal(38,0)",
    "bytes": "binary",
    "bool": "boolean",
    "boolean": "boolean",
    "string": "string",
}

# Inclusive numeric domains for strict (no-max_value) range enforcement.
_TYPE_DOMAIN = {
    "int8": (-(2**7), 2**7 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 2**8 - 1),
    "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1),
    "uint64": (0, 2**64 - 1),
    "Numeric38": (-(10**38) + 1, 10**38 - 1),
}


def _floordiv_udf(factor: int):
    """Exact arbitrary-precision floor division (Arrow-batched, Python
    int semantics — `//` floors like the reference's pandas `//`)."""
    import decimal

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("decimal(38,0)")
    def fd(vals: pd.Series) -> pd.Series:
        return vals.map(
            lambda v: None if v is None else decimal.Decimal(int(v) // factor)
        )

    return fd


def floordiv_exact(col: Column, factor) -> Column:
    """Exact floor division for decimal columns.

    ``F.floor(a / b)`` is WRONG for decimals: Spark's decimal division
    rounds to the result scale first (999999999 / 10^9 -> 1.000000 ->
    floor 1, not 0).  Subtracting the positive remainder first makes the
    quotient exact: (a - pmod(a, b)) / b == floor(a / b) for any sign of
    ``a`` (pmod is always in [0, b)).

    Capacity caveat: decimal(38,0)/decimal(38,0) yields decimal(38,6)
    under allowPrecisionLoss, whose integer capacity is 10^32 — a
    quotient >= 10^32 would silently become NULL.  With ``factor >=
    10^7`` the quotient of any decimal(38,0) is < 10^32, so the codegen
    path is safe; smaller factors take an exact Arrow kernel instead
    (rare config — downscales are typically 10^9..10^18)."""
    k = _num_lit(factor).cast("decimal(38,0)")
    if int(factor) >= 10**7:
        return ((col - F.pmod(col, k)) / k).cast("decimal(38,0)")
    return _floordiv_udf(int(factor))(col.cast("decimal(38,0)"))


def downscale(col: Column, factor: int) -> Column:
    """Lossy integer downscale: divide and floor (README.md:77-88)."""
    if factor <= 0:
        raise ValueError(f"downscale factor must be positive: {factor}")
    return floordiv_exact(col, factor)


def clamp(col: Column, max_value, default) -> Column:
    """Keep values <= max_value, replace larger ones with default
    (README.md:63-75; reference np.where at cli.py:120-130)."""
    return F.when(col <= _num_lit(max_value), col).otherwise(_num_lit(default))


def validity(col: Column, max_value) -> Column:
    """Companion boolean: was the value within range?"""
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
        col <= _num_lit(max_value)
    )


@dataclass
class CompiledMappings:
    """Output of the compiler: expressions to add, in order."""

    columns: dict[str, Column] = field(default_factory=dict)
    # (column_name, assertion Column) pairs: assertion must be all-true;
    # enforced by extract via a cheap agg (README "extraction will stop
    # with an error" contract).
    assertions: list[tuple[str, Column]] = field(default_factory=list)
    # dest column -> "uint8|uint16|uint32|uint64": Spark carries these in
    # widened signed types; the arrow sink narrows them back to unsigned
    # Parquet types like the reference (cli.py:147-155).
    arrow_types: dict[str, str] = field(default_factory=dict)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumns(self.columns) if self.columns else df


def compile_column_mappings(
    column_mappings: dict[str, dict[str, dict]] | None,
    numeric_columns: list[str] = (),
) -> CompiledMappings:
    """Compile a config ``column_mappings`` block into Column expressions.

    ``numeric_columns`` lists source columns of unbounded-numeric (uint256)
    kind; each is re-expressed as 32-byte-BE bytes under its own name
    (the "original always present as bytes" rule, README.md:90), with any
    mappings derived from the pre-codec value.
    """
    out = CompiledMappings()
    column_mappings = column_mappings or {}

    for src, targets in column_mappings.items():
        src_col = F.col(src)
        for dest, spec in (targets or {}).items():
            expr = src_col
            type_name = spec.get("type", "bytes")
            if type_name not in SPARK_TYPE_FOR_MAPPING:
                raise ValueError(
                    f"unknown mapping type {type_name!r} for {src}->{dest}; "
                    f"allowed: {sorted(SPARK_TYPE_FOR_MAPPING)}"
                )
            if "downscale" in spec:
                expr = downscale(expr, int(spec["downscale"]))
            if "max_value" in spec:
                mx = spec["max_value"]
                dflt = spec.get("default", 0)
                if spec.get("validity_column"):
                    out.columns[spec["validity_column"]] = validity(expr, mx)
                expr = clamp(expr, mx, dflt)
            elif type_name in _TYPE_DOMAIN:
                lo, hi = _TYPE_DOMAIN[type_name]
                out.assertions.append(
                    (
                        dest,
                        expr.isNull()
                        | ((expr >= _num_lit(lo)) & (expr <= _num_lit(hi))),
                    )
                )
            if type_name == "bytes":
                expr = uint256_to_be_bytes(expr)
            else:
                expr = expr.cast(SPARK_TYPE_FOR_MAPPING[type_name])
            if type_name.startswith("uint"):
                out.arrow_types[dest] = type_name
            out.columns[dest] = expr

    # Default path for unmapped (and mapped — original kept) numeric cols.
    for src in numeric_columns:
        out.columns[src] = uint256_to_be_bytes(F.col(src))
    return out


def enforce_assertions(df: DataFrame, compiled: CompiledMappings) -> None:
    """Fail the extraction if any strict-typed mapping is out of range
    (README.md:63-66).  One distributed agg over all assertions — a single
    job, no collect of data rows."""
    if not compiled.assertions:
        return
    checks = df.agg(
        *[
            F.min(F.coalesce(a, F.lit(False))).alias(name)
            for name, a in compiled.assertions
        ]
    ).first()
    bad = [name for name, _ in compiled.assertions if checks[name] is False]
    if bad:
        raise OverflowError(
            f"value(s) out of range for strictly-typed mapping(s) {bad}; "
            "add max_value/default/validity_column to clamp instead"
        )
