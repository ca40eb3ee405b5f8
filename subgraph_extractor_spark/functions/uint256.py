"""uint256 <-> 32-byte big-endian binary codec — the reference's signature
feature (reference README.md:46-97, cli.py:139-142).

Graph-node stores Solidity uint256 as Postgres ``numeric``; the reference
exports it losslessly as a 32-byte big-endian byte string via a per-row
Python lambda — its known hot spot (SURVEY §6).  Here the codec is a scalar
``pandas_udf``: Arrow-batched columnar transfer, exact Python-int math
(never floats), ~vector-speed framing.  Domain checks are preserved:
negative values and values >= 2**256 raise, exactly as ``int.to_bytes(32,
'big')`` does in the reference.

Spark has no 256-bit integer type (Decimal caps at 38 digits; uint256 needs
78), so BinaryType is the faithful carrier; ``be_bytes_to_decimal38``
provides the documented query-side downcast for arithmetic on values known
to fit in Decimal(38,0) (SURVEY §7.2).
"""

from __future__ import annotations

import decimal

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DecimalType

_UINT256_MAX = 2**256 - 1


def _to_int(v) -> int:
    # Exact conversion: Decimal / int / numeric string only.  Floats are
    # rejected — the reference reads with coerce_float=False (cli.py:51) so
    # values are never floats; a float here means an upstream precision bug.
    if isinstance(v, float):
        raise TypeError(f"refusing inexact float -> uint256: {v!r}")
    if isinstance(v, decimal.Decimal):
        if v != v.to_integral_value():
            raise ValueError(f"non-integral value for uint256: {v}")
        return int(v)
    return int(v)


@pandas_udf(BinaryType())
def uint256_to_be_bytes(s: pd.Series) -> pd.Series:
    """Encode a Decimal/int/numeric-string column to 32-byte big-endian
    binary.  Raises OverflowError outside [0, 2**256) (domain assert kept
    from the reference)."""

    def enc(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        return _to_int(v).to_bytes(32, byteorder="big")

    return s.map(enc)


@pandas_udf(BinaryType())
def decimal_str_to_uint256_be(s: pd.Series) -> pd.Series:
    """Decode a base-10 integer STRING column to 32-byte big-endian binary
    — the lossless JDBC ingestion route (SURVEY §4.1): Postgres ``numeric``
    holding uint256 exceeds Spark's Decimal(38,18) JDBC mapping, so the
    pushdown query projects it as ``::text`` (sources.readers.
    jdbc_numeric_as_text) and this kernel decodes the full 78-digit domain
    exactly.  Raises on non-integer strings and values outside
    [0, 2**256) — same domain contract as uint256_to_be_bytes."""

    def enc(v):
        if v is None:
            return None
        return int(str(v).strip()).to_bytes(32, byteorder="big")

    return s.map(enc)


@pandas_udf(DecimalType(38, 0))
def be_bytes_to_decimal38(s: pd.Series) -> pd.Series:
    """Decode 32-byte big-endian binary back to Decimal(38,0).

    Values >= 10**38 cannot be represented in Spark's DecimalType and raise
    ValueError — callers that cannot guarantee the domain should clamp first
    (functions.mappings.clamp) or keep bytes."""

    def dec(v):
        if v is None:
            return None
        n = int.from_bytes(bytes(v), byteorder="big")
        if n >= 10**38:
            raise ValueError(f"uint256 value {n} exceeds Decimal(38,0)")
        return decimal.Decimal(n)

    return s.map(dec)


def uint256_hex_from_decimal(col: Column) -> Column:
    """64-hex-char (32-byte) lowercase representation of a non-negative
    Decimal(38,0) column, built from pure Catalyst expressions (no UDF):
    split into four 32-bit limbs via exact floor-div/mod (Spark decimal
    division rounds, and 64-bit limbs would overflow signed long).  Covers
    the full Decimal(38,0) domain (< 2**127); the binary codec covers the
    full uint256 domain."""
    from subgraph_extractor_spark.functions.mappings import floordiv_exact

    two32 = F.lit(decimal.Decimal(2**32)).cast("decimal(38,0)")
    limbs = []
    shifted = col.cast("decimal(38,0)")
    for _ in range(4):  # 4 x 32 bits = 128 bits >= 127
        limb = F.pmod(shifted, two32).cast("long")
        limbs.append(F.lpad(F.lower(F.hex(limb)), 8, "0"))
        shifted = floordiv_exact(shifted, 2**32)
    return F.lpad(F.concat(*reversed(limbs)), 64, "0")
