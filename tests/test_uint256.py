"""uint256 codec: round-trip, domain asserts, hex parity (SURVEY §5 test
plan: codec round-trip property tests, clamp boundaries, negative
rejection)."""

import decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from subgraph_extractor_spark.functions.uint256 import (
    be_bytes_to_decimal38,
    uint256_hex_from_decimal,
    uint256_to_be_bytes,
)


def _df_of_decimals(spark, values):
    return spark.createDataFrame(
        [(decimal.Decimal(v),) for v in values],
        T.StructType([T.StructField("x", T.DecimalType(38, 0))]),
    )


def test_roundtrip_decimal38_domain(spark):
    values = [0, 1, 255, 2**64 - 1, 2**64, 10**38 - 1, 10**19, 25 * 10**19]
    df = _df_of_decimals(spark, values)
    out = (
        df.withColumn("b", uint256_to_be_bytes(F.col("x")))
        .withColumn("back", be_bytes_to_decimal38(F.col("b")))
        .select("x", "b", "back")
        .collect()
    )
    for row in out:
        assert len(row["b"]) == 32
        assert int(row["back"]) == int(row["x"])
        # big-endian check against python int
        assert int.from_bytes(bytes(row["b"]), "big") == int(row["x"])


def test_string_carrier_full_uint256_domain(spark):
    """Values beyond Decimal(38) travel as strings (JDBC lossless route,
    SURVEY §4.1) and still encode exactly."""
    values = [str(2**256 - 1), str(10**38), str(2**200 + 12345)]
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    rows = df.withColumn("b", uint256_to_be_bytes(F.col("s"))).collect()
    for row, v in zip(rows, values):
        assert int.from_bytes(bytes(row["b"]), "big") == int(v)


def test_negative_and_overflow_raise(spark):
    neg = spark.createDataFrame([("-1",)], ["s"])
    with pytest.raises(Exception):
        neg.withColumn("b", uint256_to_be_bytes(F.col("s"))).collect()
    over = spark.createDataFrame([(str(2**256),)], ["s"])
    with pytest.raises(Exception):
        over.withColumn("b", uint256_to_be_bytes(F.col("s"))).collect()


def test_null_passthrough(spark):
    df = spark.createDataFrame(
        [(None,), (decimal.Decimal(7),)],
        T.StructType([T.StructField("x", T.DecimalType(38, 0))]),
    )
    rows = (
        df.withColumn("b", uint256_to_be_bytes(F.col("x")))
        .withColumn("back", be_bytes_to_decimal38(F.col("b")))
        .orderBy(F.col("x").asc_nulls_first())
        .collect()
    )
    assert rows[0]["b"] is None and rows[0]["back"] is None
    assert int(rows[1]["back"]) == 7


def test_hex_matches_python(spark):
    # expression-only hex must agree with python formatting across the
    # Decimal(38) domain incl. both 64-bit limb boundaries
    values = [0, 1, 2**63 - 1, 2**63, 2**64 - 1, 2**64, 10**38 - 1, 31337]
    df = _df_of_decimals(spark, values)
    rows = (
        df.withColumn("h", uint256_hex_from_decimal(F.col("x")))
        .orderBy("x")
        .collect()
    )
    for row in rows:
        assert row["h"] == format(int(row["x"]), "064x")
