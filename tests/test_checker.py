"""The local differential checker must fail on the divergence class that
burned rounds 1-3: DuckDB returning float64 (via HUGEINT) where Spark
emits int64.  Local pass must imply driver pass."""

import importlib.util
import os

import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "check_correctness.py",
    ),
)
checker = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(checker)


def test_int64_vs_float64_never_hash_equal():
    di = pd.DataFrame({"x": [9549, 0, -3]})
    df = pd.DataFrame({"x": [9549.0, 0.0, -3.0]})
    assert checker.value_hash(di) != checker.value_hash(df)


def test_dtype_mismatch_flags_int_float_column():
    di = pd.DataFrame({"a": [1], "b": [1.5]})
    df = pd.DataFrame({"a": [1.0], "b": [1.5]})
    got = checker.dtype_mismatches(di, df)
    assert got == ["a: spark int64 vs oracle float64"]


def test_matching_dtypes_pass():
    a = pd.DataFrame({"a": [1], "b": [1.5], "c": ["x"], "d": [True]})
    b = pd.DataFrame({"a": [1], "b": [1.5], "c": ["x"], "d": [True]})
    assert checker.dtype_mismatches(a, b) == []
    assert checker.value_hash(a) == checker.value_hash(b)


def test_float_render_is_roundtrip_faithful():
    # repr() is the shortest 17-significant-digit round-trip: two floats
    # differing in the last ulp must hash differently
    x = 0.1
    y = 0.1 + 2**-55
    assert x != y
    a = pd.DataFrame({"v": [x]})
    b = pd.DataFrame({"v": [y]})
    assert checker.value_hash(a) != checker.value_hash(b)


def test_nan_detected_jvm_side_where_null_is_not(spark):
    """_nan_columns must flag real IEEE NaN in double output columns and
    must NOT flag NULL — the distinction pandas erases (both become
    float64 NaN after toPandas), which is why the guard runs JVM-side."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0,), (2.0,)], ["a"])
    with_nan = df.select(
        F.when(F.col("a") > 1.5, F.lit(float("nan")))
        .otherwise(F.col("a"))
        .alias("bad"),
        F.col("a").alias("ok"),
    )
    assert checker._nan_columns(with_nan) == ["bad"]

    with_null = df.select(
        F.when(F.col("a") > 1.5, F.col("a")).alias("has_null"),
        F.col("a").alias("ok"),
    )
    assert checker._nan_columns(with_null) == []
