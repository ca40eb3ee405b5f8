"""Event-time queries must be session-timezone-independent: the driver
provides its own SparkSession, and a non-UTC spark.sql.session.timeZone
must not shift sessionization boundaries, tumbling windows, or
watermarks (the round-2 failure class — fixed via NTZ-arithmetic
normalization in sources.readers; this test keeps it fixed)."""

import pytest

import __spark_entry__ as em

TZ_SENSITIVE = ["w7_sessionize", "f_window_tumbling", "a1_minmax_watermark"]


def _rows(spark, name, sf_dir):
    df = em.queries()[name](spark, sf_dir)
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_identical_under_non_utc_session(spark, sf_dir, name):
    key = "spark.sql.session.timeZone"
    original = spark.conf.get(key)
    utc_rows = _rows(spark, name, sf_dir)
    try:
        spark.conf.set(key, "America/New_York")
        ny_rows = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set(key, original)
    assert ny_rows == utc_rows and utc_rows
