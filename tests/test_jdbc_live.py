"""Live JDBC end-to-end — the last reference surface that was only
contract-tested (reference cli.py:38-52 reads graph-node Postgres via
SQLAlchemy; SURVEY §4.1 maps it to Spark's range-partitioned JDBC scan).

Two real endpoints, both embedded (no server, no network):

- **Derby** (ships inside pyspark's own jars): plain range-partitioned
  scan through ``read_jdbc_range_partitioned`` — partitioning contract,
  predicate pushdown, row fidelity.
- **DuckDB** (jar discovered in the local artifact cache; skipped
  cleanly when absent): the full lossless-numeric route — DuckDB parses
  the same ``col::text`` projection syntax as Postgres, so the exact
  pushdown subquery ``jdbc_numeric_as_text`` emits for the reference's
  database is executed verbatim against a live engine, and
  ``decimal_str_to_uint256_be`` decodes 38-digit values bit-exactly.

Each runs in a subprocess session because JDBC driver jars must be on
the JVM classpath at session start (the shared test session has only
Derby).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_snippet(code: str, extra_jars: str | None = None) -> str:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    if extra_jars:
        env["TEST_JDBC_JARS"] = extra_jars
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=ROOT,
        env=env,
    )
    assert r.returncode == 0, (r.stdout + "\n" + r.stderr)[-3000:]
    return r.stdout


DERBY_SNIPPET = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, os.getcwd())
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    db = os.path.join(tempfile.mkdtemp(prefix="derby_jdbc_"), "livedb")
    url = f"jdbc:derby:{db};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.range(0, 500).select(
        F.col("id").alias("block"),
        (F.col("id") * 7).alias("val"),
        F.concat(F.lit("e_"), F.col("id")).alias("name"),
    )
    src.write.format("jdbc").option("url", url).option(
        "dbtable", "entity").option("driver", drv).mode("append").save()

    from subgraph_extractor_spark.sources.readers import (
        read_jdbc_range_partitioned,
    )
    back = read_jdbc_range_partitioned(
        spark, url, "entity", "block", 0, 500,
        num_partitions=4, driver=drv,
    )
    assert back.rdd.getNumPartitions() == 4, back.rdd.getNumPartitions()
    assert back.count() == 500
    # range predicate travels to the database as a WHERE pushdown
    sub = back.filter((F.col("block") >= 100) & (F.col("block") < 200))
    assert sub.count() == 100
    row = back.filter(F.col("block") == 42).first()
    assert row["val"] == 294 and row["name"] == "e_42", row
    print("DERBY_OK")
    spark.stop()
    """
)


DUCKDB_SNIPPET = textwrap.dedent(
    """
    import os, sys, tempfile
    sys.path.insert(0, os.getcwd())
    from pyspark.sql import SparkSession, functions as F
    jar = os.environ["TEST_JDBC_JARS"]
    spark = (SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.jars", jar)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    db = os.path.join(tempfile.mkdtemp(prefix="duck_jdbc_"), "live.duckdb")
    url = f"jdbc:duckdb:{db}"
    drv = "org.duckdb.DuckDBDriver"
    # DDL+seed through the driver itself (Spark's generic JDBC writer
    # existence-probe trips on DuckDB); the driver class lives on the
    # session classloader, not py4j's app loader
    loader = spark._jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
    conn = loader.loadClass(drv).newInstance().connect(
        url, spark._jvm.java.util.Properties())
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE entity (block BIGINT, amount DECIMAL(38,0), name VARCHAR)")
    st.execute(
        "INSERT INTO entity SELECT i,"
        " 10000000000000000000000000000000000000 + i, 'row_' || i"
        " FROM range(200) t(i)")
    st.close(); conn.close()

    from subgraph_extractor_spark.sources.readers import (
        read_jdbc_range_partitioned,
    )
    back = read_jdbc_range_partitioned(
        spark, url, "entity", "block", 0, 200,
        num_partitions=4,
        columns=["block", "amount", "name"],
        numeric_columns=["amount"],
        driver=drv,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.schema["amount"].dataType.typeName() == "binary"
    rows = {r["block"]: r for r in back.toPandas().to_dict("records")}
    assert len(rows) == 200
    base = 10**37
    for b in (0, 7, 199):
        got = int.from_bytes(bytes(rows[b]["amount"]), "big")
        assert got == base + b, (b, got)
        assert rows[b]["name"] == f"row_{b}"
    print("DUCKDB_OK")
    spark.stop()
    """
)


def test_jdbc_live_derby_range_partitioned():
    """Embedded Derby (always present in pyspark's jars): live
    range-partitioned scan, 4 disjoint WHERE-bounded queries."""
    out = _run_snippet(DERBY_SNIPPET)
    assert "DERBY_OK" in out


def test_jdbc_live_duckdb_lossless_numeric():
    """Live execution of the exact Postgres-syntax numeric-as-text
    pushdown subquery + 32-byte-BE decode, against embedded DuckDB."""
    jars = glob.glob(
        os.path.expanduser("~/.cache/coursier/**/duckdb_jdbc*.jar"),
        recursive=True,
    )
    if not jars:
        pytest.skip("no duckdb JDBC jar available in the local cache")
    out = _run_snippet(DUCKDB_SNIPPET, extra_jars=jars[0])
    assert "DUCKDB_OK" in out
