#!/usr/bin/env python3
"""Local differential harness mimicking the driver's correctness gate:
run every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, compare row count + schema + order-
insensitive value hash.  Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    return df


def value_hash(df: pd.DataFrame) -> str:
    # Dtype-faithful rendering: repr() keeps the trailing ".0" on
    # integral floats, so an int64 column on one engine and a float64
    # column on the other ("9549" vs "9549.0") can NEVER hash-match.
    # This is the class that burned rounds 1-3: DuckDB returns HUGEINT
    # for integer SUM()/list_aggregate('sum'), and duckdb's .df()
    # converts HUGEINT -> float64, while Spark emits bigint.  repr of a
    # float is also the shortest 17-significant-digit round-trip, so
    # genuine float columns still compare bit-exactly.
    df = canon(df)
    rows = []
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("∅")
            elif isinstance(v, float):
                parts.append(repr(float(v)))
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


_KIND_CLASS = {
    "i": "int", "u": "int", "f": "float", "b": "bool",
    "M": "time", "m": "time", "O": "obj", "U": "obj", "S": "obj",
}


def dtype_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list:
    """Columns whose pandas dtype *class* differs between engines.

    int-vs-float is the killer (driver hashes render them differently);
    obj-vs-anything is also flagged since e.g. Spark Decimal arrives as
    object while DuckDB DECIMAL arrives as float64.
    """
    out = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        ks = _KIND_CLASS.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
        ko = _KIND_CLASS.get(odf[c].dtype.kind, odf[c].dtype.kind)
        if ks != ko:
            out.append(f"{c}: spark {sdf[c].dtype} vs oracle {odf[c].dtype}")
    return out


def _nan_columns(sp_df) -> list:
    """Float/double result columns containing real IEEE NaN, detected
    JVM-side where NaN is still distinguishable from NULL (after
    toPandas both become float64 NaN and the information is gone)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cols = [
        f.name
        for f in sp_df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    if not cols:
        return []
    counts = sp_df.select(
        [
            F.sum(F.when(F.isnan(c), 1).otherwise(0)).alias(c)
            for c in cols
        ]
    ).collect()[0]
    return [c for c in cols if (counts[c] or 0) > 0]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from subgraph_extractor_spark import get_spark

    spark = get_spark("correctness", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    # codegen compile gate (r8 verdict task 2): a janino failure must
    # FAIL the query here, never silently run interpreted — the r8
    # text_lang regression shipped because fallback=true ate the error
    spark.conf.set("spark.sql.codegen.fallback", "false")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sp_df = fn(spark, sf_dir)
            sdf = sp_df.toPandas()
            nan_cols = _nan_columns(sp_df)
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error: {str(e)[:500]}")
            continue
        if nan_cols:
            # NaN output is inherently non-portable: pandas collapses
            # SQL NULL and IEEE NaN to the same float64 NaN before any
            # comparison can see the difference (Spark NaN vs DuckDB
            # NULL would silently hash-equal locally while a
            # NULL/NaN-distinguishing driver canonicalizer fails it).
            # Queries must never emit NaN — guard 0/0 with a filter or
            # nullif on BOTH sides.
            failures.append((name, f"NaN in Spark output: {nan_cols}"))
            print(f"FAIL {name}: NaN in Spark output columns {nan_cols}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error: {str(e)[:500]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            dm = dtype_mismatches(sdf, odf)
            if dm:
                problems.append("dtype mismatch: " + "; ".join(dm))
        if not problems:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append("value hash mismatch")
                a, b = canon(sdf), canon(odf)
                try:
                    a = a.sort_values(list(a.columns)).reset_index(drop=True)
                    b = b.sort_values(list(b.columns)).reset_index(drop=True)
                    neq = (a.astype(str) != b.astype(str)).any(axis=1)
                    print(f"  first diffs for {name}:")
                    print(pd.concat([a[neq].head(3), b[neq].head(3)]))
                except Exception:
                    pass
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            passed += 1
            print(f"ok   {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")

    print(
        f"\n{passed} matched, {rows_only} rows-only, {len(failures)} failed"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
