#!/usr/bin/env python3
"""Partitioning-invariance sweep: every oracled registry query must
produce an IDENTICAL canonical result under two deliberately different
physical execution shapes.

The DuckDB differential harness (check_correctness.py) certifies
values at ONE partitioning.  A query whose result depends on partition
count or split boundaries — an arbitrary tie-break that happens to
match the oracle at 16 shuffle partitions, a float sum whose addition
order leaks into the output, a first()/head-style reduction — can pass
that gate coincidentally and still be wrong on a real cluster, where
partitioning is whatever the data volume dictates.  This sweep runs
each query twice in the same session:

  shape A: shuffle.partitions=16, AQE on,  files.maxPartitionBytes=128m
  shape B: shuffle.partitions=7,  AQE off, files.maxPartitionBytes=1m

(7 is coprime to every bucket/band count in use, so hash->partition
assignments all move; 1m forces multi-split parquet scans at sf0.01 so
scan-task boundaries move too; AQE off disables runtime coalescing so
shape B really executes at 7.)  Both results go through the same
order-insensitive canonical value hash the driver's gate uses — equal
hashes mean the result is a pure function of the data, not of the
physical plan.

Rows-only faces (no oracle_sql entry: blake2b/float kernels) are
EXCLUDED by default — the float aggregation in e.g. semdedup_approx is
documented as scale-path-approximate, and IEEE float sums are not
addition-order invariant; their portable twins are swept instead.
Pass --all to include them anyway.

Usage: python scripts/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import value_hash  # noqa: E402  (same dir)

SHAPES = {
    "A": {
        "spark.sql.shuffle.partitions": "16",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.files.maxPartitionBytes": "134217728",
    },
    "B": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "1048576",
    },
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    include_rows_only = "--all" in sys.argv[1:]
    # first positional is the sf dir ONLY if it exists on disk —
    # `check_determinism.py some_query` would otherwise silently run
    # the whole sweep against a nonexistent data dir
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    elif args and (os.sep in args[0] or args[0].startswith(".")):
        raise SystemExit(f"sf dir does not exist: {args[0]}")
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)

    import __spark_entry__ as entrymod
    from subgraph_extractor_spark import get_spark

    spark = get_spark("determinism", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.codegen.fallback", "false")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    saved = {k: spark.conf.get(k) for k in SHAPES["A"]}
    failures, passed, skipped = [], 0, 0
    try:
        for name, fn in qs.items():
            if only and name not in only:
                continue
            if name not in oracles and not include_rows_only:
                skipped += 1
                continue
            t0 = time.time()
            hashes, counts = {}, {}
            try:
                for shape, confs in SHAPES.items():
                    # a query that leaks a persisted DataFrame would let
                    # shape B read shape A's cached InMemoryRelation and
                    # pass vacuously — clear between shapes so the check
                    # is sound independent of operator cache discipline
                    spark.catalog.clearCache()
                    for k, v in confs.items():
                        spark.conf.set(k, v)
                    pdf = fn(spark, sf_dir).toPandas()
                    hashes[shape] = value_hash(pdf)
                    counts[shape] = len(pdf)
            except Exception as e:
                failures.append((name, f"error: {e}"))
                print(f"FAIL {name}: error: {str(e)[:300]}")
                continue
            if hashes["A"] != hashes["B"]:
                detail = (
                    f"shape-dependent result: rows A={counts['A']} "
                    f"B={counts['B']}, value hashes differ"
                )
                failures.append((name, detail))
                print(f"FAIL {name}: {detail}")
            else:
                passed += 1
                print(
                    f"ok   {name} ({counts['A']} rows, "
                    f"{time.time()-t0:.1f}s)"
                )
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    print(
        f"\n{passed} invariant, {skipped} skipped (rows-only), "
        f"{len(failures)} failed"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
