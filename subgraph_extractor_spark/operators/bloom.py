"""Sharded Bloom-filter membership sketch — the probabilistic pre-filter
for continual-ingestion exact dedup.

Why this exists (the 100 TB story): `exact_dedup_incremental`
(dedup.py) probes every new batch against the standing corpus digest
table with a left-anti join.  Correct, but the join touches the digest
table's partitions on every ingest — at a 10^10-document corpus that is
~300 GB of digest state shuffled or sort-merge-scanned per batch, even
when the batch is tiny and almost entirely novel.  A Bloom filter over
the corpus digests answers "definitely not in the corpus" from a bitmap
that is ~10 bits per key (1% FPR): the anti-join then only needs to run
for the (few) Bloom-positive rows, shrinking the exact join's probe side
by ~the novelty rate.  False positives cost only a redundant exact
check; false negatives are impossible, so the composed operator stays
EXACT.

Design — a sharded sketch TABLE, not a driver artifact (the same shape
as the HLL sketch tables in sketches.py):

- state is a DataFrame ``(shard, bitmap, n_items, num_bits, num_hashes)``
  with one row per shard — persistable to parquet, broadcastable,
  mergeable (bitwise OR of equal-shard bitmaps);
- a key's shard and its two 64-bit base hashes are computed JVM-side
  (``xxhash64`` with distinct literal salts — whole-stage codegen, no
  Python);  the k probe positions derive via Kirsch-Mitzenmacher double
  hashing pos_i = h1 + i*h2 (mod 2^64, then mod num_bits), so build and
  probe share one vectorized numpy kernel;
- build is ONE shuffle of 24-byte (shard, h1, h2) rows; each shard task
  materializes only its own bitmap (num_bits/8 bytes, e.g. 2 MB for
  2^24 bits) — no all-bits-on-one-node step, no driver collection;
- probe cogroups the batch with the sketch table on shard: the bitmap
  crosses the wire once per shard, never once per row.

Sizing at 10^10 keys / 1% FPR: ~12 GB of bitmap total -> 4096 shards of
~3 MB.  Shard count bounds per-task memory AND probe parallelism; both
build and probe are O(batch) work regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("bitmap", T.BinaryType()),
        T.StructField("n_items", T.LongType()),
        T.StructField("num_bits", T.LongType()),
        T.StructField("num_hashes", T.IntegerType()),
    ]
)


def _with_hashes(df: DataFrame, key_col: str, num_shards: int) -> DataFrame:
    """JVM-side shard id + two independent 64-bit hashes per key.
    Distinct literal salts give independent xxhash64 streams; the shard
    hash is separate from the position hashes so the mod-num_shards
    projection leaks nothing into the in-shard positions."""
    key = F.col(key_col)
    return df.withColumn(
        "_shard", F.pmod(F.xxhash64(key, F.lit(0)), F.lit(num_shards)).cast("int")
    ).withColumn("_h1", F.xxhash64(key, F.lit(1))).withColumn(
        "_h2", F.xxhash64(key, F.lit(2))
    )


def _positions(h1: np.ndarray, h2: np.ndarray, i: int, num_bits: int) -> np.ndarray:
    """Kirsch-Mitzenmacher probe position i for a vector of keys.
    uint64 arithmetic wraps mod 2^64 (intended), then mod num_bits."""
    return ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)


def _to_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_shards: int = 32,
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
) -> DataFrame:
    """Build the sharded Bloom sketch table over ``df[key_col]``.

    ``num_bits`` is PER SHARD; total capacity ~= num_shards * num_bits /
    (1.44 * log2(1/fpr)) keys.  One shuffle keyed by shard; each task
    owns one bitmap of num_bits/8 bytes.
    """
    hashed = _with_hashes(df.select(key_col), key_col, num_shards)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _to_u64(pdf["_h1"]), _to_u64(pdf["_h2"])
        arr = np.zeros(num_bits // 8, dtype=np.uint8)
        for i in range(num_hashes):
            idx = _positions(h1, h2, i, num_bits)
            # |= with duplicate byte indices needs the unbuffered form
            np.bitwise_or.at(arr, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "shard": [int(pdf["_shard"].iloc[0])],
                "bitmap": [arr.tobytes()],
                "n_items": [len(pdf)],
                "num_bits": [num_bits],
                "num_hashes": [num_hashes],
            }
        )

    return hashed.groupBy("_shard").applyInPandas(build, schema=_SKETCH_SCHEMA)


def bloom_merge(sketches: DataFrame) -> DataFrame:
    """Merge stacked sketch tables (same num_shards/num_bits/num_hashes):
    bitwise-OR equal-shard bitmaps.  This is the incremental refresh —
    sketch the new batch alone, union with the standing table, merge;
    the corpus is never re-read."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = {int(b) for b in pdf["num_bits"]}
        hashes = {int(h) for h in pdf["num_hashes"]}
        if len(bits) != 1 or len(hashes) != 1:
            raise ValueError(
                "bloom_merge: mixed num_bits/num_hashes across inputs"
            )
        acc = np.zeros(bits.pop() // 8, dtype=np.uint8)
        for b in pdf["bitmap"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {
                "shard": [int(pdf["shard"].iloc[0])],
                "bitmap": [acc.tobytes()],
                "n_items": [int(pdf["n_items"].sum())],
                "num_bits": [int(pdf["num_bits"].iloc[0])],
                "num_hashes": [hashes.pop()],
            }
        )

    return sketches.groupBy("shard").applyInPandas(merge, schema=_SKETCH_SCHEMA)


def bloom_probe(
    batch: DataFrame,
    key_col: str,
    sketch: DataFrame,
    num_shards: int = 32,
    flag_col: str = "maybe_in_corpus",
) -> DataFrame:
    """Probe every batch row against the sketch: adds boolean
    ``flag_col`` (False => key is DEFINITELY absent from the corpus the
    sketch was built over; True => present or a false positive).

    The batch shuffles once on shard; each cogroup task receives its
    shard's bitmap exactly once (never per-row).  All original batch
    columns pass through.
    """
    hashed = _with_hashes(batch, key_col, num_shards)
    out_schema = T.StructType(
        list(batch.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )
    batch_cols = [f.name for f in batch.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=batch_cols + [flag_col])
        if right.empty:
            flags = np.zeros(len(left), dtype=bool)
        else:
            arr = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
            num_bits = int(right["num_bits"].iloc[0])
            num_hashes = int(right["num_hashes"].iloc[0])
            h1, h2 = _to_u64(left["_h1"]), _to_u64(left["_h2"])
            flags = np.ones(len(left), dtype=bool)
            for i in range(num_hashes):
                idx = _positions(h1, h2, i, num_bits)
                flags &= (arr[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 == 1
        out = left[batch_cols].copy()
        out[flag_col] = flags
        return out

    return (
        hashed.groupBy("_shard")
        .cogroup(sketch.groupBy("shard"))
        .applyInPandas(probe, schema=out_schema)
    )


def exact_dedup_incremental_bloom(
    new_df: DataFrame,
    content_col: str,
    id_col: str,
    corpus_digests: DataFrame,
    sketch: DataFrame,
    num_shards: int = 32,
) -> DataFrame:
    """`dedup.exact_dedup_incremental` with a Bloom pre-filter: same
    EXACT result (the sketch must cover ``corpus_digests``'s
    ``content_sha256`` column — no false negatives, so Bloom-negative
    rows are provably novel), but the left-anti join's probe side is
    only the Bloom-POSITIVE rows.  At a mostly-novel ingest the exact
    join shrinks by ~the novelty rate; the corpus digest table is
    untouched except for those residual probes."""
    from pyspark.sql import Window

    hashed = new_df.withColumn(
        "content_sha256", F.sha2(F.col(content_col), 256)
    )
    w = Window.partitionBy("content_sha256").orderBy(F.col(id_col).asc())
    in_batch_first = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    flagged = bloom_probe(
        in_batch_first, "content_sha256", sketch, num_shards=num_shards
    )
    definitely_new = flagged.filter(~F.col("maybe_in_corpus")).drop(
        "maybe_in_corpus"
    )
    needs_check = flagged.filter(F.col("maybe_in_corpus")).drop(
        "maybe_in_corpus"
    )
    survivors = needs_check.join(
        corpus_digests.select("content_sha256"), "content_sha256", "left_anti"
    )
    return definitely_new.unionByName(survivors)
