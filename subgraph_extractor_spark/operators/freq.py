"""Count-min sketch — mergeable frequency state for heavy-hitter
tracking over a continually-ingested corpus.

The training-pipeline use: corpus-wide token / n-gram frequencies drive
stopword discovery, boilerplate-phrase thresholds, and vocabulary
pruning.  Exact counts need a full groupBy over all history on every
refresh; a count-min sketch (Cormode & Muthukrishnan 2005) keeps a
fixed-size counter matrix that (a) each new batch folds into without
touching history, (b) merges by elementwise addition, and (c) answers
point queries with one-sided error: est >= true always, and
est <= true + eN/width with probability 1 - e^-depth over the hash
family (here the family is FIXED xxhash64 salts, so a given corpus
always produces the same deterministic estimates).

Shape (same sketch-table discipline as sketches.py / bloom.py):

- build shards the input by key hash, each shard task counts ONLY its
  own keys into a full depth x width int64 matrix (the per-task memory
  is depth*width*8 bytes — 2 MB at 4x65536 — independent of data
  volume), and the shard matrices sum into one sketch row;  keys never
  collide across shards (a key's shard is a function of the key), so
  summing shard matrices equals single-pass construction exactly;
- the sketch is ONE row ``(depth, width, n_total, counters binary)`` —
  parquet-persistable, broadcastable, mergeable by elementwise add;
- estimates join a (small, candidate) key set against the sketch row in
  a single cogroup task — candidates come from batch-local exact top-k
  at scale, never from enumerating the sketch (CM cannot enumerate).

All row hashes are JVM-side ``xxhash64(key, salt)``; numpy does only
the vectorized scatter-add/gather inside Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CMS_SCHEMA = T.StructType(
    [
        T.StructField("depth", T.IntegerType()),
        T.StructField("width", T.LongType()),
        T.StructField("n_total", T.LongType()),
        T.StructField("counters", T.BinaryType()),
    ]
)


def _with_row_hashes(df: DataFrame, key_col: str, depth: int) -> DataFrame:
    """depth independent 64-bit hashes per key, as JVM columns."""
    out = df
    for i in range(depth):
        out = out.withColumn(f"_h{i}", F.xxhash64(F.col(key_col), F.lit(i)))
    return out


def _u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1 << 16,
    num_shards: int = 32,
) -> DataFrame:
    """Build the count-min sketch over ``df[key_col]`` (each row adds
    ``weight_col`` or 1).  Two aggregation levels, both bounded: shard
    tasks see only their rows, the final sum sees num_shards matrix
    rows."""
    hashed = _with_row_hashes(
        df.select(
            F.col(key_col).alias("_k"),
            (F.col(weight_col) if weight_col else F.lit(1)).cast("long").alias("_w"),
        ),
        "_k",
        depth,
    ).withColumn(
        "_shard", F.pmod(F.xxhash64(F.col("_k"), F.lit(97)), F.lit(num_shards))
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.zeros((depth, width), dtype=np.int64)
        w = pdf["_w"].to_numpy(dtype=np.int64)
        for i in range(depth):
            idx = (_u64(pdf[f"_h{i}"]) % np.uint64(width)).astype(np.int64)
            np.add.at(mat[i], idx, w)
        return pd.DataFrame(
            {
                "depth": [depth],
                "width": [width],
                "n_total": [int(w.sum())],
                "counters": [mat.tobytes()],
            }
        )

    shard_mats = hashed.groupBy("_shard").applyInPandas(build, schema=_CMS_SCHEMA)
    return cms_merge(shard_mats)


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge sketch rows (same depth/width) by elementwise addition —
    the incremental refresh and the shard-combine step share this."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = {(int(d), int(w)) for d, w in zip(pdf["depth"], pdf["width"])}
        if len(geoms) != 1:
            raise ValueError("cms_merge: mixed depth/width across inputs")
        depth, width = geoms.pop()
        acc = np.zeros(depth * width, dtype=np.int64)
        for b in pdf["counters"]:
            acc += np.frombuffer(b, dtype=np.int64)
        return pd.DataFrame(
            {
                "depth": [depth],
                "width": [width],
                "n_total": [int(pdf["n_total"].sum())],
                "counters": [acc.tobytes()],
            }
        )

    return (
        sketches.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(merge, schema=_CMS_SCHEMA)
    )


def cms_estimate(
    keys: DataFrame, key_col: str, sketch: DataFrame, est_col: str = "n_est"
) -> DataFrame:
    """Point-estimate each candidate key's total weight: min over the
    depth rows of the key's counter cells.  Candidates are expected to
    be SMALL (batch-local top-k); they meet the one sketch row in a
    single cogroup task, so the counter matrix never replicates
    per-row."""
    # depth is a property of the sketch row; hash with a safe upper
    # bound of salts and use only the first `depth` at estimate time
    max_depth = 8
    hashed = _with_row_hashes(keys, key_col, max_depth).withColumn(
        "_g", F.lit(0)
    )
    out_schema = T.StructType(
        list(keys.schema.fields) + [T.StructField(est_col, T.LongType())]
    )
    key_cols = [f.name for f in keys.schema.fields]

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=key_cols + [est_col])
        out = left[key_cols].copy()
        if right.empty:
            out[est_col] = np.int64(0)
            return out
        depth = int(right["depth"].iloc[0])
        if depth > max_depth:
            raise ValueError(
                f"cms_estimate supports depth <= {max_depth}, got {depth}"
            )
        width = int(right["width"].iloc[0])
        mat = np.frombuffer(right["counters"].iloc[0], dtype=np.int64).reshape(
            depth, width
        )
        est = None
        for i in range(depth):
            idx = (_u64(left[f"_h{i}"]) % np.uint64(width)).astype(np.int64)
            vals = mat[i, idx]
            est = vals if est is None else np.minimum(est, vals)
        out[est_col] = est
        return out

    return (
        hashed.groupBy("_g")
        .cogroup(sketch.withColumn("_g", F.lit(0)).groupBy("_g"))
        .applyInPandas(probe, schema=out_schema)
    )
