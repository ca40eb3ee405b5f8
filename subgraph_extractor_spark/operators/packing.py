"""Sequence packing for LLM training-data pipelines: assign documents to
fixed-token-budget bins ("context windows") so training batches waste as
little padding as possible.

Greedy next-fit in a deterministic document order is the standard
streaming formulation (each doc goes into the current bin if it fits,
else opens a new bin — bounded 2x of optimal, one pass).  That fold is
inherently stateful, so it is NOT expressible as a window function; we
run it as an Arrow-batched ``applyInPandas`` over hash shards:

- shard = hash-bucket of the doc id → uniform, reproducible, any shard
  count; each shard packs independently (bins never span shards, which
  is exactly what a distributed trainer wants — shard == worker).
- within a shard, docs are packed in ascending id order → the output is
  a pure function of the data, independent of partitioning/parallelism.
- bin ids are globalized as (shard, bin_in_shard) pairs.

Scale: one shuffle keyed by shard; per-shard state is a numpy cumsum
pass, memory O(shard rows).  At 100 TB pick n_shards ≈ corpus_tokens /
(executor_mem_budget) — shards are independent so the stage scales
embarrassingly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from .sampling import stable_bucket


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 32,
    truncate_oversize: bool = False,
) -> DataFrame:
    """Assign each document to (shard, bin_id) under ``budget`` tokens.

    Docs longer than the budget get a bin of their own (``oversize`` =
    true) unless ``truncate_oversize``, in which case their counted size
    is capped at the budget (the trainer truncates the text).

    Returns the input columns plus shard, bin_id, bin_tokens_before
    (tokens already in the bin when this doc was placed) and oversize.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    schema = StructType(
        [
            df.schema[id_col],
            df.schema[tokens_col],
            StructField("shard", IntegerType(), False),
            StructField("bin_id", LongType(), False),
            StructField("bin_tokens_before", LongType(), False),
            StructField("oversize", BooleanType(), False),
        ]
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        sizes = pdf[tokens_col].astype("int64").clip(lower=0)
        if truncate_oversize:
            sizes = sizes.clip(upper=budget)
        bins, before = [], []
        cur_bin, cur_tok = 0, 0
        for s in sizes:
            s = int(s)
            if cur_tok > 0 and cur_tok + s > budget:
                cur_bin += 1
                cur_tok = 0
            bins.append(cur_bin)
            before.append(cur_tok)
            cur_tok += s
        out = pdf[[id_col, tokens_col]].copy()
        out["shard"] = pd.Series(
            [int(pdf["_shard"].iloc[0]) if len(pdf) else 0] * len(pdf),
            dtype="int32",
        )
        out["bin_id"] = pd.Series(bins, dtype="int64")
        out["bin_tokens_before"] = pd.Series(before, dtype="int64")
        out["oversize"] = (
            pdf[tokens_col].astype("int64") > budget
        ).reset_index(drop=True)
        return out

    sharded = df.select(id_col, tokens_col).withColumn(
        "_shard",
        F.pmod(stable_bucket(F.col(id_col), salt="pack"), F.lit(n_shards)).cast(
            "int"
        ),
    )
    return sharded.groupBy("_shard").applyInPandas(pack_shard, schema=schema)


def packing_stats(
    packed: DataFrame, tokens_col: str, budget: int
) -> DataFrame:
    """Per-shard packing efficiency — bins used, docs, token utilisation
    (the number a pipeline owner actually watches)."""
    counted = F.least(F.col(tokens_col), F.lit(budget))
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin_id") + 1).alias("n_bins"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(counted).alias("tokens_packed"),
        )
        .withColumn(
            "utilisation",
            F.col("tokens_packed").cast("double")
            / (F.col("n_bins") * F.lit(budget)).cast("double"),
        )
    )
