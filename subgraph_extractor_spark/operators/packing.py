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


def chunk_documents_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Token-window chunking with overlap — the RAG/embedding-prep
    complement to :func:`pack_sequences` (packing concatenates short
    docs up to a budget; this SPLITS long docs into overlapping
    windows so no retrieval-relevant span straddles a hard boundary).

    Whitespace tokens; chunk ``i`` covers token positions
    ``[i·stride, i·stride + chunk_tokens)`` with ``stride =
    chunk_tokens - overlap``; the last chunk is the final partial
    window, and a chunk fully contained in its predecessor is not
    emitted (tail-dedup: ceil((n - overlap) / stride) chunks for n >
    chunk_tokens, exactly one for n <= chunk_tokens).  Empty/blank
    docs produce nothing.  Pure codegen (split + sequence + slice +
    array_join — no UDF, no shuffle: chunking is map-only; the chunk
    id (doc, idx) is stable for downstream dedup/retrieval joins).
    Output: (<id_col>, chunk_idx, chunk_text, n_tokens)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
        F.size(toks)
    )
    # last chunk start: the largest multiple of stride covering the tail
    # without emitting a window fully inside its predecessor
    last_start = F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("long")
        * stride,
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("_toks"),
            n.alias("_n"),
            F.explode(
                F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride))
            ).alias("_start"),
        )
        .filter(F.col("_n") > 0)
        .select(
            id_col,
            (F.col("_start") / stride).cast("long").alias("chunk_idx"),
            F.array_join(
                F.slice(
                    "_toks", F.col("_start").cast("int") + 1, chunk_tokens
                ),
                " ",
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("_n") - F.col("_start"),
            ).alias("n_tokens"),
        )
    )
