"""Fluent corpus-pipeline API: the user-facing composition layer over
the operator modules — a training-data team writes the whole
clean → dedup → gate → split → shuffle-shard path as one chain and gets
exactly the operators the driver queries certify, in the right order.

Every step is lazy (pure DataFrame -> DataFrame); nothing executes until
an action or ``write_shards``.  The chain keeps Catalyst's whole-plan
view, so filters still push down through earlier steps and AQE sees one
plan.  Steps that need parameters take the SAME defaults as the
corresponding driver queries, so a pipeline built here reproduces the
oracled semantics bit for bit.

Example::

    from subgraph_extractor_spark.pipeline import CorpusPipeline

    out = (CorpusPipeline(docs, id_col="doc_id", text_col="text")
           .dedup_exact()
           .quality_gate(min_tokens=40, max_punct_ratio=0.1)
           .split("train")
           .shuffle_shards(num_shards=1024, seed="ep0")
           .df)

Reference parity: the reference's pipeline is fixed (extract ->
transform -> write); this is the composable face the Spark rebuild adds
for the LLM-data mandate (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class CorpusPipeline:
    """Chainable corpus transformations; ``.df`` is the current plan."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.df = df
        self.id_col = id_col
        self.text_col = text_col

    def _next(self, df: DataFrame) -> "CorpusPipeline":
        p = CorpusPipeline(df, self.id_col, self.text_col)
        return p

    # ------------------------------------------------------------ dedup
    def dedup_exact(self) -> "CorpusPipeline":
        """Keep the lowest-id copy of byte-identical texts."""
        from subgraph_extractor_spark.operators.dedup import exact_dedup

        return self._next(exact_dedup(self.df, self.text_col, self.id_col))

    def dedup_minhash(self, threshold: float = 0.5,
                      **kw) -> "CorpusPipeline":
        """Drop near-duplicates: MinHash-LSH candidates verified by
        n-gram Jaccard; the lower id of each verified pair survives."""
        from subgraph_extractor_spark.operators.dedup import (
            dedup_keep_representatives,
            minhash_dedup_pairs,
        )

        pairs = minhash_dedup_pairs(
            self.df, self.text_col, self.id_col, threshold=threshold, **kw
        )
        return self._next(
            dedup_keep_representatives(self.df, pairs, self.id_col)
        )

    def remove_duplicate_passages(self, k: int = 8) -> "CorpusPipeline":
        """Cut substring-level duplicated passages (ExactSubstr-style);
        the corpus-first occurrence survives."""
        from subgraph_extractor_spark.operators.passages import (
            remove_duplicate_passages,
        )

        return self._next(
            remove_duplicate_passages(self.df, self.id_col, self.text_col, k)
        )

    # ------------------------------------------------------------ gates
    def quality_gate(self, min_tokens: int = 40,
                     max_punct_ratio: float = 0.1) -> "CorpusPipeline":
        """The heuristic token/punctuation gate (same rule as the
        pipeline_clean_corpus / pretraining-e2e oracles)."""
        text = F.col(self.text_col)
        n_tokens = F.when(F.trim(text) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(text), r"\s+"))
        )
        n_punct = F.length(text) - F.length(
            F.regexp_replace(text, "[.,;:!?]", "")
        )
        punct_ratio = n_punct / F.greatest(F.length(text), F.lit(1))
        return self._next(
            self.df.filter(
                (n_tokens >= min_tokens) & (punct_ratio <= max_punct_ratio)
            )
        )

    def decontaminate(self, benchmark: DataFrame, n: int = 3,
                      threshold: float = 0.5) -> "CorpusPipeline":
        """Drop documents whose n-gram overlap with a benchmark set
        reaches ``threshold`` (broadcast gram set, one keyed re-agg)."""
        from subgraph_extractor_spark.operators.text_analysis import (
            contamination_report,
        )

        report = contamination_report(
            self.df, benchmark, id_col=self.id_col,
            text_col=self.text_col, n=n, threshold=threshold,
        )
        keep = report.filter(~F.col("flagged")).select(self.id_col)
        return self._next(self.df.join(keep, self.id_col, "semi"))

    # --------------------------------------------------------- sampling
    def split(self, keep: str = "train") -> "CorpusPipeline":
        """Stable md5 train/valid/test assignment; keep one split."""
        from subgraph_extractor_spark.operators.sampling import split_assign

        return self._next(
            self.df.filter(split_assign(F.col(self.id_col)) == keep)
        )

    def temperature_mix(self, stratum_col: str,
                        tau: float = 2.0) -> "CorpusPipeline":
        """mT5/XLM-R temperature rebalancing across a stratum column."""
        from subgraph_extractor_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        out = temperature_mixture_sample(
            self.df, F.col(self.id_col), F.col(stratum_col), tau
        )
        return self._next(out.drop("_stratum", "_rk", "_quota"))

    # ----------------------------------------------------------- export
    def shuffle_shards(self, num_shards: int,
                       seed: str = "epoch0") -> "CorpusPipeline":
        """Deterministic epoch permutation: adds (shard, pos)."""
        from subgraph_extractor_spark.operators.shuffling import (
            deterministic_shuffle,
        )

        return self._next(
            deterministic_shuffle(self.df, self.id_col, num_shards, seed)
        )

    def write_shards(self, path: str, num_shards: int,
                     seed: str = "epoch0") -> None:
        """Terminal action: materialize shard=N/ Parquet directories."""
        from subgraph_extractor_spark.operators.shuffling import (
            write_training_shards,
        )

        write_training_shards(
            self.df, path, self.id_col, num_shards, seed
        )
