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
    def takedown(self, removal_ids: DataFrame, near_dups: bool = True,
                 threshold: float = 0.5, **kw) -> "CorpusPipeline":
        """Compliance removal: drop listed ids, byte-exact copies, and
        (default) near-duplicate copies.  The fluent step keeps only
        the surviving corpus; call the module-level :func:`takedown`
        directly when the audit trail is needed."""
        kept, _ = takedown(
            self.df, removal_ids, self.id_col, self.text_col,
            near_dups=near_dups, threshold=threshold, **kw,
        )
        return self._next(kept)

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


def takedown(
    df: DataFrame,
    removal_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dups: bool = True,
    threshold: float = 0.5,
    **pair_kw,
) -> tuple[DataFrame, DataFrame]:
    """Compliance removal (GDPR erasure / DMCA takedown / opt-out): drop
    every document on ``removal_ids``, every byte-exact copy of one
    anywhere in the corpus, and (``near_dups=True``) every near-duplicate
    copy — a removed document's content must not survive under a
    different id or behind a trivial edit.

    Returns ``(kept, audit)``: ``kept`` is the corpus minus removals;
    ``audit`` is the evidence trail a compliance process needs —
    one row per dropped id with its strongest ``reason``
    (``listed`` > ``exact_copy`` > ``near_dup``).

    Composition (all existing certified machinery, nothing bespoke):

    - exact copies: 32-byte sha256 digests of the LISTED docs semi-join
      the corpus digests (the ``exact_dedup_incremental`` probe shape —
      the corpus is scanned once, never grouped);
    - near-dups: MinHash-LSH candidates verified by exact n-gram
      Jaccard (``minhash_dedup_pairs``), collapsed to transitive
      clusters (``duplicate_clusters``) — any cluster containing a
      listed id is dropped WHOLE.  Transitive closure is the
      deliberately conservative compliance posture: if a~b and b~c,
      removing a also removes c, because c is a near-copy of content
      adjacent to the removed material (document the policy, not the
      mechanism, to auditors).

    100 TB shape: pair generation is banded/bucketed (never n²), the
    cluster expansion is two semi-joins against the (small) cluster
    table, and the removal itself is ONE left-anti join keyed by id.
    The removal list is tiny by nature and broadcasts.
    """
    from subgraph_extractor_spark.operators.dedup import (
        duplicate_clusters,
        minhash_dedup_pairs,
    )

    ids = (
        removal_ids.select(
            F.col(removal_ids.columns[0]).alias(id_col)
        ).distinct()
    )
    listed = df.join(F.broadcast(ids), id_col, "semi").select(
        F.col(id_col), F.lit(1).alias("_prio")
    )
    listed_digests = (
        df.join(F.broadcast(ids), id_col, "semi")
        .select(F.sha2(F.col(text_col), 256).alias("_d"))
        .distinct()
    )
    exact = (
        df.withColumn("_d", F.sha2(F.col(text_col), 256))
        .join(F.broadcast(listed_digests), "_d", "semi")
        .select(F.col(id_col), F.lit(2).alias("_prio"))
    )
    dropped = listed.unionByName(exact)
    if near_dups:
        pairs = minhash_dedup_pairs(
            df, text_col, id_col, threshold=threshold, **pair_kw
        )
        clusters = duplicate_clusters(pairs)  # (member_id, cluster_id)
        bad = (
            clusters.join(
                F.broadcast(ids.withColumnRenamed(id_col, "member_id")),
                "member_id",
                "semi",
            )
            .select("cluster_id")
            .distinct()
        )
        near = (
            clusters.join(F.broadcast(bad), "cluster_id", "semi")
            .select(
                F.col("member_id").alias(id_col),
                F.lit(3).alias("_prio"),
            )
        )
        dropped = dropped.unionByName(near)
    audit = (
        dropped.groupBy(id_col)
        .agg(F.min("_prio").alias("_prio"))
        .select(
            F.col(id_col),
            F.element_at(
                F.array(
                    F.lit("listed"), F.lit("exact_copy"), F.lit("near_dup")
                ),
                F.col("_prio"),
            ).alias("reason"),
        )
    )
    kept = df.join(audit.select(id_col), id_col, "left_anti")
    return kept, audit


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Document-level diff between two corpus snapshots — the row-level
    complement to the file-level manifest snapshot diff
    (``plans/manifest.py``): which documents were ADDED, REMOVED, or
    CHANGED between a standing training set and a fresh crawl.  The
    routing signal for every incremental face in the repo (changed
    docs re-enter chunk-level novelty scoring; added docs stream into
    the champion/IVF-PQ/signature sinks; removed docs feed takedown).

    Identity is the id; change is the sha256 content digest (byte
    exact — the ``exact_dedup_by_hash`` discipline, so two snapshots
    of a 100 TB corpus diff without comparing text: digests compute
    map-only on each side and ONE full-outer equi-join on the id does
    the rest).  Unchanged documents are not emitted (the diff of a
    re-crawl is small; emitting the corpus would defeat it).

    Output: (id, status in {'added','removed','changed'},
    old_digest, new_digest) — digests NULL on the absent side.
    """
    o = old.select(
        F.col(id_col),
        F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256).alias(
            "old_digest"
        ),
    )
    n = new.select(
        F.col(id_col),
        F.sha2(F.coalesce(F.col(content_col), F.lit("")), 256).alias(
            "new_digest"
        ),
    )
    return (
        o.join(n, id_col, "full_outer")
        .withColumn(
            "status",
            F.when(F.col("old_digest").isNull(), F.lit("added"))
            .when(F.col("new_digest").isNull(), F.lit("removed"))
            .when(
                F.col("old_digest") != F.col("new_digest"), F.lit("changed")
            )
            .otherwise(F.lit(None).cast("string")),
        )
        .filter(F.col("status").isNotNull())
        .select(id_col, "status", "old_digest", "new_digest")
    )
