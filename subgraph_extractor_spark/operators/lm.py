"""Reference-corpus n-gram language-model scoring (the CCNet-style
perplexity-filter stage of a training-data pipeline, re-expressed
Spark-first).

CCNet / RefinedWeb-class pipelines score crawl documents against a
language model trained on a trusted reference corpus (Wikipedia) and
gate on the score.  The Spark-native decomposition:

- **Training** is wordcount: unigram and bigram counts over the
  SQL-mirror token stream, one map-side-combined shuffle each.  The
  result is mergeable state (counts add), so the model retrains
  incrementally like the other state tables in this repo.
- **Scoring** is one join: explode each scored document's bigram
  occurrences, join them against the count table (Catalyst/AQE
  auto-broadcasts a small reference model; a web-scale model falls back
  to a hash join keyed by the bigram — both are one shuffle of (w1, w2,
  doc) triples), and fold back to one row per document.

Two scoring faces:

- ``score_novelty`` emits INTEGER per-doc evidence (bigram occurrences,
  reference hits) and is therefore bit-exactly oracle-checkable — the
  contamination/novelty gate face.
- ``score_log_prob`` emits the float add-k-smoothed log-probability and
  per-token average (the "perplexity" face).  Cross-engine float ``ln``
  is not bit-portable, so this face is certified by a python-replica
  test instead of a DuckDB hash (the same split as BM25's log-idf
  variant).

100 TB shape: both phases are linear scans + key-hash shuffles with
map-side combine; no window over unbounded groups, no driver-side data,
no UDF anywhere (pure codegen HOFs).  Skewed head bigrams ("of the")
partial-aggregate before the shuffle, so the hot key carries one row
per map task, not one per occurrence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.dedup import tokens_or_empty


def _bigrams(toks: Column) -> Column:
    """array<struct<w1,w2>> of ADJACENT token pairs (occurrences, not
    distinct) — pure codegen, no UDF and no HOF lambda.  Documents with
    fewer than two tokens produce an empty array.

    Formulated as ``arrays_zip(toks[:-1], toks[1:])`` rather than a
    ``transform(sequence(...), i -> struct(element_at...))`` lambda:
    Spark interprets higher-order-function lambdas per ELEMENT, and the
    per-token dispatch cost dominated the whole novelty query at sf0.1
    (~7 s for 266k bigrams vs ~0.6 s for the zip form — identical rows,
    positions included).  ``greatest(size-1, 0)`` keeps the slice
    length legal on 0/1-token docs regardless of branch evaluation."""
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    z = F.arrays_zip(F.slice(toks, 1, n1), F.slice(toks, 2, n1))
    return F.when(
        F.size(toks) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(z.cast("array<struct<w1:string,w2:string>>"))


def unigram_counts(
    reference: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """(word, cnt) over the reference corpus — one map-side-combined
    shuffle keyed by the word.  ``min_count`` prunes the hapax tail
    (which dominates row count but carries no modeling signal)."""
    out = (
        reference.select(
            F.explode(tokens_or_empty(F.col(text_col))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def bigram_counts(
    reference: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """(w1, w2, cnt) adjacent-pair counts over the reference corpus —
    the trained bigram model.  Same wordcount shape as
    ``unigram_counts``; counts from disjoint corpus slices ADD, so the
    model is mergeable/incremental state like the repo's other state
    tables (aggstate / histogram / sketches)."""
    out = (
        reference.select(
            F.explode(_bigrams(tokens_or_empty(F.col(text_col)))).alias("b")
        )
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def score_novelty(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    reference_bigrams: DataFrame,
) -> DataFrame:
    """Per-document novelty evidence vs a reference bigram model —
    INTEGER outputs only, so the whole result is bit-exactly
    cross-engine checkable:

    - ``n_bigrams``: adjacent-pair occurrences in the document,
    - ``n_hits``: occurrences whose (w1, w2) exists in the reference
      model (multiplicity counts — a repeated reference bigram is
      repeated evidence of non-novelty),
    - ``novelty_le_50``: gate boolean, true iff at most half the
      occurrences are novel (documents with no bigrams gate true — no
      evidence of novelty).

    Plan: explode doc bigrams → LEFT JOIN the count table (broadcast
    when small, hash join otherwise; either way the only wide shuffle
    carries (w1, w2, id) triples) → one groupBy(id) fold.  Documents
    survive end-to-end (a doc with zero bigrams still emits a row)."""
    toks = tokens_or_empty(F.col(text_col))
    base = docs.select(F.col(id_col), _bigrams(toks).alias("_bs"))
    exploded = base.select(
        id_col, F.explode_outer("_bs").alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    ref = reference_bigrams.select("w1", "w2", F.lit(1).alias("_hit"))
    joined = exploded.join(ref, ["w1", "w2"], "left")
    per_doc = joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("w1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bigrams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias(
            "n_hits"
        ),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        "n_hits",
        (
            (F.col("n_bigrams") - F.col("n_hits")) * 2 <= F.col("n_bigrams")
        ).alias("novelty_le_50"),
    )


def score_log_prob(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    reference_unigrams: DataFrame,
    reference_bigrams: DataFrame,
    k: float = 1.0,
) -> DataFrame:
    """Add-k-smoothed bigram log-probability per document (the
    perplexity face): for each adjacent pair,

        lp(w2 | w1) = ln( (c(w1, w2) + k) / (c(w1) + k * V) )

    with V = |reference vocabulary| + 1 (one shared OOV slot).  Output:
    (id, n_bigrams, log_prob, avg_log_prob); empty/1-token docs emit
    log_prob 0.0 and NULL average.  Gate on ``avg_log_prob`` (CCNet
    keeps the head/middle of the per-language distribution).

    Floats cross engines: ``ln`` is not bit-portable, so this face is
    python-replica-tested, not DuckDB-hashed (same policy as BM25's
    log-idf variant).  The join/fold plan is identical to
    ``score_novelty``; V is a 1-row aggregate broadcast into the
    scoring scan, never collected."""
    toks = tokens_or_empty(F.col(text_col))
    exploded = docs.select(
        F.col(id_col), F.explode_outer(_bigrams(toks)).alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    vocab = reference_unigrams.agg(
        (F.count(F.lit(1)) + 1).cast("double").alias("_v")
    )
    uni = reference_unigrams.select(
        F.col("word").alias("w1"), F.col("cnt").alias("_c1")
    )
    bi = reference_bigrams.select(
        "w1", "w2", F.col("cnt").alias("_c12")
    )
    scored = (
        exploded.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .join(F.broadcast(vocab))
        .withColumn(
            "_lp",
            F.when(
                F.col("w1").isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.log(
                    (F.coalesce(F.col("_c12"), F.lit(0)).cast("double") + k)
                    / (
                        F.coalesce(F.col("_c1"), F.lit(0)).cast("double")
                        + k * F.col("_v")
                    )
                )
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("_lp").cast("bigint").alias("n_bigrams"),
        F.coalesce(F.sum("_lp"), F.lit(0.0)).alias("log_prob"),
        F.avg("_lp").alias("avg_log_prob"),
    )
