"""SemDeDup-style semantic deduplication over an embedding column.

Method (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540): documents whose
embeddings are near-identical in cosine space are semantic duplicates
even when their text differs; keep ONE representative per group of
mutually-near embeddings and drop the rest.

Spark-first composition of already-verified pieces — no new shuffles
beyond what each stage needs:

  pairs      any (id_a, id_b) near-duplicate pair DataFrame.  The scale
             path is ``dedup.embedding_neardup_pairs`` (sign-LSH bucket
             candidates + exact cogrouped-BLAS verification, recall
             contract-checked by the ``emb_neardup`` driver query); an
             exact all-pairs baseline is used by the oracled queries so
             the end-to-end result is bit-checkable.
  clusters   connected components, ``dedup.duplicate_clusters_star``
             (large-star/small-star, O(log n) rounds — the web-scale
             path) by default.
  survivor   one aggregate per cluster: lowest id, or the member with
             the best external score (``max_by`` with a deterministic
             lowest-id tie-break), then one left-anti join against the
             loser set.  Cluster count is far below row count, so the
             aggregate output is small; the anti-join keys on the id.

Reference parity: the reference engine (cli.py, 487 lines) has no
semantic dedup — this module belongs to the training-data-pipeline
extension surface of the Spark rebuild (SURVEY §2.12).

100 TB notes: every stage is keyed-shuffle only (pairs by id, CC rounds
by id, survivor agg by cluster_id); nothing is collected to the driver
and no stage holds more than one cluster's ids in a task.  The pair
stage dominates cost and inherits the LSH path's bucket cap.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from subgraph_extractor_spark.operators.dedup import duplicate_clusters_star


def cluster_representatives(
    clusters: DataFrame,
    score: DataFrame | None = None,
    id_col: str = "member_id",
    score_col: str | None = None,
) -> DataFrame:
    """One representative id per cluster from a (member_id, cluster_id)
    assignment.  Default rule: lowest member id.  With ``score`` (a
    DataFrame carrying ``id_col`` + ``score_col``): highest score wins,
    ties broken toward the lowest id — ``max_by`` over a (score, -id)
    struct makes the rule a single deterministic aggregate.

    Returns (cluster_id, rep_id).
    """
    if score is None or score_col is None:
        return clusters.groupBy("cluster_id").agg(
            F.min(id_col).alias("rep_id")
        )
    scored = clusters.join(
        score.select(F.col(id_col), F.col(score_col).alias("_score")),
        id_col,
    )
    # two-stage argmax: max score per cluster, then the LOWEST id among
    # members achieving it.  (A single max_by over struct(score, -id)
    # would be one aggregate, but negation only exists for numeric ids —
    # string/UUID ids would silently break the documented tie rule.)
    best = scored.groupBy("cluster_id").agg(F.max("_score").alias("_best"))
    return (
        scored.join(best, "cluster_id")
        # null-safe: a cluster whose every score is NULL falls back to
        # the lowest-id rule instead of losing its representative
        .filter(F.col("_score").eqNullSafe(F.col("_best")))
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("rep_id"))
    )


def semantic_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str | None = None,
    clusters_fn: Callable[[DataFrame], DataFrame] = duplicate_clusters_star,
) -> DataFrame:
    """Drop all but one representative of every semantic-duplicate
    cluster; rows that appear in no pair survive untouched.

    ``df`` is the full corpus (must carry ``id_col``; carries
    ``score_col`` too when a best-member rule is wanted), ``pairs`` the
    (id_a, id_b) near-dup pair set.  Returns the surviving subset of
    ``df`` with its original columns.

    The survivor rule is applied to the CLUSTER, not the pair list, so
    transitive chains (a~b, b~c) keep exactly one member even when
    (a, c) was never a pair.
    """
    clusters = clusters_fn(pairs)
    score = (
        df.select(F.col(id_col).alias("member_id"), F.col(score_col))
        if score_col
        else None
    )
    reps = cluster_representatives(
        clusters, score=score, id_col="member_id", score_col=score_col
    )
    losers = (
        clusters.join(
            reps.select("cluster_id", "rep_id"), "cluster_id"
        )
        .filter(F.col("member_id") != F.col("rep_id"))
        .select(F.col("member_id").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")
