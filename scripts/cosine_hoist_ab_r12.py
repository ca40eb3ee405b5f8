#!/usr/bin/env python3
"""A/B: per-pair inline cosine vs hoisted per-vector norm/cast
(r12 session 3, guide §1.2 per-task work / §2.2 narrower rows).

A (r11 shape): every scored pair evaluates cosine_similarity inline —
   THREE interpreted HOF folds per pair (zip_with dot + BOTH norms)
   plus per-element double casts on both 4-element float arrays.

B (shipped): the per-VECTOR terms (double-cast of the array, L2 norm)
   are computed once per ROW before the join; the per-pair expression
   is ONE zip_with/fold + one division:
       _sim = dot(_qv, _cv) / (_qn * _cn)

BIT-IDENTICAL by construction: dot() over the pre-cast double arrays
folds exactly the doubles the inline form folded (its inner
cast("double") is a no-op on double input, zip_with pairing and fold
order unchanged); norm() runs the same fold over the same raw column;
the division associates the same (dot) / (norm_l * norm_r) product.
Asserted below on the FULL brute_force_topk output and the FULL
_exact_cosine_pairs pair set at the bench scale.

Affected query paths (9): j4_similarity_topk, the exact baseline of
sim_topk_quantized / ann_lsh_recall / ann_ivf / ann_projected_recall /
ann_projected_lsh_recall (via _ann_recall_contract), and the exact
pair truth of emb_neardup / pipeline_semdedup / pipeline_semdedup_best
(via _exact_cosine_pairs).

Honest cost note: the hoist widens the shuffled/broadcast row
(float->double arrays + one extra double) — 2x vector bytes moved for
3x less per-pair compute.  These are the exact-truth faces (O(N^2)
pair compute, fixture-scale by contract), so compute dominates
transport at every scale they run at.

Timing: same-session interleaved min-of-N, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import Window, functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators import similarity as sim  # noqa: E402


def topk_inline(queries, corpus, vec_col, id_col, k=5):
    """The r11 brute_force_topk body (inline per-pair cosine)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = q.repartition(queries.sparkSession.sparkContext.defaultParallelism)
    c = F.broadcast(c)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_sim", sim.cosine_similarity(F.col("_qv"), F.col("_cv"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pairs_inline(emb, threshold):
    """The r11 _exact_cosine_pairs body."""
    e = emb.select(
        F.col("vec_id").alias("_id"), F.col("embedding").alias("_v")
    )
    par = emb.sparkSession.sparkContext.defaultParallelism
    l, r = e.repartition(par).alias("l"), e.alias("r")
    return (
        l.join(r, F.col("l._id") < F.col("r._id"))
        .withColumn(
            "_cos", sim.cosine_similarity(F.col("l._v"), F.col("r._v"))
        )
        .filter(F.col("_cos") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )


def pairs_hoisted(emb, threshold):
    """The shipped _exact_cosine_pairs body (mirrors __spark_entry__)."""
    e = emb.select(
        F.col("vec_id").alias("_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "_v"
        ),
        sim.norm(F.col("embedding")).alias("_n"),
    )
    par = emb.sparkSession.sparkContext.defaultParallelism
    l, r = e.repartition(par).alias("l"), e.alias("r")
    return (
        l.join(r, F.col("l._id") < F.col("r._id"))
        .withColumn(
            "_cos",
            sim.dot(F.col("l._v"), F.col("r._v"))
            / (F.col("l._n") * F.col("r._n")),
        )
        .filter(F.col("_cos") >= threshold)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n = int(os.environ.get("AB_PASSES", "3"))
    spark = get_spark(
        "cosine_hoist_ab_r12", master=f"local[{cpus}]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    # ---- equivalence: full exact top-k output (the contract baseline)
    ta = topk_inline(emb, emb, "embedding", "vec_id", k=5)
    tb = sim.brute_force_topk(emb, emb, "embedding", "vec_id", k=5)
    assert ta.exceptAll(tb).isEmpty() and tb.exceptAll(ta).isEmpty()
    print(f"brute_force_topk outputs identical ({ta.count()} rows)")

    # ---- equivalence: full exact pair set (the pair-truth baseline)
    pa, pb = pairs_inline(emb, 0.4), pairs_hoisted(emb, 0.4)
    assert pa.exceptAll(pb).isEmpty() and pb.exceptAll(pa).isEmpty()
    print(f"exact cosine pair sets identical ({pa.count()} rows)")

    # ---- interleaved timing, noop sink ----
    variants = {
        "topk_A": lambda: topk_inline(emb, emb, "embedding", "vec_id", 5),
        "topk_B": lambda: sim.brute_force_topk(
            emb, emb, "embedding", "vec_id", 5
        ),
        "pairs_A": lambda: pairs_inline(emb, 0.4),
        "pairs_B": lambda: pairs_hoisted(emb, 0.4),
    }

    def run(tag):
        spark.sparkContext.setJobDescription(f"cosine_hoist_ab:{tag}")
        t0 = time.perf_counter()
        variants[tag]().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for tag in variants:  # warm-up
        run(tag)
    times = {tag: [] for tag in variants}
    for _ in range(n):
        for tag in variants:
            times[tag].append(run(tag))
    for tag, v in times.items():
        print(f"{tag}: min {min(v):.3f}  all {[round(x, 3) for x in v]}")

    if os.environ.get("AB_CONSUMERS"):
        consumers(spark, sf_dir, n)


def consumers(spark, sf_dir, n):
    """Interleaved A/B of FULL consumer queries: the old inline forms
    are monkeypatched into __spark_entry__ for the A passes.  Measured
    r12s3 (min-of-3): emb_neardup 8.94 -> 4.52 (1.98x),
    pipeline_semdedup 7.03 -> 4.57 (1.54x), sim_topk_quantized
    4.31 -> 2.89 (1.49x), ann_projected_recall 6.85 -> 4.48 (1.53x)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    new_bf, new_pairs = (
        entry.sim_ops.brute_force_topk,
        entry._exact_cosine_pairs,
    )

    def old_pairs(spark, sf, threshold):
        return pairs_inline(entry._t(spark, sf, "embeddings"), threshold)

    def set_variant(old):
        entry.sim_ops.brute_force_topk = topk_inline if old else new_bf
        entry._exact_cosine_pairs = old_pairs if old else new_pairs

    names = [
        "emb_neardup",
        "pipeline_semdedup",
        "sim_topk_quantized",
        "ann_projected_recall",
    ]

    def run(name, old):
        set_variant(old)
        spark.sparkContext.setJobDescription(
            f"consumer_ab:{name}:{'A' if old else 'B'}"
        )
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    try:
        for name in names:  # warm-up both variants
            run(name, True)
            run(name, False)
        times = {(name, v): [] for name in names for v in ("A", "B")}
        for _ in range(n):
            for name in names:
                times[(name, "A")].append(run(name, True))
                times[(name, "B")].append(run(name, False))
        for name in names:
            a, b = min(times[(name, "A")]), min(times[(name, "B")])
            print(
                f"{name:24s} inline {a:6.2f} -> hoisted {b:6.2f}"
                f"  ({a / b:.2f}x)"
            )
    finally:
        set_variant(False)


if __name__ == "__main__":
    main()
