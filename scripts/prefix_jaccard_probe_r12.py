#!/usr/bin/env python3
"""Phase probe for dedup_prefix_jaccard (VERDICT r11 task #5): where
do the ~8.5 s (r11 noop, quiet host) actually go — sets build, prefix
derivation, candidate generation, or full-array Jaccard verification —
and how selective is the candidate stage (candidates vs verified
pairs)?  Runs the q_dedup_prefix_jaccard configuration (sf0.1, 1-in-2
doc sample, t=0.2, 3-gram shingles)."""
from __future__ import annotations

import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

from pyspark.sql import Window, functions as F  # noqa: E402

from subgraph_extractor_spark import get_spark  # noqa: E402
from subgraph_extractor_spark.operators.dedup import (  # noqa: E402
    jaccard,
    word_shingles,
)
from subgraph_extractor_spark.sources.readers import load_table  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    threshold, shingle_n = 0.2, 3
    spark = get_spark("pfx_probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    d.count()

    for p in range(2):
        t0 = time.time()
        sets = d.select(
            F.col("doc_id").alias("_id"),
            word_shingles(F.col("text"), shingle_n).alias("_sh"),
        ).filter(F.size("_sh") > 0)
        sets = sets.withColumn("_s", F.size("_sh")).persist()
        n_docs = sets.count()
        t_sets = time.time() - t0

        t0 = time.time()
        ex = sets.select("_id", "_s", F.explode("_sh").alias("_g"))
        freq = ex.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        w = Window.partitionBy("_id").orderBy(
            F.col("_df").asc(), F.col("_g").asc()
        )
        prefix = (
            ex.join(freq, "_g")
            .withColumn("_rn", F.row_number().over(w))
            .filter(
                F.col("_rn")
                <= F.col("_s") - F.ceil(F.col("_s") * F.lit(threshold)) + 1
            )
            .select("_id", "_s", "_g", "_rn")
        ).persist()
        n_prefix = prefix.count()
        t_prefix = time.time() - t0

        t0 = time.time()
        a, b = prefix.alias("a"), prefix.alias("b")
        cands = (
            a.join(
                b,
                on=[
                    F.col("a._g") == F.col("b._g"),
                    F.col("a._id") < F.col("b._id"),
                    F.col("b._s") * F.lit(threshold) <= F.col("a._s"),
                    F.col("a._s") * F.lit(threshold) <= F.col("b._s"),
                ],
            )
            .select(
                F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._s").alias("_sa"), F.col("b._s").alias("_sb"),
                F.col("a._rn").alias("_pa"), F.col("b._rn").alias("_pb"),
            )
        ).persist()
        n_cand_occ = cands.count()
        t_cand = time.time() - t0

        t0 = time.time()
        pairs = cands.select("id_a", "id_b").distinct().persist()
        n_pairs = pairs.count()
        t_distinct = time.time() - t0

        # PPJoin positional-filter selectivity (candidate-only probe):
        # for the FIRST shared prefix gram (min _rn on both sides —
        # the same gram, since prefixes order by one global key),
        # overlap <= 1 + min(|A| - pA, |B| - pB); J >= t needs
        # overlap >= t/(1+t) * (|A| + |B|).
        t0 = time.time()
        pos = cands.groupBy("id_a", "id_b").agg(
            F.min("_pa").alias("_pa"),
            F.min("_pb").alias("_pb"),
            F.max("_sa").alias("_sa"),
            F.max("_sb").alias("_sb"),
        )
        alpha = F.ceil(
            F.lit(threshold) / (1.0 + threshold) * (F.col("_sa") + F.col("_sb"))
        )
        surv = pos.filter(
            1
            + F.least(
                F.col("_sa") - F.col("_pa"), F.col("_sb") - F.col("_pb")
            )
            >= alpha
        )
        n_pos = surv.count()
        t_pos = time.time() - t0

        t0 = time.time()
        sa = sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
        sb = sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
        out = (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a", "id_b",
                jaccard(F.col("_sha"), F.col("_shb")).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        n_out = out.count()
        t_verify = time.time() - t0

        print(
            f"pass{p}: docs {n_docs} prefix_rows {n_prefix} "
            f"cand_occurrences {n_cand_occ} distinct_pairs {n_pairs} "
            f"pos_filter_survivors {n_pos} verified {n_out}",
            flush=True,
        )
        print(
            f"pass{p} timings: sets {t_sets:.2f} prefix {t_prefix:.2f} "
            f"cands {t_cand:.2f} distinct {t_distinct:.2f} "
            f"posfilter {t_pos:.2f} verify {t_verify:.2f}",
            flush=True,
        )
        for df_ in (sets, prefix, cands, pairs):
            df_.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
