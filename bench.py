#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Timing includes full materialization (count of every result) but not
session startup; after a warm-up query primes the JVM/codegen, every
headline query runs $SPARK_GRAFT_BENCH_PASSES times (default 3) and the
per-query minimum is reported — the steady-state number, damping
single-machine scheduler/GC noise and the multi-second host-contention
bursts this box shows (single raw runs vary up to ~50%; the burst lands
on random queries, so the min across passes recovers the true floor).
The headline set spans the operator space: scan+filter, broadcast join
chain, multi-join aggs, window, top-k, range/as-of join, skew-salted
agg, dedup (exact/MinHash/SimHash), exact + ANN similarity, text
profiling, and the full incremental extraction pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "s1_range_scan",
    "j1_catalog_join_chain",
    "a3_pricing_summary",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "skew_salted_agg",
    "w1_latest_version",
    "o5_topk",
    "j5_range_join",
    "j6_asof_join",
    "f_window_tumbling",
    "dedup_exact",
    # r11 (VERDICT r10 task #5): dedup_minhash and ann_lsh — the
    # rows-only float faces — are RETIRED from the headline list in
    # favor of their full-value portable twins (dedup_minhash_portable,
    # ann_lsh_portable), which were benched alongside them for two
    # rounds (~4.5 s of redundant headline time measuring the same
    # banding plans twice).  The floats keep their pytest recall
    # contracts and their driver-oracled recall/portable evidence; the
    # frozen common19/common24 subtotals substitute the twins via
    # COMMON_SUBS below (echoed in the output JSON) — floor continuity
    # is mapped in BASELINE.md "Recorded-baseline amendments (r11)".
    "dedup_simhash",
    "sim_topk_matmul",
    "text_tokens",
    "text_lang",
    "dedup_chunks",
    "pipeline_contamination",
    # r4 additions (not in the r1-comparable common subset; first
    # recorded here so r5+ get comparable numbers)
    "text_token_df",
    "text_bpe_tokens",
    "quality_linear_score",
    # late-r4 addition: Bloom-accelerated incremental dedup end-to-end
    # (sketch build + cogroup probe + residual anti-join at full sf)
    "dedup_bloom_probe",
    # late-r4 pipeline operators (first recorded here for r5+)
    "dedup_passage_spans",
    "pipeline_remove_passages",
    "cdc_apply_incremental",
    "text_bm25",
    "rollup_incremental",
    # final r4 additions (first recorded here for r5+ comparability):
    # incremental-state family tails + the portable-SimHash full-value
    # pipeline (same banding as dedup_simhash, md5 signature kernel)
    "a13_histogram_percentile",
    "profile_documents",
    "text_inverted_index",
    "dedup_simhash_portable",
    # bigram-LM novelty gate (train on even docs + score odd docs,
    # end-to-end — the CCNet-style perplexity-filter stage)
    "quality_lm_novelty",
    # r4 continuation additions (first recorded here for r5+
    # comparability).  Deliberately NOT benched: semdedup_approx (~20s
    # at sf0.1 — this fixture's embeddings put ~60% of rows in dense
    # near-dup clusters, so connected components dominates regardless of
    # threshold; its candidate stage is already benched as ann_lsh) and
    # text_bpe_train (20 argmax rounds = an offline training job, ~80s;
    # driver-oracled at sf0.01 instead).
    "pipeline_shuffle_shard",
    # continuation-session additions (first recorded here for r5+
    # comparability): KMV corpus-overlap sketching and PPS sampling
    "sketch_kmv_overlap",
    "sample_pps",
    # coarse-to-fine ANN: matmul top-150 in the 32-dim projected space,
    # exact full-dim re-rank of the absolute candidate set
    "ann_projected",
    # r5: the sub-quadratic composition (projection -> sign-LSH in the
    # projected space -> full-dim re-rank) the flat coarse pass's scale
    # caveat prescribes — first recorded r5 for r6+ comparability
    "ann_projected_lsh",
    # r5: URL canonicalization + exact URL dedup (codegen string/array
    # algebra + one survivor shuffle) — first recorded r5
    "url_canonical_dedup",
    # r5: Gopher rule bundle — one codegen map-only scan over the
    # corpus (the cheap first gate of the quality family)
    "quality_gopher_rules",
    "sample_temperature",
    "pipeline_pretraining_e2e",
    # time-series analytics family (quality_classifier not benched:
    # L-BFGS training is an offline job like text_bpe_train)
    "ts_resample",
    "ts_cohort_retention",
    "ts_funnel",
    # graph_pagerank is deliberately unbenched: 10 fixed iterations are
    # ~0.6 s of scheduler/stage overhead each at fixture scale (the
    # 574k-edge graph is a single task wave), so the number would
    # measure Spark round-trip latency, not the operator; the 100 TB
    # behavior is governed by the per-round shuffle shape (static sides
    # pre-partitioned, only ranks move) documented in PLANS.md, and
    # correctness by the full-value driver oracle at sf0.01.
    # graph_hits is unbenched for the same reason (iteration count x
    # scheduler latency at fixture scale); emb_kmeans likewise (4
    # collected Lloyd rounds = an offline training job, like
    # text_bpe_train).
    # r6 additions (first recorded r6 for r7+ comparability): DSIR
    # scoring (two hashed-wordcount fits + broadcast scoring join),
    # RRF fusion, and the token-budget prefix-sum selection.
    "pipeline_dsir_scores",
    "retrieval_rrf",
    "pipeline_token_budget",
    # r7 addition (VERDICT r6 task #3): the one-pass int64 covariance
    # tree aggregate — a pure steady-state scan, perfectly benchable.
    "emb_covariance",
    # r8 addition (VERDICT r7 task #4): content-defined chunk dedup —
    # the newest scan-heavy operator (JVM rolling-boundary fold +
    # explode + chunk-sha window), first recorded r8 for r9+
    # comparability.
    "dedup_cdc_chunks",
    # late-r8 addition: chunk-level per-document novelty (same fold +
    # one chunk_sha left join + one groupBy), first recorded r8.
    "dedup_cdc_novelty",
    # late-r8 additions: metadata-filtered vector search (label
    # equi-join candidate generation + exact int8-dot ranking — the
    # whole corpus scores within its label blocks) and the IR-eval
    # harness (truncated-dim quantized run + metrics joins), first
    # recorded r8 for r9+ comparability.
    "ann_filtered",
    # r11 continuation: the filtered-search scale path (label + sign-
    # LSH band candidate generation), added when the sf1.0 full sweep
    # measured the exact face quadratic (74x at 10x data); first
    # recorded r11 for r12+ comparability.
    "ann_filtered_banded",
    "retrieval_eval",
    # r8-continuation additions: binary-quantized Hamming search
    # (coarse pass + exact-rerank deployment face), champion-list
    # pruned lexical serving, and label-propagation communities —
    # first recorded this round for r9+ comparability.
    "ann_hamming",
    "ann_hamming_rerank",
    "retrieval_champion",
    "graph_lpa",
    "pipeline_corpus_diff",
    "f_global_rank",
    # r9 addition: exact-integer sign-LSH top-k (the full-value-oracle
    # twin of ann_lsh) — first recorded r9 for r10+ comparability.
    "ann_lsh_portable",
    # late-r9 addition: deterministic mergeable quantile summary
    # (4-shard build + eager fold over lineitem prices) — first
    # recorded r9 for r10+ comparability.
    "sketch_quantile_mergeable",
    # r10 additions (first recorded r10 for r11+ comparability):
    # the full-value portable-md5 MinHash twin (r9 verdict task #1) and
    # the HTML -> main-text boilerplate extraction kernel (task #6).
    # Note: ann_projected and ann_projected_lsh changed FORMULATION in
    # r10 (float BLAS -> exact-integer portable, now full-value
    # oracled) — their pre-r10 floors measure a different computation;
    # BASELINE.md carries the trail.
    "dedup_minhash_portable",
    "text_html_extract",
    # late-r10 additions: the crawl chain end-to-end (extract -> gate
    # -> URL dedup -> content dedup over synthesized crawl records),
    # RFC 9309 robots filtering, and the exact-integer embedding
    # near-dup (banded integer sign-LSH + division-free cosine
    # predicate).  dedup_incremental is deliberately NOT benched (its
    # corpus-side signature pass dominates at fixture scale and is
    # amortized in deployments via the stored signature table — see
    # the query's comment).
    "pipeline_crawl_e2e",
    "url_robots_filter",
    "emb_neardup_portable",
    # r11 addition (first recorded r11 for r12+ comparability): the
    # Misra-Gries mergeable heavy-hitter fold — restructured this
    # round (grouped shard build + single-reference lazy merge,
    # noop-min 4.20 -> 1.73 at sf0.1); benched from the OPTIMIZED
    # shape, so its recorded floor starts at the new plan.
    "sketch_mg_heavy_hitters",
]

# END-TO-END training-prefix queries (VERDICT r6 task #3: "both
# queries in the headline list"): recorded, but ONE pass only — their
# wall time is dominated by the fixed-iteration Lloyd's collects
# (~10 s flat / ~26 s IVF at sf0.01), so min-of-3 would triple the
# bench's wall clock to re-measure scheduler round-trips.  The
# steady-state flat-vs-IVF comparison the family's value claim rests
# on is the ann_pq_search / ann_ivfpq_search pair (standing index,
# identical query batch, min-of-N like every other entry).
HEADLINE_ONCE = [
    "ann_pq",
    "ann_ivfpq",
]


# FROZEN comparability subsets (VERDICT r4: headline_queries_total_time
# changed meaning as the list grew, making rounds incomparable).  These
# lists never change; their subtotals are emitted under "subtotals" in
# the output JSON every round.  common19 = the intersection of the r1
# and r4 recorded query sets (r1 recorded 12.57 s); common24 adds the
# five entries first recorded in r3.
COMMON_19 = [
    "a3_pricing_summary", "ann_lsh", "dedup_exact", "dedup_minhash",
    "dedup_simhash", "extract_events", "f_window_tumbling",
    "j1_catalog_join_chain", "j5_range_join", "j6_asof_join", "o5_topk",
    "s1_range_scan", "sim_topk_matmul", "skew_salted_agg", "text_lang",
    "text_tokens", "tpch_q3_shape", "tpch_q5_shape", "w1_latest_version",
]
COMMON_24 = COMMON_19 + [
    "bucketed_build", "bucketed_join", "dedup_chunks",
    "extract_lineitem_3level", "pipeline_contamination",
]

# r11 continuity map for the frozen subsets: the retired float faces
# are represented by their portable twins (same banding plan, md5/
# integer kernels, full-value oracled).  The twins ran FASTER than the
# floats in both r10 records (minhash 2.2 vs 2.3, lsh 2.2 vs 3.2
# driver; 1.87 vs 1.62 / 2.24 vs 2.36 committed), so a subtotal drop
# of up to ~1 s at the r11 boundary is substitution, not plan work —
# BASELINE.md carries the amendment.  The substitution is echoed in
# the output JSON ("subs") so every future reader of the subtotal
# sees it.
COMMON_SUBS = {
    "dedup_minhash": "dedup_minhash_portable",
    "ann_lsh": "ann_lsh_portable",
}


# Pinned bench session: round-over-round numbers are only comparable if
# the session is identical, so the parallelism knobs are EXPLICIT here
# rather than inherited from SPARK_GRAFT_CPUS / environment (r1 ran
# 64-task shuffle stages, r2 ran 32 — that drift alone moved several
# queries ~2x round-over-round).  32 = exactly one task wave on the
# 32-core bench box, measured faster than 64 on every headline query
# (a3 0.41s vs 1.06s, ann_lsh 3.3s vs 4.5s).  The exact confs are
# echoed in the output JSON under "session".
BENCH_CONFS = {
    "spark.sql.shuffle.partitions": "32",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import gc

    import __spark_entry__ as entrymod
    from subgraph_extractor_spark import get_spark

    # Quiet-host gate (VERDICT r4: the recorded r4 run started at
    # loadavg 5.71 and every untouched query inflated ~1.5x — run
    # conditions, not regressions, but the recorded number is what the
    # gate reads).  Wait up to $SPARK_GRAFT_LOAD_WAIT seconds (default
    # 120) for the 1-minute loadavg to drop below
    # $SPARK_GRAFT_LOAD_GATE (default 2.0), then proceed either way —
    # a bench that refuses to run is worse than a flagged one — and
    # echo the gate outcome in the output JSON so inflated numbers are
    # attributable.
    # threshold 1.5, not 2.0: three r5 runs recorded common19_r1 =
    # 13.43 / 15.38 / 16.71 s at start loadavg 1.07 / 1.91 / 1.97 —
    # start load near 2 already costs ~20%+ on the frozen subtotal
    # wait budget raised 240 -> 600 (VERDICT r6 task #2: the r6 run
    # squeaked under the gate at 1.43 and carried a ~20% tax; waiting
    # out a contention burst is cheaper than recording through one)
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "1.5"))
    wait_budget = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT", "600"))
    waited = 0.0
    while os.getloadavg()[0] >= gate and waited < wait_budget:
        time.sleep(5)
        waited += 5
    load_start = round(os.getloadavg()[0], 2)
    load_gate = {
        "threshold": gate,
        "waited_sec": waited,
        "met": load_start < gate,
    }
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in BENCH_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass

    qs = entrymod.queries()

    # Scale-point subset runs (VERDICT r10 task #4): a run at a
    # NON-canonical sf (e.g. the derived .scale/sf1.0 tiling) restricts
    # to a frozen subset so the scaling table compares like-for-like.
    # SPARK_GRAFT_BENCH_SUBSET=common19|common24; empty = full list.
    # Floors/weak-gate/local-record stay sf0.1-only regardless.
    subset_name = os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "")
    if subset_name:
        base = {"common19": COMMON_19, "common24": COMMON_24}[subset_name]
        want = {COMMON_SUBS.get(q, q) for q in base}
        headline = [q for q in HEADLINE if q in want]
    else:
        want = None
        headline = HEADLINE

    # warm-up: prime JVM, parquet footer caches, Python workers
    qs["a1_minmax_watermark"](spark, sf_dir).count()
    # pinned per-query warm-up (VERDICT r10 task #2): queries with a
    # DOCUMENTED multi-execution JIT/Arrow convergence curve (the
    # ann_projected kernel measured 29 -> 17 -> 3.2 s over three
    # executions in a cold JVM — similarity.py:1379's in-body note)
    # run once UNTIMED here so the min-of-N passes below all see the
    # converged JIT state.  This pins the steady-state floor the
    # methodology note in BASELINE.md describes; it does not change
    # what min-of-N measures for already-converged queries.
    for _wname in ("ann_projected",):
        if _wname in headline:
            qs[_wname](spark, sf_dir).count()
    gc.collect()

    timings: dict[str, float] = {}
    # multiple full passes over the list (min per query): later passes run
    # against a fully JIT/codegen-warmed JVM, which is the steady-state a
    # long-lived cluster session sees.  Operators scope their own caches
    # (persist -> use -> checkpoint result -> unpersist), so every pass is
    # an honest full recompute, not a half-cached rerun.  Default 3 passes
    # (r1-r3 used 2): this box shows bursty multi-second host-contention
    # spikes that land on random queries in a sequence run, and the min
    # over one more pass recovers the true floor they mask; the pass count
    # is echoed in the output JSON.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for _pass in range(n_passes):
        for name in headline:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            # between-query hygiene, OUTSIDE the timed window: drop the
            # Python refs to the previous result so its localCheckpoint
            # RDD blocks are released promptly (ContextCleaner can only
            # free them once the py4j handles are collected) — without
            # this, checkpoint blocks from ~20 queries x 2 passes pile
            # up in storage memory and evict live operator caches
            # mid-job.
            gc.collect()

    for name in (HEADLINE_ONCE if want is None else []):
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        gc.collect()

    # boundary cleanup before the pipeline entries: drop any persisted
    # blocks and release localCheckpoint RDDs pinned by collected Python
    # refs (measured: extraction runs 1.5 s in a clean session but >10 s
    # right after two uncleaned headline passes)
    spark.catalog.clearCache()
    gc.collect()

    # the reference's core workload: full incremental extraction of a
    # versioned table (plan -> tag -> one shuffled write -> manifest ->
    # watermark), events as the entity table, event_id as block number
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from subgraph_extractor_spark.extract import run_extraction
    from subgraph_extractor_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "_block_number", F.col("event_id")
    )
    hi = ev.agg(F.max("event_id")).first()[0]
    out = tempfile.mkdtemp(prefix="bench_extract_")
    cfg = {
        "name": "bench",
        "version": "1",
        "subgraph": "QmBench",
        "tables": {
            "events": {
                "partition_sizes": [16384, 1024],
                "drop_columns": ["props"],
            }
        },
    }
    # pipeline entries get the same min-of-N treatment as the headline
    # queries (fresh output dir per run — a re-run over the same dir
    # would incremental-short-circuit at the stored watermark)
    _ext_n = n_passes if want is None or "extract_events" in want else 0
    for _run in range(_ext_n):
        out = tempfile.mkdtemp(prefix="bench_extract_")
        t0 = time.time()
        run_extraction(spark, cfg, {"events": ev}, out, 0, int(hi))
        dt = round(time.time() - t0, 3)
        timings["extract_events"] = min(
            timings.get("extract_events", dt), dt
        )
        shutil.rmtree(out, ignore_errors=True)

    # bigger cover: a 3-level size stack over the full lineitem span — more
    # partitions, deeper re-coarsening hierarchy (the 100x-relevant shape)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    ).withColumn("_block_number", F.col("l_orderkey"))
    hi_li = li.agg(F.max("l_orderkey")).first()[0]
    out2 = tempfile.mkdtemp(prefix="bench_extract_li_")
    cfg2 = {
        "name": "bench_li",
        "version": "1",
        "subgraph": "QmBenchLi",
        "tables": {
            "lineitem": {
                "partition_sizes": [131072, 16384, 1024],
            }
        },
    }
    _li_n = n_passes if want is None or "extract_lineitem_3level" in want else 0
    for _run in range(_li_n):
        out2 = tempfile.mkdtemp(prefix="bench_extract_li_")
        t0 = time.time()
        run_extraction(spark, cfg2, {"lineitem": li}, out2, 0, int(hi_li))
        dt = round(time.time() - t0, 3)
        timings["extract_lineitem_3level"] = min(
            timings.get("extract_lineitem_3level", dt), dt
        )
        shutil.rmtree(out2, ignore_errors=True)

    # bucketed co-located join: write both sides bucketed by the join key
    # once, then join with zero Exchange — the recurring-join tool at 100x.
    # Timed halves: build (amortized in production) and the join itself.
    from subgraph_extractor_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    # bucket the curated join projection (keys + measures), as one would
    # for a recurring production join — not every source column
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    )
    from concurrent.futures import ThreadPoolExecutor

    _bk_n = n_passes if want is None or "bucketed_build" in want else 0
    for _run in range(_bk_n):
        spark.sql("DROP TABLE IF EXISTS bench_orders_b")
        spark.sql("DROP TABLE IF EXISTS bench_lineitem_b")
        t0 = time.time()
        # the two table builds are independent — submit both jobs at
        # once and let the scheduler interleave them (same trick a
        # production backfill uses); the build cost is amortized over
        # every subsequent join anyway (see "amortized" in the output)
        with ThreadPoolExecutor(max_workers=2) as pool:
            list(
                pool.map(
                    lambda job: write_bucketed(*job),
                    [
                        (orders, "bench_orders_b", "o_orderkey", 32),
                        (lineitem, "bench_lineitem_b", "o_orderkey", 32),
                    ],
                )
            )
        dt = round(time.time() - t0, 3)
        timings["bucketed_build"] = min(timings.get("bucketed_build", dt), dt)
        t0 = time.time()
        bucketed_join(
            spark, "bench_lineitem_b", "bench_orders_b", "o_orderkey"
        ).count()
        dt = round(time.time() - t0, 3)
        timings["bucketed_join"] = min(timings.get("bucketed_join", dt), dt)
    spark.sql("DROP TABLE IF EXISTS bench_orders_b")
    spark.sql("DROP TABLE IF EXISTS bench_lineitem_b")

    # flat-ADC vs IVF-PQ steady-state search (VERDICT r6 task #3): the
    # ivfpq value claim — probing nprobe/n_cells of the corpus beats a
    # full flat-ADC scan — is about the SERVING half, so both indexes
    # are built and materialized OUTSIDE the timed window (the
    # amortized one-time cost, like bucketed_build) and the timed
    # section is search only, same 200-query batch, same m/k_codes,
    # k=3.  Two probe fractions recorded (VERDICT r7 task #3):
    # nprobe=2 of 4 cells (~50% of codes — the r7 config, kept for
    # comparability) and nprobe=2 of 16 cells (~12.5% of codes — the
    # fraction where the corpus-scan saving should clear the fixed
    # probe-ranking overhead at fixture scale).
    from subgraph_extractor_spark.operators import pq as pq_ops

    # subset scale-point runs skip the PQ serving block (index
    # builds are expensive and none of its entries are in common19/24)
    if want is None:
        emb = load_table(spark, sf_dir, "embeddings")
        flat_books = pq_ops.pq_train_codebooks(
            emb, "embedding", "vec_id", m=8, k=8, iters=2
        )
        flat_codes = pq_ops.pq_encode(
            emb, "embedding", "vec_id", flat_books
        ).persist()
        flat_codes.count()
        ivf_idx = {}
        for n_cells in (4, 16):
            cells, books, codes = pq_ops.ivfpq_build_index(
                emb, "embedding", "vec_id", n_cells=n_cells, m=8, k_codes=8,
                iters_cells=2, iters_pq=2,
            )
            codes = codes.persist()
            codes.count()
            ivf_idx[n_cells] = (cells, books, codes)
        qbatch = emb.orderBy("vec_id").limit(200)
        # one untimed search per index first (same JIT-pinning rationale
        # as the ann_projected warm-up: the first Arrow-kernel execution
        # after the builds carries codegen/allocator warm-up that min-of-N
        # was absorbing only by luck of pass order)
        pq_ops.pq_topk(
            qbatch, flat_codes, "embedding", "vec_id", flat_books, k=3
        ).count()
        _c0, _b0, _codes0 = ivf_idx[4]
        pq_ops.ivfpq_search(
            qbatch, "embedding", "vec_id", _c0, _b0, _codes0,
            nprobe=2, topk=3, n_queries=200, exclude_self=True,
        ).count()
        gc.collect()
        for _run in range(n_passes):
            t0 = time.time()
            pq_ops.pq_topk(
                qbatch, flat_codes, "embedding", "vec_id", flat_books, k=3
            ).count()
            dt = round(time.time() - t0, 3)
            timings["ann_pq_search"] = min(
                timings.get("ann_pq_search", dt), dt
            )
            for n_cells, label in ((4, "ann_ivfpq_search"), (16, "ann_ivfpq_search_c16")):
                cells, books, codes = ivf_idx[n_cells]
                t0 = time.time()
                pq_ops.ivfpq_search(
                    qbatch, "embedding", "vec_id", cells, books, codes,
                    nprobe=2, topk=3, n_queries=200, exclude_self=True,
                ).count()
                dt = round(time.time() - t0, 3)
                timings[label] = min(timings.get(label, dt), dt)
        flat_codes.unpersist()
        for _nc, (_c, _b, codes) in ivf_idx.items():
            codes.unpersist()

    total = round(sum(timings.values()), 3)
    # frozen-subset subtotals: comparable round-over-round regardless of
    # how the full headline list grows (missing entries reported so a
    # subtotal can never silently cover fewer queries)
    subtotals = {}
    for label, subset in (("common19_r1", COMMON_19), ("common24_r3", COMMON_24)):
        mapped = [COMMON_SUBS.get(q, q) for q in subset]
        present = [q for q in mapped if q in timings]
        subtotals[label] = round(sum(timings[q] for q in present), 3)
        if len(present) != len(mapped):
            subtotals[label + "_missing"] = [
                q for q in mapped if q not in timings
            ]
    # Machine-readable per-query floors (VERDICT r6 stretch #7): the
    # best-ever recorded value per query across every BENCH_r*.json in
    # the repo plus this run, with the two formally amended r1 entries
    # (BASELINE.md "Recorded-baseline amendments") overridden to their
    # honest steady-state floors so the cache-flattered r1 numbers
    # never re-enter the weak-flag arithmetic.  "weak_vs_floor" lists
    # every current entry >1.5x its floor — the gate the verdict reads,
    # computed here instead of in BASELINE.md prose.
    amended = {"dedup_minhash": 1.8, "ann_lsh": 2.7}
    # Bests recorded only in prose (BENCH_r05.json was never written):
    # ann_projected 3.25 is the genuine r5 prose record.  The old
    # "ann_projected_lsh": 2.95 entry here was a TRANSCRIPTION ERROR —
    # the r5 prose attributes 2.95 to ann_lsh; ann_projected_lsh had
    # no r5 record at all (see BASELINE.md "Recorded-baseline
    # amendments (r8)" for the full trace).  Its honest floor is the
    # r8 controlled interleaved standalone best, 4.097 s, measured in
    # a quiet pass where the ann_lsh control sat at 1.04x its own
    # floor (2.82 vs 2.70) — structurally consistent at ~1.45x plain
    # LSH for a 30x larger coarse k + projection + full-dim re-rank.
    prose_recorded = {"ann_projected": 3.25, "ann_projected_lsh": 4.09}
    floors: dict[str, float] = {}
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # BENCH_local_r*.json are the full records this script writes per
    # round (VERDICT r7 task #1: the driver's tail capture truncated
    # r7's one-line output, losing the per-query numbers — the local
    # file is the committed source of truth; BENCH_local_r07.json is
    # hand-recovered from the surviving tail's floors table)
    recorded = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json"))
    ) + sorted(glob.glob(os.path.join(here, "BENCH_local_r*.json")))
    for path in recorded:
        try:
            with open(path) as fh:
                rec = json.load(fh)
        except Exception:
            continue
        # driver-written BENCH_r*.json nests the bench line under
        # "parsed"; a locally recorded file is the line itself
        if "queries" not in rec and isinstance(rec.get("parsed"), dict):
            rec = rec["parsed"]
        # only sf0.1 records feed the floor table — a dev run at a
        # smaller scale would poison every floor it touches
        if rec.get("sf") not in (0.1, "0.1"):
            continue
        for qn, t in rec.get("queries", {}).items():
            if isinstance(t, (int, float)):
                floors[qn] = min(floors.get(qn, float(t)), float(t))
    for qn, t in amended.items():
        if qn in floors:
            floors[qn] = max(floors[qn], t)
    for qn, t in prose_recorded.items():
        floors[qn] = min(floors.get(qn, t), t)
    if sf == "0.1":
        for qn, t in timings.items():
            floors[qn] = min(floors.get(qn, t), t)
    # >1.5x-floor gate (ADVICE r7: membership test, not truthiness —
    # a floor that recorded as 0.0 must be REPORTED, not silently
    # excluded from the weak-flag arithmetic forever).
    # Absolute slack alongside the ratio (late r8): sub-second floors
    # trip the pure ratio on ordinary scheduler noise (r8 sixth run:
    # bucketed_join 0.21 vs its 0.139 floor, j6_asof_join 0.32 vs
    # 0.205 — both at/below floor minutes earlier in the same round's
    # fifth run), which buries the signal the gate exists to carry.
    # An entry is weak only if it is BOTH >1.5x its floor AND more
    # than 0.25 s over it — a genuine 2x regression on any >=0.5 s
    # query still trips, while 100 ms of jitter on a 0.15 s floor no
    # longer does.  The raw ratio stays in the value for the reader.
    weak_vs_floor = {
        qn: round(timings[qn] / floors[qn], 2)
        for qn in sorted(timings)
        if sf == "0.1"  # floors are sf0.1 records — other scales don't gate
        and qn in floors
        and floors[qn] > 0
        and timings[qn] > 1.5 * floors[qn]
        and timings[qn] - floors[qn] > 0.25
    }
    floors_zero_or_absent = sorted(
        qn for qn in timings if qn not in floors or floors[qn] <= 0
    )

    session = dict(BENCH_CONFS)
    session["master"] = spark.sparkContext.master
    session["defaultParallelism"] = spark.sparkContext.defaultParallelism
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
    ):
        try:
            session[k] = spark.conf.get(k)
        except Exception:
            pass
    record = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "passes": n_passes,
        # host contention context: this box shows bursty
        # multi-second spikes; a high load average alongside
        # inflated numbers means environment, not regression
        "loadavg_1m_start_end": [load_start, round(os.getloadavg()[0], 2)],
        "load_gate": load_gate,
        "subtotals": subtotals,
        # frozen-subset continuity: retired float faces represented by
        # their portable twins (full record only; BASELINE.md r11 note)
        "subs": COMMON_SUBS,
        "weak_vs_floor": weak_vs_floor,
        "floors_zero_or_absent": floors_zero_or_absent,
        "session": session,
        # one-time costs amortized over every subsequent join in
        # production — reported for transparency, not steady-state
        "amortized": ["bucketed_build"],
    }
    # VERDICT r7 task #1 / r8 task #3: the full record — floors table,
    # session echo, load gate, everything — goes to a committed local
    # file; the stdout line carries ONLY what the driver contract and
    # the weak-flag gate need (metric/value/unit/queries/sf, frozen
    # subtotals, weak_vs_floor, and the pointer to the full file), with
    # per-query values at 2 decimals.  Measured: the r8 stdout line was
    # 2191 bytes and overflowed the driver's ~2 KB tail capture
    # (BENCH_r08.json parsed: null); this slim line is ~1.83 KB for the
    # current 69-query list.  Round number = 1 + the latest
    # driver-written BENCH_r*.json (the driver writes its file at round
    # END, so every run during round N lands on the same name).  Only
    # canonical-scale FULL-LIST runs are recorded: a subset run at
    # sf0.1 (e.g. the scale-sweep's like-for-like common19 pass) would
    # otherwise silently clobber the round's committed full record
    # with a ~20-query partial one.
    floors_file = None
    if sf == "0.1" and want is None:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            for m in [__import__("re").search(r"BENCH_r(\d+)\.json$", p)]
            if m
        ]
        n_round = (max(rounds) if rounds else 0) + 1
        floors_file = f"BENCH_local_r{n_round:02d}.json"
        full = dict(record)
        full["floors"] = {q: floors[q] for q in sorted(floors)}
        with open(os.path.join(here, floors_file), "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
            fh.write("\n")
    # Stdout-line byte budget (r10): the driver's tail capture is 2000
    # bytes and Spark's console-progress \r-fragments used to eat ~120
    # of them (now off at the session level).  At 78 headline entries a
    # 2-decimal queries dict overflowed it (measured 2014 bytes — the
    # BENCH_r08 parsed:null class), so the slim line carries per-query
    # times CEILed to 1 decimal: ceil, not round, so a driver-recorded
    # value can never sit BELOW the true time and poison the floor
    # table (floors take the min across driver + local records; the
    # committed BENCH_local file keeps full precision).  Measured line
    # at 78 entries, weak gate empty: 1931 bytes.  Weak flags add ~22
    # bytes each, so a guard sheds the NON-contract fields in priority
    # order (rec pointer, weak detail, subtotals — all live in the
    # committed local record regardless) before the driver-contract
    # fields (metric/value/unit/queries/sf) could ever be at risk.
    import math

    slim = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": record["unit"],
        "queries": {
            q: math.ceil(t * 10) / 10 for q, t in timings.items()
        },
        "sf": record["sf"],
        "subtotals": subtotals,
        "weak_vs_floor": weak_vs_floor,
        "rec": floors_file,
    }
    line = json.dumps(slim, separators=(",", ":"))
    for shed in ("rec", "weak_vs_floor", "subtotals"):
        if len(line) <= 1950:
            break
        slim.pop(shed, None)
        line = json.dumps(slim, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
