"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-8 window (the r7 verdict's task #6): every query whose latest
driver evidence predates r4 — 4 of the 5 r2-era rows and all 42
r3-era rows (each pre-verified green by the r7 review's independent
harness or a prior driver round) — plus the four r8 additions
(ann_ivfpq_served, dedup_cdc_novelty, retrieval_eval, ann_filtered),
which are never-driver-checked and so outrank the stale slots; the
two r7-authored queries (ann_ivfpq_recall, dedup_cdc_chunks) earned
green r7 rows and move just below the line to make room;
j2_anti_join (green r2 row, judge-verified r7, 0-row sf0.01 result)
sits just below the line, the same call r7 made.  After this window
lands, the only pre-r4 evidence anywhere is j2's r2 row."""

import __spark_entry__ as em

WINDOW_50 = [
    # r2-era evidence (j2_anti_join sits just below the line, the r7
    # precedent: green r2 driver row + judge-verified in the r7
    # review + 0-row sf0.01 result; both never-checked r8 queries
    # outrank it for the last slots)
    "j3_semi_join", "a4_rollup",
    "a6_distinct_agg", "a5_ngram_stats",
    # r3-era evidence
    "f_window_tumbling", "dedup_exact", "dedup_ngram_jaccard",
    "text_tokens", "text_quality",
    "text_lang", "pipeline_clean_corpus", "pipeline_pack_sequences",
    "sample_stratified",
    "sample_group_topk", "text_pii_redact", "dedup_chunks",
    "text_repetition", "layout_zorder",
    "sample_mixture", "s1_range_scan", "p6_uint256_sum",
    "j1_catalog_join_chain", "j5_range_join",
    "j6_asof_join", "j4_similarity_topk", "sim_topk_matmul",
    "a1_minmax_watermark",
    "a3_pricing_summary", "w1_latest_version", "dedup_minhash",
    "dedup_simhash", "ann_lsh",
    "f_array", "f_collect", "f_udaf", "f_udtf", "f_map", "f_hash",
    "f_bitwise", "a9_percentiles",
    "f_date", "text_fingerprint", "text_clean", "pipeline_stable_split",
    "a10_approx_distinct",
    "a11_approx_percentile",
    # new in r8: the persist -> reload -> search serving loop and
    # the chunk-level novelty signal — both never driver-checked
    "ann_ivfpq_served",
    "dedup_cdc_novelty",
    # new in late r8: IR-evaluation metrics + metadata-filtered vector
    # search — never driver-checked, so they displace the two r7
    # keepers (ann_ivfpq_recall, dedup_cdc_chunks), which move just
    # below the line carrying fresh green r7 rows
    "retrieval_eval",
    "ann_filtered",
]

# rows-only by design (raw pair/bucket dumps whose correctness rides on
# an oracled contract twin: dedup_minhash_recall /
# dedup_simhash_portable / ann_lsh_recall, all green in prior rounds)
ROWS_ONLY = {"dedup_minhash", "dedup_simhash", "ann_lsh"}


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing
