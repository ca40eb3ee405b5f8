"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-9 window (the r8 verdict's task #6 rotation): the ten stalest
driver rows return — a4_rollup, a6_distinct_agg, j2_anti_join,
j3_semi_join (r2-era), a10_approx_distinct, a11_approx_percentile,
a1_minmax_watermark, a9_percentiles, f_udaf (r3), a12_hll_incremental
(r4) — plus the never-driver-checked ann_lsh_portable (r8 verdict task
#7: the full-value exact-integer LSH twin), which takes the rows-only
ann_lsh's slot.  Displaced below the line with doubly-fresh evidence
(green r3-era AND r8 rows): a5_ngram_stats, f_window_tumbling,
dedup_exact, dedup_ngram_jaccard, text_tokens, text_quality,
pipeline_clean_corpus, pipeline_pack_sequences, sample_stratified,
sample_group_topk, and ann_lsh itself.  text_lang stays in-window
deliberately: its scorer was restructured this round (task #1 codegen
fix) and needs a fresh driver row.  Late-r9 revision: the new
sketch_quantile_mergeable (deterministic mergeable quantile summary,
never driver-checked) takes text_pii_redact's slot (green r3-era AND
r8 rows — the freshest class, moved just below the line)."""

import __spark_entry__ as em

WINDOW_50 = [
    # r8-green rows kept one more round (text_lang: the codegen fix
    # needs fresh driver evidence; the rest are the r8 window's tail)
    "text_lang",
    # new in r9: deterministic mergeable quantile summary (takes the
    # text_pii_redact slot — green r3-era + r8 rows, moved below)
    "sketch_quantile_mergeable",
    # late r9: its grouped face (takes the dedup_chunks slot — green
    # r3-era + r8 rows, moved below)
    "sketch_quantile_grouped",
    "text_repetition", "layout_zorder",
    "sample_mixture", "s1_range_scan", "p6_uint256_sum",
    "j1_catalog_join_chain", "j5_range_join",
    "j6_asof_join", "j4_similarity_topk", "sim_topk_matmul",
    "a3_pricing_summary", "w1_latest_version", "dedup_minhash",
    "dedup_simhash",
    # new in r9: exact-integer sign-LSH, full-value DuckDB oracle
    "ann_lsh_portable",
    "f_array", "f_collect", "f_udtf", "f_map", "f_hash", "f_bitwise",
    "f_date", "text_fingerprint", "text_clean", "pipeline_stable_split",
    "ann_ivfpq_served", "dedup_cdc_novelty", "retrieval_eval",
    "ann_filtered", "ann_hamming", "ann_hamming_rerank",
    "retrieval_champion", "graph_lpa", "dedup_prefix_jaccard",
    "sketch_mg_heavy_hitters", "pipeline_corpus_diff", "f_global_rank",
    # the task-#6 stale-evidence rotation block
    "a4_rollup", "a6_distinct_agg", "j2_anti_join", "j3_semi_join",
    "a10_approx_distinct", "a11_approx_percentile", "a1_minmax_watermark",
    "a9_percentiles", "f_udaf", "a12_hll_incremental",
]

# rows-only by design (raw pair/bucket dumps whose correctness rides on
# an oracled contract twin: dedup_minhash_recall /
# dedup_simhash_portable, both green in prior rounds).  ann_lsh left
# the window this round — its oracled evidence rides ann_lsh_recall
# AND the new full-value ann_lsh_portable.
ROWS_ONLY = {"dedup_minhash", "dedup_simhash"}


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing
