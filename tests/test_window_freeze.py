"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list."""

import __spark_entry__ as em

WINDOW_50 = [
    "w7_sessionize", "f_vector", "pipeline_contamination",
    "dedup_clusters", "dedup_clusters_star", "dedup_minhash_recall",
    "dedup_simhash_portable", "dedup_incremental_recall",
    "ann_lsh_recall", "ann_ivf", "text_winnowing", "emb_neardup",
    "dedup_passage_spans", "pipeline_remove_passages",
    "cdc_latest_state", "cdc_apply_incremental", "text_bm25",
    "rollup_incremental", "dedup_bloom_probe", "corpus_overlap",
    "pipeline_dedup_corpus", "quality_linear_score", "text_token_df",
    "text_bpe_tokens", "a12_hll_incremental", "f_vector_quantize",
    "sim_topk_quantized", "f_null_semantics", "j8_asof_nearest",
    "text_heavy_hitters", "a13_histogram_percentile",
    "profile_documents", "text_inverted_index", "text_index_incremental",
    "tpch_q2_shape", "tpch_q4_shape", "tpch_q7_shape", "tpch_q8_shape",
    "tpch_q9_shape", "tpch_q10_shape", "tpch_q11_shape",
    "tpch_q12_shape", "tpch_q13_shape", "tpch_q15_shape",
    "tpch_q16_shape", "tpch_q17_shape", "tpch_q18_shape",
    "tpch_q20_shape", "text_bigram_lm", "quality_lm_novelty",
]


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles]
    assert not missing, missing
