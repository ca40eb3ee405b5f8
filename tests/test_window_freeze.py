"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-7 window (the r6 verdict's task #1): the 14 queries with no
driver row anywhere (all pre-verified green by the r6 review), the two
queries authored this round (ann_ivfpq_recall, dedup_cdc_chunks), then
the 34 stalest green queries (all 31 r1-only rows + 3 of the 4 oldest
r2 rows; j2_anti_join keeps its green r2 row just below the line)."""

import __spark_entry__ as em

WINDOW_50 = [
    "emb_kmeans", "emb_kmeans_balanced",
    "ann_pq", "emb_pq_codes",
    "pipeline_dsir_scores", "pipeline_leakage_split",
    "retrieval_rrf", "pipeline_token_budget",
    "graph_hits", "emb_covariance", "ts_interpolate",
    "ann_ivfpq", "ann_projected", "semdedup_approx",
    "ann_ivfpq_recall",
    "s5_preview_limit", "p4_downscale", "p5_clamp_validity",
    "p6_uint256_roundtrip", "j3_full_outer",
    "a4_cube", "a4_grouping_sets",
    "w2_lag_delta", "w3_running_sum", "w4_analytics",
    "w5_range_frame", "w6_rank_stats",
    "f_date2", "f_string2", "o5_topk",
    "set_ops", "set_ops_all", "j7_state_asof",
    "tpch_q3_shape", "tpch_q5_shape", "skew_salted_agg",
    "a7_pivot", "f_in_subquery", "f_scalar_subquery",
    "a8_stats", "f_width_bucket", "f_json", "f_string",
    "f_math", "f_conditional", "f_cast",
    "s4_distinct_listing", "p7_multi_target_mapping",
    "p8_mapping_compiler", "dedup_cdc_chunks",
]

# rows-only by design (raw pair/assignment dumps whose correctness
# rides on an oracled contract twin that has held green in a prior
# driver round or in this window)
ROWS_ONLY = {"ann_projected", "semdedup_approx"}


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing
