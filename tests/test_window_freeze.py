"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-5 window: the 32 never-driver-checked queries, the new
image_dhash_pairs driver surface, and 17 rotations whose only driver
row dates from round 1."""

import __spark_entry__ as em

WINDOW_50 = [
    "pipeline_semdedup", "pipeline_semdedup_best",
    "pipeline_shuffle_shard", "pipeline_shard_append",
    "text_bpe_train",
    "dataset_fingerprint", "dataset_fingerprint_groups",
    "graph_pagerank", "graph_pagerank_seeded",
    "sketch_kmv_overlap", "sketch_kmv_distinct",
    "sample_pps", "sample_temperature",
    "ts_resample", "ts_cohort_retention", "ts_funnel",
    "ts_sliding", "ts_moving_avg", "a14_mad_outliers",
    "dedup_containment", "dedup_editdist", "quality_classifier",
    "ann_projected_recall", "pipeline_pretraining_e2e",
    "ann_projected", "semdedup_approx", "dedup_incremental",
    "tpch_q6_shape", "tpch_q14_shape", "tpch_q19_shape",
    "tpch_q21_shape", "tpch_q22_shape",
    "image_dhash_pairs",
    "a4_cube", "a4_grouping_sets", "a7_pivot", "a8_stats",
    "f_in_subquery", "f_scalar_subquery", "j3_full_outer",
    "j7_state_asof", "o5_topk", "p4_downscale", "p5_clamp_validity",
    "p6_uint256_roundtrip", "set_ops", "set_ops_all",
    "skew_salted_agg", "ann_projected_lsh", "ann_projected_lsh_recall",
]

# rows-only by design (LSH banding / zlib / raw pair dumps whose
# correctness rides on an oracled contract twin)
ROWS_ONLY = {"ann_projected", "semdedup_approx", "dedup_incremental", "ann_projected_lsh"}


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing
