"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-6 window: CORRECTNESS_r05 never landed, so the r5 rotations are
still never-driver-checked — keep 33 of them and add the 17 queries
authored in round 5, covering 50 of the 52 queries with no driver row
(the two left out are rows-only raw twins whose oracled contracts stay
in-window)."""

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
    "dedup_incremental",
    "tpch_q6_shape", "tpch_q14_shape", "tpch_q19_shape",
    "tpch_q21_shape", "tpch_q22_shape",
    "image_dhash_pairs",
    "ann_projected_lsh", "ann_projected_lsh_recall",
    "audio_spectral_pairs", "video_dhash_pairs",
    "url_canonical_dedup", "url_domain_cap",
    "quality_compression_gate",
    "audio_excerpt_containment", "video_frame_containment",
    "quality_gopher_rules", "dedup_simhash_incremental",
    "j9_interval_overlap", "j10_interval_contains",
    "ts_interval_coverage", "ts_ohlc",
    "pipeline_negative_samples", "pipeline_chunk_overlap",
    "graph_triangles", "sim_maxsim_quantized",
]

# rows-only by design (LSH banding / zlib / raw pair dumps whose
# correctness rides on an oracled contract twin)
ROWS_ONLY = {"dedup_incremental", "ann_projected_lsh"}


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing
