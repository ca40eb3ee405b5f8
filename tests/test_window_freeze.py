"""Driver-window freeze: the grading driver checks the FIRST 50 entries
of queries() in declaration order, so an accidental dict reorder (e.g.
inserting a new query in the wrong place) would silently swap which
queries get driver rows.  This pins the current window; changing it is
a deliberate act that must update this list.

Round-11 window (the r10 verdict's task #1): the CORRECTNESS r1-r10
staleness ledger shows 55 queries whose last green driver row dates to
r6 or earlier — the five r4-era tpch shapes deliberately left to lead
this round, plus the complete 50-query r6 cohort.  The window takes
the five r4 rows and 44 of the r6 rows in catalog order plus the new
never-driver-checked ann_filtered_banded (the rotation discipline:
a query with no driver row anywhere must sit inside the window); the
SIX deferred r6 rows (ts_moving_avg, ts_ohlc, ts_sliding,
ts_interval_coverage, dataset_fingerprint_groups, ts_resample — five
plain window/agg shapes and the grouped twin of the in-window
dataset_fingerprint, the lowest-risk members of the cohort) lead the
r12 window, after which no query's driver evidence will predate r11's
floor.  Every window row is full-value oracled; the four documented
rows-only raw faces (dedup_minhash, dedup_simhash, ann_lsh,
semdedup_approx) all sit below the line, their evidence riding the
oracled portable/recall twins."""

import __spark_entry__ as em

WINDOW_50 = [
    # r4-era (stalest): the five plain-SQL tpch join/count shapes
    "tpch_q9_shape", "tpch_q10_shape", "tpch_q11_shape",
    "tpch_q12_shape", "tpch_q13_shape",
    # r6 cohort, catalog order, minus the six deferred rows
    "a14_mad_outliers", "ann_projected_lsh", "ann_projected_lsh_recall",
    "ann_projected_recall", "audio_excerpt_containment",
    "audio_spectral_pairs", "dataset_fingerprint", "dedup_containment",
    "dedup_editdist", "dedup_incremental", "dedup_simhash_incremental",
    "graph_pagerank", "graph_pagerank_seeded", "graph_triangles",
    "image_dhash_pairs", "j10_interval_contains", "j9_interval_overlap",
    "pipeline_chunk_overlap", "pipeline_negative_samples",
    "pipeline_pretraining_e2e", "pipeline_semdedup",
    "pipeline_semdedup_best", "pipeline_shard_append",
    "pipeline_shuffle_shard", "quality_classifier",
    "quality_compression_gate", "quality_gopher_rules", "sample_pps",
    "sample_temperature", "sim_maxsim_quantized", "sketch_kmv_distinct",
    "sketch_kmv_overlap", "text_bpe_train", "tpch_q14_shape",
    "tpch_q19_shape", "tpch_q21_shape", "tpch_q22_shape",
    "tpch_q6_shape", "ts_cohort_retention", "ts_funnel",
    "url_canonical_dedup", "url_domain_cap", "video_dhash_pairs",
    "video_frame_containment",
    # never-driver-checked new entry (r11 continuation) — must be in
    # the window per the rotation discipline
    "ann_filtered_banded",
]

# every window row is full-value oracled this round
ROWS_ONLY: set[str] = set()

# deferred to lead the r12 window (last green r6) — pinned here so the
# next rotation starts from a recorded plan, not a re-derivation
DEFERRED_R6 = [
    "ts_moving_avg", "ts_ohlc", "ts_sliding", "ts_interval_coverage",
    "dataset_fingerprint_groups", "ts_resample",
]


def test_driver_window_is_frozen():
    assert list(em.queries().keys())[:50] == WINDOW_50


def test_window_queries_all_oracled():
    oracles = em.oracle_sql()
    missing = [q for q in WINDOW_50 if q not in oracles and q not in ROWS_ONLY]
    assert not missing, missing


def test_repack_is_a_permutation():
    # the window repack reorders the catalog; it must not add or drop
    qs = em.queries()
    assert len(qs) == len(set(qs)) == 219
    assert set(DEFERRED_R6) <= set(qs)
    assert not (set(DEFERRED_R6) & set(WINDOW_50))
