"""Mergeable-sketch operators: incremental distinct counting over a
continually-ingested corpus via Apache DataSketches HLL (the
`hll_sketch_agg` / `hll_union_agg` surface Spark 4 exposes natively).

The 100 TB pattern this enables: distinct-count state is a PER-GROUP
BINARY SKETCH table (kilobytes per group), maintained incrementally —
each new batch is sketched alone (touching only the new data) and
union-merged into the standing sketch table.  Answering "distinct users
per event type over all time" then reads the sketch table, never the
history.  Contrast with `approx_count_distinct`, which answers one query
but keeps no mergeable state, and with exact distinct, which reshuffles
the full history on every refresh.

All heavy lifting is JVM-side Datasketches (no Python in the path); the
estimate error model is the HLL standard error for the chosen lgConfigK
(default 12 -> ~1.6% RSE; the contracts below bound at 5%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of distinct ``value_col`` values — the unit
    of incremental state.  One shuffle on the group key; sketch size is
    O(2^lg_config_k) bytes per group regardless of input volume."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_config_k)).alias(
            "_sketch"
        )
    )


def merge_sketch_tables(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union-merge any number of per-group sketch tables (stacked with
    unionByName) back to one sketch per group.  This is the incremental
    refresh: old-state ∪ new-batch sketches, shuffling only sketch rows
    (kilobytes per group), never the underlying history."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("_sketch")).alias("_sketch")
    )


def estimate_distinct(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Read the sketch table: per-group approximate distinct count."""
    return sketches.select(
        *group_cols,
        F.hll_sketch_estimate(F.col("_sketch")).alias("n_distinct_est"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketches: engine-portable corpus-overlap
# estimation.
#
# HLL above answers "how many distinct", and inclusion-exclusion over
# HLL unions gives an overlap estimate (dedup.corpus_overlap_estimate)
# — but the sketch bytes are DataSketches-internal (only Spark reads
# them), and the I-E estimate needs an error-bound contract because the
# subtraction amplifies the relative error.  The KMV sketch is the
# portable complement: the k smallest 60-bit md5 hashes of the distinct
# values.
# Every operation on it is integer comparison, so the sketch itself,
# its merge, and the derived Jaccard estimate are bit-identical across
# engines (DuckDB replays them exactly) — the same portability contract
# as dataset fingerprints (fingerprint.py), applied to set similarity.
#
# The 100 TB pattern: keep one standing KMV row per corpus / snapshot /
# partition (k longs ≈ 2 KB).  "How much does the new crawl overlap the
# training set?" then compares two sketch rows — |S_k(A∪B) ∩ A_k ∩ B_k|
# / k estimates Jaccard (Beyer et al., SIGMOD'07) — without rescanning
# either corpus.  This is corpus-level contamination screening; the
# per-document gate (text_analysis.contamination) answers the row-level
# question.
#
# Reference parity: the reference engine has no sketch surface at all
# (SURVEY §2 A-rows); this extends the training-data-pipeline family.
# ---------------------------------------------------------------------------

_KMV_SPACE = 1 << 60  # hash domain: 15 hex digits of md5


def kmv_hash(value) -> "F.Column":
    """60-bit engine-portable hash: first 15 hex digits of md5 of the
    value's string form.  DuckDB replay:
    ``CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT)``."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 15), 16, 10
    ).cast("long")


_KMV_SALTS = 256


def _k_smallest(hashed: DataFrame, k: int, gcols: list[str]) -> DataFrame:
    """k smallest distinct ``_h`` per group, as the sorted ``_kmv``
    array — two-level selection so no single task ever sorts a group's
    full distinct-hash set: level 1 partitions each group into 256
    salt buckets (``_h % 256``) and rank-prunes each to its k smallest
    IN PARALLEL (every member of the true global k smallest lives in
    some bucket, so per-bucket k-min provably loses nothing); level 2
    rank-prunes the ≤ 256·k survivors per group — bounded work
    regardless of corpus size."""
    w1 = Window.partitionBy(*gcols, "_salt").orderBy("_h")
    w2 = Window.partitionBy(*gcols).orderBy("_h") if gcols else (
        Window.partitionBy(F.lit(1)).orderBy("_h")
    )
    return (
        hashed.withColumn("_salt", F.col("_h") % _KMV_SALTS)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .groupBy(*gcols)
        .agg(F.array_sort(F.collect_list("_h")).alias("_kmv"))
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group KMV sketch: ascending array of the k smallest distinct
    60-bit hashes of ``value_col`` (NULLs excluded).  Groups with fewer
    than k distinct values keep them all (the estimate is then exact).

    Scale shape: map-side partial DISTINCT on (group, hash) feeds one
    shuffle; the k-smallest selection is the two-level `_k_smallest`
    (per-salt-bucket prune in parallel, then the bounded survivor set)
    so even the UNGROUPED corpus-wide sketch never sorts all distinct
    hashes in one task.  For very-high-cardinality inputs
    `kmv_sketch_pruned` additionally discards ~everything map-side
    BEFORE the shuffle using a standing distinct-count estimate.
    """
    gcols = list(group_cols or [])
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*gcols, kmv_hash(F.col(value_col)).alias("_h"))
        .distinct()
    )
    return _k_smallest(hashed, k, gcols)


def kmv_sketch_pruned(
    df: DataFrame,
    value_col: str,
    k: int,
    distinct_estimate: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """`kmv_sketch` with the map-side threshold prune applied: only
    hashes below ``8·k/distinct_estimate`` of the space survive to the
    shuffle.  The true k-th smallest hash sits near ``k/n_true`` of the
    space, so the prune keeps ≥ the true k smallest whenever
    ``distinct_estimate ≤ 8·n_true`` — i.e. identical output unless the
    estimate is a gross (>8x) OVER-estimate, which tightens the
    threshold past real members.  Under-estimates only loosen it (more
    survivors, same result).  Use the previous refresh's estimate,
    which drifts slowly in the incremental pattern."""
    thresh = min(
        _KMV_SPACE - 1,
        (8 * k * _KMV_SPACE) // max(1, distinct_estimate),
    )
    gcols = list(group_cols or [])
    pruned = (
        df.filter(F.col(value_col).isNotNull())
        .select(*gcols, kmv_hash(F.col(value_col)).alias("_h"))
        .filter(F.col("_h") <= F.lit(thresh))
        .distinct()
    )
    return _k_smallest(pruned, k, gcols)


def kmv_merge(sketches: DataFrame, k: int, group_cols: list[str] | None = None) -> DataFrame:
    """Union-merge stacked sketch tables back to one sketch per group:
    k smallest of the union of the arrays.  Incremental refresh shuffles
    only sketch rows — same state discipline as `merge_sketch_tables`."""
    gcols = list(group_cols or [])
    exploded = sketches.select(*gcols, F.explode("_kmv").alias("_h")).distinct()
    return _k_smallest(exploded, k, gcols)


def kmv_distinct_estimate(sketches: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate per sketch row: a full sketch (|S| = k)
    estimates (k-1)·H / h_(k) (uniform order statistics); a short
    sketch saw every distinct value, so its size IS the count.  Both
    branches are single IEEE ops from exactly-converted integers —
    bit-portable."""
    size = F.size("_kmv")
    kth = F.element_at("_kmv", k).cast("double")
    est = F.when(
        size >= k,
        F.lit(float(k - 1) * float(_KMV_SPACE)) / kth,
    ).otherwise(size.cast("double"))
    return sketches.withColumn("n_distinct_est", est)


def kmv_jaccard(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    k: int,
    join_cols: list[str] | None = None,
) -> DataFrame:
    """Jaccard estimate between paired sketch rows (cross-corpus overlap
    screening).  With ``join_cols`` the two tables pair per group key;
    without, both must be single-row (global corpus sketches).

    Estimator (Beyer et al., SIGMOD'07): S = k smallest of A∪B (itself
    the KMV sketch of the union), J ≈ |S ∩ A ∩ B| / |S|.  Short-sketch
    degenerate case (|A∪B| < k): S is the whole union, the estimate is
    EXACT.  Emits the integer evidence (`overlap_hits`, `union_k`) and
    the one-division double `jaccard_est` — all bit-portable.

    Empty-sketch convention (ADVICE r4): a global groupBy over an EMPTY
    corpus still emits one sketch row with an empty array, and two such
    rows would pair to union_k = 0 and a NULL jaccard_est that silently
    drops out of downstream `jaccard_est >= t` filters.  Empty sketch
    rows are therefore filtered BEFORE pairing — an empty corpus has no
    overlap to estimate, and the resulting no-row output is the same
    semantics one-sided groups already get from the inner join."""
    gcols = list(join_cols or [])
    nonempty = F.size("_kmv") > 0
    a = sketch_a.filter(nonempty).select(
        *gcols, F.col("_kmv").alias("_kmv_a")
    )
    b = sketch_b.filter(nonempty).select(
        *gcols, F.col("_kmv").alias("_kmv_b")
    )
    if gcols:
        paired = a.join(b, gcols, "inner")
    else:
        paired = a.crossJoin(b)  # 1x1: two single-row sketch tables
    s_union = F.slice(
        F.array_sort(F.array_union("_kmv_a", "_kmv_b")), 1, k
    )
    inter = F.array_intersect("_kmv_a", "_kmv_b")
    hits = F.size(F.array_intersect(s_union, inter))
    union_k = F.size(s_union)
    return paired.select(
        *gcols,
        hits.alias("overlap_hits"),
        union_k.alias("union_k"),
        (hits.cast("double") / union_k.cast("double")).alias(
            "jaccard_est"
        ),
    )
