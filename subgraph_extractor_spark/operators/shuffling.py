"""Deterministic global shuffle + shard assignment for training-data
export.

A training pipeline needs the corpus in a reproducible pseudo-random
order, split into a fixed number of shard files, such that (a) the
order is independent of input partitioning, cluster size, and engine,
(b) re-runs produce byte-identical shards, and (c) a new epoch is a new
permutation derivable from a seed — no RNG state, no global sort of
payload bytes.

Construction: key every row by ``md5(seed || ':' || id)``.  The shard
is the first 48 bits of the digest mod ``num_shards``; the position
within the shard is the rank of the full digest hex string (ties broken
by id, for the theoretical 2^-128 collision).  Both are pure functions
of (seed, id) — engine-independent (md5 is bit-identical everywhere)
and oracle-checkable in ANSI SQL.

100 TB notes: the only shuffle is the repartition on ``shard``; the
within-shard rank is a per-shard window, so shard count is the
parallelism/memory knob — size shards to the training file size you
want (e.g. 100k shards of ~1 GB), never fewer than cluster cores.  The
global order (shard, pos) interleaves the corpus uniformly, so
sequential readers of shard files see an unbiased sample stream.

Reference parity: the reference engine has no shuffle/export-for-
training surface; this is part of the LLM-pipeline extension mandated
for the Spark rebuild (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def shuffle_key(id_col, seed: str):
    """md5 hex digest of ``seed || ':' || id`` — the portable shuffle
    sort key (string comparison over hex is digest-order comparison)."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    seed: str = "epoch0",
) -> DataFrame:
    """Assign every row a ``shard`` (0..num_shards-1) and a dense 1-based
    ``pos`` within its shard, both deterministic functions of
    (seed, id).  Returns the input columns plus (shard, pos); read the
    corpus in (shard, pos) order — or shard files concatenated — for the
    epoch's permutation.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    hx = shuffle_key(F.col(id_col), seed)
    # 48 hash bits (12 hex digits): supports shard counts far beyond the
    # 100k-shard scale with mod bias <= 2^-48 per shard (4 digits would
    # cap distinct shards at 65536 and give non-divisor counts 2x skew)
    shard = (
        F.conv(F.substring(hx, 1, 12), 16, 10).cast("bigint") % num_shards
    ).cast("int")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_hx", id_col)
    return (
        df.withColumn("_hx", hx)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .drop("_hx")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    seed: str = "epoch0",
) -> None:
    """Materialize the shuffled corpus as one Parquet directory per
    shard (``shard=N/``), rows stored in shuffle order.  One shuffle:
    repartition on the shard id co-locates each shard in one task, the
    within-partition sort orders it, dynamic partitionBy writes it —
    file content is byte-reproducible for a given (seed, corpus).
    """
    out = deterministic_shuffle(df, id_col, num_shards, seed)
    (
        out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def shard_counts(sharded: DataFrame) -> DataFrame:
    """(shard, n_rows) of an existing sharded corpus — the standing
    state `append_to_shards` continues from (tiny aggregate; at scale
    read it from the shard manifest instead of scanning data)."""
    return sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))


def append_to_shards(
    new_df: DataFrame,
    counts: DataFrame,
    id_col: str,
    num_shards: int,
    seed: str = "epoch0",
) -> DataFrame:
    """Continual ingestion for the shuffled-shard layout: route a NEW
    batch to its shards with the same (seed, id) hash rule and assign
    positions CONTINUING after each shard's existing row count — standing
    rows never move (training jobs can resume mid-shard), the batch
    lands deterministically, and re-running the same batch yields the
    same placement.

    ``counts`` is (shard, n_rows) from :func:`shard_counts` (or the
    shard manifest).  Shards absent from ``counts`` start at position 1.
    Note the result is position-stable, NOT equal to a from-scratch
    shuffle of the union — for a freshly permuted epoch, re-shuffle with
    a new seed instead.

    Plan: the batch shuffles once (per-shard rank window); counts is a
    broadcast-sized join.  Returns the new rows with (shard, pos).
    """
    placed = deterministic_shuffle(new_df, id_col, num_shards, seed)
    base = counts.select(
        "shard", F.col("n_rows").cast("long").alias("_base")
    )
    return (
        placed.join(F.broadcast(base), "shard", "left")
        # pos stays LONG: a standing shard past 2^31 rows must not wrap
        # an int cast into negative/duplicate positions
        .withColumn(
            "pos", (F.col("pos") + F.coalesce("_base", F.lit(0))).cast("long")
        )
        .drop("_base")
    )


def negative_samples(
    sharded: DataFrame,
    id_col: str,
    k: int,
    num_shards: int,
    seed: str = "neg0",
) -> DataFrame:
    """``k`` deterministic pseudo-random NEGATIVE partners per anchor —
    the contrastive-training sampler (in-batch negatives are biased by
    the batch construction; this draws corpus-wide), built on the
    (shard, pos) coordinate system of :func:`deterministic_shuffle` /
    :func:`append_to_shards`.

    Slot ``j`` of anchor ``a`` addresses the corpus coordinate
    ``shard = h1(seed,a,j) mod num_shards``,
    ``pos = h2(seed,a,j) mod n_rows(shard) + 1`` with h1/h2 disjoint
    48-bit slices of one md5 — pure functions of (seed, anchor, j), so
    draws are engine-portable, reproducible, and a new epoch is just a
    new seed.  No global window and no per-row RNG state: ONE equi-join
    on (shard, pos) against the standing sharded corpus, with the tiny
    (shard, n_rows) table broadcast.

    Semantics (replayed exactly by the SQL oracle): with-replacement —
    two slots may draw the same negative; a slot that draws the anchor
    itself is DROPPED (never a self-pair; ~1/N per slot).  Uniformity
    caveat: a row's probability is 1/(num_shards · n_rows(its shard)),
    so rows in below-average shards are marginally likelier — with md5
    sharding shard sizes concentrate tightly and the bias is
    negligible; it is zero when shard sizes are equal.

    Output: (anchor_id, j, neg_id)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = shard_counts(sharded)
    cand = sharded.select(
        F.col(id_col).alias("anchor_id"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    )
    hx = F.md5(
        F.concat(
            F.lit(seed), F.lit(":"),
            F.col("anchor_id").cast("string"),
            F.lit(":"), F.col("j").cast("string"),
        )
    )
    addr = cand.select(
        "anchor_id",
        F.col("j").cast("long").alias("j"),
        (
            F.conv(F.substring(hx, 1, 12), 16, 10).cast("bigint")
            % num_shards
        ).cast("int").alias("shard"),
        F.conv(F.substring(hx, 13, 12), 16, 10).cast("bigint").alias("_h2"),
    )
    placed = addr.join(F.broadcast(counts), "shard").select(
        "anchor_id", "j", "shard",
        (F.col("_h2") % F.col("n_rows") + 1).cast("long").alias("pos"),
    )
    corpus = sharded.select(
        "shard", F.col("pos").cast("long").alias("pos"),
        F.col(id_col).alias("neg_id"),
    )
    return (
        placed.join(corpus, ["shard", "pos"])
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "j", "neg_id")
    )
