"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs *reproducible* sampling: the same document
must land in the same sample on every run, on every engine, regardless of
partitioning — `df.sample()` (seeded per-partition RNG) breaks all three.
Everything here derives the sampling decision from a content hash of a
stable key, so the sample is a pure function of the data:

- ``stable_bucket``      — uniform 0..255 bucket from md5 of the key
                           (engine-independent: the same construction is
                           expressible in any SQL dialect).
- ``hash_sample``        — Bernoulli-style sampling at k/256 granularity.
- ``stratified_sample``  — per-stratum rates (e.g. downsample the head
                           language, keep the tail) in one codegen pass.
- ``group_topk_sample``  — exactly-k-per-group via a hash-ordered window
                           (the distributed face of reservoir sampling:
                           deterministic, one shuffle on the group key).

Scale notes: ``stable_bucket``/``hash_sample``/``stratified_sample`` are
pure row-local codegen expressions — zero shuffle, applied before any
wide op so downstream stages see only the sampled rows (sample pushdown).
``group_topk_sample`` shuffles once on the group key; skewed groups are
bounded by k after the window, and AQE handles the residual skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def _hex_digit(hx: Column, pos: int) -> Column:
    """Value of the ``pos``-th (1-based) hex digit of a hex string."""
    return F.instr(F.lit(_HEX), F.substring(hx, pos, 1)) - 1


def stable_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 256) from the first md5 byte of the key.

    ``salt`` decorrelates independent sampling decisions made from the
    same key (sample-of-a-sample must not be degenerate).
    """
    hx = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return (_hex_digit(hx, 1) * 16 + _hex_digit(hx, 2)).cast("int")


def hash_sample(
    df: DataFrame, key: Column, threshold: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose ``stable_bucket`` < ``threshold`` (rate = t/256)."""
    if not 0 <= threshold <= 256:
        raise ValueError(f"threshold must be in [0, 256], got {threshold}")
    return df.filter(stable_bucket(key, salt) < threshold)


def stratified_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    thresholds: dict[str, int],
    default_threshold: int = 256,
    salt: str = "",
) -> DataFrame:
    """Per-stratum hash sampling: ``thresholds[stratum]/256`` of each
    stratum survives (e.g. ``{"en": 64}`` keeps 1/4 of English, all else
    intact).  One codegen CASE — no shuffle, no RNG state."""
    thr: Column = F.lit(default_threshold)
    for value, t in sorted(thresholds.items()):
        if not 0 <= t <= 256:
            raise ValueError(f"threshold for {value!r} out of [0,256]: {t}")
        thr = F.when(stratum == value, F.lit(t)).otherwise(thr)
    return df.filter(stable_bucket(key, salt) < thr)


def group_topk_sample(
    df: DataFrame, group_cols: list[str], key: Column, k: int
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order —
    the deterministic equivalent of per-group reservoir sampling.

    Ties are impossible: the ordering is (md5(key), key), total on any
    unique key.  Adds a ``_rk`` column (1..k) callers may drop."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(key.cast("string")), key
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )


def split_assign(
    key: Column,
    boundaries: tuple[int, int] = (204, 230),
    names: tuple[str, str, str] = ("train", "valid", "test"),
) -> Column:
    """Stable train/valid/test assignment from the same bucket construct
    (80/10/10 by default).  Shared by ``pipeline_stable_split``."""
    b = stable_bucket(key)
    return (
        F.when(b < boundaries[0], names[0])
        .when(b < boundaries[1], names[1])
        .otherwise(names[2])
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    boundaries: tuple[int, int] = (204, 230),
    names: tuple[str, str, str] = ("train", "valid", "test"),
) -> DataFrame:
    """Group-aware train/valid/test split: every member of a near-dup
    cluster lands on the SAME side, so a document's near-duplicate can
    never leak from train into the eval sets — the failure mode a
    per-document hash split has by construction (trained-on text shows
    up verbatim-ish in valid/test and inflates eval).

    ``clusters`` is a (member_id, cluster_id) table — the output of
    ``dedup.duplicate_clusters`` / ``duplicate_clusters_star`` over any
    pair generator (MinHash, SimHash, embedding near-dup).  The split
    key is the cluster representative (min reachable id); documents in
    no cluster fall back to their own id, preserving the plain
    ``split_assign`` distribution.

    Scale shape: one LEFT equi-join against the cluster table (at real
    near-dup rates a few percent of the corpus — Catalyst broadcasts it
    when it fits, AQE handles the rest) + the pure-codegen md5 bucket.
    No window, no extra shuffle beyond the join."""
    rep = clusters.select(
        F.col("member_id").alias(id_col),
        F.col("cluster_id").alias("_grp"),
    )
    key = F.coalesce(F.col("_grp"), F.col(id_col))
    return (
        df.join(rep, id_col, "left")
        .withColumn("split", split_assign(key, boundaries, names))
        .drop("_grp")
    )


def mixture_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    weights: dict[str, float],
) -> DataFrame:
    """Deterministic training-mix sampling: select the LARGEST corpus
    whose stratum proportions match ``weights`` exactly, given what each
    stratum actually has available.

    The achievable total is ``T = min_s(n_s / w_s)`` (the stratum that
    runs out first caps the mix); each stratum then contributes
    ``floor(w_s * T)`` rows, chosen in stable (md5(key), key) order —
    the same hash-order contract as ``group_topk_sample``, so re-runs,
    engines and partitionings agree row-for-row.

    Plan shape: one tiny groupBy for the per-stratum counts, the global
    min as an unpartitioned window over that (broadcast-sized) table,
    one broadcast join of the per-stratum quota onto the corpus, one
    shuffle for the per-stratum rank window.  Strata absent from
    ``weights`` are excluded (weight 0).

    Returns the sampled rows with ``_stratum`` and ``_rk`` columns
    callers may drop.
    """
    if not weights:
        raise ValueError("weights must name at least one stratum")
    for s, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for {s!r} must be > 0, got {w}")
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
    )
    tagged = df.withColumn("_stratum", stratum)
    counts = (
        tagged.filter(F.col("_stratum").isin(*weights))
        .groupBy("_stratum")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", wmap[F.col("_stratum")])
        .withColumn("_cap", F.col("_n") / F.col("_w"))
    )
    everything = Window.partitionBy()
    quotas = counts.select(
        "_stratum",
        F.floor(F.col("_w") * F.min("_cap").over(everything)).alias("_quota"),
    )
    w = Window.partitionBy("_stratum").orderBy(F.md5(key.cast("string")), key)
    return (
        tagged.join(F.broadcast(quotas), "_stratum")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
    )


def temperature_mixture_sample(
    df: DataFrame,
    key: Column,
    stratum: Column,
    tau: float = 2.0,
) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual-training
    rebalancing rule of mT5 / XLM-R): sample stratum ``s`` proportional
    to ``n_s^(1/tau)`` — ``tau=1`` keeps natural proportions, larger
    ``tau`` flattens the head and upweights the tail.

    The largest without-replacement mix with those proportions has the
    closed form ``quota_s = floor(n_s^(1/tau) * n_min^(1-1/tau))`` (the
    normalizing sum cancels against the binding smallest stratum), so no
    cross-stratum float summation enters the quota — and for the default
    ``tau=2`` both factors are ``sqrt``, which IEEE 754 requires to be
    correctly rounded, making the quotas BIT-PORTABLE across engines
    (general ``pow`` is not correctly rounded; non-2 temperatures are
    deterministic per-engine but only approximately cross-engine).

    Rows are chosen per stratum in stable (md5(key), key) order — the
    same hash-order contract as ``mixture_sample``.  Plan: one tiny
    stratum-count aggregate, quotas broadcast back, one shuffle for the
    per-stratum rank window.
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    a = 1.0 / tau
    tagged = df.withColumn("_stratum", stratum)
    counts = tagged.groupBy("_stratum").agg(F.count(F.lit(1)).alias("_n"))
    everything = Window.partitionBy()
    nmin = F.min("_n").over(everything)
    if tau == 2.0:
        scaled = F.sqrt(F.col("_n")) * F.sqrt(nmin)
    else:
        scaled = F.pow(F.col("_n"), F.lit(a)) * F.pow(nmin, F.lit(1.0 - a))
    quotas = counts.select("_stratum", F.floor(scaled).alias("_quota"))
    w = Window.partitionBy("_stratum").orderBy(F.md5(key.cast("string")), key)
    return (
        tagged.join(F.broadcast(quotas), "_stratum")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("_quota"))
    )


def token_budget_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weight: Column,
    budgets: dict[str, int],
    salt: str = "budget",
) -> DataFrame:
    """Token-budget mixture selection: per domain, take documents in
    stable md5 order until the domain's ``weight`` budget (token
    count) is exhausted — the "build a 500B-token mix with 30% code,
    50% web, 20% books" operation, stated in the unit mixtures are
    actually specified in (tokens), not documents.

    A row is kept while the budget is not yet reached BEFORE it, so
    the boundary-crossing document is included and every non-empty
    domain reaches at least its budget when it has the tokens.
    Domains absent from ``budgets`` are dropped; rows with
    non-positive weight carry no tokens and are dropped (they cannot
    advance the line).  The md5 ordering makes the selected set a pure
    function of (salt, data) — partitioning- and engine-independent.

    Scale shape: the per-domain cumulative sum is the SAME two-level
    distributed prefix sum as :func:`pps_systematic_sample`, keyed by
    (domain, bucket) — 256 hash-prefix buckets cumsum in parallel, the
    per-domain 256-row offset table window-sums alone and broadcasts
    back.  No window ever sees an unbounded group.

    Output: (id_col, domain_col, weight, cum_tokens) for the selected
    rows, where ``cum_tokens`` is the domain's running total THROUGH
    the row."""
    if not budgets:
        raise ValueError("budgets must be non-empty")
    if any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be nonnegative")
    bmap = F.create_map(
        *[x for kv in budgets.items() for x in (F.lit(kv[0]), F.lit(int(kv[1])))]
    )
    hx = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = (
        df.select(
            F.col(id_col),
            F.col(domain_col).alias("_dom"),
            weight.cast("long").alias("_w"),
            hx.alias("_hx"),
            (_hex_digit(hx, 1) * 16 + _hex_digit(hx, 2)).alias("_bkt"),
        )
        .withColumn("_budget", F.element_at(bmap, F.col("_dom")))
        .filter(F.col("_budget").isNotNull() & (F.col("_w") > 0))
    )
    wloc = (
        Window.partitionBy("_dom", "_bkt")
        .orderBy("_hx", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum_loc", F.sum("_w").over(wloc))
    btot = base.groupBy("_dom", "_bkt").agg(F.sum("_w").alias("_bw"))
    woff = (
        Window.partitionBy("_dom")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "_dom",
        "_bkt",
        F.coalesce(F.sum("_bw").over(woff), F.lit(0)).alias("_off"),
    )
    j = local.alias("L").join(
        F.broadcast(offsets.alias("R")),
        (F.col("L._dom") == F.col("R._dom"))
        & (F.col("L._bkt") == F.col("R._bkt")),
    )
    cum = F.col("R._off") + F.col("L._cum_loc")
    return (
        j.select(
            F.col("L." + id_col),
            F.col("L._dom").alias(domain_col),
            F.col("L._w").alias("weight"),
            cum.alias("cum_tokens"),
            F.col("L._budget").alias("_b"),
        )
        .filter(F.col("cum_tokens") - F.col("weight") < F.col("_b"))
        .drop("_b")
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    n: int,
    salt: str = "pps",
) -> DataFrame:
    """Probability-proportional-to-size systematic sampling: draw ``n``
    of the cumulative-weight line, so row i is selected with expected
    multiplicity ``n * w_i / W`` — importance-weighted corpus sampling
    (weight = token count, quality score, domain priority) where plain
    Bernoulli over-represents short/low-value documents.

    Rows are laid on the line in stable (md5(salt || id), id) order — a
    deterministic permutation, so the sample is a pure function of the
    data (same reproducibility contract as every sampler here).
    ``id_col`` must be unique: duplicate ids tie the ordering key, so
    their relative cumsum order — and therefore which duplicate absorbs
    a draw boundary — would be partitioning-dependent.  With
    cumulative weight C_i, row i is emitted with multiplicity
    ``floor(C_i * n / W) - floor(C_{i-1} * n / W)`` — classic systematic
    PPS: exactly ``n`` total draws, rows with w_i >= W/n are ALWAYS
    selected (multiplicity >= 1 deterministically).  All arithmetic is
    64-bit integer (the W * n < 2**63 envelope is enforced in-plan via
    ``assert_true`` — Spark's non-ANSI longs would wrap silently where
    the DuckDB oracle's HUGEINT would not), so the full (id, mult)
    result is bit-portable.

    Scale shape: a global cumulative sum cannot be one window at 100 TB,
    so it is the standard two-level distributed prefix sum — 256
    hash-prefix buckets (the bucket is the first byte of the ordering
    hash, so bucket order IS hash order) get per-bucket window cumsums
    in parallel, a 256-row bucket-offset table is window-summed alone,
    and offsets broadcast back.  One data shuffle (bucket+sort), one
    broadcast join.
    """
    if n <= 0:
        raise ValueError(f"n must be > 0, got {n}")
    hx = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        weight.cast("long").alias("_w"),
        hx.alias("_hx"),
        (_hex_digit(hx, 1) * 16 + _hex_digit(hx, 2)).alias("_bkt"),
    ).filter(F.col("_w") > 0)
    wloc = (
        Window.partitionBy("_bkt")
        .orderBy("_hx", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_cum_loc", F.sum("_w").over(wloc))
    btot = base.groupBy("_bkt").agg(F.sum("_w").alias("_bw"))
    woff = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "_bkt",
        F.coalesce(F.sum("_bw").over(woff), F.lit(0)).alias("_off"),
        F.sum("_bw").over(Window.partitionBy()).alias("_W"),
    )
    # both join sides derive from `base`, so the self-join lineage must
    # be alias-qualified, and the projected names must not collide with
    # names living below the projection (Spark 4's hybrid analyzer also
    # resolves against hidden lineage attributes, so re-projecting `_w`
    # as `_w` reads as ambiguous)
    j = local.alias("L").join(
        F.broadcast(offsets.alias("R")),
        F.col("L._bkt") == F.col("R._bkt"),
    )
    lined = j.select(
        F.col("L." + id_col),
        F.col("L._w").alias("_wv"),
        (F.col("R._off") + F.col("L._cum_loc")).alias("_cumv"),
        F.col("R._W").alias("_Wt"),
    )
    # in-plan overflow envelope: every product below is bounded by W*n.
    # The window SUMs above have already run by the time this evaluates,
    # so a total weight W past 2^63 would have wrapped FIRST — typically
    # to a negative _Wt that would sail under the upper bound (ADVICE
    # r4).  The _Wt > 0 arm catches that wrap (weights are filtered
    # > 0, so a legitimate total is strictly positive); the _cumv >= 0
    # arm catches a per-bucket wrap even if the global sum happens to
    # wrap back into positive range.
    guard = F.assert_true(
        (F.col("_Wt") > 0)
        & (F.col("_Wt") <= F.lit(((1 << 63) - 1) // n))
        & (F.col("_cumv") >= 0),
        F.lit(
            f"pps overflow envelope: total_weight * n must stay under "
            f"2^63 (n={n}) and cumulative sums must not wrap; rescale "
            f"the weights"
        ),
    )
    # `div`, not `/`: Spark's `/` on longs is DOUBLE division, which
    # stops being exact past 2^53 — SQL `div` keeps the whole
    # computation in 64-bit integers (operands nonnegative, so
    # trunc == floor; DuckDB's `//` matches).
    mult = F.expr(f"(_cumv * {n}) div _Wt") - F.expr(
        f"((_cumv - _wv) * {n}) div _Wt"
    )
    return (
        lined.select(
            id_col,
            F.col("_wv").alias("weight"),
            (mult + F.coalesce(guard.cast("long"), F.lit(0))).alias(
                "mult"
            ),
        )
        .filter(F.col("mult") >= 1)
    )
