"""Deterministic mergeable quantile summary — the rank/distribution
member of the standing-sketch family (HLL ~ distinct counts, count-min
~ point frequencies, Misra-Gries ~ heavy hitters, KMV ~ overlap; this
~ quantiles): a bounded k-row summary of a numeric column that answers
any rank/quantile query within a CARRIED error bound and merges with
other summaries without revisiting their data — the Munro-Paterson /
MRL collapse family, pinned deterministic.

Classical quantile sketches (GK, KLL, t-digest) are arrival-order- or
RNG-dependent; every choice here is a pure function of the data so the
whole shard-and-merge tree is engine-portable and FULL-VALUE
oracle-checkable (the Misra-Gries discipline of freq.py):

- build over a batch: sort, then one sample per bucket
  ``[floor(i*n/k), floor((i+1)*n/k))`` at the bucket's MIDDLE rank
  ``t_i = floor(i*n/k) + (w_i - 1) // 2`` with integer weight
  ``w_i = floor((i+1)*n/k) - floor(i*n/k)`` (weights sum to n
  exactly; empty buckets are skipped, so n <= k is EXACT);
- merge: union the weighted samples (equal values combine — ties
  collapse, making the cumulative order total), take the element at
  weighted middle-rank of each of k fresh buckets over N = n_a + n_b;
- carried error: ``err' = err_a + err_b + E(N)`` with
  ``E(n) = n // (2k) + 1`` — selecting a bucket's middle misplaces a
  rank by at most half the bucket width, and each input sample's
  weighted position is within its own summary's err of its true rank.

State row: ``(idx, value, weight, n_total, err)`` plus ONE
unconditional ``(NULL, NULL, 0, n_total, err)`` metadata anchor row —
the lesson of the r9 Misra-Gries fix applied from day one: zero rows
cannot carry metadata, and an empty batch is a legitimate algebra
element.  ``quantile_merge`` references each input exactly ONCE
(r11 single-reference formulation), so a lazy fold's plan grows
linearly; it is still EAGER by default (localCheckpoint of the
<= k+1 row result, the mg_merge discipline) to bound plan depth in
long incremental folds, with ``eager=False`` for bounded folds that
want the whole chain in one job.

Validity law (tested, python-truth + hypothesis): for any target rank
``r`` in [0, n), the summary's answer — the sample whose cumulative
weight interval contains ``r`` — has a true rank interval within
``err`` of ``r``.

Scale shape: the build ranks via ``layout.global_rank`` (range
repartition + local sort + two-level prefix sum — NO single-partition
window over the data), the k-row bucket table broadcasts onto the
ranked relation, and every merge-side window runs over <= 2k rows.
The 100 TB use mirrors MG: one summary per batch/partition, folded in
a tree; history is never re-sorted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QS_COLS = ["idx", "value", "weight", "n_total", "err"]


def _err_expr(n_col: str, k: int) -> str:
    """E(n) = n // (2k) + 1 for n > 0, else 0 — the per-collapse rank
    slack (half the largest bucket, rounded up)."""
    return (
        f"CASE WHEN {n_col} > 0 THEN {n_col} DIV {2 * k} + 1 "
        f"ELSE 0 END"
    )


def quantile_summary(df: DataFrame, value_col: str, k: int) -> DataFrame:
    """Summary of a batch: k weighted middle-of-bucket order
    statistics (exact when the batch has <= k rows).  NULL values are
    excluded (SQL aggregate convention).  Values must be integral
    (cast upstream — exact-integer arithmetic is what makes the state
    engine-portable)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from subgraph_extractor_spark.operators.layout import global_rank

    vals = df.select(
        F.col(value_col).cast("long").alias("value")
    ).filter(F.col("value").isNotNull())
    n_row = vals.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    ranked = global_rank(vals, ["value"], rank_col="_rk")  # 1-based
    buckets = (
        n_row.select(
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("idx"),
            "n_total",
        )
        .select(
            F.col("idx").cast("int").alias("idx"),
            "n_total",
            F.expr(
                f"((idx + 1) * n_total) DIV {k} - (idx * n_total) DIV {k}"
            ).cast("long").alias("weight"),
        )
        .filter(F.col("weight") > 0)
        .select(
            "idx",
            "n_total",
            "weight",
            F.expr(
                f"(idx * n_total) DIV {k} + (weight - 1) DIV 2"
            ).alias("_t"),
        )
    )
    body = (
        ranked.join(
            F.broadcast(buckets), ranked["_rk"] == buckets["_t"] + 1
        )
        .select(
            "idx",
            "value",
            "weight",
            "n_total",
            F.expr(_err_expr("n_total", k)).cast("long").alias("err"),
        )
    )
    return body.unionByName(_qs_anchor(n_row, k))


def _qs_anchor(n_row: DataFrame, k: int) -> DataFrame:
    """The unconditional 1-row metadata anchor (idx NULL, value NULL,
    weight 0, n_total, err)."""
    return n_row.select(
        F.lit(None).cast("int").alias("idx"),
        F.lit(None).cast("long").alias("value"),
        F.lit(0).cast("long").alias("weight"),
        F.col("n_total").cast("long").alias("n_total"),
        F.expr(_err_expr("n_total", k)).cast("long").alias("err"),
    )


def quantile_merge(
    a: DataFrame, b: DataFrame, k: int, eager: bool = True
) -> DataFrame:
    """Collapse two summaries into a valid summary of the union:
    weighted middle-of-bucket re-selection over the combined samples,
    err = err_a + err_b + E(n_a + n_b).

    SINGLE-REFERENCE formulation (r11): each input enters the plan
    exactly once — both sides' metadata ride the tagged union through
    one unpartitioned window over the <= 2(k+1)-row state instead of
    separate per-side aggregates, and the bucket selection is a
    per-sample ``explode(sequence(0, k-1))`` containment test instead
    of a join against a separately derived bucket relation.  With one
    reference per input a lazy left fold grows LINEARLY (the old
    two-reference shape duplicated each fold level's subtree into the
    next, which is why every merge had to checkpoint).  ``eager=True``
    (the default, the mg_merge discipline) still truncates with a
    <= k+1-row ``localCheckpoint`` — the right call for long-running
    incremental folds; a bounded fold over a handful of shards can
    pass ``eager=False`` and evaluate the whole chain in one job.

    Values are bit-identical to the two-reference formulation: same
    combined stream (ties collapse), same cumulative order, same
    bucket arithmetic, same anchor row (the weight-0 NULL-value
    anchors travel the same chain — their group never matches a
    bucket's containment interval because its cumulative span is
    empty, and idx -1 marks the anchor through the explode).

    A 1-row literal seed rides the union (r12, the mg_merge
    discipline — this was the one asymmetry between the two r11
    single-reference rewrites): the NULL-value anchor group, and with
    it the merged metadata, exists even when both inputs are ZERO-ROW
    relations (the legacy encoding of "empty"), yielding the identity
    anchor (NULL, NULL, 0, 0, 0) instead of an empty relation.  With
    any non-empty input the seed merges into the anchor group the
    inputs' own anchor rows already form (weight 0, sorts first, its
    side tag matches neither metadata predicate), so no other result
    changes."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if a.columns != _QS_COLS or b.columns != _QS_COLS:
        raise ValueError(
            f"expected quantile summaries with columns {_QS_COLS}"
        )
    from pyspark.sql import Window

    seed = a.sparkSession.range(1).select(
        F.lit(None).cast("int").alias("idx"),
        F.lit(None).cast("long").alias("value"),
        F.lit(0).cast("long").alias("weight"),
        F.lit(0).cast("long").alias("n_total"),
        F.lit(0).cast("long").alias("err"),
        F.lit(2).alias("_side"),
    )
    un = (
        a.withColumn("_side", F.lit(0))
        .unionByName(b.withColumn("_side", F.lit(1)))
        .unionByName(seed)
    )
    # ONE window over the entire (bounded, <= 2(k+1)-row) state
    # attaches both sides' (n_total, err) to every row; every summary
    # row carries its side's metadata, so max-per-side recovers it.
    w_all = Window.partitionBy()
    _side_max = lambda side, col: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("_side") == side, F.col(col))).over(w_all),
        F.lit(0),
    ).cast("long")
    st = un.select(
        "value",
        "weight",
        (_side_max(0, "n_total") + _side_max(1, "n_total")).alias("_n"),
        (_side_max(0, "err") + _side_max(1, "err")).alias("_e0"),
    ).withColumn(
        "_e",
        (F.col("_e0") + F.expr(_err_expr("_n", k))).cast("long"),
    )
    # equal values COMBINE, so the cumulative order below is total and
    # the selection deterministic.  The NULL-value anchor group (the
    # only weight-0 rows) collapses to one weight-0 row and sorts
    # first, so non-null cumulative sums are unchanged.
    comb = st.groupBy("value").agg(
        F.sum("weight").cast("long").alias("_w"),
        F.max("_n").alias("_n"),
        F.max("_e").alias("_e"),
    )
    w_cum = Window.orderBy(F.col("value").asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = comb.select(
        "value", "_w", "_n", "_e", F.sum("_w").over(w_cum).alias("_cum")
    )
    # per-sample bucket containment: sample with cumulative interval
    # (_cum - _w, _cum] owns bucket i iff its 0-based middle target t_i
    # falls inside — same predicate as the old theta join, evaluated as
    # a k-wide explode over <= 2k rows.  idx -1 = the anchor row.
    bw = f"(((_i + 1) * _n) DIV {k} - (_i * _n) DIV {k})"
    t = f"((_i * _n) DIV {k} + ({bw} - 1) DIV 2)"
    out = (
        cum.select(
            "value",
            "_w",
            "_n",
            "_e",
            "_cum",
            F.explode(
                F.when(
                    F.col("value").isNull(), F.array(F.lit(-1))
                ).otherwise(F.sequence(F.lit(0), F.lit(k - 1)))
            ).alias("_i"),
        )
        .filter(
            F.expr(
                f"_i = -1 OR ({bw} > 0 AND _cum > {t}"
                f" AND _cum - _w <= {t})"
            )
        )
        .select(
            F.expr("CASE WHEN _i >= 0 THEN _i END").cast("int").alias(
                "idx"
            ),
            F.col("value").cast("long").alias("value"),
            F.expr(f"CASE WHEN _i >= 0 THEN {bw} ELSE 0 END")
            .cast("long")
            .alias("weight"),
            F.col("_n").cast("long").alias("n_total"),
            F.col("_e").cast("long").alias("err"),
        )
    )
    return out.localCheckpoint(eager=True) if eager else out


def quantile_estimate(
    summary: DataFrame, quantiles: list[float]
) -> DataFrame:
    """Answer quantile queries from the standing summary alone: for
    each q, target rank r = floor(q * (n - 1)), answer = the sample
    whose cumulative weight interval contains r.  Output (q, rank,
    value) — empty when the summary holds no data (n = 0)."""
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    if any(q < 0 or q > 1 for q in quantiles):
        raise ValueError("quantiles must lie in [0, 1]")
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        summary.filter(F.col("weight") > 0)
        .select(
            "value",
            "weight",
            "n_total",
            F.sum("weight").over(w).alias("_cum"),
        )
    )
    qs = F.array(*[F.lit(float(q)) for q in sorted(set(quantiles))])
    targets = (
        summary.select("n_total")
        .limit(1)
        .select(F.explode(qs).alias("q"), "n_total")
        .select(
            "q",
            F.floor(F.col("q") * (F.col("n_total") - 1))
            .cast("long")
            .alias("rank"),
        )
    )
    return (
        F.broadcast(targets)
        .join(
            cum,
            (F.col("_cum") > F.col("rank"))
            & (F.col("_cum") - F.col("weight") <= F.col("rank")),
        )
        .select("q", "rank", "value")
    )


def quantile_oracle_sql(
    source_cte: str,
    value_expr: str,
    shard_expr: str,
    n_shards: int,
    k: int,
) -> str:
    """DuckDB replay of a deterministic shard-and-left-fold quantile
    summary run — per-shard builds via ROW_NUMBER ranks + the same
    floor-arithmetic buckets, merges as chained MATERIALIZED CTEs
    (non-materialized CTEs re-evaluate per reference — the mg_oracle
    lesson).  Emits the same final rows INCLUDING the anchor."""

    def err_sql(n: str) -> str:
        return f"CASE WHEN {n} > 0 THEN {n} // {2 * k} + 1 ELSE 0 END"

    def buckets_sql(tag: str, n_src: str) -> str:
        """k-row bucket relation (idx, weight, t) over scalar n."""
        return f"""bk{tag} AS MATERIALIZED (
            SELECT idx,
                   ((idx + 1) * n) // {k} - (idx * n) // {k} AS weight,
                   (idx * n) // {k}
                     + (((idx + 1) * n) // {k} - (idx * n) // {k} - 1) // 2
                       AS t
            FROM (SELECT UNNEST(RANGE({k})) AS idx,
                         (SELECT n FROM {n_src}) AS n)
            WHERE ((idx + 1) * n) // {k} - (idx * n) // {k} > 0)"""

    parts = [
        f"src AS ({source_cte})",
        f"vals AS (SELECT CAST({value_expr} AS BIGINT) AS value,"
        f" {shard_expr} AS shard FROM src"
        f" WHERE {value_expr} IS NOT NULL)",
    ]
    for s in range(n_shards):
        parts.append(
            f"""rk{s} AS MATERIALIZED (
                SELECT value,
                       ROW_NUMBER() OVER (ORDER BY value) - 1 AS rk
                FROM vals WHERE shard = {s})"""
        )
        parts.append(
            f"n{s} AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n"
            f" FROM rk{s})"
        )
        parts.append(buckets_sql(f"s{s}", f"n{s}"))
        parts.append(
            f"""s{s} AS MATERIALIZED (
                SELECT CAST(b.idx AS INT) AS idx, r.value,
                       CAST(b.weight AS BIGINT) AS weight,
                       (SELECT n FROM n{s}) AS n_total,
                       CAST({err_sql(f"(SELECT n FROM n{s})")} AS BIGINT)
                           AS err
                FROM bks{s} b JOIN rk{s} r ON r.rk = b.t
                UNION ALL
                SELECT NULL, NULL, CAST(0 AS BIGINT),
                       (SELECT n FROM n{s}),
                       CAST({err_sql(f"(SELECT n FROM n{s})")} AS BIGINT))"""
        )
    prev = "s0"
    for s in range(1, n_shards):
        cur = f"t{s}"
        parts.append(
            f"""m{s} AS MATERIALIZED (
                SELECT (SELECT COALESCE(MAX(n_total), 0) FROM {prev})
                     + (SELECT COALESCE(MAX(n_total), 0) FROM s{s}) AS n,
                       (SELECT COALESCE(MAX(err), 0) FROM {prev})
                     + (SELECT COALESCE(MAX(err), 0) FROM s{s}) AS e)"""
        )
        parts.append(
            f"""c{s} AS MATERIALIZED (
                SELECT value, weight,
                       SUM(weight) OVER (ORDER BY value) AS cum
                FROM (SELECT value, SUM(weight) AS weight
                      FROM (SELECT value, weight FROM {prev}
                            WHERE weight > 0
                            UNION ALL
                            SELECT value, weight FROM s{s}
                            WHERE weight > 0)
                      GROUP BY value))"""
        )
        parts.append(buckets_sql(f"m{s}", f"m{s}"))
        parts.append(
            f"""{cur} AS MATERIALIZED (
                SELECT CAST(b.idx AS INT) AS idx, c.value,
                       CAST(b.weight AS BIGINT) AS weight,
                       (SELECT n FROM m{s}) AS n_total,
                       CAST((SELECT e FROM m{s})
                            + {err_sql(f"(SELECT n FROM m{s})")} AS BIGINT)
                           AS err
                FROM bkm{s} b JOIN c{s} c
                  ON c.cum > b.t AND c.cum - c.weight <= b.t
                UNION ALL
                SELECT NULL, NULL, CAST(0 AS BIGINT),
                       (SELECT n FROM m{s}),
                       CAST((SELECT e FROM m{s})
                            + {err_sql(f"(SELECT n FROM m{s})")} AS BIGINT))"""
        )
        prev = cur
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT idx, value, weight, n_total, err FROM {prev}"
    )


def quantile_summary_grouped(
    df: DataFrame, value_col: str, k: int, group_cols: list[str]
) -> DataFrame:
    """Per-GROUP quantile summaries — one bounded k-row summary per
    (language, domain, shard, ...) group: the per-stratum distribution
    state a mixture pipeline wants ("token-length quantiles PER
    language").  Same bucket arithmetic, validity law and per-group
    metadata anchor as the global face, held independently within each
    group; ranks come from a per-group window (the group-local sort is
    the irreducible cost of grouped order statistics), every join is a
    group-key equi-join, and groups with only NULL values are absent
    (the mg_summary_grouped convention: a group is its rows).

    Output: (*group_cols, idx, value, weight, n_total, err).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty (use quantile_summary)")
    from pyspark.sql import Window

    vals = df.select(
        *group_cols, F.col(value_col).cast("long").alias("value")
    ).filter(F.col("value").isNotNull())
    n_tab = vals.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    w = Window.partitionBy(*group_cols).orderBy("value")
    ranked = vals.withColumn("_rk", F.row_number().over(w))
    buckets = (
        n_tab.select(
            *group_cols,
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("idx"),
            "n_total",
        )
        .select(
            *group_cols,
            F.col("idx").cast("int").alias("idx"),
            "n_total",
            F.expr(
                f"((idx + 1) * n_total) DIV {k} - (idx * n_total) DIV {k}"
            ).cast("long").alias("weight"),
        )
        .filter(F.col("weight") > 0)
        .select(
            *group_cols,
            "idx",
            "n_total",
            "weight",
            F.expr(
                f"(idx * n_total) DIV {k} + (weight - 1) DIV 2"
            ).alias("_t"),
        )
    )
    body = (
        ranked.alias("r")
        .join(
            buckets.alias("b"),
            [F.col(f"r.{c}") == F.col(f"b.{c}") for c in group_cols]
            + [F.col("r._rk") == F.col("b._t") + 1],
        )
        .select(
            *[F.col(f"b.{c}") for c in group_cols],
            "idx",
            "value",
            F.col("b.weight").alias("weight"),
            "n_total",
            F.expr(_err_expr("n_total", k)).cast("long").alias("err"),
        )
    )
    anchors = n_tab.select(
        *group_cols,
        F.lit(None).cast("int").alias("idx"),
        F.lit(None).cast("long").alias("value"),
        F.lit(0).cast("long").alias("weight"),
        "n_total",
        F.expr(_err_expr("n_total", k)).cast("long").alias("err"),
    )
    return body.unionByName(anchors)


def quantile_merge_grouped(
    a: DataFrame, b: DataFrame, k: int, group_cols: list[str]
) -> DataFrame:
    """Per-group collapse of two grouped summaries over disjoint
    sub-streams — a group present on one side only re-buckets from its
    own samples alone; per-group anchors are unconditional.  LAZY like
    :func:`freq.mg_merge_grouped` (state-sized output — m rows PER
    GROUP — so eager materialization is the caller's call).

    SINGLE-REFERENCE formulation (r12, the template
    :func:`quantile_merge` shipped in r11): each input enters the plan
    exactly once — both sides' per-group (n_total, err) ride a
    side-tagged union through ONE group-partitioned window (instead of
    per-side groupBy aggregates full-outer-joined back), and bucket
    selection is the per-sample ``explode(sequence(0, k-1))``
    containment test (instead of a join against a separately derived
    bucket relation).  With one reference per input a LAZY left fold's
    plan grows LINEARLY in fold depth — the old two-reference shape
    duplicated each fold level's subtree into the next (Catalyst plans
    are trees), which is why its docstring demanded checkpoints past a
    few levels.  Values are identical: same per-group combined stream,
    cumulative order, bucket arithmetic and unconditional anchors (the
    per-group weight-0 NULL-value anchor rows ARE the merged anchors —
    idx -1 marks them through the explode; a group exists iff it has
    rows, so no seed is needed, unlike the global merge's zero-row
    legacy case).  Per-group cumulative windows still run over <= 2k
    rows."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = [*group_cols, "idx", "value", "weight", "n_total", "err"]
    if a.columns != cols or b.columns != cols:
        raise ValueError(
            f"expected grouped quantile summaries with columns {cols}"
        )
    from pyspark.sql import Window

    un = a.withColumn("_side", F.lit(0)).unionByName(
        b.withColumn("_side", F.lit(1))
    )
    # ONE group-partitioned window attaches both sides' (n_total, err)
    # to every row of the group; max-per-side recovers each side's
    # metadata (0 for a side the group is absent from — exactly the
    # old full-outer join's coalesce).
    w_g = Window.partitionBy(*group_cols)
    _side_max = lambda side, col: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("_side") == side, F.col(col))).over(w_g),
        F.lit(0),
    ).cast("long")
    st = un.select(
        *group_cols,
        "value",
        "weight",
        (_side_max(0, "n_total") + _side_max(1, "n_total")).alias("_n"),
        (_side_max(0, "err") + _side_max(1, "err")).alias("_e0"),
    ).withColumn(
        "_e",
        (F.col("_e0") + F.expr(_err_expr("_n", k))).cast("long"),
    )
    # equal values combine per group; the per-group NULL-value anchor
    # rows (the only weight-0 rows) collapse to one weight-0 row that
    # sorts first, so non-null cumulative sums are unchanged.
    comb = st.groupBy(*group_cols, "value").agg(
        F.sum("weight").cast("long").alias("_w"),
        F.max("_n").alias("_n"),
        F.max("_e").alias("_e"),
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("value").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = comb.select(
        *group_cols, "value", "_w", "_n", "_e",
        F.sum("_w").over(w_cum).alias("_cum"),
    )
    # per-sample bucket containment, exactly the global merge's shape;
    # idx -1 = the group's anchor row.
    bw = f"(((_i + 1) * _n) DIV {k} - (_i * _n) DIV {k})"
    t = f"((_i * _n) DIV {k} + ({bw} - 1) DIV 2)"
    return (
        cum.select(
            *group_cols,
            "value",
            "_w",
            "_n",
            "_e",
            "_cum",
            F.explode(
                F.when(
                    F.col("value").isNull(), F.array(F.lit(-1))
                ).otherwise(F.sequence(F.lit(0), F.lit(k - 1)))
            ).alias("_i"),
        )
        .filter(
            F.expr(
                f"_i = -1 OR ({bw} > 0 AND _cum > {t}"
                f" AND _cum - _w <= {t})"
            )
        )
        .select(
            *group_cols,
            F.expr("CASE WHEN _i >= 0 THEN _i END").cast("int").alias(
                "idx"
            ),
            F.col("value").cast("long").alias("value"),
            F.expr(f"CASE WHEN _i >= 0 THEN {bw} ELSE 0 END")
            .cast("long")
            .alias("weight"),
            F.col("_n").cast("long").alias("n_total"),
            F.col("_e").cast("long").alias("err"),
        )
    )


def quantile_grouped_oracle_sql(
    source_cte: str,
    value_expr: str,
    group_expr: str,
    group_alias: str,
    k: int,
) -> str:
    """DuckDB replay of a single :func:`quantile_summary_grouped`
    build (no merge tree — the grouped face's unit of state is one
    build per batch): per-group ROW_NUMBER ranks + the same
    floor-arithmetic buckets, emitting the same rows INCLUDING the
    per-group anchors.  Output columns: (group_alias, idx, value,
    weight, n_total, err)."""
    err = f"CASE WHEN n > 0 THEN n // {2 * k} + 1 ELSE 0 END"
    return f"""
    WITH src AS ({source_cte}),
    vals AS (
      SELECT {group_expr} AS grp, CAST({value_expr} AS BIGINT) AS value
      FROM src WHERE ({value_expr}) IS NOT NULL
    ),
    rk AS MATERIALIZED (
      SELECT grp, value,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY value) - 1 AS rk
      FROM vals
    ),
    ng AS MATERIALIZED (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY grp
    ),
    bk AS MATERIALIZED (
      SELECT grp, idx, n,
             ((idx + 1) * n) // {k} - (idx * n) // {k} AS weight,
             (idx * n) // {k}
               + (((idx + 1) * n) // {k} - (idx * n) // {k} - 1) // 2 AS t
      FROM (SELECT grp, UNNEST(RANGE({k})) AS idx, n FROM ng)
      WHERE ((idx + 1) * n) // {k} - (idx * n) // {k} > 0
    )
    SELECT b.grp AS {group_alias}, CAST(b.idx AS INT) AS idx, r.value,
           CAST(b.weight AS BIGINT) AS weight, b.n AS n_total,
           CAST({err.replace("n >", "b.n >").replace("n //", "b.n //")}
                AS BIGINT) AS err
    FROM bk b JOIN rk r ON r.grp = b.grp AND r.rk = b.t
    UNION ALL
    SELECT grp AS {group_alias}, NULL, NULL, CAST(0 AS BIGINT), n,
           CAST({err} AS BIGINT)
    FROM ng
    """
