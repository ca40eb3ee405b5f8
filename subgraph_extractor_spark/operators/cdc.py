"""Changelog compaction & CDC upsert (MERGE-INTO semantics, format-free).

A continuously-extracted dataset (the reference's incremental block-range
exports; any CDC feed) arrives as a changelog: (key, sequence, op,
payload) where op is upsert or delete and sequence is a monotone version
(block number, LSN, event id).  Two operators turn that into state:

- ``compact_changelog``     — latest row per key; keys whose latest op
                              is a delete disappear.  One hash shuffle
                              on the key; the per-key window is bounded
                              by the key's churn, never by feed size.
- ``apply_changelog``       — merge a new change batch into an existing
                              compacted snapshot (the incremental path).
                              Changes beat snapshot rows at equal
                              sequence (replay-safe); otherwise highest
                              sequence wins.  One shuffle keyed the same
                              way — with the snapshot stored bucketed by
                              key (operators/bucketing.py) the snapshot
                              side needs NO exchange at all, which is
                              the 100 TB play: shuffle only the delta.

Associativity contract (tested, and the oracle for the driver query) —
intermediate state keeps tombstones so out-of-order batches can't
resurrect deleted keys:

    apply_changelog(compact_changelog(A, keep_tombstones=True), B)
        == compact_changelog(A ∪ B)

so a pipeline can checkpoint compacted state at any cadence and replay
later batches without drift.  Both operators are pure Catalyst (window
+ filter) — no UDF, AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact_changelog(
    changes: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Latest-wins state of a changelog: one row per key (the highest
    ``sequence_col``), deleted keys dropped.  Ties on sequence break by
    preferring the delete (a delete and an upsert at the same version
    must not resurrect the row).

    ``keep_tombstones=True`` retains a deleted key's final delete row
    instead of dropping it.  REQUIRED for intermediate state that later
    batches will be applied onto when those batches can contain
    sequences older than the tombstone (out-of-order/backfill feeds):
    dropping the tombstone would let a stale earlier upsert resurrect
    the key.  Serve-side state (nothing left to apply) compacts with
    the default and the tombstones vanish."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_col).desc(),
        # delete outranks upsert at equal sequence
        (F.col(op_col) == delete_op).desc(),
    )
    out = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if not keep_tombstones:
        out = out.filter(F.col(op_col) != delete_op)
    return out


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Upsert/delete a change batch into a compacted snapshot.

    The snapshot must carry the same columns (it does if it came from
    ``compact_changelog`` — including ``sequence_col`` and ``op_col``).
    Sequence ties resolve by the same rule as ``compact_changelog`` —
    the delete wins, whichever side it sits on — and only between rows
    with the same op does the change batch beat the snapshot, which is
    what makes replaying an already-folded batch a no-op (idempotent
    apply) without letting a same-version upsert resurrect a tombstone.
    Pass a tombstone-keeping snapshot (and ``keep_tombstones=True`` on
    intermediate applies) when change batches are not sequence-ordered —
    see ``compact_changelog``.
    """
    cols = snapshot.columns
    if set(cols) != set(changes.columns):
        raise ValueError(
            f"snapshot/changes column mismatch: {sorted(cols)} vs "
            f"{sorted(changes.columns)}"
        )
    tagged = snapshot.select(*cols).withColumn(
        "_prio", F.lit(0)
    ).unionByName(changes.select(*cols).withColumn("_prio", F.lit(1)))
    # tie order mirrors compact_changelog: at equal sequence the delete
    # outranks the upsert REGARDLESS of which side it sits on — a
    # change-batch upsert must not resurrect a same-version snapshot
    # tombstone (apply∘compact == compact(union) depends on it).  The
    # batch-priority bit only breaks genuine same-op replay ties.
    w = Window.partitionBy(*keys).orderBy(
        F.col(sequence_col).desc(),
        (F.col(op_col) == delete_op).desc(),
        F.col("_prio").desc(),
    )
    out = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
    if not keep_tombstones:
        out = out.filter(F.col(op_col) != delete_op)
    return out
