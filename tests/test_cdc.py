"""Changelog compaction / CDC upsert: latest-wins, tombstone
resurrection guard, idempotent replay, associativity on the fixture."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import cdc as C

COLS = ["k", "seq", "op", "v"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seq bigint, op string, v string"
    )


def test_compact_latest_wins_and_deletes_drop(spark):
    feed = _df(spark, [
        (1, 10, "U", "a"), (1, 20, "U", "b"),
        (2, 5, "U", "x"), (2, 9, "D", None),
        (3, 1, "U", "only"),
    ])
    out = {r.k: (r.seq, r.v) for r in
           C.compact_changelog(feed, ["k"], "seq").collect()}
    assert out == {1: (20, "b"), 3: (1, "only")}
    # keep_tombstones retains the delete row
    kept = {r.k: r.op for r in
            C.compact_changelog(feed, ["k"], "seq",
                                keep_tombstones=True).collect()}
    assert kept[2] == "D" and kept[1] == "U"


def test_delete_beats_upsert_at_equal_sequence(spark):
    feed = _df(spark, [(1, 7, "U", "late"), (1, 7, "D", None)])
    assert C.compact_changelog(feed, ["k"], "seq").count() == 0


def test_tombstone_guard_against_resurrection(spark):
    # batch A holds the delete (seq 10); batch B holds an OLDER upsert
    # (seq 7).  Tombstone-keeping snapshot must keep the key dead.
    a = _df(spark, [(1, 10, "D", None)])
    b = _df(spark, [(1, 7, "U", "stale")])
    snap = C.compact_changelog(a, ["k"], "seq", keep_tombstones=True)
    assert C.apply_changelog(snap, b, ["k"], "seq").count() == 0
    # the naive snapshot (tombstone dropped) WOULD resurrect — the
    # documented failure mode the flag exists for
    naive = C.compact_changelog(a, ["k"], "seq")
    assert C.apply_changelog(naive, b, ["k"], "seq").count() == 1


def test_same_sequence_delete_in_snapshot_beats_change_upsert(spark):
    # delete and upsert emitted at the SAME version, split across
    # batches: compact(union) kills the key, so apply∘compact must too
    # (regression: batch priority must not outrank the delete tie rule)
    a = _df(spark, [(1, 7, "D", None)])
    b = _df(spark, [(1, 7, "U", "x")])
    union_state = C.compact_changelog(a.unionByName(b), ["k"], "seq")
    inc = C.apply_changelog(
        C.compact_changelog(a, ["k"], "seq", keep_tombstones=True),
        b, ["k"], "seq")
    assert union_state.count() == 0
    assert inc.count() == 0
    # and mirrored: change-batch delete kills a same-seq snapshot upsert
    inc2 = C.apply_changelog(
        C.compact_changelog(b, ["k"], "seq", keep_tombstones=True),
        a, ["k"], "seq")
    assert inc2.count() == 0


def test_apply_is_idempotent_on_replay(spark):
    a = _df(spark, [(1, 1, "U", "v1"), (2, 1, "U", "w1")])
    b = _df(spark, [(1, 2, "U", "v2"), (2, 2, "D", None)])
    once = C.apply_changelog(
        C.compact_changelog(a, ["k"], "seq", keep_tombstones=True),
        b, ["k"], "seq", keep_tombstones=True)
    twice = C.apply_changelog(once, b, ["k"], "seq")
    assert sorted(map(tuple, twice.collect())) == [(1, 2, "U", "v2")]


def test_column_mismatch_raises(spark):
    a = _df(spark, [(1, 1, "U", "x")])
    with pytest.raises(ValueError, match="column mismatch"):
        C.apply_changelog(a, a.drop("v"), ["k"], "seq")


def test_associativity_on_fixture(spark, sf_dir):
    # apply(compact(A), B) == compact(A ∪ B) on the events feed with a
    # sequence-interleaved (parity) split — 150 users, 30 deleted
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.col("value").alias("v"),
    )
    full = C.compact_changelog(e, ["k"], "seq")
    inc = C.apply_changelog(
        C.compact_changelog(e.filter(F.col("seq") % 2 == 0), ["k"], "seq",
                            keep_tombstones=True),
        e.filter(F.col("seq") % 2 == 1), ["k"], "seq")
    assert sorted(map(tuple, full.collect())) == \
        sorted(map(tuple, inc.collect()))
