"""Count-min sketch: one-sided error (never underestimates), exactness
on sparse keys, merge associativity (two batches == single pass),
weighted build, mixed-geometry rejection, and collision behavior under
a deliberately tiny width."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import freq as FQ

DEPTH, WIDTH, SHARDS = 4, 1 << 14, 8


@pytest.fixture(scope="module")
def skewed(spark):
    # token-i appears i times, i in 1..100 (5050 rows total)
    rows = spark.range(1, 101).select(
        F.concat(F.lit("tok-"), F.col("id")).alias("k"),
        F.col("id").alias("w"),
    )
    stream = rows.select(
        "k", F.explode(F.sequence(F.lit(1), F.col("w"))).alias("_i")
    ).select("k")
    stream.cache().count()
    return rows, stream


def test_never_underestimates_and_totals(spark, skewed):
    rows, stream = skewed
    sk = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH,
                      num_shards=SHARDS)
    sk.cache()
    assert sk.count() == 1
    assert sk.first()["n_total"] == 5050
    est = FQ.cms_estimate(
        rows.select("k", F.col("w").alias("exact")), "k", sk
    )
    assert est.filter(F.col("n_est") < F.col("exact")).count() == 0
    # at 2^14 cells for 100 keys, collisions are overwhelmingly absent:
    # the estimate is exact
    assert est.filter(F.col("n_est") != F.col("exact")).count() == 0


def test_weighted_build_equals_exploded_build(spark, skewed):
    rows, stream = skewed
    a = FQ.cms_build(rows, "k", weight_col="w", depth=DEPTH, width=WIDTH,
                     num_shards=SHARDS).first()
    b = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH,
                     num_shards=SHARDS).first()
    assert a["counters"] == b["counters"] and a["n_total"] == b["n_total"]


def test_merge_equals_single_pass(spark, skewed):
    rows, stream = skewed
    whole = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH,
                         num_shards=SHARDS).first()
    lo = FQ.cms_build(stream.filter(F.col("k") <= "tok-5"), "k",
                      depth=DEPTH, width=WIDTH, num_shards=SHARDS)
    hi = FQ.cms_build(stream.filter(F.col("k") > "tok-5"), "k",
                      depth=DEPTH, width=WIDTH, num_shards=SHARDS)
    merged = FQ.cms_merge(lo.unionByName(hi)).first()
    assert merged["counters"] == whole["counters"]
    assert merged["n_total"] == whole["n_total"]


def test_merge_rejects_mixed_geometry(spark, skewed):
    rows, stream = skewed
    a = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH,
                     num_shards=SHARDS)
    b = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH * 2,
                     num_shards=SHARDS)
    with pytest.raises(Exception, match="mixed depth/width"):
        FQ.cms_merge(a.unionByName(b)).collect()


def test_sketch_table_survives_parquet_roundtrip(spark, skewed, tmp_path):
    """Durability: parquet round-trip + merge with a fresh batch gives
    the same counters as sketching the union in one pass."""
    rows, stream = skewed
    lo = stream.filter(F.col("k") <= "tok-5")
    hi = stream.filter(F.col("k") > "tok-5")
    store = str(tmp_path / "cms_store")
    FQ.cms_build(lo, "k", depth=DEPTH, width=WIDTH,
                 num_shards=SHARDS).write.parquet(store)
    refreshed = FQ.cms_merge(
        spark.read.parquet(store).unionByName(
            FQ.cms_build(hi, "k", depth=DEPTH, width=WIDTH,
                         num_shards=SHARDS)
        )
    ).first()
    whole = FQ.cms_build(stream, "k", depth=DEPTH, width=WIDTH,
                         num_shards=SHARDS).first()
    assert refreshed["counters"] == whole["counters"]
    assert refreshed["n_total"] == whole["n_total"]


def test_tiny_width_collides_but_stays_one_sided(spark, skewed):
    rows, stream = skewed
    sk = FQ.cms_build(stream, "k", depth=2, width=16, num_shards=SHARDS)
    est = FQ.cms_estimate(
        rows.select("k", F.col("w").alias("exact")), "k", sk
    )
    est.cache()
    # collisions must inflate, never deflate
    assert est.filter(F.col("n_est") < F.col("exact")).count() == 0
    assert est.filter(F.col("n_est") > F.col("exact")).count() > 0
