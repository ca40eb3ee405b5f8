"""Dataset content fingerprints: multiset semantics, layout
independence, sensitivity, and canonical-form edge cases."""

from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.fingerprint import (
    dataset_fingerprint,
    grouped_fingerprints,
)


def _fp(df, cols=None):
    r = dataset_fingerprint(df, cols).head()
    return (r["n_rows"], r["fingerprint"])


def test_layout_and_order_independent(spark, sf_dir):
    from subgraph_extractor_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "text"]
    a = _fp(d, cols)
    b = _fp(d.repartition(17), cols)
    c = _fp(d.orderBy(F.desc("doc_id")), cols)
    assert a == b == c


def test_detects_any_single_row_change(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    )
    changed = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "c")], ["id", "v"]
    )
    dropped = spark.createDataFrame([(1, "a"), (3, "c")], ["id", "v"])
    duped = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], ["id", "v"]
    )
    f = _fp(base)
    assert _fp(changed) != f
    assert _fp(dropped) != f
    assert _fp(duped) != f  # multiset: duplicates change the sum


def test_null_distinct_from_null_string_and_empty(spark):
    a = spark.createDataFrame([(1, None)], "id int, v string")
    b = spark.createDataFrame([(1, "NULL")], "id int, v string")
    c = spark.createDataFrame([(1, "")], "id int, v string")
    assert len({_fp(a)[1], _fp(b)[1], _fp(c)[1]}) == 3


def test_grouped_fingerprints_localize_differences(spark):
    a = spark.createDataFrame(
        [("x", 1, "p"), ("x", 2, "q"), ("y", 3, "r")], ["g", "id", "v"]
    )
    b = spark.createDataFrame(
        [("x", 1, "p"), ("x", 2, "q"), ("y", 3, "R")], ["g", "id", "v"]
    )
    fa = {r["g"]: r["fingerprint"] for r in grouped_fingerprints(a, "g").collect()}
    fb = {r["g"]: r["fingerprint"] for r in grouped_fingerprints(b, "g").collect()}
    assert fa["x"] == fb["x"]
    assert fa["y"] != fb["y"]


def test_merge_equals_single_pass(spark, sf_dir):
    from subgraph_extractor_spark.operators.fingerprint import (
        merge_fingerprints,
    )
    from subgraph_extractor_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "text"]
    whole = dataset_fingerprint(d, cols)
    parts = dataset_fingerprint(
        d.filter(F.col("doc_id") % 3 == 0), cols
    ).unionByName(
        dataset_fingerprint(d.filter(F.col("doc_id") % 3 == 1), cols)
    ).unionByName(
        dataset_fingerprint(d.filter(F.col("doc_id") % 3 == 2), cols)
    )
    assert merge_fingerprints(parts).head() == whole.head()


def test_streaming_certificate_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch-folded certificates: two micro-batches' one-row
    fingerprints merged incrementally equal the single-pass batch
    fingerprint of the whole feed — whatever the batch boundaries."""
    import pyarrow.parquet as papq

    from subgraph_extractor_spark.operators.fingerprint import (
        merge_fingerprints,
    )
    from subgraph_extractor_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    stage = tmp_path / "fp_src"
    stage.mkdir()
    papq.write_table(
        ev.filter(F.col("event_id") % 2 == 0).toArrow(),
        str(stage / "p0.parquet"),
    )
    papq.write_table(
        ev.filter(F.col("event_id") % 2 == 1).toArrow(),
        str(stage / "p1.parquet"),
    )
    state = str(tmp_path / "fp_state")

    def fold(batch_df, batch_id):
        dataset_fingerprint(batch_df).write.mode("append").parquet(state)

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage))
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "fp_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    parts = spark.read.parquet(state)
    assert parts.count() == 2  # one certificate per micro-batch
    assert (
        merge_fingerprints(parts).head()
        == dataset_fingerprint(ev).head()
    )
