"""Structured Streaming surface: the streaming plans must (a) run as real
streams against the events fixture via a file source + memory sink, and
(b) agree with their batch formulation (the point of the unified API)."""

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.sources import load_table
from subgraph_extractor_spark.streaming.demo import (
    run_memory_stream_demo,
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)


def test_stream_matches_batch(spark, sf_dir):
    streamed = run_memory_stream_demo(
        spark, f"{sf_dir}/events.parquet", window="10 minutes"
    )
    batch = tumbling_counts_stream(load_table(spark, sf_dir, "events"))
    s = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streamed.collect()
    }
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert s == b and len(s) > 0


def test_stateful_user_totals_stream(spark, sf_dir, tmp_path):
    import os

    from subgraph_extractor_spark.streaming.demo import stateful_user_totals

    ev = load_table(spark, sf_dir, "events")
    stage = tmp_path / "stream_src"
    stage.mkdir()
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), stage / "part-0.parquet"
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(str(stage))
    q = (
        stateful_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            "select * from user_totals"
        ).collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    # single source file -> one micro-batch -> one update row per user
    assert got == expected


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    import os

    from subgraph_extractor_spark.streaming.demo import (
        purchases_with_recent_clicks,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = purchases_with_recent_clicks(ev)
    expected = {tuple(r) for r in batch.collect()}
    assert expected, "fixture should produce purchase<-click joins"

    stage = tmp_path / "ss_src"
    stage.mkdir()
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), stage / "part-0.parquet"
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(str(stage))
    from pyspark.sql import types as T

    if isinstance(stream.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long")),
        )
    q = (
        purchases_with_recent_clicks(stream)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from ss_join").collect()}
    assert got == expected


def test_sliding_and_session_windows_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    slid = sliding_counts_stream(ev, window="10 minutes", slide="5 minutes")
    rows = slid.collect()
    assert rows
    # every event lands in exactly 2 sliding windows -> total count doubles
    total = sum(r["n_events"] for r in rows)
    assert total == 2 * ev.count()

    sess = sessionized_stream(ev, gap="30 minutes").collect()
    assert sess
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    # sessions of one user never overlap
    for windows in by_user.values():
        windows.sort()
        for (s1, e1), (s2, _) in zip(windows, windows[1:]):
            assert e1 <= s2


def test_stream_dedup_collapses_replayed_events(spark, sf_dir, tmp_path):
    """At-least-once replay: the same source file staged twice -> every
    event delivered twice; streaming exact dedup must collapse the stream
    back to one row per event_id (== the batch distinct)."""
    import os

    from subgraph_extractor_spark.streaming.demo import dedup_events_stream

    stage = tmp_path / "replayed_src"
    stage.mkdir()
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    os.symlink(src, stage / "part-0.parquet")
    os.symlink(src, stage / "part-1.parquet")  # the replay

    raw_schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")  # replay arrives in a LATER batch
        .parquet(str(stage))
    )
    q = (
        dedup_events_stream(stream)
        .select("event_id", "user_id", "event_type")
        .writeStream.format("memory")
        .queryName("deduped_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from deduped_events").collect()
    n_src = spark.read.parquet(src).count()
    assert len(got) == n_src  # every duplicate dropped, nothing else
    assert len({r["event_id"] for r in got}) == n_src


def test_ingest_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static continual-ingestion dedup: within-stream replays
    collapse AND rows whose content digest is already in the standing
    corpus table are dropped — and the streaming result equals the batch
    formulation of the same plan."""
    import os

    from subgraph_extractor_spark.streaming.demo import ingest_dedup_stream

    ev = load_table(spark, sf_dir, "events")
    # standing corpus: digests of 'click' content — clicks must be dropped
    corpus = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.sha2(F.col("event_type").cast("string"), 256).alias(
                "content_sha256"
            )
        )
        .distinct()
    )

    stage = tmp_path / "ingest_src"
    stage.mkdir()
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), stage / "part-0.parquet"
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(str(stage))
    q = (
        ingest_dedup_stream(stream, corpus)
        .writeStream.format("memory")
        .queryName("ingest_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.sql("select * from ingest_dedup").collect()
    got = {r["content_sha256"] for r in got_rows}
    # one survivor per new content digest (the in-stream content dedup);
    # which event carries it differs stream-vs-batch (arrival order vs
    # lowest key) so digests, not event ids, are the stable contract
    assert len(got_rows) == len(got) and got

    batch_rows = ingest_dedup_stream(ev, corpus).collect()
    want = {r["content_sha256"] for r in batch_rows}
    assert len(batch_rows) == len(want)
    assert got == want
    # no click content survived the standing-corpus probe
    kinds = {r["event_type"] for r in got_rows}
    assert "click" not in kinds and kinds


def test_transform_with_state_matches_legacy_and_batch(spark, sf_dir, tmp_path):
    # the Spark-4 transformWithStateInPandas operator must agree with the
    # legacy applyInPandasWithState operator and the batch aggregation.
    # The TWS state-server protocol needs google.protobuf, which this
    # container lacks — the operator is environment-gated, not stubbed.
    import os

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )

    from subgraph_extractor_spark.streaming.demo import (
        stateful_user_totals_tws,
    )

    ev = load_table(spark, sf_dir, "events")
    stage = tmp_path / "tws_src"
    stage.mkdir()
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"), stage / "part-0.parquet"
    )
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(str(stage))
    q = (
        stateful_user_totals_tws(stream)
        .writeStream.format("memory")
        .queryName("user_totals_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql("select * from user_totals_tws").collect()
    }
    expected = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expected


def test_transform_with_state_plan_builds(spark, sf_dir):
    # plan construction (analysis + schema) works without the protobuf
    # state server — only query START needs it, so this runs everywhere.
    from subgraph_extractor_spark.streaming.demo import (
        stateful_user_totals_tws,
    )

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(
        f"{sf_dir}"
    )
    out = stateful_user_totals_tws(stream)
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_events", "total_value",
    ]
    assert "TransformWithStateInPySpark" in out._jdf.queryExecution().analyzed().toString() or \
           "transformWithState" in out._jdf.queryExecution().analyzed().toString().lower()


def test_watermark_drops_late_data_in_append_mode(spark, tmp_path):
    """Late-data semantics: an event arriving in a later micro-batch
    with event time older than (max seen - watermark) must be DROPPED
    from append-mode windowed aggregation — the state-bounding contract
    a 100 TB stream depends on — while an in-watermark late event is
    still merged into its (not-yet-finalized) window."""
    import pandas as pd

    from subgraph_extractor_spark.streaming.demo import (
        tumbling_counts_stream,
    )

    stage = tmp_path / "late_src"
    stage.mkdir()
    base = pd.Timestamp("2026-01-01 12:00:00")
    # batch 1: events up to 12:00 -> after it, watermark = 12:00 - 10min
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [base - pd.Timedelta("2h"), base - pd.Timedelta("1h"), base],
            "user_id": [1, 1, 1],
            "event_type": ["click"] * 3,
            "value": [1.0, 1.0, 1.0],
            "props": ["{}"] * 3,
        }
    ).to_parquet(stage / "b1.parquet")
    raw_schema = spark.read.parquet(str(stage / "b1.parquet")).schema
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")

    def run():
        # file sink: the one append sink that supports checkpoint
        # recovery (the memory sink refuses to restart from one)
        stream = spark.readStream.schema(raw_schema).parquet(str(stage))
        q = (
            tumbling_counts_stream(
                stream, window="10 minutes", watermark="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    # run 1 processes b1; its final watermark (12:00 - 10min = 11:50)
    # is persisted in the checkpoint and finalizes the 10:00 and 11:00
    # windows into the append output
    run()
    got1 = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert got1 == {
        ("2026-01-01 10:00:00", 1),
        ("2026-01-01 11:00:00", 1),
    }, got1

    # run 2 (same checkpoint — the watermark survives the restart)
    # receives one event 3 hours LATE (before the persisted watermark ->
    # dropped by the stateful operator) and one 5 minutes late (inside
    # the watermark -> accepted into its open window)
    pd.DataFrame(
        {
            "event_id": [4, 5],
            "ts": [base - pd.Timedelta("3h"), base - pd.Timedelta("5min")],
            "user_id": [1, 1],
            "event_type": ["click"] * 2,
            "value": [1.0, 1.0],
            "props": ["{}"] * 2,
        }
    ).to_parquet(stage / "b2.parquet")
    q2 = run()
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q2.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, "the 3-hours-late event must be dropped"
    # the accepted 11:55 event sits in the still-open [11:50, 12:00)
    # window, so the file output gains no new finalized windows
    got2 = {
        (str(r["window_start"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == got1, got2


def test_standing_rollup_stream_matches_batch_bitwise(spark, sf_dir, tmp_path):
    """foreachBatch-maintained exact rollup state: two micro-batches of
    the events feed merged incrementally must serve a rollup
    bit-identical to the single-pass batch aggregate — whatever the
    batch boundaries (exact decimal state algebra)."""
    import os

    from subgraph_extractor_spark.operators import aggstate
    from subgraph_extractor_spark.streaming.demo import (
        serve_standing_rollup,
        standing_rollup_sink,
    )

    ev = load_table(spark, sf_dir, "events")
    stage = tmp_path / "rollup_src"
    stage.mkdir()
    # two staged FILES (the source lists files, not dirs) ->
    # maxFilesPerTrigger=1 forces two micro-batches
    import pyarrow.parquet as papq

    papq.write_table(
        ev.filter(F.col("event_id") % 2 == 0).toArrow(),
        str(stage / "p0.parquet"),
    )
    papq.write_table(
        ev.filter(F.col("event_id") % 2 == 1).toArrow(),
        str(stage / "p1.parquet"),
    )

    state_dir = str(tmp_path / "rollup_state")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage))
    )
    q = (
        stream.writeStream.foreachBatch(
            standing_rollup_sink(spark, state_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert len(os.listdir(state_dir)) >= 2  # one state version per batch

    got = sorted(map(tuple, serve_standing_rollup(spark, state_dir).collect()))
    want = sorted(map(tuple, aggstate.finalize_aggregates(
        aggstate.aggregate_state(ev, ["event_type"], "value")
    ).collect()))
    assert got == want

    # crash-replay: re-running a batch's fold under the SAME batch id
    # must re-merge into the prior version, not overwrite the standing
    # state with that batch alone (regression for replay-idempotence)
    fold = standing_rollup_sink(spark, str(tmp_path / "replay_state"))
    even = ev.filter(F.col("event_id") % 2 == 0)
    odd = ev.filter(F.col("event_id") % 2 == 1)
    fold(even, 0)
    fold(odd, 1)
    fold(odd, 1)  # crash-replay of batch 1
    replayed = sorted(map(tuple, serve_standing_rollup(
        spark, str(tmp_path / "replay_state")).collect()))
    assert replayed == want

    # lineage guard: a fresh run (batch ids restarting at 0) against a
    # state_dir that already holds newer versions must refuse instead
    # of serving/merging the dead run's state
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different run"):
        fold(even, 0)


def test_perceptual_dedup_sink_stream_equals_batch(spark, tmp_path):
    """Continual media ingestion: the union of per-batch incremental
    pairs equals the one-shot banded run over everything ingested
    (every pair is discovered exactly when its second member arrives),
    the served state is the full signature table, crash-replay rewrites
    rather than double-appends, and the lineage guard refuses stale
    batch ids."""
    import numpy as np
    import pytest as _pytest

    from subgraph_extractor_spark.operators import dedup as dedup_ops
    from subgraph_extractor_spark.operators import imagecodec as ic
    from subgraph_extractor_spark.operators import multimodal as mm
    from subgraph_extractor_spark.streaming.demo import (
        perceptual_dedup_sink,
        serve_perceptual_pairs,
        serve_perceptual_state,
    )

    # 4 groups x {base, near-twin, upscale} spread across 3 batches so
    # pairs span batch boundaries; plus junk that must vanish
    rows = []
    for g in range(4):
        rng = np.random.default_rng(7000 + g)
        base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        near = base.copy()
        near[0:5, 0:4] = 255 - near[0:5, 0:4]
        up = base.repeat(2, axis=0).repeat(2, axis=1)
        ppm = ("image/x-portable-pixmap", 24, 24, None)
        rows.append((10 * g + 1, "image", bytearray(ic.encode_ppm(base)), ppm))
        rows.append((10 * g + 2, "image", bytearray(ic.encode_ppm(near)), ppm))
        rows.append(
            (10 * g + 3, "image", bytearray(ic.encode_bmp(up)),
             ("image/bmp", 48, 48, None))
        )
    rows.append((97, "image", bytearray(b"junk"), ("image/x-ppm", 1, 1, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)

    state = str(tmp_path / "psig")
    pairs_dir = str(tmp_path / "ppairs")
    fold = perceptual_dedup_sink(spark, state, pairs_dir, kind="image")
    batches = [
        media.filter(F.col("media_id") % 3 == i) for i in range(3)
    ]
    for i, b in enumerate(batches):
        fold(b, i)

    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in serve_perceptual_pairs(spark, pairs_dir).collect()
    }
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup_ops.simhash_pairs_from_sigs(
            mm.image_dhash_signatures(media), max_distance=3
        ).collect()
    }
    assert got == full and full  # nonempty: the planted twins pair

    n_state = serve_perceptual_state(spark, state).count()
    assert n_state == 12  # junk dropped, one row per decodable image

    # crash-replay: refold the last batch — same pairs, same state
    fold(batches[2], 2)
    assert {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in serve_perceptual_pairs(spark, pairs_dir).collect()
    } == full
    assert serve_perceptual_state(spark, state).count() == n_state

    # lineage guard
    with _pytest.raises(ValueError):
        fold(batches[0], 0)
