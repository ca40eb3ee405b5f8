"""Structured Streaming surface over the events table ([ext], SURVEY §2.9).

The reference has no streaming — its incrementality is batch + watermark,
and late data cannot exist by construction (only complete partitions are
exported).  This module exposes the equivalent *streaming* formulations as
optional surface: tumbling / sliding windowed counts with event-time
watermarks, and session windows, plus a custom stateful operator via
``applyInPandasWithState`` shape.

Each builder takes any events-shaped DataFrame (batch or streaming:
identical plans — that is the point of Structured Streaming) with columns
(ts timestamp, user_id long, event_type string, value double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an events-shaped input's time column to TimestampType so
    event-time watermarks work, whatever the source session produced:

    - LongType (TIMESTAMP(NANOS) parquet read under nanosAsLong) →
      truncate to micros, rebuild the instant;
    - TIMESTAMP_NTZ (naive-micros parquet under NTZ inference; rejected
      by ``withWatermark``) → naive-UTC instant via the session-timezone-
      independent conversion shared with the batch readers.

    Every watermark-using builder in this module calls this first, so a
    readStream built before ``session.configure`` ran still works."""
    ts_type = df.schema[ts_col].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn(
            ts_col,
            F.timestamp_micros(
                F.floor(F.col(ts_col) / F.lit(1000)).cast("long")
            ),
        )
    if isinstance(ts_type, T.TimestampNTZType):
        from subgraph_extractor_spark.sources.readers import ntz_epoch_micros

        return df.withColumn(
            ts_col, F.timestamp_micros(ntz_epoch_micros(F.col(ts_col)))
        )
    return df


def tumbling_counts_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-event-type counts in tumbling windows; watermark bounds state."""
    src = _ensure_event_time(events)
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    src = _ensure_event_time(events)
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (gap-based)."""
    src = _ensure_event_time(events)
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState
    (SURVEY §2.9 [ext]): per-user running totals maintained in explicit
    state across micro-batches — the Spark-native form of a custom
    stateful operator the reference has no counterpart for."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # noqa: F811

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals on the Spark 4 ``transformWithStateInPandas``
    API — the successor to ``applyInPandasWithState`` (same semantics as
    :func:`stateful_user_totals`, asserted equal in tests).  State is an
    explicit named ValueState on a StatefulProcessor; unlike the legacy
    API, the processor composes multiple typed state variables
    (value/list/map), timers, and per-state TTL — the pieces a bounded
    100 TB streaming operator needs (state that expires instead of
    growing with key cardinality forever).

    Environment note: executing a TWS query requires ``google.protobuf``
    (the Python state-server protocol); on hosts without it the query
    fails at stream start.  The parity test importorskips accordingly —
    this is an environment gate, not a stub."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # noqa: F811

            prev = self._state.get()
            n, total = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def dedup_events_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the continuous-ingestion face of
    ``operators.dedup.exact_dedup``: re-delivered / replayed events
    (at-least-once sources) collapse to one row per key.
    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event
    time, so state size is O(events per watermark window), not O(stream
    history).  The same call degrades to a plain ``dropDuplicates`` on a
    batch input (unified API)."""
    src = _ensure_event_time(events)
    if src.isStreaming:
        return src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return src.dropDuplicates(list(key_cols))


def ingest_dedup_stream(
    batch: DataFrame,
    corpus_digests: DataFrame,
    content_col: str = "event_type",
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Continual-ingestion dedup as a stream: the streaming face of
    ``operators.dedup.exact_dedup_incremental``.  Within-stream replays
    collapse via watermark-bounded ``dropDuplicatesWithinWatermark``;
    then — matching the batch operator's full contract — rows whose
    content digest duplicates an EARLIER row of the stream collapse too
    (one survivor per digest; a second watermark-bounded dedup state on
    the digest), and rows whose digest already exists in the STANDING
    corpus digest table are dropped by a stream-static left-anti join
    (the static side is re-resolvable per micro-batch, so appending
    survivors to the digest table between batches is picked up
    automatically).  Same plan runs on a batch input (unified API); the
    batch branch picks the deterministic first occurrence per digest
    (lowest key), where a stream keeps the first ARRIVAL — the same
    semantics exact_dedup_incremental implements with its in-batch
    window."""
    deduped = dedup_events_stream(batch, key_cols, watermark)
    hashed = deduped.withColumn(
        "content_sha256", F.sha2(F.col(content_col).cast("string"), 256)
    )
    if hashed.isStreaming:
        hashed = hashed.dropDuplicatesWithinWatermark(["content_sha256"])
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("content_sha256").orderBy(*key_cols)
        hashed = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return hashed.join(
        corpus_digests.select("content_sha256"), "content_sha256", "left_anti"
    )


def purchases_with_recent_clicks(
    events: DataFrame, lookback: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join with an event-time range constraint:
    each purchase joined to the same user's clicks in the preceding
    ``lookback``.  On a stream, the watermarks + time-range predicate
    bound the join state Spark must keep (SURVEY §2.9 [ext]); the same
    plan runs unchanged on batch inputs."""
    events = _ensure_event_time(events)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("p_ts", watermark)
        clicks = clicks.withWatermark("c_ts", watermark)
    return purchases.join(
        clicks,
        on=[
            F.col("p_user") == F.col("c_user"),
            F.col("c_ts") <= F.col("p_ts"),
            F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"),
        ],
    ).select("p_user", "p_ts", "purchase_value", "c_ts")


def run_memory_stream_demo(spark, events_path: str, window: str = "10 minutes"):
    """End-to-end streaming smoke: read the events parquet as a file
    stream (one file = one micro-batch), aggregate tumbling counts into a
    memory sink, return the materialized result DataFrame."""
    import os
    import tempfile

    schema = spark.read.parquet(events_path).schema
    # file streams need a directory source; stage the fixture into one
    stage_dir = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(
        os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_dir)
    )
    stream = _ensure_event_time(stream)
    q = (
        tumbling_counts_stream(stream, window=window)
        .writeStream.format("memory")
        .queryName("events_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from events_tumbling")


# --------------------------------------------------------------------------
# standing rollup: exact aggregate state maintained by foreachBatch
# --------------------------------------------------------------------------

def _state_versions(state_dir: str) -> list[tuple[int, str]]:
    import os

    if not os.path.isdir(state_dir):
        return []
    return [
        (int(d[1:]), os.path.join(state_dir, d))
        for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    ]


def _latest_state_version(
    state_dir: str, before: int | None = None
) -> tuple[int, str] | None:
    versions = [
        v for v in _state_versions(state_dir)
        if before is None or v[0] < before
    ]
    return max(versions) if versions else None


def standing_rollup_sink(
    spark,
    state_dir: str,
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
):
    """foreachBatch sink maintaining an EXACT standing rollup from a
    stream — the streaming face of ``operators.aggstate``: each
    micro-batch is aggregated alone (touching only new data) and merged
    into the persisted state table; history is never rescanned.

    State versions are keyed by micro-batch id (``v{batch_id}``), which
    makes a replayed batch after crash-recovery overwrite its own
    version instead of double-counting — the standard foreachBatch
    idempotence idiom.  Because the state algebra is exact decimal
    (aggstate docstring), the served rollup is bit-identical to a batch
    groupBy over everything ingested, whatever the batch boundaries —
    the property the test certifies.
    """
    from subgraph_extractor_spark.operators import aggstate

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # a version NEWER than this batch means the directory holds
        # state from a different run (checkpoint recreated, state_dir
        # reused): merging lineages would double-count and serving the
        # global max would return the dead run's rollup — refuse loudly
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        new = aggstate.aggregate_state(batch_df, list(group_cols), value_col)
        # merge with the newest version STRICTLY OLDER than this batch:
        # a crash-replay of batch N must fold into v{N-1} again, not
        # skip the merge (which would overwrite vN with N's rows alone,
        # silently dropping all pre-N history), and not fold into its
        # own half-written vN (double count)
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = aggstate.merge_aggregate_states(
                spark.read.parquet(latest[1]), new
            )
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_standing_rollup(spark, state_dir: str) -> DataFrame:
    """Finalized rollup from the latest persisted state — reads the
    |groups|-row state table only, never the ingested history."""
    from subgraph_extractor_spark.operators import aggstate

    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no rollup state under {state_dir}")
    return aggstate.finalize_aggregates(spark.read.parquet(latest[1]))


def shard_append_sink(
    spark,
    data_dir: str,
    state_dir: str,
    id_col: str,
    num_shards: int,
    seed: str = "epoch0",
):
    """foreachBatch sink for CONTINUAL shuffled-shard ingestion — the
    streaming face of ``operators.shuffling.append_to_shards``: each
    micro-batch routes to shards by the standing (seed, id) hash rule
    with positions continuing after the persisted per-shard counts, so
    the growing corpus is always a valid training layout (standing rows
    never move; readers resume mid-shard across ingestion).

    Idempotence follows the standing-rollup idiom: batch rows land in
    ``data_dir/batch={id}`` (a replayed batch overwrites its own
    directory) and the counts state advances as ``state_dir/v{id}``,
    merged from the newest version STRICTLY older than the batch — a
    crash-replay recomputes the same placement instead of double-
    advancing the counts.  The same newer-version lineage guard as the
    rollup sink refuses state from a different run.
    """
    from subgraph_extractor_spark.operators.shuffling import (
        append_to_shards,
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; use a fresh "
                "state_dir (or restore the matching checkpoint)"
            )
        latest = _latest_state_version(state_dir, before=batch_id)
        counts = (
            batch_df.sparkSession.read.parquet(latest[1])
            if latest is not None
            else batch_df.sparkSession.createDataFrame(
                [], "shard int, n_rows long"
            )
        )
        placed = append_to_shards(
            batch_df, counts, id_col, num_shards, seed
        )
        placed.write.mode("overwrite").parquet(
            f"{data_dir}/batch={batch_id}"
        )
        batch_counts = placed.groupBy("shard").agg(
            F.count(F.lit(1)).alias("_n_new")
        )
        new_counts = (
            counts.join(batch_counts, "shard", "full")
            .select(
                "shard",
                (
                    F.coalesce("n_rows", F.lit(0))
                    + F.coalesce("_n_new", F.lit(0))
                ).alias("n_rows"),
            )
        )
        new_counts.write.mode("overwrite").parquet(
            f"{state_dir}/v{batch_id}"
        )

    return fold


def kmv_sketch_sink(
    spark,
    state_dir: str,
    value_col: str,
    k: int = 256,
    group_cols: tuple[str, ...] = (),
):
    """foreachBatch sink maintaining standing KMV corpus sketches — the
    streaming face of ``operators.sketches.kmv_sketch``: each
    micro-batch is sketched alone (touching only new data) and
    k-min-merged into the persisted sketch table, so corpus-overlap /
    distinct-estimate questions are answered from kilobytes of state
    while the stream keeps ingesting.  Same ``v{batch_id}`` idempotence
    and newer-version lineage guard as ``standing_rollup_sink``; the
    merge law sketch(A) ∪ sketch(B) == sketch(A ∪ B) (certified in
    tests) makes the served sketch bit-identical to a one-shot sketch
    of everything ingested, whatever the batch boundaries.
    """
    from subgraph_extractor_spark.operators import sketches as sk

    gcols = list(group_cols)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        new = sk.kmv_sketch(batch_df, value_col, k=k, group_cols=gcols)
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = sk.kmv_merge(
                spark.read.parquet(latest[1]).unionByName(new),
                k=k,
                group_cols=gcols,
            )
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_kmv_sketch(spark, state_dir: str) -> DataFrame:
    """Latest persisted sketch table — feed to ``kmv_jaccard`` /
    ``kmv_distinct_estimate`` without touching the ingested history."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no kmv state under {state_dir}")
    return spark.read.parquet(latest[1])


def perceptual_dedup_sink(
    spark,
    state_dir: str,
    pairs_dir: str,
    kind: str = "image",
    max_distance: int = 3,
    bands: int = 4,
):
    """foreachBatch sink for continual PERCEPTUAL media ingestion — the
    streaming face of ``operators.dedup.simhash_pairs_incremental``
    over the modality signature kernels (image dHash / audio spectral /
    video frame-majority).  Each micro-batch of MEDIA_SCHEMA rows is
    signature-hashed ONCE (payload bytes never re-read after this),
    probed against the standing signature table — batch × corpus and
    batch × batch pairs, never corpus × corpus, so per-batch work
    scales with the batch — and the batch signatures fold into the
    ``v{batch_id}`` state.  Near-dup pairs land under
    ``pairs_dir/v{batch_id}``; both writes are overwrite-by-version, so
    a crash-replayed batch reproduces its own pairs and state instead
    of double-appending.  Same newer-version lineage guard as the other
    standing-state sinks.  Serve with :func:`serve_perceptual_state` /
    :func:`serve_perceptual_pairs`."""
    from subgraph_extractor_spark.operators import dedup as _dedup
    from subgraph_extractor_spark.operators import multimodal as mm

    sig_fns = {
        "image": mm.image_dhash_signatures,
        "audio": mm.audio_spectral_signatures,
        "video": mm.video_dhash_signatures,
    }
    if kind not in sig_fns:
        raise ValueError(f"kind must be one of {sorted(sig_fns)}, got {kind}")
    sig_fn = sig_fns[kind]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        sigs = sig_fn(batch_df)
        latest = _latest_state_version(state_dir, before=batch_id)
        corpus = (
            spark.read.parquet(latest[1])
            if latest is not None
            else spark.createDataFrame([], "_id long, _sim long")
        )
        pairs = _dedup.simhash_pairs_incremental(
            sigs, corpus, max_distance=max_distance, bands=bands
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/v{batch_id}")
        (
            corpus.unionByName(sigs)
            .dropDuplicates(["_id", "_sim"])
            .write.mode("overwrite")
            .parquet(f"{state_dir}/v{batch_id}")
        )

    return fold


def serve_perceptual_state(spark, state_dir: str) -> DataFrame:
    """Latest standing signature table ``(_id, _sim)`` — 8 bytes of
    state per ingested media item; feed straight back to
    ``simhash_pairs_from_sigs`` for a full re-band or to the next
    ingest probe."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no perceptual state under {state_dir}")
    return spark.read.parquet(latest[1])


def serve_perceptual_pairs(spark, pairs_dir: str) -> DataFrame:
    """Union of every batch's emitted near-dup pairs (id_a, id_b,
    hamming) — distinct, since a pair discovered at ingest time is
    never re-discovered by a later batch (its members are both corpus
    by then), but a crash-replayed batch rewrites its own version."""
    latest = _latest_state_version(pairs_dir)
    if latest is None:
        raise FileNotFoundError(f"no pairs under {pairs_dir}")
    return (
        spark.read.option("basePath", pairs_dir)
        .parquet(f"{pairs_dir}/v*")
        .distinct()
    )


def dsir_counts_sink(
    spark,
    state_dir: str,
    text_col: str = "text",
    buckets: int = 4096,
):
    """foreachBatch sink maintaining the standing hashed-bigram count
    model for DSIR importance selection (operators/dsir.py) — the
    raw-pool model refreshes as the crawl streams in, so scoring a new
    snapshot never rescans ingested history.  Counts are mergeable by
    addition and the state is at most ``buckets`` rows, making this
    the cheapest standing state in the repo.  Same v{batch_id}
    overwrite idempotence + foreign-state guard as
    ``standing_rollup_sink``; stream==batch (exact integer counts) is
    the tested contract."""
    from subgraph_extractor_spark.operators import dsir

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        new = dsir.hashed_bigram_counts(batch_df, text_col, buckets)
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = dsir.merge_hashed_counts(
                spark.read.parquet(latest[1]), new
            )
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_dsir_counts(spark, state_dir: str) -> DataFrame:
    """The standing hashed-bigram count model from the latest persisted
    version — feed it to ``dsir.importance_weights`` as the raw side
    (<= buckets rows read, never the ingested history)."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no dsir count state under {state_dir}")
    return spark.read.parquet(latest[1])


def _compact_versions(state_dir: str) -> list[tuple[int, str]]:
    """``c{n}`` compacted-snapshot dirs under a chunk state dir."""
    import os

    if not os.path.isdir(state_dir):
        return []
    return [
        (int(d[1:]), os.path.join(state_dir, d))
        for d in os.listdir(state_dir)
        if d.startswith("c") and d[1:].isdigit()
    ]


def _delta_state_parts(state_dir: str, before: int | None = None) -> list[str]:
    """Read-set of an append-only delta state: the latest COMMITTED
    compacted snapshot (version < ``before`` when given) plus every
    delta dir after it.  A snapshot without its ``_SUCCESS`` marker is
    a crash-interrupted compaction — reading it would silently LOSE
    the rows its missing part-files held, so it is skipped and the
    read falls back to the previous snapshot + its cycle's deltas,
    which :func:`_compact_and_prune` deliberately retains until the
    NEXT compaction lands.  (Deltas need no such check: a partial
    delta only under-serves its own uncommitted batch, which the
    stream replays and rewrites.)"""
    import os

    compacts = [
        (v, p)
        for v, p in _compact_versions(state_dir)
        if (before is None or v < before)
        and os.path.exists(os.path.join(p, "_SUCCESS"))
    ]
    base = max(compacts) if compacts else None
    lo = base[0] if base else -1
    return ([base[1]] if base else []) + [
        p
        for v, p in _state_versions(state_dir)
        if v > lo and (before is None or v < before)
    ]


def _compact_and_prune(
    spark,
    state_dir: str,
    batch_id: int,
    compact_every: int,
    make_state,
) -> None:
    """Shared housekeeping for append-only delta sinks: when
    ``compact_every`` deltas have accumulated since the previous
    snapshot, write ``make_state()`` as ``c{batch_id}`` and prune
    ONLY what the PREVIOUS snapshot supersedes — the previous
    snapshot and its cycle's deltas stay on disk until the next
    compaction, so a crash-replayed batch (including the compacting
    one) can always rebuild its pre-batch state, and storage stays
    bounded at <= 2 snapshots + ~2 cycles of deltas.  (Local-path
    pruning — these demo sinks address state dirs on the driver's
    filesystem; an object-store deployment would route the same
    removals through fsio.)"""
    compacts = [
        (v, p) for v, p in _compact_versions(state_dir) if v < batch_id
    ]
    prev = max(compacts) if compacts else None
    lo = prev[0] if prev else -1
    n_deltas = len(
        [v for v, _ in _state_versions(state_dir) if lo < v <= batch_id]
    )
    if n_deltas < compact_every:
        return False
    make_state().write.mode("overwrite").parquet(
        f"{state_dir}/c{batch_id}"
    )
    if prev is not None:
        import shutil

        for v, p in _state_versions(state_dir):
            if v <= prev[0]:
                shutil.rmtree(p, ignore_errors=True)
        for v, p in _compact_versions(state_dir):
            if v < prev[0]:
                shutil.rmtree(p, ignore_errors=True)
    return True


def _empty_chunk_state(spark, batch_df: DataFrame, id_col: str) -> DataFrame:
    """Zero-row chunk state whose id column type is DERIVED from the
    incoming batch (ADVICE r7: a hardcoded ``long`` broke the first
    micro-batch of any stream whose id column is not LONG)."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    return spark.createDataFrame(
        [],
        StructType(
            [
                StructField(id_col, batch_df.schema[id_col].dataType),
                StructField("chunk_pos", IntegerType()),
                StructField("chunk_sha", StringType()),
            ]
        ),
    )


def cdc_chunks_sink(
    spark,
    state_dir: str,
    kept_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 8,
    compact_every: int = 16,
):
    """foreachBatch sink for continual CONTENT-DEFINED chunk dedup —
    the streaming face of ``operators.dedup.cdc_chunk_dedup_incremental``.
    Each micro-batch of documents is chunked on rolling boundaries
    (map-only fold over the BATCH), its novel chunks are found against
    the standing ``(chunk_sha)`` table, and survivors land TWICE:
    under ``kept_dir/v{batch_id}`` (the per-batch survivor record) and
    as an APPEND-ONLY delta ``state_dir/v{batch_id}``.

    Unlike the repo's other standing-state sinks — whose state is one
    row per item (8-byte signatures) or <= buckets rows (DSIR), making
    a full overwrite per batch cheap — the chunk table is ~one row per
    distinct chunk corpus-wide (~n_tokens/divisor rows), so the r7
    full-rewrite design was O(corpus) write amplification per
    micro-batch (the one scale-killer the r7 review flagged).  This
    version writes O(batch) per batch: the delta is exactly the novel
    chunks, the standing state is the union of a compacted snapshot
    plus the deltas after it, and every ``compact_every`` deltas the
    sink folds them into a fresh ``c{batch_id}`` snapshot (the
    amortized O(corpus/compact_every)-per-batch housekeeping) and
    prunes dirs superseded by the PREVIOUS snapshot — one full
    compaction cycle is always retained so a crash-replayed batch can
    still reconstruct its pre-batch corpus, and storage stays bounded
    at <= 2 snapshots + ~2x``compact_every`` deltas (ADVICE r7: the r7
    sink never pruned old versions).

    Idempotence: both per-batch writes are overwrite-by-version, and
    the newer-version lineage guard (deltas AND snapshots) rejects
    foreign state, exactly as every other sink here.  Serve with
    :func:`serve_cdc_chunks`.  For ingest volumes where even the
    batch-side shuffle of the corpus probe matters, see
    :func:`cdc_chunks_sink_bucketed`."""
    from subgraph_extractor_spark.operators import dedup as _dedup

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = sorted(
            v
            for v, _ in _state_versions(state_dir)
            + _compact_versions(state_dir)
            if v > batch_id
        )
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {ahead} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        parts = _delta_state_parts(state_dir, before=batch_id)
        corpus = (
            spark.read.parquet(*parts)
            if parts
            else _empty_chunk_state(spark, batch_df, id_col)
        )
        kept = _dedup.cdc_chunk_dedup_incremental(
            batch_df, id_col, text_col, corpus, divisor=divisor
        )
        kept.write.mode("overwrite").parquet(f"{kept_dir}/v{batch_id}")
        # re-read the committed survivors for the remaining writes so
        # the chunking plan runs once, not once per sink
        kept = spark.read.parquet(f"{kept_dir}/v{batch_id}")
        kept.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")
        _compact_and_prune(
            spark, state_dir, batch_id, compact_every,
            lambda: corpus.unionByName(kept),
        )

    return fold


def serve_cdc_chunks(spark, state_dir: str) -> DataFrame:
    """Standing chunk table (id, chunk_pos, chunk_sha) — one row per
    distinct chunk corpus-wide, owned by its first (doc, pos): the
    latest committed compacted snapshot unioned with the deltas after
    it (the union-on-read face of :func:`cdc_chunks_sink`'s
    append-only state)."""
    parts = _delta_state_parts(state_dir)
    if not parts:
        raise FileNotFoundError(f"no cdc chunk state under {state_dir}")
    return spark.read.parquet(*parts)


def cdc_chunks_sink_bucketed(
    spark,
    table: str,
    kept_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 8,
    n_buckets: int = 32,
):
    """:func:`cdc_chunks_sink` with the standing chunk state in a
    catalog table PARTITIONED by ingest version and BUCKETED by
    ``chunk_sha`` — the scale shape the r7 review prescribed: the
    per-ingest left-anti probe's corpus side is read straight out of
    its buckets with NO exchange (plan-asserted in
    tests/test_dedup.py), so each micro-batch shuffles only its own
    rows, however large the standing corpus grows.  Appends are
    O(batch) like the path sink's deltas; there is no compaction to
    run because the table IS the compact representation (partition
    dirs per ingest, bucket files per hash range).

    Idempotence: a crash-replayed batch first drops its own
    ``_v = batch_id`` partition (metadata-only DDL) and re-appends —
    overwrite-by-version at partition granularity; the lineage guard
    reads ``max(_v)`` off parquet stats.  Serve with
    :func:`serve_cdc_chunks_bucketed`.

    Size ``n_buckets`` to the probe's shuffle partitioning
    (``spark.sql.shuffle.partitions`` of the ingesting session): the
    bucketed scan only satisfies the anti-join's required distribution
    — and so skips the corpus exchange — when the bucket count matches
    the join's partition count; on a mismatch Spark's
    DisableUnnecessaryBucketedScan rule silently falls back to a plain
    scan + exchange."""
    from subgraph_extractor_spark.operators import dedup as _dedup

    def _exists() -> bool:
        return spark.catalog.tableExists(table)

    def _max_version() -> int | None:
        # catalog partition listing, not a data scan: the lineage
        # guard must stay O(#partitions) however large the standing
        # state grows (a max(_v) aggregate would touch every file's
        # footer per micro-batch)
        rows = spark.sql(f"SHOW PARTITIONS {table}").collect()
        vs = [
            int(r[0].split("=", 1)[1])
            for r in rows
            if r[0].startswith("_v=")
        ]
        return max(vs) if vs else None

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if _exists():
            maxv = _max_version()
            if maxv is not None and maxv > batch_id:
                raise ValueError(
                    f"table {table} holds version {maxv} beyond batch "
                    f"{batch_id} — state from a different run; point the "
                    "sink at a fresh table (or restore the checkpoint)"
                )
            spark.sql(
                f"ALTER TABLE {table} DROP IF EXISTS PARTITION "
                f"(_v = {batch_id})"
            )
            corpus = (
                spark.table(table)
                .filter(F.col("_v") < batch_id)
                .drop("_v")
            )
        else:
            corpus = _empty_chunk_state(spark, batch_df, id_col)
        kept = _dedup.cdc_chunk_dedup_incremental(
            batch_df, id_col, text_col, corpus, divisor=divisor
        )
        kept.write.mode("overwrite").parquet(f"{kept_dir}/v{batch_id}")
        kept = spark.read.parquet(f"{kept_dir}/v{batch_id}")
        (
            kept.withColumn("_v", F.lit(batch_id))
            .write.mode("append")
            .format("parquet")
            .partitionBy("_v")
            .bucketBy(n_buckets, "chunk_sha")
            .sortBy("chunk_sha")
            .saveAsTable(table)
        )

    return fold


def serve_cdc_chunks_bucketed(spark, table: str) -> DataFrame:
    """Standing chunk table from the bucketed sink — the served face
    drops the ingest-version bookkeeping column."""
    if not spark.catalog.tableExists(table):
        raise FileNotFoundError(f"no cdc chunk state table {table}")
    return spark.table(table).drop("_v")


def ivfpq_codes_sink(
    spark,
    model_path: str,
    codes_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale_bits: int = 16,
    compact_every: int = 64,
    carry_cols: list[str] | None = None,
):
    """foreachBatch sink for CONTINUAL VECTOR INGEST into a standing
    IVF-PQ index — the streaming face of the r7 serving split and the
    FAISS ``add()`` lifecycle: the bounded model (cells + codebooks,
    persisted once via ``pq.save_index_model``) is loaded at sink
    construction, each micro-batch of vectors encodes against it with
    the map-only ``pq.ivfpq_encode`` (no retrain, no shuffle), and the
    8-byte codes land as an overwrite-by-version delta
    ``codes_dir/v{batch_id}`` — O(batch) write per batch by
    construction (one code row per ingested vector).  Every
    ``compact_every`` deltas the shared :func:`_compact_and_prune`
    housekeeping folds them into one snapshot and prunes the previous
    cycle, so a long-lived ingest doesn't accrete unbounded small
    files under the serve-side union.  Serve searches over the
    growing index with :func:`serve_ivfpq_codes`; encoded batches are
    bit-identical to what a full rebuild with the same model would
    emit (ivfpq_build_index routes through the same encoder), which
    is the stream==batch contract the test pins.

    ``carry_cols`` stream metadata columns into the code deltas (the
    filtered-serving face, ``ivfpq_encode(carry_cols=...)``):
    compaction and tombstones are schema-agnostic, so
    ``ivfpq_search(filter_expr=...)`` over :func:`serve_ivfpq_codes`
    output works unchanged on a continually-ingested index."""
    from subgraph_extractor_spark.operators import pq as _pq

    cells, codebooks = _pq.load_index_model(model_path)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = sorted(
            v
            for v, _ in _state_versions(codes_dir)
            + _compact_versions(codes_dir)
            if v > batch_id
        )
        if ahead:
            raise ValueError(
                f"{codes_dir} holds versions {ahead} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh codes_dir (or restore the matching checkpoint)"
            )
        prior = _delta_state_parts(codes_dir, before=batch_id)
        _pq.ivfpq_encode(
            batch_df, vec_col, id_col, cells, codebooks,
            scale_bits=scale_bits, carry_cols=carry_cols,
        ).write.mode("overwrite").parquet(f"{codes_dir}/v{batch_id}")
        tombs = _tombstone_versions(codes_dir)

        def _state() -> DataFrame:
            st = spark.read.parquet(
                *(prior + [f"{codes_dir}/v{batch_id}"])
            )
            if tombs:
                st = st.join(
                    spark.read.parquet(*[p for _, p in tombs]),
                    "id",
                    "left_anti",
                )
            return st

        if _compact_and_prune(
            spark, codes_dir, batch_id, compact_every, _state
        ):
            # the snapshot physically dropped the tombstoned rows —
            # clear the applied tombstones (a crash before this point
            # just re-applies them next time: anti-joining absent ids
            # is a no-op, so the clearing is idempotent)
            import shutil

            for _, p in tombs:
                shutil.rmtree(p, ignore_errors=True)

    return fold


def _tombstone_versions(codes_dir: str) -> list[tuple[int, str]]:
    """``t{n}`` tombstone dirs under a code state dir."""
    import os

    if not os.path.isdir(codes_dir):
        return []
    return [
        (int(d[1:]), os.path.join(codes_dir, d))
        for d in os.listdir(codes_dir)
        if d.startswith("t") and d[1:].isdigit()
    ]


def ivfpq_remove_ids(
    spark, codes_dir: str, ids_df: DataFrame, version: int | None = None
) -> None:
    """Delete vectors from the standing IVF-PQ index — the FAISS
    ``remove_ids`` lifecycle face, implemented the way a production
    log-structured index does it: the ids land as a TOMBSTONE set
    (``codes_dir/t{n}``, O(deleted) bytes — the code table is never
    rewritten here), :func:`serve_ivfpq_codes` anti-joins them out at
    read time (logical delete, effective immediately), and the next
    sink compaction drops the rows physically and clears the applied
    tombstones.  ``ids_df`` must carry the vector ids in a column
    named ``id`` (or a single column, which is renamed).

    Contract: a tombstoned id stays hidden until a compaction clears
    the tombstone — re-ingesting the SAME id within the current
    compaction cycle is therefore also hidden (delete-then-reinsert
    needs an intervening compaction or a fresh id; FAISS remove_ids
    has no reinsert semantics either).  Pass an explicit ``version``
    to make a replayed delete overwrite its own tombstone set instead
    of appending a new one."""
    cols = ids_df.columns
    ids = ids_df if "id" in cols else ids_df.withColumnRenamed(cols[0], "id")
    if version is None:
        existing = _tombstone_versions(codes_dir)
        version = (max(v for v, _ in existing) + 1) if existing else 0
    ids.select("id").distinct().write.mode("overwrite").parquet(
        f"{codes_dir}/t{version}"
    )


def serve_ivfpq_codes(spark, codes_dir: str) -> DataFrame:
    """The standing (id, cell, codes) table across every ingested
    version — feed it to ``pq.ivfpq_search`` as the code table: the
    latest committed snapshot plus the deltas after it, minus any
    pending tombstones (:func:`ivfpq_remove_ids`).  No distinct is
    needed — versions hold disjoint id sets by the sink's
    overwrite-by-version idempotence."""
    parts = _delta_state_parts(codes_dir)
    if not parts:
        raise FileNotFoundError(f"no ivfpq code state under {codes_dir}")
    out = spark.read.parquet(*parts)
    tombs = _tombstone_versions(codes_dir)
    if tombs:
        out = out.join(
            spark.read.parquet(*[p for _, p in tombs]), "id", "left_anti"
        )
    return out


def champion_lists_sink(
    spark,
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    m: int = 16,
):
    """foreachBatch sink maintaining the standing champion-list state
    (operators/retrieval.py::champion_lists) — continual lexical index
    maintenance, the pruned-serving twin of ``ivfpq_codes_sink``: each
    micro-batch of NEW documents is champion-indexed on its own and
    folded into the standing state with
    :func:`~subgraph_extractor_spark.operators.retrieval.merge_champion_lists`,
    which is EXACT for disjoint doc sets (top-m is mergeable; impact
    is a pure function of the document) — the served ranking is
    bit-identical to a one-shot rebuild, certified stream==batch in
    pytest.  The ingested corpus text is never re-tokenized.

    The state is at most m rows per distinct token — the rollup-sized
    standing state class (like the DSIR counts), so the
    v{batch_id}-overwrite idempotence + foreign-state guard pattern
    applies as-is; a crash-replayed batch re-merges against the
    PRE-batch version (``before=batch_id``) instead of double-counting
    doc_freq/n_docs.  Re-crawled content (same doc id again) violates
    the merge face's disjointness contract — route re-crawls through a
    rebuild, or dedup ids upstream (the CDC novelty signal exists for
    exactly that routing decision).
    """
    from subgraph_extractor_spark.operators import retrieval

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        if batch_df.isEmpty():
            # defense in depth (the mg sink discipline): an empty batch
            # folds as the identity anyway (champion_lists emits an
            # n_docs-0 anchor, merge adds 0), but a new state version
            # for it buys nothing — leave the standing state untouched
            return
        new = retrieval.champion_lists(batch_df, id_col, text_col, m=m)
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = retrieval.merge_champion_lists(
                spark.read.parquet(latest[1]), new, m=m
            )
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_champion_lists(spark, state_dir: str) -> DataFrame:
    """The standing champion-list state from the latest persisted
    version — feed it to ``retrieval.champion_topk`` (the state is
    self-contained: impacts, doc_freq and n_docs all ride along)."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no champion state under {state_dir}")
    return spark.read.parquet(latest[1])


def mg_heavy_hitters_sink(
    spark,
    state_dir: str,
    key_col: str = "key",
    m: int = 64,
):
    """foreachBatch sink maintaining the standing Misra-Gries
    heavy-hitter summary (operators/freq.py::mg_summary/mg_merge) —
    bounded continual frequency tracking: each micro-batch summarizes
    alone (top-m exact counts) and folds into the standing state with
    the PODS'12 merge, so the state never exceeds m rows and the
    ingested history is never recounted.  The validity law (counter <=
    true, true - counter <= err for every key ever streamed) holds
    across the fold — any key whose total frequency exceeds the served
    ``err`` is guaranteed present.

    Same v{batch_id} overwrite idempotence + foreign-state guard as
    the DSIR counts sink; a crash-replayed batch re-merges against the
    PRE-batch version instead of double-counting.
    """
    from subgraph_extractor_spark.operators import freq

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        if batch_df.isEmpty():
            # defense in depth: an empty micro-batch folds as the MG
            # identity anyway (mg_summary emits a metadata anchor row,
            # never zero rows), but writing a new state version for it
            # buys nothing — skip so the standing state is untouched.
            return
        new = freq.mg_summary(batch_df.select(key_col), key_col, m)
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = freq.mg_merge(spark.read.parquet(latest[1]), new, m)
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_mg_heavy_hitters(spark, state_dir: str) -> DataFrame:
    """The standing heavy-hitter summary from the latest persisted
    version — (key, counter, n_total, err), self-contained.  Key rows
    have counter >= 1; the one (key NULL, counter 0) row is the
    metadata anchor that keeps (n_total, err) alive even when every
    key cancels (filter ``counter > 0`` for display)."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no MG summary state under {state_dir}")
    return spark.read.parquet(latest[1])


def quantile_summary_sink(
    spark,
    state_dir: str,
    value_col: str = "value",
    k: int = 64,
):
    """foreachBatch sink maintaining the standing mergeable quantile
    summary (operators/quantiles.py) — continual distribution tracking
    (document-length / score drift over an ingested corpus): each
    micro-batch builds its own k-row summary and collapses into the
    standing state, which never exceeds k+1 rows and answers any
    rank/quantile query within the carried error bound; history is
    never re-sorted.  Same v{batch_id} overwrite idempotence +
    foreign-state guard as the MG sink; a crash-replayed batch
    re-merges against the PRE-batch version instead of double-counting
    n_total."""
    from subgraph_extractor_spark.operators import quantiles

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ahead = [v for v, _ in _state_versions(state_dir) if v > batch_id]
        if ahead:
            raise ValueError(
                f"{state_dir} holds versions {sorted(ahead)} beyond batch "
                f"{batch_id} — state from a different run; point the sink "
                "at a fresh state_dir (or restore the matching checkpoint)"
            )
        if batch_df.isEmpty():
            # an empty batch folds as the identity (the summary's
            # metadata anchor makes that safe), but a new state
            # version buys nothing — the MG sink discipline
            return
        new = quantiles.quantile_summary(
            batch_df.select(value_col), value_col, k
        )
        latest = _latest_state_version(state_dir, before=batch_id)
        if latest is not None:
            new = quantiles.quantile_merge(
                spark.read.parquet(latest[1]), new, k
            )
        new.write.mode("overwrite").parquet(f"{state_dir}/v{batch_id}")

    return fold


def serve_quantile_summary(spark, state_dir: str) -> DataFrame:
    """The standing quantile summary from the latest persisted version
    — (idx, value, weight, n_total, err), self-contained; feed it to
    ``quantiles.quantile_estimate``.  Sample rows have weight >= 1;
    the one weight-0 row is the metadata anchor."""
    latest = _latest_state_version(state_dir)
    if latest is None:
        raise FileNotFoundError(f"no quantile summary state under {state_dir}")
    return spark.read.parquet(latest[1])
