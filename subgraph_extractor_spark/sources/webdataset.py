"""WebDataset-style tar-shard I/O for multimodal training data.

Large-scale multimodal corpora ship as tar shards (WebDataset layout:
one sample = sibling tar members ``<key>.<ext>``; shards are the unit of
parallelism, sequential-read-friendly on object stores).  This module
gives the engine that container format with stdlib ``tarfile`` only —
no webdataset package dependency — shaped for Spark's execution model:

- **Writer**: one Arrow-batched ``mapInPandas`` pass; each task streams
  its partition into rolling tar shards (size- and count-capped) through
  ``fsio`` (pyarrow.fs — local/s3/gs/hdfs/mock), and yields ONE manifest
  row per shard.  Bytes never touch the driver; the returned manifest
  DataFrame is the sink's commit record (count it to materialize).
  Shard names are deterministic: ``<prefix>-<partition:05d>-<seq:04d>.tar``
  — re-running the same partitioning overwrites the same shard files
  (idempotent re-run), and a sort within partitions makes shard contents
  byte-stable.
- **Reader**: ``spark.read.format("binaryFile")`` over the shard glob
  (one task per shard — exactly the WebDataset parallelism contract),
  then a ``mapInPandas`` ungroup of tar members into
  ``(key, ext, payload)`` rows; ``group_samples`` pivots member rows to
  one row per sample with a ``map<ext, binary>``.

At 100 TB: shard size (default 256 MiB) is the knob — it bounds task
memory on BOTH sides (a whole shard is held in memory while packing /
unpacking; binaryFile ships each tar as one in-memory blob) and sets
the task count.  Samples are never split across shards.
"""

from __future__ import annotations

import io
import json
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from subgraph_extractor_spark import fsio

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_key", T.StringType()),
        T.StructField("last_key", T.StringType()),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_path", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic uncompressed tar: fixed mtime/uid/gid/mode so the
    same members always produce byte-identical shards (re-run == no-op
    for downstream content hashing)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_tar_shards(
    media: DataFrame,
    out_dir: str,
    prefix: str = "shard",
    max_shard_bytes: int = 256 * 1024 * 1024,
    max_shard_items: int | None = None,
) -> DataFrame:
    """Write a media DataFrame (``operators.multimodal.MEDIA_SCHEMA``:
    media_id, kind, payload, meta) as WebDataset tar shards; returns the
    lazy one-row-per-shard manifest DataFrame (trigger with an action).

    Each sample packs two members: ``<id:012d>.<kind>`` (the payload)
    and ``<id:012d>.json`` (the metadata struct as JSON).  Partitions
    are sorted by media_id before packing, so shard contents are a pure
    function of the input partitioning.  A shard rolls when adding the
    NEXT sample would cross ``max_shard_bytes`` (payload-sum basis) or
    ``max_shard_items``; a single oversized sample still lands alone in
    its own shard rather than failing."""
    fs, root = fsio.resolve(out_dir)
    fsio.makedirs(fs, root)

    src = media.select(
        "media_id", "kind", "payload", F.to_json("meta").alias("_meta_json")
    ).sortWithinPartitions("media_id")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fs_w, root_w = fsio.resolve(out_dir)
        state = {"members": [], "bytes": 0, "items": 0, "seq": 0,
                 "first": None, "last": None}
        out_rows = []

        def flush():
            if not state["members"]:
                return
            shard_name = f"{prefix}-{pid:05d}-{state['seq']:04d}.tar"
            p = f"{root_w.rstrip('/')}/{shard_name}"
            data = _tar_bytes(state["members"])
            fsio.write_bytes_atomic(fs_w, p, data)
            out_rows.append(
                {
                    "shard_path": p,
                    "n_samples": state["items"],
                    "n_bytes": len(data),
                    "first_key": state["first"],
                    "last_key": state["last"],
                }
            )
            state.update(members=[], bytes=0, items=0, seq=state["seq"] + 1,
                         first=None, last=None)

        for pdf in batches:
            for mid, kind, payload, meta_json in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["_meta_json"]
            ):
                key = f"{int(mid):012d}"
                payload = bytes(payload) if payload is not None else b""
                meta_b = (meta_json or "{}").encode("utf-8")
                sample_bytes = len(payload) + len(meta_b)
                would_roll = state["items"] > 0 and (
                    state["bytes"] + sample_bytes > max_shard_bytes
                    or (
                        max_shard_items is not None
                        and state["items"] >= max_shard_items
                    )
                )
                if would_roll:
                    flush()
                state["members"].append((f"{key}.{kind}", payload))
                state["members"].append((f"{key}.json", meta_b))
                state["bytes"] += sample_bytes
                state["items"] += 1
                state["last"] = key
                if state["first"] is None:
                    state["first"] = key
        flush()
        yield pd.DataFrame(
            out_rows,
            columns=[f.name for f in MANIFEST_SCHEMA.fields],
        )

    return src.mapInPandas(pack, MANIFEST_SCHEMA)


def read_tar_members(spark: SparkSession, shard_glob: str) -> DataFrame:
    """(shard_path, key, ext, payload) — one row per tar member across
    every shard matching the glob.  One binaryFile task per shard (the
    WebDataset parallelism contract); each task unpacks only its own
    shard in memory."""
    raw = spark.read.format("binaryFile").load(shard_glob).select(
        "path", "content"
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = []
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r"
                ) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        key, dot, ext = m.name.partition(".")
                        rows.append(
                            {
                                "shard_path": path,
                                "key": key,
                                "ext": ext if dot else "",
                                "payload": tf.extractfile(m).read(),
                            }
                        )
                yield pd.DataFrame(
                    rows, columns=[f.name for f in MEMBER_SCHEMA.fields]
                )

    return raw.mapInPandas(unpack, MEMBER_SCHEMA)


def group_samples(members: DataFrame) -> DataFrame:
    """Pivot member rows to one row per sample:
    (key, files map<ext, binary>).  Tar members of one sample sit in the
    same shard by construction, so the groupBy shuffles only within the
    already-colocated (shard, key) space — at scale, repartition by
    shard_path first to keep it map-side."""
    return (
        members.groupBy("key")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("ext", "payload"))
                )
            ).alias("files")
        )
    )


def read_samples(spark: SparkSession, shard_glob: str) -> DataFrame:
    """One row per sample: (key, files map<ext, binary>) — the reader
    face a training loader consumes."""
    return group_samples(read_tar_members(spark, shard_glob))
