"""WebDataset-style tar-shard I/O: round-trip fidelity, shard rolling,
deterministic shard bytes, and manifest accounting."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators.multimodal import synthetic_media
from subgraph_extractor_spark.sources import webdataset as wds


@pytest.fixture()
def media(spark):
    return synthetic_media(spark, n=24, seed=11).repartition(3)


def test_round_trip_preserves_every_payload(spark, media, tmp_path):
    out = str(tmp_path / "shards")
    manifest = wds.write_tar_shards(media, out).collect()
    assert sum(r["n_samples"] for r in manifest) == 24
    assert all(os.path.exists(r["shard_path"]) for r in manifest)

    samples = wds.read_samples(spark, out + "/*.tar").collect()
    assert len(samples) == 24
    src = {
        f"{r['media_id']:012d}": (r["kind"], bytes(r["payload"]), r["meta"])
        for r in media.collect()
    }
    for s in samples:
        kind, payload, meta = src[s["key"]]
        files = s["files"]
        assert bytes(files[kind]) == payload
        got_meta = json.loads(bytes(files["json"]).decode())
        assert got_meta["mime"] == meta["mime"]


def test_shard_rolling_and_manifest_accounting(spark, media, tmp_path):
    out = str(tmp_path / "rolled")
    manifest = wds.write_tar_shards(
        media, out, max_shard_items=3
    ).collect()
    # 3 partitions x 8 samples, 3 per shard -> ceil(8/3)=3 shards each
    assert len(manifest) == 9
    assert all(r["n_samples"] <= 3 for r in manifest)
    assert sum(r["n_samples"] for r in manifest) == 24
    for r in manifest:
        assert r["first_key"] <= r["last_key"]
    # keys within each partition's shard sequence are globally sorted
    by_prefix = {}
    for r in sorted(manifest, key=lambda r: r["shard_path"]):
        pid = os.path.basename(r["shard_path"]).split("-")[1]
        if pid in by_prefix:
            assert by_prefix[pid] < r["first_key"]
        by_prefix[pid] = r["last_key"]


def test_rewrite_is_byte_identical(spark, media, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    wds.write_tar_shards(media.repartition(1), a).collect()
    wds.write_tar_shards(media.repartition(1), b).collect()
    fa = sorted(glob.glob(a + "/*.tar"))
    fb = sorted(glob.glob(b + "/*.tar"))
    assert len(fa) == len(fb) == 1
    assert open(fa[0], "rb").read() == open(fb[0], "rb").read()


def test_oversized_sample_lands_alone(spark, tmp_path):
    big = spark.createDataFrame(
        [
            (1, "image", b"x" * 2000, ("image/ppm", 1, 1, None)),
            (2, "image", b"y" * 10, ("image/ppm", 1, 1, None)),
            (3, "image", b"z" * 10, ("image/ppm", 1, 1, None)),
        ],
        "media_id long, kind string, payload binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint>",
    ).repartition(1)
    out = str(tmp_path / "big")
    manifest = sorted(
        wds.write_tar_shards(big, out, max_shard_bytes=500).collect(),
        key=lambda r: r["shard_path"],
    )
    assert [r["n_samples"] for r in manifest] == [1, 2]
    members = wds.read_tar_members(spark, out + "/*.tar")
    assert members.filter(F.col("ext") == "image").count() == 3
