"""Multimodal plumbing: schema, batching, deterministic fake decode,
frame sampling arithmetic; real decoders are stubbed (no media libs in
this environment)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from subgraph_extractor_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, 24).cache()


def test_extract_features_schema_and_determinism(spark, media):
    feats = mm.extract_features(media)
    assert [f.name for f in feats.schema.fields] == [
        "media_id", "kind", "n_bytes", "feature",
    ]
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 24
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        payload = bytes(src[mid]["payload"])
        assert r["n_bytes"] == len(payload)
        digest = hashlib.sha256(payload).digest()
        expected = [b / 255.0 for b in digest[:8]]
        # feature column is float32: compare within single precision
        assert r["feature"] == pytest.approx(expected, abs=1e-6)


def test_resize_refuses_without_kernel(spark, media):
    # plan-time refusal (not a mid-job executor crash) when no imaging
    # kernel is registered — this container ships none
    with pytest.raises(NotImplementedError, match="set_resizer"):
        mm.resize_images(media, 32, 32)


def test_resize_plumbing_with_registered_kernel(spark, media):
    """The Spark plumbing is real: register a deterministic stand-in
    kernel (truncate payload) and verify schema passthrough, image-only
    rewrite, and meta dim update."""
    mm.set_resizer(lambda payload, mime, w, h: (payload or b"")[: w * h // 64])
    try:
        out = mm.resize_images(media, 32, 32)
        assert out.schema == media.schema
        src = {r["media_id"]: r for r in media.collect()}
        for r in out.collect():
            orig = src[r["media_id"]]
            if r["kind"] == "image":
                assert bytes(r["payload"]) == bytes(orig["payload"])[:16]
                assert (r["meta"]["width"], r["meta"]["height"]) == (32, 32)
            else:
                assert bytes(r["payload"]) == bytes(orig["payload"])
                assert r["meta"] == orig["meta"]
    finally:
        mm.set_resizer(None)


def test_video_frame_sampling(spark, media):
    frames = mm.sample_video_frames(media, every_ms=1000)
    rows = frames.collect()
    assert rows
    durations = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    from collections import Counter

    per_media = Counter(r["media_id"] for r in rows)
    for mid, n in per_media.items():
        expected = (durations[mid] - 1) // 1000 + 1
        assert n == expected
