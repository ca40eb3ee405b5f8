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


# ---- real pure-python codecs (PPM/BMP): the decode path runs e2e ----


def _gradient(w, h):
    import numpy as np

    x = np.arange(w, dtype=np.uint8)
    y = np.arange(h, dtype=np.uint8)
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :, 0] = x[None, :]
    img[:, :, 1] = y[:, None]
    img[:, :, 2] = 128
    return img


def test_codec_roundtrips():
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    img = _gradient(13, 7)  # odd width exercises BMP row padding
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(img)), img)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(img)), img)
    # a PPM header with comments still parses
    with_comment = b"P6\n# comment line\n13 7\n255\n" + img.tobytes()
    assert np.array_equal(ic.decode_ppm(with_comment), img)


def test_real_image_resize_end_to_end(spark):
    """Full Spark path with the REAL codec kernel: PPM and BMP payloads
    are decoded, nearest-neighbor resampled and re-encoded inside
    mapInPandas; output payloads decode to the expected pixels."""
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    img = _gradient(16, 8)
    rows = [
        (1, "image", bytearray(ic.encode_ppm(img)),
         {"mime": "image/x-portable-pixmap", "width": 16, "height": 8,
          "duration_ms": None}),
        (2, "image", bytearray(ic.encode_bmp(img)),
         {"mime": "image/bmp", "width": 16, "height": 8,
          "duration_ms": None}),
        (3, "audio", bytearray(b"\x00\x01\x02"),
         {"mime": "audio/wav", "width": None, "height": None,
          "duration_ms": 1500}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    mm.set_resizer(ic.image_resizer)
    try:
        out = {r["media_id"]: r for r in mm.resize_images(media, 4, 4).collect()}
    finally:
        mm.set_resizer(None)
    expected = ic.resize_nearest(img, 4, 4)
    got_ppm = ic.decode_ppm(bytes(out[1]["payload"]))
    got_bmp = ic.decode_bmp(bytes(out[2]["payload"]))
    assert np.array_equal(got_ppm, expected)
    assert np.array_equal(got_bmp, expected)
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (4, 4)
    # non-image rows pass through untouched
    assert bytes(out[3]["payload"]) == b"\x00\x01\x02"


def test_real_image_features_end_to_end(spark):
    """extract_features with the real decoder: dims/channel means come
    from actual decoded pixels; non-image rows use the digest fallback."""
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    img = np.zeros((6, 12, 3), np.uint8)
    img[:, :, 0] = 200  # red-dominant constant image
    rows = [
        (1, "image", bytearray(ic.encode_ppm(img)),
         {"mime": "image/x-portable-pixmap", "width": 12, "height": 6,
          "duration_ms": None}),
        (2, "audio", bytearray(b"abc"),
         {"mime": "audio/wav", "width": None, "height": None,
          "duration_ms": 99}),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    mm.set_decoder(ic.image_feature_decoder)
    try:
        feats = {r["media_id"]: r["feature"]
                 for r in mm.extract_features(media).collect()}
    finally:
        mm.set_decoder(mm._fake_decode)
    w, h, aspect, mr, mg, mb, luma, ok = feats[1]
    assert (w, h) == (12.0, 6.0) and aspect == 2.0 and ok == 1.0
    assert mr == pytest.approx(200 / 255, abs=1e-6)
    assert mg == 0.0 and mb == 0.0
    assert luma == pytest.approx(0.2126 * 200 / 255, abs=1e-6)
    digest = hashlib.sha256(b"abc").digest()
    assert feats[2] == pytest.approx([b / 255.0 for b in digest[:8]], abs=1e-6)


def test_malformed_bmp_falls_back_not_raises():
    """A 'BM'-prefixed payload too short for its own headers must take
    the digest fallback (decoder) / pass through unchanged (resizer),
    never escape as struct.error and kill the Spark task."""
    from subgraph_extractor_spark.operators import imagecodec as ic

    corrupt = b"BM\x01\x02"
    feat = ic.image_feature_decoder(corrupt, "image")
    assert len(feat) == 8  # digest fallback shape
    import hashlib

    assert feat == [b / 255.0 for b in hashlib.sha256(corrupt).digest()[:8]]
    assert ic.image_resizer(corrupt, "image/bmp", 4, 4) == corrupt
    assert ic.image_resizer(b"not an image", None, 4, 4) == b"not an image"


def test_zero_dimension_image_falls_back_not_raises():
    """A structurally-valid BMP declaring 0x0 dimensions decodes to a
    zero-pixel array: the resizer must pass it through (not IndexError
    on the empty gather) and the feature decoder must take the digest
    fallback (not return NaN means)."""
    import hashlib
    import math

    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    empty = np.zeros((0, 0, 3), dtype=np.uint8)
    degenerate = ic.encode_bmp(empty)
    assert degenerate[:2] == b"BM"

    assert ic.image_resizer(degenerate, "image/bmp", 4, 4) == degenerate

    feat = ic.image_feature_decoder(degenerate, "image")
    assert len(feat) == 8
    assert not any(math.isnan(v) for v in feat)
    assert feat == [b / 255.0 for b in hashlib.sha256(degenerate).digest()[:8]]


def test_real_video_frame_extraction_end_to_end(spark):
    """Concatenated-P6 videos: sampled frames are REAL decodable PPMs
    and the sampled index follows frame_ms * n_frames / duration."""
    import numpy as np

    from subgraph_extractor_spark.operators.imagecodec import (
        decode_ppm,
        encode_ppm_video,
        split_ppm_video,
    )
    from subgraph_extractor_spark.operators.multimodal import (
        extract_video_frames,
        synthetic_ppm_videos,
    )

    vids = synthetic_ppm_videos(spark, n=6)
    out = extract_video_frames(vids, every_ms=700).collect()
    assert out, "no frames sampled"
    metas = {r["media_id"]: r for r in vids.collect()}
    for r in out:
        m = metas[r["media_id"]]
        frames = split_ppm_video(bytes(m["payload"]))
        dur = m["meta"]["duration_ms"]
        want = min(r["frame_ms"] * len(frames) // dur, len(frames) - 1)
        assert r["frame_idx"] == want
        # the emitted frame is the exact original frame's bytes
        assert bytes(r["payload"]) == frames[want]
        px = decode_ppm(bytes(r["payload"]))
        assert px.ndim == 3 and px.shape[2] == 3

    # mixed batch: a junk 'video' yields fallback rows, never a failure
    import pyspark.sql.functions as F
    from subgraph_extractor_spark.operators.multimodal import MEDIA_SCHEMA

    junk = spark.createDataFrame(
        [(99, "video", b"not a ppm stream", ("video/junk", None, None, 2000))],
        MEDIA_SCHEMA,
    )
    rows = extract_video_frames(vids.unionByName(junk), 700).collect()
    junk_rows = [r for r in rows if r["media_id"] == 99]
    assert junk_rows and all(
        r["frame_idx"] == -1 and r["payload"] is None for r in junk_rows
    )
    good = [r for r in rows if r["media_id"] != 99]
    assert all(r["frame_idx"] >= 0 for r in good)


def test_ppm_video_split_roundtrip_and_errors():
    import numpy as np
    import pytest as _pytest

    from subgraph_extractor_spark.operators.imagecodec import (
        encode_ppm, encode_ppm_video, split_ppm_video,
    )

    frames = [
        np.full((3, 2, 3), v, dtype=np.uint8) for v in (0, 128, 255)
    ]
    blob = encode_ppm_video(frames)
    parts = split_ppm_video(blob)
    assert parts == [encode_ppm(f) for f in frames]
    with _pytest.raises(ValueError):
        split_ppm_video(b"")
    with _pytest.raises(ValueError):
        split_ppm_video(blob[:-5])  # truncated last frame
    with _pytest.raises(ValueError):
        split_ppm_video(b"JUNK" + blob)


def test_wav_codec_roundtrip_and_errors():
    import numpy as np
    import pytest as _pytest

    from subgraph_extractor_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(800)
    mono = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    rate, back = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and back.shape == (800, 1)
    assert np.array_equal(back[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    rate, back2 = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and np.array_equal(back2, stereo)
    # python's own stdlib reader agrees with our encoder
    import io
    import wave

    wf = wave.open(io.BytesIO(encode_wav(mono, 8000)))
    assert (wf.getframerate(), wf.getnchannels(), wf.getsampwidth(),
            wf.getnframes()) == (8000, 1, 2, 800)
    for junk in (b"", b"RIFFxxxx", encode_wav(mono, 8000)[:-3]):
        with _pytest.raises(ValueError):
            decode_wav(junk)


def test_real_audio_features_end_to_end(spark):
    """Audio features through the full mapInPandas plumbing: a silent
    clip and a loud clip are separable on rms/peak; junk audio falls
    back to the digest, never failing the batch."""
    import numpy as np

    from subgraph_extractor_spark.operators.audiocodec import (
        encode_wav,
        media_feature_decoder,
    )
    from subgraph_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        set_decoder,
    )

    silent = encode_wav(np.zeros(1600, dtype=np.int16), 16000)
    t = np.arange(1600)
    loud = encode_wav(
        (25000 * np.sign(np.sin(2 * np.pi * 100 * t / 16000))).astype(np.int16),
        16000,
    )
    rows = [
        (1, "audio", silent, ("audio/wav", None, None, 100)),
        (2, "audio", loud, ("audio/wav", None, None, 100)),
        (3, "audio", b"not wav", ("audio/junk", None, None, 100)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    set_decoder(media_feature_decoder)
    try:
        got = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    finally:
        from subgraph_extractor_spark.operators.multimodal import _fake_decode
        set_decoder(_fake_decode)
    # [rate, ch, dur, rms, peak, zcr, mean_abs, dc]
    assert got[1][0] == 16000.0 and abs(got[1][2] - 0.1) < 1e-6  # float32 array
    assert got[1][3] == 0.0 and got[2][3] > 0.5
    assert got[2][4] > 0.7
    assert len(got[3]) == 8 and got[3][0] <= 1.0  # digest fallback


# ------------------------------------------------------- perceptual dedup


def test_dhash64_properties():
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)

    h_base = ic.dhash64(base)
    assert h_base == ic.dhash64(base.copy())          # deterministic

    # uniform 2x nearest upscale resamples back to the same 9x8 grid
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    assert ic.dhash64(up) == h_base

    # a few local pixel edits barely move the hash
    noisy = base.copy()
    noisy[5, 7] = 0
    noisy[20, 33] = 255
    def ham(a, b):
        return bin((a ^ b) & (1 << 64) - 1).count("1")
    assert ham(ic.dhash64(noisy), h_base) <= 6

    # unrelated content is far (random hashes differ on ~32 bits)
    assert ham(ic.dhash64(other), h_base) >= 16

    # junk payloads yield None, never raise
    assert ic.image_dhash(b"not an image") is None
    assert ic.image_dhash(None) is None


def test_image_near_dup_pairs_end_to_end(spark):
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic
    from subgraph_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    noisy = base.copy()
    noisy[3, 3] = 0
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    other = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)

    def meta(w, h):
        return ("image/x-ppm", w, h, None)

    rows = [
        (1, "image", bytearray(ic.encode_ppm(base)), meta(24, 24)),
        (2, "image", bytearray(ic.encode_ppm(noisy)), meta(24, 24)),
        (3, "image", bytearray(ic.encode_bmp(up)), meta(48, 48)),
        (4, "image", bytearray(ic.encode_ppm(other)), meta(24, 24)),
        (5, "image", bytearray(b"junk bytes"), meta(1, 1)),  # undecodable
        (6, "audio", bytearray(b"RIFFjunk"), ("audio/x-wav", None, None, 99)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_near_dup_pairs(media, max_distance=3).collect()
    }
    # near-dups found across containers (PPM noisy, BMP upscale)...
    assert (1, 2) in pairs and (1, 3) in pairs
    # ...unrelated content, junk, and non-image rows never pair
    flat = {i for p in pairs for i in p}
    assert 4 not in flat and 5 not in flat and 6 not in flat


def test_spectral_hash64_properties():
    """Audio hash invariances: exact under gain requantization and
    channel-layout change; a few bits under dither-level noise; far for
    unrelated content; junk -> None."""
    import numpy as np

    from subgraph_extractor_spark.operators import audiocodec as ac

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    rng = np.random.default_rng(7)
    rate = 8000
    t = np.arange(rate * 2) / rate
    base = (
        np.sin(2 * np.pi * 440 * t) * 8000
        + np.sin(2 * np.pi * 1200 * t * (1 + t / 4)) * 6000
        + rng.normal(0, 500, len(t))
    ).astype(np.int16)[:, None]
    h0 = ac.spectral_hash64(rate, base)
    assert h0 == ac.spectral_hash64(rate, base.copy())        # deterministic
    assert ac.spectral_hash64(rate, (base * 0.7).astype(np.int16)) == h0
    assert ac.spectral_hash64(rate, np.repeat(base, 2, axis=1)) == h0
    noisy = (
        base.astype(np.float64) + rng.normal(0, 100, base.shape)
    ).clip(-32768, 32767).astype(np.int16)
    assert ham(ac.spectral_hash64(rate, noisy), h0) <= 4
    other = rng.normal(0, 8000, base.shape).astype(np.int16)
    assert ham(ac.spectral_hash64(rate, other), h0) >= 12
    assert ac.audio_spectral_hash(b"not audio") is None
    assert ac.audio_spectral_hash(None) is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ac.spectral_hash64(rate, base[:10])  # too short


def test_video_majority_dhash_properties():
    """Video hash invariances: exact under frame-rate doubling and
    frame reordering; stable under a dropped frame; junk -> None."""
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    rng = np.random.default_rng(21)
    frames = [
        rng.integers(0, 256, (24, 24, 3), dtype=np.uint8) for _ in range(5)
    ]
    vid = ic.encode_ppm_video(frames)
    h0 = ic.video_majority_dhash(vid)
    doubled = ic.encode_ppm_video([f for f in frames for _ in range(2)])
    assert ic.video_majority_dhash(doubled) == h0
    reordered = ic.encode_ppm_video(frames[::-1])
    assert ic.video_majority_dhash(reordered) == h0
    # Drop-stability holds for CORRELATED frames (the real-video case:
    # consecutive frames share most content, so per-frame hashes agree
    # on most bits and majorities survive one removal).  Uncorrelated
    # random frames are the adversarial worst case — 3-2 votes flip —
    # which is exactly why dedup targets re-encodes, not re-cuts.
    base_frame = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    corr = []
    for i in range(5):
        f = base_frame.copy()
        f[i : i + 3, i : i + 3] = 255 - f[i : i + 3, i : i + 3]
        corr.append(f)
    hc = ic.video_majority_dhash(ic.encode_ppm_video(corr))
    dropped = ic.encode_ppm_video(corr[:-1])
    assert ham(ic.video_majority_dhash(dropped), hc) <= 4
    other = ic.encode_ppm_video(
        [rng.integers(0, 256, (24, 24, 3), dtype=np.uint8) for _ in range(5)]
    )
    assert ham(ic.video_majority_dhash(other), h0) >= 12
    assert ic.video_majority_dhash(b"junk") is None
    assert ic.video_majority_dhash(None) is None


def test_audio_video_near_dup_pairs_end_to_end(spark):
    """Both new modality faces through the banded pair machinery in one
    mixed corpus: audio gain-rip pairs with its original, video
    frame-doubled re-encode pairs with its original, unrelated content
    and junk and cross-kind rows never pair."""
    import numpy as np

    from subgraph_extractor_spark.operators import audiocodec as ac
    from subgraph_extractor_spark.operators import imagecodec as ic
    from subgraph_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_near_dup_pairs,
        video_near_dup_pairs,
    )

    rng = np.random.default_rng(9)
    rate = 8000
    t = np.arange(rate) / rate
    tone = (
        np.sin(2 * np.pi * 330 * t) * 9000
        + np.sin(2 * np.pi * 990 * t * (1 + t / 2)) * 5000
        + rng.normal(0, 400, len(t))
    ).astype(np.int16)[:, None]
    tone_gain = (tone * 0.6).astype(np.int16)
    tone_other = rng.normal(0, 9000, tone.shape).astype(np.int16)

    frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(4)
    ]
    frames_other = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(4)
    ]

    rows = [
        (1, "audio", bytearray(ac.encode_wav(tone, rate)),
         ("audio/x-wav", None, None, 1000)),
        (2, "audio", bytearray(ac.encode_wav(tone_gain, rate)),
         ("audio/x-wav", None, None, 1000)),
        (3, "audio", bytearray(ac.encode_wav(tone_other, rate)),
         ("audio/x-wav", None, None, 1000)),
        (4, "audio", bytearray(b"RIFFjunk"),
         ("audio/x-wav", None, None, 9)),
        (11, "video", bytearray(ic.encode_ppm_video(frames)),
         ("video/x-ppm-stream", 16, 16, 4000)),
        (12, "video",
         bytearray(ic.encode_ppm_video([f for f in frames for _ in (0, 1)])),
         ("video/x-ppm-stream", 16, 16, 8000)),
        (13, "video", bytearray(ic.encode_ppm_video(frames_other)),
         ("video/x-ppm-stream", 16, 16, 4000)),
        (14, "image", bytearray(ic.encode_ppm(frames[0])),
         ("image/x-portable-pixmap", 16, 16, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    apairs = {
        (r["id_a"], r["id_b"])
        for r in audio_near_dup_pairs(media, max_distance=3).collect()
    }
    assert (1, 2) in apairs
    aflat = {i for p in apairs for i in p}
    assert 3 not in aflat and 4 not in aflat and 11 not in aflat

    vpairs = {
        (r["id_a"], r["id_b"])
        for r in video_near_dup_pairs(media, max_distance=3).collect()
    }
    assert (11, 12) in vpairs
    vflat = {i for p in vpairs for i in p}
    assert 13 not in vflat and 1 not in vflat and 14 not in vflat


def test_audio_window_hashes_alignment_and_silence(spark):
    import numpy as np

    from subgraph_extractor_spark.operators import audiocodec as ac

    rng = np.random.default_rng(5)
    rate = 8000
    t = np.arange(rate * 3) / rate
    orig = (
        np.sin(2 * np.pi * 300 * t) * 8000
        + np.sin(2 * np.pi * 900 * t * (1 + t / 6)) * 5000
        + rng.normal(0, 300, len(t))
    ).astype(np.int16)[:, None]
    wav = ac.encode_wav(orig, rate)
    wh = ac.audio_window_hashes(wav)
    assert len(wh) == 5  # 3s at win=1s hop=0.5s
    # hop-aligned gain-ripped excerpt reproduces the original's hashes
    exc = (orig[rate : 2 * rate] * 0.6).astype(np.int16)
    wh_exc = ac.audio_window_hashes(ac.encode_wav(exc, rate))
    assert {h for _, h in wh_exc} <= {h for _, h in wh}
    # silence suppression: an all-zero clip contributes nothing
    silent = np.zeros((rate * 2, 1), dtype=np.int16)
    assert ac.audio_window_hashes(ac.encode_wav(silent, rate)) == []
    # junk -> None
    assert ac.audio_window_hashes(b"not audio") is None
    assert ac.audio_window_hashes(None) is None


def test_audio_excerpt_matches_end_to_end(spark):
    import numpy as np

    from subgraph_extractor_spark.operators import audiocodec as ac
    from subgraph_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_excerpt_matches,
    )

    rng = np.random.default_rng(5)
    rate = 8000
    t = np.arange(rate * 3) / rate
    orig = (
        np.sin(2 * np.pi * 300 * t) * 8000
        + np.sin(2 * np.pi * 900 * t * (1 + t / 6)) * 5000
        + rng.normal(0, 300, len(t))
    ).astype(np.int16)[:, None]
    exc = (orig[rate : 2 * rate] * 0.6).astype(np.int16)
    other = rng.normal(0, 8000, orig.shape).astype(np.int16)
    rows = [
        (1, "audio", bytearray(ac.encode_wav(orig, rate)),
         ("audio/x-wav", None, None, 3000)),
        (2, "audio", bytearray(ac.encode_wav(exc, rate)),
         ("audio/x-wav", None, None, 1000)),
        (3, "audio", bytearray(ac.encode_wav(other, rate)),
         ("audio/x-wav", None, None, 3000)),
        (4, "audio", bytearray(b"RIFFjunk"), ("audio/x-wav", None, None, 9)),
        (5, "image", bytearray(b"P6junk"), ("image/x-ppm", 1, 1, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in audio_excerpt_matches(media).collect()
    }
    assert set(got) == {(1, 2)}
    m = got[(1, 2)]
    assert m["containment"] == 1.0 and m["n_b"] == 1 and m["matched"] == 1


def test_video_frame_containment_end_to_end(spark):
    """Frame-set containment catches what the majority signature calls
    'different': a half-frame-rate decimation and a trim both contain
    at 1.0; unrelated content and junk never pair."""
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic
    from subgraph_extractor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        video_frame_containment,
    )

    rng = np.random.default_rng(31)
    frames = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(6)
    ]
    decimated = frames[::2]
    trimmed = frames[:3]
    other = [
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(6)
    ]
    meta = ("video/x-ppm-stream", 16, 16, 6000)
    rows = [
        (1, "video", bytearray(ic.encode_ppm_video(frames)), meta),
        (2, "video", bytearray(ic.encode_ppm_video(decimated)), meta),
        (3, "video", bytearray(ic.encode_ppm_video(trimmed)), meta),
        (4, "video", bytearray(ic.encode_ppm_video(other)), meta),
        (5, "video", bytearray(b"junk"), meta),
        (6, "audio", bytearray(b"RIFFjunk"), ("audio/x-wav", None, None, 9)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in video_frame_containment(media).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 1.0
    # decimated ({0,2,4}) vs trimmed ({0,1,2}): 2 of 3 shared = 0.67 < 0.8
    assert (2, 3) not in got
    flat = {i for p in got for i in p}
    assert 4 not in flat and 5 not in flat and 6 not in flat


def test_mixed_batch_signature_precision(spark):
    """Regression: a pandas batch mixing valid payloads with an
    undecodable row (None signature) must NOT corrupt the valid rows'
    64-bit signatures.  (A plain list of [int, None] infers float64 and
    rounds to 53-bit mantissa — low bits silently change.  coalesce(1)
    forces the mixed batch.)"""
    import numpy as np

    from subgraph_extractor_spark.operators import imagecodec as ic
    from subgraph_extractor_spark.operators import multimodal as mm

    rng = np.random.default_rng(7003)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    up = base.repeat(2, axis=0).repeat(2, axis=1)
    payloads = {
        1: ic.encode_ppm(base),
        2: ic.encode_bmp(up),
    }
    rows = [
        (i, "image", bytearray(p), ("image/x-ppm", 24, 24, None))
        for i, p in payloads.items()
    ]
    rows.append((97, "image", bytearray(b"junk"), ("image/x-ppm", 1, 1, None)))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA).coalesce(1)
    got = {
        r["_id"]: r["_sim"]
        for r in mm.image_dhash_signatures(media).collect()
    }
    assert got == {i: ic.image_dhash(p) for i, p in payloads.items()}
