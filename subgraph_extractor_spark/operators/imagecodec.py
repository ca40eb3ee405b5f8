"""Pure-python image codecs for the multimodal stage.

No imaging libraries ship in this environment, but two classic formats
are simple enough to decode with numpy alone, which makes the multimodal
decode/resize path REAL end-to-end instead of a stand-in kernel:

- **PPM (P6)** — the netpbm binary RGB format: ASCII header
  (magic, width, height, maxval) followed by raw RGB triplets.
- **BMP (24-bit uncompressed)** — BITMAPFILEHEADER (14 bytes) +
  BITMAPINFOHEADER (40 bytes), bottom-up BGR rows padded to 4 bytes.

The kernels below match the pluggable signatures of
``operators.multimodal``:

- ``image_feature_decoder`` for ``set_decoder`` — decodes real pixels and
  emits an 8-dim feature (dims, aspect, per-channel means, luma);
  payloads that are not decodable images fall back to the digest feature
  so mixed media batches never fail mid-job.
- ``image_resizer`` for ``set_resizer`` — decode → nearest-neighbor
  resample (vectorized numpy gather) → re-encode in the SAME container
  format.

At 100 TB these kernels run inside mapInPandas workers exactly like a
PIL/ffmpeg build would — bytes stay executor-side; only the kernel
implementation is swappable.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


# ---------------------------------------------------------------- PPM (P6)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6) payload."""
    h, w = pixels.shape[:2]
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) payload -> (h, w, 3) uint8 array.  Handles the
    whitespace/comment grammar of the netpbm header."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # tokenize header: magic, width, height, maxval; '#' starts a comment
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw data
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    data = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=i)
    return data.reshape(h, w, 3).copy()


# ------------------------------------------------------------ BMP (24-bit)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array -> 24-bit uncompressed BMP payload
    (bottom-up BGR rows, 4-byte row alignment)."""
    h, w = pixels.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    rows = np.zeros((h, row_size), np.uint8)
    # flip vertically, swap RGB->BGR
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP payload -> (h, w, 3) uint8 RGB array.
    Supports positive (bottom-up) and negative (top-down) heights."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return img.copy()


# ----------------------------------------------------------------- kernels


def sniff_and_decode(payload: bytes) -> tuple[str, np.ndarray]:
    """(container, pixels) from magic bytes; raises on unknown formats."""
    if payload[:2] == b"P6":
        container, pixels = "ppm", decode_ppm(payload)
    elif payload[:2] == b"BM":
        container, pixels = "bmp", decode_bmp(payload)
    else:
        raise ValueError("unrecognized image container")
    # a structurally-valid header may still declare a degenerate image
    # (0x0 BMP): zero-pixel arrays crash the resize gather (index -1
    # into a size-0 axis) and silently yield NaN means in the feature
    # kernel — treat them as undecodable so every caller takes its
    # documented fallback instead
    if pixels.size == 0:
        raise ValueError("degenerate zero-dimension image")
    return container, pixels


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via one vectorized index gather —
    the classic O(out_pixels) kernel, no Python pixel loop."""
    h, w = pixels.shape[:2]
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[yi[:, None], xi[None, :]]


def image_resizer(
    payload: bytes | None, mime: str | None, width: int, height: int
) -> bytes | None:
    """``set_resizer`` kernel: decode (PPM/BMP by magic), nearest-neighbor
    resample, re-encode in the same container.  Undecodable or malformed
    payloads pass through unchanged — same mixed-batch contract as
    ``image_feature_decoder``: corrupt bytes must never kill the task."""
    if payload is None:
        return None
    raw = bytes(payload)
    try:
        container, pixels = sniff_and_decode(raw)
        out = resize_nearest(pixels, width, height)
        return encode_ppm(out) if container == "ppm" else encode_bmp(out)
    except (ValueError, struct.error, IndexError):
        return raw


def image_feature_decoder(payload: bytes | None, kind: str) -> list[float]:
    """``set_decoder`` kernel: real 8-dim image features
    [width, height, aspect, mean R, mean G, mean B, luma, fill] for
    decodable image payloads; digest fallback for everything else (audio/
    video/unknown containers), so mixed batches never fail."""
    raw = b"" if payload is None else bytes(payload)
    if kind == "image":
        try:
            _, pixels = sniff_and_decode(raw)
            h, w = pixels.shape[:2]
            means = pixels.reshape(-1, 3).mean(axis=0) / 255.0
            luma = float(
                0.2126 * means[0] + 0.7152 * means[1] + 0.0722 * means[2]
            )
            return [
                float(w),
                float(h),
                float(w) / float(h) if h else 0.0,
                float(means[0]),
                float(means[1]),
                float(means[2]),
                luma,
                1.0,
            ]
        except (ValueError, struct.error):
            # struct.error: a 'BM'-prefixed payload too short for its
            # own headers — malformed bytes must take the digest
            # fallback, not kill the Spark task mid-job
            pass
    digest = hashlib.sha256(raw).digest()
    return [b / 255.0 for b in digest[:8]]


# ------------------------------------------------- PPM-stream "video"

def _ppm_frame_end(payload: bytes, start: int) -> int:
    """Offset one past the P6 frame starting at ``start`` (header walk
    shared with decode_ppm's grammar: magic, width, height, maxval,
    one whitespace, then w*h*3 raw bytes)."""
    if payload[start : start + 2] != b"P6":
        raise ValueError(f"no P6 frame at offset {start}")
    tokens: list[bytes] = []
    i = start + 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1
    w, h, _ = (int(t) for t in tokens)
    end = i + w * h * 3
    if end > len(payload):
        raise ValueError("truncated PPM frame")
    return end


def encode_ppm_video(frames: "list[np.ndarray]") -> bytes:
    """Concatenated-P6 'video' container: frames back to back — the
    simplest container that is REAL (each frame is a valid PPM the
    image kernels decode), so frame extraction is honest parsing, not a
    stub."""
    return b"".join(encode_ppm(f) for f in frames)


def split_ppm_video(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 payload into per-frame PPM byte strings.
    Raises ValueError on anything that is not a clean frame sequence."""
    frames, i = [], 0
    while i < len(payload):
        end = _ppm_frame_end(payload, i)
        frames.append(payload[i:end])
        i = end
    if not frames:
        raise ValueError("empty video payload")
    return frames


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (dHash): integer luma → nearest-neighbor
    resample to 9×8 → horizontal-gradient sign bits, row-major, MSB
    first.  All-integer arithmetic (BT.601 luma ×1000: 299R+587G+114B),
    so the signature is a pure deterministic function of the pixels —
    the perceptual analogue of the text SimHash, robust to re-encoding,
    small local noise, and (via the 9×8 resample) uniform rescaling."""
    px = pixels.astype(np.int64)
    luma = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    g = resize_nearest(luma[:, :, None], 9, 8)[:, :, 0]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint64).ravel()
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    # two's-complement into int64: Spark/DuckDB longs share the pattern
    return int(h.astype(np.int64))


def image_dhash(payload: bytes | None) -> int | None:
    """dHash of an encoded image payload (PPM/BMP by magic); junk or
    undecodable bytes yield None — the mixed-batch contract again."""
    if payload is None:
        return None
    try:
        _, pixels = sniff_and_decode(bytes(payload))
        return dhash64(pixels)
    except (ValueError, struct.error, IndexError):
        return None

def video_majority_dhash(payload: bytes | None) -> int | None:
    """64-bit perceptual video signature: per-frame :func:`dhash64` over
    the PPM stream's frames, aggregated by BITWISE MAJORITY VOTE (ties
    → 0) — SimHash's aggregation rule applied to frame hashes.  The
    vote makes the signature invariant under frame-rate doubling (every
    frame duplicated → same majorities), robust to a dropped or
    inserted frame, and — since dHash is itself invariant under uniform
    nearest upscaling — stable across per-frame re-encodes; ordering of
    frames does not matter (dedup targets content, re-cuts are a
    different operator).  Junk, undecodable, or frame-less payloads
    yield None (mixed-batch contract)."""
    if payload is None:
        return None
    try:
        frames = split_ppm_video(bytes(payload))
        if not frames:
            return None
        votes = np.zeros(64, dtype=np.int64)
        for fr in frames:
            u = dhash64(decode_ppm(fr)) & ((1 << 64) - 1)
            for b in range(64):
                votes[b] += 1 if (u >> (63 - b)) & 1 else -1
        h = np.uint64(0)
        for b in range(64):
            h = (h << np.uint64(1)) | np.uint64(1 if votes[b] > 0 else 0)
        return int(h.astype(np.int64))
    except (ValueError, struct.error, IndexError):
        return None
