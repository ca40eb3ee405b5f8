"""Library-free WAV (RIFF PCM) audio codec + feature kernel.

WAV is the audio analogue of PPM/BMP: fully parseable with stdlib
struct + numpy, so the audio modality's decode and feature-extraction
kernels can be REAL in this container (no soundfile/librosa), just like
the image codecs in :mod:`imagecodec`.  Supported: 16-bit PCM,
1..8 channels, any sample rate; the strict-grammar parser walks RIFF
chunks (skipping unknown ones) and refuses anything it cannot parse
exactly, so malformed payloads take the caller's digest fallback rather
than yielding garbage features.

Reference parity: none (no media surface in the reference engine);
multimodal extension (SURVEY §2.12).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 array -> RIFF/WAVE PCM payload."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, byte_rate, block_align, 16
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff_len = 4 + len(fmt) + len(data_hdr) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data_hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM payload -> (rate, (n, channels) int16 array).
    Walks chunks, skips unknown ones, raises ValueError on anything
    that is not clean 16-bit PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, ch, bits, data = 12, None, None, None, None
    while i + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, i)
        body = payload[i + 8 : i + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt_tag, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_tag != 1 or bits != 16:
                raise ValueError("only 16-bit PCM supported")
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None or not ch or not (1 <= ch <= 8):
        raise ValueError("missing fmt/data chunk or bad channel count")
    if len(data) % (2 * ch):
        raise ValueError("data chunk not frame-aligned")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return int(rate), arr.copy()


def audio_features(payload: bytes) -> list[float]:
    """Real 8-dim audio features from a PCM WAV payload:
    [rate, channels, duration_s, rms, peak, zero_crossing_rate,
     mean_abs, dc_offset] — all normalized floats where sensible."""
    rate, s = decode_wav(payload)
    x = s.astype(np.float64) / 32768.0
    mono = x.mean(axis=1)
    n = len(mono)
    zcr = (
        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        / max(n - 1, 1)
    )
    return [
        float(rate),
        float(s.shape[1]),
        n / float(rate) if rate else 0.0,
        float(np.sqrt((mono**2).mean())) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zcr,
        float(np.abs(mono).mean()) if n else 0.0,
        float(mono.mean()) if n else 0.0,
    ]


def media_feature_decoder(payload: bytes | None, kind: str) -> list[float]:
    """``multimodal.set_decoder`` kernel covering BOTH real modalities:
    images through :func:`imagecodec.image_feature_decoder`, audio
    through :func:`audio_features`; anything unparseable (or video —
    sample frames first via extract_video_frames) takes the digest
    fallback, so mixed batches never fail."""
    import hashlib

    from subgraph_extractor_spark.operators.imagecodec import (
        image_feature_decoder,
    )

    raw = b"" if payload is None else bytes(payload)
    if kind == "audio":
        try:
            return audio_features(raw)
        except (ValueError, struct.error):
            digest = hashlib.sha256(raw).digest()
            return [b / 255.0 for b in digest[:8]]
    return image_feature_decoder(payload, kind)

def spectral_hash64(rate: int, samples: np.ndarray) -> int:
    """64-bit spectral difference hash — the audio analogue of
    :func:`imagecodec.dhash64`: mono-mix, 9 equal time segments, power
    spectrum per segment (rfft) binned into 8 equal-fraction-of-Nyquist
    bands, bit = band energy rose from segment t to t+1 (8x8 grid of
    time-gradient signs, row-major, MSB first).

    Invariances (measured in tests): exact under uniform gain (energy
    comparisons are scale-free — 0.5x/0.7x int16 requantization hashes
    identically), exact under channel-layout changes (mono mix), and
    within a few bits under low-level additive noise (dither at -40 dB
    flips <= ~3 of 64 bits).  NOT time-alignment invariant: trimming
    shifts every segment boundary, the same way dHash is not
    crop-invariant — near-dup detection targets re-encodes/gain rips,
    not clip excerpts (containment over windowed sub-hashes would be
    the excerpt tool).  Deterministic float pipeline (fixed segment
    boundaries, numpy rfft, strict comparisons), so equal payloads
    always hash equal."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    mono = (s.astype(np.float64) / 32768.0).mean(axis=1)
    n = len(mono)
    if n < 18:  # need >= 2 samples per segment for a spectrum
        raise ValueError("audio too short for a 9-segment spectral hash")
    seg = [(i * n) // 9 for i in range(10)]
    energy = np.zeros((9, 8))
    for t in range(9):
        spec = np.abs(np.fft.rfft(mono[seg[t] : seg[t + 1]])) ** 2
        m = len(spec)
        bb = [(b * m) // 8 for b in range(9)]
        for b in range(8):
            if bb[b + 1] > bb[b]:
                energy[t, b] = spec[bb[b] : bb[b + 1]].sum()
    bits = (energy[1:, :] > energy[:-1, :]).astype(np.uint64).ravel()
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | b
    # two's-complement into int64: Spark/DuckDB longs share the pattern
    return int(h.astype(np.int64))


def audio_spectral_hash(payload: bytes | None) -> int | None:
    """Spectral hash of an encoded WAV payload; junk, undecodable, or
    too-short audio yields None — the media family's mixed-batch
    contract (one bad row must not fail the task)."""
    if payload is None:
        return None
    try:
        rate, samples = decode_wav(bytes(payload))
        return spectral_hash64(rate, samples)
    except (ValueError, struct.error, IndexError):
        return None

def audio_window_hashes(
    payload: bytes | None,
    win_s: float = 1.0,
    hop_s: float = 0.5,
    energy_floor: float = 1e-6,
) -> "list[tuple[int, int]] | None":
    """Sliding-window spectral sub-hashes of a WAV payload — the
    EXCERPT face of audio identity (the whole-clip
    :func:`spectral_hash64` is deliberately not trim-invariant; this
    is the tool for clip-inside-recording detection, the audio
    analogue of the text passage/containment operators).

    Returns [(window_index, hash), ...] for every full ``win_s``-second
    window at ``hop_s`` hops.  Each window hashes its own samples only,
    so an excerpt cut at a hop-aligned offset reproduces the original's
    window hashes EXACTLY (and gain rips still match — the hash is
    scale-free).  Near-silent windows (mean-square power below
    ``energy_floor``) are suppressed: they carry no identity and would
    otherwise form one degenerate mega-bucket in the downstream
    inverted-index join (the same reason chunk dedup drops boilerplate
    chunks).  Detection contract: excerpts cut at arbitrary offsets
    match only their hop-aligned windows — halve ``hop_s`` to tighten
    the offset grid.  Junk or undecodable payloads yield None."""
    if payload is None:
        return None
    try:
        rate, s = decode_wav(bytes(payload))
        win, hop = int(rate * win_s), int(rate * hop_s)
        if win < 18 or hop < 1:
            return None
        out = []
        i = 0
        idx = 0
        while i + win <= s.shape[0]:
            seg = s[i : i + win]
            mono = (seg.astype(np.float64) / 32768.0).mean(axis=1)
            if float((mono**2).mean()) >= energy_floor:
                out.append((idx, spectral_hash64(rate, seg)))
            i += hop
            idx += 1
        return out
    except (ValueError, struct.error, IndexError):
        return None
