"""Pure stdlib-struct + numpy WAV (RIFF/PCM) codec — un-stubs the audio
library format in the multimodal decode path (stages/multimodal
previously routed ``audio/wav`` payloads to the digest stub because
librosa/soundfile are absent; WAV needs no codec library: the RIFF
container is ``struct`` and PCM sample conversion is numpy).

Scope (the common subset): RIFF/WAVE with a ``fmt `` chunk of
format 1 (integer PCM, 8/16/24/32-bit) or format 3 (IEEE float32),
any channel count / sample rate; unknown chunks (LIST, fact, cue)
are skipped. Output is float64 samples in [-1, 1), channel-averaged
to mono for the feature path (matching the RAWM audio contract of
stages/media_codec).

Reference parity: the reference has no WAV source either — this codec
exists so the multimodal featurize stage (SURVEY §2 multimodal row)
decodes a REAL audio library format instead of the digest stub.
"""
from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

_FMT_PCM = 1
_FMT_FLOAT = 3


def encode_wav(samples: np.ndarray, sample_rate: int = 16000,
               bits: int = 16) -> bytes:
    """float samples in [-1, 1] (n,) mono or (n, ch) → WAV bytes
    (integer PCM, ``bits`` ∈ {8, 16, 24, 32}, little-endian)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    x = np.clip(x, -1.0, 1.0)
    # scale by 2^(bits-1) with clipping at the positive rail so the
    # encode/decode pair is the identity on the integer sample grid
    if bits == 8:  # 8-bit WAV is unsigned, biased by 128
        i = np.clip(np.round(x * 128.0), -128, 127)
        data = (i + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        i = np.clip(np.round(x * 32768.0), -32768, 32767)
        data = i.astype("<i2").tobytes()
    elif bits == 24:
        i = np.clip(np.round(x * 8388608.0), -8388608, 8388607) \
            .astype("<i4")
        b = i.view(np.uint32).astype("<u4")
        raw = np.frombuffer(b.tobytes(), np.uint8).reshape(-1, 4)
        data = raw[:, :3].tobytes()  # low 3 bytes little-endian
    elif bits == 32:
        i = np.clip(np.round(x * 2147483648.0), -2147483648, 2147483647)
        data = i.astype("<i4").tobytes()
    else:
        raise ValueError(f"wav: unsupported bit depth {bits}")
    block_align = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples (n, ch) in [-1, 1), sample_rate).
    Raises ValueError on anything outside the supported subset."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        ln = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            if ln < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_fmt, ch, rate, _, _, bits = fmt
    if ch < 1:
        raise ValueError("wav: zero channels")
    if audio_fmt == _FMT_FLOAT and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64)
    elif audio_fmt == _FMT_PCM and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == _FMT_PCM and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif audio_fmt == _FMT_PCM and bits == 24:
        raw = np.frombuffer(data, np.uint8)
        raw = raw[: len(raw) // 3 * 3].reshape(-1, 3)
        i = (raw[:, 0].astype(np.int32)
             | (raw[:, 1].astype(np.int32) << 8)
             | (raw[:, 2].astype(np.int32) << 16))
        i = np.where(i >= 1 << 23, i - (1 << 24), i)  # sign-extend
        x = i.astype(np.float64) / 8388608.0
    elif audio_fmt == _FMT_PCM and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(
            f"wav: unsupported format (fmt={audio_fmt} bits={bits}) — "
            "PCM 8/16/24/32 or float32 only")
    n = len(x) // ch
    return x[: n * ch].reshape(n, ch), int(rate)
