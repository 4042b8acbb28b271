"""RAWM: a tiny deterministic raw media container + pure-numpy decoders.

The container (PIL/ffmpeg) formats stay stubbed in stages/multimodal — those
libraries are not available here — but a raw uncompressed format needs no
codec library, so THIS decode path is fully real: bytes → numpy array →
resize / frame-sample / spectral features, all vectorized. It provides the
honest end-to-end exercise of the multimodal plumbing (binary column in,
typed feature column out) that a stub digest cannot.

Layout (little-endian):
    magic   b"RAWM"      4 bytes
    kind    uint8        0=image, 1=audio, 2=video
    image:  uint16 h, uint16 w, then h*w*3 uint8 RGB
    audio:  uint32 n, uint16 sample_rate_hz/100, then n int16 samples
    video:  uint16 f, uint16 h, uint16 w, then f*h*w*3 uint8 RGB frames
"""
from __future__ import annotations

import numpy as np

MAGIC = b"RAWM"
KIND_IMAGE, KIND_AUDIO, KIND_VIDEO = 0, 1, 2
_KIND_NAMES = {KIND_IMAGE: "image", KIND_AUDIO: "audio", KIND_VIDEO: "video"}


def encode_image(rgb: np.ndarray) -> bytes:
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    head = MAGIC + bytes([KIND_IMAGE]) + np.array([h, w], dtype="<u2").tobytes()
    return head + rgb.tobytes()


def encode_audio(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    assert samples.dtype == np.int16
    head = (MAGIC + bytes([KIND_AUDIO])
            + np.array([len(samples)], dtype="<u4").tobytes()
            + np.array([sample_rate // 100], dtype="<u2").tobytes())
    return head + samples.tobytes()


def encode_video(frames: np.ndarray) -> bytes:
    f, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    head = (MAGIC + bytes([KIND_VIDEO])
            + np.array([f, h, w], dtype="<u2").tobytes())
    return head + frames.tobytes()


def decode(payload: bytes):
    """bytes → (kind_name, numpy array). Raises ValueError on bad magic —
    callers route non-RAWM payloads to their library-backed decoder (or the
    documented stub when that library is absent)."""
    if payload[:4] != MAGIC:
        raise ValueError("not a RAWM payload")
    kind = payload[4]
    if kind == KIND_IMAGE:
        h, w = np.frombuffer(payload, "<u2", count=2, offset=5)
        arr = np.frombuffer(payload, np.uint8, count=int(h) * int(w) * 3,
                            offset=9).reshape(int(h), int(w), 3)
        return "image", arr
    if kind == KIND_AUDIO:
        n = int(np.frombuffer(payload, "<u4", count=1, offset=5)[0])
        sr = int(np.frombuffer(payload, "<u2", count=1, offset=9)[0]) * 100
        arr = np.frombuffer(payload, "<i2", count=n, offset=11)
        return "audio", (arr, sr)
    if kind == KIND_VIDEO:
        f, h, w = (int(x) for x in np.frombuffer(payload, "<u2", count=3,
                                                 offset=5))
        arr = np.frombuffer(payload, np.uint8, count=f * h * w * 3,
                            offset=11).reshape(f, h, w, 3)
        return "video", arr
    raise ValueError(f"unknown RAWM kind {kind}")


def resize_nearest(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via two integer index gathers (no loops)."""
    h, w = rgb.shape[:2]
    ri = (np.arange(out_h) * h // out_h).astype(np.int64)
    ci = (np.arange(out_w) * w // out_w).astype(np.int64)
    return rgb[ri][:, ci]


def frame_sample(frames: np.ndarray, k: int) -> np.ndarray:
    """Every (f // k)-th frame, at most k frames — the ffmpeg `select`
    analogue for the raw container."""
    f = frames.shape[0]
    step = max(1, f // k)
    return frames[::step][:k]


def image_features(rgb: np.ndarray) -> np.ndarray:
    """16-dim: mean/std per channel, normalized dims, 2×2 luma block means,
    luma std, mean |gradient|, luma min/max. All float32 in [-4, 4]-ish."""
    x = rgb.astype(np.float32) / 255.0
    luma = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    h, w = luma.shape
    blocks = [luma[: h // 2 or 1, : w // 2 or 1].mean(),
              luma[: h // 2 or 1, w // 2:].mean() if w > 1 else 0.0,
              luma[h // 2:, : w // 2 or 1].mean() if h > 1 else 0.0,
              luma[h // 2:, w // 2:].mean() if h > 1 and w > 1 else 0.0]
    grad = (np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0)
    return np.array([
        *x.mean(axis=(0, 1)), *x.std(axis=(0, 1)),
        h / 512.0, w / 512.0,
        *blocks, luma.std(), grad, luma.min(), luma.max(),
    ], dtype=np.float32)


def audio_features(samples: np.ndarray, sr: int) -> np.ndarray:
    """16-dim: mean, std, rms, zero-crossing rate, peak, 10 rFFT band
    energies (log1p), log length."""
    x = samples.astype(np.float32) / 32768.0
    if len(x) == 0:
        return np.zeros(16, dtype=np.float32)
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
        if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 10)
    band_e = np.array([np.log1p(b.mean()) if len(b) else 0.0 for b in bands],
                      dtype=np.float32)
    return np.array([
        x.mean(), x.std(), float(np.sqrt(np.mean(x * x))), zcr,
        float(np.abs(x).max()), *band_e, np.log1p(len(x) / sr),
    ], dtype=np.float32)


def video_features(frames: np.ndarray, k: int = 8) -> np.ndarray:
    """16-dim: n_frames (log), overall mean/std, per-sampled-frame luma
    means (k, zero-padded), first-frame gradient + luma std + extremes."""
    sampled = frame_sample(frames, k)
    x = sampled.astype(np.float32) / 255.0
    luma = x @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    per_frame = luma.mean(axis=(1, 2))
    pf = np.zeros(k, dtype=np.float32)
    pf[: len(per_frame)] = per_frame
    f0 = luma[0]
    grad = np.abs(np.diff(f0, axis=0)).mean() if f0.shape[0] > 1 else 0.0
    return np.array([
        np.log1p(frames.shape[0]), x.mean(), x.std(), *pf,
        f0.std(), grad, luma.min(), luma.max(), float(len(per_frame)),
    ], dtype=np.float32)


def synth_rawm_payload(kind: str, rng: np.random.Generator) -> bytes:
    """Deterministic real-content payloads for tests/benchmarks."""
    if kind == "image":
        h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        return encode_image(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    if kind == "audio":
        n = int(rng.integers(256, 4096))
        t = np.arange(n, dtype=np.float32)
        f = float(rng.uniform(50, 2000))
        wave = (np.sin(2 * np.pi * f * t / 16000.0) * 12000).astype(np.int16)
        return encode_audio(wave)
    f, h, w = int(rng.integers(2, 12)), int(rng.integers(8, 32)), int(rng.integers(8, 32))
    return encode_video(rng.integers(0, 256, (f, h, w, 3), dtype=np.uint8))
