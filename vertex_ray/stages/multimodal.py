"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Two decode paths:

- **RAWM (real, default)** — a raw uncompressed container
  (stages/media_codec) that needs no codec library, so decode → resize /
  frame-sample → feature-extract runs for REAL here: bytes → numpy →
  vectorized features (channel stats, rFFT band energies, sampled-frame
  luma). This is the path the synth tables and tests exercise end to end.
- **PNG / JPEG / WAV (real)** — decoded by the pure numpy + stdlib
  codecs in stages/png_codec (8-bit gray/RGB/RGBA, filters 0-4,
  CRC-checked), stages/jpeg_codec (baseline sequential JFIF, 4:4:4 /
  4:2:2 / 4:2:0, Annex K tables, restart markers) and stages/wav_codec
  (RIFF PCM 8/16/24/32-bit + float32) — the image and audio library
  formats are un-stubbed end to end.
- **MJPEG AVI + MJPEG MP4 (real)** — the AVI RIFF container walk and
  the ISO BMFF stsz/stco sample walk each yield per-frame baseline
  JFIF images, decoded by stages/jpeg_codec: BOTH video container
  formats run bytes → (T, H, W, 3) frames → frame-sampled features
  for real, with no codec library. Every format synth_media_table
  emits (RAWM, PNG, JPEG, WAV, MJPEG-AVI, MJPEG-MP4) decodes to real
  pixels/samples — there is no stubbed format left in the synth set.
- **Foreign payloads (digest fallback)** — an MP4 whose samples need
  a real codec library (H.264/H.265 — no ffmpeg here) still gets its
  container REALLY parsed (duration / dims / codec fourcc / sample
  count become features) with digest tail features and ``decoded`` =
  False; unknown byte strings get pure digest features. The
  substitution is always visible via the ``decoded`` flag, never
  silent.

The Ray-side contract is identical either way: actor-pool stage (decoder
state acquired once per actor, the geoip pattern), SMALL batch_size because
payloads are large, explicit output schema.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from vertex_ray.stages import media_codec

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synth_media_table(n: int, seed: int = 21) -> pa.Table:
    """Deterministic media rows with REAL decodable payloads (actual
    pixel/sample data, not digest noise) for testing at any scale:
    images alternate RAWM / PNG / JPEG, audio alternates RAWM / WAV,
    video alternates MJPEG-AVI / MJPEG-MP4 / RAWM (ALL real decode
    paths — no stubbed format in the synth set)."""
    from vertex_ray.stages.avi_codec import encode_avi_mjpeg
    from vertex_ray.stages.jpeg_codec import encode_jpeg
    from vertex_ray.stages.mp4_codec import encode_mp4_mjpeg
    from vertex_ray.stages.png_codec import encode_png
    from vertex_ray.stages.wav_codec import encode_wav

    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = []
    mimes = []
    for i, k in enumerate(kinds):
        raw = media_codec.synth_rawm_payload(k, rng)
        if k == "image" and i % 3 == 0:
            # REAL PNG (library-format path, stages/png_codec)
            _, rgb = media_codec.decode(raw)
            payloads.append(encode_png(rgb))
            mimes.append("image/png")
        elif k == "image" and i % 3 == 1:
            # REAL baseline JPEG (library-format path, stages/jpeg_codec)
            _, rgb = media_codec.decode(raw)
            payloads.append(encode_jpeg(rgb, quality=85))
            mimes.append("image/jpeg")
        elif k == "video" and i % 3 == 0:
            # REAL MJPEG AVI (library-format path, stages/avi_codec)
            _, frames = media_codec.decode(raw)
            payloads.append(encode_avi_mjpeg(frames[:4], fps=5, quality=85))
            mimes.append("video/x-msvideo")
        elif k == "video" and i % 3 == 1:
            # REAL MJPEG MP4 (library-format path, stages/mp4_codec —
            # JFIF samples addressed via stsz/stco)
            _, frames = media_codec.decode(raw)
            payloads.append(encode_mp4_mjpeg(frames[:4], fps=5, quality=85))
            mimes.append("video/mp4")
        elif k == "audio" and i % 2 == 0:
            # REAL RIFF/PCM WAV (library-format path, stages/wav_codec)
            _, (samples, sr) = media_codec.decode(raw)
            payloads.append(encode_wav(samples.astype(np.float64) / 32768.0,
                                       sample_rate=sr, bits=16))
            mimes.append("audio/wav")
        else:
            payloads.append(raw)
            mimes.append("application/x-rawm")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(np.array(mimes, dtype=object),
                             type=pa.string()),
            "width": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, size=n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def _digest_features(payload: bytes, kind: str) -> np.ndarray:
    """Fallback for FOREIGN or corrupt payloads (e.g. an H.264 MP4 —
    no codec library here — or unknown byte strings): deterministic
    16-dim feature from the payload digest, so such rows still flow,
    always with ``decoded`` = False. Every format synth_media_table
    emits decodes for real and never reaches this."""
    d = hashlib.blake2b(payload, digest_size=16).digest()
    return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


class MediaFeaturize:
    """Actor-pool stage: decode + feature-extract media payloads.

    Decoder state is acquired once per actor in __init__ (the geoip
    pattern). Use SMALL batch_size (payloads are large): e.g.
    ``map_batches(MediaFeaturize, batch_size=32, concurrency=N,
    num_cpus=1)`` so batch × concurrency fits worker heaps.
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        # stands in for loading codec/model state once per actor
        self.decoder_ready = True

    def _one(self, payload: bytes, kind: str) -> tuple[np.ndarray, bool]:
        from vertex_ray.stages import jpeg_codec, png_codec, wav_codec

        if payload[:8] == png_codec.PNG_MAGIC:
            # REAL library-format decode (pure numpy + stdlib zlib —
            # stages/png_codec), no PIL needed
            try:
                img = png_codec.decode_png(payload)
            except ValueError:
                return _digest_features(payload, kind), False
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            return media_codec.image_features(img[:, :, :3]), True
        if payload[:2] == jpeg_codec.JPEG_MAGIC:
            # REAL baseline-JPEG decode (pure numpy — stages/jpeg_codec)
            try:
                img = jpeg_codec.decode_jpeg(payload)
            except ValueError:
                return _digest_features(payload, kind), False
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            return media_codec.image_features(img), True
        # RIFF is shared by WAV, AVI, WebP… — require the WAVE form type
        # (a non-WAVE RIFF must fall through to the AVI branch or the
        # digest fallback, not rely on the WAV decoder's ValueError)
        if payload[:4] == wav_codec.WAV_MAGIC and payload[8:12] == b"WAVE":
            # REAL RIFF/PCM WAV decode (stdlib struct + numpy —
            # stages/wav_codec); channel-average to mono for features
            try:
                samples, rate = wav_codec.decode_wav(payload)
            except ValueError:
                return _digest_features(payload, kind), False
            # audio_features expects int16-scaled samples; decode_wav
            # yields [-1, 1) floats — rescale (exact for 16-bit PCM)
            return media_codec.audio_features(
                samples.mean(axis=1) * 32768.0, rate), True
        from vertex_ray.stages import avi_codec

        if avi_codec.is_avi(payload):
            # REAL video decode: AVI RIFF container + per-frame baseline
            # JPEG (MJPEG, stages/avi_codec) — no codec library needed
            try:
                frames = avi_codec.decode_avi_mjpeg(payload)
            except ValueError:
                return _digest_features(payload, kind), False
            return media_codec.video_features(frames), True
        from vertex_ray.stages import mp4_codec

        if mp4_codec.is_mp4(payload):
            # the CONTAINER is really parsed (ISO BMFF box walk,
            # stages/mp4_codec); MJPEG sample entries (``jpeg`` fourcc —
            # JFIF frames addressed via stsz/stco) REALLY decode to
            # pixels through stages/jpeg_codec. Foreign codecs
            # (H.264/H.265 — codec library absent here) keep the parsed
            # container metadata as features with digest tails and
            # ``decoded`` = False.
            try:
                meta = mp4_codec.parse_mp4(payload)
            except ValueError:
                return _digest_features(payload, kind), False
            if meta["codec"] in ("jpeg", "mjpa", "MJPG"):
                try:
                    frames = mp4_codec.decode_mp4_mjpeg(payload)
                except ValueError:
                    return _digest_features(payload, kind), False
                return media_codec.video_features(frames), True
            feat = _digest_features(payload, kind)
            feat[0] = np.log1p(meta["duration_ms"]) / 10.0
            feat[1] = meta["width"] / 512.0
            feat[2] = meta["height"] / 512.0
            feat[3] = np.log1p(meta["n_samples"]) / 10.0
            return feat, False
        try:
            name, data = media_codec.decode(payload)
        except ValueError:  # unknown formats stay fully stubbed
            return _digest_features(payload, kind), False
        if name == "image":
            return media_codec.image_features(data), True
        if name == "audio":
            return media_codec.audio_features(*data), True
        return media_codec.video_features(data), True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        if payloads:
            pairs = [self._one(p, k) for p, k in zip(payloads, kinds)]
            feats = np.stack([f for f, _ in pairs])
            decoded = np.array([d for _, d in pairs], dtype=bool)
        else:
            feats = np.zeros((0, self.feature_dim), dtype=np.float32)
            decoded = np.zeros(0, dtype=bool)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    np.array([len(p) for p in payloads], dtype=np.int64)
                ),
                "decoded": pa.array(decoded),
                "feature": pa.array(list(feats)),
            }
        )


def featurize_media(ds, concurrency: int = 4, batch_size: int = 32):
    return ds.map_batches(
        MediaFeaturize,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# --- oracle-able decode checksums ------------------------------------------
#
# The geoip-mmdb trick applied to media codecs: payloads are BUILT
# deterministically from a real table's ids, decoded through the REAL
# codec dispatch, and reduced to integer checksums the SQL oracle
# recomputes arithmetically — PNG and WAV round-trip losslessly, and the
# JPEG-family formats (JPEG image, MJPEG-AVI, MJPEG-MP4) use solid-gray
# content whose whole encode→decode chain collapses to scalar
# DC arithmetic (validated exhaustively for all 256 gray values):
#     y   = 0.299 v + 0.587 v + 0.114 v          (RGB; y = v for gray)
#     dcq = round_half_even(8 (y − 128) / 5)     (5 = Annex-K luma DC @ q85)
#     out = clip(round_half_even(dcq · 5 / 8 + 128))
# Values can only match if the JPEG quant tables, DCT, Huffman coding,
# container mux (RIFF / ISO-BMFF sample tables) and decoder all agree.

ORACLE_PNG_H, ORACLE_PNG_W = 16, 24
ORACLE_JPEG_SIDE = 16
ORACLE_WAV_N = 256
ORACLE_VID_FRAMES = 4
ORACLE_VID_SIDE = 16


def oracle_media_payload(doc_id: int) -> tuple[bytes, str]:
    """Deterministic payload for one id — kind cycles by ``doc_id % 5``:
    PNG RGB gradient / solid-gray JPEG / PCM16 WAV / solid-gray
    MJPEG-AVI / solid-gray MJPEG-MP4."""
    from vertex_ray.stages.avi_codec import encode_avi_mjpeg
    from vertex_ray.stages.jpeg_codec import encode_jpeg
    from vertex_ray.stages.mp4_codec import encode_mp4_mjpeg
    from vertex_ray.stages.png_codec import encode_png
    from vertex_ray.stages.wav_codec import encode_wav

    k = doc_id % 5
    if k == 0:
        flat = (doc_id * 31
                + np.arange(ORACLE_PNG_H * ORACLE_PNG_W * 3)) % 256
        img = flat.reshape(ORACLE_PNG_H, ORACLE_PNG_W, 3).astype(np.uint8)
        return encode_png(img), "png"
    if k == 1:
        v = (doc_id * 13 + 7) % 256
        img = np.full((ORACLE_JPEG_SIDE, ORACLE_JPEG_SIDE), v, np.uint8)
        return encode_jpeg(img, quality=85), "jpeg"
    if k == 2:
        m = ((doc_id * 7919 + np.arange(ORACLE_WAV_N) * 131) % 65536
             ) - 32768
        return encode_wav(m.astype(np.float64) / 32768.0,
                          sample_rate=8000, bits=16), "wav"
    vt = (doc_id * 13 + np.arange(ORACLE_VID_FRAMES) * 29) % 256
    frames = np.broadcast_to(
        vt.astype(np.uint8)[:, None, None, None],
        (ORACLE_VID_FRAMES, ORACLE_VID_SIDE, ORACLE_VID_SIDE, 3),
    ).copy()
    if k == 3:
        return encode_avi_mjpeg(frames, fps=5, quality=85), "avi"
    return encode_mp4_mjpeg(frames, fps=5, quality=85), "mp4"


def build_oracle_media(batch: pa.Table) -> pa.Table:
    """documents ids → deterministic media payload rows (binary column
    plumbing is real; payload synthesis is per-row by nature but bounded
    by the fixed payload geometry, never by dataset width)."""
    ids = batch["doc_id"].to_numpy()
    pay, kinds = [], []
    for i in ids:
        p, k = oracle_media_payload(int(i))
        pay.append(p)
        kinds.append(k)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "media_kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(pay, type=pa.binary()),
    })


class MediaChecksum:
    """Actor-pool stage: decode payloads through the REAL codec dispatch
    (same magic-byte routing as MediaFeaturize) and emit integer
    checksums — (n_values, value_sum, value_min, value_max) over decoded
    uint8 pixels (images/video) or int16 samples (audio). Raises on any
    undecodable payload: this stage exists to PROVE decode correctness,
    so a digest fallback would defeat it."""

    def __init__(self):
        self.decoder_ready = True

    def _values(self, payload: bytes) -> np.ndarray:
        from vertex_ray.stages import (
            avi_codec, jpeg_codec, mp4_codec, png_codec, wav_codec,
        )

        if payload[:8] == png_codec.PNG_MAGIC:
            return png_codec.decode_png(payload).astype(np.int64).ravel()
        if payload[:2] == jpeg_codec.JPEG_MAGIC:
            return jpeg_codec.decode_jpeg(payload).astype(np.int64).ravel()
        if payload[:4] == wav_codec.WAV_MAGIC and payload[8:12] == b"WAVE":
            samples, _ = wav_codec.decode_wav(payload)
            return np.round(samples * 32768.0).astype(np.int64).ravel()
        if avi_codec.is_avi(payload):
            return avi_codec.decode_avi_mjpeg(payload) \
                .astype(np.int64).ravel()
        if mp4_codec.is_mp4(payload):
            return mp4_codec.decode_mp4_mjpeg(payload) \
                .astype(np.int64).ravel()
        raise ValueError("MediaChecksum: unknown payload format")

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [self._values(p) for p in batch["payload"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_kind": batch["media_kind"],
            "n_values": pa.array([v.size for v in vals], type=pa.int64()),
            "value_sum": pa.array([int(v.sum()) for v in vals],
                                  type=pa.int64()),
            "value_min": pa.array([int(v.min()) for v in vals],
                                  type=pa.int64()),
            "value_max": pa.array([int(v.max()) for v in vals],
                                  type=pa.int64()),
        })


def media_decode_checksums(ds, concurrency: int = 4, batch_size: int = 64):
    """documents → deterministic payloads → real-decode checksums."""
    return ds.map_batches(
        build_oracle_media, batch_format="pyarrow", batch_size=batch_size,
    ).map_batches(
        MediaChecksum,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
