"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBS — image/audio libraries are not
in this container — but everything Ray-side is real and tested: the
schema convention, the actor-pool stage shape (decoder "model" loaded
once per actor), batch sizing for large binary payloads, and the output
layout. Swap ``_decode_stub`` for a real decoder (PIL/librosa/ffmpeg)
without touching the pipeline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

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


def synth_media_table(n: int, seed: int = 21) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for testing
    the plumbing at any scale."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(200, 4000, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(
                np.where(kinds == "image", "image/png",
                         np.where(kinds == "audio", "audio/wav", "video/mp4")),
                type=pa.string(),
            ),
            "width": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(32, 512, size=n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, size=n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder: a real build would call PIL.Image.open / librosa.load
    / an ffmpeg frame sampler here. Deterministic fake: a 16-dim feature
    from the payload digest, so tests are stable and the full pipeline
    (batch sizes, schemas, actor signature) is exercised for real."""
    d = hashlib.blake2b(payload, digest_size=16).digest()
    return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


class MediaFeaturize:
    """Actor-pool stage: decode + feature-extract media payloads.

    The "model" (decoder context) is acquired once per actor in __init__
    (the geoip pattern). Use SMALL batch_size (payloads are large): e.g.
    ``map_batches(MediaFeaturize, batch_size=32, concurrency=N,
    num_cpus=1)`` so batch × concurrency fits worker heaps.
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim
        self.decoder_ready = True  # stands in for loading codec/model state

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        feats = np.stack(
            [_decode_stub(p, k) for p, k in zip(payloads, kinds)]
        ) if len(payloads) else np.zeros((0, self.feature_dim), dtype=np.float32)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    np.array([len(p) for p in payloads], dtype=np.int64)
                ),
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
