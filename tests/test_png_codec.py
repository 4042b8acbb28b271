"""Pure-numpy PNG codec (stages/png_codec): roundtrip, all five filter
types, CRC verification, and the multimodal integration."""

import struct
import zlib

import numpy as np
import pytest

from vertex_ray.stages.png_codec import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    encode_png,
)


def test_roundtrip_rgb_gray_rgba():
    rng = np.random.default_rng(7)
    for shape in [(5, 9, 3), (8, 3), (4, 4, 4), (1, 1, 3), (17, 2, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        exp = img if img.ndim == 3 else img[:, :, None]
        assert np.array_equal(out, exp)


def _manual_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Reference forward-filter (spec §9) to exercise the decoder on
    Sub/Up/Average/Paeth rows."""
    h, w, c = img.shape
    rows = []
    prev = np.zeros(w * c, np.int32)
    for y, f in zip(range(h), filters):
        cur = img[y].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, ul))
            filt = cur - pred
        rows.append(bytes([f]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))


def test_all_filter_types_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    payload = _manual_png(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(payload), img)


def test_crc_and_magic_rejected():
    img = np.zeros((2, 2, 3), np.uint8)
    payload = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JUNK" + bytes(payload[4:]))
    payload[40] ^= 0xFF  # corrupt inside a chunk body
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_multimodal_png_features_match_rawm(ray_session):
    """A PNG payload and a RAWM payload of the SAME pixels featurize
    identically — the PNG path is a real decode, not the stub."""
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages import media_codec
    from vertex_ray.stages.multimodal import MEDIA_SCHEMA, featurize_media

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([encode_png(rgb),
                             media_codec.encode_image(rgb)], pa.binary()),
        "mime": pa.array(["image/png", "application/x-rawm"], pa.string()),
        "width": pa.array([30, 30], pa.int32()),
        "height": pa.array([20, 20], pa.int32()),
        "duration_ms": pa.array([0, 0], pa.int32()),
    }, schema=MEDIA_SCHEMA)
    out = featurize_media(rd.from_arrow(t), concurrency=1, batch_size=2) \
        .to_pandas().sort_values("media_id")
    assert out["decoded"].all()
    a, b = out["feature"].tolist()
    assert np.allclose(a, b) and not np.allclose(a, 0)
