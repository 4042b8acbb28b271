"""WAV (stages/wav_codec) + baseline JPEG (stages/jpeg_codec) — the
round-4 un-stubbing of the remaining image/audio library formats in the
multimodal decode path. Golden decodes, roundtrip fidelity, subset
rejection, and the featurize-stage integration (decoded flag true for
image/jpeg + audio/wav payloads; stub now video-container-only)."""

import numpy as np
import pytest

from vertex_ray.stages.jpeg_codec import decode_jpeg, encode_jpeg
from vertex_ray.stages.wav_codec import decode_wav, encode_wav


def _smooth_rgb(h=56, w=64):
    x, y = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h))
    return np.stack([200 * x, 100 + 80 * y, 150 * (x + y) / 2],
                    axis=2).astype(np.uint8)


# --- WAV -------------------------------------------------------------------


@pytest.mark.parametrize("bits,tol", [(8, 1 / 60), (16, 1 / 30000),
                                      (24, 1e-6), (32, 1e-8)])
def test_wav_roundtrip_all_depths(bits, tol):
    rng = np.random.default_rng(3)
    s = rng.normal(0, 0.25, size=(777, 2)).clip(-1, 1)
    out, rate = decode_wav(encode_wav(s, sample_rate=22050, bits=bits))
    assert rate == 22050 and out.shape == (777, 2)
    assert np.abs(out - s).max() < tol


def test_wav_mono_and_int16_exact():
    """16-bit PCM roundtrips the int16 grid exactly."""
    i = np.array([-32768, -1, 0, 1, 32767], np.int16)
    s = i.astype(np.float64) / 32768.0
    out, _ = decode_wav(encode_wav(s, 8000, bits=16))
    assert (np.round(out * 32768.0).astype(np.int16) == i.reshape(-1, 1)).all()


def test_wav_float32_format():
    import struct

    s = np.linspace(-0.5, 0.5, 64, dtype=np.float32)
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 16000 * 4, 4, 32)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(payload)
    assert rate == 16000
    assert np.allclose(out[:, 0], s, atol=1e-7)


def test_wav_rejects_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="unsupported"):
        # format 2 (ADPCM) rejected
        import struct

        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_skips_unknown_chunks():
    import struct

    s = np.zeros(16)
    payload = bytearray(encode_wav(s, 8000, bits=16))
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = bytes(payload[:fmt_end]) + extra + bytes(payload[fmt_end:])
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    out, rate = decode_wav(spliced)
    assert out.shape == (16, 1) and rate == 8000


# --- JPEG ------------------------------------------------------------------


def test_jpeg_roundtrip_color_smooth():
    img = _smooth_rgb()
    for q, tol in [(50, 4.0), (85, 2.0), (95, 1.5)]:
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < tol, q


def test_jpeg_roundtrip_grayscale():
    x, y = np.meshgrid(np.arange(48), np.arange(40))
    g = ((x * 5 + y * 3) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (40, 48, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).mean() < 2.0


def test_jpeg_odd_dimensions():
    img = _smooth_rgb(37, 23)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == (37, 23, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0


def test_jpeg_deterministic_bytes():
    img = _smooth_rgb(24, 24)
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)


def test_jpeg_rejects_non_baseline():
    img = _smooth_rgb(16, 16)
    b = bytearray(encode_jpeg(img, 85))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive|non-baseline"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00garbage")


def test_jpeg_444_subsampling_decodes():
    """Decoder handles 4:4:4 (synthesize by patching the encoder's
    sampling factors path is overkill — craft via grayscale 3x? no:
    simplest 4:4:4 source is a 1-component image; color 4:2:0 covered
    above, so pin the general sampling-factor math with 4:2:2 crafted
    from the encoder's building blocks)."""
    # encode each plane independently as grayscale and compare the
    # decoder's plane math against the original — exercises the
    # Hi/Vi==Hmax/Vmax (no upsample) branch
    img = _smooth_rgb(32, 32)
    for c in range(3):
        dec = decode_jpeg(encode_jpeg(img[:, :, c], quality=92))
        assert np.abs(dec[:, :, 0].astype(int)
                      - img[:, :, c].astype(int)).mean() < 1.5


def test_jpeg_golden_decode_stability():
    """The decoded pixels of a fixed payload are bit-stable (pure
    function of the bytes — the determinism the featurize stage's
    repeat-run test relies on)."""
    import hashlib

    img = _smooth_rgb(40, 40)
    payload = encode_jpeg(img, quality=80)
    h1 = hashlib.sha256(decode_jpeg(payload).tobytes()).hexdigest()
    h2 = hashlib.sha256(decode_jpeg(payload).tobytes()).hexdigest()
    assert h1 == h2


# --- featurize-stage integration ------------------------------------------


def test_featurize_decodes_jpeg_and_wav(ray_session):
    import ray.data as rd

    from vertex_ray.stages.multimodal import featurize_media, synth_media_table

    media = synth_media_table(120)
    mimes = media["mime"].to_pylist()
    assert "image/jpeg" in mimes and "audio/wav" in mimes  # real payloads
    out = featurize_media(rd.from_arrow(media), concurrency=2,
                          batch_size=16).to_pandas()
    assert len(out) == 120
    # EVERY payload decodes for real now — the stub is video-library-only
    assert out["decoded"].all()


def test_featurize_wav_matches_rawm_features():
    """A WAV payload and a RAWM payload of the SAME samples featurize
    identically (16-bit PCM roundtrips the int16 grid exactly)."""
    from vertex_ray.stages import media_codec
    from vertex_ray.stages.multimodal import MediaFeaturize

    rng = np.random.default_rng(11)
    samples = (rng.normal(0, 0.2, 2048).clip(-1, 1) * 32767) \
        .astype(np.int16)
    raw = media_codec.encode_audio(samples, 16000)
    wav = encode_wav(samples.astype(np.float64) / 32768.0, 16000, bits=16)
    mf = MediaFeaturize()
    f_raw, ok1 = mf._one(raw, "audio")
    f_wav, ok2 = mf._one(wav, "audio")
    assert ok1 and ok2
    assert np.allclose(f_raw, f_wav, atol=1e-6)


def test_featurize_stub_only_for_video_containers():
    from vertex_ray.stages.multimodal import MediaFeaturize

    mf = MediaFeaturize()
    _, ok = mf._one(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64, "video")
    assert not ok  # MP4 stays an honest stub (no ffmpeg in container)


# --- MP4 container ---------------------------------------------------------


def test_mp4_container_roundtrip():
    from vertex_ray.stages.mp4_codec import encode_mp4, is_mp4, parse_mp4

    b = encode_mp4(320, 240, 10, 2500, b"\x42" * 1000)
    assert is_mp4(b)
    meta = parse_mp4(b)
    assert meta["width"] == 320 and meta["height"] == 240
    assert meta["duration_ms"] == 2500
    assert meta["n_samples"] == 10 and meta["codec"] == "rawv"
    assert meta["brand"] == "isom" and meta["n_tracks"] == 1


def test_mp4_parse_rejects_malformed():
    from vertex_ray.stages.mp4_codec import encode_mp4, parse_mp4

    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4(b"\x00\x00\x00\x08free")
    b = bytearray(encode_mp4(64, 64, 2, 100, b"xy"))
    b[0:4] = (10**8).to_bytes(4, "big")  # corrupt the first box size
    with pytest.raises(ValueError, match="box size"):
        parse_mp4(bytes(b))


def test_featurize_mp4_parses_container_metadata():
    """MP4 payloads get REAL container features (duration, dims, sample
    count from the box walk) while the pixel decode stays an honest
    stub (decoded=False)."""
    from vertex_ray.stages.mp4_codec import encode_mp4
    from vertex_ray.stages.multimodal import MediaFeaturize

    mf = MediaFeaturize()
    p = encode_mp4(256, 128, 30, 5000, b"\x11" * 3000)
    feat, ok = mf._one(p, "video")
    assert not ok                       # codec decode honestly stubbed
    assert abs(feat[1] - 256 / 512) < 1e-6
    assert abs(feat[2] - 128 / 512) < 1e-6
    assert abs(feat[0] - np.log1p(5000) / 10.0) < 1e-6
    # and a DIFFERENT geometry yields different metadata features
    feat2, _ = mf._one(encode_mp4(512, 512, 30, 5000, b"\x11" * 3000),
                       "video")
    assert feat2[1] != feat[1]


# --- MJPEG AVI (real video decode) ----------------------------------------


def test_avi_mjpeg_roundtrip_smooth():
    """Container metadata is exact; per-frame pixels match the JPEG
    codec's own decode of each stored chunk byte-for-byte, and smooth
    frames survive the lossy roundtrip within JPEG tolerance."""
    from vertex_ray.stages.avi_codec import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        is_avi,
        parse_avi,
    )
    from vertex_ray.stages.jpeg_codec import decode_jpeg

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.stack([
        np.stack([(xx * 2 + t * 10) % 256, (yy * 3) % 256,
                  ((xx + yy) // 2) % 256], axis=-1).astype(np.uint8)
        for t in range(5)
    ])
    payload = encode_avi_mjpeg(frames, fps=5, quality=92)
    assert is_avi(payload)
    meta = parse_avi(payload)
    assert meta["width"] == w and meta["height"] == h
    assert meta["n_frames"] == 5 and meta["fps"] == 5
    assert meta["handler"] == "MJPG" and len(meta["frames"]) == 5
    out = decode_avi_mjpeg(payload)
    assert out.shape == frames.shape and out.dtype == np.uint8
    # chunk-level: decode equals the jpeg codec applied to each chunk
    off, size = meta["frames"][0]
    np.testing.assert_array_equal(out[0], decode_jpeg(payload[off:off + size]))
    # pixel-level: lossy but close on smooth gradients
    assert np.mean(np.abs(out.astype(int) - frames.astype(int))) < 12


def test_avi_rejects_malformed():
    from vertex_ray.stages.avi_codec import decode_avi_mjpeg, parse_avi

    with pytest.raises(ValueError, match="not an AVI"):
        parse_avi(b"RIFFxxxxWAVE")
    from vertex_ray.stages.avi_codec import encode_avi_mjpeg

    frames = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    b = bytearray(encode_avi_mjpeg(frames))
    b[16:20] = (10**8).to_bytes(4, "little")  # corrupt the hdrl LIST size
    with pytest.raises(ValueError, match="truncated"):
        decode_avi_mjpeg(bytes(b))


def test_featurize_avi_real_decode():
    """AVI payloads decode for REAL (decoded=True) and featurize like
    the RAWM container of (approximately) the same frames."""
    from vertex_ray.stages import media_codec
    from vertex_ray.stages.avi_codec import encode_avi_mjpeg
    from vertex_ray.stages.multimodal import MediaFeaturize

    rng = np.random.default_rng(5)
    raw = media_codec.synth_rawm_payload("video", rng)
    _, frames = media_codec.decode(raw)
    payload = encode_avi_mjpeg(frames[:4], fps=5, quality=92)
    mf = MediaFeaturize()
    feat, ok = mf._one(payload, "video")
    assert ok
    assert feat.shape == (16,) and np.isfinite(feat).all()


def test_avi_deep_nesting_rejected_as_valueerror():
    """Crafted deeply-nested LIST payloads must fail as ValueError (the
    error type every caller handles), never RecursionError."""
    import struct

    from vertex_ray.stages.avi_codec import parse_avi

    body = b"movi"
    for _ in range(400):
        chunk = b"LIST" + struct.pack("<I", len(body)) + body
        body = b"movi" + chunk  # each level: LIST('movi' LIST('movi' ...))
    payload = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"AVI " \
        + b"LIST" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="nesting too deep"):
        parse_avi(payload)


# --- MJPEG MP4 (real video decode on ISO BMFF) -----------------------------


def _grad_frames(t=3, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.stack([(yy * 4 + i * 10) % 256, (xx * 3) % 256,
                   ((yy + xx) * 2) % 256], axis=2)
         for i in range(t)]
    ).astype(np.uint8)


def test_mp4_mjpeg_roundtrip():
    from vertex_ray.stages.mp4_codec import (
        decode_mp4_mjpeg, encode_mp4_mjpeg, is_mp4, mp4_samples, parse_mp4,
    )

    frames = _grad_frames()
    b = encode_mp4_mjpeg(frames, fps=5, quality=85)
    assert is_mp4(b)
    meta = parse_mp4(b)
    assert (meta["codec"], meta["n_samples"]) == ("jpeg", 3)
    assert (meta["width"], meta["height"]) == (48, 32)
    # stsz/stco sample walk addresses real JFIF bytes
    samples = mp4_samples(b)
    assert len(samples) == 3
    for off, size in samples:
        assert b[off:off + 2] == b"\xff\xd8"
    dec = decode_mp4_mjpeg(b)
    assert dec.shape == (3, 32, 48, 3) and dec.dtype == np.uint8
    assert np.max(np.abs(dec.astype(int) - frames.astype(int))) <= 12


def test_mp4_mjpeg_identical_to_avi_decode():
    """Same frames through both video containers decode to IDENTICAL
    pixels — the container walks are independent, the JPEG chain is
    shared, so any divergence is a sample-addressing bug."""
    from vertex_ray.stages.avi_codec import decode_avi_mjpeg, encode_avi_mjpeg
    from vertex_ray.stages.mp4_codec import decode_mp4_mjpeg, encode_mp4_mjpeg

    frames = _grad_frames(4)
    via_mp4 = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, fps=5, quality=85))
    via_avi = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=5, quality=85))
    assert np.array_equal(via_mp4, via_avi)


def test_mp4_mjpeg_rejects_foreign_codec():
    from vertex_ray.stages.mp4_codec import decode_mp4_mjpeg, encode_mp4

    with pytest.raises(ValueError, match="MJPEG"):
        decode_mp4_mjpeg(encode_mp4(64, 64, 2, 100, b"xy" * 8))


def test_featurize_mp4_mjpeg_real_decode():
    """MJPEG MP4 decodes for REAL (decoded=True) and featurizes exactly
    like the same frames in an AVI container."""
    from vertex_ray.stages.avi_codec import encode_avi_mjpeg
    from vertex_ray.stages.mp4_codec import encode_mp4_mjpeg
    from vertex_ray.stages.multimodal import MediaFeaturize

    frames = _grad_frames(4)
    mf = MediaFeaturize()
    f_mp4, ok1 = mf._one(encode_mp4_mjpeg(frames, fps=5, quality=85), "video")
    f_avi, ok2 = mf._one(encode_avi_mjpeg(frames, fps=5, quality=85), "video")
    assert ok1 and ok2
    assert np.allclose(f_mp4, f_avi, atol=1e-6)


def test_featurize_non_wave_riff_not_routed_to_wav():
    """A RIFF payload whose form type is neither WAVE nor AVI (e.g.
    WebP) must take the digest fallback, not enter the WAV decoder."""
    from vertex_ray.stages.multimodal import MediaFeaturize, _digest_features

    p = b"RIFF" + (40).to_bytes(4, "little") + b"WEBP" + b"\x00" * 40
    mf = MediaFeaturize()
    feat, ok = mf._one(p, "image")
    assert not ok
    assert np.allclose(feat, _digest_features(p, "image"))


def test_synth_media_table_every_row_really_decodes():
    """No stubbed format remains in the synth set: every payload across
    RAWM / PNG / JPEG / WAV / MJPEG-AVI / MJPEG-MP4 decodes for real."""
    from vertex_ray.stages.multimodal import MediaFeaturize, synth_media_table

    t = synth_media_table(60)
    mimes = set(t["mime"].to_pylist())
    assert "video/mp4" in mimes and "video/x-msvideo" in mimes
    mf = MediaFeaturize()
    out = mf(t)
    assert out["decoded"].to_pandas().all()


def test_oracle_media_payload_kinds_and_determinism():
    from vertex_ray.stages.multimodal import oracle_media_payload

    kinds = [oracle_media_payload(i)[1] for i in range(10)]
    assert kinds == ["png", "jpeg", "wav", "avi", "mp4"] * 2
    assert oracle_media_payload(7) == oracle_media_payload(7)


def test_media_checksum_solid_gray_chain():
    """The checksum stage's JPEG-family values equal the scalar DC
    chain the SQL oracle uses (doc 1: v=(13+7)%256=20 → decodes to
    exactly 20; video frames via the color chain)."""
    import pyarrow as pa

    from vertex_ray.stages.multimodal import MediaChecksum, build_oracle_media

    out = MediaChecksum()(build_oracle_media(
        pa.table({"doc_id": pa.array([1, 3], pa.int64())}))).to_pandas()
    jpeg = out[out.media_kind == "jpeg"].iloc[0]
    assert jpeg.value_min == jpeg.value_max == 20
    assert jpeg.value_sum == 256 * 20

    def rhe(x):
        return float(np.round(x))

    avi = out[out.media_kind == "avi"].iloc[0]
    us = []
    for t in range(4):
        v = (3 * 13 + t * 29) % 256
        y = 0.299 * v + 0.587 * v + 0.114 * v
        dcq = rhe(8 * (y - 128) / 5)
        us.append(min(255, max(0, rhe(dcq * 5 / 8 + 128))))
    assert avi.value_sum == 16 * 16 * 3 * sum(us)
    assert avi.value_min == min(us) and avi.value_max == max(us)
