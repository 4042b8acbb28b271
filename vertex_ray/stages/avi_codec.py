"""Motion-JPEG in AVI — a REAL video decode path with no codec library.

The AVI container is plain RIFF (the public Microsoft AVI file-format
spec: RIFF('AVI ') → LIST('hdrl') with the MainAVIHeader ``avih`` and a
LIST('strl') stream header, then LIST('movi') holding one '00dc'
compressed-frame chunk per video frame, then an optional 'idx1' index).
With MJPG as the stream handler every '00dc' chunk is a complete
baseline JFIF image, so stages/jpeg_codec (pure numpy) decodes each
frame — the whole pipeline from container bytes to pixel arrays runs
here for real, unlike MP4 whose H.264 payload needs an external codec.

Both directions are implemented: ``encode_avi_mjpeg`` (the fixture
writer — frames → per-frame JPEG → RIFF) and ``parse_avi`` /
``decode_avi_mjpeg`` (metadata walk, frame extraction, pixel decode).

Reference parity: the reference has no media pipeline; this slots into
the beyond-reference multimodal column story (stages/multimodal) as the
video analogue of the PNG/JPEG/WAV library formats.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10,
                     quality: int = 85) -> bytes:
    """(T, H, W, 3) uint8 frames → MJPEG AVI bytes (one baseline JPEG
    per '00dc' chunk, idx1 index included)."""
    from vertex_ray.stages.jpeg_codec import encode_jpeg

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi_mjpeg expects (T, H, W, 3) frames")
    t, h, w, _ = frames.shape
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(t)]
    max_bytes = max((len(j) for j in jpegs), default=0)

    us_per_frame = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<14I",
        us_per_frame,            # dwMicroSecPerFrame
        max_bytes * max(1, fps),  # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        t,                       # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,        # dwWidth, dwHeight, dwReserved[4]
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0,                 # dwFlags, wPriority, wLanguage
        0,                       # dwInitialFrames
        1, max(1, fps),          # dwScale, dwRate → fps frames/sec
        0, t,                    # dwStart, dwLength
        max_bytes, 0xFFFFFFFF & -1, 0,  # dwSuggestedBufferSize, dwQuality(-1), dwSampleSize
        0, 0, np.int16(w), np.int16(h),  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_body))  # offset of the chunk within movi
        movi_body += _chunk(b"00dc", j)
    movi = _chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(j))
        for off, j in zip(offsets, jpegs)
    )
    idx1 = _chunk(b"idx1", idx)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) for RIFF chunks in [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("avi: truncated chunk")
        yield fourcc, body, size
        pos = body + size + (size & 1)


def parse_avi(payload: bytes) -> dict:
    """Container metadata from the header walk (no frame decode):
    width / height / fps / n_frames / handler / frame chunk spans."""
    if not is_avi(payload):
        raise ValueError("not an AVI RIFF payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(len(payload), 8 + riff_size)
    meta = {"width": 0, "height": 0, "fps": 0, "n_frames": 0,
            "handler": "", "frames": []}

    def walk(start, stop, depth=0):
        if depth > 8:
            # real AVIs nest 2-3 LIST levels; a crafted payload of
            # thousands of nested LISTs must fail as ValueError (which
            # callers handle), not RecursionError (which they don't)
            raise ValueError("avi: LIST nesting too deep")
        for fourcc, body, size in _walk_chunks(payload, start, stop):
            if fourcc == b"LIST":
                ltype = payload[body:body + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(body + 4, body + size, depth + 1)
            elif fourcc == b"avih" and size >= 40:
                v = struct.unpack_from("<10I", payload, body)
                meta["n_frames"] = v[4]
                meta["width"], meta["height"] = v[8], v[9]
                if v[0]:
                    meta["fps"] = round(1_000_000 / v[0])
            elif fourcc == b"strh" and size >= 48:
                if payload[body:body + 4] == b"vids":
                    meta["handler"] = payload[body + 4:body + 8].decode(
                        "ascii", "replace")
                    scale, rate = struct.unpack_from("<II", payload, body + 20)
                    if scale:
                        meta["fps"] = round(rate / scale)
            elif fourcc in (b"00dc", b"00db"):
                meta["frames"].append((body, size))

    walk(12, end)
    return meta


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """AVI bytes → (T, H, W, 3) uint8 frames via per-chunk JPEG decode."""
    from vertex_ray.stages.jpeg_codec import decode_jpeg

    meta = parse_avi(payload)
    if meta["handler"] not in ("MJPG", "mjpg", ""):
        raise ValueError(f"avi: unsupported codec {meta['handler']!r}")
    if not meta["frames"]:
        raise ValueError("avi: no frame chunks")
    frames = [decode_jpeg(payload[off:off + size])
              for off, size in meta["frames"]]
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError("avi: inconsistent frame shapes")
    return np.stack(frames)
