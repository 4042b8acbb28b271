"""MP4 (ISO BMFF) container codec — pure ``struct``, no codec library.

The CONTAINER is the public ISO base media file format (boxes = 4-byte
size + fourcc): this module walks the box tree and extracts the metadata
a curation pipeline filters on — duration, track dimensions,
sample-entry codec fourcc, sample count — plus the stsz/stco sample
table, and writes structurally valid files (ftyp + moov with one video
track + mdat).

Pixel decode is REAL for the MJPEG profile (QuickTime Photo-JPEG,
sample-entry fourcc ``jpeg``): every ``mdat`` sample is a complete
baseline JFIF image, decoded by stages/jpeg_codec — the same trick as
MJPEG-in-AVI (stages/avi_codec), applied to ISO BMFF. Foreign codecs
(H.264/H.265) still parse as container metadata only; MediaFeaturize
surfaces those with ``decoded`` = False digest-tail features.
"""
from __future__ import annotations

import struct

MP4_BRANDS = (b"isom", b"iso2", b"mp41", b"mp42", b"avc1", b"M4V ")


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def encode_mp4(width: int, height: int, n_samples: int,
               duration_ms: int, frame_payload: bytes,
               codec: bytes = b"rawv", timescale: int = 1000,
               sample_sizes: list[int] | None = None) -> bytes:
    """Minimal structurally-valid MP4: ftyp + moov(mvhd, trak(tkhd,
    mdia(mdhd, hdlr, minf(stbl(stsd/stts/stsc/stsz/stco))))) + mdat.

    ``sample_sizes``: per-sample byte sizes (variable-size stsz table,
    the MJPEG path); default = equal split of ``frame_payload``. stco
    carries the REAL file offset of the mdat body so samples are
    addressable for decode (one chunk holding all samples, stsc 1:N)."""
    dur = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isomiso2")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, dur)
        + struct.pack(">IH2x8x", 0x10000, 0x0100) + matrix
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0) + struct.pack(">I", 2))
    tkhd = _box(b"tkhd", struct.pack(
        ">B3BIIII", 0, 0, 0, 7, 0, 0, 1, 0) + struct.pack(">I", dur)
        + struct.pack(">8xHHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale,
                                     dur, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide"
                + b"\x00" * 12 + b"vertex\x00")
    # visual sample entry (stsd child): 8-byte sample-entry header +
    # 70 bytes of visual fields (dims at offset 24 within the entry)
    entry = (b"\x00" * 6 + struct.pack(">H", 1)          # reserved, dri
             + struct.pack(">HH12x", 0, 0)
             + struct.pack(">HH", width, height)
             + struct.pack(">IIII", 0x480000, 0x480000, 0, 1)
             + b"\x00" * 32 + struct.pack(">HH", 0x18, 0xFFFF))
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1)
                + _box(codec, entry))
    per = max(1, dur // max(1, n_samples))
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, n_samples, per))
    stsc = _box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, n_samples, 1))
    if sample_sizes is not None:
        if sum(sample_sizes) != len(frame_payload):
            raise ValueError("mp4: sample_sizes must sum to payload length")
        stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, len(sample_sizes))
                    + struct.pack(f">{len(sample_sizes)}I", *sample_sizes))
    else:
        size = len(frame_payload) // max(1, n_samples)
        stsz = _box(b"stsz", struct.pack(">B3xII", 0, size, n_samples))

    def build_moov(mdat_body_off: int) -> bytes:
        stco = _box(b"stco", struct.pack(">B3xII", 0, 1, mdat_body_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _box(b"vmhd", struct.pack(">B3BHHHH", 0, 0, 0, 1, 0, 0, 0, 0))
        dref = _box(b"dref", struct.pack(">B3xI", 0, 1)
                    + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1)))
        minf = _box(b"minf", vmhd + _box(b"dinf", dref) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    # moov's length does not depend on the stco value (fixed 4-byte
    # field), so build the small moov once to measure; the mdat payload
    # (the big part) is concatenated exactly once
    mdat_body = len(ftyp) + len(build_moov(0)) + 8
    return ftyp + build_moov(mdat_body) + _box(b"mdat", frame_payload)


def encode_mp4_mjpeg(frames, fps: int = 10, quality: int = 85) -> bytes:
    """(T, H, W, 3) uint8 frames → MJPEG-in-MP4 bytes: each sample in
    ``mdat`` is a complete baseline JFIF image (the avi_codec trick on
    ISO BMFF — QuickTime Photo-JPEG, sample-entry fourcc ``jpeg``), so
    the whole container decodes with stages/jpeg_codec and no codec
    library. Variable-size stsz table + real stco offset make every
    sample addressable."""
    import numpy as np

    from vertex_ray.stages.jpeg_codec import encode_jpeg

    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_mp4_mjpeg expects (T, H, W, 3) frames")
    t, h, w, _ = frames.shape
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(t)]
    return encode_mp4(w, h, t, t * 1000 // max(1, fps), b"".join(jpegs),
                      codec=b"jpeg", sample_sizes=[len(j) for j in jpegs])


def mp4_samples(payload: bytes) -> list[tuple[int, int]]:
    """(file_offset, size) of every sample, from the stsz table (or
    fixed size) + the first stco chunk offset (the single-chunk layout
    this module writes: stsc maps all samples into chunk 1
    back-to-back)."""
    sizes: list[int] = []
    chunk_off = [0]

    def walk(start, end):
        for fourcc, body, bend in _walk(payload, start, end):
            if fourcc == b"stsz":
                fixed, n = struct.unpack(">II", payload[body + 4:body + 12])
                if fixed:
                    sizes.extend([fixed] * n)
                else:
                    sizes.extend(struct.unpack(
                        f">{n}I", payload[body + 12:body + 12 + 4 * n]))
            elif fourcc == b"stco":
                n = struct.unpack(">I", payload[body + 4:body + 8])[0]
                if n:
                    chunk_off[0] = struct.unpack(
                        ">I", payload[body + 8:body + 12])[0]
            elif fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, bend)

    walk(0, len(payload))
    out = []
    pos = chunk_off[0]
    for s in sizes:
        out.append((pos, s))
        pos += s
    return out


def decode_mp4_mjpeg(payload: bytes):
    """MJPEG-in-MP4 bytes → (T, H, W, 3) uint8 frames via the stsz/stco
    sample walk + per-sample baseline-JPEG decode."""
    import numpy as np

    from vertex_ray.stages.jpeg_codec import JPEG_MAGIC, decode_jpeg

    meta = parse_mp4(payload)
    if meta["codec"] not in ("jpeg", "mjpa", "MJPG"):
        raise ValueError(f"mp4: not an MJPEG sample entry: {meta['codec']!r}")
    samples = mp4_samples(payload)
    if not samples:
        raise ValueError("mp4: no addressable samples")
    frames = []
    for off, size in samples:
        blob = payload[off:off + size]
        if blob[:2] != JPEG_MAGIC:
            raise ValueError("mp4: sample is not a JFIF image")
        f = decode_jpeg(blob)
        if f.ndim == 2 or f.shape[2] == 1:
            f = np.repeat(f.reshape(f.shape[0], f.shape[1], 1), 3, axis=2)
        frames.append(f)
    if len({f.shape for f in frames}) != 1:
        raise ValueError("mp4: inconsistent frame shapes")
    return np.stack(frames)


def _walk(blob: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size, fourcc = struct.unpack(">I4s", blob[pos:pos + 8])
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", blob[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:  # to end of file
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if size < 8 or pos + size > end:
            raise ValueError(f"mp4: bad box size at {pos}")
        yield fourcc, body, pos + size
        pos += size


def parse_mp4(payload: bytes) -> dict:
    """MP4 bytes → {brand, duration_ms, width, height, codec,
    n_samples, n_tracks}. Raises ValueError on malformed boxes or a
    missing moov."""
    if not is_mp4(payload):
        raise ValueError("mp4: no ftyp box")
    out = {"brand": "", "duration_ms": 0, "width": 0, "height": 0,
           "codec": "", "n_samples": 0, "n_tracks": 0}

    def walk(start, end, depth=0):
        for fourcc, body, bend in _walk(payload, start, end):
            if fourcc == b"ftyp":
                out["brand"] = payload[body:body + 4].decode(
                    "ascii", "replace")
            elif fourcc == b"mvhd":
                ver = payload[body]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20:body + 32])
                else:
                    ts, dur = struct.unpack(
                        ">II", payload[body + 12:body + 20])
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif fourcc == b"tkhd":
                out["n_tracks"] += 1
                w, h = struct.unpack(">II", payload[bend - 8:bend])
                if w and h:  # the video track carries 16.16 dims
                    out["width"] = w >> 16
                    out["height"] = h >> 16
            elif fourcc == b"stsd":
                n = struct.unpack(">I", payload[body + 4:body + 8])[0]
                if n:
                    out["codec"] = payload[body + 12:body + 16].decode(
                        "ascii", "replace")
            elif fourcc == b"stsz":
                out["n_samples"] = struct.unpack(
                    ">I", payload[body + 8:body + 12])[0]
            elif fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(body, bend, depth + 1)

    walk(0, len(payload))
    if out["n_tracks"] == 0 and out["duration_ms"] == 0:
        raise ValueError("mp4: no moov metadata found")
    return out
