"""Pure numpy + stdlib-zlib PNG codec — un-stubs one REAL library format
in the multimodal decode path (stages/multimodal previously routed every
non-RAWM payload to the digest stub because PIL is absent; PNG needs no
codec library: zlib is stdlib and the scanline filters are numpy).

Scope (the common web subset): 8-bit depth, color types 0 (grayscale),
2 (RGB) and 6 (RGBA), no interlace, filters 0-4. The decoder verifies
chunk CRCs. Filter math per the PNG spec §9 (public W3C spec):

* None / Up are fully vectorized (2-D numpy subtract/add),
* Sub is an exact per-byte-lane cumulative sum mod 256 (vectorized),
* Average / Paeth carry a left-neighbor dependency → a per-PIXEL numpy
  loop across the row (w steps of bpp-wide ops), only on rows that use
  them — our own encoder always writes filter 0, so engine-produced
  PNGs decode on the vectorized path.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA → PNG
    bytes (filter 0 scanlines, one IDAT)."""
    assert img.dtype == np.uint8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8),             # filter byte 0 per row
         img.reshape(h, w * c)], axis=1).tobytes()
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, level))
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Filtered scanlines (h, 1 + w*bpp) → reconstructed (h, w*bpp)."""
    stride = w * bpp
    ftypes = raw[:, 0]
    data = raw[:, 1:].astype(np.uint8)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:                                  # None
            rec = row
        elif f == 2:                                # Up
            rec = row + prev                        # uint8 wraps mod 256
        elif f == 1:                                # Sub: lane cumsum
            lanes = row.reshape(w, bpp)
            rec = np.cumsum(lanes.astype(np.int64), axis=0) \
                .astype(np.uint8).reshape(stride)
        elif f == 3:                                # Average
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint16)
            pv = prev.reshape(w, bpp).astype(np.uint16)
            rw = row.reshape(w, bpp).astype(np.uint16)
            for x in range(w):
                left = (rw[x] + ((left + pv[x]) >> 1)) & 0xFF
                rec[x * bpp:(x + 1) * bpp] = left.astype(np.uint8)
        elif f == 4:                                # Paeth
            rec = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.int32)
            ul = np.zeros(bpp, np.int32)
            pv = prev.reshape(w, bpp).astype(np.int32)
            rw = row.reshape(w, bpp).astype(np.int32)
            for x in range(w):
                up = pv[x]
                p = left + up - ul
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pc_ = np.abs(p - ul)
                pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                                np.where(pb <= pc_, up, ul))
                left = (rw[x] + pred) & 0xFF
                ul = up
                rec[x * bpp:(x + 1) * bpp] = left.astype(np.uint8)
        else:
            raise ValueError(f"png: unknown filter type {f}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 (h, w, channels) array. Verifies CRCs; raises
    ValueError on anything outside the supported subset."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("png: bad magic")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack(">I4s", payload[pos:pos + 8])
        body = payload[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])[0]
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace:
        raise ValueError(
            f"png: unsupported (depth={depth} color={color} "
            f"interlace={interlace}) — 8-bit gray/RGB/RGBA only")
    bpp = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    expect = h * (1 + w * bpp)
    if len(raw) != expect:
        raise ValueError(f"png: {len(raw)} raw bytes, expected {expect}")
    rec = _unfilter(raw.reshape(h, 1 + w * bpp), h, w, bpp)
    return rec.reshape(h, w, bpp)
