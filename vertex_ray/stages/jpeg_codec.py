"""Pure numpy + stdlib baseline JPEG (JFIF) codec — un-stubs the image
library format beyond PNG in the multimodal decode path (stages/
multimodal routed ``image/jpeg`` payloads to the digest stub because
PIL is absent; baseline JPEG needs no codec library: the container is
``struct``, Huffman coding is a small bit loop, and the 8×8 DCT is one
batched numpy matmul).

Scope (ITU T.81 baseline sequential DCT, the overwhelmingly common web
subset): 8-bit samples, Huffman entropy coding, grayscale or YCbCr with
any of 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers honored,
progressive/arithmetic/12-bit rejected with ValueError. Tables are the
public Annex K defaults (quant + Huffman); quality scaling follows the
common 5000/q convention.

Performance shape: the entropy scan is an inherently sequential
bit-level Huffman loop (per-symbol Python) — this stage is an
actor-pool ``map_batches`` member where each payload is one task-local
unit of work, so the loop is bounded by payload size, never by dataset
size. Dequant + IDCT + color convert are fully vectorized (one batched
(n_blocks, 8, 8) matmul per component).
"""
from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# ---------------------------------------------------------------------------
# constants: zigzag, DCT basis, Annex K default tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    out = []
    for s in range(15):
        rs = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rs if s % 2 else reversed(list(rs))):
            out.append(r * 8 + (s - r))
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()                       # block index -> zigzag position
UNZIGZAG = np.argsort(ZIGZAG)            # kept for reference/readers


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT = _dct_matrix()                     # F = M f M^T ; f = M^T F M

# Annex K quantization tables (natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K Huffman tables: (16 BITS counts, HUFFVAL symbols)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _canonical_codes(bits: list[int], vals: list[int]):
    """(BITS, HUFFVAL) → {symbol: (code, length)} and the decode map
    {(length, code): symbol} per T.81 C.2."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            enc[sym] = (code, ln)
            dec[(ln, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# bit I/O (with 0xFF byte stuffing)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1 bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.d[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, dec: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = dec.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder (baseline, 4:2:0 color / single-component gray, Annex K tables)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray):
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255) \
        .astype(np.uint8)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge") \
        if ph or pw else plane


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (H//8 * W//8, 8, 8) raster order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _quantized_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift + DCT + quantize all 8×8 blocks of one plane (batched
    matmul — the vectorized half of the codec)."""
    b = _blocks_of(plane).astype(np.float64) - 128.0
    f = np.einsum("ux,nxy,vy->nuv", _DCT, b, _DCT)
    q = np.round(f / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]  # zigzag-ordered coefficients


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_enc: dict, ac_enc: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_enc[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_enc[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JFIF bytes
    (4:2:0 chroma subsampling for color, Annex K tables)."""
    assert img.dtype == np.uint8
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    dc_l_enc, _ = _canonical_codes(*DC_LUMA)
    ac_l_enc, _ = _canonical_codes(*AC_LUMA)
    dc_c_enc, _ = _canonical_codes(*DC_CHROMA)
    ac_c_enc, _ = _canonical_codes(*AC_CHROMA)

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xFFDB, bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))

    def dht(cls, tid, table):
        bits, vals = table
        return _seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits)
                    + bytes(vals))

    out += dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
    if not gray:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)

    if gray:
        comps = [(1, 0x11, 0)]
        sos = [(1, 0x00)]
    else:
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
        sos = [(1, 0x00), (2, 0x11), (3, 0x11)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += _seg(0xFFC0, sof)
    sos_body = bytes([len(sos)])
    for cid, tabs in sos:
        sos_body += bytes([cid, tabs])
    sos_body += bytes([0, 63, 0])
    out += _seg(0xFFDA, sos_body)

    bw = _BitWriter()
    if gray:
        plane = _pad_to(img, 8, 8)
        zz = _quantized_blocks(plane, ql)
        pred = 0
        for i in range(zz.shape[0]):
            pred = _encode_block(bw, zz[i], pred, dc_l_enc, ac_l_enc)
    else:
        y, cb, cr = _rgb_to_ycbcr(img)
        y = _pad_to(y, 16, 16)
        # 4:2:0: box-average chroma, then pad to 8
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2,
                          cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        cr2 = crp.reshape(crp.shape[0] // 2, 2,
                          crp.shape[1] // 2, 2).mean(axis=(1, 3))
        cb2 = _pad_to(cb2, 8, 8)
        cr2 = _pad_to(cr2, 8, 8)
        zzy = _quantized_blocks(y, ql)
        zzcb = _quantized_blocks(cb2, qc)
        zzcr = _quantized_blocks(cr2, qc)
        ybw = y.shape[1] // 8            # Y blocks per row
        cbw = cb2.shape[1] // 8
        py = pcb = pcr = 0
        for my in range(y.shape[0] // 16):
            for mx in range(y.shape[1] // 16):
                for dy in range(2):
                    for dx in range(2):
                        bi = (my * 2 + dy) * ybw + mx * 2 + dx
                        py = _encode_block(bw, zzy[bi], py,
                                           dc_l_enc, ac_l_enc)
                ci = my * cbw + mx
                pcb = _encode_block(bw, zzcb[ci], pcb, dc_c_enc, ac_c_enc)
                pcr = _encode_block(bw, zzcr[ci], pcr, dc_c_enc, ac_c_enc)
    out += bw.flush()
    out += struct.pack(">H", 0xFFD9)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential, general sampling factors, restarts)
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w, channels) array (1 or 3
    channels). Raises ValueError outside the baseline subset."""
    if payload[:2] != JPEG_MAGIC:
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker sync lost")
        marker = struct.unpack(">H", payload[pos:pos + 2])[0]
        if marker == 0xFFD9:
            break
        ln = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xFFDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1:p + 65], np.uint8) \
                    .astype(np.int64)
                tab = np.zeros(64, np.int64)
                tab[ZIGZAG] = zz
                qtabs[tq] = tab
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                _, dec = _canonical_codes(bits, vals)
                (dc_dec if cls == 0 else ac_dec)[tid] = dec
                p += 17 + nv
        elif marker == 0xFFC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError(
                f"jpeg: non-baseline frame marker {marker:#06x} "
                "(progressive/arithmetic/lossless unsupported)")
        elif marker == 0xFFDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xFFDA:
            ns = body[0]
            tables = {}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i:3 + 2 * i]
                tables[cid] = (tabs >> 4, tabs & 0xF)
            # entropy-coded data runs until the next real marker
            p = pos + 2 + ln
            segs: list[bytearray] = [bytearray()]
            while p < len(payload):
                b = payload[p]
                if b == 0xFF and p + 1 < len(payload):
                    nxt = payload[p + 1]
                    if nxt == 0x00:
                        segs[-1].append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker
                        segs.append(bytearray())
                        p += 2
                        continue
                    break  # real marker ends the scan
                segs[-1].append(b)
                p += 1
            scan = (tables, [bytes(s) for s in segs])
            pos = p
            continue
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    h, w, comps = frame
    tables, segs = scan

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]          # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        c["pred"] = 0
        c["dc"], c["ac"] = tables[c["id"]]

    mcu = 0
    seg_i = 0
    br = _BitReader(segs[0])
    n_mcu = mcux * mcuy
    while mcu < n_mcu:
        if restart_interval and mcu and mcu % restart_interval == 0 \
                and seg_i + 1 < len(segs):
            seg_i += 1
            br = _BitReader(segs[seg_i])
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(mcu, mcux)
        for c in comps:
            dcd = dc_dec[c["dc"]]
            acd = ac_dec[c["ac"]]
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    s = br.decode_symbol(dcd)
                    diff = _extend(br.receive(s), s) if s else 0
                    c["pred"] += diff
                    zz[0] = c["pred"]
                    k = 1
                    while k < 64:
                        rs = br.decode_symbol(acd)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break        # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(br.receive(s), s)
                        k += 1
                    bi = (my * c["v"] + dy) * c["bw"] + mx * c["h"] + dx
                    c["coef"][bi] = zz
        mcu += 1

    planes = []
    for c in comps:
        q = qtabs[c["tq"]]
        blocks = np.zeros((c["coef"].shape[0], 64), np.float64)
        blocks[:, ZIGZAG] = c["coef"]    # un-zigzag
        blocks = blocks * q              # dequantize (natural order)
        b = blocks.reshape(-1, 8, 8)
        px = np.einsum("xu,nuv,yv->nxy", _DCT.T, b, _DCT.T) + 128.0
        bh, bw_ = c["bh"], c["bw"]
        plane = (px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw_ * 8))
        # upsample to full MCU grid resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    if len(planes) != 3:
        raise ValueError(f"jpeg: {len(planes)}-component images unsupported")
    return _ycbcr_to_rgb(*planes)
