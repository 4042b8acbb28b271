"""Gorilla time-series compression (Pelkonen et al., VLDB 2015) — from
scratch, numpy-vectorized encode, sequential decode.

Format per series block (self-contained, little-endian raw headers):

Timestamp stream (epoch seconds, non-decreasing):
    [t0: i64][d0: i64 (if n >= 2)][delta-of-delta bits for points 2..n-1]
    dod codes (paper §4.1.1): ``0`` dod == 0; ``10`` + 7 bits for
    [-63, 64]; ``110`` + 9 bits for [-255, 256]; ``1110`` + 12 bits for
    [-2047, 2048]; ``1111`` + 32 bits otherwise. Bounded fields store
    dod + bias; the 32-bit field stores two's-complement.

Value stream (f64 bit patterns — NaN payloads such as the Prometheus
stale marker 0x7ff0000000000002 survive bit-for-bit):
    [v0: f64 raw][per point: ``0`` if XOR == 0 else ``11`` + 5-bit
    leading-zero count (capped 31) + 6-bit (meaningful_len - 1) +
    meaningful bits]
    The encoder always refreshes the leading/length window (control
    ``11``); the decoder additionally accepts the paper's ``10``
    reuse-previous-window control, so any conforming stream decodes.

This module is pure numpy — no Ray. The actor-pool encode stage lives in
stages/encode.py.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bit twiddling helpers (vectorized)
# ---------------------------------------------------------------------------


def _clz64(x: np.ndarray) -> np.ndarray:
    """Leading-zero count of uint64 via float64 frexp (x == 0 → 64).

    uint64→float64 conversion can round UP across a power-of-two boundary,
    making the result at most one SMALLER than the true clz — which for
    the encoder only widens the meaningful-bit window by one bit (always
    valid, decodes identically). It can never overestimate, and for exact
    powers of two (the _ctz64 path, which must be exact) it is exact.

    The one hazard is rounding up across 2**64 itself (top ~54 bits set):
    frexp then reports e=65 and the naive 64-e would be -1, which would
    corrupt the 5-bit lead / 6-bit mlen header fields downstream. True clz
    for those patterns is 0, so clamping to 0 is exact, not a widening."""
    x = np.asarray(x, dtype=np.uint64)
    e = np.frexp(x.astype(np.float64))[1]
    return np.where(x == 0, 64, np.maximum(64 - e, 0))


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (x == 0 → 64)."""
    x = x.astype(np.uint64)
    low = x & (~x + np.uint64(1))  # lowest set bit
    return np.where(x == 0, 64, 63 - _clz64(low))


def pack_bits(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """Concatenate variable-length MSB-first bit fields (each ≤ 64 bits).

    Bit-expansion strategy: materialize one uint8 per OUTPUT BIT (source
    field found with np.repeat, bit extracted with a vectorized shift),
    then ``np.packbits``. Every op is a contiguous C kernel — no scatter
    (``ufunc.at``) anywhere, which profiling showed dominated the encoder.
    Zero-length fields are skipped; output is zero-padded to a whole byte
    (same as packbits)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    keep = lengths > 0
    codes = np.asarray(codes)[keep].astype(np.uint64, copy=False)
    lengths = lengths[keep]
    if len(codes) == 0:
        return b""
    # uint64 end-to-end so the only big cast is the final uint8 for packbits
    lengths_u = lengths.astype(np.uint64)
    end_u = np.cumsum(lengths_u)  # exclusive end bit of each field
    total_bits = int(end_u[-1])
    fidx = np.repeat(np.arange(len(codes)), lengths)
    # shift = (end_of_field - 1) - absolute_bit_position
    shift = (end_u - np.uint64(1))[fidx] - np.arange(total_bits, dtype=np.uint64)
    bits = ((codes[fidx] >> shift) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()


class BitReader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, bit_pos: int = 0):
        self.buf = buf
        self.pos = bit_pos

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        start, end = self.pos, self.pos + k
        first, last = start >> 3, (end + 7) >> 3
        chunk = int.from_bytes(self.buf[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << k) - 1)


# ---------------------------------------------------------------------------
# timestamp stream
# ---------------------------------------------------------------------------

_DOD_BIASES = (63, 255, 2047)
_DOD_PREFIXES = ((0b10, 2, 7), (0b110, 3, 9), (0b1110, 4, 12))


def encode_timestamps(ts: np.ndarray) -> bytes:
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    if n == 0:
        return b""
    head = ts[0].tobytes()
    if n == 1:
        return head
    d = np.diff(ts)
    head += d[0].tobytes()
    if n == 2:
        return head
    dod = d[1:] - d[:-1]
    codes = np.zeros(len(dod), dtype=np.uint64)
    lens = np.zeros(len(dod), dtype=np.int64)
    done = dod == 0
    lens[done] = 1  # code 0
    for (prefix, plen, vbits), bias in zip(_DOD_PREFIXES, _DOD_BIASES):
        m = (~done) & (dod >= -bias) & (dod <= bias + 1)
        codes[m] = (np.uint64(prefix) << np.uint64(vbits)) | (
            (dod[m] + bias).astype(np.uint64)
        )
        lens[m] = plen + vbits
        done |= m
    m = ~done
    codes[m] = (np.uint64(0b1111) << np.uint64(32)) | (
        dod[m].astype(np.int32).view(np.uint32).astype(np.uint64)
    )
    lens[m] = 36
    return head + pack_bits(codes, lens)


def decode_timestamps(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = np.frombuffer(buf[:8], dtype=np.int64)[0]
    if n == 1:
        return out
    d = int(np.frombuffer(buf[8:16], dtype=np.int64)[0])
    out[1] = out[0] + d
    r = BitReader(buf, 128)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            v = r.read(32)
            dod = v - (1 << 32) if v >= (1 << 31) else v
        d += dod
        out[i] = out[i - 1] + d
    return out


# ---------------------------------------------------------------------------
# value stream
# ---------------------------------------------------------------------------


def encode_values(vals: np.ndarray) -> bytes:
    bits = np.ascontiguousarray(np.asarray(vals, dtype=np.float64)).view(np.uint64)
    n = len(bits)
    if n == 0:
        return b""
    head = bits[0].tobytes()
    if n == 1:
        return head
    x = bits[1:] ^ bits[:-1]
    lead = np.minimum(_clz64(x), 31)
    trail = _ctz64(x)
    mlen = 64 - lead - trail  # >= 1 whenever x != 0
    zero = x == 0
    # two fields per point: A = control(+window), B = meaningful bits
    a_codes = np.where(
        zero,
        np.uint64(0),
        (np.uint64(0b11) << np.uint64(11))
        | (lead.astype(np.uint64) << np.uint64(6))
        | np.where(zero, 0, mlen - 1).astype(np.uint64),
    )
    a_lens = np.where(zero, 1, 13)
    b_codes = np.where(zero, np.uint64(0), x >> trail.astype(np.uint64))
    b_lens = np.where(zero, 0, mlen)
    codes = np.empty(2 * (n - 1), dtype=np.uint64)
    lens = np.empty(2 * (n - 1), dtype=np.int64)
    codes[0::2], codes[1::2] = a_codes, b_codes
    lens[0::2], lens[1::2] = a_lens, b_lens
    return head + pack_bits(codes, lens)


def decode_values(buf: bytes, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    out[0] = np.frombuffer(buf[:8], dtype=np.uint64)[0]
    if n == 1:
        return out.view(np.float64)
    r = BitReader(buf, 64)
    prev = int(out[0])
    lead = mlen = 0
    for i in range(1, n):
        c = r.read(1)
        if c == 0:
            out[i] = prev
            continue
        if r.read(1):  # '11' new window
            lead = r.read(5)
            mlen = r.read(6) + 1
        # else '10': reuse previous window (paper path; we never emit it)
        meaning = r.read(mlen)
        prev ^= meaning << (64 - lead - mlen)
        out[i] = prev
    return out.view(np.float64)


# ---------------------------------------------------------------------------
# multi-series batch encoders — encode EVERY series of a batch in one
# vectorized pass. Each series' block is byte-aligned (zero padding bits at
# its end), so the per-series slices are byte-identical to the single-series
# encoders' output and decode with the same decoders. This removes the
# per-series numpy-call overhead that dominates on short series.
# ---------------------------------------------------------------------------


def _bswap(x: np.ndarray) -> np.ndarray:
    """uint64 byte swap: pack_bits writes fields MSB-first (big-endian), the
    single-series headers are raw little-endian — swapping makes the packed
    header bytes identical."""
    return x.astype(np.uint64).byteswap()


def _slices(buf: bytes, series_bits: np.ndarray, pad: np.ndarray) -> list[bytes]:
    series_bytes = (series_bits + pad) >> 3
    starts = np.zeros(len(series_bytes) + 1, dtype=np.int64)
    np.cumsum(series_bytes, out=starts[1:])
    return [buf[starts[i]: starts[i + 1]] for i in range(len(series_bytes))]


def encode_values_multi(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Value streams for S series concatenated in ``flat`` (offsets has
    S+1 entries, every series non-empty). Returns S per-series blocks."""
    n = len(flat)
    if n == 0:
        return [b""] * (len(offsets) - 1)
    bits = np.ascontiguousarray(np.asarray(flat, dtype=np.float64)).view(np.uint64)
    s = len(offsets) - 1
    counts = np.diff(offsets)
    sid = np.repeat(np.arange(s), counts)
    is_start = np.zeros(n, dtype=bool)
    is_start[offsets[:-1]] = True

    xor = np.zeros(n, dtype=np.uint64)
    xor[1:] = bits[1:] ^ bits[:-1]
    xor[is_start] = 0
    lead = np.minimum(_clz64(xor), 31)
    trail = _ctz64(xor)
    mlen = 64 - lead - trail
    zero = xor == 0
    a_codes = np.where(
        zero,
        np.uint64(0),
        (np.uint64(0b11) << np.uint64(11))
        | (lead.astype(np.uint64) << np.uint64(6))
        | np.where(zero, 0, mlen - 1).astype(np.uint64),
    )
    a_lens = np.where(zero, 1, 13).astype(np.int64)
    b_codes = np.where(zero, np.uint64(0), xor >> trail.astype(np.uint64))
    b_lens = np.where(zero, 0, mlen).astype(np.int64)
    # series heads: raw 64-bit little-endian value
    a_codes[is_start] = _bswap(bits[is_start])
    a_lens[is_start] = 64
    b_codes[is_start] = 0
    b_lens[is_start] = 0

    el_bits = a_lens + b_lens
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(el_bits, out=cum[1:])
    series_bits = cum[offsets[1:]] - cum[offsets[:-1]]
    pad = (-series_bits) % 8

    f = 2 * n + s
    codes = np.zeros(f, dtype=np.uint64)
    lens = np.zeros(f, dtype=np.int64)
    el = np.arange(n)
    pos_a = 2 * el + sid
    codes[pos_a] = a_codes
    lens[pos_a] = a_lens
    codes[pos_a + 1] = b_codes
    lens[pos_a + 1] = b_lens
    lens[2 * offsets[1:] + np.arange(s)] = pad  # zero-bit padding fields
    buf = pack_bits(codes, lens)
    return _slices(buf, series_bits, pad)


def encode_timestamps_multi(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    n = len(flat)
    if n == 0:
        return [b""] * (len(offsets) - 1)
    ts = np.asarray(flat, dtype=np.int64)
    s = len(offsets) - 1
    counts = np.diff(offsets)
    sid = np.repeat(np.arange(s), counts)
    starts = offsets[:-1]
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    is_second = np.zeros(n, dtype=bool)
    is_second[starts[counts >= 2] + 1] = True

    d = np.zeros(n, dtype=np.int64)
    d[1:] = ts[1:] - ts[:-1]
    dod = np.zeros(n, dtype=np.int64)
    dod[1:] = d[1:] - d[:-1]

    codes = np.zeros(n, dtype=np.uint64)
    lens = np.ones(n, dtype=np.int64)  # default: dod == 0 → single '0' bit
    done = dod == 0
    for (prefix, plen, vbits), bias in zip(_DOD_PREFIXES, _DOD_BIASES):
        m = (~done) & (dod >= -bias) & (dod <= bias + 1)
        codes[m] = (np.uint64(prefix) << np.uint64(vbits)) | (
            (dod[m] + bias).astype(np.uint64)
        )
        lens[m] = plen + vbits
        done |= m
    m = ~done
    codes[m] = (np.uint64(0b1111) << np.uint64(32)) | (
        dod[m].astype(np.int32).view(np.uint32).astype(np.uint64)
    )
    lens[m] = 36
    codes[is_start] = _bswap(ts[is_start].view(np.uint64))
    lens[is_start] = 64
    codes[is_second] = _bswap(d[is_second].view(np.uint64))
    lens[is_second] = 64

    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    series_bits = cum[offsets[1:]] - cum[offsets[:-1]]
    pad = (-series_bits) % 8

    f = n + s
    all_codes = np.zeros(f, dtype=np.uint64)
    all_lens = np.zeros(f, dtype=np.int64)
    pos = np.arange(n) + sid
    all_codes[pos] = codes
    all_lens[pos] = lens
    all_lens[offsets[1:] + np.arange(s)] = pad
    buf = pack_bits(all_codes, all_lens)
    return _slices(buf, series_bits, pad)


# ---------------------------------------------------------------------------
# multi-series lockstep decoders — decode every series of a batch together:
# the loop runs over POINT INDEX while each iteration advances all live
# series one point with vectorized gathers. Lanes are sorted by length
# DESCENDING inside the decoder, so live lanes are always a PREFIX and each
# iteration slices to exactly the active count — total vector work is
# Σ n_points (no padding waste on skewed length distributions), and the
# fused bit reads keep it to ≤2 gathers per iteration. Flat variants return
# one concatenated array (lane-major, original order) so callers never pay
# per-series Python slicing.
# ---------------------------------------------------------------------------


def _gather_bits(buf: np.ndarray, pos: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Read k (≤64) bits starting at absolute bit position pos for each
    lane, MSB-first. k == 0 lanes return 0. buf is uint8 (with ≥9 padding
    bytes at the end — _concat_blocks guarantees it)."""
    byte0 = (pos >> 3).astype(np.int64)
    off = (pos & 7).astype(np.uint64)
    idx = byte0[:, None] + np.arange(8)
    w = np.ascontiguousarray(buf[idx])
    word = w.view(">u8")[:, 0].astype(np.uint64)
    ku = np.asarray(k).astype(np.uint64)
    need = off + ku
    ku_c = np.minimum(ku, np.uint64(63))  # avoid 1<<64 overflow in the dead branch
    mask = np.where(ku >= 64, ~np.uint64(0), (np.uint64(1) << ku_c) - np.uint64(1))
    simple = need <= 64
    shift = np.where(simple, np.uint64(64) - need, 0).astype(np.uint64)
    val = (word >> shift) & mask
    if (~simple).any():
        extra = (need - np.uint64(64)).astype(np.uint64)  # 1..7
        b9 = buf[byte0 + 8].astype(np.uint64)
        keep = np.uint64(64) - off
        lowmask = np.where(off == 0, ~np.uint64(0), (np.uint64(1) << keep) - np.uint64(1))
        val2 = ((word & lowmask) << extra) | (b9 >> (np.uint64(8) - extra))
        val = np.where(simple, val, val2 & mask)
    return np.where(ku > 0, val, np.uint64(0))


def _concat_blocks(blocks: list[bytes]):
    lens = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=len(blocks))
    starts = np.zeros(len(blocks) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    # 9 zero bytes of tail padding: a fused 13/36-bit read issued at the
    # very last bit of the final block may touch up to 9 bytes past it
    buf = np.frombuffer(b"".join(blocks) + b"\0" * 9, dtype=np.uint8)
    return buf, starts[:-1] * 8  # bit offset of each series block


def _lane_layout(n_points: np.ndarray):
    """Sorted-descending lane layout: order (orig→sorted), per-iteration
    active prefix counts, and flat output offsets per sorted lane."""
    order = np.argsort(-n_points, kind="stable")
    np_s = n_points[order]
    max_n = int(np_s[0]) if len(np_s) else 0
    # acts[i] = number of lanes with n_points > i (prefix length at point i)
    acts = np.searchsorted(-np_s, -np.arange(max_n + 1), side="left")
    off_s = np.zeros(len(np_s), dtype=np.int64)
    np.cumsum(np_s[:-1], out=off_s[1:])
    return order, np_s, acts, off_s, max_n


def _flat_to_original(flat_sorted: np.ndarray, n_points: np.ndarray,
                      order: np.ndarray, off_s: np.ndarray) -> np.ndarray:
    """Reorder a lane-major flat array from sorted-lane order to original
    lane order (one vectorized gather)."""
    total = int(n_points.sum())
    if total == 0:
        return flat_sorted[:0]
    sorted_pos = np.empty(len(order), dtype=np.int64)
    sorted_pos[order] = np.arange(len(order))
    starts_orig = off_s[sorted_pos]  # sorted-flat start of each orig lane
    out_off = np.zeros(len(n_points) + 1, dtype=np.int64)
    np.cumsum(n_points, out=out_off[1:])
    intra = np.arange(total) - np.repeat(out_off[:-1], n_points)
    return flat_sorted[np.repeat(starts_orig, n_points) + intra]


def decode_values_multi_flat(blocks: list[bytes], n_points: np.ndarray) -> np.ndarray:
    """Inverse of encode_values_multi for all series at once; returns ONE
    float64 array with every series' points concatenated in input order."""
    s = len(blocks)
    n_points = np.asarray(n_points, dtype=np.int64)
    if s == 0 or n_points.sum() == 0:
        return np.zeros(0, dtype=np.float64)
    buf, bit0 = _concat_blocks(blocks)
    order, np_s, acts, off_s, max_n = _lane_layout(n_points)
    pos = bit0[order].astype(np.int64)
    flat = np.zeros(int(np_s.sum()), dtype=np.uint64)
    a0 = int(acts[0])
    prev = np.zeros(s, dtype=np.uint64)
    prev[:a0] = _bswap(_gather_bits(buf, pos[:a0], np.uint64(64)))
    pos[:a0] += 64
    flat[off_s[:a0]] = prev[:a0]
    lead = np.zeros(s, dtype=np.uint64)
    mlen = np.zeros(s, dtype=np.uint64)
    for i in range(1, max_n):
        a = int(acts[i])
        p = pos[:a]
        # fused read: control(2) + lead(5) + mlen(6) = 13 bits speculative;
        # unneeded low bits are simply not consumed
        g = _gather_bits(buf, p, np.uint64(13))
        c1 = (g >> np.uint64(12)) & np.uint64(1)
        changed = c1.astype(bool)
        neww = changed & (((g >> np.uint64(11)) & np.uint64(1)) == 1)
        lead[:a] = np.where(neww, (g >> np.uint64(6)) & np.uint64(0x1F), lead[:a])
        mlen[:a] = np.where(neww, (g & np.uint64(0x3F)) + np.uint64(1), mlen[:a])
        p += 1 + changed + neww * 11
        ml = np.where(changed, mlen[:a], np.uint64(0))
        meaning = _gather_bits(buf, p, ml)
        p += ml.astype(np.int64)
        sh = np.uint64(64) - lead[:a] - mlen[:a]
        sh = np.where(sh >= np.uint64(64), np.uint64(0), sh)
        prev[:a] = np.where(changed, prev[:a] ^ (meaning << sh), prev[:a])
        flat[off_s[:a] + i] = prev[:a]
    return _flat_to_original(flat, n_points, order, off_s).view(np.float64)


def decode_values_multi(blocks: list[bytes], n_points: np.ndarray) -> list[np.ndarray]:
    """List-of-arrays wrapper over decode_values_multi_flat."""
    n_points = np.asarray(n_points, dtype=np.int64)
    flat = decode_values_multi_flat(blocks, n_points)
    offs = np.zeros(len(n_points) + 1, dtype=np.int64)
    np.cumsum(n_points, out=offs[1:])
    return [flat[offs[j] : offs[j + 1]] for j in range(len(n_points))]


def decode_timestamps_multi_flat(blocks: list[bytes], n_points: np.ndarray) -> np.ndarray:
    """Inverse of encode_timestamps_multi for all series at once; returns
    ONE int64 array, all series concatenated in input order."""
    s = len(blocks)
    n_points = np.asarray(n_points, dtype=np.int64)
    if s == 0 or n_points.sum() == 0:
        return np.zeros(0, dtype=np.int64)
    buf, bit0 = _concat_blocks(blocks)
    order, np_s, acts, off_s, max_n = _lane_layout(n_points)
    pos = bit0[order].astype(np.int64)
    flat = np.zeros(int(np_s.sum()), dtype=np.int64)
    a0 = int(acts[0])
    cur = np.zeros(s, dtype=np.int64)
    cur[:a0] = _bswap(_gather_bits(buf, pos[:a0], np.uint64(64))).view(np.int64)
    pos[:a0] += 64
    flat[off_s[:a0]] = cur[:a0]
    d = np.zeros(s, dtype=np.int64)
    if max_n > 1:
        a1 = int(acts[1])
        d[:a1] = _bswap(_gather_bits(buf, pos[:a1], np.uint64(64))).view(np.int64)
        pos[:a1] += 64
        cur[:a1] += d[:a1]
        flat[off_s[:a1] + 1] = cur[:a1]
    for i in range(2, max_n):
        a = int(acts[i])
        p = pos[:a]
        # fused read of the full delta-of-delta prefix code: worst case
        # '1111' + 32-bit payload = 36 bits speculative
        g = _gather_bits(buf, p, np.uint64(36))
        b0 = ((g >> np.uint64(35)) & np.uint64(1)).astype(bool)
        b1 = ((g >> np.uint64(34)) & np.uint64(1)).astype(bool)
        b2 = ((g >> np.uint64(33)) & np.uint64(1)).astype(bool)
        b3 = ((g >> np.uint64(32)) & np.uint64(1)).astype(bool)
        case1 = b0 & ~b1                # '10'   + 7
        case2 = b0 & b1 & ~b2           # '110'  + 9
        case3 = b0 & b1 & b2 & ~b3      # '1110' + 12
        case4 = b0 & b1 & b2 & b3       # '1111' + 32
        dod = np.zeros(a, dtype=np.int64)
        dod = np.where(case1, ((g >> np.uint64(27)) & np.uint64(0x7F)).view(np.int64) - 63, dod)
        dod = np.where(case2, ((g >> np.uint64(24)) & np.uint64(0x1FF)).view(np.int64) - 255, dod)
        dod = np.where(case3, ((g >> np.uint64(20)) & np.uint64(0xFFF)).view(np.int64) - 2047, dod)
        dod = np.where(
            case4,
            (g & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32).astype(np.int64),
            dod,
        )
        p += (
            1
            + b0 * np.where(case1, 8, np.where(case2, 11, np.where(case3, 15, 35)))
        )
        d[:a] += dod
        cur[:a] += d[:a]
        flat[off_s[:a] + i] = cur[:a]
    return _flat_to_original(flat, n_points, order, off_s)


def decode_timestamps_multi(blocks: list[bytes], n_points: np.ndarray) -> list[np.ndarray]:
    """List-of-arrays wrapper over decode_timestamps_multi_flat."""
    n_points = np.asarray(n_points, dtype=np.int64)
    flat = decode_timestamps_multi_flat(blocks, n_points)
    offs = np.zeros(len(n_points) + 1, dtype=np.int64)
    np.cumsum(n_points, out=offs[1:])
    return [flat[offs[j] : offs[j + 1]] for j in range(len(n_points))]


def decode_flags_multi(blocks: list[bytes], n_points: np.ndarray) -> list[np.ndarray]:
    """All series' 2-bit flag streams unpacked in ONE numpy pass (each
    block is byte-padded, so expanded positions are 4 × byte offsets)."""
    if not blocks:
        return []
    n_points = np.asarray(n_points, dtype=np.int64)
    nbytes = np.fromiter((len(b) for b in blocks), dtype=np.int64, count=len(blocks))
    buf = np.frombuffer(b"".join(blocks), dtype=np.uint8)
    ex = np.empty(len(buf) * 4, dtype=np.uint8)
    ex[0::4] = (buf >> 6) & 3
    ex[1::4] = (buf >> 4) & 3
    ex[2::4] = (buf >> 2) & 3
    ex[3::4] = buf & 3
    starts = np.zeros(len(blocks), dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    starts *= 4
    return [ex[s : s + int(n)] for s, n in zip(starts, n_points)]


# ---------------------------------------------------------------------------
# flags stream: 2 bits per point (bit0 = filled, bit1 = stale), 4 per byte
# ---------------------------------------------------------------------------


def encode_flags_multi(flat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Per-series flag blocks in one vectorized pass: 2-bit fields, padded
    to a byte boundary at each series end (byte-identical to per-series
    encode_flags)."""
    n = len(flat)
    s = len(offsets) - 1
    if n == 0:
        return [b""] * s
    counts = np.diff(offsets)
    f = s + n
    codes = np.zeros(f, dtype=np.uint64)
    lens = np.zeros(f, dtype=np.int64)
    sid = np.repeat(np.arange(s), counts)
    pos = np.arange(n) + sid
    codes[pos] = (np.asarray(flat, dtype=np.uint64)) & np.uint64(3)
    lens[pos] = 2
    series_bits = counts * 2
    pad = (-series_bits) % 8
    lens[offsets[1:] + np.arange(s)] = pad
    buf = pack_bits(codes, lens)
    return _slices(buf, series_bits, pad)


def encode_flags(flags: np.ndarray) -> bytes:
    f = (np.asarray(flags, dtype=np.uint8) & 3).astype(np.uint8)
    pad = (-len(f)) % 4
    if pad:
        f = np.concatenate([f, np.zeros(pad, dtype=np.uint8)])
    f = f.reshape(-1, 4)
    byte = (f[:, 0] << 6) | (f[:, 1] << 4) | (f[:, 2] << 2) | f[:, 3]
    return byte.astype(np.uint8).tobytes()


def decode_flags(buf: bytes, n: int) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(len(b) * 4, dtype=np.uint8)
    out[0::4] = (b >> 6) & 3
    out[1::4] = (b >> 4) & 3
    out[2::4] = (b >> 2) & 3
    out[3::4] = b & 3
    return out[:n]
