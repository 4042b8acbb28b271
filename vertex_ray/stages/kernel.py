"""Integer-coded numpy bucket kernel — the hot path of the flagship
pipeline.

The first implementation (stages/rollup + stages/fill, kept for tests and
as the readable spec) derives per-point series-key STRINGS and aggregates
with pandas groupby over object columns. Under 32-way parallelism that is
memory-bandwidth-bound (~94µs/turn measured). This kernel computes the
identical result (bit-for-bit, property-tested against the pandas path)
entirely on int64/float64 numpy arrays:

- conversations are identified by a 64-bit content hash computed at the
  project stage (string equality re-checked at group boundaries, so hash
  collisions cannot corrupt grouping);
- a series is a packed int64 uid ``metric<<40 | conv_ord<<8 | sub_code``;
  the canonical sorted-tag series_key string is rendered once per unique
  series at pack time, never per point;
- grouping is stable lexsort + ``ufunc.reduceat`` segments; histogram
  buckets come from one searchsorted + bincount per tier;
- the continuous-aggregate cascade and gap-fill walk reuse the same
  segment machinery with no further sorting beyond one int lexsort each.

All sums stay exact (counter increments of 1.0, integer-second latencies),
so reduction order cannot change a single bit — the property that makes
the whole engine reproducible across parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vertex_ray.schema import (
    DEFAULT_BUCKETS_ARR,
    KIND_GAUGE,
    KIND_HISTOGRAM,
    KIND_SUM,
    N_BUCKETS,
    ROLES,
    STALE_NAN_BITS,
    STALENESS_SECONDS,
    TOOLS,
    US_PER_SECOND,
)

METRIC_NAMES = (
    "turns_total",
    "tool_invocations_total",
    "inter_turn_latency_seconds",
    "conv_turn_idx",
)
METRIC_KINDS = (KIND_SUM, KIND_SUM, KIND_HISTOGRAM, KIND_GAUGE)

_UID_METRIC_SHIFT = np.int64(40)
_UID_CONV_SHIFT = np.int64(8)

# the (single) histogram metric's index in METRIC_NAMES/METRIC_KINDS —
# the sparse bucket representation relies on its uid range being one
# contiguous block in (uid, window)-sorted arrays
HIST_METRIC = np.int64(METRIC_KINDS.index(KIND_HISTOGRAM))


def _hist_range(uid_sorted: np.ndarray) -> tuple[int, int]:
    """[lo, hi) row range of the histogram metric in uid-sorted arrays."""
    lo = int(np.searchsorted(uid_sorted, HIST_METRIC << _UID_METRIC_SHIFT))
    hi = int(np.searchsorted(uid_sorted,
                             (HIST_METRIC + 1) << _UID_METRIC_SHIFT))
    return lo, hi


class AggArrays(dict):
    """dict of parallel arrays: uid, window, sum, count, min, max, last,
    last_ts — plus ``buckets``, a SPARSE histogram matrix: row k of
    ``buckets`` belongs to the k-th agg row whose metric is the histogram
    metric (``uid >> 40 == HIST_METRIC``), in array order. Non-histogram
    rows carry no bucket storage at all — they were 30 always-zero float
    lanes flowing through every concat/sort/merge/fill/pack pass (~85% of
    rows), the single largest useless memory stream of the flagship
    kernel. When the arrays are (uid, window)-sorted the histogram rows
    are contiguous (metric is the uid's top bits), so segment ops reduce
    the matrix with rebased offsets."""


def _segments(*keys: np.ndarray):
    """Boundary starts for consecutive equal tuples in pre-sorted arrays."""
    n = len(keys[0])
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.flatnonzero(change)


def _empty_agg() -> AggArrays:
    return AggArrays(
        uid=np.zeros(0, np.int64),
        window=np.zeros(0, np.int64),
        sum=np.zeros(0),
        count=np.zeros(0, np.int64),
        min=np.zeros(0),
        max=np.zeros(0),
        last=np.zeros(0),
        last_ts=np.zeros(0, np.int64),
        buckets=np.zeros((0, N_BUCKETS), np.int64),
    )


def _reduce(uid, w, ts_us, vals, starts, hist: bool) -> AggArrays:
    n = len(uid)
    if n == 0:
        return _empty_agg()
    ends = np.concatenate([starts[1:], [n]])
    out = AggArrays()
    out["uid"] = uid[starts]
    out["window"] = w[starts]
    out["count"] = (ends - starts).astype(np.int64)
    out["sum"] = np.add.reduceat(vals, starts) if n else np.zeros(0)
    out["min"] = np.minimum.reduceat(vals, starts) if n else np.zeros(0)
    out["max"] = np.maximum.reduceat(vals, starts) if n else np.zeros(0)
    out["last"] = vals[ends - 1]
    out["last_ts"] = ts_us[ends - 1]
    g = len(starts)
    if hist and n:
        cat = np.searchsorted(DEFAULT_BUCKETS_ARR, vals, side="left")
        seg = np.repeat(np.arange(g), out["count"])
        bc = np.bincount(
            seg * (N_BUCKETS + 1) + np.minimum(cat, N_BUCKETS),
            minlength=g * (N_BUCKETS + 1),
        ).reshape(g, N_BUCKETS + 1)
        out["buckets"] = np.cumsum(bc, axis=1)[:, :N_BUCKETS].astype(np.int64)
    else:
        # sparse representation: non-histogram rows carry NO bucket rows
        out["buckets"] = np.zeros((0, N_BUCKETS), dtype=np.int64)
    return out


def window_agg(uid, ts_us, vals, window_seconds: int, hist: bool) -> AggArrays:
    """Aggregate observations into (uid, window) rows. ``ts_us`` is part
    of the (stable) sort key so ``last`` is last-BY-TIMESTAMP even when
    input arrival order is not time order (the FIXTURES §F4 contract and
    what the pandas spec path does); equal timestamps tie-break by input
    order on both paths."""
    w = ts_us // US_PER_SECOND // window_seconds * window_seconds
    order = np.lexsort((ts_us, w, uid))
    uid, w, ts_us, vals = uid[order], w[order], ts_us[order], vals[order]
    return _reduce(uid, w, ts_us, vals, _segments(uid, w), hist)


def concat_agg(parts: list[AggArrays]) -> AggArrays:
    out = AggArrays()
    for k in ("uid", "window", "sum", "count", "min", "max", "last", "last_ts"):
        out[k] = np.concatenate([p[k] for p in parts])
    out["buckets"] = np.concatenate([p["buckets"] for p in parts], axis=0)
    return out


def sort_agg(agg: AggArrays) -> AggArrays:
    order = np.lexsort((agg["window"], agg["uid"]))
    out = AggArrays({k: v[order] for k, v in agg.items() if k != "buckets"})
    if agg["buckets"].shape[0] == 0:
        out["buckets"] = agg["buckets"]
    else:
        # permute the sparse matrix: k-th hist row of the output gathers
        # the matrix row of its source position
        is_hist = (agg["uid"] >> _UID_METRIC_SHIFT) == HIST_METRIC
        hist_ord = np.cumsum(is_hist) - 1  # source row -> matrix row
        src = order[is_hist[order]]
        out["buckets"] = agg["buckets"][hist_ord[src]]
    return out


def merge_agg_arrays(agg: AggArrays, window_seconds: int, presorted=True) -> AggArrays:
    """Tier-merge partials into (coarser) windows — FIXTURES §F4 contract.
    Input sorted by (uid, window) ⇒ coarse groups are contiguous and
    last_ts is non-decreasing within a uid, so ``last`` is the segment's
    final element."""
    if not presorted:
        agg = sort_agg(agg)
    uid = agg["uid"]
    n = len(uid)
    if n == 0:
        return _empty_agg()
    cw = agg["window"] // window_seconds * window_seconds
    starts = _segments(uid, cw)
    ends = np.concatenate([starts[1:], [n]])
    out = AggArrays()
    out["uid"] = uid[starts]
    out["window"] = cw[starts]
    out["sum"] = np.add.reduceat(agg["sum"], starts) if n else np.zeros(0)
    out["count"] = np.add.reduceat(agg["count"], starts) if n else np.zeros(0, np.int64)
    out["min"] = np.minimum.reduceat(agg["min"], starts) if n else np.zeros(0)
    out["max"] = np.maximum.reduceat(agg["max"], starts) if n else np.zeros(0)
    out["last"] = agg["last"][ends - 1]
    out["last_ts"] = agg["last_ts"][ends - 1]
    lo, hi = _hist_range(uid)
    if hi > lo and agg["buckets"].shape[0]:
        # coarse groups never straddle the metric boundary (metric is the
        # uid's top bits), so segment starts inside [lo, hi) rebase 1:1
        # onto the sparse matrix
        starts_h = starts[(starts >= lo) & (starts < hi)] - lo
        out["buckets"] = np.add.reduceat(agg["buckets"], starts_h, axis=0)
    else:
        out["buckets"] = np.zeros((0, N_BUCKETS), dtype=np.int64)
    return out


def fill_arrays(
    agg: AggArrays,
    window_seconds: int,
    global_end_window: int,
    horizon_seconds: int = STALENESS_SECONDS,
) -> dict:
    """Gap-fill + LOCF + stale markers (semantics of stages/fill, §F5),
    array-form. Returns agg-like dict + 'filled'/'stale' bool arrays,
    sorted by (uid, window); ``buckets`` stays in the sparse hist-slice
    representation (rows = the histogram metric's output rows)."""
    uid, w = agg["uid"], agg["window"]
    n = len(uid)
    metric = uid >> _UID_METRIC_SHIFT
    kind_hist = metric == HIST_METRIC
    kind_gauge = metric == 3
    same_next = np.zeros(n, dtype=bool)
    same_next[:-1] = uid[:-1] == uid[1:]
    next_w = np.empty(n, dtype=np.int64)
    if n:
        next_w[:-1] = w[1:]
    limit = np.where(same_next, next_w, np.int64(global_end_window + window_seconds))

    hw = horizon_seconds // window_seconds
    gap_windows = (limit - w) // window_seconds - 1
    n_fill = np.clip(gap_windows, 0, hw)
    stale_w = w + (hw + 1) * window_seconds
    stale_mask = stale_w < limit

    total = int(n_fill.sum())
    s = int(stale_mask.sum())
    # The input is (uid, window)-sorted and every synthesized row (the
    # fills, then the optional stale marker) belongs immediately AFTER its
    # source row — so each row's OUTPUT position is computable directly
    # and the result is born sorted: three scatters instead of
    # concatenate + global lexsort + per-column gathers.
    n_out = n + total + s
    extra = n_fill + stale_mask
    off = np.zeros(n, dtype=np.int64)
    if n > 1:
        off[1:] = np.cumsum(extra[:-1])
    dst0 = np.arange(n) + off  # output position of each original row

    out_uid = np.empty(n_out, dtype=np.int64)
    out_w = np.empty(n_out, dtype=np.int64)
    sums = np.empty(n_out, dtype=np.float64)
    cnts = np.empty(n_out, dtype=np.int64)
    mins = np.empty(n_out, dtype=np.float64)
    maxs = np.empty(n_out, dtype=np.float64)
    lasts = np.empty(n_out, dtype=np.float64)
    last_ts = np.empty(n_out, dtype=np.int64)
    filled = np.zeros(n_out, dtype=bool)
    stale = np.zeros(n_out, dtype=bool)

    # sparse bucket matrix covers only the histogram metric's OUTPUT rows
    # (real + fills + stales of hist series — contiguous in the sorted
    # output); stale rows stay zero, matching the dense semantics
    lo, hi = _hist_range(uid)
    if hi > lo:
        out_lo = int(dst0[lo])
        out_hi = int(dst0[hi]) if hi < n else n_out
        bk = np.zeros((out_hi - out_lo, N_BUCKETS), dtype=np.int64)
        bk[dst0[lo:hi] - out_lo] = agg["buckets"]
    else:
        out_lo = 0
        bk = np.zeros((0, N_BUCKETS), dtype=np.int64)

    out_uid[dst0] = uid
    out_w[dst0] = w
    sums[dst0] = agg["sum"]
    cnts[dst0] = agg["count"]
    mins[dst0] = agg["min"]
    maxs[dst0] = agg["max"]
    lasts[dst0] = agg["last"]
    last_ts[dst0] = agg["last_ts"]

    if total:
        idx = np.repeat(np.arange(n), n_fill)
        pos = np.arange(total) - np.repeat(np.cumsum(n_fill) - n_fill, n_fill) + 1
        dstf = dst0[idx] + pos
        is_hist = kind_hist[idx]
        is_gauge = kind_gauge[idx]
        is_ctr = ~(is_hist | is_gauge)  # counters fill as zero-increment
        last = agg["last"][idx]
        out_uid[dstf] = uid[idx]
        out_w[dstf] = w[idx] + pos * window_seconds
        # gauges LOCF the last-observed value into sum/min/max/last
        # (stages/fill gauge contract); histograms carry the cumulative row
        sums[dstf] = np.where(is_ctr, 0.0, np.where(is_gauge, last, agg["sum"][idx]))
        cnts[dstf] = np.where(is_hist, agg["count"][idx], 0)
        mins[dstf] = np.where(is_ctr, np.nan, np.where(is_gauge, last, agg["min"][idx]))
        maxs[dstf] = np.where(is_ctr, np.nan, np.where(is_gauge, last, agg["max"][idx]))
        lasts[dstf] = np.where(is_ctr, 0.0, last)
        last_ts[dstf] = agg["last_ts"][idx]
        # bucket vectors only exist on histogram rows; non-hist stay zero
        hsel = np.flatnonzero(is_hist)
        if len(hsel):
            bk[dstf[hsel] - out_lo] = agg["buckets"][idx[hsel] - lo]
        filled[dstf] = True
    if s:
        src = np.flatnonzero(stale_mask)
        dsts = dst0[src] + n_fill[src] + 1
        out_uid[dsts] = uid[src]
        out_w[dsts] = stale_w[src]
        sums[dsts] = np.nan
        cnts[dsts] = 0
        mins[dsts] = np.nan
        maxs[dsts] = np.nan
        lasts[dsts] = np.nan
        last_ts[dsts] = agg["last_ts"][src]
        stale[dsts] = True

    return {
        "uid": out_uid,
        "window": out_w,
        "sum": sums,
        "count": cnts,
        "min": mins,
        "max": maxs,
        "last": lasts,
        "last_ts": last_ts,
        "buckets": bk,
        "filled": filled,
        "stale": stale,
    }


def runs_encodable(window_seconds: int,
                   horizon_seconds: int = STALENESS_SECONDS) -> bool:
    """Whether a tier's staleness horizon fits the 15-bit run-code range
    (RUN_FILL_MASK fill windows). When False, bucket_kernel falls back
    to the materialized fill_arrays/pack_arrays layout for the whole
    call instead of aborting — the dense path has no such limit."""
    from vertex_ray.stages.fill import RUN_FILL_MASK

    return horizon_seconds // window_seconds <= int(RUN_FILL_MASK)


def fill_runs(
    agg: AggArrays,
    window_seconds: int,
    global_end_window: int,
    horizon_seconds: int = STALENESS_SECONDS,
) -> np.ndarray:
    """VIRTUAL gap-fill: the run-length form of :func:`fill_arrays`.

    Returns one uint16 code per (real) agg row — ``n_fill | stale << 15``
    — describing the LOCF fill windows and optional stale marker that
    follow it, WITHOUT materializing them. Every synthesized row of the
    dense path is a pure function of (kind, source row, position), so the
    code is a complete description: stages/fill.expand_runs_* rebuilds the
    dense layout bit-for-bit. Fills were 58.5% of all agg points at sf0.1
    — this keeps them out of the fill/pack/encode memory streams entirely
    (the single-box DRAM-bandwidth limiter of the 8→32 scaling pair).

    Precondition: ``agg`` sorted by (uid, window), same as fill_arrays.
    """
    from vertex_ray.stages.fill import RUN_FILL_MASK, RUN_STALE_SHIFT

    uid, w = agg["uid"], agg["window"]
    n = len(uid)
    hw = horizon_seconds // window_seconds
    if hw > int(RUN_FILL_MASK):
        # bucket_kernel routes such configs to the dense path
        # (runs_encodable); reaching here directly is a caller bug
        raise ValueError(
            f"fill_runs: horizon {horizon_seconds}s / window "
            f"{window_seconds}s = {hw} fill windows exceeds the uint16 "
            "run-code range"
        )
    same_next = np.zeros(n, dtype=bool)
    same_next[:-1] = uid[:-1] == uid[1:]
    next_w = np.empty(n, dtype=np.int64)
    if n:
        next_w[:-1] = w[1:]
    limit = np.where(same_next, next_w, np.int64(global_end_window + window_seconds))
    gap_windows = (limit - w) // window_seconds - 1
    n_fill = np.clip(gap_windows, 0, hw).astype(np.uint16)
    stale = (w + (hw + 1) * window_seconds) < limit
    return n_fill | (stale.astype(np.uint16) << RUN_STALE_SHIFT)


def pack_arrays_virtual(
    agg: AggArrays,
    run_codes: np.ndarray,
    conv_strs: np.ndarray,
    bucket_id: int,
    window_seconds: int,
) -> pa.Table:
    """pack_arrays over REAL rows only, with the virtual-fill run codes as
    a ``runs`` list column and the tier's window size as a per-series
    ``window_seconds`` column (the expansion's self-contained geometry).
    No stale stamping (stale markers are virtual here) and no flags column
    (real rows always carry flag 0) — the presence of ``runs`` marks the
    layout for unpack_series / GorillaEncode."""
    uid = agg["uid"]
    starts = _segments(uid)
    offsets = np.concatenate([starts, [len(uid)]]).astype(np.int32)
    keys, names, kinds = render_series_keys(uid[starts], conv_strs)

    def lst(values, typ):
        return pa.ListArray.from_arrays(offsets, pa.array(values, type=typ))

    out = {
        "bucket": pa.array(np.full(len(starts), bucket_id, dtype=np.int32)),
        "series_key": pa.array(keys, type=pa.string()),
        "name": pa.array(names, type=pa.string()),
        "kind": pa.array(kinds, type=pa.uint8()),
        "window_starts": lst(agg["window"], pa.int64()),
        "vals_sum": lst(np.ascontiguousarray(agg["sum"], dtype=np.float64),
                        pa.float64()),
        "vals_count": lst(agg["count"].astype(np.float64), pa.float64()),
        "vals_min": lst(np.ascontiguousarray(agg["min"], dtype=np.float64),
                        pa.float64()),
        "vals_max": lst(np.ascontiguousarray(agg["max"], dtype=np.float64),
                        pa.float64()),
        "vals_last": lst(np.ascontiguousarray(agg["last"], dtype=np.float64),
                         pa.float64()),
    }
    b = agg["buckets"]
    counts_series = np.diff(offsets).astype(np.int64)
    hist_series = (uid[starts] >> _UID_METRIC_SHIFT) == HIST_METRIC \
        if len(starts) else np.zeros(0, dtype=bool)
    counts_b = np.where(hist_series, counts_series, 0).astype(np.int32)
    offs_b = np.zeros(len(counts_b) + 1, dtype=np.int32)
    np.cumsum(counts_b, out=offs_b[1:])
    for j in range(N_BUCKETS):
        out[f"vals_b{j:02d}"] = pa.ListArray.from_arrays(
            offs_b, pa.array(b[:, j].astype(np.float64), type=pa.float64()))
    out["runs"] = lst(np.asarray(run_codes, dtype=np.uint16), pa.uint16())
    out["window_seconds"] = pa.array(
        np.full(len(starts), window_seconds, dtype=np.int32))
    return pa.table(out)


# ---------------------------------------------------------------------------
# series key rendering (once per unique series)
# ---------------------------------------------------------------------------


def render_series_keys(uids: np.ndarray, conv_strs: np.ndarray):
    metric = (uids >> _UID_METRIC_SHIFT).astype(np.int64)
    conv_ord = ((uids >> _UID_CONV_SHIFT) & np.int64((1 << 32) - 1)).astype(np.int64)
    sub = (uids & np.int64(0xFF)).astype(np.int64)
    keys = np.empty(len(uids), dtype=object)
    names = np.empty(len(uids), dtype=object)
    kinds = np.empty(len(uids), dtype=np.uint8)
    for i in range(len(uids)):
        m, c, sc = metric[i], conv_strs[conv_ord[i]], sub[i]
        names[i] = METRIC_NAMES[m]
        kinds[i] = METRIC_KINDS[m]
        if m == 0:
            keys[i] = f"turns_total{{conv_id={c},role={ROLES[sc]}}}"
        elif m == 1:
            keys[i] = f"tool_invocations_total{{conv_id={c},tool={TOOLS[sc - 1]}}}"
        elif m == 2:
            keys[i] = f"inter_turn_latency_seconds{{conv_id={c}}}"
        else:
            keys[i] = f"conv_turn_idx{{conv_id={c}}}"
    return keys, names, kinds


def pack_arrays(filled: dict, conv_strs: np.ndarray, bucket_id: int) -> pa.Table:
    """Filled arrays (sorted by uid, window) → per-series list-column rows
    (same Arrow schema as stages/fill.pack_series, but the ``vals_b*``
    bucket streams are SPARSE: non-histogram series get empty lists —
    the encoder only reads bucket streams for histogram series anyway,
    and unpack_series rebuilds dense zero columns on the way out)."""
    uid = filled["uid"]
    starts = _segments(uid)
    offsets = np.concatenate([starts, [len(uid)]]).astype(np.int32)
    keys, names, kinds = render_series_keys(uid[starts], conv_strs)

    stale = filled["stale"]
    flags = filled["filled"].astype(np.uint8) | (stale.astype(np.uint8) << 1)

    def stamp(vals):
        out = np.ascontiguousarray(vals, dtype=np.float64).copy()
        out.view(np.uint64)[stale] = STALE_NAN_BITS
        return out

    def lst(values, typ):
        return pa.ListArray.from_arrays(offsets, pa.array(values, type=typ))

    out = {
        "bucket": pa.array(np.full(len(starts), bucket_id, dtype=np.int32)),
        "series_key": pa.array(keys, type=pa.string()),
        "name": pa.array(names, type=pa.string()),
        "kind": pa.array(kinds, type=pa.uint8()),
        "window_starts": lst(filled["window"], pa.int64()),
        "vals_sum": lst(stamp(filled["sum"]), pa.float64()),
        "vals_count": lst(filled["count"].astype(np.float64), pa.float64()),
        "vals_min": lst(stamp(filled["min"]), pa.float64()),
        "vals_max": lst(stamp(filled["max"]), pa.float64()),
        "vals_last": lst(stamp(filled["last"]), pa.float64()),
    }
    # sparse bucket streams: histogram series carry their full window
    # sequence, every other series an empty list (zero offsets)
    b = filled["buckets"]
    counts_series = np.diff(offsets).astype(np.int64)
    hist_series = (uid[starts] >> _UID_METRIC_SHIFT) == HIST_METRIC \
        if len(starts) else np.zeros(0, dtype=bool)
    counts_b = np.where(hist_series, counts_series, 0).astype(np.int32)
    offs_b = np.zeros(len(counts_b) + 1, dtype=np.int32)
    np.cumsum(counts_b, out=offs_b[1:])
    for j in range(N_BUCKETS):
        out[f"vals_b{j:02d}"] = pa.ListArray.from_arrays(
            offs_b, pa.array(b[:, j].astype(np.float64), type=pa.float64()))
    out["flags"] = lst(flags, pa.uint8())
    return pa.table(out)


# ---------------------------------------------------------------------------
# the full per-bucket kernel
# ---------------------------------------------------------------------------


def bucket_kernel(
    conv_id: np.ndarray,
    conv_hash: np.ndarray,
    turn_idx: np.ndarray,
    role_code: np.ndarray,
    tool_code: np.ndarray,
    ts_us: np.ndarray,
    tiers,
    global_end_s: int,
    bucket_id: int,
    salt: int = 1,
    horizon_seconds: int = STALENESS_SECONDS,
) -> pa.Table:
    n = len(conv_id)
    if n == 0:
        # layout must match the non-empty groups of the same Dataset:
        # pick virtual vs dense by the same predicate as the tier loop
        if all(runs_encodable(seconds, horizon_seconds)
               for _, seconds in tiers):
            empty = pack_arrays_virtual(
                _empty_agg(),
                np.zeros(0, dtype=np.uint16),
                np.zeros(0, dtype=object),
                bucket_id,
                tiers[0][1],
            )
        else:
            empty = pack_arrays(
                fill_arrays(_empty_agg(), tiers[0][1], 0, horizon_seconds),
                np.zeros(0, dtype=object),
                bucket_id,
            )
        return empty.append_column("tier", pa.array([], type=pa.string()))
    order = np.lexsort((turn_idx, conv_hash))
    conv_id = conv_id[order]
    conv_hash = conv_hash[order]
    turn_idx = turn_idx[order]
    role_code = role_code[order].astype(np.int64)
    tool_code = tool_code[order].astype(np.int64)
    ts_us = ts_us[order]

    # conversation ordinals; hash equality refined by string equality so a
    # 64-bit collision can never merge two conversations
    new_conv = np.ones(n, dtype=bool)
    new_conv[1:] = conv_hash[1:] != conv_hash[:-1]
    suspect = ~new_conv[1:]
    if suspect.any():
        eq = conv_id[1:] == conv_id[:-1]
        new_conv[1:] |= ~eq
    conv_ord = np.cumsum(new_conv) - 1
    conv_strs = conv_id[new_conv]

    base = np.int64(1) << _UID_METRIC_SHIFT
    conv_part = conv_ord.astype(np.int64) << _UID_CONV_SHIFT

    def agg_of(uid, ts, vals, hist):
        if salt <= 1:
            return window_agg(uid, ts, vals, tiers[0][1], hist)
        sgroup = (ts // US_PER_SECOND) % salt
        parts = [
            window_agg(uid[sgroup == i], ts[sgroup == i], vals[sgroup == i],
                       tiers[0][1], hist)
            for i in range(salt)
            if int((sgroup == i).sum())
        ]
        return merge_agg_arrays(sort_agg(concat_agg(parts)), tiers[0][1])

    # turns_total (metric 0): one 1.0 observation per turn, sub = role
    uid_turns = base * 0 + conv_part + role_code
    a_turns = agg_of(uid_turns, ts_us, np.ones(n), False)

    # tool_invocations_total (metric 1): tool turns only, sub = tool code
    tmask = tool_code > 0
    uid_tools = base * 1 + conv_part[tmask] + tool_code[tmask]
    a_tools = agg_of(uid_tools, ts_us[tmask], np.ones(int(tmask.sum())), False)

    # inter_turn_latency_seconds (metric 2): gap to previous turn of conv
    lmask = np.zeros(n, dtype=bool)
    lmask[1:] = ~new_conv[1:]
    prev_ts = np.empty(n, dtype=np.int64)
    prev_ts[1:] = ts_us[:-1]
    prev_ts[0] = 0
    lat = (ts_us - prev_ts).astype(np.float64) / 1e6
    uid_lat = base * 2 + conv_part[lmask]
    a_lat = agg_of(uid_lat, ts_us[lmask], lat[lmask], True)

    # conv_turn_idx (metric 3): GAUGE — last-written turn index per conv;
    # integer values stay exact doubles (the order-independence invariant)
    uid_gauge = base * 3 + conv_part
    a_gauge = agg_of(uid_gauge, ts_us, np.asarray(turn_idx, dtype=np.float64), False)

    agg = sort_agg(concat_agg([a_turns, a_tools, a_lat, a_gauge]))

    parts = []
    prev = agg
    base_seconds = tiers[0][1]
    # a tier whose staleness horizon spans more fill windows than the
    # 15-bit run code can hold (fine windows + a long horizon) cannot be
    # virtual-fill encoded; ALL tiers of the call then take the dense
    # fill_arrays/pack_arrays path (one layout per output table — the
    # store reads mixed v2/v3 files fine, but a single concat can't mix)
    virtual = all(runs_encodable(seconds, horizon_seconds)
                  for _, seconds in tiers)
    for tier, seconds in tiers:
        if seconds != base_seconds:
            prev = merge_agg_arrays(prev, seconds)
        end_w = global_end_s // seconds * seconds
        if virtual:
            codes = fill_runs(prev, seconds, end_w, horizon_seconds)
            packed = pack_arrays_virtual(prev, codes, conv_strs, bucket_id,
                                         seconds)
        else:
            packed = pack_arrays(
                fill_arrays(prev, seconds, end_w, horizon_seconds),
                conv_strs, bucket_id)
        parts.append(
            packed.append_column(
                "tier", pa.array([tier] * packed.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)
