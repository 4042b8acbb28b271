"""As-of and range (interval) joins — operators the reference does not have
(SURVEY §2.6: vertex is a router, not a query engine) but a large-scale
training-data / telemetry pipeline needs; closest reference analogue is the
geoip lookup join (`src/transforms/geoip.rs:85-91`), which broadcasts a
static small side.  These two join a BIG right side, so instead of a
broadcast they hash-co-partition both sides on the equi-key:

    left  --map_batches(add bucket = hash(key) % n_buckets)--\
                                                              union
    right --map_batches(add bucket, tag side)----------------/
      -> groupby("__bucket").map_groups(vectorized kernel)

ONE all-to-all exchange total (both sides move once), then each bucket is
joined by a loop-free numpy kernel: rank-compress (key, ts) into a single
int64 composite, `np.searchsorted` the left probes against the sorted right
composites.  No per-key Python loop, no driver materialization.

Partitioning assumption (documented per the build contract): a bucket holds
every row of BOTH sides for its keys, so per-task memory is
~(|L|+|R|)/n_buckets.  Keys are hash-distributed; a single pathological key
cannot be salted (both sides must co-locate), so one key's rows must fit in
a worker — the same bound every hash join has.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["asof_join", "range_join"]


def _tag_side(cols_keep, key_col, ts_col, side, all_cols, n_buckets):
    """map_batches fn: project to the union schema (missing cols -> null),
    add __bucket / __side / normalized __key / __ts columns."""

    def fn(t: pa.Table) -> pa.Table:
        n = len(t)
        key = t[key_col].to_numpy(zero_copy_only=False)
        ts = t[ts_col].cast(pa.int64()).to_numpy()  # us since epoch
        bucket = (pd.util.hash_array(np.ascontiguousarray(key))
                  % np.uint64(n_buckets)).astype(np.int64)
        out = {
            "__bucket": pa.array(bucket),
            "__side": pa.array(np.full(n, side, dtype=np.int8)),
            "__key": pa.array(key),
            "__ts": pa.array(ts),
        }
        for c in all_cols:
            out[c] = t[c] if c in cols_keep else pa.nulls(n, type=all_cols[c])
        return pa.table(out)

    return fn


def _union_tagged(left, right, left_key, right_key, left_ts, right_ts,
                  left_cols, right_cols, n_buckets):
    """Project both sides to one tagged schema and union them."""
    l_schema = left.schema()
    r_schema = right.schema()
    all_cols: dict[str, pa.DataType] = {}
    for c in left_cols:
        all_cols[c] = l_schema.base_schema.field(c).type
    for c in right_cols:
        all_cols[c] = r_schema.base_schema.field(c).type

    lt = left.map_batches(
        _tag_side(set(left_cols), left_key, left_ts, 1, all_cols, n_buckets),
        batch_format="pyarrow",
    )
    rt = right.map_batches(
        _tag_side(set(right_cols), right_key, right_ts, 0, all_cols, n_buckets),
        batch_format="pyarrow",
    )
    return lt.union(rt), all_cols


def _ranks(*arrays):
    """Dense int64 ranks of the concatenation's values, per input array."""
    allv = np.concatenate(arrays)
    uniq, inv = np.unique(allv, return_inverse=True)
    out, off = [], 0
    for a in arrays:
        out.append(inv[off:off + len(a)].astype(np.int64))
        off += len(a)
    return out, len(uniq)


def asof_join(left, right, *, key, ts, right_cols, left_cols,
              right_tiebreak: str, n_buckets: int = 64):
    """For every left row, attach the right row with the greatest right ts
    <= the left row's ts for the same key (inner: unmatched left rows are
    dropped) — DuckDB ``ASOF JOIN .. ON l.key = r.key AND l.ts >= r.ts``
    semantics.  Right rows that tie on (key, ts) are resolved
    deterministically: the row with the greatest ``right_tiebreak`` value
    wins (mirror with ``arg_max`` / a dedup CTE in oracle SQL).

    key/ts are (left_name, right_name) pairs; left_cols / right_cols are the
    payload columns to carry from each side.
    """
    (lk, rk), (lts, rts) = key, ts
    if right_tiebreak not in right_cols:
        right_cols = list(right_cols) + [right_tiebreak]
    tagged, all_cols = _union_tagged(
        left, right, lk, rk, lts, rts, left_cols, right_cols, n_buckets)

    out_cols = [*left_cols, *right_cols]

    def kernel(g: pa.Table) -> pa.Table:
        side = np.concatenate([c.to_numpy() for c in g["__side"].chunks]) \
            if g["__side"].num_chunks > 1 else g["__side"].chunk(0).to_numpy()
        L = g.filter(pa.array(side == 1))
        R = g.filter(pa.array(side == 0))
        if not len(L) or not len(R):
            return pa.table({c: pa.array([], type=all_cols[c]) for c in out_cols})
        (l_kr, r_kr), nk = _ranks(L["__key"].to_numpy(), R["__key"].to_numpy())
        (l_tr, r_tr), nt = _ranks(L["__ts"].to_numpy(), R["__ts"].to_numpy())
        # dedup right per (key, ts): keep max tiebreak
        order = np.lexsort((
            R[right_tiebreak].to_numpy(zero_copy_only=False), r_tr, r_kr))
        r_kr, r_tr = r_kr[order], r_tr[order]
        comp_r = r_kr * np.int64(nt) + r_tr
        keep = np.ones(len(comp_r), dtype=bool)
        keep[:-1] = comp_r[:-1] != comp_r[1:]  # last (max tiebreak) per comp
        order, comp_r, r_kr = order[keep], comp_r[keep], r_kr[keep]
        comp_l = l_kr * np.int64(nt) + l_tr
        pos = np.searchsorted(comp_r, comp_l, side="right") - 1
        valid = (pos >= 0) & (r_kr[np.maximum(pos, 0)] == l_kr)
        li = np.flatnonzero(valid)
        ri = order[pos[valid]]
        out = {c: pc.take(L[c], pa.array(li)) for c in left_cols}
        for c in right_cols:
            out[c] = pc.take(R[c], pa.array(ri))
        return pa.table(out)

    return (
        tagged.groupby("__bucket")
        .map_groups(kernel, batch_format="pyarrow")
    )


def range_join(left, right, *, key, ts, right_cols, left_cols,
               window_us: int, n_buckets: int = 64):
    """Interval join: emit (left row, right row) for every pair with equal
    key and ``right.ts <= left.ts < right.ts + window_us`` — i.e. the right
    rows open a ``window_us``-long window and left rows landing inside it
    match (possibly many per left row).  SQL mirror:

        SELECT .. FROM left l JOIN right r
          ON l.key = r.key AND l.ts >= r.ts AND l.ts < r.ts + window

    Same co-partitioned single-exchange plan as :func:`asof_join`; the
    kernel turns each probe into a [lo, hi) slice of the right side with two
    vectorized searchsorteds, then expands with np.repeat (no Python loop).
    """
    (lk, rk), (lts, rts) = key, ts
    tagged, all_cols = _union_tagged(
        left, right, lk, rk, lts, rts, left_cols, right_cols, n_buckets)

    out_cols = [*left_cols, *right_cols]

    def kernel(g: pa.Table) -> pa.Table:
        side = np.concatenate([c.to_numpy() for c in g["__side"].chunks]) \
            if g["__side"].num_chunks > 1 else g["__side"].chunk(0).to_numpy()
        L = g.filter(pa.array(side == 1))
        R = g.filter(pa.array(side == 0))
        if not len(L) or not len(R):
            return pa.table({c: pa.array([], type=all_cols[c]) for c in out_cols})
        l_ts = L["__ts"].to_numpy()
        # pool = right starts + both probe bounds, so both searchsorted
        # bounds hit exact ranks (strict '>' becomes exact via 'right')
        (l_hi_r, l_lo_r, r_tr), nt = _ranks(
            l_ts, l_ts - np.int64(window_us), R["__ts"].to_numpy())
        (l_kr, r_kr), _ = _ranks(L["__key"].to_numpy(), R["__key"].to_numpy())
        order = np.lexsort((r_tr, r_kr))
        comp_r = r_kr[order] * np.int64(nt) + r_tr[order]
        lo = np.searchsorted(comp_r, l_kr * np.int64(nt) + l_lo_r, side="right")
        hi = np.searchsorted(comp_r, l_kr * np.int64(nt) + l_hi_r, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(len(L), dtype=np.int64), counts)
        total = int(counts.sum())
        # right indices: for each probe, the slice [lo, lo+count)
        starts = np.repeat(lo, counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        ri = order[starts + within]
        out = {c: pc.take(L[c], pa.array(li)) for c in left_cols}
        for c in right_cols:
            out[c] = pc.take(R[c], pa.array(ri))
        return pa.table(out)

    return (
        tagged.groupby("__bucket")
        .map_groups(kernel, batch_format="pyarrow")
    )
