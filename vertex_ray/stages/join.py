"""Distributed hash equi-join for two LARGE datasets.

The broadcast form (stages/enrich.EnrichLookup, the geoip pattern from
src/transforms/geoip.rs:85-91) covers a small static side; this is the
general shuffle join: tag each side, hash-bucket both on the join key,
union, then ONE ``groupby(__bucket)`` exchange with a vectorized pandas
merge inside each bucket.

Partitioning assumptions (documented per the custom-operator contract):
- ``n_buckets`` bounds per-task memory: each bucket task holds roughly
  (|L| + |R|) / n_buckets rows — size it so that fits a worker heap.
- join-key dtype must match between the two sides (the bucket hash is
  dtype-sensitive).
- a single hot key still lands in one bucket; skewed keys need salting
  upstream (the same strategy the rollup pipeline uses for hot series).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _arrow_type(t) -> pa.DataType:
    """Normalize a Dataset schema type (arrow type for arrow-backed blocks,
    numpy dtype for pandas-backed ones) to a pyarrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    if dt == np.dtype(object):  # pandas object column: strings by convention
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _bucket_of(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False)
    return (pd.util.hash_array(vals) % np.uint64(n_buckets)).astype(np.int64)


def hash_join(
    left,
    right,
    left_on: str,
    right_on: str | None = None,
    *,
    n_buckets: int = 64,
    how: str = "inner",
    rsuffix: str = "_r",
):
    """Hash-partitioned equi-join of two Datasets (ONE shuffle).

    Returns a Dataset with the left key column (named ``left_on``), all
    left payload columns, and all right payload columns (collisions get
    ``rsuffix``). ``how`` is 'inner' or 'left' (left-outer: unmatched left
    rows carry nulls in the right columns), or 'semi' / 'anti' — left rows
    with ≥1 / 0 right-side key matches, emitted at most once each with
    left columns only (SQL EXISTS / NOT EXISTS). Duplicate keys on both
    sides expand to the full per-key cartesian product for inner/left,
    like SQL.
    """
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(
            f"how must be 'inner', 'left', 'semi' or 'anti', got {how!r}")
    right_on = right_on or left_on
    ls, rs = left.schema(), right.schema()
    if ls is None or rs is None:
        raise ValueError(
            "hash_join needs typed schemas on both sides; Ray could not "
            "infer one (dataset has no blocks at all — an empty TABLE, not "
            "just empty partitions). Give the input an explicit schema or "
            "skip the join when a side is schemaless.")
    l_payload = [
        (n, _arrow_type(t)) for n, t in zip(ls.names, ls.types) if n != left_on
    ]
    key_type = _arrow_type(dict(zip(ls.names, ls.types))[left_on])
    l_names = set(ls.names)
    r_payload = [
        ((n + rsuffix) if n in l_names else n, n, _arrow_type(t))
        for n, t in zip(rs.names, rs.types)
        if n != right_on
    ]
    if how in ("semi", "anti"):
        # existence checks never read right payloads: drop them from the
        # tagged schema entirely, so only right KEYS cross the exchange
        r_payload = []
    l_out = [n for n, _ in l_payload]
    r_out = [n for n, _, _ in r_payload]

    def prep_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "__key": t[left_on].cast(key_type),
            "__bucket": pa.array(_bucket_of(t[left_on], n_buckets)),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for name, typ in l_payload:
            cols[name] = t[name].cast(typ)
        for name, _src, typ in r_payload:
            cols[name] = pa.nulls(n, typ)
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        if how in ("semi", "anti"):
            # per-batch distinct right keys (combiner): existence only
            # needs each key once, so the shuffle carries the batch's key
            # SET, not its rows
            keys = t[right_on].cast(key_type)
            t = pa.table({right_on: pc.unique(
                keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
                else keys)})
        n = t.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "__key": t[right_on].cast(key_type),
            "__bucket": pa.array(_bucket_of(t[right_on], n_buckets)),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for name, typ in l_payload:
            cols[name] = pa.nulls(n, typ)
        for name, src, typ in r_payload:
            cols[name] = t[src].cast(typ)
        return pa.table(cols)

    tagged = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )

    semi_like = how in ("semi", "anti")
    out_fields = [(left_on, key_type)] + [(n, t) for n, t in l_payload]
    if not semi_like:
        out_fields += [(n, t) for n, _, t in r_payload]
    out_schema = pa.schema(out_fields)

    def merge(g: pa.Table) -> pa.Table:
        # stays in Arrow end to end (no pandas hop, so no int64 → float64
        # widening for nullable right columns on a left join): rank-compress
        # the bucket's keys, sort the right side ONCE, then two vectorized
        # searchsorteds give every probe its [lo, hi) match slice and
        # np.repeat expands — loop-free, like the asof/range kernels.
        import pyarrow.compute as pc

        side = np.concatenate([c.to_numpy() for c in g["__side"].chunks]) \
            if g["__side"].num_chunks != 1 else g["__side"].chunk(0).to_numpy()
        L = g.filter(pa.array(side == 0))
        R = g.filter(pa.array(side == 1))
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in out_schema})
        if not len(L) or (how in ("inner", "semi") and not len(R)):
            return empty
        if how == "anti" and not len(R):
            return pa.table(
                {left_on: L["__key"], **{c: L[c] for c in l_out}}
            ).cast(out_schema)
        lk = L["__key"].to_numpy(zero_copy_only=False)
        rk = R["__key"].to_numpy(zero_copy_only=False)
        allk = np.concatenate([lk, rk])
        _, inv = np.unique(allk, return_inverse=True)
        l_kr, r_kr = inv[:len(lk)], inv[len(lk):]
        order = np.argsort(r_kr, kind="stable")
        r_sorted = r_kr[order]
        lo = np.searchsorted(r_sorted, l_kr, side="left")
        hi = np.searchsorted(r_sorted, l_kr, side="right")
        counts = hi - lo
        if semi_like:
            sel = np.flatnonzero(counts > 0 if how == "semi" else counts == 0)
            return pa.table({
                left_on: pc.take(L["__key"], pa.array(sel)),
                **{c: pc.take(L[c], pa.array(sel)) for c in l_out},
            }).cast(out_schema)
        li = np.repeat(np.arange(len(L), dtype=np.int64), counts)
        total = int(counts.sum())
        starts = np.repeat(lo, counts)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        ri = order[starts + within]
        out = {left_on: pc.take(L["__key"], pa.array(li))}
        for c in l_out:
            out[c] = pc.take(L[c], pa.array(li))
        for c in r_out:
            out[c] = pc.take(R[c], pa.array(ri))
        # cast each piece to the declared schema BEFORE any concat: a bucket
        # whose input blocks carried a null-typed (all-null) column would
        # otherwise mismatch its sibling (null casts losslessly to any type)
        t = pa.table(out).cast(out_schema)
        if how == "left":
            un = np.flatnonzero(counts == 0)
            if len(un):
                extra = {left_on: pc.take(L["__key"], pa.array(un))}
                for c in l_out:
                    extra[c] = pc.take(L[c], pa.array(un))
                for c, typ in [(n, ty) for n, _s, ty in r_payload]:
                    extra[c] = pa.nulls(len(un), type=typ)
                t = pa.concat_tables([t, pa.table(extra).cast(out_schema)])
        return t

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")
