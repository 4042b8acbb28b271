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
    ``rsuffix``). ``how`` is any pandas merge mode ('inner'/'left'/...).
    """
    right_on = right_on or left_on
    ls, rs = left.schema(), right.schema()
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

    out_schema = pa.schema(
        [(left_on, key_type)]
        + [(n, t) for n, t in l_payload]
        + [(n, t) for n, _, t in r_payload]
    )

    def merge(g: pa.Table) -> pa.Table:
        # split sides in Arrow FIRST: selecting each side's own columns
        # before the pandas hop means no null-filled columns ever reach
        # pandas (which would silently widen int64 → float64); the result
        # goes back to Arrow under an EXPLICIT schema so every output
        # block — including empties — is identically typed (Ray's schema
        # union otherwise degrades the whole column).
        import pyarrow.compute as pc

        is_left = pc.equal(g["__side"], 0)
        lg = g.filter(is_left).select(["__key", *l_out]).to_pandas()
        rg = g.filter(pc.invert(is_left)).select(["__key", *r_out]).to_pandas()
        m = lg.merge(rg, on="__key", how=how).rename(columns={"__key": left_on})
        return pa.Table.from_pandas(m, schema=out_schema, preserve_index=False)

    return tagged.groupby("__bucket").map_groups(merge, batch_format="pyarrow")
