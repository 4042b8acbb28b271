"""Deduplication operators.

Reference semantics: src/transforms/dedup.rs — drop events whose selected
fields (match-list or ignore-list) were seen in an LRU cache (default
4096 entries); keys are TYPE-SENSITIVE (``"123"`` ≠ ``123``; null field ≠
missing field — dedup.rs:140-191 and its test matrix at 193-470).

Two Ray-first forms:

- ``dedup_exact(ds, key_cols)`` — global exact dedup: vectorized key hash
  per batch, then one ``groupby(hash).map_groups(first)`` shuffle. The
  keeper is deterministic: the row with the minimum ``order_col``.
- ``DedupLRU`` — the reference's windowed/LRU approximation as a callable
  class for an actor pool. Duplicates are only guaranteed to co-locate if
  the input is hash-partitioned by the dedup key (groupby the key hash
  first, or accept per-actor approximation, exactly like the reference's
  per-process cache only sees its own stream).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa


def type_sensitive_key(row_vals: dict) -> tuple:
    """Type-tagged key tuple — mirrors Value::hash tagging each variant with
    a type id (lib/value/src/lib.rs:49-83)."""
    out = []
    for k in sorted(row_vals):
        v = row_vals[k]
        if v is None:
            tag = "null"
        elif isinstance(v, bool):
            tag = "bool"
        elif isinstance(v, (int, np.integer)):
            tag = "int"
        elif isinstance(v, (float, np.floating)):
            tag = "float"
        elif isinstance(v, (bytes,)):
            tag = "bytes"
        else:
            tag = "str"
        out.append((k, tag, v))
    return tuple(out)


def _key_strings(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Vectorized type-tagged composite key per row."""
    parts = []
    for c in key_cols:
        col = t[c]
        tag = str(col.type)
        vals = col.to_numpy(zero_copy_only=False).astype(str)
        null = np.asarray(col.is_null().to_numpy(zero_copy_only=False))
        # \x1f (not NUL): pandas' bucket hash C-truncates object strings at
        # an embedded NUL, which would collapse every null-bearing key into
        # one hash prefix (bucket skew; see stages/promql.binary_op note)
        vals = np.where(null, "\x1fnull", vals)
        parts.append(np.char.add(f"{c}\x01{tag}\x02", vals.astype(str)))
    key = parts[0]
    for p in parts[1:]:
        key = np.char.add(np.char.add(key, "\x03"), p)
    return key


def dedup_exact(ds, key_cols: list[str], order_col: str, n_buckets: int = 256):
    """Global exact dedup: first row (min order_col) per type-tagged key.

    Hash-BUCKETED shuffle: the groupby key is ``hash(key) % n_buckets``,
    so one task handles a whole bucket of keys and dedups it with ONE
    vectorized ``drop_duplicates`` — per-task overhead amortizes over
    ~n_keys/n_buckets keys instead of paying a pandas call per distinct
    key (which is task-overhead-bound at billions of keys). n_buckets
    bounds per-task memory to ~|ds|/n_buckets rows."""

    def add_key(t: pa.Table) -> pa.Table:
        key = _key_strings(t, key_cols)
        bucket = (pd.util.hash_array(key) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__dedup_key", pa.array(key)).append_column(
            "__bucket", pa.array(bucket)
        )

    def first_per_key(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(order_col, kind="stable")
            .drop_duplicates("__dedup_key", keep="first")
            .drop(columns=["__dedup_key", "__bucket"])
        )

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(first_per_key, batch_format="pandas")
    )


class DedupLRU:
    """LRU-cache dedup (dedup.rs:124-191): match-fields or ignore-fields
    key; cache_size entries; oldest evicted. Pass to ``map_batches(DedupLRU,
    fn_constructor_kwargs=..., concurrency=N)`` after key-partitioning for
    exact results, or use standalone for streaming-shaped approximation."""

    def __init__(
        self,
        match_fields: list[str] | None = None,
        ignore_fields: list[str] | None = None,
        cache_size: int = 4096,
    ):
        if (match_fields is None) == (ignore_fields is None):
            raise ValueError("exactly one of match_fields/ignore_fields required")
        self.match = match_fields
        self.ignore = set(ignore_fields or [])
        self.cache: OrderedDict[tuple, None] = OrderedDict()
        self.cache_size = cache_size

    def _key(self, row: dict) -> tuple:
        if self.match is not None:
            vals = {k: row.get(k) for k in self.match if k in row}
        else:
            vals = {k: v for k, v in row.items() if k not in self.ignore}
        return type_sensitive_key(vals)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = np.zeros(batch.num_rows, dtype=bool)
        for i, row in enumerate(batch.to_pylist()):
            k = self._key(row)
            if k in self.cache:
                self.cache.move_to_end(k)
                continue
            keep[i] = True
            self.cache[k] = None
            if len(self.cache) > self.cache_size:
                self.cache.popitem(last=False)
        return batch.filter(pa.array(keep))
