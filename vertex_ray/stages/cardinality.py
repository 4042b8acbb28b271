"""Cardinality limiter — src/transforms/cardinality.rs:18-295.

Reference: per tag key, track the set of distinct values (exact HashSet or
probabilistic bloom); when a new value would exceed the limit, either Drop
the event or DropTag.

Ray-first: a process-global mutable set does not distribute, so the limit
is enforced with the engine's own primitives in two passes over the
column, both cheap:

1. Budget pass — per-batch partial distinct sets, each TRUNCATED to the
   first `limit` values by min ``order_col`` (lossless: a value in the
   global first-`limit` attains its global min order in some batch, and
   fewer than `limit` values can precede it there, so it survives that
   batch's truncation) → distributed ``groupby(v).min(o)`` →
   ``sort.limit(limit)``. The driver only ever sees `limit` rows — a
   high-cardinality tag at 100 TB never lands its value set on the
   driver.
2. Enforce pass — broadcast the allowed set via ``ray.put`` once, filter /
   blank the tag inside ``map_batches`` (the drop / drop-tag actions).

The first-seen order is defined by ``order_col`` (e.g. event timestamp),
making the result deterministic under any partitioning — unlike the
reference's arrival-order set, which is inherently racy per process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def allowed_values(ds, tag_col: str, order_col: str, limit: int) -> set:
    """First `limit` distinct values of tag_col by first appearance
    (min order_col). Fully distributed; the driver receives `limit` rows."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "v": t[tag_col].to_numpy(zero_copy_only=False),
                "o": t[order_col].cast(pa.int64()).to_numpy()
                if pa.types.is_timestamp(t[order_col].type)
                else t[order_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("v", sort=False)["o"].min().reset_index()
        # per-batch truncation to the limit is lossless for the global
        # top-limit (see module docstring) and bounds everything downstream
        g = g.sort_values(["o", "v"], kind="stable").head(limit)
        return pa.table({"v": pa.array(g["v"]), "o": pa.array(g["o"])})

    firsts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .min("o")
        .sort(["min(o)", "v"])
        .limit(limit)
        .to_pandas()
    )
    return set(firsts["v"])


class SplitBlockBloom:
    """Split-block bloom filter — the reference's probabilistic cardinality
    mode (``src/transforms/cardinality.rs:62-87``, Mode::Probabilistic,
    default 4 MiB per tag; same family as the Parquet SBBF). The bitmap is
    split into 64-byte blocks (8 × uint64 words); a value's 64-bit hash
    picks one block with its high bits and one bit per word with eight
    odd-constant multiplies of its low bits. Insert and membership test are
    loop-free numpy over whole hash arrays.
    """

    # eight odd 32-bit salts (Parquet SBBF constants)
    _SALTS = np.array(
        [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
         0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
        dtype=np.uint64,
    )

    def __init__(self, n_bytes: int = 4 << 20):
        n_blocks = max(1, n_bytes // 64)
        self.words = np.zeros((n_blocks, 8), dtype=np.uint64)

    def _addr(self, h: np.ndarray):
        block = (h >> np.uint64(32)) % np.uint64(len(self.words))
        low = h & np.uint64(0xFFFFFFFF)
        bits = ((low[:, None] * self._SALTS) >> np.uint64(27)) & np.uint64(63)
        return block.astype(np.int64), bits

    def insert_hashes(self, h: np.ndarray) -> None:
        block, bits = self._addr(h)
        one = np.uint64(1)
        for i in range(8):
            np.bitwise_or.at(self.words[:, i], block, one << bits[:, i])

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        block, bits = self._addr(h)
        w = self.words[block, :]
        return ((w & (np.uint64(1) << bits)) != 0).all(axis=1)

    def merge(self, other: "SplitBlockBloom") -> "SplitBlockBloom":
        np.bitwise_or(self.words, other.words, out=self.words)
        return self


def _hash_values(vals) -> np.ndarray:
    """Hash a value array canonically so the same logical values hash
    identically whether they arrive as a typed numpy column or a python
    set (pd.util.hash_array's int64 and object paths differ)."""
    a = np.asarray(vals)
    if a.dtype.kind in "iu":
        a = a.astype(np.int64)
    elif a.dtype.kind == "f":
        a = a.astype(np.float64)
    elif a.dtype.kind == "U":
        a = a.astype(object)
    return pd.util.hash_array(np.ascontiguousarray(a)).astype(np.uint64)


def allowed_bloom(ds, tag_col: str, order_col: str, limit: int,
                  n_bytes: int = 4 << 20) -> SplitBlockBloom:
    """Probabilistic variant of :func:`allowed_values`: the same
    distributed deterministic first-`limit` budget, returned as a
    split-block bloom instead of the value set. The broadcast payload is
    then O(n_bytes) regardless of `limit` or value width — the reference's
    memory argument for Mode::Probabilistic — at the cost of false
    positives letting ~FPP of over-budget values through (never the
    reverse: in-budget values are always accepted)."""
    bloom = SplitBlockBloom(n_bytes)
    vals = np.array(sorted(allowed_values(ds, tag_col, order_col, limit)))
    if len(vals):
        bloom.insert_hashes(_hash_values(vals))
    return bloom


def enforce_limit_bloom(ds, tag_col: str, bloom: SplitBlockBloom,
                        action: str = "drop"):
    """Like :func:`enforce_limit` but membership-tests the broadcast bloom
    (one ``ray.put`` of the bitmap; hashed + probed vectorized per batch)."""
    words_ref = ray.put(bloom.words)

    def fn(t: pa.Table) -> pa.Table:
        b = SplitBlockBloom.__new__(SplitBlockBloom)
        b.words = ray.get(words_ref)
        vals = t[tag_col].to_numpy(zero_copy_only=False)
        ok = b.contains_hashes(_hash_values(vals))
        if action == "drop":
            return t.filter(pa.array(ok))
        blanked = np.where(ok, vals, "")
        return t.set_column(
            t.schema.get_field_index(tag_col), tag_col, pa.array(blanked)
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def enforce_limit(ds, tag_col: str, allowed: set, action: str = "drop"):
    """action="drop": drop rows whose tag value is outside the budget;
    action="drop_tag": keep the row, blank the tag (reference's DropTag)."""
    allowed_ref = ray.put(np.array(sorted(allowed), dtype=object))

    def fn(t: pa.Table) -> pa.Table:
        allow = ray.get(allowed_ref)
        vals = t[tag_col].to_numpy(zero_copy_only=False)
        ok = np.isin(vals, allow)
        if action == "drop":
            return t.filter(pa.array(ok))
        blanked = np.where(ok, vals, "")
        return t.set_column(
            t.schema.get_field_index(tag_col), tag_col, pa.array(blanked)
        )

    return ds.map_batches(fn, batch_format="pyarrow")
