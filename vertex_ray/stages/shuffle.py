"""Deterministic epoch shuffle for training-data ordering.

A training pipeline re-orders the corpus every epoch. ``random_shuffle()``
is non-reproducible and all-to-all; the standard scale trick is a SEEDED
HASH shuffle: derive ``shuffle_key = h(doc_id, seed)`` and range-sort by
it. Same seed → same order on every run/resume (the resumability
contract the reference's checkpointing story implies); a new epoch is
just a new seed — no state carried between epochs.

The key is a Knuth multiplicative hash over the integer doc id plus a
seed offset, kept under 2^32 so the arithmetic is exact int64 on BOTH
the numpy side and the SQL oracle side (no wrap-around semantics
needed). It is NOT cryptographic — it's an order-scrambling bijection
mixer, which is all an epoch shuffle needs.

Scale shape: one vectorized ``map_batches`` to add the key, then ONE
``ds.sort`` (a range-partition exchange — inherent to any global
shuffle). Consumers that only need block-local mixing can skip the sort
and shuffle within batches by the same key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["epoch_shuffle", "shuffle_key"]

_KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative constant
_SEED_MIX = 40503  # Fibonacci-ish 16-bit mixer for the seed offset
_MOD = 1 << 32


def shuffle_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized shuffle key: ((id + seed·40503) · 2654435761) mod 2^32.

    All intermediates fit in int64 for ids < 2^31 and seed < 2^15, so the
    SQL mirror ``((id + seed*40503) * 2654435761) % 4294967296`` is
    bit-identical (no unsigned wrap needed on either side)."""
    if not (0 <= seed < (1 << 15)):
        raise ValueError("seed must be in [0, 32768)")
    return ((ids.astype(np.int64) + seed * _SEED_MIX) * _KNUTH) % _MOD


def epoch_shuffle(ds, id_col: str, seed: int, key_out: str = "shuffle_key"):
    """Return ``ds`` with a deterministic per-epoch ``key_out`` column,
    globally sorted by ``(key_out, id_col)`` (the id tie-break makes the
    order total even on key collisions). Same (data, seed) → same order
    on every run — reproducible epochs, resumable mid-epoch."""

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if ids.dtype.kind not in "iu":
            raise TypeError(f"epoch_shuffle needs an integer id column, "
                            f"got {ids.dtype}")
        return t.append_column(key_out, pa.array(shuffle_key(ids, seed)))

    return ds.map_batches(add_key, batch_format="pyarrow").sort(
        [key_out, id_col])
