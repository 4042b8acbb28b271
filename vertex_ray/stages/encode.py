"""Gorilla encode/decode stages.

``GorillaEncode`` is the canonical stateful actor-pool stage (the geoip
pattern, src/transforms/geoip.rs:85-91 — resource acquired once per
actor in ``__init__``, reused per batch): pass the CLASS to
``map_batches(GorillaEncode, batch_format="pyarrow", concurrency=N)``.
Input rows are per-series arrays (stages/fill.pack_series), so batches
never split a series and the stage needs no shuffle of its own.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vertex_ray.gorilla import (
    decode_flags,
    decode_timestamps,
    decode_values,
    encode_flags,
    encode_timestamps,
    encode_values,
)
from vertex_ray.schema import BLOCK_SCHEMA, BUCKET_COLS, KIND_HISTOGRAM


class GorillaEncode:
    """Actor-pool stage: per-series array rows → Gorilla block rows."""

    def __init__(self, tier: str):
        self.tier = tier
        # reusable scratch would live here (buffers, tables); the numpy
        # encoder allocates per call, so state is just the tier label.

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        ts_blocks: list[bytes] = []
        val_blocks: list[list[bytes]] = []
        flag_blocks: list[bytes] = []
        n_points = np.empty(n, dtype=np.int32)
        block_start = np.empty(n, dtype=np.int64)
        ws_col = batch["window_starts"]
        scalar_cols = [batch[f"vals_{s}"] for s in ("sum", "count", "min", "max", "last")]
        bucket_cols = [batch[f"vals_{b}"] for b in BUCKET_COLS]
        flags_col = batch["flags"]
        for i in range(n):
            ws = np.asarray(ws_col[i].as_py(), dtype=np.int64)
            n_points[i] = len(ws)
            block_start[i] = ws[0] if len(ws) else 0
            ts_blocks.append(encode_timestamps(ws))
            streams = scalar_cols if kinds[i] != KIND_HISTOGRAM else scalar_cols + bucket_cols
            val_blocks.append(
                [encode_values(np.asarray(c[i].as_py(), dtype=np.float64)) for c in streams]
            )
            flag_blocks.append(
                encode_flags(np.asarray(flags_col[i].as_py(), dtype=np.uint8))
            )
        return pa.table(
            {
                "bucket": batch["bucket"],
                "series_key": batch["series_key"],
                "name": batch["name"],
                "kind": batch["kind"],
                "tier": pa.array([self.tier] * n, type=pa.string()),
                "block_start": pa.array(block_start, type=pa.int64()),
                "n_points": pa.array(n_points, type=pa.int32()),
                "ts_block": pa.array(ts_blocks, type=pa.binary()),
                "val_blocks": pa.array(val_blocks, type=pa.list_(pa.binary())),
                "flags": pa.array(flag_blocks, type=pa.binary()),
            },
            schema=BLOCK_SCHEMA,
        )


def decode_block_row(row: dict) -> dict[str, np.ndarray]:
    """One block row → decoded parallel arrays (bit-for-bit)."""
    n = int(row["n_points"])
    ws = decode_timestamps(row["ts_block"], n)
    names = ["sum", "count", "min", "max", "last"]
    if row["kind"] == KIND_HISTOGRAM:
        names += list(BUCKET_COLS)
    vals = {nm: decode_values(vb, n) for nm, vb in zip(names, row["val_blocks"])}
    flags = decode_flags(row["flags"], n)
    return {
        "series_key": np.full(n, row["series_key"], dtype=object),
        "name": np.full(n, row["name"], dtype=object),
        "kind": np.full(n, row["kind"], dtype=np.uint8),
        "window_start": ws,
        "filled": (flags & 1).astype(bool),
        "stale": ((flags >> 1) & 1).astype(bool),
        **vals,
    }


def decode_blocks_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: block rows → decoded tier rows (verification and
    read path). Missing histogram streams come back as zero columns."""
    import pandas as pd

    frames = []
    for row in batch.to_pylist():
        d = decode_block_row(row)
        df = pd.DataFrame({k: v for k, v in d.items()})
        for b in BUCKET_COLS:
            if b not in df:
                df[b] = 0.0
        frames.append(df)
    if not frames:
        return pa.table({})
    out = pd.concat(frames, ignore_index=True)
    out["count"] = out["count"].astype(np.int64)
    for b in BUCKET_COLS:
        out[b] = out[b].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)
