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
    decode_timestamps_multi,
    decode_values,
    decode_values_multi,
    encode_flags_multi,
    encode_timestamps_multi,
    encode_values_multi,
)
from vertex_ray.schema import BLOCK_SCHEMA, BUCKET_COLS, KIND_HISTOGRAM


class GorillaEncode:
    """Actor-pool stage: per-series array rows (with a ``tier`` column)
    → Gorilla block rows."""

    def __init__(self):
        # reusable scratch would live here (buffers, tables); the numpy
        # encoder allocates per call, so there is no per-actor state yet.
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.combine_chunks()
        kinds = batch["kind"].to_numpy(zero_copy_only=False)

        def flat(col_name):
            col = batch[col_name].combine_chunks()
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            return arr.offsets.to_numpy(), arr.values.to_numpy(zero_copy_only=False)

        ws_off, ws_val = flat("window_starts")
        fl_off, fl_val = flat("flags")
        counts = np.diff(ws_off)
        n_points = counts.astype(np.int32)
        if len(ws_val):
            block_start = np.where(
                counts > 0, ws_val[np.minimum(ws_off[:-1], len(ws_val) - 1)], 0
            )
        else:
            block_start = np.zeros(n, dtype=np.int64)

        ts_blocks = encode_timestamps_multi(ws_val, ws_off)
        scalar_blocks = [
            encode_values_multi(flat(f"vals_{s}")[1], ws_off)
            for s in ("sum", "count", "min", "max", "last")
        ]

        hist = kinds == KIND_HISTOGRAM
        bucket_blocks: dict[int, list[list[bytes]]] = {}
        if hist.any():
            el_mask = np.repeat(hist, counts)
            sub_off = np.zeros(int(hist.sum()) + 1, dtype=np.int64)
            np.cumsum(counts[hist], out=sub_off[1:])
            hist_rows = np.flatnonzero(hist)
            per_bucket = [
                encode_values_multi(flat(f"vals_{b}")[1][el_mask], sub_off)
                for b in BUCKET_COLS
            ]
            bucket_blocks = {
                int(r): [pb[j] for pb in per_bucket] for j, r in enumerate(hist_rows)
            }

        val_blocks = [
            [sb[i] for sb in scalar_blocks] + bucket_blocks.get(i, [])
            for i in range(n)
        ]
        flag_blocks = encode_flags_multi(fl_val, fl_off)
        return pa.table(
            {
                "bucket": batch["bucket"],
                "series_key": batch["series_key"],
                "name": batch["name"],
                "kind": batch["kind"],
                "tier": batch["tier"],
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
    read path), length-bucketed lockstep decode.

    The lockstep multi-series decoders pay per-iteration numpy overhead up
    to the LONGEST series in a call, so naively decoding a skewed batch
    (many short series, long tail) wastes most lanes. Grouping series by
    ⌈log2 n_points⌉ keeps every lane within 2× of its bucket's max, so
    total lockstep iterations ≤ 2 × max series length while each iteration
    stays wide — this replaced a per-row Python BitReader loop that was
    ~40% of round-1 end-to-end time.

    Pure numpy/Arrow — a pandas hop here would canonicalize the stale NaN
    payload and break the bit-for-bit contract."""
    from vertex_ray.gorilla import decode_flags_multi

    n_rows = batch.num_rows
    if n_rows == 0:
        return pa.table({})
    batch = batch.combine_chunks()
    n_points = batch["n_points"].to_numpy().astype(np.int64)
    kinds = batch["kind"].to_numpy(zero_copy_only=False)
    ts_blocks = batch["ts_block"].to_pylist()
    val_blocks = batch["val_blocks"].to_pylist()
    flag_blocks = batch["flags"].to_pylist()

    # length buckets: same ⌈log2⌉ → lanes within 2× of each other
    lb = np.zeros(n_rows, dtype=np.int64)
    nz = n_points > 0
    lb[nz] = np.ceil(np.log2(np.maximum(n_points[nz], 1) + 1)).astype(np.int64)

    scalar_names = ("sum", "count", "min", "max", "last")
    order_parts: list[np.ndarray] = []
    ts_parts: list[np.ndarray] = []
    scalar_parts: dict[str, list[np.ndarray]] = {s: [] for s in scalar_names}
    hist_parts: dict[str, list[np.ndarray]] = {b: [] for b in BUCKET_COLS}
    flag_parts: list[np.ndarray] = []
    for b_id in np.unique(lb[nz]):
        idx = np.flatnonzero(nz & (lb == b_id))
        order_parts.append(idx)
        np_sub = n_points[idx]
        ts_parts.extend(decode_timestamps_multi([ts_blocks[i] for i in idx], np_sub))
        for s_i, s in enumerate(scalar_names):
            scalar_parts[s].extend(
                decode_values_multi([val_blocks[i][s_i] for i in idx], np_sub)
            )
        flag_parts.extend(decode_flags_multi([flag_blocks[i] for i in idx], np_sub))
        hidx = idx[kinds[idx] == KIND_HISTOGRAM]
        if len(hidx):
            for b_i, b_col in enumerate(BUCKET_COLS):
                hist_parts[b_col].extend(
                    decode_values_multi(
                        [val_blocks[i][len(scalar_names) + b_i] for i in hidx],
                        n_points[hidx],
                    )
                )
    if not order_parts:
        return pa.table({})
    order = np.concatenate(order_parts)
    reps = n_points[order]
    total = int(reps.sum())
    row_ix = pa.array(np.repeat(order, reps))
    flags = np.concatenate(flag_parts) if flag_parts else np.zeros(0, dtype=np.uint8)

    out = {
        "series_key": batch["series_key"].take(row_ix),
        "name": batch["name"].take(row_ix),
        "kind": batch["kind"].take(row_ix),
        "window_start": pa.array(np.concatenate(ts_parts), type=pa.int64()),
        "sum": pa.array(np.concatenate(scalar_parts["sum"]), type=pa.float64()),
        "count": pa.array(
            np.concatenate(scalar_parts["count"]).astype(np.int64), type=pa.int64()
        ),
        "min": pa.array(np.concatenate(scalar_parts["min"]), type=pa.float64()),
        "max": pa.array(np.concatenate(scalar_parts["max"]), type=pa.float64()),
        "last": pa.array(np.concatenate(scalar_parts["last"]), type=pa.float64()),
    }
    if "tier" in batch.schema.names:
        out["tier"] = batch["tier"].take(row_ix)
    el_hist = np.repeat(kinds[order] == KIND_HISTOGRAM, reps)
    for b_col in BUCKET_COLS:
        col = np.zeros(total, dtype=np.int64)
        if hist_parts[b_col]:
            col[el_hist] = np.concatenate(hist_parts[b_col]).astype(np.int64)
        out[b_col] = pa.array(col, type=pa.int64())
    out["filled"] = pa.array((flags & 1).astype(bool))
    out["stale"] = pa.array(((flags >> 1) & 1).astype(bool))
    return pa.table(out)
