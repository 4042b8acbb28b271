"""Gorilla encode/decode stages.

``GorillaEncode`` is the canonical stateful actor-pool stage (the geoip
pattern, src/transforms/geoip.rs:85-91 — resource acquired once per
actor in ``__init__``, reused per batch): pass the CLASS to
``map_batches(GorillaEncode, batch_format="pyarrow", concurrency=N)``.
Input rows are per-series arrays (stages/fill.pack_series), so batches
never split a series and the stage needs no shuffle of its own.

Two packed layouts are accepted:

- dense (fill.pack_series / the retention repack): every point — real,
  LOCF fill, stale marker — is materialized in the streams; the block
  carries a 2-bit-per-point ``flags`` section and an empty ``runs``.
- virtual fills (kernel.pack_arrays_virtual, marked by a ``runs``
  column): streams carry REAL points only; the block's ``runs`` payload
  is ``[window_seconds: u32 LE][one u16 LE code per real point]`` with
  code = ``n_fill | stale << 15``. ``n_points`` remains the EXPANDED
  total (so retention / tsdb_status point-count semantics are
  unchanged), and decode rebuilds the dense rows bit-for-bit
  (stages/fill.expand_runs_*). Fills are ~58% of all points at the
  default staleness horizon — keeping them out of the encode/decode
  streams halves the stage's memory traffic.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from vertex_ray.gorilla import (
    decode_flags_multi,
    decode_timestamps_multi_flat,
    decode_values_multi_flat,
    encode_flags_multi,
    encode_timestamps_multi,
    encode_values_multi_shared,
)
from vertex_ray.schema import (
    BLOCK_SCHEMA,
    BUCKET_COLS,
    KIND_HISTOGRAM,
    SCALAR_STREAMS,
)

# the on-disk value-stream order is schema.SCALAR_STREAMS — aliased here
# only for brevity; never redefine it (format contract)
_SCALARS = SCALAR_STREAMS


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
        virtual = "runs" in batch.schema.names

        def flat(col_name):
            col = batch[col_name].combine_chunks()
            arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
            return arr.offsets.to_numpy(), arr.values.to_numpy(zero_copy_only=False)

        ws_off, ws_val = flat("window_starts")
        counts = np.diff(ws_off)
        if len(ws_val):
            block_start = np.where(
                counts > 0, ws_val[np.minimum(ws_off[:-1], len(ws_val) - 1)], 0
            )
            # last window of each block: windows are sorted within a series,
            # so the block's time extent is [block_start, block_end]. Stored
            # so retention GC and range selectors can drop/keep whole blocks
            # from footer stats without decoding.
            block_end = np.where(
                counts > 0, ws_val[np.maximum(ws_off[1:] - 1, 0)], 0
            )
        else:
            block_start = np.zeros(n, dtype=np.int64)
            block_end = np.zeros(n, dtype=np.int64)

        if virtual:
            from vertex_ray.stages.fill import RUN_FILL_MASK, RUN_STALE_SHIFT

            _, codes = flat("runs")
            codes = codes.astype(np.uint16, copy=False)
            n_fill = (codes & RUN_FILL_MASK).astype(np.int64)
            extra = n_fill + (codes >> RUN_STALE_SHIFT).astype(np.int64)
            ce = np.zeros(len(extra) + 1, dtype=np.int64)
            np.cumsum(extra, out=ce[1:])
            extra_per = ce[ws_off[1:]] - ce[ws_off[:-1]]
            ws_series = batch["window_seconds"].to_numpy().astype(np.int64)
            n_points = (counts + extra_per).astype(np.int32)
            # the block's time extent includes the virtual tail windows
            last_ix = np.maximum(ws_off[1:] - 1, 0)
            block_end = np.where(
                counts > 0,
                block_end + extra[last_ix] * ws_series,
                0,
            )
            raw = np.ascontiguousarray(codes.astype("<u2")).tobytes()
            runs_col = [
                (struct.pack("<I", int(ws_series[i]))
                 + raw[2 * int(ws_off[i]): 2 * int(ws_off[i + 1])])
                if counts[i] > 0 else b""
                for i in range(n)
            ]
            flag_blocks = [b""] * n
        else:
            fl_off, fl_val = flat("flags")
            flag_blocks = encode_flags_multi(fl_val, fl_off)
            runs_col = [b""] * n
            n_points = counts.astype(np.int32)

        ts_blocks = encode_timestamps_multi(ws_val, ws_off)
        scalar_blocks = encode_values_multi_shared(
            [flat(f"vals_{s}")[1] for s in _SCALARS], ws_off)

        hist = kinds == KIND_HISTOGRAM
        bucket_blocks: dict[int, list[bytes]] = {}
        if hist.any():
            hist_rows = np.flatnonzero(hist)
            sub_off = np.zeros(int(hist.sum()) + 1, dtype=np.int64)
            np.cumsum(counts[hist], out=sub_off[1:])
            b0_off, b0_val = flat(f"vals_{BUCKET_COLS[0]}")
            if len(b0_val) == int(sub_off[-1]) and len(b0_val) != len(ws_val):
                # SPARSE bucket streams (kernel.pack_arrays*): values are
                # already the histogram series' points only — encode as-is
                # (bit-identical: same values, same per-series geometry)
                per_bucket = encode_values_multi_shared(
                    [flat(f"vals_{b}")[1] for b in BUCKET_COLS], sub_off)
            else:
                # dense per-point layout (fill.pack_series): gather the
                # histogram rows' points out of the full streams
                el_mask = np.repeat(hist, counts)
                per_bucket = encode_values_multi_shared(
                    [flat(f"vals_{b}")[1][el_mask] for b in BUCKET_COLS],
                    sub_off)
            bucket_blocks = {
                int(r): [pb[j] for pb in per_bucket] for j, r in enumerate(hist_rows)
            }

        val_blocks = [
            [sb[i] for sb in scalar_blocks] + bucket_blocks.get(i, [])
            for i in range(n)
        ]
        return pa.table(
            {
                "bucket": batch["bucket"],
                "series_key": batch["series_key"],
                "name": batch["name"],
                "kind": batch["kind"],
                "tier": batch["tier"],
                "block_start": pa.array(block_start, type=pa.int64()),
                "block_end": pa.array(block_end, type=pa.int64()),
                "n_points": pa.array(n_points, type=pa.int32()),
                "ts_block": pa.array(ts_blocks, type=pa.binary()),
                "val_blocks": pa.array(val_blocks, type=pa.list_(pa.binary())),
                "flags": pa.array(flag_blocks, type=pa.binary()),
                "runs": pa.array(runs_col, type=pa.binary()),
            },
            schema=BLOCK_SCHEMA,
        )


def decode_block_row(row: dict) -> dict[str, np.ndarray]:
    """One block row → decoded parallel arrays (bit-for-bit). Handles both
    dense and virtual-fill blocks via the batch decoder."""
    t = pa.table({
        k: pa.array([row[k]]) for k in
        ("series_key", "name", "kind", "tier", "n_points", "ts_block",
         "val_blocks", "flags", "runs")
        if k in row
    })
    counts, streams = decode_blocks_flat(t)
    n = int(counts[0])
    out = {
        "series_key": np.full(n, row["series_key"], dtype=object),
        "name": np.full(n, row["name"], dtype=object),
        "kind": np.full(n, row["kind"], dtype=np.uint8),
        "window_start": streams["window_start"],
        "filled": (streams["flags"] & 1).astype(bool),
        "stale": ((streams["flags"] >> 1) & 1).astype(bool),
        "sum": streams["sum"],
        "count": streams["count"],
        "min": streams["min"],
        "max": streams["max"],
        "last": streams["last"],
    }
    if row["kind"] == KIND_HISTOGRAM:
        for b in BUCKET_COLS:
            out[b] = streams["buckets"][b]
    return out


def _parse_runs(batch: pa.Table, n_points: np.ndarray):
    """Split stored block rows into real-point counts + run codes.

    Returns ``(n_real, codes, ws_row, v3_mask)`` — ``codes`` is the flat
    uint16 run-code stream over all rows' REAL points (zeros for dense
    rows), ``ws_row`` the per-row window seconds (0 for dense rows) — or
    ``(n_points, None, None, None)`` when every row is dense."""
    if "runs" not in batch.schema.names:
        return n_points, None, None, None
    import pyarrow.compute as pc

    col = batch["runs"].combine_chunks()
    # vectorized dense-detect: no per-row Python objects when every row
    # is b'' (the common all-dense store)
    lens = pc.binary_length(pc.fill_null(col, b"")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    v3 = lens >= 4
    if not v3.any():
        return n_points, None, None, None
    n_rows = len(col)
    n_real = np.where(v3, (lens - 4) // 2, n_points)
    off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_real, out=off[1:])
    codes = np.zeros(int(off[-1]), dtype=np.uint16)
    ws_row = np.zeros(n_rows, dtype=np.int64)
    # vectorized payload slicing straight off the Arrow binary buffers
    # (offsets + values) — no to_pylist, no per-row Python loop even
    # when only a few rows in the batch are virtual
    odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    starts = np.frombuffer(col.buffers()[1], dtype=odt)[
        col.offset: col.offset + n_rows].astype(np.int64)
    values = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    v3i = np.flatnonzero(v3)
    st = starts[v3i]
    ws_row[v3i] = (values[st].astype(np.int64)
                   | values[st + 1].astype(np.int64) << 8
                   | values[st + 2].astype(np.int64) << 16
                   | values[st + 3].astype(np.int64) << 24)
    c = n_real[v3i]
    within = np.arange(int(c.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(c) - c, c)
    dst = np.repeat(off[v3i], c) + within
    src = np.repeat(st + 4, c) + 2 * within
    codes[dst] = (values[src].astype(np.uint16)
                  | values[src + 1].astype(np.uint16) << np.uint16(8))
    return n_real, codes, ws_row, v3


def decode_blocks_flat(batch: pa.Table):
    """Decode a combined batch of block rows — dense v2 and/or
    virtual-fill v3 — to flat per-point arrays with fills EXPANDED
    (bit-for-bit the dense representation).

    Returns ``(counts, streams)``: ``counts`` is the per-row expanded
    point count; ``streams`` holds ``window_start`` (int64), the five
    scalar streams as float64, ``flags`` (uint8), and ``buckets`` — a
    dict of DENSE float64 arrays (zeros on non-histogram points).

    One flat vectorized decode per stream over the WHOLE batch (the
    columnar-v2 decoders reconstruct every series with segmented scans —
    no per-point loop, no length-skew sensitivity); index geometry is
    shared across the 5 scalar (and 11 bucket) streams. Pure numpy/Arrow
    — a pandas hop here would canonicalize the stale NaN payload and
    break the bit-for-bit contract."""
    from vertex_ray.gorilla import _ZGeom

    n_rows = batch.num_rows
    batch = batch.combine_chunks()
    n_stored = batch["n_points"].to_numpy().astype(np.int64)
    n_real, codes, ws_row, v3 = _parse_runs(batch, n_stored)
    kinds = batch["kind"].to_numpy(zero_copy_only=False)
    ts_blocks = batch["ts_block"].to_pylist()
    val_blocks = batch["val_blocks"].to_pylist()
    flag_blocks = batch["flags"].to_pylist() \
        if "flags" in batch.schema.names else [b""] * n_rows

    zn = np.maximum(n_real - 1, 0)
    geom = _ZGeom(n_real, zn)
    scalars = {
        s: decode_values_multi_flat([vb[i] for vb in val_blocks],
                                    n_real, geom=geom)
        for i, s in enumerate(_SCALARS)
    }
    ws = decode_timestamps_multi_flat(ts_blocks, n_real)
    hist_rows = np.flatnonzero(kinds == KIND_HISTOGRAM)
    hgeom = (_ZGeom(n_real[hist_rows],
                    np.maximum(n_real[hist_rows] - 1, 0))
             if len(hist_rows) else None)
    bucket_real = {
        b_col: decode_values_multi_flat(
            [val_blocks[i][len(_SCALARS) + b_i] for i in hist_rows],
            n_real[hist_rows], geom=hgeom,
        ) if len(hist_rows) else np.zeros(0, dtype=np.float64)
        for b_i, b_col in enumerate(BUCKET_COLS)
    }

    if v3 is None:
        counts = n_real
        total = int(counts.sum())
        flags = (
            np.concatenate(decode_flags_multi(flag_blocks, counts))
            if n_rows else np.zeros(0, dtype=np.uint8)
        ).astype(np.uint8, copy=False)
        el_hist = np.repeat(kinds == KIND_HISTOGRAM, counts)
        buckets = {}
        for b_col in BUCKET_COLS:
            col = np.zeros(total, dtype=np.float64)
            if len(hist_rows):
                col[el_hist] = bucket_real[b_col]
            buckets[b_col] = col
        streams = {"window_start": ws, "flags": flags, "buckets": buckets,
                   **scalars}
        return counts, streams

    from vertex_ray.stages.fill import (
        expand_runs_carry,
        expand_runs_scalars,
        expanded_counts,
    )

    kind_pt = np.repeat(kinds, n_real)
    ws_pt = np.repeat(ws_row, n_real)
    exp = expand_runs_scalars(
        ws, scalars["sum"], scalars["count"], scalars["min"],
        scalars["max"], scalars["last"], kind_pt, codes, ws_pt,
    )
    off_real = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_real, out=off_real[1:])
    counts = expanded_counts(n_real, codes, off_real)
    if not np.array_equal(counts, n_stored):
        raise ValueError(
            "decode_blocks_flat: expanded point counts disagree with the "
            "stored n_points metadata — corrupt runs payload"
        )
    total = int(counts.sum())
    flags = exp["flags"]
    dense_rows = ~v3
    if dense_rows.any():
        # dense rows expand as identity (zero codes); their real flag
        # streams come from the stored flag sections
        el_dense = np.repeat(dense_rows, counts)
        dec = decode_flags_multi(
            [flag_blocks[i] for i in np.flatnonzero(dense_rows)],
            n_real[dense_rows])
        if dec:
            flags[el_dense] = np.concatenate(dec)
    hist_pt = np.repeat(kinds == KIND_HISTOGRAM, n_real)
    codes_h = codes[hist_pt]
    el_hist = np.repeat(kinds == KIND_HISTOGRAM, counts)
    buckets = {}
    for b_col in BUCKET_COLS:
        col = np.zeros(total, dtype=np.float64)
        if len(hist_rows):
            col[el_hist] = expand_runs_carry(bucket_real[b_col], codes_h)
        buckets[b_col] = col
    streams = {
        "window_start": exp["window"],
        "sum": exp["sum"],
        "count": exp["count"],
        "min": exp["min"],
        "max": exp["max"],
        "last": exp["last"],
        "flags": flags,
        "buckets": buckets,
    }
    return counts, streams


def decode_blocks_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: block rows → decoded tier rows (verification and
    read path), virtual fills expanded bit-for-bit."""
    n_rows = batch.num_rows
    if n_rows == 0:
        return pa.table({})
    counts, streams = decode_blocks_flat(batch)
    total = int(counts.sum())
    if total == 0:
        return pa.table({})
    batch = batch.combine_chunks()
    row_ix = pa.array(np.repeat(np.arange(n_rows, dtype=np.int64), counts))
    out = {
        "series_key": batch["series_key"].take(row_ix),
        "name": batch["name"].take(row_ix),
        "kind": batch["kind"].take(row_ix),
        "window_start": pa.array(streams["window_start"], type=pa.int64()),
        "sum": pa.array(streams["sum"], type=pa.float64()),
        "count": pa.array(streams["count"].astype(np.int64), type=pa.int64()),
        "min": pa.array(streams["min"], type=pa.float64()),
        "max": pa.array(streams["max"], type=pa.float64()),
        "last": pa.array(streams["last"], type=pa.float64()),
    }
    if "tier" in batch.schema.names:
        out["tier"] = batch["tier"].take(row_ix)
    for b_col in BUCKET_COLS:
        out[b_col] = pa.array(
            streams["buckets"][b_col].astype(np.int64), type=pa.int64())
    flags = streams["flags"]
    out["filled"] = pa.array((flags & 1).astype(bool))
    out["stale"] = pa.array(((flags >> 1) & 1).astype(bool))
    return pa.table(out)
