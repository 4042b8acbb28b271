"""Summary metric kind — count, sum, pre-computed quantiles.

The reference models Summary as `{count, sum, quantiles}` whose merge is
a NO-OP (`lib/event/src/metric/mod.rs:33-39`; `MetricValue::merge` at
:42-64 adds for Sum, replaces for Gauge, increments for Histogram, and
does NOTHING for Summary — quantiles are not mergeable). This stage makes
the kind real end-to-end:

- ``latency_summary``: per-(series, window) summaries at the finest tier
  from raw observations — exact count/sum plus exact q-quantiles in the
  DuckDB ``quantile_disc`` convention (0-based rank ``max(ceil(q*n)-1, 0)``),
  computed in ONE ``groupby(bucket)`` exchange. Inside the bucket group
  every (series, window) segment is handled by one lexsort + ``reduceat``
  + fancy-index — no per-group Python loop, no per-series task.
- no-op cascade merge (``coarse_seconds``): folding fine summaries into a
  coarser window under a no-op merge leaves the FIRST accumulated state
  untouched, so the coarser tier is exactly the earliest fine-window row
  per (series, coarse window). Computed inside the same bucket group —
  the cascade costs zero extra exchanges.

Partitioning assumption: ``bucket = conv_hash % n_buckets`` co-locates a
conversation's turns, the same single partitioning key the flagship
rollup reuses for every wide step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vertex_ray.series import series_key_arrays
from vertex_ray.stages.derive import project_for_rollup_fast

_US = 1_000_000


def _segment_starts(*keys: np.ndarray) -> np.ndarray:
    """Start indices of equal-key runs over parallel sorted key arrays."""
    n = len(keys[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        change |= k[1:] != k[:-1]
    return np.r_[np.int64(0), np.flatnonzero(change) + 1]


def summary_segments(
    vals_sorted: np.ndarray, starts: np.ndarray, qs: tuple[float, ...]
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """(count, sum, [quantile per q]) for each segment of a value-sorted
    array. Quantile = element at 0-based rank ``max(ceil(q*n)-1, 0)``
    within the segment (DuckDB ``quantile_disc`` parity, same convention
    as stages/quantile.exact_quantiles)."""
    n = len(vals_sorted)
    counts = np.diff(np.r_[starts, np.int64(n)])
    sums = (
        np.add.reduceat(vals_sorted, starts)
        if n
        else np.empty(0, dtype=np.float64)
    )
    quants = []
    for q in qs:
        rank = np.maximum(np.ceil(q * counts).astype(np.int64) - 1, 0)
        quants.append(vals_sorted[starts + rank] if n else sums)
    return counts, sums, quants


def _latency_summary_bucket(
    t: pa.Table, window_seconds: int, qs: tuple[float, ...],
    coarse_seconds: int | None,
) -> pa.Table:
    """Per-bucket body: derive inter-turn latencies, then summarize every
    (conversation, window) segment in one vectorized pass."""
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    ch = t["conv_hash"].to_numpy()
    turn = t["turn_idx"].to_numpy()
    ts_us = t["ts"].cast("int64").to_numpy()

    order = np.lexsort((turn, ch))
    conv, ch, turn, ts_us = conv[order], ch[order], turn[order], ts_us[order]

    # gap to the previous turn of the same conversation (rows are now
    # conv-contiguous and turn-sorted; conversation starts have turn_idx 0)
    lat_mask = turn > 0
    prev_ts = np.empty(len(ts_us), dtype=np.int64)
    prev_ts[1:] = ts_us[:-1]
    prev_ts[:1] = 0
    lat = (ts_us - prev_ts).astype(np.float64) / 1e6

    conv, ch, lat = conv[lat_mask], ch[lat_mask], lat[lat_mask]
    window = (ts_us[lat_mask] // (window_seconds * _US)) * window_seconds

    order = np.lexsort((lat, window, ch))
    conv, ch, window, lat = conv[order], ch[order], window[order], lat[order]

    # conv string re-checked at hash boundaries (collision safety), same
    # contract as the flagship kernel
    starts = _segment_starts(ch, conv.astype(object), window)
    counts, sums, quants = summary_segments(lat, starts, qs)
    series = series_key_arrays(
        "inter_turn_latency_seconds", conv_id=conv[starts].astype(object)
    )
    ws = window[starts]

    if coarse_seconds is not None:
        # Summary merge is a no-op: the coarse window keeps the FIRST
        # accumulated state. Segments are (series, window)-sorted, so the
        # first fine row of each (series, coarse window) run is that state.
        coarse = (ws // coarse_seconds) * coarse_seconds
        keep = _segment_starts(ch[starts], series.astype(object), coarse)
        series, ws = series[keep], coarse[keep]
        counts, sums = counts[keep], sums[keep]
        quants = [qv[keep] for qv in quants]

    cols: dict[str, pa.Array] = {
        "series_key": pa.array(series, type=pa.string()),
        "window_start": pa.array(ws, type=pa.int64()),
        "count": pa.array(counts, type=pa.int64()),
        "sum": pa.array(sums, type=pa.float64()),
    }
    for q, qv in zip(qs, quants):
        cols[f"q{round(q * 100):02d}"] = pa.array(qv, type=pa.float64())
    return pa.table(cols)


def latency_summary(
    transcripts_ds,
    window_seconds: int = 60,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    *,
    n_buckets: int = 64,
    coarse_seconds: int | None = None,
):
    """Summary-kind rollup of inter-turn latency: one bucket exchange,
    exact per-window count/sum/quantiles; with ``coarse_seconds`` the
    no-op-merge cascade to a coarser tier (first state wins)."""
    projected = transcripts_ds.map_batches(
        lambda b: project_for_rollup_fast(b, n_buckets),
        batch_format="pyarrow",
    )
    return projected.groupby("bucket").map_groups(
        lambda t: _latency_summary_bucket(t, window_seconds, qs, coarse_seconds),
        batch_format="pyarrow",
    )
