"""Metric normalization: absolute ↔ incremental counter conversion.

Mirrors the reference's MetricNormalize / MetricsBuffer contract
(/root/reference/lib/framework/src/sink/buffer/metrics.rs:100-146): most
sinks expect delta counters while Prometheus-style sources deliver
cumulative (absolute) ones, so a per-series normalizer converts between
the two. Semantics reproduced here:

- absolute → incremental: the first observation of a series only sets
  the reference state and emits nothing; each later observation emits
  ``value - previous``; a DECREASE is a counter reset and emits the new
  value itself as the delta.
- incremental → absolute: running per-series total.

Ray-Data shape: no shared state actor — series are hash-partitioned by
ONE ``groupby(key)`` and each group converts with a single vectorized
sorted diff / cumsum. The deterministic (ts, tie) sort stands in for the
arrival order the streaming reference sees. Partitioning assumption: one
series' full history fits a worker heap (same as the rollup's bucket
groups); longer retentions need a (key × coarse epoch) group key with
carried-in boundary state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def absolute_to_incremental(ds, key_cols: list[str], ts_col: str,
                            value_col: str, tie_col: str,
                            out_col: str = "delta"):
    """Cumulative counter series → per-observation deltas."""
    sort_cols = [ts_col, tie_col]

    def conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        v = g[value_col].to_numpy(dtype=np.float64)
        if len(v) < 2:
            out = g.iloc[:0].drop(columns=[value_col]).copy()
            out[out_col] = np.zeros(0, dtype=np.float64)
            return out
        prev = v[:-1]
        cur = v[1:]
        delta = np.where(cur >= prev, cur - prev, cur)  # decrease = reset
        out = g.iloc[1:].drop(columns=[value_col]).copy()
        out[out_col] = delta
        return out

    return ds.groupby(key_cols).map_groups(conv, batch_format="pandas")


def incremental_to_absolute(ds, key_cols: list[str], ts_col: str,
                            value_col: str, tie_col: str,
                            out_col: str = "total"):
    """Delta counter series → running cumulative totals (exact for
    integer-valued inputs; float inputs accumulate in sorted order)."""
    sort_cols = [ts_col, tie_col]

    def conv(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="stable")
        v = g[value_col].to_numpy()
        out = g.drop(columns=[value_col]).copy()
        out[out_col] = np.cumsum(v)
        return out

    return ds.groupby(key_cols).map_groups(conv, batch_format="pandas")
