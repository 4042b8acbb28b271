"""Read-time histogram_quantile over cumulative bucket columns — the
Prometheus `histogram_quantile()` the reference's exporter sink feeds
(`src/sinks/prometheus_exporter.rs` renders cumulative `le` buckets,
`lib/event/src/metric/mod.rs:190-193` makes +Inf == count). Like the
read-time mean (`__ray_entry__._q_mean_1h`), the tier stores only the
mergeable state (bucket counts); the quantile is derived on read.

The interpolation is the Prometheus formula: find the smallest bucket i
with cum_i >= rank (rank = q·count), then
``lower + (upper - lower) * (rank - prev) / (cur - prev)``; rank landing
beyond the last finite bucket returns the highest finite upper. The SQL
oracle (:func:`histogram_quantile_sql`) is generated from the SAME
formula text so both sides run the identical IEEE-754 expression.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from vertex_ray.schema import DEFAULT_BUCKETS_ARR, N_BUCKETS

__all__ = ["histogram_quantile_batch", "histogram_quantile_sql"]


def histogram_quantile_batch(t: pa.Table, q: float, *,
                             out_col: str = "phi") -> pa.Table:
    """Append ``out_col`` = histogram_quantile(q) computed from b00..bNN
    cumulative bucket columns + count. Fully vectorized (one comparison
    matrix + gathers per batch)."""
    n = len(t)
    bs = np.stack(
        [t[f"b{i:02d}"].to_numpy().astype(np.float64) for i in range(N_BUCKETS)],
        axis=1,
    )
    count = t["count"].to_numpy().astype(np.float64)
    rank = q * count
    idx = (bs < rank[:, None]).sum(axis=1)  # smallest i with b_i >= rank
    inside = idx < N_BUCKETS
    ii = np.minimum(idx, N_BUCKETS - 1)
    rows = np.arange(n)
    upper = DEFAULT_BUCKETS_ARR[ii]
    lower = np.where(idx > 0, DEFAULT_BUCKETS_ARR[np.maximum(idx - 1, 0)], 0.0)
    prev = np.where(idx > 0, bs[rows, np.maximum(idx - 1, 0)], 0.0)
    cur = bs[rows, ii]
    with np.errstate(invalid="ignore", divide="ignore"):
        interp = lower + (upper - lower) * (rank - prev) / (cur - prev)
    phi = np.where(inside, interp, DEFAULT_BUCKETS_ARR[-1])
    return t.append_column(out_col, pa.array(phi, type=pa.float64()))


def histogram_quantile_sql(q: float, count_expr: str = "count",
                           bucket_fmt: str = "b{i:02d}") -> str:
    """The DuckDB expression computing the SAME quantile from the same
    cumulative bucket columns, generated from the same formula so the
    float arithmetic matches the numpy path operation-for-operation."""
    rank = f"({q!r} * CAST({count_expr} AS DOUBLE))"
    whens = []
    for i in range(N_BUCKETS):
        b = bucket_fmt.format(i=i)
        upper = f"CAST({DEFAULT_BUCKETS_ARR[i]!r} AS DOUBLE)"
        if i == 0:
            lower, prev = "CAST(0.0 AS DOUBLE)", "CAST(0.0 AS DOUBLE)"
        else:
            lower = f"CAST({DEFAULT_BUCKETS_ARR[i - 1]!r} AS DOUBLE)"
            prev = f"CAST({bucket_fmt.format(i=i - 1)} AS DOUBLE)"
        whens.append(
            f"WHEN CAST({b} AS DOUBLE) >= {rank} THEN "
            f"{lower} + ({upper} - {lower}) * ({rank} - {prev})"
            f" / (CAST({b} AS DOUBLE) - {prev})"
        )
    last = f"CAST({DEFAULT_BUCKETS_ARR[-1]!r} AS DOUBLE)"
    return "CASE " + " ".join(whens) + f" ELSE {last} END"
