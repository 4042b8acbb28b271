"""Sparse exponential-bucket histogram — the Prometheus native-histogram
analogue of the fixed-bucket `MetricValue::Histogram`.

Instead of a fixed `le` bucket vector (schema.DEFAULT_BUCKETS), buckets
are power-of-2 ranges of the integer-microsecond latency: bucket ``idx``
covers ``[2^idx, 2^(idx+1))`` µs, ``idx = floor(log2(lat_us))``, and a
zero bucket (``idx = -1``) holds exact zeros. State is SPARSE — one
``(series_key, window_start, idx, bucket_count)`` row per occupied
bucket — so resolution is unbounded without a per-metric bucket layout,
which is exactly the native-histogram pitch.

Why scale 0 (power-of-2) and integer µs: the bucket boundary computation
``floor(log2(n))`` over exact integers is reproducible bit-for-bit across
engines — true log2(n) is an integer only at exact powers of two (where
libm is exact), elsewhere it is ≥ ~2^-40 away from an integer, far beyond
double rounding error — so the DuckDB oracle computes the identical
bucket index. Finer scales (idx = floor(log2(v)·2^s)) would hinge on
last-ulp libm agreement between engines.

Merge IS mergeable (unlike Summary): same-scale sparse vectors add by
bucket index, so the tier cascade re-aggregates fine rows into coarse
windows with plain integer sums (``coarse_seconds``).

Partitioning: same single key as every flagship wide step —
``bucket = conv_hash % n_buckets`` co-locates a conversation's turns;
each bucket group is one vectorized lexsort + reduceat pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vertex_ray.series import series_key_arrays
from vertex_ray.stages.derive import project_for_rollup_fast
from vertex_ray.stages.summary import _segment_starts

_US = 1_000_000

__all__ = ["latency_exp_histogram", "exp_histogram_quantile"]


def _bucket_body(t: pa.Table, window_seconds: int,
                 coarse_seconds: int | None,
                 exemplars: bool = False) -> pa.Table:
    conv = t["conv_id"].to_numpy(zero_copy_only=False)
    ch = t["conv_hash"].to_numpy()
    turn = t["turn_idx"].to_numpy()
    ts_us = t["ts"].cast("int64").to_numpy()

    order = np.lexsort((turn, ch))
    conv, ch, turn, ts_us = conv[order], ch[order], turn[order], ts_us[order]

    lat_mask = turn > 0
    prev_ts = np.empty(len(ts_us), dtype=np.int64)
    prev_ts[1:] = ts_us[:-1]
    prev_ts[:1] = 0
    lat_us = ts_us - prev_ts

    conv, ch, lat_us = conv[lat_mask], ch[lat_mask], lat_us[lat_mask]
    window = (ts_us[lat_mask] // (window_seconds * _US)) * window_seconds

    # scale-0 exponential bucket index; exact zeros -> the zero bucket
    idx = np.full(len(lat_us), -1, dtype=np.int32)
    pos = lat_us > 0
    idx[pos] = np.floor(np.log2(lat_us[pos].astype(np.float64))).astype(np.int32)

    order = np.lexsort((idx, window, ch))
    conv, ch, window, idx = conv[order], ch[order], window[order], idx[order]
    lat_us = lat_us[order]
    starts = _segment_starts(ch, conv.astype(object), window, idx)
    n = len(idx)
    counts = np.diff(np.r_[starts, np.int64(n)]).astype(np.int64)
    ex = (np.maximum.reduceat(lat_us, starts) if n and exemplars else
          np.empty(0, np.int64))
    conv_s, ch_s, ws, idx_s = (
        conv[starts], ch[starts], window[starts], idx[starts])

    if coarse_seconds is not None:
        # sparse vectors are mergeable: re-aggregate fine rows into the
        # coarse window by integer bucket-count sums (exemplars by max)
        coarse = (ws // coarse_seconds) * coarse_seconds
        order2 = np.lexsort((idx_s, coarse, ch_s))
        conv_s, ch_s, idx_s = conv_s[order2], ch_s[order2], idx_s[order2]
        coarse, counts = coarse[order2], counts[order2]
        starts2 = _segment_starts(ch_s, conv_s.astype(object), coarse, idx_s)
        if len(counts):
            counts = np.add.reduceat(counts, starts2)
            if exemplars:
                ex = np.maximum.reduceat(ex[order2], starts2)
        conv_s, ws, idx_s = conv_s[starts2], coarse[starts2], idx_s[starts2]

    series = series_key_arrays(
        "inter_turn_latency_us", conv_id=conv_s.astype(object))
    cols = {
        "series_key": pa.array(series, type=pa.string()),
        "window_start": pa.array(ws, type=pa.int64()),
        "idx": pa.array(idx_s, type=pa.int32()),
        "bucket_count": pa.array(counts, type=pa.int64()),
    }
    if exemplars:
        # the bucket's largest observation — the exemplar a dashboard
        # links from the bucket to a concrete slow turn (deterministic:
        # max is order-free)
        cols["exemplar_us"] = pa.array(ex, type=pa.int64())
    return pa.table(cols)


def latency_exp_histogram(transcripts_ds, window_seconds: int = 60, *,
                          n_buckets: int = 64,
                          coarse_seconds: int | None = None,
                          exemplars: bool = False):
    """Sparse exponential histogram of inter-turn latency (µs) per
    (series, window): one bucket exchange, one vectorized pass per group;
    with ``coarse_seconds`` the mergeable cascade to a coarser tier;
    ``exemplars`` adds each bucket's largest observation."""
    projected = transcripts_ds.map_batches(
        lambda b: project_for_rollup_fast(b, n_buckets),
        batch_format="pyarrow",
    )
    return projected.groupby("bucket").map_groups(
        lambda t: _bucket_body(t, window_seconds, coarse_seconds, exemplars),
        batch_format="pyarrow",
    )


def exp_histogram_quantile(ds, q: float, out_col: str = "phi",
                           n_buckets: int = 64):
    """Read-time quantile over the sparse exploded rows: per (series,
    window), the smallest occupied bucket whose cumulative count reaches
    ``ceil(q·total)``; reported value is the bucket's exact upper bound
    ``2^(idx+1)`` µs (0.0 for the zero bucket) — an exact power of two,
    so the SQL oracle reproduces it bit-for-bit with ``power(2, idx+1)``.

    One hash exchange on series; each bucket group is a single lexsort +
    segmented cumulative pass (no per-series task)."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["series_key"].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(np.ascontiguousarray(k))
             % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def kernel(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.schema([
                ("series_key", pa.string()), ("window_start", pa.int64()),
                (out_col, pa.float64()),
            ]).empty_table()
        sk = g["series_key"].to_numpy(zero_copy_only=False)
        ws = g["window_start"].to_numpy()
        idx = g["idx"].to_numpy()
        cnt = g["bucket_count"].to_numpy()
        order = np.lexsort((idx, ws, sk.astype(object)))
        sk, ws, idx, cnt = sk[order], ws[order], idx[order], cnt[order]
        starts = _segment_starts(sk.astype(object), ws)
        n = len(idx)
        seg_of = np.zeros(n, dtype=np.int64)
        seg_of[starts] = 1
        seg_of = np.cumsum(seg_of) - 1
        c = np.cumsum(cnt)
        base = np.zeros(len(starts), dtype=np.int64)
        base[1:] = c[starts[1:] - 1]
        cum = c - base[seg_of]
        ends = np.r_[starts[1:] - 1, np.int64(n - 1)]
        total = cum[ends]
        rank = np.ceil(q * total.astype(np.float64))
        ok = cum >= rank[seg_of]
        # first qualifying row per segment (rows are idx-sorted in-segment)
        first = np.full(len(starts), -1, dtype=np.int64)
        rev = np.flatnonzero(ok)[::-1]
        first[seg_of[rev]] = rev
        val = np.where(idx[first] == -1, 0.0,
                       np.power(2.0, idx[first].astype(np.float64) + 1.0))
        return pa.table({
            "series_key": pa.array(sk[starts], type=pa.string()),
            "window_start": pa.array(ws[starts], type=pa.int64()),
            out_col: pa.array(val, type=pa.float64()),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pyarrow")
    )


def exp_histogram_fraction(ds, lo_idx: int, hi_idx: int,
                           out_col: str = "fraction",
                           n_buckets: int = 64):
    """Native-histogram ``histogram_fraction`` analogue over the sparse
    power-of-2 rows: per (series, window), the EXACT share of
    observations whose value fell in ``(2^lo_idx, 2^(hi_idx+1)]`` µs —
    i.e. bucket index in ``[lo_idx, hi_idx]`` (idx -1 is the zero
    bucket). Thresholds snap to the schema's power-of-2 bounds, so
    unlike the classic-bucket estimator there is NO interpolation: the
    count is exact and the single float division mirrors the SQL oracle
    bit-for-bit.

    Combiner shape: each batch collapses its sparse rows to one
    (in-range, total) pair per (series, window) before the one exchange
    (stages/promql.group_sum), so shuffle volume is series-window
    cardinality, never bucket rows."""
    from vertex_ray.stages.promql import group_sum

    def prep(t: pa.Table) -> pa.Table:
        idx = t["idx"].to_numpy()
        cnt = t["bucket_count"].to_numpy()
        inr = np.where((idx >= lo_idx) & (idx <= hi_idx), cnt, 0)
        return pa.table({
            "series_key": t["series_key"],
            "window_start": t["window_start"],
            "__in": pa.array(inr.astype(np.int64)),
            "__tot": pa.array(cnt.astype(np.int64)),
        })

    g = group_sum(ds.map_batches(prep, batch_format="pyarrow"),
                  ["series_key", "window_start"], ["__in", "__tot"],
                  n_buckets=n_buckets)

    def fin(t: pa.Table) -> pa.Table:
        f = (t["__in"].to_numpy().astype(np.float64)
             / t["__tot"].to_numpy().astype(np.float64))
        return pa.table({
            "series_key": t["series_key"],
            "window_start": t["window_start"],
            out_col: pa.array(f, type=pa.float64()),
        })

    return g.map_batches(fin, batch_format="pyarrow")


def exp_histogram_stddev(ds, out_col: str = "stddev",
                         variance: bool = False, n_buckets: int = 64):
    """Native-histogram ``histogram_stddev/stdvar`` analogue over the
    sparse power-of-2 rows: population stddev per (series, window) with
    each observation represented by its bucket's arithmetic midpoint
    ``(2^idx + 2^(idx+1)) / 2`` µs (0 for the zero bucket) — the
    representative-value estimator family Prometheus applies to native
    histograms.

    Bit-exact vs SQL without ordered summation: every term
    ``count·mid`` (and ``count·mid²``) is an integer multiple of a
    power of two, and the per-(series, window) totals stay below 2^53,
    so the sums are exactly representable and ORDER-INDEPENDENT — plain
    ``sum()`` on both sides is safe. The final variance is three IEEE
    ops in a fixed order, ``(s2 - s*s/n) / n``, mirrored in the oracle.
    Combiner shape: one hash exchange on series, one vectorized
    segment-sum kernel per bucket."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["series_key"].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(np.ascontiguousarray(k))
             % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["series_key", "window_start"], kind="stable")
        idx = g["idx"].to_numpy().astype(np.float64)
        cnt = g["bucket_count"].to_numpy().astype(np.float64)
        mid = np.where(idx < 0, 0.0,
                       (np.exp2(idx) + np.exp2(idx + 1.0)) / 2.0)
        sk = g["series_key"].to_numpy(dtype=object)
        ws = g["window_start"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (sk[1:] != sk[:-1]) | (ws[1:] != ws[:-1])
        starts = np.flatnonzero(new)

        def segsum(x: np.ndarray) -> np.ndarray:
            # per-segment independent sums (reduceat), NOT a global
            # cumsum difference: a cross-segment running total could
            # round past 2^53 and break the per-group exactness argument
            return np.add.reduceat(x, starts)

        s = segsum(cnt * mid)
        s2 = segsum(cnt * mid * mid)
        n = segsum(cnt)
        var = (s2 - s * s / n) / n
        res = var if variance else np.sqrt(np.maximum(var, 0.0))
        return pd.DataFrame({"series_key": sk[starts],
                             "window_start": ws[starts], out_col: res})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def exp_histogram_moments(ds, n_buckets: int = 64):
    """Native-histogram ``histogram_count`` / ``histogram_sum`` /
    ``histogram_avg`` analogues over the sparse power-of-2 rows, in one
    pass: per (series, window), the EXACT observation count (int64 sum
    of bucket counts) plus the midpoint-estimator sum and mean (same
    representative-value family as :func:`exp_histogram_stddev` —
    ``count·mid`` terms are integer multiples of powers of two below
    2^53, so the float sums are exact and order-independent; avg is ONE
    IEEE division, mirrored in the SQL oracle). Combiner shape: one
    hash exchange on series, one segment-sum kernel per bucket."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["series_key"].to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(np.ascontiguousarray(k))
             % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["series_key", "window_start"], kind="stable")
        idx = g["idx"].to_numpy().astype(np.float64)
        cntf = g["bucket_count"].to_numpy().astype(np.float64)
        cnti = g["bucket_count"].to_numpy().astype(np.int64)
        mid = np.where(idx < 0, 0.0,
                       (np.exp2(idx) + np.exp2(idx + 1.0)) / 2.0)
        sk = g["series_key"].to_numpy(dtype=object)
        ws = g["window_start"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (sk[1:] != sk[:-1]) | (ws[1:] != ws[:-1])
        starts = np.flatnonzero(new)
        n = np.add.reduceat(cnti, starts)
        s = np.add.reduceat(cntf * mid, starts)
        return pd.DataFrame({
            "series_key": sk[starts],
            "window_start": ws[starts],
            "count": n,
            "sum_est": s,
            "avg_est": s / n,
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(kernel, batch_format="pandas")
    )
