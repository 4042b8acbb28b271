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

__all__ = [
    "histogram_quantile_batch",
    "histogram_quantile_sql",
    "histogram_fraction_batch",
    "histogram_fraction_sql",
    "exact_quantiles",
]


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


def _frac_idx(x: float) -> tuple:
    """Shared bucket lookup for the fraction estimator: (index of the
    bucket holding threshold ``x``, its lower bound, its upper bound,
    the interpolation constant ``(x - lower) / (upper - lower)``). The
    constant is evaluated in float64 HERE for the numpy path; the SQL
    generator re-emits the same three short literals and the same two
    ops so DuckDB's constant folding produces the bit-identical double
    (a pre-folded 17-digit literal could round differently through
    DuckDB's DECIMAL parse)."""
    idx = int(np.searchsorted(DEFAULT_BUCKETS_ARR, x, side="left"))
    if x <= 0 or idx >= N_BUCKETS:
        return idx, 0.0, 0.0, 0.0
    upper = float(DEFAULT_BUCKETS_ARR[idx])
    lower = float(DEFAULT_BUCKETS_ARR[idx - 1]) if idx > 0 else 0.0
    return idx, lower, upper, (x - lower) / (upper - lower)


def histogram_fraction_batch(t: pa.Table, lo: float, hi: float, *,
                             out_col: str = "fraction") -> pa.Table:
    """Prometheus ``histogram_fraction(lo, hi, h)`` over the classic
    cumulative b00..bNN columns: estimated fraction of observations in
    ``(lo, hi]``, linearly interpolated inside the buckets holding the
    thresholds — the same estimator family as histogram_quantile (the
    SLO read "what share of latencies were between 300 ms and 2 s").
    Fully vectorized; :func:`histogram_fraction_sql` is generated from
    the same formula/constants so both sides run the identical IEEE-754
    expression."""
    n = len(t)
    count = t["count"].to_numpy().astype(np.float64)

    def cum_at(x: float) -> np.ndarray:
        if x <= 0:
            return np.zeros(n, dtype=np.float64)
        idx, _lo, _up, c = _frac_idx(x)
        if idx >= N_BUCKETS:
            return count
        cur = t[f"b{idx:02d}"].to_numpy().astype(np.float64)
        prev = (t[f"b{idx - 1:02d}"].to_numpy().astype(np.float64)
                if idx > 0 else np.zeros(n, dtype=np.float64))
        return prev + (cur - prev) * c

    frac = (cum_at(hi) - cum_at(lo)) / count
    return t.append_column(out_col, pa.array(frac, type=pa.float64()))


def histogram_fraction_sql(lo: float, hi: float,
                           count_expr: str = "count",
                           bucket_fmt: str = "b{i:02d}") -> str:
    """The DuckDB expression for the SAME fraction — thresholds are
    compile-time constants, so the bucket index and interpolation
    constant fold here (in Python float64) instead of in a CASE
    ladder; the remaining SQL arithmetic mirrors the numpy op order."""

    def cum_expr(x: float) -> str:
        if x <= 0:
            return "CAST(0.0 AS DOUBLE)"
        idx, lower, upper, _c = _frac_idx(x)
        if idx >= N_BUCKETS:
            return f"CAST({count_expr} AS DOUBLE)"
        cur = f"CAST({bucket_fmt.format(i=idx)} AS DOUBLE)"
        prev = (f"CAST({bucket_fmt.format(i=idx - 1)} AS DOUBLE)"
                if idx > 0 else "CAST(0.0 AS DOUBLE)")
        # same short literals, same op order as _frac_idx's constant
        c = (f"((CAST({x!r} AS DOUBLE) - CAST({lower!r} AS DOUBLE))"
             f" / (CAST({upper!r} AS DOUBLE) - CAST({lower!r} AS DOUBLE)))")
        return f"({prev} + ({cur} - {prev}) * {c})"

    return (f"(({cum_expr(hi)} - {cum_expr(lo)})"
            f" / CAST({count_expr} AS DOUBLE))")


# --- exact distributed quantile (iterative radix selection) -----------------


def _f64_to_ordered_u64(vals: np.ndarray) -> np.ndarray:
    """Order-preserving float64 → uint64 (standard IEEE-754 total-order
    trick: flip all bits of negatives, flip only the sign bit of
    non-negatives), so quantile selection can radix-partition doubles."""
    bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
    neg = (bits >> np.uint64(63)).astype(bool)
    return np.where(neg, ~bits, bits | np.uint64(1 << 63))


def _ordered_u64_to_f64(u: int) -> float:
    u = np.uint64(u)
    bits = ~u if not bool(u >> np.uint64(63)) else u & np.uint64((1 << 63) - 1)
    return float(np.array([bits], dtype=np.uint64).view(np.float64)[0])


def exact_quantiles(ds, col: str, qs: list[float], *, radix_bits: int = 16):
    """EXACT q-quantiles of a float64 column, DuckDB ``quantile_disc``
    convention (0-based rank = max(ceil(q·n)−1, 0)), without ever sorting
    or materializing the data: iterative radix selection.

    Round r histograms the (order-preserved uint64 of the) values into at
    most 2^radix_bits buckets over each quantile's current candidate
    range, then descends into the bucket containing the target rank —
    ⌈64/radix_bits⌉ = 4 rounds total for arbitrary doubles, independent of
    row count.  All quantiles advance in the SAME pass (one shared scan +
    one tiny ``groupby(q_idx, bucket)`` exchange per round, result ≤
    len(qs)·2^radix_bits rows), so cost is 4 scans regardless of how many
    quantiles are asked for.  Per-batch work is a vectorized mask +
    ``np.bincount``; nothing row-wise, nothing driver-side except the
    ≤1 MiB per-round histogram.  NaN/null values are excluded from n.

    This is the exact-answer complement to the mergeable approximations
    (histogram_quantile above, stages/sketch) — the reference has no exact
    path at all (its summary kind ships pre-computed quantiles,
    lib/event/src/metric/mod.rs:33-39).
    """
    import pandas as pd

    n_total = None
    nb = 1 << radix_bits

    # state per quantile: [lo, hi) candidate range in ordered-u64 space,
    # and k = remaining 0-based rank within that range
    states = [{"lo": 0, "hi": 1 << 64, "k": None, "done": None} for _ in qs]

    for _round in range((64 + radix_bits - 1) // radix_bits + 1):
        active = [i for i, s in enumerate(states) if s["done"] is None]
        if not active:
            break
        spec = [
            (i, states[i]["lo"], states[i]["hi"],
             max((states[i]["hi"] - states[i]["lo"] - 1).bit_length() - radix_bits, 0))
            for i in active
        ]

        def hist(t: pa.Table, spec=spec) -> pa.Table:
            v = np.asarray(
                t[col].drop_null().to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            u = _f64_to_ordered_u64(v[~np.isnan(v)])
            qi_out, b_out, c_out = [], [], []
            for qi, lo, hi, shift in spec:
                # [lo, hi) as u <= hi-1: hi may be 2^64, which does not
                # fit uint64, but hi-1 always does
                sel = u[(u >= np.uint64(lo)) & (u <= np.uint64(hi - 1))]
                if len(sel) == 0:
                    continue
                bkt = (sel - np.uint64(lo)) >> np.uint64(shift)
                cnt = np.bincount(bkt.astype(np.int64))
                nz = np.nonzero(cnt)[0]
                qi_out.append(np.full(len(nz), qi, dtype=np.int64))
                b_out.append(nz.astype(np.int64))
                c_out.append(cnt[nz].astype(np.int64))
            if not qi_out:
                return pa.table({
                    "key": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                })
            # fuse (qi, bucket) into one int64 key so the reduce is a
            # single-key groupby (qi is tiny, bucket < 2^radix_bits)
            key = np.concatenate(qi_out) * np.int64(nb) + np.concatenate(b_out)
            return pa.table({
                "key": pa.array(key),
                "cnt": pa.array(np.concatenate(c_out)),
            })

        # Ray-side tree reduce of the per-batch partials (≤ len(qs)·nb
        # distinct keys reach the driver, never the raw partial rows)
        h = (
            ds.map_batches(hist, batch_format="pyarrow")
            .groupby("key")
            .sum("cnt")
            .to_pandas()
        )
        if h.empty:  # zero non-null rows (to_pandas drops cols when empty)
            h = pd.DataFrame({"key": [], "cnt": [], "qi": [], "bucket": []})
        else:
            h = h.rename(columns={"sum(cnt)": "cnt"})
            h["qi"] = h["key"] // nb
            h["bucket"] = h["key"] % nb

        if n_total is None:  # first round covers the full range for all qs
            n_total = int(h[h["qi"] == active[0]]["cnt"].sum())
            for i, q in enumerate(qs):
                states[i]["k"] = max(int(np.ceil(q * n_total)) - 1, 0)
            if n_total == 0:
                for s in states:
                    s["done"] = float("nan")
                break

        for qi, lo, hi, shift in spec:
            sub = h[h["qi"] == qi].sort_values("bucket")
            cum = sub["cnt"].cumsum().to_numpy()
            bkt = sub["bucket"].to_numpy()
            k = states[qi]["k"]
            j = int(np.searchsorted(cum, k + 1))
            states[qi]["k"] = k - (int(cum[j - 1]) if j > 0 else 0)
            b = int(bkt[j])
            new_lo = lo + (b << shift)
            new_hi = min(new_lo + (1 << shift), hi)
            states[qi]["lo"], states[qi]["hi"] = new_lo, new_hi
            if new_hi - new_lo == 1:
                states[qi]["done"] = _ordered_u64_to_f64(new_lo)

    return pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "value": np.array([s["done"] for s in states], dtype=np.float64),
    })
