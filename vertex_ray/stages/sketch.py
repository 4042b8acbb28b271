"""Mergeable cardinality sketch (HyperLogLog) — the distributed
approximate-COUNT-DISTINCT a 100 TB pipeline needs where the exact
cardinality budget (stages/cardinality.py) would shuffle every distinct
value. Public-algorithm implementation (Flajolet et al., HLL, AMS 2007;
bias thresholds per the classic constants) — the reference's probabilistic
cardinality mode (``src/transforms/cardinality.rs:62-87``) solves the same
"bounded memory vs distinct explosion" problem with a bloom; HLL adds the
*count* estimate.

Shape: one ``map_batches`` computes per-(group, register) partial maxima —
at most ``groups × 2^p`` rows leave a batch no matter how many values it
held — then ONE ``groupby(group)`` merges registers and evaluates the
estimator. Registers are plain numpy; merge is elementwise max, so the
reduction is associative and order-independent.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hll_partial_op", "hll_distinct", "heavy_hitters"]


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _clz_rho(rem: np.ndarray, width: int) -> np.ndarray:
    """rho = position of the first 1-bit in the low `width` bits (1-based);
    width+1 if all zero. Loop-free via float64 log2 on values < 2^53."""
    rem = rem & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))
    # highest set bit h (0-based) of rem: floor(log2(rem)); width bits < 2^53
    # so float64 log2 is exact for the leading bit position
    h = np.full(len(rem), -1, dtype=np.int64)
    nz = rem != 0
    h[nz] = np.floor(np.log2(rem[nz].astype(np.float64))).astype(np.int64)
    return (width - h).astype(np.int64)  # all-zero -> width + 1


def hll_partial_op(group_col: str, value_col: str, p: int = 12,
                   hash_family: str = "sip"):
    """map_batches fn: per-batch (group, register, rho-max) partials.

    ``hash_family``: "sip" (pandas siphash, fastest) or "md5" (values
    rendered with ``str()`` then hashed like DuckDB ``md5_number_lower``
    — a SQL engine can recompute every register, see dedup_near)."""
    if not 11 <= p <= 16:
        # width = 64 - p must stay <= 53 so float64 log2 in _clz_rho is
        # exact on the register remainder; >16 wastes shuffle rows
        raise ValueError("p must be in [11, 16]")
    m = 1 << p
    width = 64 - p

    def fn(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        grp = t[group_col].to_numpy(zero_copy_only=False)
        if hash_family == "md5":
            from vertex_ray.stages.dedup_near import _md5_hash64

            h = _md5_hash64(np.asarray(vals, dtype=object))
        else:
            h = pd.util.hash_array(
                np.ascontiguousarray(vals)).astype(np.uint64)
        idx = (h >> np.uint64(width)).astype(np.int64)
        rho = _clz_rho(h, width)
        df = pd.DataFrame({"g": grp, "idx": idx, "rho": rho})
        part = df.groupby(["g", "idx"], sort=False)["rho"].max().reset_index()
        return pa.table({
            group_col: pa.array(part["g"]),
            "idx": pa.array(part["idx"].to_numpy()),
            "rho": pa.array(part["rho"].to_numpy()),
        })

    return fn


def hll_distinct(ds, group_col: str, value_col: str, p: int = 12,
                 hash_family: str = "sip"):
    """Approximate distinct ``value_col`` per ``group_col`` →
    (group, approx_distinct:int64). Standard error ≈ 1.04/sqrt(2^p)
    (~1.6% at the default p=12); small ranges use linear counting and are
    near-exact.

    Every step of the estimator is specified exactly so a SQL engine can
    recompute it bit-for-bit (with ``hash_family="md5"``): the harmonic
    sum Σ 2^-reg is EXACT integer arithmetic (terms are dyadic — scaled
    by 2^(width+1) they are ints; a float sum would be order-dependent),
    converted to float once; the raw-estimate expression and the
    linear-counting branch use fixed left-to-right IEEE evaluation
    (``math.log`` == libm == DuckDB ``ln``); the final integer is
    round-half-even (DuckDB ``round_even``)."""
    import math

    m = 1 << p
    width = 64 - p
    alpha = _alpha(m)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        name = g[group_col].iloc[0]
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, g["idx"].to_numpy(), g["rho"].to_numpy())
        cnt = np.bincount(regs, minlength=width + 2)
        s_scaled = sum(int(c) << (width + 1 - v)
                       for v, c in enumerate(cnt.tolist()) if c)
        e = alpha * m * m * 2.0 ** (width + 1) / float(s_scaled)
        zeros = int(cnt[0])
        if e <= 2.5 * m and zeros:
            e = m * math.log(m / zeros)  # linear counting
        elif e > (1 << 64) / 30.0:
            e = -(2.0**64) * math.log1p(-e / 2.0**64)
        return pd.DataFrame(
            {group_col: [name], "approx_distinct": [np.int64(round(e))]})

    return (
        ds.map_batches(hll_partial_op(group_col, value_col, p,
                                      hash_family=hash_family),
                       batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(estimate, batch_format="pandas")
    )


def heavy_hitters(ds, col: str, k: int, top: int | None = None):
    """Top-k frequent values by the mergeable Misra-Gries summary
    (Agarwal et al., "Mergeable Summaries", PODS'12 — public algorithm):
    each batch compresses its exact value counts to at most ``k`` counters
    by subtracting the (k+1)-th largest count and dropping non-positives;
    compressed partials merge exactly by summation. Counts are
    UNDERestimates with total error <= n/(k+1); any value with true
    frequency above that bound is guaranteed to surface.

    Scale shape: a batch emits <= k rows no matter its size; the merge is
    one ``groupby(value).sum`` over blocks*k tiny rows; the final global
    compression is a distributed sort + limit. Returns the ``top``
    (default ``k``) rows of (value, approx_count:int64) ordered by
    approx_count desc, value asc.

    With ``k`` >= the true number of distinct values no subtraction ever
    happens, so counts are exact (the SQL-oracled regime of the driver
    query); the approximate regime's guarantee is pinned in
    tests/test_sketch.py.
    """

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[col].to_numpy(zero_copy_only=False))
        vc = s.value_counts()  # descending
        if len(vc) > k:
            thresh = int(vc.iloc[k])
            vc = vc - thresh
            vc = vc[vc > 0]
        return pa.table({
            "value": pa.array(vc.index.to_numpy(dtype=object)),
            "approx_count": pa.array(vc.to_numpy().astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("value", sort=False)["approx_count"].sum().reset_index()
        out["approx_count"] = out["approx_count"].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("value")
        .map_groups(merge, batch_format="pandas")
        .sort(["approx_count", "value"], descending=[True, False])
        .limit(top if top is not None else k)
    )
