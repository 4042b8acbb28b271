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

__all__ = ["hll_partial_op", "hll_distinct", "heavy_hitters",
           "KllSketch", "kll_partial_op", "kll_quantiles"]


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


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin-Lang-Liberty, FOCS 2016) — deterministic form
# ---------------------------------------------------------------------------


class KllSketch:
    """Mergeable one-pass quantile sketch (KLL, arXiv:1603.05346) — the
    single-scan complement to the exact distributed quantile
    (stages/quantile.py, which needs a radix-selection pass per cut).
    Level ``l`` holds items of weight ``2^l``; a level over capacity is
    sorted and every other item promoted (weights double), the rest
    discarded. Capacities decay geometrically (``k·(2/3)^depth``, floor
    8), so memory is O(k·log(n/k)) regardless of n.

    This implementation derandomizes the compaction coin with a per-level
    alternating parity counter: the sketch is BIT-DETERMINISTIC for a
    given update/merge order (reproducible runs, testable), and the
    classic randomized rank guarantee (~2.3/k at one sigma) becomes an
    empirical bound pinned by the property tests. Merge = concatenate
    levels + recompress, so per-batch partials reduce in any tree shape.
    """

    __slots__ = ("k", "n", "levels", "parity")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]

    def _cap(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(8, int(self.k * (2.0 / 3.0) ** depth))

    def _total_cap(self) -> int:
        return sum(self._cap(l) for l in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(v) for v in self.levels)

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for l in range(len(self.levels)):
                if len(self.levels[l]) > self._cap(l):
                    break
            else:
                l = 0
            v = np.sort(self.levels[l])
            keep = np.empty(0, np.float64)
            if len(v) % 2:
                # unpaired item stays at its level
                keep, v = v[-1:], v[:-1]
            off = self.parity[l] & 1
            self.parity[l] += 1
            promoted = v[off::2]
            self.levels[l] = keep
            if l + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self.parity.append(0)
            self.levels[l + 1] = np.concatenate(
                [self.levels[l + 1], promoted])

    def update(self, values) -> "KllSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v):
            self.levels[0] = np.concatenate([self.levels[0], v])
            self.n += len(v)
            self._compress()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.parity.append(0)
        for l, v in enumerate(other.levels):
            if len(v):
                self.levels[l] = np.concatenate([self.levels[l], v])
            self.parity[l] += other.parity[l] if l < len(other.parity) else 0
        self.n += other.n
        self._compress()
        return self

    def _weighted(self):
        vals = np.concatenate([v for v in self.levels if len(v)]) \
            if self._size() else np.empty(0, np.float64)
        wts = np.concatenate(
            [np.full(len(v), 1 << l, np.int64)
             for l, v in enumerate(self.levels) if len(v)]) \
            if self._size() else np.empty(0, np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        """Smallest stored value whose cumulative weight reaches q·n
        (rank-select; q in [0, 1])."""
        vals, wts = self._weighted()
        if not len(vals):
            return float("nan")
        cum = np.cumsum(wts)
        target = q * self.n
        i = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(i, len(vals) - 1)])

    def rank(self, x: float) -> int:
        """Estimated number of items <= x."""
        vals, wts = self._weighted()
        return int(wts[: np.searchsorted(vals, x, side="right")].sum())

    # --- flat (items, levels) serialization for Arrow exchange rows -----
    def dump(self):
        items = np.concatenate([v for v in self.levels if len(v)]) \
            if self._size() else np.empty(0, np.float64)
        lvls = np.concatenate(
            [np.full(len(v), l, np.int32)
             for l, v in enumerate(self.levels) if len(v)]) \
            if self._size() else np.empty(0, np.int32)
        return items, lvls, self.n

    @classmethod
    def load(cls, items, lvls, n, k: int = 200) -> "KllSketch":
        sk = cls(k)
        lvls = np.asarray(lvls, np.int32)
        items = np.asarray(items, np.float64)
        top = int(lvls.max()) if len(lvls) else 0
        sk.levels = [items[lvls == l] for l in range(top + 1)]
        sk.parity = [0] * (top + 1)
        sk.n = int(n)
        return sk


def kll_partial_op(value_col: str, k: int = 200,
                   group_col: str | None = None):
    """map_batches fn: per-batch KLL partial → ONE row per group with the
    sketch's flat (items, levels) arrays — O(k·log) values leave a batch
    regardless of its size."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t[value_col].to_numpy(zero_copy_only=False)
        if group_col is None:
            groups = {None: np.arange(len(t))}
        else:
            s = pd.Series(t[group_col].to_numpy(zero_copy_only=False))
            groups = {g: idx.to_numpy()
                      for g, idx in s.groupby(s, sort=False).groups.items()}
        rows = {"__g": [], "items": [], "lvls": [], "n": []}
        for g, idx in groups.items():
            sk = KllSketch(k).update(np.asarray(vals, np.float64)[idx])
            items, lvls, n = sk.dump()
            rows["__g"].append("" if g is None else g)
            rows["items"].append(items)
            rows["lvls"].append(lvls)
            rows["n"].append(n)
        return pa.table({
            "__g": pa.array(rows["__g"]),
            "items": pa.array(rows["items"],
                              type=pa.list_(pa.float64())),
            "lvls": pa.array(rows["lvls"], type=pa.list_(pa.int32())),
            "n": pa.array(rows["n"], type=pa.int64()),
        })

    return fn


def kll_quantiles(ds, value_col: str, qs, k: int = 200,
                  group_col: str | None = None):
    """One-pass approximate quantiles over a Dataset: per-batch KLL
    partials (combiner pattern), ONE tiny exchange of O(blocks·k·log)
    values, merge + rank-select per group. Returns rows
    (group?, q, value). Empirical rank error ~2.3/k of n (see
    tests/test_sketch.py); for bit-exact quantiles use
    stages/quantile.py at the cost of one extra pass per cut."""
    qs = [float(q) for q in qs]

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        sk = None
        for _, row in g.iterrows():
            part = KllSketch.load(row["items"], row["lvls"], row["n"], k)
            sk = part if sk is None else sk.merge(part)
        out = {"q": qs, "value": [sk.quantile(q) for q in qs]}
        if group_col is not None:
            out = {group_col: [g["__g"].iloc[0]] * len(qs), **out}
        return pd.DataFrame(out)

    return (
        ds.map_batches(kll_partial_op(value_col, k, group_col),
                       batch_format="pyarrow")
        .groupby("__g")
        .map_groups(finalize, batch_format="pandas")
    )
