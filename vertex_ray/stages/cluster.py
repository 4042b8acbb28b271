"""Distributed spherical k-means over an embedding column — the
cluster/curate step of an embedding-based training-data pipeline
(cluster-balanced sampling, near-dup bucketing, topic discovery). Public
algorithm (Lloyd iterations, cosine/spherical variant).

Scale shape — no shuffle at all:
  * centroids live on the driver (k × d floats) and are broadcast into
    every ``map_batches`` task via closure capture of a ``ray.put`` ref;
  * each Lloyd iteration is ONE streaming pass: a batch emits per-centroid
    (sum-vector, count) partials — k rows per batch regardless of batch
    size — and the driver reduces the tiny partial table;
  * the final assignment pass is an ordinary stateless ``map_batches``.
At 100 TB the per-iteration traffic is blocks × k × d floats of partials —
independent of row count.

Init + sample refinement reuses ``stages/ann.train_centroids`` (the IVF
coarse quantizer); this module hardens it into full-data Lloyd iterations.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.stages.ann import _stack, _unit, train_centroids

__all__ = ["kmeans_fit", "kmeans_assign"]


def kmeans_fit(ds, vec_col: str, k: int, iters: int = 8,
               seed: int = 13) -> np.ndarray:
    """Spherical k-means centroids trained on the FULL dataset: sample-based
    init (deterministic), then `iters` streaming Lloyd passes of
    per-batch partial sums. Returns unit-norm (k, d) centroids."""
    cents = _unit(train_centroids(ds, vec_col, k, seed=seed))

    for _ in range(iters):
        cu = cents  # captured; shipped once per task by Ray's closure store

        def partial(t: pa.Table) -> pa.Table:
            vecs = _stack(t[vec_col])
            assign = np.argmax(_unit(vecs) @ cu.T, axis=1)
            sums = np.zeros_like(cu, dtype=np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=len(cu)).astype(np.int64)
            nz = np.flatnonzero(counts)
            return pa.table({
                "c": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz]),
                "s": pa.array(list(sums[nz])),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cents, dtype=np.float64)
        counts = np.zeros(len(cents), dtype=np.int64)
        cs = parts["c"].to_numpy()
        np.add.at(counts, cs, parts["n"].to_numpy())
        np.add.at(sums, cs, np.stack(parts["s"].to_numpy()))
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = _unit(new)
    return cents


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str, id_col: str):
    """Stateless assignment pass → (id, cluster:int64, cosine:float64)."""
    cu = _unit(centroids)

    def fn(t: pa.Table) -> pa.Table:
        vecs = _unit(_stack(t[vec_col]))
        sims = vecs @ cu.T
        assign = np.argmax(sims, axis=1)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(assign.astype(np.int64)),
            "cosine": pa.array(sims[np.arange(len(assign)), assign]),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _fdiv(a: np.ndarray, b: int) -> np.ndarray:
    """Floor division by a positive int — numpy's native ``//`` (floors
    toward −∞). Named so the SQL mirror can cite the exact semantics it
    must reproduce (DuckDB ``//`` truncates toward zero, so the oracle
    spells negatives as ``-((-a + b - 1) // b)``)."""
    return a // b


def pca_power_int_fit(ds, vec_col: str, *, quant: int = 128,
                      vec_scale: int = 4096, iters: int = 6):
    """INTEGER-exact top-principal-direction fit — the oracle-able twin
    of :func:`pca_fit` (whose float partial sums merge in Ray block
    order, so its low bits can never be hash-oracled; here every
    quantity is an int64 with order-free reduction, the
    ``kmeans_int_fit`` discipline):

    * coordinates quantized ``floor(x · quant)`` (int64);
    * ONE streaming pass accumulates (n, Σxq, Σ xq·xqᵀ) — the same
      combiner shape as pca_fit: the exchange carries O(d²) ints per
      batch, independent of row count;
    * centered scatter ``M = n·S − s·sᵀ`` (exact int), normalized
      ``Mn = M // n`` (floored — keeps every later product inside
      int64 at 100× data);
    * ``iters`` POWER ITERATIONS from the all-``vec_scale`` vector,
      each rescaled by ``v ← w // (max|w| // vec_scale + 1)`` (floor
      division) — a FIXED iteration count, so exactness does not
      depend on convergence: the oracle unrolls the same chain;
    * deterministic sign: flipped so the largest-|entry| coordinate
      (ties → lowest index) is positive.

    Returns (n, s[d] int64, v[d] int64).
    """
    def partial(t: pa.Table) -> pa.Table:
        xq = np.floor(_stack(t[vec_col]).astype(np.float64)
                      * quant).astype(np.int64)
        return pa.table({
            "n": pa.array([len(xq)]),
            "s": pa.array([xq.sum(axis=0).tobytes()], type=pa.binary()),
            "ss": pa.array([(xq.T @ xq).tobytes()], type=pa.binary()),
        })

    n_tot, s_tot, ss_tot = 0, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for n, sb, ssb in zip(b["n"].to_pylist(), b["s"].to_pylist(),
                              b["ss"].to_pylist()):
            s = np.frombuffer(sb, np.int64)
            d = len(s)
            ss = np.frombuffer(ssb, np.int64).reshape(d, d)
            n_tot += n
            s_tot = s if s_tot is None else s_tot + s
            ss_tot = ss if ss_tot is None else ss_tot + ss
    if not n_tot:
        raise ValueError("pca_power_int_fit on an empty dataset")
    m = n_tot * ss_tot - np.outer(s_tot, s_tot)
    mn = _fdiv(m, n_tot)
    v = np.full(len(s_tot), vec_scale, dtype=np.int64)
    for _ in range(iters):
        w = mn @ v
        div = int(np.abs(w).max()) // vec_scale + 1
        v = _fdiv(w, div)
    if v[np.abs(v).argmax()] < 0:  # argmax ties → lowest index
        v = -v
    return n_tot, s_tot, v


def pca_power_int_project(ds, n: int, s: np.ndarray, v: np.ndarray,
                          vec_col: str, id_col: str, *, quant: int = 128):
    """Centered integer projection ``proj = Σ_j (n·xq_j − s_j)·v_j``
    (scaled by n to stay integer; broadcast the tiny (n, s, v) model
    once, one int matmul per batch)."""
    import ray

    ref = ray.put((n, s, v))

    def fn(t: pa.Table) -> pa.Table:
        nn, sv, vv = ray.get(ref)
        xq = np.floor(_stack(t[vec_col]).astype(np.float64)
                      * quant).astype(np.int64)
        proj = (nn * xq - sv) @ vv
        return pa.table({
            id_col: t[id_col],
            "proj": pa.array(proj.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pca_fit(ds, vec_col: str, k: int):
    """Distributed PCA fit: ONE streaming pass accumulates per-batch
    (count, Σx, ΣxxT) — the combiner shape, d×d partials merged
    associatively on the driver (d is the embedding dim, so the driver
    holds O(d²), never O(n)) — then an eigendecomposition of the
    covariance gives the top-k components. Deterministic sign convention:
    each component is flipped so its largest-|entry| coordinate is
    positive (eigh's sign is otherwise arbitrary).

    Returns (mean[d], components[k, d]) ready to broadcast.
    """
    def partial(t: pa.Table) -> pa.Table:
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        s = x.sum(axis=0)
        ss = x.T @ x
        return pa.table({
            "n": pa.array([len(x)]),
            "s": pa.array([s.tobytes()], type=pa.binary()),
            "ss": pa.array([ss.tobytes()], type=pa.binary()),
        })

    n_tot, s_tot, ss_tot = 0, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for n, sb, ssb in zip(b["n"].to_pylist(), b["s"].to_pylist(),
                              b["ss"].to_pylist()):
            s = np.frombuffer(sb, np.float64)
            d = len(s)
            ss = np.frombuffer(ssb, np.float64).reshape(d, d)
            n_tot += n
            s_tot = s if s_tot is None else s_tot + s
            ss_tot = ss if ss_tot is None else ss_tot + ss
    if not n_tot:
        raise ValueError("pca_fit on an empty dataset")
    mean = s_tot / n_tot
    cov = ss_tot / n_tot - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T  # top-k rows
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps


def pca_project(ds, mean: np.ndarray, comps: np.ndarray,
                vec_col: str, id_col: str):
    """Project embeddings onto fitted components: broadcast the tiny
    (mean, W) model once (ray.put) and stream the corpus through one
    matmul per batch."""
    import ray

    ref = ray.put((mean, comps))

    def fn(t: pa.Table) -> pa.Table:
        m, w = ray.get(ref)
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        proj = (x - m) @ w.T
        return pa.table({
            id_col: t[id_col],
            "proj": pa.array(list(proj)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def linear_probe_fit(ds, vec_col: str, label_col: str, *,
                     n_classes: int | None = None, l2: float = 1e-3):
    """Distributed closed-form LINEAR PROBE over an embedding column —
    the standard "are these embeddings any good / train a quality
    classifier" read of a training-data pipeline: one-vs-rest ridge
    regression to one-hot class targets, solved from the normal
    equations.

    Scale shape (same combiner pattern as pca_fit): one streaming pass
    accumulates per-batch ``XᵀX`` (d×d) and ``XᵀY`` (d×k) partials —
    the exchange carries O(d² + d·k) floats PER BATCH, independent of
    row count — merged associatively on the driver, then ONE d×d solve
    gives the weight matrix ``W = (XᵀX + λI)⁻¹ XᵀY`` to broadcast.

    No SQL oracle by design: the float partial sums merge in block
    order, so low bits differ run-to-run (unlike the engine's
    integer-sufficient-statistic ops); the op is property-tested
    instead (exact recovery on separable data; accuracy far above
    chance on the synthetic embeddings).

    Returns ``(W[d, k], classes[k])``.
    """
    def partial(t: pa.Table) -> pa.Table:
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        yl = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = int(n_classes) if n_classes else int(yl.max()) + 1
        Y = np.zeros((len(x), k))
        Y[np.arange(len(x)), yl] = 1.0
        return pa.table({
            "k": pa.array([k]),
            "xtx": pa.array([(x.T @ x).tobytes()], type=pa.binary()),
            "xty": pa.array([(x.T @ Y).tobytes()], type=pa.binary()),
        })

    xtx_tot, xty_tot, k_max = None, None, 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for k, xb, yb in zip(b["k"].to_pylist(), b["xtx"].to_pylist(),
                             b["xty"].to_pylist()):
            xtx = np.frombuffer(xb, np.float64)
            d = int(round(len(xtx) ** 0.5))
            xtx = xtx.reshape(d, d)
            xty = np.frombuffer(yb, np.float64).reshape(d, k)
            if xty_tot is not None and k != xty_tot.shape[1]:
                # pad to the wider class count (a batch may not see
                # every class; fixed n_classes avoids this path)
                kk = max(k, xty_tot.shape[1])
                xty = np.pad(xty, ((0, 0), (0, kk - k)))
                xty_tot = np.pad(
                    xty_tot, ((0, 0), (0, kk - xty_tot.shape[1])))
            k_max = max(k_max, k)
            xtx_tot = xtx if xtx_tot is None else xtx_tot + xtx
            xty_tot = xty if xty_tot is None else xty_tot + xty
    if xtx_tot is None:
        raise ValueError("linear_probe_fit on an empty dataset")
    d = xtx_tot.shape[0]
    W = np.linalg.solve(xtx_tot + l2 * np.eye(d), xty_tot)
    return W, np.arange(k_max)


def linear_probe_score(ds, W: np.ndarray, vec_col: str, id_col: str,
                       label_col: str | None = None):
    """Score every vector with a broadcast probe weight matrix — a
    stateless per-batch matmul appending ``predicted`` (argmax class,
    first-class tie-break) and, when ``label_col`` is given,
    ``correct``. The d×k matrix rides the task closure (broadcast once,
    like the ANN query matrix)."""
    def fn(t: pa.Table) -> pa.Table:
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        logits = x @ W
        pred = logits.argmax(axis=1).astype(np.int64)
        cols = {id_col: t[id_col]}
        if label_col is not None:
            yl = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[label_col] = t[label_col]
            cols["correct"] = pa.array(pred == yl)
        cols["predicted"] = pa.array(pred)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def linear_probe_exact(ds, vec_col: str, label_col: str, id_col: str, *,
                       dims: tuple = (0, 1, 2), quant: int = 256,
                       l2_q: int = 1, n_classes: int = 10):
    """INTEGER-EXACT linear probe — the SQL-oracled twin of
    :func:`linear_probe_fit` + :func:`linear_probe_score`.

    The full float probe's XᵀX partials merge in block order, so the
    low mantissa bits are run-order dependent and no bit-exact SQL
    mirror exists. This variant makes every step exact by construction:

    1. The first ``len(dims)`` embedding coordinates are quantized to
       integers with ``floor(x * quant + 0.5)`` (power-of-two scaling is
       exact in float64, so DuckDB computes the identical integer).
    2. The normal-equation partials ``XᵀX`` (d×d) and ``XᵀY`` (d×k,
       one-hot targets) are EXACT int64 sums per batch — the combiner
       exchange is O(d² + d·k) integers per batch, row-count
       independent — merged as arbitrary-precision Python ints on the
       driver (addition is order-free, unlike floats).
    3. The d=3 ridge system ``(XᵀX + λI) W = XᵀY`` is solved in exact
       integer arithmetic via the 3×3 adjugate: ``W = adj(A)·B / det``
       with det > 0 (A is positive definite), so ``W[j][c] =
       float(num) / float(det)`` is ONE fixed float expression both
       sides compute identically.
    4. Scoring is the fixed-order float expression
       ``(x0q·W0c + x1q·W1c) + x2q·W2c`` (left-assoc, exactly DuckDB's
       parse of ``a + b + c``), argmax with first-class tie-break.

    Emits ``(id, label, predicted, correct)`` — bit-identical to the
    generated SQL mirror. The full-dimension float probe remains the
    production path (property-tested in tests/test_cluster.py); this is
    the correctness-auditable distributed skeleton (same partial
    exchange shape) at d=3."""
    d = len(dims)
    assert d == 3, "adjugate solve is written for d=3"
    dim_idx = list(dims)
    q = float(quant)

    def partial(t: pa.Table) -> pa.Table:
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False))[:, dim_idx]
        xq = np.floor(x.astype(np.float64) * q + 0.5).astype(np.int64)
        yl = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        xtx = xq.T @ xq                              # exact in int64
        Y = np.zeros((len(xq), n_classes), np.int64)
        Y[np.arange(len(xq)), yl] = 1
        xty = xq.T @ Y                               # exact in int64
        return pa.table({
            "xtx": pa.array([xtx.tobytes()], type=pa.binary()),
            "xty": pa.array([xty.tobytes()], type=pa.binary()),
        })

    A = [[0] * d for _ in range(d)]     # Python ints: exact, order-free
    B = [[0] * n_classes for _ in range(d)]
    seen = False
    for blk in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for xb, yb in zip(blk["xtx"].to_pylist(), blk["xty"].to_pylist()):
            seen = True
            xtx = np.frombuffer(xb, np.int64).reshape(d, d)
            xty = np.frombuffer(yb, np.int64).reshape(d, n_classes)
            for j in range(d):
                for l in range(d):
                    A[j][l] += int(xtx[j, l])
                for c in range(n_classes):
                    B[j][c] += int(xty[j, c])
    if not seen:
        raise ValueError("linear_probe_exact on an empty dataset")
    for j in range(d):
        A[j][j] += int(l2_q)

    # exact 3x3 adjugate + determinant (A symmetric positive definite)
    a00, a01, a02 = A[0]
    _, a11, a12 = A[1]
    a22 = A[2][2]
    adj = [[a11 * a22 - a12 * a12, a02 * a12 - a01 * a22,
            a01 * a12 - a02 * a11],
           [a02 * a12 - a01 * a22, a00 * a22 - a02 * a02,
            a02 * a01 - a00 * a12],
           [a01 * a12 - a02 * a11, a02 * a01 - a00 * a12,
            a00 * a11 - a01 * a01]]
    det = (a00 * adj[0][0] + a01 * adj[0][1] + a02 * adj[0][2])
    detf = float(det)
    W = [[float(sum(adj[j][l] * B[l][c] for l in range(d))) / detf
          for c in range(n_classes)] for j in range(d)]

    def score(t: pa.Table) -> pa.Table:
        x = np.stack(t[vec_col].to_numpy(zero_copy_only=False))[:, dim_idx]
        xq = np.floor(x.astype(np.float64) * q + 0.5)
        logits = np.empty((len(xq), n_classes), np.float64)
        for c in range(n_classes):
            # fixed order: (x0*W0c + x1*W1c) + x2*W2c — DuckDB's
            # left-assoc parse of the same expression
            logits[:, c] = (xq[:, 0] * W[0][c] + xq[:, 1] * W[1][c]) \
                + xq[:, 2] * W[2][c]
        pred = logits.argmax(axis=1).astype(np.int64)  # first-max tie
        yl = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            label_col: t[label_col],
            "predicted": pa.array(pred),
            "correct": pa.array(pred == yl),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# integer-exact Lloyd variant (SQL-oracle-able k-means)
# ---------------------------------------------------------------------------


def kmeans_int_fit(ds, vec_col: str, id_col: str, k: int, iters: int,
                   quant: int = 128) -> np.ndarray:
    """INTEGER-exact Lloyd k-means — the oracle-able twin of
    :func:`kmeans_fit` (the float variant's sums are FP-order-dependent
    across Ray blocks, so it can never be hash-oracled; this variant's
    every quantity is an int64 with order-free reduction, the
    `_sql_bpe_train` discipline):

    * coordinates quantized ``floor(x · quant)`` (int64);
    * init = the quantized vectors of the ``k`` smallest ids
      (deterministic; a sort-limit reads k rows);
    * assignment = argmax integer dot product, ties to the lowest
      cluster index;
    * update = elementwise FLOORED mean (``sums // counts``); empty
      clusters keep their previous centroid.

    Scale shape matches kmeans_fit: per-batch (k × d) int partials, no
    shuffle; the driver holds k × d ints. Returns int64 (k, d)."""
    init = ds.sort(id_col).limit(k).to_pandas()
    if len(init) == 0:
        raise ValueError("kmeans_int_fit: empty input (no vectors to "
                         "seed centroids from)")
    cents = np.floor(np.stack(init[vec_col].to_numpy())
                     .astype(np.float64) * quant).astype(np.int64)

    for _ in range(iters):
        cu = cents

        def partial(t: pa.Table) -> pa.Table:
            x = np.floor(_stack(t[vec_col]).astype(np.float64)
                         * quant).astype(np.int64)
            assign = np.argmax(x @ cu.T, axis=1)  # ties → lowest index
            sums = np.zeros_like(cu)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=len(cu)).astype(np.int64)
            nz = np.flatnonzero(counts)
            return pa.table({
                "c": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz]),
                "s": pa.array([row.tobytes() for row in sums[nz]],
                              type=pa.binary()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for c, n, sb in zip(parts["c"], parts["n"], parts["s"]):
            counts[c] += n
            sums[c] += np.frombuffer(sb, np.int64)
        new = cents.copy()
        nz = counts > 0
        new[nz] = np.floor_divide(sums[nz], counts[nz, None])
        cents = new
    return cents


def kmeans_int_assign(ds, centroids: np.ndarray, vec_col: str,
                      id_col: str, quant: int = 128):
    """Final integer assignment pass → (id, cluster:int64, score:int64)."""
    cu = centroids

    def fn(t: pa.Table) -> pa.Table:
        x = np.floor(_stack(t[vec_col]).astype(np.float64)
                     * quant).astype(np.int64)
        scores = x @ cu.T
        assign = np.argmax(scores, axis=1)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(assign.astype(np.int64)),
            "score": pa.array(scores[np.arange(len(assign)), assign]
                              .astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
