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
