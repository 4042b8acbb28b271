"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k — the baseline. The query
  matrix is broadcast ONCE via ``ray.put``; each batch does one
  float64 matmul against it and emits per-batch top-k partials; a final
  tiny per-query merge picks the global top-k. No full shuffle — the
  exchange is only (num_queries × k × batches) partial rows.
- ``ivf_topk``: the scale path — IVF-style bucketing: k-means-lite
  centroids (sampled, deterministic), each vector assigned to its nearest
  centroid at index time; queries probe only ``nprobe`` nearest buckets.
  Bucket assignment is the partitioning assumption: recall < 1 when the
  true neighbor lives in an unprobed bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _stack(col) -> np.ndarray:
    return np.stack(col.to_pandas().to_numpy()).astype(np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(ds, queries: np.ndarray, k: int, vec_col: str, id_col: str):
    """Exact cosine top-k for each query row. Returns Dataset of
    (query_id, rank, vec_id, cosine)."""
    qref = ray.put(_unit(np.asarray(queries, dtype=np.float64)))

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        vecs = _unit(_stack(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cos = q @ vecs.T  # (nq, batch)
        kk = min(k, cos.shape[1])
        top = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
        nq = len(q)
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        vid = ids[top.reshape(-1)]
        score = np.take_along_axis(cos, top, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(vid),
                "cosine": pa.array(score, type=pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def train_centroids(ds, vec_col: str, n_centroids: int, sample_rows: int = 2048,
                    iters: int = 5, seed: int = 13) -> np.ndarray:
    """k-means-lite on a driver-side sample (deterministic). The sample is
    small by construction; the full data never leaves the cluster."""
    df = ds.limit(sample_rows).to_pandas()
    if len(df) == 0:
        raise ValueError(
            f"train_centroids: input dataset is empty — no rows to sample "
            f"a centroid seed for {vec_col!r} from")
    sample = _stack(pa.Table.from_pandas(df)[vec_col])
    rng = np.random.default_rng(seed)
    k = min(n_centroids, len(sample))
    # k-means++ seeding (deterministic): D²-weighted picks avoid the
    # two-seeds-in-one-cluster local minimum plain random choice hits
    u = _unit(sample)
    picks = [int(rng.integers(len(sample)))]
    d2 = np.full(len(sample), np.inf)
    for _ in range(1, k):
        d2 = np.minimum(d2, 1.0 - u @ u[picks[-1]])
        tot = d2.sum()
        if tot <= 0:
            picks.append(int(rng.integers(len(sample))))
            continue
        picks.append(int(rng.choice(len(sample), p=np.maximum(d2, 0) / tot)))
    cents = sample[np.array(picks)]
    for _ in range(iters):
        assign = np.argmax(_unit(sample) @ _unit(cents).T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_topk(ds, queries: np.ndarray, k: int, vec_col: str, id_col: str,
             n_centroids: int = 16, nprobe: int = 4):
    """IVF-bucketed approximate top-k: index-side bucket assignment via
    broadcast centroids, query-side probes of the nprobe nearest buckets."""
    cents = train_centroids(ds, vec_col, n_centroids)
    cref = ray.put(_unit(cents))
    q = _unit(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ _unit(cents).T), axis=1)[:, :nprobe]  # (nq, nprobe)
    qref = ray.put(q)
    pref = ray.put(probes)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        qm = ray.get(qref)
        pr = ray.get(pref)
        vecs = _unit(_stack(t[vec_col]))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(vecs @ c.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qm)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            cos = vecs[mask] @ qm[qi]
            kk = min(k, len(cos))
            top = np.argpartition(-cos, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_v.append(ids[mask][top])
            out_s.append(cos[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )


def pq_fit(ds, vec_col: str, *, m: int = 8, k: int = 256,
           sample_rows: int = 4096, iters: int = 8,
           seed: int = 13) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, TPAMI "Product
    Quantization for Nearest Neighbor Search"): split the (unit-normalized)
    embedding into ``m`` subvectors and train an L2 k-means codebook of
    ``k`` centroids per subspace on a bounded driver-side sample
    (deterministic seeding, same sampling contract as train_centroids).
    Returns float64 codebooks of shape (m, k, d/m).

    The scale story: PQ codes store m bytes per vector (k ≤ 256) instead
    of 4·d — for d=64 float32 that is a 32× memory/IO reduction, which is
    what makes a 100 TB embedding store searchable from RAM."""
    df = ds.limit(sample_rows).to_pandas()
    if len(df) == 0:
        raise ValueError(
            f"pq_fit: input dataset is empty — nothing to sample a "
            f"codebook for {vec_col!r} from")
    sample = _unit(_stack(pa.Table.from_pandas(df)[vec_col]))
    n, d = sample.shape
    if d % m:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    sub = d // m
    kk = min(k, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, kk, sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        # k-means++ seeding under L2 in the subspace
        picks = [int(rng.integers(n))]
        d2 = np.full(n, np.inf)
        for _ in range(1, kk):
            d2 = np.minimum(d2, ((x - x[picks[-1]]) ** 2).sum(axis=1))
            tot = d2.sum()
            picks.append(
                int(rng.integers(n)) if tot <= 0 else
                int(rng.choice(n, p=np.maximum(d2, 0) / tot)))
        cents = x[np.array(picks)].copy()
        for _ in range(iters):
            d2m = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2m, axis=1)
            for c in range(kk):
                msk = assign == c
                if msk.any():
                    cents[c] = x[msk].mean(axis=0)
        books[j] = cents
    return books


def pq_encode(ds, codebooks: np.ndarray, vec_col: str, id_col: str):
    """Stateless encode pass: each (unit-normalized) vector → m uint8
    codes (nearest codebook centroid per subspace, L2). Returns a Dataset
    of (id, codes: list<uint8>) — the compressed index. The codebooks are
    broadcast once via ray.put and read zero-copy per task."""
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        books = ray.get(bref)
        m, kk, sub = books.shape
        vecs = _unit(_stack(t[vec_col]))
        n = len(vecs)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            x = vecs[:, j * sub:(j + 1) * sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; only the last two terms
            # order the argmin, so one matmul per subspace
            dots = x @ books[j].T
            cn = (books[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmin(cn[None, :] - 2.0 * dots, axis=1)
        return pa.table({
            id_col: t[id_col],
            "codes": pa.array(list(codes), type=pa.list_(pa.uint8())),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def pq_topk(codes_ds, codebooks: np.ndarray, queries: np.ndarray, k: int,
            id_col: str):
    """Approximate cosine top-k over PQ codes via asymmetric distance
    computation (ADC): per query, ONE lookup table of shape (m, k) holds
    the exact inner products between the raw (unit) query subvectors and
    every codebook centroid; a vector's approximate cosine is the sum of
    m table lookups — no decode, no float vectors in the index. Same
    partial-top-k + tiny per-query merge shape as brute_force_topk.
    Returns (query_id, rank, vec_id, score)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = books.shape
    q = _unit(np.asarray(queries, dtype=np.float64))
    # LUT[qi, j, c] = <q_sub, centroid>
    lut = np.einsum("qjs,jcs->qjc",
                    q.reshape(len(q), m, sub), books)
    lref = ray.put(lut)

    def partial(t: pa.Table) -> pa.Table:
        lu = ray.get(lref)
        nq = lu.shape[0]
        codes_col = t["codes"].combine_chunks()
        arr = codes_col.chunk(0) if isinstance(codes_col, pa.ChunkedArray) \
            else codes_col
        flat = arr.values.to_numpy(zero_copy_only=False)
        codes = flat.reshape(-1, m)
        n = len(codes)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        score = np.zeros((nq, n), dtype=np.float64)
        for j in range(m):
            score += lu[:, j, :][:, codes[:, j]]
        kk2 = min(k, n)
        top = np.argpartition(-score, kk2 - 1, axis=1)[:, :kk2]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk2)
        vid = ids[top.reshape(-1)]
        sc = np.take_along_axis(score, top, axis=1).reshape(-1)
        return pa.table({
            "query_id": pa.array(qid),
            "vec_id": pa.array(vid),
            "score": pa.array(sc, type=pa.float64()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(k).reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "score"]]

    return (
        codes_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge, batch_format="pandas")
    )
