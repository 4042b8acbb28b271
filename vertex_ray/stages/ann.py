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


def ivf_int_topk_exact(ds, vec_col: str, id_col: str, *,
                       n_centroids: int = 6, iters: int = 2,
                       nq: int = 3, nprobe: int = 2, topk: int = 5,
                       quant: int = 128):
    """INTEGER-exact IVF top-k — the oracle-able twin of :func:`ivf_topk`
    (whose float cosines and sampled codebook are unhashable): the coarse
    quantizer is stages/cluster.kmeans_int_fit (deterministic integer
    Lloyd), probes are the ``nprobe`` best centroids by integer dot
    (ties → lowest cluster), candidates are ranked by exact integer dot
    with ties → lowest vec_id. Queries are the ``nq`` smallest-id
    vectors. Every quantity is int64 with order-free reduction, so a SQL
    mirror recomputes the index AND the search bit-for-bit.

    Scale shape matches ivf_topk: broadcast centroids/queries/probes,
    per-batch candidate scoring with per-batch top-k partials, one tiny
    per-query merge."""
    from vertex_ray.stages.cluster import kmeans_int_fit

    cents = kmeans_int_fit(ds, vec_col, id_col, k=n_centroids,
                           iters=iters, quant=quant)
    qinit = ds.sort(id_col).limit(nq).to_pandas()
    qids = qinit[id_col].to_numpy()
    qx = np.floor(np.stack(qinit[vec_col].to_numpy())
                  .astype(np.float64) * quant).astype(np.int64)
    qscore = qx @ cents.T  # (nq, n_centroids) int64
    probes = np.stack([
        np.lexsort((np.arange(n_centroids), -qscore[qi]))[:nprobe]
        for qi in range(len(qids))])
    cref = ray.put(cents)
    qref = ray.put(qx)
    pref = ray.put(probes)
    qmap = {i: int(v) for i, v in enumerate(qids)}

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        qm = ray.get(qref)
        pr = ray.get(pref)
        x = np.floor(_stack(t[vec_col]).astype(np.float64)
                     * quant).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(x @ c.T, axis=1)  # ties → lowest cluster
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qm)):
            mask = np.isin(assign, pr[qi])
            if not mask.any():
                continue
            sc = x[mask] @ qm[qi]
            vid = ids[mask]
            order = np.lexsort((vid, -sc))[:topk]  # per-batch partial
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_v.append(vid[order])
            out_s.append(sc[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(topk).reset_index(drop=True)
        g["query_vec_id"] = np.full(len(g), qmap[int(g["query_id"].iloc[0])],
                                    dtype=np.int64)
        return g[["query_vec_id", "vec_id", "score"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(merge, batch_format="pandas"))


def lsh_signatures_md5(ds, vec_col: str, id_col: str, *,
                       n_planes: int = 16, dim: int = 64,
                       quant: int = 128):
    """Random-hyperplane LSH signatures with an AUDITABLE plane matrix —
    the oracle-able twin of the rng-seeded projection LSH
    (dedup_near.embedding_near_pairs_lsh): plane sign s[i][j] = ±1 from
    the parity of ``md5("i:j")`` (stages/dedup_near md5 family, j
    1-based to match SQL's generate_subscripts), projections are integer
    dots over ``floor(x·quant)``, and bit i of the signature is
    ``proj_i >= 0``. Deterministic, integer-exact, SQL-recomputable.

    Output: (id, signature int64). Same-signature ids are the LSH
    bucket candidates (cosine-similar vectors collide with the standard
    random-hyperplane probability 1 - θ/π per plane)."""
    from vertex_ray.stages.dedup_near import _md5_hash64

    keys = np.array([f"{i}:{j + 1}" for i in range(n_planes)
                     for j in range(dim)], dtype=object)
    sgn = np.where((_md5_hash64(keys) % np.uint64(2)).astype(np.int64)
                   == 1, 1, -1).reshape(n_planes, dim).astype(np.int64)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    sref = ray.put(sgn)

    def fn(t: pa.Table) -> pa.Table:
        s = ray.get(sref)
        x = np.floor(_stack(t[vec_col]).astype(np.float64)
                     * quant).astype(np.int64)
        if x.shape[1] != dim:
            raise ValueError(
                f"lsh_signatures_md5: expected dim {dim}, got {x.shape[1]}")
        proj = x @ s.T  # (n, n_planes) int64
        sig = ((proj >= 0).astype(np.int64) * weights).sum(axis=1)
        return pa.table({
            id_col: t[id_col],
            "signature": pa.array(sig, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def lsh_near_pairs_md5(ds, vec_col: str, id_col: str, *,
                       n_planes: int = 16, n_bands: int = 4,
                       dim: int = 64, quant: int = 128,
                       threshold_num: int = 9, threshold_den: int = 20,
                       max_bucket: int = 100_000):
    """LSH-bucketed near-duplicate pairs with an AUDITABLE candidate set
    — the oracle-able twin of dedup_near.embedding_near_pairs_lsh (whose
    rng-seeded planes and float cosine are unhashable): md5-parity plane
    signatures (:func:`lsh_signatures_md5` arithmetic) split into
    ``n_bands`` bands; ids sharing a band value become candidates; every
    candidate pair is verified with an INTEGER-exact cosine test over
    ``floor(x·quant)`` coordinates —

        dot ≥ 0  AND  den²·dot² ≥ num²·‖a‖²·‖b‖²

    (θ = num/den, here 9/20 = the 0.45 float-family threshold as an
    exact rational). Scale shape: one flat_map to band rows (the
    quantized vector rides along — no join), ONE groupby(band, value)
    exchange with capped buckets, pair dedup by groupby-first. Output
    (a, b, dot) with a < b; deterministic, SQL-recomputable end to end.
    """
    from vertex_ray.stages.dedup_near import _md5_hash64

    if n_planes % n_bands:
        raise ValueError("n_planes must divide into equal bands")
    r = n_planes // n_bands
    keys = np.array([f"{i}:{j + 1}" for i in range(n_planes)
                     for j in range(dim)], dtype=object)
    sgn = np.where((_md5_hash64(keys) % np.uint64(2)).astype(np.int64)
                   == 1, 1, -1).reshape(n_planes, dim).astype(np.int64)
    weights = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
    sref = ray.put(sgn)

    def band_rows(t: pa.Table) -> pa.Table:
        s = ray.get(sref)
        x = np.floor(_stack(t[vec_col]).astype(np.float64)
                     * quant).astype(np.int64)
        sig = (((x @ s.T) >= 0).astype(np.int64) * weights).sum(axis=1)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.int64((1 << r) - 1)
        bands = np.arange(n_bands, dtype=np.int64)
        vals = (sig[:, None] >> (bands[None, :] * r)) & mask
        n = len(ids)
        return pa.table({
            id_col: pa.array(np.repeat(ids, n_bands)),
            "band": pa.array(np.tile(bands, n)),
            "bval": pa.array(vals.reshape(-1)),
            "xq": pa.array(list(np.repeat(x, n_bands, axis=0))),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col)
        if len(g) > max_bucket:
            import logging

            logging.getLogger("vertex_ray.ann").warning(
                "lsh band bucket truncated: %d > max_bucket=%d",
                len(g), max_bucket)
            g = g.head(max_bucket)
        empty = pd.DataFrame({
            "a": pd.array([], dtype="int64"),
            "b": pd.array([], dtype="int64"),
            "dot": pd.array([], dtype="int64"),
        })
        if len(g) < 2:
            return empty
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order]
        x = np.stack(g["xq"].to_numpy())[order].astype(np.int64)
        dots = x @ x.T
        nrm = np.diag(dots)
        ia, ib = np.triu_indices(len(ids), k=1)
        d = dots[ia, ib]
        ok = (d >= 0) & (threshold_den ** 2 * d * d
                         >= threshold_num ** 2 * nrm[ia] * nrm[ib])
        if not ok.any():
            return empty
        return pd.DataFrame({
            "a": ids[ia[ok]].astype(np.int64),
            "b": ids[ib[ok]].astype(np.int64),
            "dot": d[ok].astype(np.int64),
        })

    out = ds.map_batches(band_rows, batch_format="pyarrow") \
        .groupby(["band", "bval"]) \
        .map_groups(pairs, batch_format="pandas")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return out.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


def pq_int_fit(ds, vec_col: str, id_col: str, *, m: int = 4,
               k: int = 4, iters: int = 2, quant: int = 128):
    """INTEGER-exact product quantization codebooks — the oracle-able
    twin of :func:`pq_fit` (whose sampled float k-means is unhashable):
    the vector splits into ``m`` equal subspaces and each runs the
    integer-Lloyd recipe of stages/cluster.kmeans_int_fit (k-smallest-id
    init on the SUBvector, max-integer-dot assignment with lowest-index
    ties, floored-mean updates, empty keeps previous). All m subspaces
    train in the same streaming passes. Returns int64 (m, k, sub_d)."""
    init = ds.sort(id_col).limit(k).to_pandas()
    if len(init) == 0:
        raise ValueError("pq_int_fit: empty input")
    x0 = np.floor(np.stack(init[vec_col].to_numpy())
                  .astype(np.float64) * quant).astype(np.int64)
    d = x0.shape[1]
    if d % m:
        raise ValueError(f"pq_int_fit: dim {d} not divisible by m={m}")
    sd = d // m
    cents = np.stack([x0[:, s * sd:(s + 1) * sd] for s in range(m)])

    for _ in range(iters):
        cu = cents  # (m, k, sd)

        def partial(t: pa.Table) -> pa.Table:
            x = np.floor(_stack(t[vec_col]).astype(np.float64)
                         * quant).astype(np.int64)
            out_m, out_c, out_n, out_s = [], [], [], []
            for s in range(m):
                xs = x[:, s * sd:(s + 1) * sd]
                assign = np.argmax(xs @ cu[s].T, axis=1)
                sums = np.zeros((k, sd), dtype=np.int64)
                np.add.at(sums, assign, xs)
                counts = np.bincount(assign, minlength=k).astype(np.int64)
                nz = np.flatnonzero(counts)
                out_m.append(np.full(len(nz), s, dtype=np.int64))
                out_c.append(nz.astype(np.int64))
                out_n.append(counts[nz])
                out_s.extend(row.tobytes() for row in sums[nz])
            return pa.table({
                "m": pa.array(np.concatenate(out_m)),
                "c": pa.array(np.concatenate(out_c)),
                "n": pa.array(np.concatenate(out_n)),
                "s": pa.array(out_s, type=pa.binary()),
            })

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((m, k, sd), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for mi, c, n, sb in zip(parts["m"], parts["c"], parts["n"],
                                parts["s"]):
            counts[mi, c] += n
            sums[mi, c] += np.frombuffer(sb, np.int64)
        new = cents.copy()
        for s in range(m):
            nz = counts[s] > 0
            new[s][nz] = np.floor_divide(sums[s][nz], counts[s][nz, None])
        cents = new
    return cents


def pq_int_topk(ds, codebooks: np.ndarray, vec_col: str, id_col: str,
                *, nq: int = 3, topk: int = 5, quant: int = 128):
    """Integer ADC search over pq_int codebooks: encode each vector to
    its per-subspace code (max integer dot, lowest-index ties), score a
    query by Σ_s (query subvector · codeword) — all int64 — and return
    the per-query top-k with vec_id ties ascending. Output
    (query_vec_id, vec_id, score)."""
    mm, k, sd = codebooks.shape
    qinit = ds.sort(id_col).limit(nq).to_pandas()
    qids = qinit[id_col].to_numpy()
    qx = np.floor(np.stack(qinit[vec_col].to_numpy())
                  .astype(np.float64) * quant).astype(np.int64)
    # ADC lookup tables: (nq, m, k) integer partial scores
    lut = np.stack([
        np.stack([qx[qi, s * sd:(s + 1) * sd] @ codebooks[s].T
                  for s in range(mm)])
        for qi in range(len(qids))])
    cref = ray.put(codebooks)
    lref = ray.put(lut)
    qmap = {i: int(v) for i, v in enumerate(qids)}

    def partial(t: pa.Table) -> pa.Table:
        cb = ray.get(cref)
        lu = ray.get(lref)
        x = np.floor(_stack(t[vec_col]).astype(np.float64)
                     * quant).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        codes = np.stack([
            np.argmax(x[:, s * sd:(s + 1) * sd] @ cb[s].T, axis=1)
            for s in range(mm)], axis=1)  # (n, m)
        out_q, out_v, out_s = [], [], []
        for qi in range(lu.shape[0]):
            sc = np.zeros(len(ids), dtype=np.int64)
            for s in range(mm):
                sc += lu[qi, s][codes[:, s]]
            order = np.lexsort((ids, -sc))[:topk]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(sc[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(topk).reset_index(drop=True)
        g["query_vec_id"] = np.full(
            len(g), qmap[int(g["query_id"].iloc[0])], dtype=np.int64)
        return g[["query_vec_id", "vec_id", "score"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(merge, batch_format="pandas"))


def brute_force_topk_int(ds, queries: np.ndarray, query_ids: np.ndarray,
                         k: int, vec_col: str, id_col: str):
    """Exact INTEGER-dot top-k — the oracle-able twin of
    :func:`brute_force_topk` (float cosine is unhashable): int64 scores,
    deterministic (score DESC, id ASC) ordering, caller-supplied query
    ids. Same scale shape: broadcast query matrix, per-batch matmul
    partials, one tiny per-query merge."""
    q = np.asarray(queries, dtype=np.int64)
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((q, qids))

    def partial(t: pa.Table) -> pa.Table:
        qq, qi = ray.get(qref)
        vecs = _stack(t[vec_col]).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dots = qq @ vecs.T  # (nq, batch) int64
        kk = min(k, dots.shape[1])
        # per-batch top-k must apply the SAME (score DESC, vec_id ASC)
        # tie-break as the final merge — argpartition on score alone
        # would drop a lower-id tied candidate before the merge sees it
        out_q, out_v, out_s = [], [], []
        for r in range(len(qq)):
            order = np.lexsort((ids, -dots[r]))[:kk]
            out_q.append(np.full(kk, qi[r], dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(dots[r][order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s).astype(np.int64)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "score"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(merge, batch_format="pandas"))
