"""Near-duplicate detection at scale: MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Ray-Data-first shapes (ray_guide "Aggregation at scale"):
- shingle → minhash per batch (vectorized numpy, one matrix op per batch)
- explode to (band_id, band_hash, doc_id) rows
- ``groupby([band_id, band_hash])`` → candidate groups (the ONLY shuffle)
- verify candidate pairs with exact n-gram Jaccard inside the group
- connected components via iterative min-label propagation (a few tiny
  groupby rounds), NOT a driver-side union-find over the full data.

The LSH parameters (num_perm, bands) trade recall for shuffle volume;
every function documents its partitioning assumption.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_SHINGLE_RE = re.compile(r"\S+")

# deterministic 64-bit universal-hash parameters (seeded once per process)
_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def shingles(text: str, k: int = 3) -> set:
    toks = _SHINGLE_RE.findall((text or "").lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _hash_shingles(sh: set) -> np.ndarray:
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
            for s in sh
        ),
        dtype=np.uint64,
        count=len(sh),
    )


def minhash_signature(text: str, num_perm: int = 64, k: int = 3, seed: int = 7) -> np.ndarray:
    """num_perm-wide MinHash signature (one matrix op per doc)."""
    a, b = _perm_params(num_perm, seed)
    h = _hash_shingles(shingles(text, k))
    if len(h) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    # (a*h + b) mod p per permutation; outer product then min over shingles
    vals = (np.multiply.outer(a, h) + b[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_bands_op(
    text_col: str, id_col: str, num_perm: int = 64, bands: int = 16, k: int = 3
):
    """map_batches body: docs → (doc_id, band_id, band_hash) rows for the
    LSH bucket groupby. rows_per_band = num_perm // bands."""
    r = num_perm // bands

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.stack(
            [minhash_signature(s, num_perm, k) for s in texts]
        ) if n else np.zeros((0, num_perm), dtype=np.uint64)
        # fold each band's r values into one uint64 band hash
        band_hash = np.zeros((n, bands), dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * r : (bi + 1) * r]
            h = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                h = h * np.uint64(1099511628211) ^ seg[:, j]
            band_hash[:, bi] = h
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, bands)),
                "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
                "band_hash": pa.array(band_hash.reshape(-1).view(np.int64)),
            }
        )

    return fn


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_pairs(ds, text_col: str, id_col: str, *,
                      num_perm: int = 64, bands: int = 16, k: int = 3,
                      verify_threshold: float = 0.7, texts_ref=None):
    """Candidate pairs via LSH banding, verified with exact Jaccard.

    texts_ref: ray.put({doc_id: text}) broadcast for verification (small
    corpora); at 100 TB scale verification joins text back by doc_id via a
    bucket join instead — documented assumption: the id→text map fits the
    object store here.
    Returns a Dataset of (a, b, jaccard) with a < b, deduplicated.
    """
    import ray

    band_rows = ds.map_batches(
        minhash_bands_op(text_col, id_col, num_perm, bands, k), batch_format="pyarrow"
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = (
        band_rows.groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
    )

    def verify(t: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        jac = np.array([jaccard(texts[x], texts[y], k) for x, y in zip(a, b)])
        keep = jac >= verify_threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    verified = cand.map_batches(verify, batch_format="pyarrow")
    # same pair can surface from several bands → exact dedup on (a, b)
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return verified.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over token features (weighted bit-vote)."""
    import hashlib

    toks = _SHINGLE_RE.findall((text or "").lower())
    if not toks:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in toks:
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        votes += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def simhash_op(text_col: str, id_col: str):
    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        hs = np.fromiter((simhash64(s) for s in texts), dtype=np.uint64, count=len(texts))
        return pa.table(
            {
                id_col: t[id_col],
                "simhash": pa.array(hs.view(np.int64)),
            }
        )

    return fn


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


def simhash_near_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3):
    """Near-dup pairs by SimHash: block on 4 16-bit chunks (a pair within
    hamming distance ≤3 of 64 bits shares at least one exact 16-bit chunk
    — pigeonhole), groupby chunk value, verify hamming inside the group."""
    sim = ds.map_batches(simhash_op(text_col, id_col), batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = t["simhash"].to_numpy().view(np.uint64)
        n = len(ids)
        chunk_ids = np.tile(np.arange(4, dtype=np.int32), n)
        chunk_vals = np.empty(4 * n, dtype=np.int64)
        for c in range(4):
            chunk_vals[c::4] = ((hs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).view(
                np.int64
            )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, 4)),
                "simhash": pa.array(np.repeat(hs.view(np.int64), 4)),
                "chunk_id": pa.array(chunk_ids),
                "chunk_val": pa.array(chunk_vals),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates(id_col).sort_values(id_col)
        ids = rows[id_col].to_numpy()
        hs = rows["simhash"].to_numpy()
        a, b, d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = hamming64(hs[i], hs[j])
                if h <= max_hamming:
                    a.append(ids[i]); b.append(ids[j]); d.append(h)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    cand = (
        sim.map_batches(explode, batch_format="pyarrow")
        .groupby(["chunk_id", "chunk_val"])
        .map_groups(pairs, batch_format="pandas")
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_pairs(ds, vec_col: str, id_col: str, threshold: float = 0.95,
                         n_clusters: int = 8):
    """Embedding-cosine near-dup: LSH-bucket by the sign pattern of a few
    random projections (deterministic seed), then exact cosine within each
    bucket. Pairs crossing bucket boundaries are missed — the recall/
    shuffle tradeoff documented for LSH; raise n_projections for recall."""

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_pandas().to_numpy())
        rng = np.random.default_rng(11)
        proj = rng.standard_normal((vecs.shape[1], 3))
        signs = (vecs @ proj > 0).astype(np.int64)
        bucket = signs[:, 0] * 4 + signs[:, 1] * 2 + signs[:, 2]
        norm = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norm, 1e-12)
        return pa.table(
            {
                id_col: t[id_col],
                "bucket": pa.array(bucket),
                "unit": pa.array(list(unit.astype(np.float32))),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        unit = np.stack(g["unit"].to_numpy())
        cos = unit @ unit.T
        iu = np.triu_indices(len(ids), k=1)
        mask = cos[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][mask]],
                "b": ids[iu[1][mask]],
                "cosine": cos[iu][mask].astype(np.float64),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
