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
import pyarrow.compute as pc

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


def _hash_strings(strs: np.ndarray) -> np.ndarray:
    """Vectorized deterministic 64-bit hash of an object array of strings
    (pandas' cython siphash with its fixed default key — stable across
    processes and runs)."""
    return pd.util.hash_array(strs, categorize=False).astype(np.uint64)


# odd 64-bit mixing constants for combining consecutive token hashes into
# one k-gram hash (no gram strings are ever materialized)
_GRAM_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63], dtype=np.uint64
)


def _gram_mix(k: int) -> np.ndarray:
    """First k odd 64-bit mixing constants: the 5 fixed ones above (kept
    verbatim so existing gram hashes are stable), extended deterministically
    by splitmix64 for larger window sizes (ngram_overlap_pairs k=8+)."""
    if k <= len(_GRAM_MIX):
        return _GRAM_MIX[:k]
    out = np.empty(k, dtype=np.uint64)
    out[: len(_GRAM_MIX)] = _GRAM_MIX
    x = _GRAM_MIX[-1]
    with np.errstate(over="ignore"):
        for j in range(len(_GRAM_MIX), k):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(2**64 - 1)
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[j] = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # force odd
    return out


def _gram_hashes(texts, k: int):
    """Per-doc DEDUPED k-gram hash sets for a whole batch: ONE Arrow
    lowercase+split pass, one vectorized token hash, grams combined
    arithmetically from consecutive token hashes, duplicates removed with
    one lexsort. Returns (flat uint64 gram hashes, per-doc counts)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(texts)
    arr = pa.array([t if isinstance(t, str) else ("" if t is None else str(t))
                    for t in texts], type=pa.string())
    lists = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    off = lists.offsets.to_numpy().astype(np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    ne_cum = np.zeros(len(nonempty) + 1, dtype=np.int64)
    np.cumsum(nonempty, out=ne_cum[1:])
    new_off = ne_cum[off]
    # dictionary-encode so the python-object string materialization and
    # the siphash touch only DISTINCT tokens (hash is per token value, so
    # the gram hashes are unchanged); occurrences are int32 code gathers
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False)
    hd = _hash_strings(denc.dictionary.to_numpy(zero_copy_only=False))
    h = hd[codes[nonempty]]
    counts = np.diff(new_off)
    total = len(h)
    doc_of = np.repeat(np.arange(n), counts)

    mix = _gram_mix(k)
    parts = []
    part_docs = []
    if total >= k:
        m = total - k + 1
        valid = doc_of[:m] == doc_of[k - 1:]
        g = h[:m] * mix[0]
        for j in range(1, k):
            g = g ^ (h[j : m + j] * mix[j])
        parts.append(g[valid])
        part_docs.append(doc_of[:m][valid])
    # short docs (0 < n_tok < k) contribute one gram over all their tokens
    # (uint64 wraparound is the intended mixing, hence the errstate guard)
    short = np.flatnonzero((counts > 0) & (counts < k))
    with np.errstate(over="ignore"):
        for d in short:
            hs = h[new_off[d] : new_off[d + 1]]
            g = np.uint64(0)
            for j, hv in enumerate(hs):
                g = g ^ (hv * mix[j])
            parts.append(np.array([g], dtype=np.uint64))
            part_docs.append(np.array([d], dtype=np.int64))
    if not parts:
        return np.zeros(0, dtype=np.uint64), np.zeros(n, dtype=np.int64)
    grams = np.concatenate(parts)
    gdoc = np.concatenate(part_docs)
    order = np.lexsort((grams, gdoc))
    grams, gdoc = grams[order], gdoc[order]
    first = np.ones(len(grams), dtype=bool)
    first[1:] = (gdoc[1:] != gdoc[:-1]) | (grams[1:] != grams[:-1])
    grams, gdoc = grams[first], gdoc[first]
    return grams, np.bincount(gdoc, minlength=n).astype(np.int64)


def minhash_signatures_batch(
    texts, num_perm: int = 64, k: int = 3, seed: int = 7, perm_chunk: int = 8
) -> np.ndarray:
    """(n_docs × num_perm) MinHash signatures for a whole batch with no
    per-doc Python loop: _gram_hashes builds every doc's deduped k-gram
    hash set in a few flat passes, then per-permutation-chunk
    (a·h + b) mod p with a segmented ``np.minimum.reduceat`` per doc.
    ``perm_chunk`` bounds the temporary to perm_chunk × total_grams × 8
    bytes."""
    a, b = _perm_params(num_perm, seed)
    h, counts = _gram_hashes(texts, k)
    sigs = np.zeros((len(texts), num_perm), dtype=np.uint64)
    if len(h) == 0:
        return sigs
    nz = counts > 0
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    starts = offsets[:-1][nz]
    # ONE reused (perm_chunk × total) buffer with in-place ops: fresh
    # ~100MB temporaries per chunk caused allocator page-fault storms
    # that dwarfed the arithmetic (same hazard as the round-1 malloc
    # finding); values are unchanged
    buf = np.empty((perm_chunk, len(h)), dtype=np.uint64)
    M = np.uint64(_MERSENNE)
    for c0 in range(0, num_perm, perm_chunk):
        rows = min(perm_chunk, num_perm - c0)
        v = buf[:rows]
        np.multiply(a[c0 : c0 + rows, None], h[None, :], out=v)
        v += b[c0 : c0 + rows, None]
        v %= M
        sigs[nz, c0 : c0 + rows] = np.minimum.reduceat(v, starts, axis=1).T
    return sigs


def minhash_signature(text: str, num_perm: int = 64, k: int = 3, seed: int = 7) -> np.ndarray:
    """num_perm-wide MinHash signature of one doc (test/spec convenience;
    the batch path is minhash_signatures_batch)."""
    return minhash_signatures_batch([text], num_perm, k, seed)[0]


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
        sigs = (
            minhash_signatures_batch(texts, num_perm, k)
            if n
            else np.zeros((0, num_perm), dtype=np.uint64)
        )
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
                      verify_threshold: float = 0.7, max_bucket: int = 2000,
                      join_buckets: int = 64):
    """Candidate pairs via LSH banding, verified with exact Jaccard.

    Fully distributed — no driver-side materialization at any size:
    candidate (a, b) pairs from the band groupby are joined back to the
    document text twice via the hash-partitioned ``stages/join.hash_join``
    (text never enters the band shuffle), then exact k-gram Jaccard runs
    per candidate pair.

    max_bucket caps the O(|bucket|²) pair expansion inside one band
    bucket: a degenerate bucket (identical boilerplate docs) is truncated
    to its first max_bucket doc_ids (sorted, deterministic) and logged —
    near-dups that common are better handled by exact dedup upstream.
    Returns a Dataset of (a, b, jaccard) with a < b, deduplicated.

    The band groupby and the pair dedup are hash-BUCKETED (one task per
    bucket of ~n_keys/join_buckets band-hashes / pairs, vectorized inner
    pandas groupby) rather than one Ray task per band bucket / per pair —
    the per-distinct-key map_groups form is task-overhead-bound at
    billions of keys (same shape as stages/dedup.dedup_exact).
    """
    from vertex_ray.stages.join import hash_join

    band_rows = ds.map_batches(
        minhash_bands_op(text_col, id_col, num_perm, bands, k), batch_format="pyarrow"
    )

    def add_band_bucket(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bi = t["band_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = bh * np.uint64(1000003) + bi
        return t.append_column(
            "__bucket", pa.array((mixed % np.uint64(join_buckets)).astype(np.int64))
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        empty = g["doc_id"].to_numpy()[:0]
        for _, sub in g.groupby(["band_id", "band_hash"], sort=False):
            ids = np.unique(sub["doc_id"].to_numpy())
            if len(ids) < 2:
                continue
            if len(ids) > max_bucket:
                import logging

                logging.getLogger("vertex_ray.dedup_near").warning(
                    "LSH band bucket truncated: %d > max_bucket=%d doc_ids "
                    "(band_id=%s); pair expansion capped",
                    len(ids), max_bucket, sub["band_id"].iloc[0],
                )
                ids = ids[:max_bucket]
            iu = np.triu_indices(len(ids), k=1)
            outs_a.append(ids[iu[0]])
            outs_b.append(ids[iu[1]])
        if not outs_a:
            # keep the id dtype on EMPTY outputs (an untyped empty frame
            # would poison Ray's schema union)
            return pd.DataFrame({"a": empty, "b": empty})
        return pd.DataFrame(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
        )

    cand = (
        band_rows.map_batches(add_band_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
    )

    # same pair can surface from several bands → dedup BEFORE the text
    # joins so each candidate is verified once
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        ha = pd.util.hash_array(t["a"].to_numpy(zero_copy_only=False))
        hb = pd.util.hash_array(t["b"].to_numpy(zero_copy_only=False))
        return t.append_column(
            "__bucket",
            pa.array(((ha ^ hb) % np.uint64(join_buckets)).astype(np.int64)),
        )

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    cand = (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
    )

    # candidate-id pre-filter: the verify joins must move only the texts of
    # docs that actually appear in a candidate pair, not the whole corpus
    # (pairs are typically a vanishing fraction of documents, so shipping
    # every text through TWO sort exchanges dominated wall time — measured
    # 180 of 211 s on a 33k-doc corpus with zero candidates). The candidate
    # id SET is bounded by 2·max_bucket·buckets, so it broadcasts; above
    # ``max_broadcast_ids`` fall back to the full co-partitioned join.
    import ray

    cand = cand.materialize()
    max_broadcast_ids = 2_000_000
    cand_ids_parts = [
        np.concatenate([b["a"].to_numpy(zero_copy_only=False),
                        b["b"].to_numpy(zero_copy_only=False)])
        for b in cand.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    cand_ids = (np.unique(np.concatenate(cand_ids_parts))
                if cand_ids_parts else np.array([], dtype=np.int64))
    texts_ds = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    if len(cand_ids) <= max_broadcast_ids:
        ids_ref = ray.put(cand_ids)

        def only_cand(t: pa.Table) -> pa.Table:
            ids = ray.get(ids_ref)
            k = t[id_col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(k, ids)))

        texts_ds = texts_ds.map_batches(only_cand, batch_format="pyarrow")
    with_a = hash_join(cand, texts_ds, "a", id_col, n_buckets=join_buckets)
    with_both = hash_join(
        with_a, texts_ds, "b", id_col, n_buckets=join_buckets, rsuffix="_b"
    )

    def verify(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        ta = t[text_col].to_numpy(zero_copy_only=False)
        tb = t[f"{text_col}_b"].to_numpy(zero_copy_only=False)
        n = len(a)
        # exact jaccard over HASHED k-gram sets: each UNIQUE doc in the
        # batch is shingled once via the vectorized _gram_hashes (grams
        # come back deduped and sorted per doc), then each pair is one
        # C-speed sorted intersect — the per-pair python `jaccard()`
        # (set-of-strings per doc PER PAIR) dominated wall time on long
        # docs. Distinct gram strings map to distinct 64-bit hashes
        # w.h.p., so the value equals string-set jaccard (and the SQL
        # mirror) up to a ~n²/2⁶⁴ collision probability.
        ids = np.concatenate([a, b])
        texts = np.concatenate([ta, tb])
        uids, first = np.unique(ids, return_index=True)
        inv = np.searchsorted(uids, ids)
        h, counts = _gram_hashes(texts[first], k)
        off = np.zeros(len(uids) + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        ia, ib = inv[:n], inv[n:]
        jac = np.empty(n, dtype=np.float64)
        for i in range(n):
            x, y = ia[i], ib[i]
            hx = h[off[x]: off[x + 1]]
            hy = h[off[y]: off[y + 1]]
            m = np.intersect1d(hx, hy, assume_unique=True).size
            denom = len(hx) + len(hy) - m
            # both-empty docs are identical by convention (jaccard())
            jac[i] = 1.0 if denom == 0 else m / denom
        keep = jac >= verify_threshold
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return with_both.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _md5_hash64(strs: np.ndarray) -> np.ndarray:
    """Audit-family 64-bit token hash: the LOW 8 md5 digest bytes,
    little-endian — bit-for-bit DuckDB's ``md5_number_lower``, so any SQL
    engine can recompute the hash (and therefore the whole SimHash) for
    auditing. One C md5 call per DISTINCT string in the batch (factorize
    first); slower than the siphash default, used by the SQL-oracled
    variants."""
    import hashlib

    codes, uniq = pd.factorize(strs, use_na_sentinel=False)
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(s).encode("utf-8")).digest()[8:], "little")
            for s in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return vals[codes]


_TOKEN_HASHERS = {"sip": _hash_strings, "md5": _md5_hash64}


def simhash64_batch(texts, hash_family: str = "sip") -> np.ndarray:
    """64-bit SimHash (weighted bit-vote over token features) for a whole
    batch: ONE vectorized hash over all tokens, bit expansion to an
    (n_tokens × 64) ±1 matrix, per-doc vote via segmented
    ``np.add.reduceat``.

    ``hash_family``: "sip" (default, fastest) or "md5" (SQL-recomputable,
    see :func:`_md5_hash64`) — the digest family is a deployment config
    knob, same contract either way."""
    tok_lists = [_SHINGLE_RE.findall((s or "").lower()) for s in texts]
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(texts))
    out = np.zeros(len(texts), dtype=np.uint64)
    total = int(counts.sum())
    if total == 0:
        return out
    flat = np.empty(total, dtype=object)
    pos = 0
    for lst in tok_lists:
        flat[pos : pos + len(lst)] = lst
        pos += len(lst)
    h = _TOKEN_HASHERS[hash_family](flat)
    shifts = np.arange(64, dtype=np.uint64)
    signs = (((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2) - 1
    nz = counts > 0
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    votes = np.add.reduceat(signs, offsets[:-1][nz], axis=0)
    bits = (votes > 0).astype(np.uint64)
    out[nz] = (bits << shifts).sum(axis=1, dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash of one doc (test/spec convenience)."""
    return int(simhash64_batch([text])[0])


def simhash_op(text_col: str, id_col: str, hash_family: str = "sip"):
    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        hs = simhash64_batch(texts, hash_family=hash_family)
        return pa.table(
            {
                id_col: t[id_col],
                "simhash": pa.array(hs.view(np.int64)),
            }
        )

    return fn


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


def simhash_near_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3,
                       max_bucket: int = 4000, hash_family: str = "sip"):
    """Near-dup pairs by SimHash: block on (max_hamming + 1) bit chunks —
    by pigeonhole, a pair within hamming distance ≤ max_hamming of 64 bits
    must share at least one chunk exactly — groupby chunk value, verify
    hamming inside the group. The chunk count is DERIVED from max_hamming
    so the blocking guarantee always covers the requested distance
    (max_hamming=3 → 4 × 16-bit chunks; 6 → 7 chunks of 10/9 bits).
    max_bucket caps the O(|bucket|²) verification in a degenerate chunk
    bucket (truncated deterministically and logged)."""
    n_chunks = max_hamming + 1
    widths = np.diff(np.linspace(0, 64, n_chunks + 1).astype(np.int64))
    starts_bits = np.zeros(n_chunks, dtype=np.uint64)
    starts_bits[1:] = np.cumsum(widths[:-1]).astype(np.uint64)
    masks = ((np.uint64(1) << widths.astype(np.uint64)) - np.uint64(1))

    sim = ds.map_batches(simhash_op(text_col, id_col, hash_family=hash_family),
                         batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hs = t["simhash"].to_numpy().view(np.uint64)
        n = len(ids)
        chunk_ids = np.tile(np.arange(n_chunks, dtype=np.int32), n)
        chunk_vals = np.empty(n_chunks * n, dtype=np.int64)
        for c in range(n_chunks):
            chunk_vals[c::n_chunks] = ((hs >> starts_bits[c]) & masks[c]).view(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, n_chunks)),
                "simhash": pa.array(np.repeat(hs.view(np.int64), n_chunks)),
                "chunk_id": pa.array(chunk_ids),
                "chunk_val": pa.array(chunk_vals),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates(id_col).sort_values(id_col)
        if len(rows) > max_bucket:
            import logging

            logging.getLogger("vertex_ray.dedup_near").warning(
                "SimHash chunk bucket truncated: %d > max_bucket=%d",
                len(rows), max_bucket,
            )
            rows = rows.head(max_bucket)
        ids = rows[id_col].to_numpy()
        hs = rows["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": ids[:0], "b": ids[:0], "hamming": np.zeros(0, dtype=np.int64)}
            )
        # vectorized pairwise hamming: byte-wise popcount LUT on the XOR
        iu = np.triu_indices(len(ids), k=1)
        x = hs[iu[0]] ^ hs[iu[1]]
        ham = _POPCNT8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {"a": ids[iu[0]][keep], "b": ids[iu[1]][keep], "hamming": ham[keep]}
        )

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


def _tile_cosine_fn(tile_refs, vec_col: str, id_col: str, threshold: float):
    """map_batches body for the exact all-pairs path: the tile ObjectRefs
    ride the closure and ray.get is zero-copy from the local plasma
    store; the task walks every tile sequentially — one float64 matmul
    per (batch × tile) cell, one tile resident at a time."""

    def fn(t: pa.Table) -> pa.Table:
        import ray

        vecs = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        outs_a, outs_b = [], []
        for tile_ref in tile_refs:
            tile: pa.Table = ray.get(tile_ref)
            tvecs = np.stack(
                tile[vec_col].to_pandas().to_numpy()).astype(np.float64)
            tile_unit = tvecs / np.maximum(
                np.linalg.norm(tvecs, axis=1, keepdims=True), 1e-12
            )
            tile_ids = tile[id_col].to_numpy(zero_copy_only=False)
            cos = unit @ tile_unit.T  # (batch, tile)
            bi, ti = np.nonzero(cos >= threshold)
            a, b = ids[bi], tile_ids[ti]
            keep = a < b  # self-pairs and order dups out
            outs_a.append(a[keep])
            outs_b.append(b[keep])
        return pa.table({"a": pa.array(np.concatenate(outs_a)),
                         "b": pa.array(np.concatenate(outs_b))})

    return fn


def embedding_near_pairs_exact(ds, vec_col: str, id_col: str,
                               threshold: float = 0.9):
    """EXACT embedding-cosine near-dup — the correctness baseline.

    Tiled all-pairs: the dataset is materialized once and every block
    becomes a broadcast tile; each batch TASK walks all tiles (ONE plan
    branch and O(blocks) tasks, not one dataset branch per tile — the
    former per-tile union built a B-way plan that grew with the input).
    Total compute is still O(N²) matmuls: at scale use
    embedding_near_pairs (centroid-bucketed) instead. `a < b` inside the
    cell makes each pair unique already; the final groupby-first is kept
    as a safety dedup for overlapping blocks."""
    mat = ds.materialize()
    refs = list(mat.to_arrow_refs())
    outs = mat.map_batches(
        _tile_cosine_fn(refs, vec_col, id_col, threshold),
        batch_format="pyarrow",
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return outs.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


def embedding_near_pairs(ds, vec_col: str, id_col: str, threshold: float = 0.9,
                         n_clusters: int = 16, n_probe: int = 2,
                         max_bucket: int = 100_000):
    """Embedding-cosine near-dup, the scale path: IVF-style bucketing.

    k-means-lite centroids from a BOUNDED driver-side sample (broadcast
    once), each vector assigned to its n_probe nearest centroids (multi-
    assignment catches pairs straddling a centroid boundary), exact cosine
    within each bucket, dedup on (a, b). Buckets hold ~N·n_probe/n_clusters
    vectors — size n_clusters so that fits a task. Recall < 1 only for
    pairs whose two vectors share no probed centroid; tests check recall
    against embedding_near_pairs_exact."""
    import ray

    from vertex_ray.stages.ann import _unit, train_centroids

    cents = _unit(train_centroids(ds, vec_col, n_clusters))
    cref = ray.put(cents)

    def bucketize(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vecs = np.stack(t[vec_col].to_pandas().to_numpy()).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        probe = min(n_probe, len(c))
        top = np.argsort(-(unit @ c.T), axis=1)[:, :probe]  # (n, probe)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, probe)),
                "bucket": pa.array(top.reshape(-1).astype(np.int64)),
                "unit": pa.array(list(np.repeat(unit.astype(np.float32), probe, axis=0))),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col)
        if len(g) > max_bucket:
            import logging

            logging.getLogger("vertex_ray.dedup_near").warning(
                "embedding bucket truncated: %d > max_bucket=%d", len(g), max_bucket
            )
            g = g.head(max_bucket)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0]})
        unit = np.stack(g["unit"].to_numpy()).astype(np.float64)
        cos = unit @ unit.T
        iu = np.triu_indices(len(ids), k=1)
        mask = cos[iu] >= threshold
        a, b = ids[iu[0][mask]], ids[iu[1][mask]]
        swap = a > b
        a[swap], b[swap] = b[swap], a[swap]
        return pd.DataFrame({"a": a, "b": b})

    cand = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (the non-approximate member of the dedup family)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds, text_col: str, id_col: str, *, k: int = 3,
                        threshold: float = 0.7, max_posting: int = 1000,
                        n_buckets: int = 64,
                        _overlap_min: int | None = None):
    """EXACT k-gram Jaccard near-duplicate pairs — the ground-truth member
    of the dedup family (exact hash / MinHash+LSH / SimHash / embedding);
    it doubles as the recall oracle for the approximate variants and is
    itself SQL-oracled (op_queries.SQL_NGRAM_JACCARD_DOCS).

    Shape (2 bounded shuffles, text never leaves stage 1, no driver state):
      1. ``map_batches``: per-doc DEDUPED k-gram hash sets via
         ``_gram_hashes`` (one vectorized Arrow+numpy pass per batch) →
         exploded (gram, doc_id, size) rows, hash-bucketed by gram.
      2. ``groupby(gram-bucket)``: ONE pandas self-merge per bucket builds
         within-gram pairs in C, then a partial combiner pre-aggregates
         per-pair intersection counts BEFORE the second exchange.
         ``max_posting`` caps the O(|posting list|²) blowup of ubiquitous
         grams (a gram shared by that many docs carries no similarity
         signal; truncation is logged).
      3. ``groupby(pair-bucket)``: sum partial counts, finish
         jaccard = inter / (|A| + |B| - inter), filter ≥ threshold.

    Partitioning assumptions: per-bucket rows ≈ total_grams / n_buckets
    must fit a worker heap (size n_buckets up with data); exactness is
    modulo 64-bit gram-hash collisions (~n²/2⁶⁴) and the max_posting cap.
    Per-doc set semantics (incl. the <k-token single-shingle case) match
    ``shingles()`` / the minhash path.
    """
    import logging

    log = logging.getLogger("vertex_ray.dedup_near")

    def explode(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h, counts = _gram_hashes(texts, k)
        rep = np.repeat(np.arange(len(texts)), counts)
        return pa.table(
            {
                "gram": pa.array(h.view(np.int64)),
                "doc_id": pa.array(ids[rep]),
                "size": pa.array(counts[rep]),
                "gb": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        # cap ubiquitous grams' posting lists (deterministic: keep the
        # smallest doc_ids) before the quadratic self-merge
        g = g.sort_values(["gram", "doc_id"], kind="stable")
        capped = g.groupby("gram", sort=False).head(max_posting)
        if len(capped) < len(g):
            log.warning(
                "ngram_jaccard: %d posting rows truncated (max_posting=%d)",
                len(g) - len(capped), max_posting,
            )
        m = capped.merge(capped, on="gram", suffixes=("", "_b"))
        m = m[m["doc_id"] < m["doc_id_b"]]
        if not len(m):
            return pd.DataFrame(
                {"a": m["doc_id"], "b": m["doc_id_b"],
                 "inter": np.zeros(0, dtype=np.int64),
                 "sa": np.zeros(0, dtype=np.int64),
                 "sb": np.zeros(0, dtype=np.int64)}
            )
        gp = (
            m.groupby(["doc_id", "doc_id_b"], sort=False)
            .agg(inter=("gram", "size"), sa=("size", "first"), sb=("size_b", "first"))
            .reset_index()
            .rename(columns={"doc_id": "a", "doc_id_b": "b"})
        )
        gp["inter"] = gp["inter"].astype(np.int64)
        return gp

    def pair_bucket(t: pa.Table) -> pa.Table:
        pb = (
            pd.util.hash_array(t["a"].to_numpy(zero_copy_only=False))
            ^ pd.util.hash_array(t["b"].to_numpy(zero_copy_only=False))
        ) % np.uint64(n_buckets)
        return t.append_column("pb", pa.array(pb.astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        gp = (
            g.groupby(["a", "b"], sort=False)
            .agg(inter=("inter", "sum"), sa=("sa", "first"), sb=("sb", "first"))
            .reset_index()
        )
        if _overlap_min is not None:
            # overlap mode (ngram_overlap_pairs): shared-window count
            keep = gp["inter"].to_numpy() >= _overlap_min
            out = gp.loc[keep, ["a", "b"]].copy()
            out["n_shared"] = gp.loc[keep, "inter"].astype(np.int64)
            return out
        jac = gp["inter"].to_numpy(dtype=np.float64) / (
            gp["sa"].to_numpy() + gp["sb"].to_numpy() - gp["inter"].to_numpy()
        )
        keep = jac >= threshold
        out = gp.loc[keep, ["a", "b"]].copy()
        out["jaccard"] = jac[keep]
        return out

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(pairs_partial, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(finish, batch_format="pandas")
    )


def ngram_overlap_pairs(ds, text_col: str, id_col: str, *, k: int = 8,
                        min_shared: int = 1, max_posting: int = 1000,
                        n_buckets: int = 64):
    """Exact-substring duplication pairs (Lee et al. 2022,
    arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    Better"): doc pairs sharing at least ``min_shared`` DISTINCT exact
    k-token windows, with the shared-window count. Where the Jaccard
    variant measures whole-doc similarity, this catches long verbatim
    overlap between otherwise-different docs (boilerplate, quotations,
    license blocks) — the duplication that most inflates LM memorization.

    Same two-bounded-shuffle shape as :func:`ngram_jaccard_pairs`
    (k-gram hash explode → within-gram pair partials, posting lists
    capped at ``max_posting`` → per-pair sum); exactness modulo 64-bit
    gram-hash collisions and the cap. Docs shorter than k tokens
    contribute one whole-doc gram (so short exact dups still pair);
    empty docs contribute nothing."""
    return ngram_jaccard_pairs(
        ds, text_col, id_col, k=k, threshold=0.0,
        max_posting=max_posting, n_buckets=n_buckets,
        _overlap_min=min_shared)


def semantic_dedup(ds, vec_col: str, id_col: str, *, k: int = 8,
                   iters: int = 4, threshold: float = 0.9, seed: int = 13,
                   assign_out: str | None = None):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    removal via embedding clustering. (1) fit spherical k-means
    (stages/cluster.kmeans_fit — deterministic init, streaming Lloyd
    passes, no shuffle), (2) assign every vector to its centroid, (3)
    within each cluster compute pairwise cosines and KEEP, of every
    near-dup pair, the member FARTHER from the centroid (the paper's
    low-centroid-similarity tie: it preserves the diverse tail), breaking
    exact centroid-cosine ties by smaller id. Emits
    ``(id, cluster, cosine, keep)`` for every input vector.

    Deterministic and order-free: the drop rule for x is "exists a
    same-cluster y with cos(x, y) >= threshold and (y.centroid_cosine,
    y.id) < (x.centroid_cosine, x.id)" — a pure pairwise predicate, no
    greedy sweep order.

    Scale shape: ONE groupby(cluster) exchange; each cluster is one
    vectorized task (unit-matmul tiled in ``tile`` chunks so peak memory
    is tile x cluster, not cluster²). Cluster size is bounded by N/k on
    balanced data — pick k so N/k fits a task, and raise k (or recurse
    into hot clusters) under skew. If ``assign_out`` is set the
    (id, cluster, cosine) assignment table is also written there as
    parquet (the recursive-oracle hook and the natural checkpoint).
    """
    from vertex_ray.stages.ann import _stack, _unit
    from vertex_ray.stages.cluster import kmeans_fit

    cents = kmeans_fit(ds, vec_col, k=k, iters=iters, seed=seed)
    cu = _unit(cents)

    def assign_full(t: pa.Table) -> pa.Table:
        vecs = _unit(_stack(t[vec_col]))
        sims = vecs @ cu.T
        a = np.argmax(sims, axis=1)
        return pa.table({
            id_col: t[id_col],
            vec_col: t[vec_col],
            "cluster": pa.array(a.astype(np.int64)),
            "cosine": pa.array(sims[np.arange(len(a)), a]),
        })

    assigned = ds.map_batches(assign_full, batch_format="pyarrow")
    if assign_out is not None:
        from vertex_ray.state import fsio

        fsio.rmtree(assign_out)  # pyarrow.fs: works on shared/object stores
        (assigned.map_batches(
            lambda t: t.select([id_col, "cluster", "cosine"]),
            batch_format="pyarrow")
         .write_parquet(assign_out))

    def cluster_verdicts(g: pd.DataFrame, tile: int = 4096) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        csim = g["cosine"].to_numpy()
        vecs = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        unit = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        # rank of (centroid_cosine, id): y beats x iff rank_y < rank_x
        rank = np.lexsort((ids, csim))
        inv = np.empty(len(rank), dtype=np.int64)
        inv[rank] = np.arange(len(rank))
        drop = np.zeros(len(ids), dtype=bool)
        for lo in range(0, len(ids), tile):
            cos = unit[lo:lo + tile] @ unit.T
            near = cos >= threshold
            near[np.arange(lo, min(lo + tile, len(ids))) - lo,
                 np.arange(lo, min(lo + tile, len(ids)))] = False
            beats = inv[None, :] < inv[lo:lo + tile, None]
            drop[lo:lo + tile] = np.any(near & beats, axis=1)
        return pd.DataFrame({
            id_col: ids, "cluster": g["cluster"].to_numpy(),
            "cosine": csim, "keep": ~drop,
        })

    return (assigned.groupby("cluster")
            .map_groups(cluster_verdicts, batch_format="pandas"))


def span_dedup(ds, text_col: str, id_col: str, *, k: int = 8,
               n_buckets: int = 64):
    """C4-style span-level exact dedup across the corpus (the reference
    unit for "remove any three-sentence span occurring twice",
    arXiv:1910.10683 §2.2 — here the span is ``k`` consecutive
    whitespace tokens because the synthetic docs carry no sentence
    punctuation): every doc is cut into consecutive k-token spans, and
    each distinct span text survives ONCE, at its first occurrence in
    stable ``(doc_id, span_idx)`` order.

    Shape: per-batch tokenize/explode/re-join is pandas-vectorized
    (str.split + explode + groupby-join, no per-token Python); the one
    hash exchange routes span TEXT, and each group keeps its
    lexicographically-first (doc_id, span_idx) — deterministic under
    any partitioning because the key is unique. Returns
    ``(doc_id, span_idx, span)`` of kept spans."""
    import pandas as pd

    def spans(t: pa.Table) -> pa.Table:
        df = t.select([id_col, text_col]).to_pandas()
        toks = df[text_col].str.split(" ")
        ex = df[[id_col]].copy()
        ex["__toks"] = toks
        ex = ex.explode("__toks", ignore_index=True)
        ex["__i"] = ex.groupby(id_col, sort=False).cumcount()
        ex["span_idx"] = ex["__i"] // k
        sp = (ex.groupby([id_col, "span_idx"], sort=False)["__toks"]
              .agg(" ".join).rename("span").reset_index())
        b = (pd.util.hash_array(sp["span"].to_numpy(dtype=object))
             % np.uint64(n_buckets)).astype(np.int64)
        sp["__bucket"] = b
        return pa.Table.from_pandas(sp, preserve_index=False)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "span_idx"], kind="stable")
        keep = ~g["span"].duplicated()
        return g.loc[keep, [id_col, "span_idx", "span"]]

    return (
        ds.map_batches(spans, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(first, batch_format="pandas")
    )


def winnow_fingerprints_op(text_col: str = "text", id_col: str = "doc_id",
                           *, k: int = 3, w: int = 4,
                           hash_family: str = "sip"):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm, the standard
    code/near-dup fingerprint of training-data curation): hash every
    k-token gram, slide a window of ``w`` gram hashes, select each
    window's MINIMUM; the document's fingerprint set is the distinct
    selected values. Guarantees any shared run of w+k-1 tokens between
    two documents produces at least one shared fingerprint (the
    winnowing theorem), at ~2/(w+1) sampling density.

    Per-batch and per-document only — no exchange; join the output on
    ``fingerprint`` for candidate pairs. Fully vectorized: one Arrow
    split + element-wise join builds every gram in the batch, one
    strided uint64 window-min selects fingerprints (NEVER through
    float — pandas rolling would round 64-bit hashes through float64).
    Documents with fewer than ``w`` grams contribute the min over all
    their grams (one clipped window); docs with no complete gram emit
    nothing. ``hash_family="md5"`` makes the whole construction
    SQL-recomputable (``md5_number_lower``, see _md5_hash64); the
    distinct-VALUE output is tie-rule-free, so both sides agree without
    modeling the paper's rightmost-tie position rule."""
    hasher = _TOKEN_HASHERS[hash_family]

    def fn(t: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=t.schema.field(id_col).type),
            "fingerprint": pa.array([], type=pa.int64()),
        })
        toks = pc.utf8_split_whitespace(pc.utf8_lower(t[text_col]))
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        n = len(flat)
        if n < k:
            return empty
        # every k-gram in the batch via one element-wise join of the k
        # shifted token columns; a gram is real iff it stays in one doc
        arrs = [pa.array(flat[i:n - k + 1 + i]) for i in range(k)]
        gram = pc.binary_join_element_wise(*arrs, " ")
        gdoc = doc_of[:n - k + 1]
        valid = gdoc == doc_of[k - 1:]
        gh = hasher(gram.to_numpy(zero_copy_only=False))[valid]
        gdoc = gdoc[valid]
        m = len(gh)
        if m == 0:
            return empty
        out_doc = []
        out_fp = []
        if m >= w:
            sw = np.lib.stride_tricks.sliding_window_view(gh, w)
            wmin = sw.min(axis=1)  # exact uint64 min
            wvalid = gdoc[:m - w + 1] == gdoc[w - 1:]
            out_doc.append(gdoc[:m - w + 1][wvalid])
            out_fp.append(wmin[wvalid])
        # docs with 1..w-1 grams: one clipped window (min of all grams)
        seg_new = np.ones(m, dtype=bool)
        seg_new[1:] = gdoc[1:] != gdoc[:-1]
        starts = np.flatnonzero(seg_new)
        seg_len = np.diff(np.append(starts, m))
        short = seg_len < w
        if short.any():
            out_doc.append(gdoc[starts][short])
            out_fp.append(np.minimum.reduceat(gh, starts)[short])
        dd = np.concatenate(out_doc)
        ff = np.concatenate(out_fp)
        df = pd.DataFrame({"__d": dd, "fp": ff.view(np.int64)})
        df = df.drop_duplicates()
        ids = t[id_col].take(pa.array(df["__d"].to_numpy()))
        return pa.table({id_col: ids,
                         "fingerprint": pa.array(df["fp"].to_numpy())})

    return fn
