"""Distributed connected components over near-dup PAIR output.

Completes the dedup suite: the pair operators (dedup_near.minhash_lsh_pairs
/ simhash_near_pairs / ngram_jaccard_pairs / embedding_near_pairs) emit
EDGES (a, b); training-data dedup needs the transitive CLUSTER — a~b and
b~c put a, b, c in ONE group with one canonical (kept) document.  The
reference's dedup (src/transforms/dedup.rs) is exact-key only, so this is
a training-data addition per the build brief, shaped like the MapReduce
min-label-propagation family (Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE'13 — public).

Algorithm: synchronous min-label propagation over the symmetrized edge
list — new_lab(x) = min(lab(x), min over edges (x,y) of lab(y)) — iterated
to a fixed point.  Each iteration is ONE hash-bucketed join of the static
(materialized-once) edge table against the moving (node, lab) table plus
ONE groupby(node) min exchange; only labels move between iterations.
Iteration count = graph diameter (near-dup clusters are shallow stars in
practice; ``max_iters`` guards pathological chains).  Convergence uses the
monotone-sum invariant: labels only ever decrease, so an unchanged
sum(lab) is exactly a fixed point — one cheap scalar aggregate per round,
no driver-side row materialization at any point.

Partitioning assumptions (custom-operator contract): ``n_buckets`` bounds
per-task memory for the join (a bucket holds ~(|E|+|V|)/n_buckets rows);
a degenerate hot node (one doc near-dup to millions) lands its edges in
one bucket — cap upstream with the pair operators' ``max_bucket``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_EMPTY_CC = pa.schema([("node", pa.int64()), ("lab", pa.int64())])


def _rename(names: list[str]):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns(names)

    return fn


def connected_components(edges, a_col: str = "a", b_col: str = "b", *,
                         n_buckets: int = 64, max_iters: int = 50):
    """(node, lab) per distinct endpoint of ``edges``; lab = the component's
    minimum node id. Nodes with no edge never appear (they are their own
    singleton component by definition)."""
    import ray.data

    from vertex_ray.stages.join import hash_join

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()
    if sym.count() == 0:
        return ray.data.from_arrow(_EMPTY_CC.empty_table())

    labels = (
        sym.map_batches(
            lambda t: pa.table({"node": t["src"], "lab": t["src"]}),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("lab")
        .map_batches(_rename(["node", "lab"]), batch_format="pyarrow")
        .materialize()
    )

    prev_sum = labels.sum("lab")
    for _ in range(max_iters):
        moved = hash_join(
            sym, labels, left_on="src", right_on="node", n_buckets=n_buckets
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "lab": t["lab"]}),
            batch_format="pyarrow",
        )
        labels = (
            moved.union(labels)
            .groupby("node")
            .min("lab")
            .map_batches(_rename(["node", "lab"]), batch_format="pyarrow")
            .materialize()
        )
        cur_sum = labels.sum("lab")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def dedup_clusters(pairs, a_col: str = "a", b_col: str = "b", **kw):
    """Near-dup pairs → (doc_id, canonical_id): every doc that appears in
    at least one pair, assigned the minimum doc_id of its transitive
    cluster as the canonical survivor (keep canonical_id == doc_id rows,
    drop the rest, to deduplicate a corpus)."""
    cc = connected_components(pairs, a_col, b_col, **kw)
    return cc.map_batches(
        _rename(["doc_id", "canonical_id"]), batch_format="pyarrow"
    )
