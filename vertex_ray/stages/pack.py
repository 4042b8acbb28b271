"""Sequence packing: greedy-fill documents into fixed token-budget bins.

The training-data step after token counting (stages/text.token_count_op):
group documents into "context windows" of at most ``budget`` tokens so a
trainer reads one bin per sample with minimal padding.  Not in the
reference (its unit of work is an event, never a token budget) — a
training-data addition per the build brief.

Deterministic distributed contract: documents are hash-partitioned by
``doc_id % n_parts`` and packed GREEDILY IN doc_id ORDER within each
partition — a bin takes consecutive docs while its fill stays ≤ budget; a
doc larger than the budget gets a bin of its own.  The (part, bin) pair is
therefore a pure function of the corpus, independent of block layout, task
order, or cluster size — the property the driver's oracle comparison (and
a resumable 100 TB run) needs.  First-fit-decreasing would pack tighter
but is order-dependent and needs a global sort; greedy-by-id is the
standard deterministic choice for streaming corpora.

Scale shape: ONE groupby(part) exchange carrying only (doc_id, n_tokens)
— text never enters the shuffle; join bins back by doc_id downstream if
payloads are needed.  Inside a partition the packer loops per BIN (not per
doc): each iteration is one numpy ``searchsorted`` into the token-count
prefix sum, so cost is O(bins · log n_part_docs) with no per-row Python.
``n_parts`` bounds per-task rows at ~N/n_parts; size it so a partition's
(id, count) pairs fit a worker heap (16 bytes/doc ⇒ millions per task).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_bins(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Greedy sequential bin assignment over an ordered token-count vector.
    Vectorized per bin: prefix sum + searchsorted finds each bin's end."""
    cum = np.cumsum(tokens.astype(np.int64))
    bins = np.empty(len(tokens), dtype=np.int64)
    start, b = 0, 0
    base = np.int64(0)
    while start < len(tokens):
        end = int(np.searchsorted(cum, base + budget, side="right"))
        if end <= start:  # oversized doc: a bin of its own
            end = start + 1
        bins[start:end] = b
        base = cum[end - 1]
        b += 1
        start = end
    return bins


def pack_documents(ds, text_col: str, id_col: str, budget: int, *,
                   n_parts: int = 16):
    """(part, doc_id, n_tokens, bin) per document; whitespace token count
    (same \\S+ contract as stages/text.token_count_op)."""

    def count_and_part(t: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(t[text_col], r"\S+"), pa.int64()
        )
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "part": pa.array(ids % np.int64(n_parts)),
            id_col: t[id_col],
            "n_tokens": n_tok,
        })

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        g["bin"] = pack_bins(g["n_tokens"].to_numpy(), budget)
        return g

    return (
        ds.map_batches(count_and_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_part, batch_format="pandas")
    )
