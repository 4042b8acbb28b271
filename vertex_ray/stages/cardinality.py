"""Cardinality limiter — src/transforms/cardinality.rs:18-295.

Reference: per tag key, track the set of distinct values (exact HashSet or
probabilistic bloom); when a new value would exceed the limit, either Drop
the event or DropTag.

Ray-first: a process-global mutable set does not distribute, so the limit
is enforced with the engine's own primitives in two passes over the
column, both cheap:

1. Budget pass — per-batch partial distinct sets, each TRUNCATED to the
   first `limit` values by min ``order_col`` (lossless: a value in the
   global first-`limit` attains its global min order in some batch, and
   fewer than `limit` values can precede it there, so it survives that
   batch's truncation) → distributed ``groupby(v).min(o)`` →
   ``sort.limit(limit)``. The driver only ever sees `limit` rows — a
   high-cardinality tag at 100 TB never lands its value set on the
   driver.
2. Enforce pass — broadcast the allowed set via ``ray.put`` once, filter /
   blank the tag inside ``map_batches`` (the drop / drop-tag actions).

The first-seen order is defined by ``order_col`` (e.g. event timestamp),
making the result deterministic under any partitioning — unlike the
reference's arrival-order set, which is inherently racy per process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def allowed_values(ds, tag_col: str, order_col: str, limit: int) -> set:
    """First `limit` distinct values of tag_col by first appearance
    (min order_col). Fully distributed; the driver receives `limit` rows."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "v": t[tag_col].to_numpy(zero_copy_only=False),
                "o": t[order_col].cast(pa.int64()).to_numpy()
                if pa.types.is_timestamp(t[order_col].type)
                else t[order_col].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("v", sort=False)["o"].min().reset_index()
        # per-batch truncation to the limit is lossless for the global
        # top-limit (see module docstring) and bounds everything downstream
        g = g.sort_values(["o", "v"], kind="stable").head(limit)
        return pa.table({"v": pa.array(g["v"]), "o": pa.array(g["o"])})

    firsts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .min("o")
        .sort(["min(o)", "v"])
        .limit(limit)
        .to_pandas()
    )
    return set(firsts["v"])


def enforce_limit(ds, tag_col: str, allowed: set, action: str = "drop"):
    """action="drop": drop rows whose tag value is outside the budget;
    action="drop_tag": keep the row, blank the tag (reference's DropTag)."""
    allowed_ref = ray.put(np.array(sorted(allowed), dtype=object))

    def fn(t: pa.Table) -> pa.Table:
        allow = ray.get(allowed_ref)
        vals = t[tag_col].to_numpy(zero_copy_only=False)
        ok = np.isin(vals, allow)
        if action == "drop":
            return t.filter(pa.array(ok))
        blanked = np.where(ok, vals, "")
        return t.set_column(
            t.schema.get_field_index(tag_col), tag_col, pa.array(blanked)
        )

    return ds.map_batches(fn, batch_format="pyarrow")
