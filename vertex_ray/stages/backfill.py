"""Backfill / out-of-order correction merge: fold a late-arriving batch's
tier aggregates into an already-committed store WITHOUT recomputing it —
the "data arrived after the rollup ran" repair path every production TSDB
needs (the reference's MetricsBuffer merges per-series partials the same
way, lib/framework/src/sink/buffer/metrics.rs:19,168).

Validity contract: the merge is EXACT for decomposable per-window state —
counter sums/counts, min/max, histogram bucket vectors — because those
are associative over any split of the raw turns (the same property the
salted two-phase aggregate and the tier cascade already rely on).
Adjacency-derived metrics (inter-turn latency = lag(ts) within a
conversation) are NOT decomposable under arbitrary splits: a late turn
changes its neighbors' latencies, so latency corrections must flow
through the epoch pipeline's ordered-increment path instead. ``last``
merges by larger window fill (the correction wins ties) and is excluded
from the exactness claim — committed agg rows do not persist last_ts.

Shape: both inputs are REAL rows only (fills and stale markers are
derived state — re-run gap-fill after merging); per-batch combiner
pre-aggregation, then ONE groupby(bucket) exchange (bucket is the store's
hash of series_key, so both sides of a series co-locate by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.schema import BUCKET_COLS

_KEYS = ["bucket", "series_key", "name", "kind", "tier", "window_start"]
_ADD = ["sum", "count"] + list(BUCKET_COLS)


def backfill_merge(base_ds, delta_ds):
    """Merge two committed agg stages' REAL rows (base store + late-data
    correction store) into corrected real tier rows. Returns the agg
    columns (without filled/stale — re-derive fills downstream)."""
    cols = _KEYS + ["sum", "count", "min", "max", "last"] + list(BUCKET_COLS)

    def reals(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(pc.invert(t["filled"]), pc.invert(t["stale"]))
        return t.filter(m).select(cols)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(_KEYS, sort=False, dropna=False)
        out = gb.agg(
            **{c: (c, "sum") for c in _ADD},
            min=("min", "min"), max=("max", "max"), last=("last", "last"),
        ).reset_index()
        return out[cols]

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(combine(t.to_pandas()),
                                    preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return combine(g)

    union = (base_ds.map_batches(reals, batch_format="pyarrow")
             .union(delta_ds.map_batches(reals, batch_format="pyarrow")))
    return (union.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(final, batch_format="pandas"))
