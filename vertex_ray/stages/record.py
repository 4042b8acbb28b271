"""Recording rules: materialize a derived metric back into the Gorilla
block store — the Prometheus recording-rule / continuous-aggregate
"materialized view" analogue over this engine's tier store (the reference
derives new metrics from streams with metricalize,
src/transforms/metricalize.rs; a recording rule is the same move applied
to the READ side: evaluate an aggregation over an existing tier and store
the result as a first-class metric).

Shape: tier rows → ``label_aggregate`` (combiner + ONE exchange) →
agg-shaped gauge rows → ONE groupby(bucket) → sort + pack per series →
Gorilla encode. The derived series count is the label cardinality — tiny
next to the input — so everything after the first exchange is
rollup-cardinality work, never raw-row work. The output block rows have
the exact schema of the flagship block store, so retention GC, the
PromQL read surface and ``decode_tier_blocks`` work on them unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.schema import BUCKET_COLS, KIND_GAUGE


def record_rule(tier_ds, *, label: str, value_col: str, new_metric: str,
                tier: str, agg: str = "sum", n_buckets: int = 32):
    """Evaluate ``<agg> by (label) (metric)`` over tier rows and encode the
    result as Gorilla block rows for a NEW gauge metric named
    ``new_metric`` with series key ``new_metric{label=<value>}``.

    Returns a Dataset of block rows (flagship block-store schema, with a
    ``tier`` column) — write it with ``write_parquet`` next to / into a
    block store, read it back with ``decode_tier_blocks``.
    """
    from vertex_ray.stages.encode import GorillaEncode
    from vertex_ray.stages.fill import pack_series
    from vertex_ray.stages.promql import label_aggregate

    derived = label_aggregate(tier_ds, label, value_col, out_col="__v",
                              agg=agg)

    def to_agg_rows(t: pa.Table) -> pa.Table:
        lbl = t[label].to_numpy(zero_copy_only=False)
        v = t["__v"].to_numpy(zero_copy_only=False).astype(np.float64)
        # one rendered key per row; rows here are (label value, window)
        # aggregates — label-cardinality work, not input-row work
        keys = np.array(
            [f"{new_metric}{{{label}={x}}}" for x in lbl], dtype=object)
        bucket = (pd.util.hash_array(keys)
                  % np.uint64(n_buckets)).astype(np.int32)
        cols = {
            "bucket": pa.array(bucket, type=pa.int32()),
            "series_key": pa.array(keys, type=pa.string()),
            "name": pa.array(np.full(len(v), new_metric, dtype=object),
                             type=pa.string()),
            "kind": pa.array(np.full(len(v), KIND_GAUGE, dtype=np.uint8)),
            "window_start": pa.array(
                t["window_start"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "sum": pa.array(v),
            "count": pa.array(np.ones(len(v))),
            "min": pa.array(v),
            "max": pa.array(v),
            "last": pa.array(v),
            "filled": pa.array(np.zeros(len(v), dtype=bool)),
            "stale": pa.array(np.zeros(len(v), dtype=bool)),
        }
        for b in BUCKET_COLS:
            cols[b] = pa.array(np.zeros(len(v)))
        return pa.table(cols)

    def sort_pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["series_key", "window_start"], kind="stable")
        packed = pack_series(g)
        return packed.append_column(
            "tier", pa.array(np.full(packed.num_rows, tier, dtype=object),
                             type=pa.string()))

    rows = derived.map_batches(to_agg_rows, batch_format="pyarrow")
    packed = rows.groupby("bucket").map_groups(sort_pack,
                                               batch_format="pandas")
    return packed.map_batches(GorillaEncode, batch_format="pyarrow",
                              concurrency=(1, 4))
