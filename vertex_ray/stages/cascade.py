"""Tier cascade over a committed block store: decode the finest tier
and materialize the coarser continuous aggregates (5m/1h/1d) as new
Gorilla block rows — the flagship cascade (pipelines/rollup_pipeline)
applied AT REST to a store that was ingested without coarser tiers
(scrape ingest, streaming ingest, backfilled stores).

Semantics are the tier-merge contract of FIXTURES.md §F4 via
stages/rollup.merge_agg: sums/counts add, min/max fold, gauge ``last``
by latest window, element-wise histogram bucket adds. LOCF fills and
stale markers never feed a coarser tier (a coarser window containing
only markers stays a gap) — same rule as the flagship cascade.

Shape: the store is already hash-partitioned by ``bucket`` (a series'
whole history lives in one bucket), so the WHOLE cascade is one
``groupby(bucket)`` exchange: decode the bucket's source-tier blocks,
merge 1m→5m→1h→1d successively (each coarser tier consumes the
previous tier's aggregate rows, never the raw points again), pack +
Gorilla-encode each tier inside the same task.

``last_ts`` note: block rows do not persist per-point observation
timestamps, so the gauge last-write tie-break uses the window start —
within one series windows are unique, so this is exact for everything
the store can represent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.schema import TIER_SECONDS, US_PER_SECOND

__all__ = ["cascade_blocks", "cascade_store"]


def cascade_blocks(blocks_ds, *, tiers=("5m", "1h", "1d"),
                   source_tier: str = "1m",
                   tier_seconds: dict | None = None):
    """Source-tier block rows → block rows for every tier in ``tiers``
    (ascending window sizes), one groupby(bucket) exchange total."""
    from vertex_ray.stages.encode import decode_blocks_batch
    from vertex_ray.stages.rollup import merge_agg

    secs = dict(tier_seconds or TIER_SECONDS)
    order = [(t, secs[t]) for t in tiers]
    chain = [(source_tier, secs[source_tier])] + order
    # every target must be strictly coarser than — and an integer
    # multiple of — the tier it merges from, INCLUDING the source
    # (cascading "1m" from a 1m source would silently double the tier)
    bad = [b for a, b in zip(chain, chain[1:])
           if b[1] <= a[1] or b[1] % a[1]]
    if bad:
        raise ValueError(
            f"tiers must be strictly coarser integer multiples of "
            f"{source_tier} in ascending order: {chain}")

    def body(g: pa.Table) -> pa.Table:
        flat = decode_blocks_batch(g).to_pandas()
        if len(flat):
            flat = flat[flat["tier"] == source_tier]
            # markers never feed coarser tiers (FIXTURES §F5)
            flat = flat[~(flat["filled"] | flat["stale"])]
        if len(flat) == 0:
            return _encode_tier(None, order[0][0])
        flat = flat.copy()
        flat["bucket"] = np.int32(g["bucket"][0].as_py())
        flat["last_ts"] = flat["window_start"].to_numpy() * US_PER_SECOND
        out = []
        cur = flat
        for tier_name, tier_s in order:
            cur = merge_agg(cur, tier_s)
            out.append(_encode_tier(cur, tier_name))
        return pa.concat_tables(out)

    return blocks_ds.groupby("bucket").map_groups(body,
                                                  batch_format="pyarrow")


def _encode_tier(rows, tier_name: str) -> pa.Table:
    from vertex_ray.stages.encode import GorillaEncode
    from vertex_ray.stages.fill import empty_fill_df, pack_series

    if rows is None or len(rows) == 0:
        empty = pack_series(empty_fill_df()).append_column(
            "tier", pa.array([], type=pa.string()))
        return GorillaEncode()(empty)
    rows = rows.copy()
    rows["filled"] = False
    rows["stale"] = False
    codes, _ = pd.factorize(rows["series_key"].to_numpy(dtype=object))
    rows = rows.iloc[np.lexsort((rows["window_start"].to_numpy(), codes))]
    packed = pack_series(rows)
    packed = packed.append_column(
        "tier", pa.array(np.full(packed.num_rows, tier_name, dtype=object),
                         type=pa.string()))
    return GorillaEncode()(packed)


def cascade_store(src_dir: str, dst_dir: str, *, tiers=("5m", "1h", "1d"),
                  source_tier: str = "1m") -> dict:
    """Materialize coarser tiers for a committed store: reads the
    source tier's blocks from ``src_dir``, writes a ``blocks`` stage at
    ``dst_dir`` containing the source tier UNCHANGED (undecoded
    pass-through) plus the new coarser tiers."""
    import os

    from vertex_ray.pipelines.rollup_pipeline import read_stage
    from vertex_ray.state.checkpoint import write_stage

    src = read_stage(src_dir, "blocks", source_tier)
    coarser = cascade_blocks(src, tiers=tiers, source_tier=source_tier)
    passthrough = read_stage(src_dir, "blocks", source_tier)
    # a pre-runs-column source store must union with the re-encoder's
    # current BLOCK_SCHEMA output: align on the source's own column set
    # (same guard as retention_pass)
    src_names = passthrough.schema().base_schema.names
    if "runs" not in src_names:
        coarser = coarser.map_batches(
            lambda t, _n=tuple(src_names): t.select(list(_n)),
            batch_format="pyarrow")
    combined = passthrough.union(coarser)
    return write_stage(combined, os.path.join(dst_dir, "blocks"),
                       {"cascaded_from": src_dir,
                        "source_tier": source_tier,
                        "tiers": list(tiers)})
