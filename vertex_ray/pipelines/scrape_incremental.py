"""Incremental scrape ingest: successive scrape runs append epoch
increments to ONE store, carrying per-series normalize state between
runs — the resumable form of pipelines/scrape_pipeline, mirroring the
flagship's epoch pipeline (pipelines/epoch_pipeline):

- each run commits ``epoch-<seq>/{agg,blocks,state}`` stages; blocks
  and state are side-written per bucket (atomic rename, idempotent —
  a retried/killed run reuses finished buckets);
- the carried state is the reference's ``MetricNormalizer`` memory
  (/root/reference lib/framework/src/sink/buffer/metrics.rs:100-146)
  persisted in its RAWEST form: each series' LAST raw scrape instant
  (one sample row for counters/gauges, the full 13-row family for
  histograms). Prepending those rows to the next run's samples makes
  the unchanged batch kernels reproduce seeding exactly — the
  first-sample/first-instant drop consumes the carried reference, so
  run N+1's first real sample EMITS a delta; no per-kind seeding code;
- the still-OPEN window's partial aggregate rides along as agg-shaped
  rows folded back in with the FIXTURES §F4 merge — a window only
  emits when a later window for that series arrives (or at
  ``scrape_finalize``), so the store keeps its one-row-per-(series,
  window) invariant across arbitrary run boundaries;
- samples at or before a series' last accepted timestamp are dropped
  (at-least-once replay absorb, same rule as the streaming encoder).

All four kinds carry state. Summary's no-op merge needs no extra
machinery: a summary window row's ``last_ts`` is its FIRST sample's
instant (stages/scrape_pipeline._summary_bucket), so the §F4 merge —
summary keeps the earliest-``last_ts`` row — always prefers the carried
open partial over the window re-derived from the replayed reference
row, which is exactly first-wins across run boundaries.

The resulting store is the epoch layout: query it with
``read_epochs_stage`` / the read façade's ``layout="epochs"``, compact
it with ``stages/compact``, GC it with ``stages/retention``.
"""

from __future__ import annotations

import os
import posixpath

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.state import fsio
from vertex_ray.state.checkpoint import finalize_stage, write_stage

__all__ = ["scrape_append", "scrape_finalize", "read_scrape_epochs"]

_SENTINEL_KIND = 255


def _sentinels(n_buckets: int, with_hist: bool) -> pa.Table:
    """One synthetic row per bucket so EVERY bucket's group body runs —
    buckets whose series got no new samples must still carry their
    state forward (the flagship epoch pipeline's sentinel trick)."""
    cols = {
        "bucket": pa.array(np.arange(n_buckets, dtype=np.int32)),
        "series_key": pa.array([""] * n_buckets, type=pa.string()),
        "kind": pa.array(np.full(n_buckets, _SENTINEL_KIND, np.uint8)),
    }
    if with_hist:
        cols["role"] = pa.array([""] * n_buckets, type=pa.string())
        cols["le"] = pa.array(np.full(n_buckets, np.nan),
                              type=pa.float64())
    cols["ts_ms"] = pa.array(np.zeros(n_buckets, np.int64))
    cols["value"] = pa.array(np.zeros(n_buckets, np.float64))
    return pa.table(cols)


def _bucket_body(g: pa.Table, *, window_s: int, tier: str, n_buckets: int,
                 state_in_dir: str | None, state_parts_dir: str,
                 blocks_parts_dir: str, emit_all: bool) -> pa.Table:
    """One bucket × one run: prepend carried reference rows, run the
    batch normalize kernels, fold carried open partials, split open vs
    emitted, side-write blocks + next state, return emitted agg rows."""
    from vertex_ray.stages.encode import GorillaEncode
    from vertex_ray.stages.fill import pack_series
    from vertex_ray.stages.rollup import merge_agg

    from vertex_ray.pipelines.scrape_pipeline import (
        _KIND_BUCKET,
        _agg_columns,
        _empty_agg_frame,
    )

    bucket_id = int(g["bucket"][0].as_py())
    kinds_col = g["kind"].to_numpy(zero_copy_only=False)
    data = g.filter(pa.array(kinds_col != _SENTINEL_KIND)).to_pandas()

    refs = open_rows = None
    if state_in_dir is not None:
        p = posixpath.join(state_in_dir, f"refs-{bucket_id:05d}.parquet")
        if fsio.exists(p):
            refs = fsio.read_parquet(p).to_pandas()
        p = posixpath.join(state_in_dir, f"open-{bucket_id:05d}.parquet")
        if fsio.exists(p):
            open_rows = fsio.read_parquet(p).to_pandas()
    if refs is None:
        refs = data.iloc[0:0]
    if open_rows is None:
        open_rows = _empty_agg_frame()

    # replay absorb: drop samples at or before the series' last accepted
    # timestamp (the carried reference rows ARE that timestamp)
    if len(data) and len(refs):
        last = refs.groupby("series_key")["ts_ms"].max()
        lm = data["series_key"].map(last)
        data = data[lm.isna().to_numpy()
                    | (data["ts_ms"].to_numpy()
                       > lm.fillna(-1).to_numpy())]

    # carried reference rows replay as each series' FIRST instant — the
    # kernels' first-sample/first-instant drop consumes them, so diffs
    # seed from the carried values with zero per-kind seeding code
    combined = (pd.concat([refs, data], ignore_index=True)
                if len(refs) else data)

    frames = [f for _, sub in combined.groupby("kind", sort=True)
              for f in [_KIND_BUCKET[int(sub["kind"].iloc[0])](
                  sub, window_s, n_buckets)] if len(f)]
    new_rows = (pd.concat(frames, ignore_index=True) if frames
                else _empty_agg_frame())
    all_rows = pd.concat([open_rows, new_rows], ignore_index=True)
    if len(all_rows):
        all_rows = merge_agg(all_rows, window_s)
        all_rows["filled"] = False
        all_rows["stale"] = False

    # split: each series' LAST window stays open (unless finalizing)
    if len(all_rows) and not emit_all:
        mx = all_rows.groupby("series_key")["window_start"].transform("max")
        open_mask = all_rows["window_start"].to_numpy() == mx.to_numpy()
        opens = all_rows[open_mask]
        emit = all_rows[~open_mask]
    else:
        opens = all_rows.iloc[0:0]
        emit = all_rows

    # next references: every row of each series' latest instant
    if len(combined):
        mxts = combined.groupby("series_key")["ts_ms"].transform("max")
        new_refs = combined[combined["ts_ms"].to_numpy() == mxts.to_numpy()]
    else:
        new_refs = combined

    if len(emit):
        codes, _ = pd.factorize(emit["series_key"].to_numpy(dtype=object))
        emit = emit.iloc[np.lexsort((emit["window_start"].to_numpy(),
                                     codes))]
        packed = pack_series(emit)
        packed = packed.append_column(
            "tier", pa.array(np.full(packed.num_rows, tier, dtype=object),
                             type=pa.string()))
        final = posixpath.join(blocks_parts_dir,
                               f"part-{bucket_id:05d}.parquet")
        if not fsio.exists(final):
            fsio.write_parquet_atomic(GorillaEncode()(packed), final,
                                      str(os.getpid()))
    for name, frame in (("refs", new_refs), ("open", opens)):
        f = posixpath.join(state_parts_dir,
                           f"{name}-{bucket_id:05d}.parquet")
        if not fsio.exists(f):
            fsio.write_parquet_atomic(
                pa.Table.from_pandas(frame, preserve_index=False), f,
                str(os.getpid()))

    out = emit[[c for c in _agg_columns() if c in emit.columns]]
    return pa.Table.from_pandas(out, preserve_index=False)


def _epoch_seq_dirs(out_dir: str) -> list[str]:
    from vertex_ray.pipelines.epoch_pipeline import epoch_dirs

    return epoch_dirs(out_dir)


def scrape_append(lines_ds, out_dir: str, *, kinds: dict,
                  window_s: int = 60, tier: str = "1m",
                  n_buckets: int = 32,
                  default_ts_ms: int | None = None,
                  _emit_all: bool = False) -> dict:
    """Append one scrape run to the incremental store at ``out_dir``.

    ``kinds`` maps family name → ``counter|gauge|histogram|summary``
    and must stay identical across a store's runs (validated against
    the previous epoch's lineage). Summary families follow the
    first-wins open-window carry (module docstring). Returns this
    epoch's stage manifests."""
    import functools

    import ray.data as rd

    from vertex_ray.pipelines.epoch_pipeline import _prepare_parts_dir
    from vertex_ray.pipelines.scrape_pipeline import (
        _KIND_CODE,
        _scrape_parse_ds,
    )

    bad = {m: k for m, k in kinds.items() if k not in _KIND_CODE}
    if bad:
        raise ValueError(f"unknown family kinds: {bad}")
    prev = _epoch_seq_dirs(out_dir)
    if prev:
        from vertex_ray.state.checkpoint import read_manifest

        plin = read_manifest(posixpath.join(prev[-1], "state"))["lineage"]
        if plin.get("finalize"):
            raise ValueError(
                "store is finalized (every open window emitted) — "
                "appending after scrape_finalize would re-emit windows")
        # new families may join mid-stream; an EXISTING family must not
        # change kind (its carried reference rows assume the old one)
        changed = {m: (k0, kinds[m])
                   for m, k0 in (plin.get("kinds") or {}).items()
                   if m in kinds and kinds[m] != k0}
        if changed:
            raise ValueError(
                f"family kind changed across runs: {changed}")
        if (plin.get("window_s"), plin.get("n_buckets")) != (window_s,
                                                             n_buckets):
            raise ValueError("window_s/n_buckets must stay identical "
                             "across a store's runs")
    seq = len(prev)
    state_in = posixpath.join(prev[-1], "state") if prev else None
    edir = posixpath.join(out_dir, f"epoch-{seq}")
    paths = {s: posixpath.join(edir, s) for s in ("agg", "blocks", "state")}
    lineage = {"kinds": dict(sorted(kinds.items())), "tier": tier,
               "window_s": window_s, "n_buckets": n_buckets, "seq": seq,
               "finalize": _emit_all,
               # blocks here are dense, but BLOCK_SCHEMA grew the 'runs'
               # column — never resume a pre-runs-column epoch store into
               # a mixed-schema stage (same rationale as epoch_pipeline)
               "block_format": "gorilla-columnar-v3-schema-dense-fills"}
    blocks_parts = paths["blocks"] + ".__parts__"
    state_parts = paths["state"] + ".__parts__"
    _prepare_parts_dir(blocks_parts, lineage)
    _prepare_parts_dir(state_parts, lineage)

    parsed = _scrape_parse_ds(lines_ds, kinds=kinds, n_buckets=n_buckets,
                              default_ts_ms=default_ts_ms)
    with_hist = any(k == "histogram" for k in kinds.values())
    parsed = parsed.union(rd.from_arrow(_sentinels(n_buckets, with_hist)))
    agg_ds = parsed.groupby("bucket").map_groups(
        functools.partial(
            _bucket_body, window_s=window_s, tier=tier,
            n_buckets=n_buckets, state_in_dir=state_in,
            state_parts_dir=state_parts, blocks_parts_dir=blocks_parts,
            emit_all=_emit_all),
        batch_format="pyarrow")
    manifests = {"agg": write_stage(agg_ds, paths["agg"], lineage)}
    manifests["blocks"] = finalize_stage(blocks_parts, paths["blocks"],
                                         lineage)
    manifests["state"] = finalize_stage(state_parts, paths["state"],
                                        lineage)
    return manifests


def scrape_finalize(out_dir: str, *, kinds: dict, window_s: int = 60,
                    tier: str = "1m", n_buckets: int = 32) -> dict:
    """Emit every still-open window as a final epoch (end of stream)."""
    import ray.data as rd

    return scrape_append(
        rd.from_arrow(pa.table({"text": pa.array([], type=pa.string())})),
        out_dir, kinds=kinds, window_s=window_s, tier=tier,
        n_buckets=n_buckets, _emit_all=True)


def read_scrape_epochs(out_dir: str, metric: str | None = None):
    from vertex_ray.pipelines.epoch_pipeline import read_epochs_stage

    return read_epochs_stage(out_dir, "blocks", metric=metric)
