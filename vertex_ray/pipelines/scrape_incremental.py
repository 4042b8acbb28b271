"""Incremental scrape ingest: successive scrape runs append epoch
increments to ONE store, carrying per-series normalize state between
runs — the resumable form of pipelines/scrape_pipeline, mirroring the
flagship's epoch pipeline (pipelines/epoch_pipeline) exactly:

- each run commits ``epoch-<seq>/{agg,blocks,state}`` stages; blocks
  and state are side-written per bucket (atomic rename, idempotent —
  a retried/killed run reuses finished buckets);
- the carried state is the reference's ``MetricNormalizer`` memory
  (/root/reference lib/framework/src/sink/buffer/metrics.rs:100-146)
  persisted: per series the last accepted timestamp, the last
  cumulative value (counters seed their diff from it, so the first
  sample of run N+1 EMITS a delta instead of re-setting the
  reference), and the still-OPEN window's partial aggregate — a window
  only emits when a later window for that series arrives (or at
  ``scrape_finalize``), so the store keeps its one-row-per-(series,
  window) invariant across arbitrary run boundaries;
- samples at or before a series' last accepted timestamp are dropped
  (at-least-once replay absorb, same rule as the streaming encoder).

Counter and gauge families (histograms roll up via the one-shot batch
path — their 13-stream open-window state is not carried yet).

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

from vertex_ray.schema import KIND_GAUGE, KIND_SUM
from vertex_ray.state import fsio
from vertex_ray.state.checkpoint import finalize_stage, write_stage

__all__ = ["scrape_append", "scrape_finalize", "read_scrape_epochs"]

_SENTINEL_KIND = 255

STATE_SCHEMA = pa.schema([
    pa.field("series_key", pa.string()),
    pa.field("kind", pa.uint8()),
    pa.field("last_ts_ms", pa.int64()),
    pa.field("last_cum", pa.float64()),
    pa.field("open_w", pa.int64()),        # -1 = no open window
    pa.field("open_sum", pa.float64()),
    pa.field("open_count", pa.float64()),
    pa.field("open_min", pa.float64()),
    pa.field("open_max", pa.float64()),
    pa.field("open_last", pa.float64()),
    pa.field("open_last_ts", pa.int64()),  # epoch us
])


def _empty_state() -> pa.Table:
    return STATE_SCHEMA.empty_table()


def _sentinels(n_buckets: int) -> pa.Table:
    """One synthetic row per bucket so EVERY bucket's group body runs —
    buckets whose series got no new samples must still carry their
    state forward (the flagship epoch pipeline's sentinel trick)."""
    return pa.table({
        "bucket": pa.array(np.arange(n_buckets, dtype=np.int32)),
        "series_key": pa.array([""] * n_buckets, type=pa.string()),
        "kind": pa.array(np.full(n_buckets, _SENTINEL_KIND, np.uint8)),
        "ts_ms": pa.array(np.zeros(n_buckets, np.int64)),
        "value": pa.array(np.zeros(n_buckets, np.float64)),
    })


def _state_to_open_rows(st: pd.DataFrame,
                        n_buckets: int) -> pd.DataFrame:
    """Carried open-window partials → agg-shaped rows for merge_agg."""
    from vertex_ray.pipelines.scrape_pipeline import (
        _agg_frame_from,
        _empty_agg_frame,
    )

    st = st[st["open_w"] >= 0]
    if len(st) == 0:
        return _empty_agg_frame()
    frames = []
    for kc in (KIND_SUM, KIND_GAUGE):
        sub = st[st["kind"] == kc]
        if len(sub) == 0:
            continue
        frames.append(_agg_frame_from(
            sub["series_key"].to_numpy(dtype=object),
            sub["open_w"].to_numpy(np.int64), n_buckets, kc,
            sub["open_last_ts"].to_numpy(np.int64),
            {"sum": sub["open_sum"], "count": sub["open_count"],
             "min": sub["open_min"], "max": sub["open_max"],
             "last": sub["open_last"]}))
    return (pd.concat(frames, ignore_index=True) if frames
            else _empty_agg_frame())


def _bucket_body(g: pa.Table, *, window_s: int, tier: str, n_buckets: int,
                 state_in_dir: str | None, state_parts_dir: str,
                 blocks_parts_dir: str, emit_all: bool) -> pa.Table:
    """One bucket × one run: seed from carried state, run the batch
    normalize kernels, merge carried open partials, split open vs
    emitted, side-write blocks + next state, return emitted agg rows."""
    from vertex_ray.stages.encode import GorillaEncode
    from vertex_ray.stages.fill import pack_series
    from vertex_ray.stages.rollup import merge_agg

    from vertex_ray.pipelines.scrape_pipeline import (
        _KIND_BUCKET,
        _empty_agg_frame,
    )

    bucket_id = int(g["bucket"][0].as_py())
    kinds_col = g["kind"].to_numpy(zero_copy_only=False)
    data = g.filter(pa.array(kinds_col != _SENTINEL_KIND)).to_pandas()

    st = None
    if state_in_dir is not None:
        p = posixpath.join(state_in_dir, f"part-{bucket_id:05d}.parquet")
        if fsio.exists(p):
            st = fsio.read_parquet(p).to_pandas()
    if st is None:
        st = _empty_state().to_pandas()

    # replay absorb: drop samples at or before the series' last accepted
    # timestamp (vectorized map through the carried state)
    if len(data) and len(st):
        last = data["series_key"].map(
            dict(zip(st["series_key"], st["last_ts_ms"])))
        keep = last.isna().to_numpy() | (
            data["ts_ms"].to_numpy() > last.fillna(-1).to_numpy())
        data = data[keep]

    # counter seeding: a synthetic reference sample (last_ts, last_cum)
    # per carried counter series — the kernel's first-sample drop then
    # reproduces "diff from the carried reference" exactly
    ctr_state = st[st["kind"] == KIND_SUM]
    if len(ctr_state):
        synth = pd.DataFrame({
            "bucket": np.int32(bucket_id),
            "series_key": ctr_state["series_key"].to_numpy(dtype=object),
            "kind": np.uint8(KIND_SUM),
            "ts_ms": ctr_state["last_ts_ms"].to_numpy(np.int64),
            "value": ctr_state["last_cum"].to_numpy(np.float64),
        })
        data = pd.concat([synth, data], ignore_index=True)

    frames = []
    for code, sub in data.groupby("kind", sort=True):
        frames.append(_KIND_BUCKET[int(code)](sub, window_s, n_buckets))
    new_rows = (pd.concat([f for f in frames if len(f)],
                          ignore_index=True)
                if any(len(f) for f in frames) else _empty_agg_frame())
    # fold the carried open partials (merge contract of FIXTURES §F4)
    open_rows = _state_to_open_rows(st, n_buckets)
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

    # next state: normalize references advance with the new samples
    new_state = _next_state(st, data, opens)

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
    sfinal = posixpath.join(state_parts_dir, f"part-{bucket_id:05d}.parquet")
    if not fsio.exists(sfinal):
        fsio.write_parquet_atomic(new_state, sfinal, str(os.getpid()))

    from vertex_ray.pipelines.scrape_pipeline import _agg_columns

    out = emit[[c for c in _agg_columns() if c in emit.columns]]
    return pa.Table.from_pandas(out, preserve_index=False)


def _next_state(st: pd.DataFrame, data: pd.DataFrame,
                opens: pd.DataFrame) -> pa.Table:
    """Carried state ∪ this run's observations → next state table.

    ``data`` includes the synthetic counter reference rows — harmless:
    their (ts, value) equal the carried reference, and real samples
    sort after them."""
    if len(data):
        d = data.sort_values(["series_key", "ts_ms", "value"],
                             kind="stable")
        refs = d.groupby("series_key", sort=False).agg(
            last_ts_ms=("ts_ms", "last"), last_cum=("value", "last"),
            kind=("kind", "last")).reset_index()
    else:
        refs = pd.DataFrame({"series_key": [], "last_ts_ms": [],
                             "last_cum": [], "kind": []})
    carried = st[~st["series_key"].isin(set(refs["series_key"]))]
    refs = pd.concat([refs, carried[["series_key", "last_ts_ms",
                                     "last_cum", "kind"]]],
                     ignore_index=True)
    om = opens.set_index("series_key") if len(opens) else None
    key = refs["series_key"].to_numpy(dtype=object)

    def col(name, default, dtype):
        if om is None or name not in om.columns:
            return np.full(len(refs), default, dtype=dtype)
        s = om[name].reindex(refs["series_key"])
        return s.fillna(default).to_numpy().astype(dtype)

    return pa.table({
        "series_key": pa.array(key, type=pa.string()),
        "kind": pa.array(refs["kind"].to_numpy().astype(np.uint8)),
        "last_ts_ms": pa.array(
            refs["last_ts_ms"].to_numpy().astype(np.int64)),
        "last_cum": pa.array(
            refs["last_cum"].to_numpy().astype(np.float64)),
        "open_w": pa.array(col("window_start", -1, np.int64)),
        "open_sum": pa.array(col("sum", np.nan, np.float64)),
        "open_count": pa.array(col("count", 0, np.float64)),
        "open_min": pa.array(col("min", np.nan, np.float64)),
        "open_max": pa.array(col("max", np.nan, np.float64)),
        "open_last": pa.array(col("last", np.nan, np.float64)),
        "open_last_ts": pa.array(col("last_ts", 0, np.int64)),
    })


def _epoch_seq_dirs(out_dir: str) -> list[str]:
    from vertex_ray.pipelines.epoch_pipeline import epoch_dirs

    return epoch_dirs(out_dir)


def scrape_append(lines_ds, out_dir: str, *, kinds: dict,
                  window_s: int = 60, tier: str = "1m",
                  n_buckets: int = 32,
                  default_ts_ms: int | None = None,
                  _emit_all: bool = False) -> dict:
    """Append one scrape run to the incremental store at ``out_dir``.

    ``kinds`` maps family name → ``counter|gauge`` (histograms: batch
    path only). Returns the committed stage manifests for this epoch."""
    import functools

    from vertex_ray.pipelines.epoch_pipeline import _prepare_parts_dir
    from vertex_ray.pipelines.scrape_pipeline import _scrape_parse_ds

    bad = {m: k for m, k in kinds.items() if k not in ("counter", "gauge")}
    if bad:
        raise ValueError(f"incremental scrape supports counter|gauge "
                         f"families, got {bad}")
    prev = _epoch_seq_dirs(out_dir)
    seq = len(prev)
    state_in = posixpath.join(prev[-1], "state") if prev else None
    edir = posixpath.join(out_dir, f"epoch-{seq}")
    paths = {s: posixpath.join(edir, s) for s in ("agg", "blocks", "state")}
    lineage = {"kinds": dict(sorted(kinds.items())), "tier": tier,
               "window_s": window_s, "n_buckets": n_buckets, "seq": seq,
               "finalize": _emit_all}
    blocks_parts = paths["blocks"] + ".__parts__"
    state_parts = paths["state"] + ".__parts__"
    _prepare_parts_dir(blocks_parts, lineage)
    _prepare_parts_dir(state_parts, lineage)

    parsed = _scrape_parse_ds(lines_ds, kinds=kinds, n_buckets=n_buckets,
                              default_ts_ms=default_ts_ms)
    import ray.data as rd

    parsed = parsed.union(rd.from_arrow(_sentinels(n_buckets)))
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
