"""Epoch-incremental flagship pipeline — unbounded retention.

Batch analogue of the reference's continuous operation: where the
streaming daemon carries per-series state in RAM across ticks
(src/transforms/metricalize.rs:220-262, prometheus_exporter's TTL'd
series map), this pipeline processes the transcript stream one EPOCH at
a time and carries the cross-epoch state in per-bucket parquet parts.
Each epoch run is the same shape as the one-shot flagship (pruned scan →
ONE bucket groupby → kernel → agg rows + side-written Gorilla blocks),
plus a per-bucket state read at group entry and a state part write at
group exit. No task ever holds more than one epoch of one bucket — the
unbounded-retention answer to the one-shot design's "bucket holds its
entire history" scale note.

Layout under ``out_dir``::

    epoch-<start_s>/agg/     flat tier rows for windows inside the epoch
    epoch-<start_s>/blocks/  Gorilla blocks for those windows
    epoch-<start_s>/state/   per-bucket carry state consumed by the NEXT epoch

Every stage commits atomically with lineage (state/checkpoint); a killed
run resumes at the first incomplete epoch, reusing finished per-bucket
parts inside it. Sequential epochs reproduce the one-shot output
BIT-FOR-BIT (tests/test_epoch_pipeline.py), so all the flagship's SQL
oracles apply unchanged to the epoched engine.
"""

from __future__ import annotations

import functools
import os
import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from vertex_ray.schema import TIERS
from vertex_ray.stages.derive import PROJECT_COLUMNS, project_for_rollup_fast
from vertex_ray.stages.encode import GorillaEncode
from vertex_ray.stages.fill import unpack_series
from vertex_ray.stages.kernel import METRIC_NAMES
from vertex_ray.stages.kernel_epoch import SENTINEL_ROLE, epoch_kernel
from vertex_ray.state import fsio
from vertex_ray.state.checkpoint import (
    finalize_stage,
    read_manifest,
    stage_done,
    stage_files,
    write_stage,
)
from vertex_ray.pipelines.rollup_pipeline import (
    DEFAULT_N_BUCKETS,
    _target_blocks,
)


def transcripts_span_s(path: str) -> tuple[int, int]:
    """(min, max) transcript timestamp in epoch seconds, from parquet
    footer statistics only."""
    lo = hi = None
    files = stage_files(path) if os.path.isdir(path) else [path]
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None:
                continue

            def _s(v):
                return int(v.timestamp()) if hasattr(v, "timestamp") else int(v) // 1_000_000

            lo = _s(st.min) if lo is None else min(lo, _s(st.min))
            hi = _s(st.max) if hi is None else max(hi, _s(st.max))
    if lo is None:
        raise ValueError(f"no ts statistics in {path}")
    return lo, hi


def _sentinels(n_buckets: int, epoch_start_s: int) -> pa.Table:
    """One throwaway row per bucket so every bucket's group runs every
    epoch — idle buckets must still emit carried fills/stale markers and
    re-commit their state."""
    n = n_buckets
    return pa.table(
        {
            "bucket": pa.array(np.arange(n, dtype=np.int32)),
            "conv_id": pa.array([""] * n, type=pa.string()),
            "conv_hash": pa.array(np.zeros(n, np.int64)),
            "turn_idx": pa.array(np.full(n, -1, np.int32)),
            "role_code": pa.array(np.full(n, SENTINEL_ROLE, np.uint8)),
            "tool_code": pa.array(np.zeros(n, np.uint8)),
            "ts": pa.array(
                np.full(n, epoch_start_s * 1_000_000, np.int64), type=pa.timestamp("us")
            ),
        }
    )


def epoch_bucket_group(
    group: pa.Table,
    tiers,
    epoch_start_s: int,
    epoch_end_s: int,
    fill_end_s: int,
    salt: int,
    state_in_dir: str | None,
    state_parts_dir: str,
    blocks_parts_dir: str,
) -> pa.Table:
    """Group body for one bucket × one epoch: read carried state, run the
    kernel, side-write blocks + next-epoch state (atomic, idempotent),
    return the epoch's flat tier rows."""
    bucket_id = int(group["bucket"][0].as_py())
    rc = group["role_code"].to_numpy(zero_copy_only=False)
    mask = rc != SENTINEL_ROLE
    data = group if mask.all() else group.filter(pa.array(mask))

    state_in = None
    if state_in_dir is not None:
        p = posixpath.join(state_in_dir, f"part-{bucket_id:05d}.parquet")
        if fsio.exists(p):
            state_in = fsio.read_parquet(p)

    packed, state_out = epoch_kernel(
        data["conv_id"].to_numpy(zero_copy_only=False),
        data["turn_idx"].to_numpy(zero_copy_only=False),
        data["role_code"].to_numpy(zero_copy_only=False),
        data["tool_code"].to_numpy(zero_copy_only=False),
        data["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
        state_in,
        tiers,
        epoch_start_s,
        epoch_end_s,
        fill_end_s,
        bucket_id,
        salt,
    )
    if packed.num_rows:
        final = posixpath.join(blocks_parts_dir, f"part-{bucket_id:05d}.parquet")
        if not fsio.exists(final):
            fsio.write_parquet_atomic(GorillaEncode()(packed), final, str(os.getpid()))
    sfinal = posixpath.join(state_parts_dir, f"part-{bucket_id:05d}.parquet")
    if not fsio.exists(sfinal):
        fsio.write_parquet_atomic(state_out, sfinal, str(os.getpid()))
    return unpack_series(packed, dict_encode=True)


def _prepare_parts_dir(parts_dir: str, lineage: dict) -> None:
    stamp = posixpath.join(parts_dir, "__lineage__.json")
    if fsio.exists(parts_dir):
        old = fsio.read_json(stamp) if fsio.exists(stamp) else None
        if old != lineage:
            fsio.rmtree(parts_dir)
    fsio.makedirs(parts_dir)
    if not fsio.exists(stamp):
        fsio.write_json(stamp, lineage)


def _lineage_matches(manifest: dict, lineage: dict) -> bool:
    lin = {k: v for k, v in manifest.get("lineage", {}).items() if k != "wall_seconds"}
    return lin == lineage


def run_one_epoch(
    transcripts_path: str,
    edir: str,
    epoch_start_s: int,
    epoch_end_s: int,
    fill_end_s: int,
    state_in_dir: str | None,
    lineage: dict,
    n_buckets: int,
    salt: int,
    tiers,
) -> dict[str, dict]:
    paths = {s: posixpath.join(edir, s) for s in ("agg", "blocks", "state")}
    if all(stage_done(p) for p in paths.values()):
        manifests = {s: read_manifest(p) for s, p in paths.items()}
        if all(_lineage_matches(m, lineage) for m in manifests.values()):
            return manifests
        for p in paths.values():
            fsio.rmtree(p)
    else:
        # partial epoch from a killed run: recompute the Dataset stage,
        # reusing any committed per-bucket parts below
        for p in paths.values():
            if fsio.exists(p):
                fsio.rmtree(p)

    blocks_parts = paths["blocks"] + ".__parts__"
    state_parts = paths["state"] + ".__parts__"
    _prepare_parts_dir(blocks_parts, lineage)
    _prepare_parts_dir(state_parts, lineage)

    lo = pa.scalar(epoch_start_s * 1_000_000, type=pa.timestamp("us"))
    hi = pa.scalar(epoch_end_s * 1_000_000, type=pa.timestamp("us"))
    raw = rd.read_parquet(
        transcripts_path,
        columns=PROJECT_COLUMNS,
        filter=(pc.field("ts") >= lo) & (pc.field("ts") < hi),
        override_num_blocks=_target_blocks(),
    )
    projected = raw.map_batches(
        functools.partial(project_for_rollup_fast, n_buckets=n_buckets),
        batch_format="pyarrow",
    ).union(rd.from_arrow(_sentinels(n_buckets, epoch_start_s)))
    agg_ds = projected.groupby("bucket").map_groups(
        functools.partial(
            epoch_bucket_group,
            tiers=tiers,
            epoch_start_s=epoch_start_s,
            epoch_end_s=epoch_end_s,
            fill_end_s=fill_end_s,
            salt=salt,
            state_in_dir=state_in_dir,
            state_parts_dir=state_parts,
            blocks_parts_dir=blocks_parts,
        ),
        batch_format="pyarrow",
    )
    manifests = {"agg": write_stage(agg_ds, paths["agg"], lineage)}
    manifests["blocks"] = finalize_stage(blocks_parts, paths["blocks"], lineage)
    manifests["state"] = finalize_stage(state_parts, paths["state"], lineage)
    return manifests


def epoch_dirs(out_dir: str) -> list[str]:
    # filter BEFORE sorting: the store root also holds non-epoch entries
    # (tombstones.json after a delete, future sidecars) that must not
    # reach the epoch-number sort key
    if not fsio.exists(out_dir):
        return []
    epochs = [d for d in fsio.listdir(out_dir) if d.startswith("epoch-")]
    return [posixpath.join(out_dir, d)
            for d in sorted(epochs, key=lambda d: int(d.split("-", 1)[1]))]


def run_pipeline_epochs(
    transcripts_path: str,
    out_dir: str,
    epoch_seconds: int = 86_400,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: int = 1,
    tiers=TIERS,
) -> dict[str, dict]:
    """Run (or resume) the flagship as a sequence of epoch increments."""
    for tier, seconds in tiers:
        if epoch_seconds % seconds:
            raise ValueError(
                f"epoch_seconds={epoch_seconds} must be a multiple of the "
                f"{tier} tier width {seconds}s (windows may not straddle epochs)"
            )
    start_s, end_s = transcripts_span_s(transcripts_path)
    first = start_s // epoch_seconds * epoch_seconds
    starts = list(range(first, end_s + 1, epoch_seconds))
    manifests: dict[str, dict] = {}
    state_dir: str | None = None
    for i, es in enumerate(starts):
        ee = es + epoch_seconds
        fill_end = end_s if i == len(starts) - 1 else ee - 1
        edir = posixpath.join(out_dir, f"epoch-{es}")
        lineage = {
            "input": transcripts_path,
            "n_buckets": n_buckets,
            "salt": salt,
            "tiers": [t for t, _ in tiers],
            "metrics": list(METRIC_NAMES),
            # epoch blocks stay DENSE (no virtual-fill runs — the epoch
            # mask truncates runs mid-stream), but the BLOCK_SCHEMA grew
            # the 'runs' column, so the stamp must still bump: resuming a
            # pre-runs-column store would mix two file schemas in one
            # stage (pyarrow dataset unification silently drops the new
            # column when an old file is listed first)
            "block_format": "gorilla-columnar-v3-schema-dense-fills",
            "epoch_seconds": epoch_seconds,
            "epoch_start_s": es,
            "fill_end_s": fill_end,
            "state_in": state_dir,
        }
        m = run_one_epoch(
            transcripts_path, edir, es, ee, fill_end, state_dir, lineage,
            n_buckets, salt, tiers,
        )
        for stage, manifest in m.items():
            manifests[f"epoch-{es}/{stage}"] = manifest
        state_dir = posixpath.join(edir, "state")
    return manifests


def read_epochs_stage(out_dir: str, stage: str, tier: str | None = None,
                      metric: str | None = None) -> "rd.Dataset":
    """Read one stage across all committed epochs as a single Dataset;
    tier / metric-name filters push down to the parquet scan."""
    files: list[str] = []
    for edir in epoch_dirs(out_dir):
        files.extend(stage_files(posixpath.join(edir, stage)))
    if not files:
        # every committed epoch was empty (e.g. ingest of an empty source)
        from vertex_ray.schema import BLOCK_SCHEMA

        return rd.from_arrow(BLOCK_SCHEMA.empty_table())
    kwargs = {"override_num_blocks": _target_blocks()}
    expr = None
    if tier is not None:
        expr = pc.field("tier") == tier
    if metric is not None:
        e = pc.field("name") == metric
        expr = e if expr is None else expr & e
    if expr is not None:
        kwargs["filter"] = expr
    ds = rd.read_parquet(files, **kwargs)
    if any(pa.types.is_dictionary(f.type) for f in ds.schema().base_schema):
        from vertex_ray.pipelines.rollup_pipeline import undict_table

        ds = ds.map_batches(undict_table, batch_format="pyarrow")
    return ds
