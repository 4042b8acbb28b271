"""The flagship pipeline: transcripts → 1m/5m/1h/1d Gorilla-compressed
retention tiers (SURVEY.md §3.3).

    read_parquet(transcripts)                    # fragments = input shards
      → map_batches(project_for_rollup)          # prune; text never shuffles
      → groupby("bucket").map_groups(rollup)     # THE shuffle (1 per run)
      → write tier=1m agg (commit protocol)
    5m/1h/1d: read previous tier's agg output → merge partials (continuous
      aggregate — raw turns are never re-read)
    each tier: agg → map_groups(gap-fill + pack) → map_batches(GorillaEncode
      actor pool) → write tier blocks

Every stage write goes through state/checkpoint.write_stage: atomic
rename + manifest, so a rerun resumes (skips validated stages).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import pyarrow.dataset as pads

import ray.data as rd

from vertex_ray.schema import TIERS
from vertex_ray.stages.derive import PROJECT_COLUMNS, project_for_rollup
from vertex_ray.stages.encode import GorillaEncode, decode_blocks_batch
from vertex_ray.stages.fill import fill_bucket_df, pack_series
from vertex_ray.stages.rollup import merge_agg, rollup_bucket
from vertex_ray.state.checkpoint import read_manifest, stage_done, stage_files, write_stage

DEFAULT_N_BUCKETS = 64


def read_transcripts(path: str) -> "rd.Dataset":
    return rd.read_parquet(path, columns=PROJECT_COLUMNS)


def tier_1m_agg(
    transcripts: "rd.Dataset", n_buckets: int = DEFAULT_N_BUCKETS, salt: int = 1
) -> "rd.Dataset":
    projected = transcripts.map_batches(
        functools.partial(project_for_rollup, n_buckets=n_buckets),
        batch_format="pyarrow",
    )
    return projected.groupby("bucket").map_groups(
        functools.partial(rollup_bucket, window_seconds=60, salt=salt),
        batch_format="pandas",
    )


def cascade_agg(prev_agg: "rd.Dataset", coarse_seconds: int) -> "rd.Dataset":
    """Continuous aggregate: finer-tier rows → coarser windows. Partials
    merge associatively, so pre-combine per batch, then finalize per
    bucket (the bucket key is carried from tier 1m — same partitioning
    across every tier)."""
    partial = prev_agg.map_batches(
        functools.partial(merge_agg, window_seconds=coarse_seconds),
        batch_format="pandas",
    )
    return partial.groupby("bucket").map_groups(
        functools.partial(merge_agg, window_seconds=coarse_seconds),
        batch_format="pandas",
    )


def fill_pack(agg: "rd.Dataset", window_seconds: int, global_end_window: int) -> "rd.Dataset":
    def fn(group):
        return pack_series(
            fill_bucket_df(group, window_seconds, global_end_window)
        )

    return agg.groupby("bucket").map_groups(fn, batch_format="pandas")


def encode_tier(packed: "rd.Dataset", tier: str, concurrency: int = 4) -> "rd.Dataset":
    return packed.map_batches(
        GorillaEncode,
        fn_constructor_args=(tier,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


def decode_tier_blocks(blocks: "rd.Dataset") -> "rd.Dataset":
    return blocks.map_batches(decode_blocks_batch, batch_format="pyarrow")


def _max_window(agg_dir: str) -> int:
    from vertex_ray.state.checkpoint import stage_files as _sf
    tbl = pads.dataset(_sf(agg_dir)).to_table(columns=["window_start"])
    return int(np.max(tbl["window_start"].to_numpy())) if tbl.num_rows else 0


def tier_paths(out_dir: str, tier: str) -> tuple[str, str]:
    return (
        os.path.join(out_dir, f"tier={tier}", "agg"),
        os.path.join(out_dir, f"tier={tier}", "blocks"),
    )


def run_pipeline(
    transcripts_path: str,
    out_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: int = 1,
    encode_concurrency: int = 4,
    tiers=TIERS,
) -> dict:
    """Run (or resume) the full tier cascade. Returns per-stage manifests."""
    manifests: dict[str, dict] = {}
    prev_agg_dir = None
    for i, (tier, seconds) in enumerate(tiers):
        agg_dir, _ = tier_paths(out_dir, tier)
        if stage_done(agg_dir):
            manifests[f"{tier}/agg"] = read_manifest(agg_dir)
        else:
            if i == 0:
                agg = tier_1m_agg(read_transcripts(transcripts_path), n_buckets, salt)
                lineage = {"input": transcripts_path, "n_buckets": n_buckets, "salt": salt}
            else:
                agg = cascade_agg(rd.read_parquet(stage_files(prev_agg_dir)), seconds)
                lineage = {"input": prev_agg_dir, "window_seconds": seconds}
            manifests[f"{tier}/agg"] = write_stage(agg, agg_dir, lineage)
        prev_agg_dir = agg_dir

    for tier, seconds in tiers:
        agg_dir, blocks_dir = tier_paths(out_dir, tier)
        if stage_done(blocks_dir):
            manifests[f"{tier}/blocks"] = read_manifest(blocks_dir)
            continue
        end = _max_window(agg_dir) // seconds * seconds
        packed = fill_pack(rd.read_parquet(stage_files(agg_dir)), seconds, end)
        blocks = encode_tier(packed, tier, encode_concurrency)
        manifests[f"{tier}/blocks"] = write_stage(
            blocks, blocks_dir, {"input": agg_dir, "global_end_window": end}
        )
    return manifests
