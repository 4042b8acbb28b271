"""The flagship pipeline: transcripts → 1m/5m/1h/1d Gorilla-compressed
retention tiers (SURVEY.md §3.3).

ONE all-to-all exchange for the whole run:

    read_parquet(transcripts)                     # fragments = input shards
      → map_batches(project_for_rollup)           # prune; text never shuffles
      → groupby("bucket").map_groups(             # THE shuffle
            rollup 1m → cascade 5m/1h/1d → gap-fill → pack per series)
      → write packed stage (commit protocol)
    agg tables:   packed → map_batches(unpack_series)   # no shuffle
    block tables: packed → map_batches(GorillaEncode)   # actor pool, no shuffle

Everything after the bucket groupby is embarrassingly parallel because the
conversation-hash bucket co-locates every series of a conversation: the
continuous-aggregate cascade (coarser windows of the same series), the
gap-fill walk, and the per-series Gorilla blocks all stay inside the
bucket. The cascade consumes the finer tier's aggregate rows — raw turns
are read exactly once.

``global_end`` (the fill horizon for trailing LOCF/stale decisions) comes
from the transcript parquet column statistics — footer metadata only, no
data read.

Every stage write goes through state/checkpoint.write_stage: atomic
rename + manifest, so a rerun resumes (skips validated stages).
"""

from __future__ import annotations

import functools
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from vertex_ray.schema import TIERS
from vertex_ray.stages.derive import PROJECT_COLUMNS, project_for_rollup
from vertex_ray.stages.encode import GorillaEncode, decode_blocks_batch
from vertex_ray.stages.fill import fill_bucket_df, pack_series, unpack_series
from vertex_ray.stages.rollup import merge_agg, rollup_bucket
from vertex_ray.state.checkpoint import (
    read_manifest,
    stage_done,
    stage_files,
    write_stage,
)

DEFAULT_N_BUCKETS = 64


def _target_blocks() -> int:
    """Blocks sized to the session: parallelism downstream of a read (and
    of the sort shuffle) is bounded by the input block count, so a
    3-file input must still fan out to ~4 blocks per CPU."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return 4 * cpus


def read_transcripts(path: str) -> "rd.Dataset":
    return rd.read_parquet(
        path, columns=PROJECT_COLUMNS, override_num_blocks=_target_blocks()
    )


def transcripts_end_ts(path: str) -> int:
    """Max transcript timestamp in epoch seconds, from parquet footer
    statistics only (no data read)."""
    end = None
    files = (
        stage_files(path)
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.max is not None:
                v = st.max
                v = int(v.timestamp()) if hasattr(v, "timestamp") else int(v) // 1_000_000
                end = v if end is None else max(end, v)
    if end is None:
        raise ValueError(f"no ts statistics in {path}")
    return end


def bucket_rollup_all_tiers(
    group: pd.DataFrame,
    tiers,
    global_end_s: int,
    salt: int = 1,
) -> pa.Table:
    """Per-bucket group body: raw pruned turns → packed per-series arrays
    for every retention tier (rollup → cascade → fill → pack)."""
    base_tier, base_seconds = tiers[0]
    agg = rollup_bucket(group, base_seconds, salt)
    parts = []
    prev = agg
    for tier, seconds in tiers:
        if seconds != base_seconds:
            prev = merge_agg(prev, seconds)
        filled = fill_bucket_df(prev, seconds, global_end_s // seconds * seconds)
        packed = pack_series(filled)
        parts.append(
            packed.append_column(
                "tier", pa.array([tier] * packed.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)


def packed_dataset(
    transcripts: "rd.Dataset",
    global_end_s: int,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: int = 1,
    tiers=TIERS,
) -> "rd.Dataset":
    projected = transcripts.map_batches(
        functools.partial(project_for_rollup, n_buckets=n_buckets),
        batch_format="pyarrow",
    )
    return projected.groupby("bucket").map_groups(
        functools.partial(
            bucket_rollup_all_tiers,
            tiers=tiers,
            global_end_s=global_end_s,
            salt=salt,
        ),
        batch_format="pandas",
    )


def default_encode_concurrency() -> int:
    """Actor-pool size that leaves headroom for the read and write stages —
    a pool reserving every CPU starves its producers and serializes the
    pipeline (observed: at 8 CPUs an 8-actor pool deadlocked the scan)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, cpus - 2)


def encode_blocks(packed: "rd.Dataset", concurrency: int | None = None) -> "rd.Dataset":
    return packed.map_batches(
        GorillaEncode,
        batch_format="pyarrow",
        batch_size=64,  # ~300 windows × 17 streams per series row → a few MB
        concurrency=min(concurrency or 10**9, default_encode_concurrency()),
        num_cpus=1,
    )


def agg_rows(packed: "rd.Dataset") -> "rd.Dataset":
    return packed.map_batches(unpack_series, batch_format="pyarrow")


def decode_tier_blocks(blocks: "rd.Dataset") -> "rd.Dataset":
    return blocks.map_batches(decode_blocks_batch, batch_format="pyarrow")


def pipeline_paths(out_dir: str) -> dict[str, str]:
    return {
        "packed": os.path.join(out_dir, "packed"),
        "agg": os.path.join(out_dir, "agg"),
        "blocks": os.path.join(out_dir, "blocks"),
    }


def read_stage(out_dir: str, stage: str, tier: str | None = None) -> "rd.Dataset":
    """Read a committed stage; optional tier filter is pushed down to the
    parquet scan (row-group pruning + late materialization)."""
    path = pipeline_paths(out_dir)[stage]
    kwargs = {"override_num_blocks": _target_blocks()}
    if tier is not None:
        kwargs["filter"] = pc.field("tier") == tier
    return rd.read_parquet(stage_files(path), **kwargs)


def run_pipeline(
    transcripts_path: str,
    out_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt: int = 1,
    encode_concurrency: int | None = None,
    tiers=TIERS,
) -> dict:
    """Run (or resume) the full tier cascade. Returns per-stage manifests."""
    paths = pipeline_paths(out_dir)
    manifests: dict[str, dict] = {}

    if stage_done(paths["packed"]):
        manifests["packed"] = read_manifest(paths["packed"])
    else:
        end = transcripts_end_ts(transcripts_path)
        packed = packed_dataset(
            read_transcripts(transcripts_path), end, n_buckets, salt, tiers
        )
        manifests["packed"] = write_stage(
            packed,
            paths["packed"],
            {
                "input": transcripts_path,
                "n_buckets": n_buckets,
                "salt": salt,
                "global_end_s": end,
                "tiers": [t for t, _ in tiers],
            },
        )

    for stage, builder in (
        ("agg", lambda ds: agg_rows(ds)),
        ("blocks", lambda ds: encode_blocks(ds, encode_concurrency)),
    ):
        if stage_done(paths[stage]):
            manifests[stage] = read_manifest(paths[stage])
        else:
            ds = rd.read_parquet(
                stage_files(paths["packed"]), override_num_blocks=_target_blocks()
            )
            manifests[stage] = write_stage(
                builder(ds), paths[stage], {"input": paths["packed"]}
            )
    return manifests
