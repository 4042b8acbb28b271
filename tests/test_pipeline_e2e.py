"""End-to-end flagship pipeline on Ray: tier cascade vs brute-force oracle,
text-equality invariant, resume-after-kill (FIXTURES.md §F8)."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from vertex_ray.state.checkpoint import stage_files
import pytest

from vertex_ray.aggregate import rollup_oracle
from vertex_ray.schema import BUCKET_COLS, TIER_SECONDS
from vertex_ray.stages.derive import derive_points_arrays
from vertex_ray.synth import ensure_transcripts


@pytest.fixture(scope="module")
def pipeline_out(ray_session, tmp_path_factory):
    trans = ensure_transcripts(0.001, base="/tmp/vertex_ray_testdata")
    out = str(tmp_path_factory.mktemp("tiers"))
    from vertex_ray.pipelines.rollup_pipeline import run_pipeline

    manifests = run_pipeline(trans, out, n_buckets=8, encode_concurrency=2)
    return trans, out, manifests


def oracle_points(trans_dir):
    t = (
        pads.dataset(trans_dir)
        .to_table(columns=["conv_id", "turn_idx", "role", "tool", "ts"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
    )
    return derive_points_arrays(
        t["conv_id"].to_numpy(dtype=object),
        t["turn_idx"].to_numpy(),
        t["role"].to_numpy(dtype=object),
        t["tool"].to_numpy(dtype=object),
        t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
    )


def test_all_tiers_match_oracle(pipeline_out):
    trans, out, manifests = pipeline_out
    pts = oracle_points(trans)
    for tier, seconds in TIER_SECONDS.items():
        agg = pads.dataset(stage_files(os.path.join(out, f"tier={tier}", "agg"))).to_table().to_pandas()
        oracle = rollup_oracle(
            pts["series_key"], pts["kind"], pts["value"], pts["ts"], seconds
        )
        assert len(agg) == len(oracle), tier
        for row in agg.sample(min(2000, len(agg)), random_state=1).itertuples():
            st = oracle[(row.series_key, row.window_start)]
            assert row.sum == st.sum and row.count == st.count
            assert row.min == st.min and row.max == st.max
            assert row.last == st.last and row.last_ts == st.last_ts
            np.testing.assert_array_equal(
                [getattr(row, b) for b in BUCKET_COLS], st.bucket_counts
            )


def test_decoded_blocks_match_agg_bit_for_bit(pipeline_out):
    import ray.data as rd

    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks

    trans, out, _ = pipeline_out
    tier = "1m"
    blocks = rd.read_parquet(stage_files(os.path.join(out, f"tier={tier}", "blocks")))
    dec = decode_tier_blocks(blocks).to_pandas()
    agg = pads.dataset(stage_files(os.path.join(out, f"tier={tier}", "agg"))).to_table().to_pandas()
    real = dec[~dec["filled"] & ~dec["stale"]]
    assert len(real) == len(agg)
    a = real.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    b = agg.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    for col in ("sum", "min", "max", "last"):
        np.testing.assert_array_equal(
            a[col].to_numpy(np.float64).view(np.uint64),
            b[col].to_numpy(np.float64).view(np.uint64),
        )
    np.testing.assert_array_equal(a["count"].to_numpy(np.int64), b["count"].to_numpy())
    np.testing.assert_array_equal(a["window_start"].to_numpy(), b["window_start"].to_numpy())
    # stale markers exist and decoded flags mark them
    assert dec["stale"].sum() > 0 and dec["filled"].sum() > 0


def test_text_equality_under_stable_ordering(pipeline_out, ray_session):
    """Per-turn text equality between input and a Ray passthrough
    projection under (conv_id, turn_idx) sort — BASELINE input_hint."""
    import ray.data as rd

    trans, _, _ = pipeline_out
    via_ray = (
        rd.read_parquet(trans, columns=["conv_id", "turn_idx", "text"])
        .sort(["conv_id", "turn_idx"])
        .to_pandas()
    )
    direct = (
        pads.dataset(trans)
        .to_table(columns=["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_ray, direct)


def test_resume_after_partial_failure(pipeline_out):
    """Deleting one tier's outputs and re-running regenerates exactly the
    same content; completed stages are skipped (manifest reuse)."""
    from vertex_ray.pipelines.rollup_pipeline import run_pipeline

    trans, out, _ = pipeline_out
    tier_dir = os.path.join(out, "tier=1h")
    before = pads.dataset(stage_files(os.path.join(tier_dir, "agg"))).to_table().to_pandas()
    before = before.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    agg_1m = os.path.join(out, "tier=1m", "agg")
    mtime_1m = os.path.getmtime(os.path.join(agg_1m, "manifest.json"))
    shutil.rmtree(tier_dir)
    run_pipeline(trans, out, n_buckets=8, encode_concurrency=2)
    after = pads.dataset(stage_files(os.path.join(tier_dir, "agg"))).to_table().to_pandas()
    after = after.sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after, check_exact=True)
    # untouched tiers were NOT recomputed
    assert os.path.getmtime(os.path.join(agg_1m, "manifest.json")) == mtime_1m
