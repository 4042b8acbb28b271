"""The numpy bucket kernel must match the pandas reference path
bit-for-bit (same agg rows, fills, stale markers, packing)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.pipelines.rollup_pipeline import bucket_rollup_all_tiers
from vertex_ray.schema import TIERS
from vertex_ray.stages.derive import conv_hash64, project_for_rollup_fast
from vertex_ray.stages.fill import unpack_series
from vertex_ray.stages.kernel import bucket_kernel
from vertex_ray.synth import generate_transcripts


def _unpack_df(packed: pa.Table) -> pd.DataFrame:
    df = unpack_series(packed).to_pandas()
    return (
        df.drop(columns=["bucket"])
        .sort_values(["tier", "series_key", "window_start"], kind="stable")
        .reset_index(drop=True)
    )


def run_both(n_turns=20000, salt=1):
    t = generate_transcripts(n_turns)
    fast = project_for_rollup_fast(t, n_buckets=4)
    end = int(t["ts"].cast("int64").to_numpy().max() // 1_000_000)

    # pandas reference path, grouped by the SAME buckets
    pdf = t.to_pandas()
    pdf["bucket"] = fast["bucket"].to_numpy()
    ref_parts = [
        bucket_rollup_all_tiers(g, TIERS, end, salt=salt)
        for _, g in pdf.groupby("bucket")
    ]
    ref = _unpack_df(pa.concat_tables(ref_parts))

    fast_df = fast.to_pandas()
    got_parts = []
    for b, g in fast_df.groupby("bucket"):
        got_parts.append(
            bucket_kernel(
                g["conv_id"].to_numpy(dtype=object),
                g["conv_hash"].to_numpy(),
                g["turn_idx"].to_numpy(),
                g["role_code"].to_numpy(),
                g["tool_code"].to_numpy(),
                g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                TIERS,
                end,
                int(b),
                salt,
            )
        )
    got = _unpack_df(pa.concat_tables(got_parts))
    return ref, got


def assert_bit_identical(ref: pd.DataFrame, got: pd.DataFrame):
    assert len(ref) == len(got)
    assert list(ref.columns) == list(got.columns)
    for col in ref.columns:
        a, b = got[col].to_numpy(), ref[col].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(
                a.view(np.uint64), b.astype(np.float64).view(np.uint64), err_msg=col
            )
        else:
            np.testing.assert_array_equal(a, b, err_msg=col)


def test_kernel_matches_pandas_reference():
    ref, got = run_both(20000)
    assert_bit_identical(ref, got)
    assert ref["stale"].any() and ref["filled"].any()


def test_kernel_salted_equals_unsalted():
    ref, _ = run_both(8000, salt=1)
    got, _ = run_both(8000, salt=4)
    assert_bit_identical(ref, got)


def test_kernel_hash_collision_safe():
    # force two conversations onto the SAME conv_hash: grouping must still
    # split them via the string-equality refinement
    t = generate_transcripts(600)
    fast = project_for_rollup_fast(t, n_buckets=1)
    conv = fast["conv_id"].to_numpy(zero_copy_only=False)
    ch = fast["conv_hash"].to_numpy().copy()
    ch[:] = 42  # all conversations collide
    end = int(t["ts"].cast("int64").to_numpy().max() // 1_000_000)
    out = bucket_kernel(
        conv,
        ch,
        fast["turn_idx"].to_numpy(),
        fast["role_code"].to_numpy(),
        fast["tool_code"].to_numpy(),
        fast["ts"].cast(pa.int64()).to_numpy(),
        TIERS,
        end,
        0,
    )
    df = unpack_series(out).to_pandas()
    # every conversation must still appear as its own series
    n_convs = len(set(conv))
    turns_1m = df[(df["tier"] == "1m") & (df["name"] == "turns_total")]
    got_convs = {k.split("conv_id=")[1].split(",")[0] for k in turns_1m["series_key"]}
    assert len(got_convs) == n_convs
