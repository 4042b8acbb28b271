"""Sparse exponential-bucket histogram (native-histogram analogue):
power-of-2 bucket mapping, zero bucket, mergeable cascade, quantile read."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _transcripts(rows):
    # rows: (conv_id, turn_idx, ts_us)
    conv, turn, ts = zip(*rows)
    return pa.table({
        "conv_id": list(conv),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": ["user"] * len(conv),
        "text": ["x"] * len(conv),
        "tool": [""] * len(conv),
        "ts": pa.array(list(ts), type=pa.timestamp("us")),
    })


def test_exphist_bucket_mapping_and_zero(ray_session):
    import ray.data as rd

    from vertex_ray.stages.exphist import latency_exp_histogram

    base = 1_700_000_000_000_000
    rows = [
        ("c1", 0, base),
        ("c1", 1, base),              # lat 0 us -> zero bucket (idx -1)
        ("c1", 2, base + 1),          # lat 1 us -> idx 0
        ("c1", 3, base + 1 + 7),      # lat 7 us -> idx 2 ([4, 8))
        ("c1", 4, base + 8 + 8),      # lat 8 us -> idx 3 (exact power)
    ]
    out = (latency_exp_histogram(rd.from_arrow(_transcripts(rows)), 60)
           .to_pandas().sort_values("idx").reset_index(drop=True))
    assert out["idx"].tolist() == [-1, 0, 2, 3]
    assert out["bucket_count"].tolist() == [1, 1, 1, 1]
    assert (out["series_key"] == "inter_turn_latency_us{conv_id=c1}").all()


def test_exphist_merge_cascade_sums_counts(ray_session):
    import ray.data as rd

    from vertex_ray.stages.exphist import latency_exp_histogram

    # two latencies in the same 2^idx bucket but different 1m windows of
    # one 1h window -> coarse row sums them
    base = 1_700_000_000_000_000
    m = 60 * 1_000_000
    rows = [
        ("c1", 0, base),
        ("c1", 1, base + 5),          # idx 2, window 0
        ("c1", 2, base + 2 * m),      # big gap -> large idx, window 2m
        ("c1", 3, base + 2 * m + 6),  # idx 2, window 2 (same 1h window)
    ]
    ds = rd.from_arrow(_transcripts(rows))
    fine = latency_exp_histogram(ds, 60).to_pandas()
    merged = latency_exp_histogram(ds, 60, coarse_seconds=3600).to_pandas()
    f2 = fine[fine["idx"] == 2]
    assert len(f2) == 2 and f2["bucket_count"].tolist() == [1, 1]
    m2 = merged[merged["idx"] == 2]
    assert len(m2) == 1 and m2["bucket_count"].tolist() == [2]
    assert fine["bucket_count"].sum() == merged["bucket_count"].sum()


def test_exphist_quantile_upper_bound(ray_session):
    import ray.data as rd

    from vertex_ray.stages.exphist import exp_histogram_quantile

    rows = pa.table({
        "series_key": ["s"] * 3 + ["z"],
        "window_start": [60] * 3 + [60],
        "idx": pa.array([0, 2, 5, -1], type=pa.int32()),
        "bucket_count": pa.array([8, 1, 1, 3], type=pa.int64()),
    })
    out = (exp_histogram_quantile(rd.from_arrow(rows), 0.5, out_col="p50")
           .to_pandas().sort_values("series_key").reset_index(drop=True))
    # s: total 10, rank 5 -> idx 0 bucket (cum 8 >= 5) -> 2^1 = 2.0
    # z: all zeros -> 0.0
    assert out["p50"].tolist() == [2.0, 0.0]
    out99 = (exp_histogram_quantile(rd.from_arrow(rows), 0.99, out_col="p")
             .to_pandas().sort_values("series_key").reset_index(drop=True))
    # s: rank ceil(9.9)=10 -> last bucket idx 5 -> 2^6 = 64.0
    assert out99["p"].tolist() == [64.0, 0.0]


def test_exphist_fraction_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.exphist import exp_histogram_fraction

    rows = pa.table({
        "series_key": ["s"] * 4,
        "window_start": np.array([0, 0, 0, 0], dtype=np.int64),
        "idx": np.array([-1, 3, 5, 9], dtype=np.int32),
        "bucket_count": np.array([1, 2, 3, 4], dtype=np.int64),
    })
    out = exp_histogram_fraction(rd.from_arrow(rows), 3, 5).to_pandas()
    assert out.fraction.tolist() == [(2 + 3) / 10.0]
    # zero bucket via idx -1
    z = exp_histogram_fraction(rd.from_arrow(rows), -1, -1).to_pandas()
    assert z.fraction.tolist() == [0.1]


def test_exphist_stddev_midpoint_estimator(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.exphist import exp_histogram_stddev

    # two obs in bucket 2 (mid 6.0), one in bucket 3 (mid 12.0)
    rows = pa.table({
        "series_key": ["s", "s"],
        "window_start": np.array([0, 0], dtype=np.int64),
        "idx": np.array([2, 3], dtype=np.int32),
        "bucket_count": np.array([2, 1], dtype=np.int64),
    })
    out = exp_histogram_stddev(rd.from_arrow(rows)).to_pandas()
    s, s2, n = 2 * 6.0 + 12.0, 2 * 36.0 + 144.0, 3.0
    assert out.stddev.tolist() == [np.sqrt((s2 - s * s / n) / n)]
    var = exp_histogram_stddev(rd.from_arrow(rows), variance=True,
                               out_col="v").to_pandas()
    assert var.v.tolist() == [(s2 - s * s / n) / n]


def test_exp_histogram_moments(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.exphist import exp_histogram_moments

    # series a, window 0: zero-bucket x2, idx 3 [8,16) x3, idx 4 x1
    rows = pa.table({
        "series_key": ["a"] * 3 + ["b"],
        "window_start": np.array([0, 0, 0, 60], dtype=np.int64),
        "idx": np.array([-1, 3, 4, 2], dtype=np.int32),
        "bucket_count": np.array([2, 3, 1, 5], dtype=np.int64),
    })
    out = (exp_histogram_moments(rd.from_arrow(rows)).to_pandas()
           .sort_values("series_key").reset_index(drop=True))
    a = out.iloc[0]
    assert a["count"] == 6
    want_sum = 3 * (8 + 16) / 2 + 1 * (16 + 32) / 2  # zeros add 0
    assert a.sum_est == want_sum and a.avg_est == want_sum / 6
    b = out.iloc[1]
    assert b["count"] == 5 and b.sum_est == 5 * (4 + 8) / 2
