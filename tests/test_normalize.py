"""Metric normalization (absolute <-> incremental counter) semantics.

Contract mirrored from the reference's MetricNormalize/MetricsBuffer
(/root/reference/lib/framework/src/sink/buffer/metrics.rs:100-146):
first observation primes state and emits nothing; a decrease is a
counter reset emitting the new value itself.
"""

import numpy as np
import pandas as pd
import pytest


def _ds(rows):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame(rows))


def test_absolute_to_incremental_deltas_and_reset(ray_session):
    from vertex_ray.stages.normalize import absolute_to_incremental

    rows = pd.DataFrame(
        {
            "key": ["a"] * 4 + ["b"] * 2,
            "ts": [1, 2, 3, 4, 1, 2],
            "tie": [0, 1, 2, 3, 4, 5],
            # a: 10 -> 15 -> 3 (reset) -> 8 ; b: 7 -> 7
            "value": [10.0, 15.0, 3.0, 8.0, 7.0, 7.0],
        }
    )
    out = (
        absolute_to_incremental(_ds(rows), ["key"], "ts", "value", "tie")
        .to_pandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    assert list(out["key"]) == ["a", "a", "a", "b"]
    # 15-10, reset->3, 8-3, 7-7
    assert list(out["delta"]) == [5.0, 3.0, 5.0, 0.0]
    assert "value" not in out.columns


def test_absolute_to_incremental_single_observation_emits_nothing(ray_session):
    from vertex_ray.stages.normalize import absolute_to_incremental

    rows = pd.DataFrame({"key": ["x"], "ts": [1], "tie": [0], "value": [42.0]})
    out = absolute_to_incremental(_ds(rows), ["key"], "ts", "value", "tie").to_pandas()
    assert len(out) == 0


def test_incremental_to_absolute_running_total(ray_session):
    from vertex_ray.stages.normalize import incremental_to_absolute

    rows = pd.DataFrame(
        {
            "key": ["a"] * 3 + ["b"] * 2,
            "ts": [1, 2, 3, 1, 2],
            "tie": [0, 1, 2, 3, 4],
            "value": np.array([5, 2, 4, 1, 1], dtype=np.int64),
        }
    )
    out = (
        incremental_to_absolute(_ds(rows), ["key"], "ts", "value", "tie")
        .to_pandas()
        .sort_values(["key", "ts"])
        .reset_index(drop=True)
    )
    assert list(out["total"]) == [5, 7, 11, 1, 2]
    assert out["total"].dtype == np.int64


def test_roundtrip_monotonic_series(ray_session):
    """abs -> inc -> abs reconstructs v - v[0] for non-decreasing series."""
    from vertex_ray.stages.normalize import (
        absolute_to_incremental,
        incremental_to_absolute,
    )

    v = np.cumsum(np.array([3, 0, 2, 7, 1], dtype=np.float64)) + 10.0
    rows = pd.DataFrame(
        {
            "key": ["s"] * 5,
            "ts": np.arange(5),
            "tie": np.arange(5),
            "value": v,
        }
    )
    inc = absolute_to_incremental(_ds(rows), ["key"], "ts", "value", "tie")
    back = (
        incremental_to_absolute(inc, ["key"], "ts", "delta", "tie", out_col="total")
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(back["total"].to_numpy(), v[1:] - v[0])
