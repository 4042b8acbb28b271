"""Backfill / out-of-order correction merge (stages/backfill): folding a
late batch's aggregates into a committed store equals full recompute for
decomposable state (sums, counts, min/max, histogram buckets)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from vertex_ray.schema import BUCKET_COLS


def _agg_table(rows):
    n = len(rows["series_key"])
    base = {
        "bucket": np.zeros(n, dtype=np.int32),
        "name": ["m"] * n,
        "kind": np.zeros(n, dtype=np.uint8),
        "tier": ["1m"] * n,
        "filled": [False] * n,
        "stale": [False] * n,
        "last": rows.get("last", np.ones(n)),
    }
    for b in BUCKET_COLS:
        base[b] = rows.get(b, np.zeros(n, dtype=np.int64))
    base.update(rows)
    return pa.table(base)


def test_backfill_merge_decomposable(ray_session):
    import ray.data as rd

    from vertex_ray.stages.backfill import backfill_merge

    base = _agg_table({
        "series_key": ["a", "a", "b"],
        "window_start": [60, 120, 60],
        "sum": [10.0, 20.0, 5.0],
        "count": [2, 4, 1],
        "min": [3.0, 1.0, 5.0],
        "max": [7.0, 9.0, 5.0],
        "b00": np.array([1, 2, 0], dtype=np.int64),
    })
    # late batch: corrects (a, 60), adds a brand-new window (b, 180)
    delta = _agg_table({
        "series_key": ["a", "b"],
        "window_start": [60, 180],
        "sum": [2.5, 1.0],
        "count": [1, 1],
        "min": [0.5, 1.0],
        "max": [2.5, 1.0],
        "b00": np.array([1, 1], dtype=np.int64),
    })
    out = (backfill_merge(rd.from_arrow(base), rd.from_arrow(delta))
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    assert len(out) == 4
    a60 = out.iloc[0]
    assert a60["sum"] == 12.5 and a60["count"] == 3
    assert a60["min"] == 0.5 and a60["max"] == 7.0 and a60["b00"] == 2
    # untouched and new windows pass through
    assert out.iloc[1]["sum"] == 20.0
    assert out.iloc[3]["window_start"] == 180 and out.iloc[3]["count"] == 1


def test_backfill_merge_ignores_fill_rows(ray_session):
    import ray.data as rd

    from vertex_ray.stages.backfill import backfill_merge

    base = _agg_table({
        "series_key": ["a", "a"],
        "window_start": [60, 120],
        "sum": [10.0, 10.0],
        "count": [2, 0],
        "min": [3.0, 3.0],
        "max": [7.0, 7.0],
    })
    base = base.set_column(
        base.schema.get_field_index("filled"), "filled",
        pa.array([False, True]))  # (a, 120) is a LOCF fill row
    delta = _agg_table({
        "series_key": ["a"], "window_start": [120],
        "sum": [4.0], "count": [1], "min": [4.0], "max": [4.0],
    })
    out = (backfill_merge(rd.from_arrow(base), rd.from_arrow(delta))
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    # the fill row is derived state: dropped, replaced by the real point
    assert out.iloc[1]["count"] == 1 and out.iloc[1]["sum"] == 4.0
