"""Summary metric kind (stages/summary): exact quantile_disc parity and
the reference's NO-OP merge cascade (MetricValue::Summary,
/root/reference lib/event/src/metric/mod.rs:33-39, merge at :42-64)."""

import numpy as np
import pyarrow as pa
import pytest

from vertex_ray.stages.summary import (
    _latency_summary_bucket,
    summary_segments,
)


def test_quantile_disc_rank_convention():
    # one segment of 1..10: rank = max(ceil(q*n)-1, 0) → q50=5, q90=9, q99=10
    vals = np.arange(1.0, 11.0)
    counts, sums, (q50, q90, q99) = summary_segments(
        vals, np.array([0], dtype=np.int64), (0.5, 0.9, 0.99)
    )
    assert counts.tolist() == [10] and sums.tolist() == [55.0]
    assert (q50[0], q90[0], q99[0]) == (5.0, 9.0, 10.0)


def test_quantile_single_element_and_ties():
    # n=1 → every quantile is the element; ties stay exact
    vals = np.array([7.0, 2.0, 2.0, 2.0])
    starts = np.array([0, 1], dtype=np.int64)
    counts, sums, (q50,) = summary_segments(vals, starts, (0.5,))
    assert counts.tolist() == [1, 3]
    assert q50.tolist() == [7.0, 2.0]


def _bucket_table(rows):
    conv, turn, ts = zip(*rows)
    conv = np.asarray(conv, dtype=object)
    ch = np.zeros(len(conv), dtype=np.int64)
    for i, c in enumerate(sorted(set(conv))):
        ch[conv == c] = i + 11
    return pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "conv_hash": pa.array(ch, type=pa.int64()),
        "turn_idx": pa.array(np.asarray(turn, np.int32)),
        "ts": pa.array(np.asarray(ts, np.int64), type=pa.timestamp("us")),
    })


def test_firstwins_cascade_is_noop_merge():
    # conv a: turns at 0, 10s, 70s, 130s → latencies 10 (window 0),
    # 60 (window 60), 60 (window 120). 1h window 0 must keep ONLY the
    # first 1m state (window 0: count=1, sum=10, q*=10) — merge is a no-op.
    rows = [("a", 0, 0), ("a", 1, 10_000_000),
            ("a", 2, 70_000_000), ("a", 3, 130_000_000)]
    t = _bucket_table(rows)
    fine = _latency_summary_bucket(t, 60, (0.5, 0.99), None).to_pydict()
    assert fine["window_start"] == [0, 60, 120]
    assert fine["count"] == [1, 1, 1]
    assert fine["q50"] == [10.0, 60.0, 60.0]

    coarse = _latency_summary_bucket(t, 60, (0.5, 0.99), 3600).to_pydict()
    assert coarse["window_start"] == [0]
    assert coarse["count"] == [1]
    assert coarse["sum"] == [10.0]
    assert coarse["q50"] == [10.0] and coarse["q99"] == [10.0]


def test_multi_series_segments_independent():
    # two conversations interleaved in the same bucket; same windows
    rows = [("a", 0, 0), ("a", 1, 5_000_000), ("a", 2, 8_000_000),
            ("b", 0, 0), ("b", 1, 30_000_000)]
    t = _bucket_table(rows)
    out = _latency_summary_bucket(t, 60, (0.5,), None).to_pydict()
    by_key = dict(zip(out["series_key"], zip(out["count"], out["sum"], out["q50"])))
    # q50 of {3, 5}: rank ceil(0.5*2)-1 = 0 → 3.0 (quantile_disc)
    assert by_key["inter_turn_latency_seconds{conv_id=a}"] == (2, 8.0, 3.0)
    assert by_key["inter_turn_latency_seconds{conv_id=b}"] == (1, 30.0, 30.0)


def test_empty_bucket_table():
    t = _bucket_table([("a", 0, 0)])  # single turn → no latency rows
    out = _latency_summary_bucket(t, 60, (0.5, 0.9, 0.99), None)
    assert out.num_rows == 0
    assert out.column_names == [
        "series_key", "window_start", "count", "sum", "q50", "q90", "q99"
    ]
