"""Scrape-to-store pipeline: exposition text → normalize (absolute→
incremental, counter-reset + first-sample rules) → windowed delta
rollup → Gorilla block rows, decoded back."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vertex_ray.pipelines.scrape_pipeline import scrape_counters_to_store


def _lines(rows):
    return rd.from_arrow(pa.table({"text": rows}))


def _decoded(blocks):
    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks

    df = decode_tier_blocks(blocks).to_pandas()
    return {(r.series_key, int(r.window_start)): float(r.last)
            for r in df.itertuples()}


def test_scrape_counters_roundtrip(ray_session):
    # series a: cumulative 10, 13, 20, 22 at 0s/10s/70s/80s
    #   deltas: (first drops), 3@10s, 7@70s, 2@80s
    #   windows (60s): w0 = 3, w60 = 9
    # series b: reset mid-stream: 5, 8, 2, 6 → deltas 3, 2(reset), 4
    rows = [
        '# TYPE requests_total counter',
        'requests_total{job="a"} 10 0',
        'requests_total{job="a"} 13 10000',
        'requests_total{job="b"} 5 0',
        'requests_total{job="a"} 20 70000',
        'requests_total{job="b"} 8 10000',
        'requests_total{job="b"} 2 70000',
        'requests_total{job="a"} 22 80000',
        'requests_total{job="b"} 6 80000',
        'other_metric{job="a"} 99 0',  # different family: filtered out
    ]
    blocks = scrape_counters_to_store(
        _lines(rows), metric="requests_total", window_s=60, tier="1m",
        n_buckets=4)
    got = _decoded(blocks)
    assert got == {
        ("requests_total{job=a}", 0): 3.0,
        ("requests_total{job=a}", 60): 9.0,
        ("requests_total{job=b}", 0): 3.0,
        ("requests_total{job=b}", 60): 6.0,  # 2 (reset) + 4
    }


def test_scrape_single_sample_series_emits_nothing(ray_session):
    rows = ['m_total{job="solo"} 7 0']
    blocks = scrape_counters_to_store(_lines(rows), metric="m_total",
                                      n_buckets=2)
    assert blocks.count() == 0


def test_scrape_ms_tie_determinism(ray_session):
    # two samples with the SAME ts_ms: the cumulative value is the tie
    # breaker, so the diff order is the construction order
    rows = [
        'c_total{job="t"} 1 0',
        'c_total{job="t"} 4 5000',
        'c_total{job="t"} 9 5000',
    ]
    got = _decoded(scrape_counters_to_store(_lines(rows), metric="c_total",
                                            n_buckets=2))
    assert got == {("c_total{job=t}", 0): 8.0}  # (4-1) + (9-4)
