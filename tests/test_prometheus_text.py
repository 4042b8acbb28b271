"""Prometheus text exposition codec: parse, TYPE-driven regrouping
(_bucket/_sum/_count suffix routing, le/quantile extraction), escaping,
and the encode side (prometheus render + influx line protocol).
Semantics mirror /root/reference/lib/prometheus/src/{text.rs,lib.rs}."""

import numpy as np
import pandas as pd
import pytest

from vertex_ray.sources.prometheus_text import (
    extract_type_map,
    group_samples,
    parse_exposition,
    parse_samples,
    render_influx_lines,
    render_prometheus_lines,
)

DOC = """\
# HELP http_requests_total Total requests.
# TYPE http_requests_total counter
http_requests_total{method="get",code="200"} 1027 1712000000000
http_requests_total{method="post",code="200"} 3 1712000000000
# TYPE temp_celsius gauge
temp_celsius{host="a\\"b,c=d"} -3.5
# TYPE rpc_seconds histogram
rpc_seconds_bucket{le="0.1",svc="s"} 2 1712000000000
rpc_seconds_bucket{le="0.5",svc="s"} 5 1712000000000
rpc_seconds_bucket{le="+Inf",svc="s"} 6 1712000000000
rpc_seconds_sum{svc="s"} 1.7 1712000000000
rpc_seconds_count{svc="s"} 6 1712000000000
# TYPE api_latency summary
api_latency{quantile="0.5"} 0.23
api_latency{quantile="0.99"} 1.9
api_latency_sum 88.5
api_latency_count 400
mystery_metric{x="1"} 7.25
"""


def test_type_map_and_flat_parse():
    lines = pd.Series(DOC.splitlines())
    tm = extract_type_map(lines)
    assert tm == {
        "http_requests_total": "counter",
        "temp_celsius": "gauge",
        "rpc_seconds": "histogram",
        "api_latency": "summary",
    }
    s = parse_samples(lines)
    assert len(s) == 13  # comments dropped
    row = s[s["name"] == "temp_celsius"].iloc[0]
    assert row["tags"] == 'host="a"b,c=d"'  # \" unescaped once
    assert row["value"] == -3.5 and row["ts_ms"] == -1
    le = s[s["name"] == "rpc_seconds_bucket"]["le"].to_numpy()
    assert list(le) == [0.1, 0.5, np.inf]
    # le excluded from the group-key tags (reference lib.rs:189)
    assert set(s[s["name"] == "rpc_seconds_bucket"]["tags"]) == {'svc="s"'}


def test_grouping_suffix_routing():
    g = parse_exposition(DOC).set_index("name")
    c = g.loc["http_requests_total"]
    assert set(c["kind"]) == {"counter"} and len(c) == 2
    h = g.loc["rpc_seconds"]
    assert h["kind"] == "histogram"
    assert h["buckets"] == [(0.1, 2), (0.5, 5), (np.inf, 6)]
    assert h["sum"] == 1.7 and h["count"] == 6 and h["ts_ms"] == 1712000000000
    sm = g.loc["api_latency"]
    assert sm["kind"] == "summary"
    assert sm["quantiles"] == [(0.5, 0.23), (0.99, 1.9)]
    assert sm["sum"] == 88.5 and sm["count"] == 400
    # no TYPE line → untyped passthrough (reference GroupKind::Untyped)
    m = g.loc["mystery_metric"]
    assert m["kind"] == "untyped" and m["value"] == 7.25


def test_group_key_is_timestamp_and_labels():
    doc = """\
# TYPE c counter
c{a="x"} 1 1000
c{a="x"} 2 2000
c{a="y"} 3 1000
"""
    g = parse_exposition(doc)
    assert len(g) == 3  # distinct (labels, ts) → distinct groups
    assert sorted(zip(g["tags"], g["ts_ms"], g["value"])) == [
        ('a="x"', 1000, 1.0), ('a="x"', 2000, 2.0), ('a="y"', 1000, 3.0)]


def test_render_prometheus_and_influx():
    lines = render_prometheus_lines(
        "turns_total",
        {"conv_id": np.array(["c1", "c2"], dtype=object),
         "role": np.array(["user", "assistant"], dtype=object)},
        np.array([5, 7], dtype=np.int64),
        np.array([60000, 120000], dtype=np.int64),
    ).to_pylist()
    assert lines == [
        'turns_total{conv_id="c1",role="user"} 5 60000',
        'turns_total{conv_id="c2",role="assistant"} 7 120000',
    ]
    # rendered output must parse back to the same samples (round-trip)
    back = parse_samples(pd.Series(lines))
    assert list(back["value"]) == [5.0, 7.0] and list(back["ts_ms"]) == [60000, 120000]

    il = render_influx_lines(
        "turns",
        {"conv": np.array(["a b", "c,d"], dtype=object)},
        "count",
        np.array([5, 7], dtype=np.int64),
        np.array([60_000_000_000, 120_000_000_000], dtype=np.int64),
    ).to_pylist()
    assert il == [
        r"turns,conv=a\ b count=5i 60000000000",
        r"turns,conv=c\,d count=7i 120000000000",
    ]
