"""Prometheus remote-write wire format (sources/remote_write) — golden
bytes, round-trip, and label-set canonicalization. Mirrors the gate the
reference's sink protocol implies (prometheus_remote_write.rs:152-181:
WriteRequest protobuf; snappy framing gated on lib availability)."""

import numpy as np
import pyarrow as pa

from vertex_ray.sources.remote_write import (
    decode_write_request,
    encode_write_request,
    remote_write_encode_op,
    split_series_key,
)


def test_golden_bytes_single_sample():
    # one series, one label, one sample — stable proto3 wire bytes
    # (field order follows schema numbering; upb serializes in order)
    data = encode_write_request(
        ["turns_total"], [1700000000000], [1.5])
    assert data.hex() == (
        "0a2b0a170a085f5f6e616d655f5f120b7475726e735f746f74616c"
        "121009000000000000f83f1080d095ffbc31")


def test_roundtrip_multi_series_sorted_and_exact():
    keys = ["m{a=1,b=x}", "m{a=2}", "m{a=1,b=x}", "plain"]
    ts = [2000, 1000, 1000, 3000]
    vals = [0.1, -2.5, float(2**53 + 1), 0.0]
    payload = encode_write_request(keys, ts, vals)
    out = decode_write_request(payload).to_pandas()
    # deterministic (series, ts) order; float64 values bit-exact
    assert out["series_key"].tolist() == [
        "m{a=1,b=x}", "m{a=1,b=x}", "m{a=2}", "plain"]
    assert out["ts_ms"].tolist() == [1000, 2000, 1000, 3000]
    assert out["value"].tolist() == [float(2**53 + 1), 0.1, -2.5, 0.0]


def test_split_series_key():
    assert split_series_key("n{k=v,z=9}") == ("n", [("k", "v"), ("z", "9")])
    assert split_series_key("bare") == ("bare", [])


def test_encode_op_batch_shape():
    t = pa.table({
        "series_key": ["a{x=1}", "a{x=1}", "b"],
        "ts_ms": pa.array([1, 2, 1], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    out = remote_write_encode_op()(t)
    assert out.num_rows == 1
    assert out["codec"][0].as_py() in ("raw", "snappy")
    assert out["n_series"][0].as_py() == 2
    assert out["n_samples"][0].as_py() == 3
    dec = decode_write_request(out["payload"][0].as_py(),
                               out["codec"][0].as_py())
    assert dec.num_rows == 3


def test_nan_payload_survives():
    # Prometheus stale-marker NaN payload must round-trip bit-for-bit
    stale = np.frombuffer(
        np.uint64(0x7FF0000000000002).tobytes(), dtype=np.float64)[0]
    payload = encode_write_request(["s"], [0], [stale])
    v = decode_write_request(payload)["value"][0].as_py()
    assert np.frombuffer(np.float64(v).tobytes(),
                         dtype=np.uint64)[0] == 0x7FF0000000000002


def test_read_request_roundtrip():
    from vertex_ray.sources.remote_write import (
        ReadRequest,
        encode_read_request,
    )

    req = encode_read_request([{
        "start_ms": 1000, "end_ms": 2000,
        "matchers": [("__name__", "=", "m"), ("role", "=~", "u.*"),
                     ("tool", "!=", "x"), ("conv_id", "!~", "c[0-9]+")],
    }])
    rr = ReadRequest()
    rr.ParseFromString(req)
    q = rr.queries[0]
    assert (q.start_timestamp_ms, q.end_timestamp_ms) == (1000, 2000)
    got = [(m.name, int(m.type), m.value) for m in q.matchers]
    assert got == [("__name__", 0, "m"), ("role", 2, "u.*"),
                   ("tool", 1, "x"), ("conv_id", 3, "c[0-9]+")]


def test_decode_read_response_shape():
    from vertex_ray.sources.remote_write import (
        QueryResult,
        ReadResponse,
        WriteRequest,
        decode_read_response,
        encode_write_request,
    )

    wr = WriteRequest()
    wr.ParseFromString(encode_write_request(
        ["m{a=1}", "m{a=2}"], [1000, 2000], [1.0, 2.0]))
    resp = ReadResponse()
    qr = resp.results.add()
    qr.timeseries.extend(wr.timeseries)
    out = decode_read_response(resp.SerializeToString()).to_pylist()
    assert out == [
        {"query_idx": 0, "series_key": "m{a=1}", "ts_ms": 1000,
         "value": 1.0},
        {"query_idx": 0, "series_key": "m{a=2}", "ts_ms": 2000,
         "value": 2.0},
    ]


def test_name_matcher_filter_prefix_semantics():
    """__name__ matchers act on the series_key NAME PREFIX (before '{'),
    never via extract_label (where __name__ never appears)."""
    import pyarrow as pa

    from vertex_ray.sources.remote_write import _name_matcher_filter

    t = pa.table({"series_key": [
        "turns_total{role=user}", "turns_total{role=tool}",
        "tool_invocations_total{tool=x}", "bare_metric"]})
    got = _name_matcher_filter([("=~", "turns.*")])(t)["series_key"].to_pylist()
    assert got == ["turns_total{role=user}", "turns_total{role=tool}"]
    got = _name_matcher_filter([("!=", "bare_metric")])(t).num_rows
    assert got == 3
    got = _name_matcher_filter([("!~", ".*_total")])(t)["series_key"].to_pylist()
    assert got == ["bare_metric"]
    # second equality (beyond the pruning one) also lands here
    got = _name_matcher_filter([("=", "bare_metric")])(t)["series_key"].to_pylist()
    assert got == ["bare_metric"]


def test_remote_read_name_regex_and_empty_label_matcher(ray_session):
    """End-to-end over the committed sf0.001 store: a regex __name__
    matcher selects series (previously silently empty), and a
    ``label=""`` equality matches series LACKING the label (previously
    pruned by the presence-requiring push-down)."""
    import __ray_entry__ as e
    from vertex_ray.sources.remote_write import (
        decode_read_response,
        encode_read_request,
        remote_read,
    )

    out = e._ensure_pipeline("/root/testdata/sf0.001")
    span = {"start_ms": 0, "end_ms": 4_000_000_000_000}
    # regex __name__ matcher only
    req = encode_read_request([
        {**span, "matchers": [("__name__", "=~", "turns_.*")]}])
    rows = decode_read_response(remote_read(out, req, tier="1m",
                                            value_col="count"))
    keys = set(rows["series_key"].to_pylist())
    assert keys and all(k.startswith("turns_total{") for k in keys)
    # tool="" must match turns_total series (which carry no tool label)
    req = encode_read_request([
        {**span, "matchers": [("__name__", "=", "turns_total"),
                              ("tool", "=", "")]}])
    rows2 = decode_read_response(remote_read(out, req, tier="1m",
                                             value_col="count"))
    assert rows2.num_rows == rows.num_rows
    # negated __name__ regex excludes everything turns_*
    req = encode_read_request([
        {**span, "matchers": [("__name__", "!~", "turns_.*"),
                              ("__name__", "=~", ".*latency.*")]}])
    rows3 = decode_read_response(remote_read(out, req, tier="1m",
                                             value_col="count"))
    keys3 = set(rows3["series_key"].to_pylist())
    assert keys3 and all(k.startswith("inter_turn_latency_seconds")
                         for k in keys3)
