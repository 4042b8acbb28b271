"""Jaeger span-batch wire codec (sources/jaeger): protobuf round-trip
identity on the stages/trace span schema, api_v2 field conventions
(CHILD_OF reference for the parent, span.kind tag), batch-op shapes."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vertex_ray.sources.jaeger import (
    PostSpansRequest,
    decode_span_batch,
    encode_span_batch,
    jaeger_decode_op,
    jaeger_encode_op,
)


def _spans():
    return pa.table({
        "trace_id": pa.array(["convA", "convA", "convA", "convB"]),
        "span_id": pa.array([1, 2, 3, 1], pa.int64()),
        "parent_span_id": pa.array([0, 1, 2, 0], pa.int64()),
        "name": pa.array(["user", "assistant", "tool", "user"]),
        "kind": pa.array(["client", "server", "internal", "client"]),
        "tool": pa.array(["", "", "search", ""]),
        "start_ns": pa.array([10**9, 2 * 10**9, 3 * 10**9, 7 * 10**9],
                             pa.int64()),
        "end_ns": pa.array([2 * 10**9, 3 * 10**9, 3 * 10**9, 7 * 10**9],
                           pa.int64()),
        "duration_ns": pa.array([10**9, 10**9, 0, 0], pa.int64()),
    })


def test_roundtrip_identity():
    t = _spans()
    out = decode_span_batch(encode_span_batch(t))
    assert out.equals(t)  # sorted input → exact table equality


def test_wire_conventions():
    req = PostSpansRequest()
    req.ParseFromString(encode_span_batch(_spans(), service_name="svc"))
    assert req.batch.process.service_name == "svc"
    spans = {(s.trace_id.decode(),
              int.from_bytes(s.span_id, "big", signed=True)): s
             for s in req.batch.spans}
    root = spans[("convA", 1)]
    child = spans[("convA", 2)]
    assert len(root.references) == 0          # roots carry no reference
    assert len(child.references) == 1
    assert child.references[0].ref_type == 0  # CHILD_OF
    assert int.from_bytes(child.references[0].span_id, "big") == 1
    tags = {kv.key: kv.v_str for kv in spans[("convA", 3)].tags}
    assert tags["span.kind"] == "internal" and tags["tool"] == "search"
    assert child.start_time_us == 2 * 10**6
    assert child.duration_us == 10**6


def test_encode_deterministic_under_row_order():
    t = _spans()
    perm = t.take(pa.array([3, 1, 0, 2]))
    assert encode_span_batch(t) == encode_span_batch(perm)


def test_empty_batch():
    empty = _spans().schema.empty_table()
    payload = encode_span_batch(empty)
    out = decode_span_batch(payload)
    assert out.num_rows == 0
    assert out.schema.names == list(_spans().schema.names)


def test_ops_roundtrip_through_ray(ray_session):
    t = _spans()
    ds = rd.from_arrow(t).repartition(2)
    payloads = ds.map_batches(jaeger_encode_op(), batch_format="pyarrow")
    pdf = payloads.to_pandas()
    assert pdf["n_spans"].sum() == 4
    back = (payloads.map_batches(jaeger_decode_op(),
                                 batch_format="pyarrow")
            .to_pandas().sort_values(["trace_id", "span_id"])
            .reset_index(drop=True))
    exp = t.to_pandas().sort_values(["trace_id", "span_id"]) \
        .reset_index(drop=True)
    assert back.equals(exp)


def test_unparseable_payload_raises_clearly():
    import pytest

    with pytest.raises(Exception):
        decode_span_batch(b"\xff\xff\xff\xffnot-a-proto")
