"""Jaeger span-batch wire codec — the wire format of the reference's
``jaeger`` source/sink (/root/reference/src/sources/jaeger/grpc.rs:
gRPC ``PostSpans(PostSpansRequest{ batch })`` in the public
jaeger.api_v2 protobuf model; /root/reference/src/sinks/jaeger/
encodes the same span fields over the thrift agent framing —
lib/jaeger/src/thrift/jaeger.rs:418-434: trace_id, span_id,
parent_span_id, operation_name, references, flags, start_time µs,
duration µs, tags).

Message types are built at import from a programmatic
``FileDescriptorProto`` (the sources/remote_write.py pattern — public
protobuf runtime API, no protoc in the container). The field mapping
follows api_v2: the parent relation is a CHILD_OF ``SpanRef`` (not a
scalar field), span kind rides the ``span.kind`` tag, and our span
table's ``tool`` attribute rides a ``tool`` tag.

Round-trip contract (tested + hash-oracled via ``op_jaeger_wire_spans``):
``decode_span_batches(encode) == identity`` on the full 9-column span
table of stages/trace (timestamps are µs-aligned ns, the thrift model's
precision).

Scale shape: one ``map_batches`` emits ONE payload row per input batch
(the sink's request unit); the decoder is a flat_map back to span rows.
Batches are wire units, so no shuffle is introduced by either side.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

__all__ = ["encode_span_batch", "decode_span_batch",
           "jaeger_encode_op", "jaeger_decode_op"]


def _build_messages():
    from google.protobuf import (
        descriptor_pb2,
        descriptor_pool,
        message_factory,
    )

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vertex_ray_jaeger.proto"
    fdp.package = "jaeger.api_v2"
    fdp.syntax = "proto3"

    F = descriptor_pb2.FieldDescriptorProto

    def msg(name, fields):
        m = fdp.message_type.add()
        m.name = name
        for fname, num, ftype, label, tname in fields:
            f = m.field.add()
            f.name, f.number, f.type, f.label = fname, num, ftype, label
            if tname:
                f.type_name = tname
        return m

    kv = msg("KeyValue",
             [("key", 1, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
              ("v_type", 2, F.TYPE_ENUM, F.LABEL_OPTIONAL,
               ".jaeger.api_v2.KeyValue.ValueType"),
              ("v_str", 3, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
              ("v_bool", 4, F.TYPE_BOOL, F.LABEL_OPTIONAL, None),
              ("v_int64", 5, F.TYPE_INT64, F.LABEL_OPTIONAL, None),
              ("v_float64", 6, F.TYPE_DOUBLE, F.LABEL_OPTIONAL, None),
              ("v_binary", 7, F.TYPE_BYTES, F.LABEL_OPTIONAL, None)])
    en = kv.enum_type.add()
    en.name = "ValueType"
    for i, nm in enumerate(("STRING", "BOOL", "INT64", "FLOAT64",
                            "BINARY")):
        v = en.value.add()
        v.name, v.number = nm, i
    sr = msg("SpanRef",
             [("trace_id", 1, F.TYPE_BYTES, F.LABEL_OPTIONAL, None),
              ("span_id", 2, F.TYPE_BYTES, F.LABEL_OPTIONAL, None),
              ("ref_type", 3, F.TYPE_ENUM, F.LABEL_OPTIONAL,
               ".jaeger.api_v2.SpanRef.RefType")])
    en = sr.enum_type.add()
    en.name = "RefType"
    for i, nm in enumerate(("CHILD_OF", "FOLLOWS_FROM")):
        v = en.value.add()
        v.name, v.number = nm, i
    msg("Process",
        [("service_name", 1, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
         ("tags", 2, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".jaeger.api_v2.KeyValue")])
    msg("Span",
        [("trace_id", 1, F.TYPE_BYTES, F.LABEL_OPTIONAL, None),
         ("span_id", 2, F.TYPE_BYTES, F.LABEL_OPTIONAL, None),
         ("operation_name", 3, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
         ("references", 4, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".jaeger.api_v2.SpanRef"),
         ("flags", 5, F.TYPE_UINT32, F.LABEL_OPTIONAL, None),
         ("start_time_us", 6, F.TYPE_INT64, F.LABEL_OPTIONAL, None),
         ("duration_us", 7, F.TYPE_INT64, F.LABEL_OPTIONAL, None),
         ("tags", 8, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".jaeger.api_v2.KeyValue")])
    msg("Batch",
        [("process", 1, F.TYPE_MESSAGE, F.LABEL_OPTIONAL,
          ".jaeger.api_v2.Process"),
         ("spans", 2, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".jaeger.api_v2.Span")])
    msg("PostSpansRequest",
        [("batch", 1, F.TYPE_MESSAGE, F.LABEL_OPTIONAL,
          ".jaeger.api_v2.Batch")])
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    classes = message_factory.GetMessageClassesForFiles(
        ["vertex_ray_jaeger.proto"], pool)
    return tuple(classes[f"jaeger.api_v2.{n}"]
                 for n in ("KeyValue", "SpanRef", "Process", "Span",
                           "Batch", "PostSpansRequest"))


KeyValue, SpanRef, Process, Span, Batch, PostSpansRequest = \
    _build_messages()

_SPAN_COLS = ("trace_id", "span_id", "parent_span_id", "name", "kind",
              "tool", "start_ns", "end_ns", "duration_ns")


def _id_bytes(i: int) -> bytes:
    return struct.pack(">q", int(i))


def encode_span_batch(spans: pa.Table,
                      service_name: str = "vertex_ray") -> bytes:
    """Span rows (the stages/trace schema) → serialized
    ``PostSpansRequest``. Rows are sorted by (trace_id, span_id) so the
    payload is deterministic for a given row set."""
    t = spans.select(list(_SPAN_COLS)).combine_chunks()
    tid = t["trace_id"].to_numpy(zero_copy_only=False)
    sid = t["span_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((sid, tid.astype(object)))
    req = PostSpansRequest()
    req.batch.process.service_name = service_name
    get = {c: t[c].to_numpy(zero_copy_only=False) for c in _SPAN_COLS}
    for i in order:
        s = req.batch.spans.add()
        s.trace_id = str(get["trace_id"][i]).encode()
        s.span_id = _id_bytes(get["span_id"][i])
        s.operation_name = str(get["name"][i])
        parent = int(get["parent_span_id"][i])
        if parent:  # roots (parent 0) carry no reference, the api_v2 way
            r = s.references.add()
            r.trace_id = s.trace_id
            r.span_id = _id_bytes(parent)
            r.ref_type = 0  # CHILD_OF
        s.start_time_us = int(get["start_ns"][i]) // 1000
        s.duration_us = int(get["duration_ns"][i]) // 1000
        s.tags.add(key="span.kind", v_type=0, v_str=str(get["kind"][i]))
        tool = str(get["tool"][i])
        if tool:
            s.tags.add(key="tool", v_type=0, v_str=tool)
    return req.SerializeToString()


def decode_span_batch(payload: bytes) -> pa.Table:
    """``PostSpansRequest`` bytes → span rows (stages/trace schema)."""
    req = PostSpansRequest()
    req.ParseFromString(payload)
    cols: dict[str, list] = {c: [] for c in _SPAN_COLS}
    for s in req.batch.spans:
        cols["trace_id"].append(s.trace_id.decode())
        cols["span_id"].append(struct.unpack(">q", s.span_id)[0])
        parent = 0
        for r in s.references:
            if r.ref_type == 0:  # CHILD_OF
                parent = struct.unpack(">q", r.span_id)[0]
                break
        cols["parent_span_id"].append(parent)
        cols["name"].append(s.operation_name)
        tags = {kv.key: kv.v_str for kv in s.tags}
        cols["kind"].append(tags.get("span.kind", "unspecified"))
        cols["tool"].append(tags.get("tool", ""))
        start_ns = s.start_time_us * 1000
        dur_ns = s.duration_us * 1000
        cols["start_ns"].append(start_ns)
        cols["end_ns"].append(start_ns + dur_ns)
        cols["duration_ns"].append(dur_ns)
    return pa.table({
        "trace_id": pa.array(cols["trace_id"], pa.string()),
        "span_id": pa.array(cols["span_id"], pa.int64()),
        "parent_span_id": pa.array(cols["parent_span_id"], pa.int64()),
        "name": pa.array(cols["name"], pa.string()),
        "kind": pa.array(cols["kind"], pa.string()),
        "tool": pa.array(cols["tool"], pa.string()),
        "start_ns": pa.array(cols["start_ns"], pa.int64()),
        "end_ns": pa.array(cols["end_ns"], pa.int64()),
        "duration_ns": pa.array(cols["duration_ns"], pa.int64()),
    })


def jaeger_encode_op(service_name: str = "vertex_ray"):
    """map_batches body: one PostSpansRequest payload row per batch —
    (payload:binary, n_spans, n_traces)."""

    def fn(t: pa.Table) -> pa.Table:
        payload = encode_span_batch(t, service_name)
        tid = t["trace_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "payload": pa.array([payload], type=pa.binary()),
            "n_spans": pa.array([t.num_rows], type=pa.int64()),
            "n_traces": pa.array([len(set(tid.tolist()))],
                                 type=pa.int64()),
        })

    return fn


def jaeger_decode_op():
    """map_batches body over payload rows → span rows."""

    def fn(t: pa.Table) -> pa.Table:
        parts = [decode_span_batch(p)
                 for p in t["payload"].to_pylist()]
        return pa.concat_tables(parts) if parts else decode_span_batch(
            PostSpansRequest().SerializeToString())

    return fn
