"""Prometheus remote-write encoder/decoder — the wire format of the
reference's ``prometheus_remote_write`` sink
(/root/reference/src/sinks/prometheus_remote_write.rs:152-181: a
snappy-compressed protobuf ``WriteRequest { repeated TimeSeries }``).

The message types are built at import from a programmatic
``FileDescriptorProto`` (public protobuf runtime API; upb C encoding —
no protoc in the container). Snappy is NOT in the container, so the
framing is gated: payloads carry a ``codec`` column that is ``"snappy"``
when the lib exists and ``"raw"`` otherwise (the decoder accepts both);
everything else — label canonicalization, sample layout, the
latest-per-series MetricsBuffer collapse being the caller's input shape
— is the real wire format, round-trip tested byte-for-byte.

Scale shape: one ``map_batches`` emits ONE payload row per input batch
(the sink's request unit). Label sets are parsed from the canonical
``series_key`` once per UNIQUE series in the batch (the session-F
canonicalization rule: O(series), not O(samples)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["encode_write_request", "decode_write_request",
           "remote_write_encode_op", "split_series_key",
           "encode_read_request", "remote_read", "decode_read_response"]


def _build_messages():
    from google.protobuf import (
        descriptor_pb2,
        descriptor_pool,
        message_factory,
    )

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vertex_ray_prom_rw.proto"
    fdp.package = "prometheus"
    fdp.syntax = "proto3"

    def msg(name, fields):
        m = fdp.message_type.add()
        m.name = name
        for fname, num, ftype, label, tname in fields:
            f = m.field.add()
            f.name, f.number, f.type, f.label = fname, num, ftype, label
            if tname:
                f.type_name = tname
        return m

    F = descriptor_pb2.FieldDescriptorProto
    msg("Label", [("name", 1, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
                  ("value", 2, F.TYPE_STRING, F.LABEL_OPTIONAL, None)])
    msg("Sample", [("value", 1, F.TYPE_DOUBLE, F.LABEL_OPTIONAL, None),
                   ("timestamp", 2, F.TYPE_INT64, F.LABEL_OPTIONAL, None)])
    msg("TimeSeries",
        [("labels", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.Label"),
         ("samples", 2, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.Sample")])
    msg("WriteRequest",
        [("timeseries", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.TimeSeries")])
    # remote READ side (api/v1/read): Query with label matchers
    lm = msg("LabelMatcher",
             [("type", 1, F.TYPE_ENUM, F.LABEL_OPTIONAL,
               ".prometheus.LabelMatcher.Type"),
              ("name", 2, F.TYPE_STRING, F.LABEL_OPTIONAL, None),
              ("value", 3, F.TYPE_STRING, F.LABEL_OPTIONAL, None)])
    en = lm.enum_type.add()
    en.name = "Type"
    for i, nm in enumerate(("EQ", "NEQ", "RE", "NRE")):
        v = en.value.add()
        v.name, v.number = nm, i
    msg("Query",
        [("start_timestamp_ms", 1, F.TYPE_INT64, F.LABEL_OPTIONAL, None),
         ("end_timestamp_ms", 2, F.TYPE_INT64, F.LABEL_OPTIONAL, None),
         ("matchers", 3, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.LabelMatcher")])
    msg("ReadRequest",
        [("queries", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.Query")])
    msg("QueryResult",
        [("timeseries", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.TimeSeries")])
    msg("ReadResponse",
        [("results", 1, F.TYPE_MESSAGE, F.LABEL_REPEATED,
          ".prometheus.QueryResult")])
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    classes = message_factory.GetMessageClassesForFiles(
        ["vertex_ray_prom_rw.proto"], pool)
    return tuple(classes[f"prometheus.{n}"]
                 for n in ("WriteRequest", "TimeSeries", "Label", "Sample",
                           "LabelMatcher", "Query", "ReadRequest",
                           "QueryResult", "ReadResponse"))


(WriteRequest, TimeSeries, Label, Sample, LabelMatcher, Query,
 ReadRequest, QueryResult, ReadResponse) = _build_messages()

_MATCH_OPS = {"=": 0, "!=": 1, "=~": 2, "!~": 3}
_OP_NAMES = {v: k for k, v in _MATCH_OPS.items()}

try:  # snappy framing per the spec; not in this container
    import snappy as _snappy  # type: ignore
except Exception:  # pragma: no cover
    _snappy = None


def split_series_key(key: str) -> tuple[str, list[tuple[str, str]]]:
    """Inverse of series.series_key: ``name{k1=v1,k2=v2}`` → (name,
    sorted label pairs). Values in the canonical key contain no
    ``,``/``=``/``}`` (schema tags are enum-ish strings)."""
    if "{" not in key:
        return key, []
    name, _, body = key.partition("{")
    pairs = []
    for item in body[:-1].split(","):
        k, _, v = item.partition("=")
        pairs.append((k, v))
    return name, pairs


def encode_write_request(series_keys, ts_ms, values) -> bytes:
    """(series_key, timestamp-ms, value) rows → serialized WriteRequest.
    Rows are grouped per series in sorted (series, ts) order so the
    payload is deterministic for a given row set."""
    sk = np.asarray(series_keys, dtype=object)
    ts = np.asarray(ts_ms, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    order = np.lexsort((ts, sk))
    sk, ts, vals = sk[order], ts[order], vals[order]
    n = len(sk)
    wr = WriteRequest()
    if n == 0:
        return wr.SerializeToString()
    new = np.ones(n, dtype=bool)
    new[1:] = sk[1:] != sk[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    for s, e in zip(starts, ends):
        t = wr.timeseries.add()
        name, pairs = split_series_key(sk[s])
        t.labels.add(name="__name__", value=name)
        for k, v in pairs:
            t.labels.add(name=k, value=v)
        t.samples.extend(
            Sample(value=float(v), timestamp=int(m))
            for v, m in zip(vals[s:e], ts[s:e]))
    return wr.SerializeToString()


def decode_write_request(payload: bytes, codec: str = "raw") -> pa.Table:
    """WriteRequest bytes → (series_key, ts_ms, value) rows, rebuilding
    the canonical series_key from the label set."""
    from vertex_ray.series import series_key as make_key

    if codec == "snappy":
        if _snappy is None:
            raise NotImplementedError(
                "snappy framing requires the snappy lib (absent in this "
                "container); encode emits codec='raw' here")
        payload = _snappy.decompress(payload)
    wr = WriteRequest()
    wr.ParseFromString(payload)
    keys, ts, vals = [], [], []
    for t in wr.timeseries:
        labels = {l.name: l.value for l in t.labels}
        name = labels.pop("__name__", "")
        key = make_key(name, labels)
        for s in t.samples:
            keys.append(key)
            ts.append(s.timestamp)
            vals.append(s.value)
    return pa.table({
        "series_key": pa.array(keys, type=pa.string()),
        "ts_ms": pa.array(ts, type=pa.int64()),
        "value": pa.array(vals, type=pa.float64()),
    })


def encode_read_request(queries: list[dict]) -> bytes:
    """[{start_ms, end_ms, matchers: [(label, op, value)]}] →
    serialized ReadRequest (op in = != =~ !~)."""
    rr = ReadRequest()
    for q in queries:
        pq = rr.queries.add()
        pq.start_timestamp_ms = int(q["start_ms"])
        pq.end_timestamp_ms = int(q["end_ms"])
        for lbl, op, val in q["matchers"]:
            pq.matchers.add(type=_MATCH_OPS[op], name=lbl, value=val)
    return rr.SerializeToString()


def _name_matcher_filter(name_matchers):
    """Apply ``__name__`` matchers to the series_key's NAME PREFIX (the
    text before '{') — __name__ is not a rendered label, so routing it
    through extract_label would silently match nothing."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        name = pc.replace_substring_regex(t["series_key"], r"\{.*$", "")
        mask = None
        for op, val in name_matchers:
            if op == "=":
                m = pc.equal(name, val)
            elif op == "!=":
                m = pc.not_equal(name, val)
            else:
                m = pc.match_substring_regex(name, f"^(?:{val})$")
                if op == "!~":
                    m = pc.invert(m)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask) if mask is not None else t

    return fn


def remote_read(out_dir: str, request: bytes, *, tier: str,
                value_col: str = "sum", layout: str = "oneshot") -> bytes:
    """The ``/api/v1/read`` analogue over the committed block store:
    decode a ReadRequest, answer each Query from the tier store, return
    a serialized ReadResponse (one QueryResult per Query, TimeSeries in
    the write-path wire shape).

    Matcher lowering mirrors the PromQL front-end's selector rule
    (promql_lang._eval_selector): ``__name__=`` prunes the block scan by
    metric name, the first other equality matcher becomes a series_key
    regex push-down, and EVERY matcher is re-applied exactly post-decode
    (stages/promql.extract_label) — so decode work tracks the selection,
    not the store. ``value_col`` picks the tier column serving as the
    sample value (aggregate tiers store count/sum/min/max/last)."""
    import re as _re

    from vertex_ray.promql_lang import _matcher_filter
    from vertex_ray.read import query_range

    req = ReadRequest()
    req.ParseFromString(request)
    resp = ReadResponse()
    for q in req.queries:
        matchers = [(m.name, _OP_NAMES[int(m.type)], m.value)
                    for m in q.matchers]
        metric = None
        rest = []
        name_res = []  # __name__ matchers beyond the pruning equality
        for lbl, op, val in matchers:
            if lbl == "__name__":
                # __name__ never appears as a label inside series_key —
                # it IS the key's name prefix. The first equality prunes
                # the scan; every other __name__ matcher (=~ != !~ or a
                # second =) is applied to the name prefix post-decode.
                if op == "=" and metric is None:
                    metric = val
                else:
                    name_res.append((op, val))
            else:
                rest.append((lbl, op, val))
        push = None
        for lbl, op, val in rest:
            # label="" must also match series LACKING the label — the
            # presence-requiring push-down would prune those before the
            # exact post-decode filter could readmit them
            if op == "=" and val != "":
                push = (rf"[{{,]{_re.escape(lbl)}={_re.escape(val)}"
                        rf"[,}}]")
                break
        if push is None and metric is None:
            # no equality pruning at all: push a regex __name__ matcher
            # into the scan (name prefix = series_key up to '{' or end)
            for op, val in name_res:
                if op == "=~":
                    push = rf"^(?:{val})(?:\{{|$)"
                    break
        ds = query_range(
            out_dir, tier, metric=metric, key_regex=push,
            start=int(q.start_timestamp_ms) // 1000,
            end=int(q.end_timestamp_ms) // 1000,
            columns=["series_key", "window_start", value_col],
            layout=layout)
        if rest:
            ds = ds.map_batches(_matcher_filter(rest),
                                batch_format="pyarrow")
        if name_res:
            ds = ds.map_batches(_name_matcher_filter(name_res),
                                batch_format="pyarrow")
        # a response is one serialized message — materializing the
        # (pruned) selection is inherent to the protocol, like the
        # other read verbs' result sets
        df = ds.to_pandas()
        payload = encode_write_request(
            df["series_key"].to_numpy(),
            df["window_start"].to_numpy(dtype=np.int64) * 1000,
            df[value_col].to_numpy(dtype=np.float64))
        wr = WriteRequest()
        wr.ParseFromString(payload)
        qr = resp.results.add()
        qr.timeseries.extend(wr.timeseries)
    return resp.SerializeToString()


def decode_read_response(payload: bytes) -> pa.Table:
    """ReadResponse bytes → (query_idx, series_key, ts_ms, value) rows."""
    from vertex_ray.series import series_key as make_key

    resp = ReadResponse()
    resp.ParseFromString(payload)
    qi, keys, ts, vals = [], [], [], []
    for i, qr in enumerate(resp.results):
        for t in qr.timeseries:
            labels = {l.name: l.value for l in t.labels}
            name = labels.pop("__name__", "")
            key = make_key(name, labels)
            for s in t.samples:
                qi.append(i)
                keys.append(key)
                ts.append(s.timestamp)
                vals.append(s.value)
    return pa.table({
        "query_idx": pa.array(qi, type=pa.int64()),
        "series_key": pa.array(keys, type=pa.string()),
        "ts_ms": pa.array(ts, type=pa.int64()),
        "value": pa.array(vals, type=pa.float64()),
    })


def remote_write_encode_op(key_col: str = "series_key",
                           ts_ms_col: str = "ts_ms",
                           value_col: str = "value"):
    """map_batches body: one WriteRequest payload row per batch —
    (payload:binary, codec, n_series, n_samples). The batch is the
    request unit, matching the sink's batch→request mapping."""

    def fn(t: pa.Table) -> pa.Table:
        sk = t[key_col].to_numpy(zero_copy_only=False)
        payload = encode_write_request(
            sk, t[ts_ms_col].to_numpy(zero_copy_only=False),
            t[value_col].to_numpy(zero_copy_only=False))
        codec = "raw"
        if _snappy is not None:
            payload = _snappy.compress(payload)
            codec = "snappy"
        return pa.table({
            "payload": pa.array([payload], type=pa.binary()),
            "codec": pa.array([codec], type=pa.string()),
            "n_series": pa.array([len(set(sk.tolist()))],
                                 type=pa.int64()),
            "n_samples": pa.array([len(t)], type=pa.int64()),
        })

    return fn
