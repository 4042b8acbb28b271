"""dnstap wire codec — Frame Streams framing + the dnstap protobuf
(the reference's ``dnstap`` source: /root/reference/src/sources/dnstap/
fstrm.rs implements the farsightsec frame-streams transport — 4-byte
big-endian length prefixes, zero-length escape introducing control
frames START/STOP/READY with a CONTENT_TYPE field, data frames capped by
``max_frame_size`` — and mod.rs:270-446 decodes each data frame as a
``dnstap.Dnstap`` protobuf and renders it to a flat value map: message
type names, socket family/protocol names, dotted-quad addresses, ports,
second+nanosecond timestamps, query zone).

Message classes are built at import from a programmatic
``FileDescriptorProto`` (the jaeger/remote-write pattern — public
protobuf runtime API, no protoc). Field numbers and wire types follow
dnstap.proto (nsec fields are fixed32, the rest varints/bytes).

The tabular rendering mirrors mod.rs's map keys with timestamps kept as
integer nanoseconds (``query_time_ns`` / ``response_time_ns``) instead
of a DateTime object — the engine's columnar form of the same value.

Ray shape: ``dnstap_encode_op`` emits ONE frame-streams byte stream per
input batch (START + one data frame per row + STOP — the unidirectional
stream a collector would record); ``dnstap_decode_op`` walks the frames
back to one row per Dnstap message. No shuffle on either side.
"""

from __future__ import annotations

import ipaddress
import struct

import pyarrow as pa

__all__ = ["CONTENT_TYPE", "encode_fstrm", "decode_fstrm",
           "encode_dnstap", "decode_dnstap", "dnstap_encode_op",
           "dnstap_decode_op"]

CONTROL_START = 0x02
CONTROL_STOP = 0x03
CONTROL_FIELD_CONTENT_TYPE = 0x01
CONTROL_FRAME_LENGTH_MAX = 512  # mod.rs:220
DEFAULT_MAX_FRAME_SIZE = 102400  # mod.rs default_max_frame_size

CONTENT_TYPE = b"protobuf:dnstap.Dnstap"

MESSAGE_TYPES = {
    1: "AuthQuery", 2: "AuthResponse", 3: "ResolverQuery",
    4: "ResolverResponse", 5: "ClientQuery", 6: "ClientResponse",
    7: "ForwarderQuery", 8: "ForwarderResponse", 9: "StubQuery",
    10: "StubResponse", 11: "ToolQuery", 12: "ToolResponse",
    13: "UpdateQuery", 14: "UpdateResponse",
}
MESSAGE_TYPE_IDS = {v: k for k, v in MESSAGE_TYPES.items()}
SOCKET_FAMILIES = {1: "ipv4", 2: "ipv6"}
SOCKET_PROTOCOLS = {1: "Udp", 2: "Tcp", 3: "Dot", 4: "Doh",
                    5: "DnsCryptUdp", 6: "DnsCryptTcp", 7: "Doq"}
SOCKET_PROTOCOL_IDS = {v: k for k, v in SOCKET_PROTOCOLS.items()}


def _build_messages():
    from google.protobuf import (
        descriptor_pb2,
        descriptor_pool,
        message_factory,
    )

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "vertex_ray_dnstap.proto"
    fdp.package = "dnstap"
    fdp.syntax = "proto3"
    F = descriptor_pb2.FieldDescriptorProto

    m = fdp.message_type.add()
    m.name = "Message"
    for fname, num, ftype in (
            ("type", 1, F.TYPE_INT32),
            ("socket_family", 2, F.TYPE_INT32),
            ("socket_protocol", 3, F.TYPE_INT32),
            ("query_address", 4, F.TYPE_BYTES),
            ("response_address", 5, F.TYPE_BYTES),
            ("query_port", 6, F.TYPE_UINT32),
            ("response_port", 7, F.TYPE_UINT32),
            ("query_time_sec", 8, F.TYPE_UINT64),
            ("query_time_nsec", 9, F.TYPE_FIXED32),
            ("query_zone", 11, F.TYPE_BYTES),
            ("response_time_sec", 12, F.TYPE_UINT64),
            ("response_time_nsec", 13, F.TYPE_FIXED32),
    ):
        f = m.field.add()
        f.name, f.number, f.type, f.label = fname, num, ftype, \
            F.LABEL_OPTIONAL

    d = fdp.message_type.add()
    d.name = "Dnstap"
    for fname, num, ftype, tname in (
            ("identity", 1, F.TYPE_BYTES, None),
            ("version", 2, F.TYPE_BYTES, None),
            ("message", 14, F.TYPE_MESSAGE, ".dnstap.Message"),
            ("type", 15, F.TYPE_INT32, None),
    ):
        f = d.field.add()
        f.name, f.number, f.type, f.label = fname, num, ftype, \
            F.LABEL_OPTIONAL
        if tname:
            f.type_name = tname

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    classes = message_factory.GetMessageClassesForFiles(
        ["vertex_ray_dnstap.proto"], pool)
    return classes["dnstap.Message"], classes["dnstap.Dnstap"]


Message, Dnstap = _build_messages()

_U32 = struct.Struct(">I")


# --- frame-streams transport ------------------------------------------------


def encode_fstrm(payloads: list[bytes],
                 content_type: bytes = CONTENT_TYPE) -> bytes:
    """Unidirectional frame stream: escape+START(content-type field),
    one length-prefixed data frame per payload, escape+STOP."""
    start = (_U32.pack(CONTROL_START)
             + _U32.pack(CONTROL_FIELD_CONTENT_TYPE)
             + _U32.pack(len(content_type)) + content_type)
    out = bytearray(_U32.pack(0) + _U32.pack(len(start)) + start)
    for p in payloads:
        out += _U32.pack(len(p)) + p
    stop = _U32.pack(CONTROL_STOP)
    out += _U32.pack(0) + _U32.pack(len(stop)) + stop
    return bytes(out)


def decode_fstrm(buf: bytes,
                 max_frame_size: int = DEFAULT_MAX_FRAME_SIZE
                 ) -> tuple[bytes, list[bytes]]:
    """Byte stream → (content_type, data frame payloads). Raises
    ValueError on oversize frames (the LimitExceed path), oversize
    control frames, or a frame after STOP."""
    pos, n = 0, len(buf)
    content_type = b""
    frames: list[bytes] = []
    stopped = False
    while pos + 4 <= n:
        ln = _U32.unpack_from(buf, pos)[0]
        pos += 4
        if ln == 0:  # escape: a control frame follows
            if pos + 4 > n:
                raise ValueError("fstrm: truncated control frame")
            cln = _U32.unpack_from(buf, pos)[0]
            pos += 4
            if cln > CONTROL_FRAME_LENGTH_MAX:
                raise ValueError(f"fstrm: control frame too long: {cln}")
            if pos + cln > n or cln < 4:
                raise ValueError("fstrm: truncated control frame")
            ctrl = buf[pos:pos + cln]
            pos += cln
            typ = _U32.unpack_from(ctrl, 0)[0]
            if typ == CONTROL_STOP:
                stopped = True
            elif typ == CONTROL_START:
                cpos = 4
                while cpos + 8 <= cln:
                    ftyp, fln = struct.unpack_from(">II", ctrl, cpos)
                    cpos += 8
                    if ftyp == CONTROL_FIELD_CONTENT_TYPE:
                        content_type = ctrl[cpos:cpos + fln]
                    cpos += fln
            continue
        if stopped:
            raise ValueError("fstrm: data frame after STOP")
        if ln > max_frame_size:
            raise ValueError(f"fstrm: frame exceeds limit: {ln}")
        if pos + ln > n:
            raise ValueError("fstrm: truncated data frame")
        frames.append(buf[pos:pos + ln])
        pos += ln
    return content_type, frames


# --- Dnstap message <-> flat row -------------------------------------------

_ROW_COLS = (
    ("identity", pa.string()),
    ("version", pa.string()),
    ("message_type", pa.string()),
    ("socket_family", pa.string()),
    ("socket_protocol", pa.string()),
    ("query_address", pa.string()),
    ("response_address", pa.string()),
    ("query_port", pa.int64()),
    ("response_port", pa.int64()),
    ("query_time_ns", pa.int64()),
    ("response_time_ns", pa.int64()),
    ("query_zone", pa.string()),
)


def encode_dnstap(row: dict) -> bytes:
    """Flat row → serialized ``Dnstap`` (type MESSAGE=1, the only
    variant the reference handles — mod.rs:282)."""
    d = Dnstap()
    d.identity = str(row["identity"]).encode()
    d.version = str(row["version"]).encode()
    d.type = 1  # MESSAGE
    m = d.message
    m.type = MESSAGE_TYPE_IDS[row["message_type"]]
    fam = 2 if row["socket_family"] == "ipv6" else 1
    m.socket_family = fam
    m.socket_protocol = SOCKET_PROTOCOL_IDS[row["socket_protocol"]]
    m.query_address = ipaddress.ip_address(row["query_address"]).packed
    m.response_address = ipaddress.ip_address(row["response_address"]).packed
    m.query_port = int(row["query_port"])
    m.response_port = int(row["response_port"])
    qns = int(row["query_time_ns"])
    m.query_time_sec, m.query_time_nsec = divmod(qns, 1_000_000_000)
    rns = int(row["response_time_ns"])
    m.response_time_sec, m.response_time_nsec = divmod(rns, 1_000_000_000)
    m.query_zone = str(row["query_zone"]).encode()
    return d.SerializeToString()


def decode_dnstap(payload: bytes) -> dict:
    """Serialized ``Dnstap`` → flat row (mod.rs:270-446 rendering:
    message-type / family / protocol names, rendered addresses, ports,
    sec+nsec combined — here as integer nanoseconds)."""
    d = Dnstap()
    d.ParseFromString(payload)
    m = d.message
    fam = SOCKET_FAMILIES.get(m.socket_family, "unknown")
    addr_len = 16 if fam == "ipv6" else 4

    def render(b: bytes) -> str:
        if len(b) < addr_len:
            return ""
        return str(ipaddress.ip_address(b[:addr_len]))

    return {
        "identity": d.identity.decode(),
        "version": d.version.decode(),
        "message_type": MESSAGE_TYPES.get(
            m.type, f"Unknown dnstap message type: {m.type}"),
        "socket_family": fam,
        "socket_protocol": SOCKET_PROTOCOLS.get(m.socket_protocol,
                                                "Unknown"),
        "query_address": render(m.query_address),
        "response_address": render(m.response_address),
        "query_port": int(m.query_port),
        "response_port": int(m.response_port),
        "query_time_ns": m.query_time_sec * 1_000_000_000
        + m.query_time_nsec,
        "response_time_ns": m.response_time_sec * 1_000_000_000
        + m.response_time_nsec,
        "query_zone": m.query_zone.decode(),
    }


# --- Ray ops ----------------------------------------------------------------


def dnstap_encode_op():
    """map_batches body: rows → ONE frame stream per batch
    (payload, n_frames)."""

    def fn(t: pa.Table) -> pa.Table:
        payloads = [encode_dnstap(r) for r in t.to_pylist()]
        return pa.table({
            "payload": pa.array([encode_fstrm(payloads)],
                                type=pa.binary()),
            "n_frames": pa.array([len(payloads)], type=pa.int64()),
        })

    return fn


def dnstap_decode_op():
    """map_batches body over stream payloads → one row per Dnstap
    message; streams with a foreign content type are rejected."""

    def fn(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for p in t["payload"].to_pylist():
            ct, frames = decode_fstrm(p)
            if ct and ct != CONTENT_TYPE:
                raise ValueError(f"dnstap: foreign content type {ct!r}")
            rows.extend(decode_dnstap(f) for f in frames)
        return pa.table({name: pa.array([r[name] for r in rows], type=typ)
                         for name, typ in _ROW_COLS})

    return fn
