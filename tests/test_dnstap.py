"""dnstap wire codec (sources/dnstap — frame-streams transport +
dnstap protobuf, the reference's src/sources/dnstap family)."""

import pyarrow as pa
import pytest

from vertex_ray.sources.dnstap import (
    CONTENT_TYPE,
    decode_dnstap,
    decode_fstrm,
    dnstap_decode_op,
    dnstap_encode_op,
    encode_dnstap,
    encode_fstrm,
)

ROW = {"identity": "resolver-1", "version": "vertex-ray-1",
       "message_type": "ClientQuery", "socket_family": "ipv4",
       "socket_protocol": "Udp", "query_address": "10.1.2.3",
       "response_address": "8.8.8.8", "query_port": 5353,
       "response_port": 53, "query_time_ns": 1_700_000_000_123_456_789,
       "response_time_ns": 1_700_000_001_000_000_002,
       "query_zone": "example.com."}


def test_dnstap_roundtrip_ipv4_and_ipv6():
    assert decode_dnstap(encode_dnstap(ROW)) == ROW
    row6 = {**ROW, "socket_family": "ipv6",
            "query_address": "2001:db8::1", "response_address": "::1",
            "socket_protocol": "Doh", "message_type": "ForwarderResponse"}
    assert decode_dnstap(encode_dnstap(row6)) == row6


def test_fstrm_framing():
    frames_in = [encode_dnstap(ROW), b"x" * 100]
    stream = encode_fstrm(frames_in)
    ct, frames = decode_fstrm(stream)
    assert ct == CONTENT_TYPE and frames == frames_in
    # oversize data frame → LimitExceed analogue
    with pytest.raises(ValueError, match="limit"):
        decode_fstrm(encode_fstrm([b"y" * 200]), max_frame_size=100)
    # data after STOP is a protocol violation
    bad = stream + (4).to_bytes(4, "big") + b"zzzz"
    with pytest.raises(ValueError, match="after STOP"):
        decode_fstrm(bad)
    # truncated control frame
    with pytest.raises(ValueError, match="truncated"):
        decode_fstrm(stream[: len(stream) - 3])


def test_unknown_enum_values_render_like_reference():
    """mod.rs renders unknown enums as explicit markers, not errors."""
    from vertex_ray.sources.dnstap import Dnstap

    d = Dnstap()
    d.identity = b"i"
    d.version = b"v"
    d.type = 1
    d.message.type = 99
    d.message.socket_family = 7
    d.message.socket_protocol = 42
    out = decode_dnstap(d.SerializeToString())
    assert out["message_type"] == "Unknown dnstap message type: 99"
    assert out["socket_family"] == "unknown"
    assert out["socket_protocol"] == "Unknown"


def test_ray_ops_roundtrip(ray_session):
    import ray.data as rd

    rows = [ROW, {**ROW, "query_port": 9999, "message_type": "AuthQuery"}]
    t = pa.table({k: pa.array([r[k] for r in rows * 5])
                  for k in ROW})
    payloads = rd.from_arrow(t).map_batches(dnstap_encode_op(),
                                            batch_format="pyarrow")
    got = payloads.map_batches(dnstap_decode_op(),
                               batch_format="pyarrow").to_pandas()
    assert len(got) == 10
    assert set(got["query_port"]) == {5353, 9999}
    assert (got["version"] == "vertex-ray-1").all()
    # foreign content type rejected
    stream = encode_fstrm([encode_dnstap(ROW)], content_type=b"foreign")
    bad = rd.from_arrow(pa.table({"payload": pa.array([stream],
                                                      pa.binary())}))
    with pytest.raises(Exception, match="foreign"):
        bad.map_batches(dnstap_decode_op(),
                        batch_format="pyarrow").to_pandas()
