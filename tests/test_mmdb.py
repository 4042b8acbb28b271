"""MaxMind DB binary format (sources/mmdb): writer/reader round-trip
across record sizes, longest-prefix semantics, typed data section,
metadata, and the broadcast actor-pool enrich stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vertex_ray.sources.mmdb import MmdbReader, encode_mmdb, geoip_enrich

NETS = [
    ("10.0.0.0/8", {"country": "X", "asn": 100}),
    ("10.1.0.0/16", {"country": "Y", "asn": 200, "lat": 1.5}),
    ("10.1.2.0/24", {"country": "Z", "asn": 300, "active": True,
                     "tags": ["a", "b"], "big": 1 << 40, "neg": -5}),
    ("192.168.0.0/16", {"country": "P", "asn": 400}),
]


@pytest.mark.parametrize("rs", [24, 28, 32])
def test_roundtrip_record_sizes(rs):
    r = MmdbReader(encode_mmdb(NETS, record_size=rs))
    assert r.meta["record_size"] == rs
    assert r.meta["binary_format_major_version"] == 2
    assert r.meta["ip_version"] == 4
    # longest prefix wins at every nesting level
    assert r.lookup("10.5.5.5")["country"] == "X"
    assert r.lookup("10.1.9.9")["country"] == "Y"
    assert r.lookup("10.1.2.3")["country"] == "Z"
    # no-data paths
    assert r.lookup("8.8.8.8") is None
    assert r.lookup("172.16.0.1") is None


def test_typed_data_section_values():
    r = MmdbReader(encode_mmdb(NETS))
    rec = r.lookup("10.1.2.200")
    assert rec["active"] is True
    assert rec["tags"] == ["a", "b"]
    assert rec["big"] == 1 << 40       # uint64 path
    assert rec["neg"] == -5            # int32 path
    assert r.lookup("10.1.0.1")["lat"] == 1.5  # double path


def test_data_section_dedup():
    """Identical records share one data-section entry."""
    many = [(f"10.{i}.0.0/16", {"country": "SAME"}) for i in range(50)]
    one = encode_mmdb([("10.0.0.0/16", {"country": "SAME"})])
    fifty = encode_mmdb(many)
    # 49 more networks cost tree nodes, not 49 more record copies
    assert len(fifty) - len(one) < 50 * 7  # << 49 x record size


def test_bad_blob_raises():
    with pytest.raises(ValueError, match="metadata marker"):
        MmdbReader(b"not an mmdb at all")


def test_geoip_enrich_stage(ray_session):
    blob = encode_mmdb(NETS)
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ip": pa.array(["10.1.2.9", "10.1.200.1", "192.168.1.1",
                        "8.8.8.8"]),
    })
    out = (geoip_enrich(rd.from_arrow(t), blob, "ip",
                        ["country", "asn"], concurrency=2)
           .to_pandas().sort_values("event_id"))
    assert out["geo_country"].tolist() == ["Z", "Y", "P", None]
    assert out["geo_asn"].tolist()[:3] == [300, 200, 400]
