"""Config → pipeline builder (the YAML-topology analogue: component graph
wired by `inputs`, dry-build validation like `vertex validate`)."""

import pyarrow as pa
import pytest

from vertex_ray.pipelines.builder import build, validate

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_validate_diagnostics():
    cfg = {
        "sources": {"ev": {"type": "parquet", "path": EVENTS}},
        "transforms": {
            "a": {"type": "nope", "inputs": ["ev"]},
            "b": {"type": "filter", "inputs": ["missing"], "where": ["value", ">", 0]},
            "c": {"type": "filter", "inputs": ["d"], "where": ["value", ">", 0]},
            "d": {"type": "filter", "inputs": ["c"], "where": ["value", ">", 0]},
        },
        "sinks": {"out": {"type": "datasets", "inputs": []}},
    }
    errs = validate(cfg)
    assert any("unknown type 'nope'" in e for e in errs)
    assert any("undefined input 'missing'" in e for e in errs)
    assert any("cycle" in e for e in errs)
    assert any("out: no inputs" in e for e in errs)


def test_build_filter_route_chain(ray_session):
    cfg = {
        "sources": {"ev": {"type": "parquet", "path": EVENTS, "columns": ["event_id", "value", "event_type"]}},
        "transforms": {
            "big": {"type": "filter", "inputs": ["ev"], "where": ["value", ">", 50]},
            "ports": {
                "type": "route",
                "inputs": ["big"],
                "routes": {"huge": ["value", ">", 90]},
            },
        },
        "sinks": {"out": {"type": "datasets", "inputs": ["ports.huge"]}},
    }
    built = build(cfg)
    huge = built["out"].to_pandas()
    assert (huge["value"] > 90).all()
    rest = built["ports._unmatched"].to_pandas()
    assert ((rest["value"] > 50) & (rest["value"] <= 90)).all()
    assert len(huge) + len(rest) == len(built["big"].to_pandas())


def test_build_rejects_invalid():
    with pytest.raises(ValueError, match="invalid pipeline config"):
        build({"sources": {}, "transforms": {"x": {"type": "filter", "inputs": ["y"], "where": ["v", ">", 0]}}})


def test_build_metricalize_from_config(ray_session):
    cfg = {
        "sources": {"ev": {"type": "parquet", "path": EVENTS}},
        "transforms": {
            "m": {
                "type": "metricalize",
                "inputs": ["ev"],
                "tag_cols": ["event_type"],
                "value_col": "value",
                "ts_col": "ts",
                "window_seconds": 3600,
                "order_col": "event_id",
            }
        },
        "sinks": {},
    }
    out = build(cfg)["m"].to_pandas()
    assert {"event_type", "window_start", "count"} <= set(out.columns)
    assert len(out) > 0


def test_build_jsonl_source(ray_session, tmp_path):
    p = tmp_path / "logs.jsonl"
    p.write_text('{"msg": "a", "n": 1}\n{"msg": "b", "n": 2}\n')
    cfg = {
        "sources": {"logs": {"type": "jsonl", "path": str(p)}},
        "transforms": {},
        "sinks": {"out": {"type": "datasets", "inputs": ["logs"]}},
    }
    df = build(cfg)["out"].to_pandas()
    assert sorted(df["msg"]) == ["a", "b"]
