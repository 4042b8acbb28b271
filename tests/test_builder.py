"""Config → pipeline builder (the YAML-topology analogue: component graph
wired by `inputs`, dry-build validation like `vertex validate`)."""

import os

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


def test_builder_multi_input_join_and_topk(ray_session):
    """Config-built two-input join + per-group top-k matches direct calls."""
    import pandas as pd

    from vertex_ray.pipelines.builder import build

    sf = "/root/testdata/sf0.001"
    cfg = {
        "sources": {
            "orders": {"type": "parquet", "path": f"{sf}/orders.parquet",
                       "columns": ["o_orderkey", "o_totalprice"]},
            "li": {"type": "parquet", "path": f"{sf}/lineitem.parquet",
                   "columns": ["l_orderkey", "l_quantity", "l_linenumber"]},
        },
        "transforms": {
            "joined": {"type": "join", "inputs": ["orders", "li"],
                       "left_on": "o_orderkey", "right_on": "l_orderkey",
                       "n_buckets": 8},
            "top": {"type": "topk_per_group", "inputs": ["joined"],
                    "group_col": "o_orderkey", "value_col": "l_quantity",
                    "k": 2, "tiebreak": "l_linenumber",
                    "keep_cols": ["o_totalprice"]},
        },
        "sinks": {"out": {"inputs": ["top"]}},
    }
    out = build(cfg)["out"].to_pandas()
    assert set(out.columns) == {"o_orderkey", "o_totalprice",
                                "l_quantity", "l_linenumber"}
    g = out.groupby("o_orderkey").size()
    assert (g <= 2).all() and len(out) > 0
    # spot-check one order against pandas
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    key = int(out["o_orderkey"].iloc[0])
    want = (li[li.l_orderkey == key]
            .sort_values(["l_quantity", "l_linenumber"],
                         ascending=[False, True]).head(2))
    got = out[out.o_orderkey == key].sort_values(
        ["l_quantity", "l_linenumber"], ascending=[False, True])
    assert got["l_linenumber"].tolist() == want["l_linenumber"].tolist()


def test_build_promql_over_time_chain(ray_session):
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
            },
            "smooth": {
                "type": "over_time",
                "inputs": ["m"],
                "key_col": "event_type",
                "order_col": "window_start",
                "value_col": "count",
                "n": 4,
                "agg": "avg",
            },
        },
        "sinks": {},
    }
    out = build(cfg)["smooth"].to_pandas()
    assert {"event_type", "window_start", "avg_over"} <= set(out.columns)
    assert len(out) > 0


def test_builder_round2_steps(ray_session):
    """Round-2 step types registered in the config surface: zscore,
    holt_winters, lttb over a synthetic tier; unigram_score over docs."""
    import pandas as pd
    import ray.data as rd

    from vertex_ray.pipelines.builder import STEP_TYPES

    tier = rd.from_arrow(pa.table({
        "series_key": ["s"] * 6,
        "window_start": [0, 60, 120, 180, 240, 300],
        "count": [1, 2, 3, 4, 100, 6],
    }))
    z = STEP_TYPES["zscore"](
        {"key_col": "series_key", "order_col": "window_start",
         "value_col": "count", "n": 4}, tier).to_pandas()
    assert len(z) == 6 and "zscore" in z.columns
    hw = STEP_TYPES["holt_winters"](
        {"key_col": "series_key", "order_col": "window_start",
         "value_col": "count"}, tier).to_pandas()
    assert len(hw) == 6 and "smoothed" in hw.columns
    lt = STEP_TYPES["lttb"](
        {"key_col": "series_key", "order_col": "window_start",
         "value_col": "count", "n_out": 4}, tier).to_pandas()
    assert len(lt) == 4

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b a", "b c"]}))
    ug = STEP_TYPES["unigram_score"]({}, docs).to_pandas()
    assert set(ug["doc_id"]) == {1, 2}


def test_builder_late_round2_steps(ray_session):
    """Late round-2 step types: absent, offset, window_time,
    hist_fraction, binary_op (multi-input), count_values."""
    import numpy as np
    import ray.data as rd

    from vertex_ray.pipelines.builder import MULTI_INPUT_TYPES, STEP_TYPES
    from vertex_ray.schema import N_BUCKETS

    tier = rd.from_arrow(pa.table({
        "series_key": ["s"] * 3,
        "window_start": np.array([0, 120, 240], dtype=np.int64),
        "count": np.array([2, 3, 4], dtype=np.int64),
    }))
    ab = STEP_TYPES["absent"](
        {"tier_seconds": 60, "start": 0, "end": 240}, tier).to_pandas()
    assert sorted(ab.window_start) == [60, 180]

    off = STEP_TYPES["offset"](
        {"offset_seconds": 120, "rename": {"count": "prev"}},
        tier).to_pandas()
    assert sorted(off.window_start) == [120, 240, 360]
    assert "prev" in off.columns

    wt = STEP_TYPES["window_time"]({"part": "hour"}, tier).to_pandas()
    assert wt.hour.tolist() == [0, 0, 0]

    hist = rd.from_arrow(pa.table({
        **{f"b{i:02d}": pa.array([10]) for i in range(N_BUCKETS)},
        "count": pa.array([10]),
    }))
    hf = STEP_TYPES["hist_fraction"]({"lo": 0.0, "hi": 20.0},
                                     hist).to_pandas()
    assert hf.fraction.tolist() == [1.0]

    assert "binary_op" in MULTI_INPUT_TYPES
    bo = STEP_TYPES["binary_op"](
        {"on_cols": ["series_key", "window_start"], "left_val": "count",
         "right_val": "prev", "op": "sub", "out_col": "d"},
        [tier, STEP_TYPES["offset"](
            {"offset_seconds": 120, "rename": {"count": "prev"}}, tier)],
    ).to_pandas()
    assert sorted(bo.d.tolist()) == [1.0, 1.0]


def test_builder_setop_and_samplers(ray_session):
    import numpy as np
    import ray.data as rd

    from vertex_ray.pipelines.builder import STEP_TYPES

    tier = rd.from_arrow(pa.table({
        "series_key": ["m{a=1}", "m{a=2}"],
        "window_start": np.array([0, 0], dtype=np.int64),
        "count": np.array([3, 4], dtype=np.int64),
    }))
    other = rd.from_arrow(pa.table({
        "series_key": ["m{a=1}"],
        "window_start": np.array([0], dtype=np.int64),
    }))
    so = STEP_TYPES["set_op"](
        {"on_cols": ["series_key", "window_start"], "op": "and"},
        [tier, other]).to_pandas()
    assert so.series_key.tolist() == ["m{a=1}"]

    aw = STEP_TYPES["aggregate_without"](
        {"drop_labels": ["a"], "value_col": "count"}, tier).to_pandas()
    assert aw.series_key.tolist() == ["m{}"] and aw["count"].tolist() == [7]

    lr = STEP_TYPES["limit_ratio"]({"ratio": 1.0}, tier).to_pandas()
    assert len(lr) == 2


def test_builder_session_b_steps(ray_session):
    """limitk / resample / gopher / boilerplate resolve from the registry
    and run over tiny inputs."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.pipelines.builder import STEP_TYPES

    tier = rd.from_arrow(pa.table({
        "series_key": ["a", "a", "b", "b"],
        "window_start": np.array([0, 3600, 0, 3600], dtype=np.int64),
        "count": np.array([1, 2, 3, 4], dtype=np.int64),
    }))
    lk = STEP_TYPES["limitk"]({"k": 1}, tier).to_pandas()
    assert lk.series_key.nunique() == 1 and len(lk) == 2
    rs = STEP_TYPES["resample"](
        {"step_seconds": 7200, "tier_seconds": 3600,
         "col_ops": {"count": "sum"}}, tier).to_pandas()
    assert sorted(rs["count"].tolist()) == [3, 7]

    docs = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["the cat and the dog have fun with that ball " * 8,
                 "shared line\nunique bit"],
    }))
    g = STEP_TYPES["gopher"]({}, docs).to_pandas()
    assert set(g.columns) >= {"doc_id", "gopher_pass", "n_words"}
    bp = STEP_TYPES["boilerplate"]({"max_doc_freq": 1}, docs).to_pandas()
    assert len(bp) == 2


def test_multiplier_expands_template_per_value(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build, validate

    for t, vals in (("alpha", [1, 2, 60]), ("beta", [5, 70])):
        pq.write_table(pa.table({"value": pa.array(vals,
                                                   type=pa.float64())}),
                       str(tmp_path / f"{t}.parquet"))
    cfg = {
        "multipliers": {
            "per_table": {
                "var": "t",
                "values": {"glob": str(tmp_path / "*.parquet")},
                "template": {
                    "sources": {
                        "src_${t}": {"type": "parquet",
                                     "path": str(tmp_path) +
                                     "/${t}.parquet"},
                    },
                    "transforms": {
                        "big_${t}": {"type": "filter",
                                     "inputs": ["src_${t}"],
                                     "where": "value > 10.0"},
                    },
                },
            },
        },
    }
    assert validate(cfg) == []
    built = build(cfg)
    assert built["big_alpha"].count() == 1   # 60
    assert built["big_beta"].count() == 1    # 70


def test_multiplier_duplicate_name_is_error():
    from vertex_ray.pipelines.builder import validate

    cfg = {
        "sources": {"src_a": {"type": "parquet", "path": "/x.parquet"}},
        "multipliers": {
            "m": {"var": "t", "values": ["a"],
                  "template": {"sources": {
                      "src_${t}": {"type": "parquet",
                                   "path": "/${t}.parquet"}}}},
        },
    }
    errs = validate(cfg)
    assert errs and "already defined" in errs[0]


def test_builder_span_steps(ray_session, tmp_path):
    """Trace/span steps are config-buildable (spans / trace_assemble /
    service_graph over a transcripts-shaped parquet source)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build

    t = pa.table({
        "conv_id": pa.array(["c0", "c0", "c0", "c1", "c1"]),
        "turn_idx": pa.array([0, 1, 2, 0, 1], pa.int32()),
        "role": pa.array(["user", "assistant", "tool", "user",
                          "assistant"]),
        "tool": pa.array(["", "", "grep", "", ""]),
        "ts": pa.array(np.array([0, 5, 9, 100, 130], np.int64) * 10**6,
                       pa.timestamp("us")),
    })
    src = tmp_path / "turns.parquet"
    pq.write_table(t, src)
    built = build({
        "sources": {"turns": {"type": "parquet", "path": str(src)}},
        "transforms": {
            "sp": {"type": "spans", "inputs": ["turns"], "n_buckets": 2},
            "tr": {"type": "trace_assemble", "inputs": ["turns"],
                   "n_buckets": 2},
            "sg": {"type": "service_graph", "inputs": ["turns"],
                   "n_buckets": 2},
        },
    })
    sp = built["sp"].to_pandas()
    assert len(sp) == 5 and set(sp.trace_id) == {"c0", "c1"}
    tr = built["tr"].to_pandas().sort_values("trace_id")
    assert tr.n_spans.tolist() == [3, 2]
    sg = built["sg"].to_pandas()
    assert int(sg[(sg.parent_name == "user")
                  & (sg.child_name == "assistant")]["n_calls"].iloc[0]) == 2


def test_builder_eval_nested_path_target(ray_session, tmp_path):
    """`eval` set targets containing '.' write nested struct paths (the
    reference's path-addressed rewrite: .doc.meta.flag = expr)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build

    t = pa.table({
        "v": pa.array([10, 90], pa.int64()),
        "doc": pa.array([{"meta": {"src": "a"}}, {"meta": {"src": "b"}}]),
    })
    src = tmp_path / "rows.parquet"
    pq.write_table(t, src)
    built = build({
        "sources": {"rows": {"type": "parquet", "path": str(src)}},
        "transforms": {
            "ev": {"type": "eval", "inputs": ["rows"],
                   "set": {"doc.meta.flag": "v > 50",
                           "fresh.x": "v * 2"}},
        },
    })
    df = built["ev"].to_pandas()
    assert [d["meta"]["flag"] for d in df["doc"]] == [False, True]
    assert [d["meta"]["src"] for d in df["doc"]] == ["a", "b"]
    assert [d["x"] for d in df["fresh"]] == [20, 180]


def test_builder_eval_flat_dotted_column_name(ray_session, tmp_path):
    """A flat column literally named 'rate.5m' keeps flat set/overwrite
    semantics — the path branch only fires when no flat column with the
    full dotted name exists and the root is a struct/missing (ADVICE r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build

    t = pa.table({
        "v": pa.array([10, 90], pa.int64()),
        "rate.5m": pa.array([0.0, 0.0], pa.float64()),
        "rate": pa.array([1, 2], pa.int64()),  # non-struct root column
    })
    src = tmp_path / "rows.parquet"
    pq.write_table(t, src)
    built = build({
        "sources": {"rows": {"type": "parquet", "path": str(src)}},
        "transforms": {
            # overwrite the existing flat dotted column AND create a new
            # flat dotted column whose root is a non-struct column
            "ev": {"type": "eval", "inputs": ["rows"],
                   "set": {"rate.5m": "v * 1.5", "rate.1h": "v + 1"}},
        },
    })
    df = built["ev"].to_pandas()
    assert df["rate.5m"].tolist() == [15.0, 135.0]
    assert df["rate.1h"].tolist() == [11, 91]
    assert df["rate"].tolist() == [1, 2]  # untouched


def test_env_interpolation_semantics():
    """Bash-parameter-expansion interpolation (env.rs:7-15 semantics):
    $$ escape, plain/braced refs, :-/- defaults, :?/? requireds."""
    import pytest

    from vertex_ray.pipelines.builder import interpolate_env

    env = {"HOST": "db1", "EMPTY": "", "PORT": "5432"}
    cfg = {
        "sources": {
            "s": {"type": "parquet",
                  "path": "/data/$HOST/${PORT}/f.parquet",
                  "note": "cost: $$5",
                  "a": "${MISSING-fallback}",
                  "b": "${EMPTY:-fb2}",
                  "c": "${EMPTY-kept}",
                  "d": "${HOST:?must be set}"},
        },
    }
    out = interpolate_env(cfg, env)
    s = out["sources"]["s"]
    assert s["path"] == "/data/db1/5432/f.parquet"
    assert s["note"] == "cost: $5"
    assert s["a"] == "fallback"     # unset → default
    assert s["b"] == "fb2"          # empty + :- → default
    assert s["c"] == ""             # empty + -  → kept (set)
    assert s["d"] == "db1"
    with pytest.raises(ValueError, match="NOPE"):
        interpolate_env({"x": "${NOPE:?}"}, env)
    with pytest.raises(ValueError, match="undefined"):
        interpolate_env({"x": "$NOPE"}, env)


def test_secret_resolution(tmp_path):
    import json

    import pytest

    from vertex_ray.pipelines.builder import resolve_secrets

    sf = tmp_path / "secrets.json"
    sf.write_text(json.dumps({"token": "abc123"}))
    cfg = {"sinks": {"s": {"auth": "Bearer SECRET[vault.token]"}}}
    out = resolve_secrets(cfg, {"vault": {"type": "file",
                                          "path": str(sf)}})
    assert out["sinks"]["s"]["auth"] == "Bearer abc123"
    with pytest.raises(ValueError, match="unknown secret store"):
        resolve_secrets({"x": "SECRET[nope.k]"}, {})


def test_config_diff_downstream_closure():
    from vertex_ray.pipelines.builder import config_diff

    old = {
        "sources": {"ev": {"type": "parquet", "path": "/a"}},
        "transforms": {
            "f": {"type": "filter", "inputs": ["ev"],
                  "where": ["v", ">", 1]},
            "g": {"type": "relabel", "inputs": ["f"], "ops": []},
            "h": {"type": "relabel", "inputs": ["ev"], "ops": []},
        },
    }
    new = {
        "sources": {"ev": {"type": "parquet", "path": "/a"}},
        "transforms": {
            "f": {"type": "filter", "inputs": ["ev"],
                  "where": ["v", ">", 2]},      # changed
            "g": {"type": "relabel", "inputs": ["f"], "ops": []},
            "h": {"type": "relabel", "inputs": ["ev"], "ops": []},
            "i": {"type": "relabel", "inputs": ["h"], "ops": []},  # added
        },
    }
    d = config_diff(old, new)
    assert d["changed"] == ["f"]
    assert d["added"] == ["i"]
    assert d["to_rebuild"] == ["f", "g", "i"]   # g downstream of f
    assert d["reusable"] == ["ev", "h"]


def test_rebuild_reuses_unchanged_stages(ray_session, tmp_path):
    """Reload e2e (the launch.rs:219-295 reload analogue): changing one
    transform's parameter rebuilds only it and its downstream — the
    untouched branch keeps the SAME Dataset objects."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build, rebuild

    t = pa.table({"v": pa.array([1, 5, 50, 500], pa.int64()),
                  "k": pa.array(["a", "b", "a", "b"])})
    src = tmp_path / "rows.parquet"
    pq.write_table(t, src)
    old = {
        "sources": {"rows": {"type": "parquet", "path": str(src)}},
        "transforms": {
            "big": {"type": "filter", "inputs": ["rows"],
                    "where": ["v", ">", 10]},
            "tag": {"type": "relabel", "inputs": ["big"],
                    "ops": [["set", "tier", "hot"]]},
            "other": {"type": "filter", "inputs": ["rows"],
                      "where": ["v", "<", 100]},
        },
    }
    built = build(old)
    new = {**old, "transforms": {**old["transforms"],
                                 "big": {"type": "filter",
                                         "inputs": ["rows"],
                                         "where": ["v", ">", 100]}}}
    nb, d = rebuild(old, new, built)
    assert d["to_rebuild"] == ["big", "tag"]
    assert nb["other"] is built["other"]       # reused object identity
    assert nb["rows"] is built["rows"]
    assert nb["big"] is not built["big"]       # rebuilt
    assert nb["big"].to_pandas()["v"].tolist() == [500]
    assert nb["tag"].to_pandas()["tier"].tolist() == ["hot"]


def test_builder_round4_steps(ray_session, tmp_path):
    """The round-4 operators are reachable from the config surface:
    jaeger wire round-trip, type-tagged JSON dedup, char-trigram langid,
    LSH signatures — each as a STEP_TYPES transform."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.builder import build

    # spans → jaeger encode → decode round-trip via config
    spans = pa.table({
        "trace_id": pa.array(["c1", "c1"]),
        "span_id": pa.array([1, 2], pa.int64()),
        "parent_span_id": pa.array([0, 1], pa.int64()),
        "name": pa.array(["user", "assistant"]),
        "kind": pa.array(["client", "server"]),
        "tool": pa.array(["", ""]),
        "start_ns": pa.array([10**9, 2 * 10**9], pa.int64()),
        "end_ns": pa.array([2 * 10**9, 2 * 10**9], pa.int64()),
        "duration_ns": pa.array([10**9, 0], pa.int64()),
    })
    sp = tmp_path / "spans.parquet"
    pq.write_table(spans, sp)
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "doc": pa.array(['{"m":"1"}', '{"m":1}', '{"m":"1"}']),
        "text": pa.array(["the cat sat on the mat with the hat",
                          "der hund lief schnell durch die stadt heute",
                          "le chat est assis sur le tapis rouge"]),
    })
    dp = tmp_path / "docs.parquet"
    pq.write_table(docs, dp)
    built = build({
        "sources": {
            "spans": {"type": "parquet", "path": str(sp)},
            "docs": {"type": "parquet", "path": str(dp)},
        },
        "transforms": {
            "wire": {"type": "jaeger_encode", "inputs": ["spans"]},
            "back": {"type": "jaeger_decode", "inputs": ["wire"]},
            "typed": {"type": "json_typed", "inputs": ["docs"],
                      "paths": {"m": ".m"}},
            "dedup": {"type": "json_dedup", "inputs": ["docs"],
                      "paths": {"m": ".m"}, "id_col": "doc_id"},
            "lang": {"type": "langid_ngram", "inputs": ["docs"]},
        },
    })
    back = built["back"].to_pandas().sort_values("span_id")
    assert back["duration_ns"].tolist() == [10**9, 0]
    typed = built["typed"].to_pandas().sort_values("doc_id")
    assert typed["m_type"].tolist() == ["VARCHAR", "UBIGINT", "VARCHAR"]
    dd = built["dedup"].to_pandas().sort_values("doc_id")
    assert dd["doc_id"].tolist() == [1, 2]  # type-sensitive: both kept
    lang = built["lang"].to_pandas().sort_values("doc_id")
    assert lang["lang"].tolist() == ["en", "de", "fr"]


def test_serve_watch_reload_loop(ray_session, tmp_path):
    """`serve --watch` e2e (src/launch.rs:219-295 analogue): the loop
    polls the config file, and editing a throttle's window size reloads
    ONLY that component and its downstream — the untouched branch keeps
    its built Dataset objects; an invalid edit is rejected and the old
    topology keeps serving."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.cli import _load_config
    from vertex_ray.pipelines.builder import serve_loop

    src = tmp_path / "rows.parquet"
    pq.write_table(pa.table({
        "k": pa.array(["a"] * 6 + ["b"] * 2),
        "ts": pa.array(list(range(6)) + [0, 1], pa.int64()),
        "eid": pa.array(list(range(8)), pa.int64()),
    }), src)
    cfg = {
        "sources": {"rows": {"type": "parquet", "path": str(src)}},
        "transforms": {
            "slow": {"type": "throttle", "inputs": ["rows"],
                     "key_col": "k", "ts_col": "ts",
                     "window_seconds": 2, "threshold": 1,
                     "tie_col": "eid"},
            "tag": {"type": "relabel", "inputs": ["slow"],
                    "ops": [["set", "tier", "hot"]]},
            "other": {"type": "relabel", "inputs": ["rows"],
                      "ops": [["set", "tier", "raw"]]},
        },
    }
    path = tmp_path / "pipe.json"
    path.write_text(json.dumps(cfg))

    lines: list[str] = []
    edits = iter([
        # tick 1: broken edit (undefined input) → rejected, keeps serving
        {**cfg, "transforms": {**cfg["transforms"],
                               "tag": {"type": "relabel",
                                       "inputs": ["nope"], "ops": []}}},
        # tick 2: the window-size edit → reload rebuilds slow + tag only
        {**cfg, "transforms": {**cfg["transforms"],
                               "slow": {**cfg["transforms"]["slow"],
                                        "window_seconds": 100}}},
    ])

    def edit_then_tick(_interval):
        nxt = next(edits, None)
        if nxt is not None:
            path.write_text(json.dumps(nxt))
            os.utime(path, ns=(len(lines) * 10**9, len(lines) * 10**9))

    new_cfg, built, n = serve_loop(
        str(path), _load_config, interval=0.01, watch=True,
        max_reloads=1, max_ticks=5, log=lines.append,
        sleep=edit_then_tick)
    assert n == 1
    joined = "\n".join(lines)
    assert "reload rejected" in joined and "undefined input" in joined
    assert "rebuilt=['slow', 'tag']" in joined
    assert "reused=['other', 'rows']" in joined
    assert new_cfg["transforms"]["slow"]["window_seconds"] == 100
    # the reloaded topology computes with the NEW window: one 100s
    # window per key → threshold 1 keeps only the first event per key
    out = built["tag"].to_pandas().sort_values("eid")
    assert out["eid"].tolist() == [0, 6]
    assert (out["tier"] == "hot").all()


def test_serve_loop_sighup_analogue_and_vanished_config(ray_session,
                                                        tmp_path):
    """reload_requested (the SIGHUP hook) forces a reload without an
    mtime change even with watch=False; a vanished config file is
    survived (old topology keeps serving)."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.cli import _load_config
    from vertex_ray.pipelines.builder import serve_loop

    src = tmp_path / "rows.parquet"
    pq.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}), src)
    cfg = {"sources": {"rows": {"type": "parquet", "path": str(src)}}}
    path = tmp_path / "pipe.json"
    path.write_text(json.dumps(cfg))

    lines: list[str] = []
    hups = iter([False, True])
    _, _, n = serve_loop(str(path), _load_config, interval=0.01,
                         watch=False, max_reloads=1, max_ticks=4,
                         log=lines.append, sleep=lambda _i: None,
                         reload_requested=lambda: next(hups, False))
    assert n == 1 and "reloaded #1" in "\n".join(lines)

    # watch=True + file vanishing mid-serve
    lines2: list[str] = []
    ticks = {"n": 0}

    def vanish(_i):
        ticks["n"] += 1
        if ticks["n"] == 1 and path.exists():
            path.unlink()

    _, _, n2 = serve_loop(str(path), _load_config, interval=0.01,
                          watch=True, max_ticks=2, log=lines2.append,
                          sleep=vanish)
    assert n2 == 0 and "config vanished" in "\n".join(lines2)


def test_serve_loop_rejects_non_valueerror_build_failures(ray_session,
                                                          tmp_path):
    """validate() passes configs whose params break only at build time
    (missing 'path' → KeyError); a reload with such a config must be
    REJECTED with the old topology still serving — not kill the loop."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vertex_ray.cli import _load_config
    from vertex_ray.pipelines.builder import serve_loop

    src = tmp_path / "rows.parquet"
    pq.write_table(pa.table({"v": pa.array([1, 2], pa.int64())}), src)
    cfg = {"sources": {"rows": {"type": "parquet", "path": str(src)}}}
    path = tmp_path / "pipe.json"
    path.write_text(json.dumps(cfg))
    lines: list[str] = []
    edits = iter([
        {"sources": {"rows": {"type": "parquet"}}},  # KeyError at build
        cfg,                                          # back to good
    ])

    def edit_then_tick(_i):
        nxt = next(edits, None)
        if nxt is not None:
            path.write_text(json.dumps(nxt))
            os.utime(path, ns=(len(lines) * 10**9, len(lines) * 10**9))

    _, built, n = serve_loop(str(path), _load_config, interval=0.01,
                             watch=True, max_reloads=1, max_ticks=4,
                             log=lines.append, sleep=edit_then_tick)
    joined = "\n".join(lines)
    assert "reload rejected" in joined and "KeyError" in joined
    assert n == 1  # the later good edit still reloads fine
    assert built["rows"].count() == 2
