"""Trace/span slice (stages/trace): span derivation, trace assembly,
and the span-metric rollup through the tier cascade + Gorilla store."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vertex_ray.stages.trace import (
    SPAN_PROJECT_COLUMNS,
    span_rollup_store,
    spans_from_transcripts,
    trace_assemble,
)


def _mini(ts_lists):
    """Build a transcripts-shaped table; ts in epoch seconds."""
    rows = []
    for ci, tss in enumerate(ts_lists):
        for ti, t in enumerate(tss):
            role = ["user", "assistant", "tool"][ti % 3]
            rows.append((f"conv{ci}", ti, role,
                         "search" if role == "tool" else "", t))
    conv, turn, role, tool, ts = zip(*rows)
    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(role, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(np.array(ts, np.int64) * 1_000_000,
                       pa.timestamp("us")),
    })


def test_spans_basic(ray_session):
    t = _mini([[0, 10, 25], [100, 160]])
    df = (spans_from_transcripts(rd.from_arrow(t), n_buckets=4)
          .to_pandas().sort_values(["trace_id", "span_id"])
          .reset_index(drop=True))
    assert len(df) == 5
    c0 = df[df.trace_id == "conv0"]
    # root convention: parent_span_id == 0, span_id never 0 (span.rs:141-155)
    assert c0.parent_span_id.tolist() == [0, 1, 2]
    assert c0.span_id.tolist() == [1, 2, 3]
    assert c0.kind.tolist() == ["client", "server", "internal"]
    # end = next turn's start; final span ends at its own start
    assert c0.end_ns.tolist() == [10 * 10**9, 25 * 10**9, 25 * 10**9]
    assert c0.duration_ns.tolist() == [10 * 10**9, 15 * 10**9, 0]
    c1 = df[df.trace_id == "conv1"]
    assert c1.duration_ns.tolist() == [60 * 10**9, 0]


def test_spans_split_across_blocks(ray_session):
    """Span assembly is exact even when a conversation's turns arrive in
    separate input blocks (the bucket exchange re-co-locates them)."""
    t = _mini([[0, 30, 90, 150]])
    ds = rd.from_arrow(t).repartition(3)
    df = (spans_from_transcripts(ds, n_buckets=2).to_pandas()
          .sort_values("span_id").reset_index(drop=True))
    assert df.duration_ns.tolist() == [30 * 10**9, 60 * 10**9,
                                       60 * 10**9, 0]


def test_trace_assemble(ray_session):
    t = _mini([[0, 10, 25, 40], [100, 160]])
    df = (trace_assemble(rd.from_arrow(t), n_buckets=4).to_pandas()
          .sort_values("trace_id").reset_index(drop=True))
    assert df.n_spans.tolist() == [4, 2]
    assert df.n_tool_spans.tolist() == [1, 0]
    assert df.duration_ns.tolist() == [40 * 10**9, 60 * 10**9]


def test_span_rollup_store_roundtrip(ray_session):
    """Counts and histogram buckets survive the partial-merge exchange,
    the 1m→1h cascade and the Gorilla encode/decode bit-for-bit."""
    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.schema import DEFAULT_BUCKETS

    t = _mini([[0, 10, 25, 3600], [30, 90]])
    blocks = span_rollup_store(rd.from_arrow(t), window_s=60, tier="1m",
                               cascade=(("1h", 3600),), n_buckets=4)
    dec = decode_tier_blocks(blocks).to_pandas()
    cnt_1h = dec[(dec.tier == "1h")
                 & (dec.series_key == "span_count_total{role=user}")]
    # user spans at ts 0, 3600(conv0) and 30(conv1): windows 0 and 3600
    assert sorted(cnt_1h.window_start.tolist()) == [0, 3600]
    assert cnt_1h.sort_values("window_start")["count"].tolist() == [2, 1]
    dur_1h = dec[(dec.tier == "1h")
                 & (dec.series_key == "span_duration_seconds{role=user}")]
    w0 = dur_1h[dur_1h.window_start == 0].iloc[0]
    # durations in window 0 for user: 10s (conv0) and 60s (conv1)
    assert w0["count"] == 2 and w0["sum"] == 70.0
    le = [b for b in DEFAULT_BUCKETS if b >= 10]
    assert w0[f"b{DEFAULT_BUCKETS.index(le[0]):02d}"] >= 1


def test_spans_empty_input(ray_session):
    t = _mini([[0]]).schema.empty_table()
    assert spans_from_transcripts(rd.from_arrow(t), 2).count() == 0
    assert trace_assemble(rd.from_arrow(t), 2).count() == 0


def test_span_project_columns_cover_module():
    assert SPAN_PROJECT_COLUMNS == ["conv_id", "turn_idx", "role",
                                    "tool", "ts"]


def test_service_graph_edges(ray_session):
    from vertex_ray.stages.trace import service_graph

    t = _mini([[0, 10, 25, 40], [100, 160]])
    df = (service_graph(rd.from_arrow(t), n_buckets=4).to_pandas()
          .sort_values(["parent_name", "child_name"])
          .reset_index(drop=True))
    # conv0 roles: user->assistant->tool->user; conv1: user->assistant
    got = {(r.parent_name, r.child_name): r.n_calls
           for r in df.itertuples()}
    assert got == {("user", "assistant"): 2, ("assistant", "tool"): 1,
                   ("tool", "user"): 1}


def _epoch_split(t, cut_s):
    """Split a transcripts table into two epochs at ts < cut_s."""
    import pyarrow.compute as pc

    cut = pa.scalar(cut_s * 1_000_000, pa.timestamp("us"))
    return (rd.from_arrow(t.filter(pc.less(t["ts"], cut))),
            rd.from_arrow(t.filter(pc.greater_equal(t["ts"], cut))))


def test_span_rollup_incremental_equals_oneshot(ray_session):
    """Epoch-incremental span ingest (per-conv last-turn carry as the
    ONLY cross-epoch state) equals the one-shot store bit-for-bit on
    the order-free columns — including conversations straddling the
    epoch boundary (their boundary span gets its true duration) and
    conversations that END in epoch 1 (their final duration-0 span
    emits exactly once, at finalize)."""
    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.schema import BUCKET_COLS
    from vertex_ray.stages.trace import span_rollup_store_incremental

    # conv0 straddles the cut; conv1 ends before it; conv2 starts after
    t = _mini([[0, 50, 130, 200], [10, 40], [150, 260, 270]])
    cut = 100
    e1, e2 = _epoch_split(t, cut)
    inc = span_rollup_store_incremental(
        [e1, e2], window_s=60, tier="1m", cascade=(("1h", 3600),),
        n_buckets=4)
    one = span_rollup_store(rd.from_arrow(t), window_s=60, tier="1m",
                            cascade=(("1h", 3600),), n_buckets=4)
    cols = (["tier", "series_key", "window_start", "sum", "count",
             "min", "max"] + list(BUCKET_COLS))

    def canon(blocks):
        df = decode_tier_blocks(blocks).to_pandas()[cols]
        return df.sort_values(cols[:3]).reset_index(drop=True)

    a, b = canon(inc), canon(one)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_span_rollup_incremental_three_epochs_sf0001(ray_session):
    """Same equality over the real sf0.001 transcripts split into three
    ts epochs."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.stages.trace import span_rollup_store_incremental
    from vertex_ray.synth import ensure_transcripts

    p = ensure_transcripts("/root/testdata/sf0.001")
    t = pq.read_table(p, columns=SPAN_PROJECT_COLUMNS)
    ts = t["ts"].cast(pa.int64())
    lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    eps = [rd.from_arrow(t.filter(m)) for m in [
        pc.less(ts, c1),
        pc.and_(pc.greater_equal(ts, c1), pc.less(ts, c2)),
        pc.greater_equal(ts, c2)]]
    inc = span_rollup_store_incremental(eps, window_s=60, tier="1m",
                                        n_buckets=8)
    one = span_rollup_store(rd.from_arrow(t), window_s=60, tier="1m",
                            n_buckets=8)
    cols = ["series_key", "window_start", "sum", "count", "min", "max"]

    def canon(blocks):
        df = decode_tier_blocks(blocks).to_pandas()[cols]
        return df.sort_values(cols[:2]).reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(canon(inc), canon(one))


def test_span_rollup_incremental_empty_epochs(ray_session):
    """Empty epochs contribute nothing; an all-empty ingest yields an
    empty store."""
    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.stages.trace import span_rollup_store_incremental

    empty = rd.from_arrow(_mini([[0]]).schema.empty_table())
    t = _mini([[0, 30, 70]])
    blocks = span_rollup_store_incremental(
        [empty, rd.from_arrow(t), empty], window_s=60, tier="1m",
        n_buckets=2)
    dec = decode_tier_blocks(blocks).to_pandas()
    got = dec[dec.series_key == "span_count_total{role=user}"]
    assert got["count"].sum() == 1
    blocks0 = span_rollup_store_incremental([empty, empty], window_s=60,
                                            tier="1m", n_buckets=2)
    assert decode_tier_blocks(blocks0).count() == 0


def test_span_store_serves_the_full_read_stack(ray_session, tmp_path):
    """A COMMITTED span-metric store answers the generic read verbs:
    query_range pruned reads and the PromQL text front-end — the span
    variant plugs into the same store/read machinery as every other
    metric (no span-specific read path)."""
    import os

    from vertex_ray.promql_lang import eval_promql
    from vertex_ray.read import query_range
    from vertex_ray.stages.trace import span_rollup_store
    from vertex_ray.state.checkpoint import write_stage

    t = _mini([[0, 50, 130, 3700], [10, 40, 3800]])
    blocks = span_rollup_store(rd.from_arrow(t), window_s=60, tier="1m",
                               cascade=(("1h", 3600),), n_buckets=2)
    out = str(tmp_path / "span_store")
    write_stage(blocks, os.path.join(out, "blocks"), {"kind": "spans"})
    got = (query_range(out, "1h", metric="span_count_total",
                       columns=["series_key", "window_start", "count"])
           .to_pandas().sort_values(["series_key", "window_start"]))
    assert got["count"].sum() == 7  # every turn is one span
    user = got[got.series_key == "span_count_total{role=user}"]
    assert user["count"].tolist() == [2, 1]
    # PromQL text front-end over the same store (explicit range — the
    # toy data lives at epoch 0)
    df = (eval_promql(out, "sum by (role) (span_count_total)",
                      start=0, end=3600).to_pandas()
          .sort_values(["role", "window_start"]).reset_index(drop=True))
    byrole = df.groupby("role")["value"].sum().to_dict()
    assert byrole == {"user": 3.0, "assistant": 2.0, "tool": 2.0}


def test_span_rollup_incremental_rejects_out_of_order(ray_session):
    """A later epoch delivering an EARLIER turn of an already-carried
    conversation raises loudly instead of silently emitting a wrong
    duration (ADVICE r3: epoch1={turn0,turn2}, epoch2={turn1})."""
    import pytest

    from vertex_ray.stages.trace import span_rollup_store_incremental

    def turns(idx_ts):
        conv = ["convX"] * len(idx_ts)
        return pa.table({
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array([i for i, _ in idx_ts], pa.int32()),
            "role": pa.array(["user"] * len(idx_ts), pa.string()),
            "tool": pa.array([""] * len(idx_ts), pa.string()),
            "ts": pa.array(np.array([t for _, t in idx_ts], np.int64)
                           * 1_000_000, pa.timestamp("us")),
        })

    eps = [rd.from_arrow(turns([(0, 0), (2, 50)])),
           rd.from_arrow(turns([(1, 10)]))]
    with pytest.raises(Exception) as ei:
        span_rollup_store_incremental(
            eps, window_s=60, tier="1m", n_buckets=2).materialize()
    assert "out-of-order" in str(ei.value)


def test_span_rollup_incremental_no_epochs_raises(ray_session):
    import pytest

    from vertex_ray.stages.trace import span_rollup_store_incremental

    with pytest.raises(ValueError, match="no epochs"):
        span_rollup_store_incremental([], window_s=60, tier="1m")
