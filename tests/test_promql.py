"""PromQL read-path operators: label re-derivation + cross-series
aggregation (sum by), and per-series moving-window aggregates
(avg/sum/max/min _over_time)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _tier_table():
    # two labels x two series each, 3 windows, deliberately out of order
    return pa.table({
        "series_key": [
            "turns_total{conv_id=c1,role=user}",
            "turns_total{conv_id=c2,role=user}",
            "turns_total{conv_id=c3,role=assistant}",
            "turns_total{conv_id=c1,role=user}",
            "turns_total{conv_id=c3,role=assistant}",
            "turns_total{conv_id=c2,role=user}",
        ],
        "window_start": [60, 60, 60, 120, 120, 180],
        "count": [2, 3, 5, 7, 11, 13],
    })


def test_extract_label():
    from vertex_ray.stages.promql import extract_label

    t = extract_label(_tier_table(), "role")
    assert t["role"].to_pylist() == [
        "user", "user", "assistant", "user", "assistant", "user"]
    # first tag and missing tag
    t2 = pa.table({"series_key": ["m{a=x,b=y}", "m{b=y}"]})
    from vertex_ray.stages.promql import extract_label as ex
    assert ex(t2, "a")["a"].to_pylist() == ["x", None]
    assert ex(t2, "b")["b"].to_pylist() == ["y", "y"]


def test_label_aggregate_sum_by(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import label_aggregate

    out = (label_aggregate(rd.from_arrow(_tier_table()), "role", "count",
                           out_col="turns")
           .to_pandas().sort_values(["role", "window_start"])
           .reset_index(drop=True))
    exp = pd.DataFrame({
        "role": ["assistant", "assistant", "user", "user", "user"],
        "window_start": [60, 120, 60, 120, 180],
        "turns": [5, 11, 5, 7, 13],
    })
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_group_sum_multi_column(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import group_sum

    t = pa.table({
        "w": [60, 60, 120, 60, 120],
        "count": [1, 2, 3, 4, 5],
        "b00": [10, 20, 30, 40, 50],
        "b01": [1, 1, 1, 1, 1],
    })
    out = (group_sum(rd.from_arrow(t), ["w"], ["count", "b00", "b01"])
           .to_pandas().sort_values("w").reset_index(drop=True))
    assert out["count"].tolist() == [7, 8]
    assert out["b00"].tolist() == [70, 80]
    assert out["b01"].tolist() == [3, 2]


def test_over_time_avg_exact_frames(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    # one series with 5 windows, another overlapping to verify isolation
    t = pa.table({
        "series_key": ["s1"] * 5 + ["s2"] * 2,
        "window_start": [0, 60, 120, 180, 240, 0, 60],
        "count": [1, 2, 3, 4, 5, 100, 200],
    })
    out = (over_time(rd.from_arrow(t), "series_key", "window_start",
                     "count", 3, agg="avg", out_col="a")
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    # frames: [1], [1,2], [1,2,3], [2,3,4], [3,4,5]; s2: [100], [100,200]
    assert out["a"].tolist() == [1.0, 1.5, 2.0, 3.0, 4.0, 100.0, 150.0]


def test_over_time_sum_and_minmax(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({
        "series_key": ["s"] * 4,
        "window_start": [0, 60, 120, 180],
        "v": [4, 1, 3, 2],
    })
    ds = rd.from_arrow(t)
    s = over_time(ds, "series_key", "window_start", "v", 2,
                  agg="sum").to_pandas().sort_values("window_start")
    assert s["sum_over"].tolist() == [4.0, 5.0, 4.0, 5.0]
    mx = over_time(ds, "series_key", "window_start", "v", 2,
                   agg="max").to_pandas().sort_values("window_start")
    assert mx["max_over"].tolist() == [4.0, 4.0, 3.0, 3.0]
    mn = over_time(ds, "series_key", "window_start", "v", 2,
                   agg="min").to_pandas().sort_values("window_start")
    assert mn["min_over"].tolist() == [4.0, 1.0, 1.0, 2.0]


def test_over_time_rejects_float_avg(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({"k": ["s"], "w": [0], "v": [1.5]})
    ds = over_time(rd.from_arrow(t), "k", "w", "v", 2, agg="avg")
    with pytest.raises(Exception, match="integer"):
        ds.to_pandas()


def test_binary_op_vector_matching(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import binary_op

    l = rd.from_arrow(pa.table({
        "conv": ["a", "a", "b", "c"],
        "w": [60, 120, 60, 60],
        "errs": [1, 2, 3, 9],
    }))
    r = rd.from_arrow(pa.table({
        "conv": ["a", "a", "b"],
        "w": [60, 120, 60],
        "total": [4, 8, 6],
    }))
    out = (binary_op(l, r, ["conv", "w"], "errs", "total",
                     op="div", out_col="rate")
           .to_pandas().sort_values(["conv", "w"]).reset_index(drop=True))
    # ("c", 60) has no right match -> dropped (PromQL inner matching)
    assert out["conv"].tolist() == ["a", "a", "b"]
    assert out["rate"].tolist() == [0.25, 0.25, 0.5]


def test_label_aggregate_family(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import label_aggregate

    ds = rd.from_arrow(_tier_table())

    def run(agg):
        return (label_aggregate(ds, "role", "count", out_col="x", agg=agg)
                .to_pandas().sort_values(["role", "window_start"])
                .reset_index(drop=True))

    mx = run("max")
    assert mx["x"].tolist() == [5, 11, 3, 7, 13]
    mn = run("min")
    assert mn["x"].tolist() == [5, 11, 2, 7, 13]
    ct = run("count")
    assert ct["x"].tolist() == [1, 1, 2, 1, 1]
    av = run("avg")
    assert av["x"].tolist() == [5.0, 11.0, 2.5, 7.0, 13.0]
    sd = run("stddev")
    # population stddev; singleton groups -> 0.0, {2,3} -> 0.5
    assert sd["x"].tolist() == [0.0, 0.0, 0.5, 0.0, 0.0]


def test_over_time_count_and_quantile(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({
        "series_key": ["s1"] * 5 + ["s2"] * 2,
        "window_start": [60, 120, 180, 240, 300, 60, 120],
        "v": [1.0, 9.0, 5.0, 3.0, 7.0, 2.0, 4.0],
    })
    ds = rd.from_arrow(t)
    ct = (over_time(ds, "series_key", "window_start", "v", 3, agg="count",
                    out_col="n")
          .to_pandas().sort_values(["series_key", "window_start"])
          .reset_index(drop=True))
    assert ct["n"].tolist() == [1, 2, 3, 3, 3, 1, 2]
    qt = (over_time(ds, "series_key", "window_start", "v", 3,
                    agg="quantile", q=0.5, out_col="med")
          .to_pandas().sort_values(["series_key", "window_start"])
          .reset_index(drop=True))
    # frame medians: [1], [1,9], [1,9,5], [9,5,3], [5,3,7] / [2], [2,4]
    assert qt["med"].tolist() == [1.0, 5.0, 5.0, 5.0, 5.0, 2.0, 3.0]


def test_topk_per_group_ascending(ray_session):
    import ray.data as rd

    from vertex_ray.stages.ops import topk_per_group

    t = pa.table({
        "g": [1, 1, 1, 1, 2, 2],
        "v": [4, 2, 9, 2, 5, 3],
        "id": ["a", "b", "c", "d", "e", "f"],
    })
    out = (topk_per_group(rd.from_arrow(t), "g", "v", 2, tiebreak="id",
                          ascending=True)
           .to_pandas().sort_values(["g", "v", "id"]).reset_index(drop=True))
    assert out["id"].tolist() == ["b", "d", "f", "e"]
    assert out["v"].tolist() == [2, 2, 3, 5]


def test_record_rule_roundtrip(ray_session):
    """record_rule materializes an aggregated gauge into Gorilla blocks;
    decode returns exactly the aggregate values (compression round-trip)."""
    import ray.data as rd

    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.stages.record import record_rule

    blocks = record_rule(
        rd.from_arrow(_tier_table()), label="role", value_col="count",
        new_metric="role_turns", tier="1h", n_buckets=4)
    dec = (decode_tier_blocks(blocks).to_pandas()
           .sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    assert dec["tier"].unique().tolist() == ["1h"]
    assert not dec["filled"].any() and not dec["stale"].any()
    got = {(r.series_key, int(r.window_start)): r.last
           for r in dec.itertuples()}
    assert got == {
        ("role_turns{role=assistant}", 60): 5.0,
        ("role_turns{role=assistant}", 120): 11.0,
        ("role_turns{role=user}", 60): 5.0,
        ("role_turns{role=user}", 120): 7.0,
        ("role_turns{role=user}", 180): 13.0,
    }


def test_zscore_over_time(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import zscore_over_time

    t = pa.table({
        "k": ["s"] * 5 + ["c"] * 3,
        "w": [0, 60, 120, 180, 240, 0, 60, 120],
        # s: baseline {1,3} -> mean 2, pop std 1 -> z(10) = 8
        # c: constant history -> variance 0 -> NaN
        "v": [1, 3, 10, 2, 2, 5, 5, 5],
    })
    out = (zscore_over_time(rd.from_arrow(t), "k", "w", "v", 6)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    z = out["zscore"].tolist()
    # c: first row no baseline, rest constant baseline -> all NaN
    assert all(np.isnan(x) for x in z[:3])
    # s: row0 no baseline; row1 baseline {1} zero var -> NaN; row2 z=8
    assert np.isnan(z[3]) and np.isnan(z[4])
    assert z[5] == 8.0
    # row3 (v=2): baseline {1,3,10} mean 14/3, var (110-196/3)/3
    m = 14 / 3
    var = (110 - 14.0 * 14.0 / 3) / 3
    assert z[6] == (2 - m) / np.sqrt(var)


def test_lttb_downsample(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import lttb_downsample

    n = 400
    w = np.arange(n) * 60
    v = np.sin(np.arange(n) / 7.0) * 10
    v[123] = 99.0  # spike LTTB must keep
    t = pa.table({
        "series_key": ["s"] * n + ["tiny"] * 3,
        "window_start": np.concatenate([w, [0, 60, 120]]),
        "value": np.concatenate([v, [1.0, 2.0, 3.0]]),
    })
    out = (lttb_downsample(rd.from_arrow(t), "series_key", "window_start",
                           "value", 50)
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    s = out[out.series_key == "s"]
    tiny = out[out.series_key == "tiny"]
    assert len(s) == 50
    assert len(tiny) == 3  # <= n_out passes through
    # endpoints exact
    assert s["window_start"].iloc[0] == 0 and s["window_start"].iloc[-1] == w[-1]
    # the spike survives downsampling
    assert 99.0 in s["value"].to_numpy()


def test_holt_winters_matches_sequential(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import holt_winters

    sf, tf = 0.4, 0.3
    series = {"a": [3.0, 7.0, 2.0, 9.0, 4.0], "b": [10.0, 12.0], "solo": [5.0]}
    rows = []
    for k, vs in series.items():
        for i, v in enumerate(vs):
            rows.append({"k": k, "w": i * 60, "v": v})
    out = (holt_winters(rd.from_items(rows), "k", "w", "v", sf=sf, tf=tf)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    # single-sample series dropped
    assert "solo" not in set(out["k"])

    def ref(vs):
        s, b = vs[0], vs[1] - vs[0]
        exp = [s]
        for x in vs[1:]:
            s_new = sf * x + (1.0 - sf) * (s + b)
            b = tf * (s_new - s) + (1.0 - tf) * b
            s = s_new
            exp.append(s)
        return exp

    for k, vs in (("a", series["a"]), ("b", series["b"])):
        got = out[out.k == k].sort_values("w")["smoothed"].to_numpy()
        np.testing.assert_array_equal(got, np.array(ref(vs)))


def test_predict_linear(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import predict_linear

    # perfectly linear series: y = 2*i + 1 -> prediction is exact
    t = pa.table({
        "k": ["s"] * 5 + ["one"],
        "w": [0, 3600, 7200, 10800, 14400, 0],
        "v": [1, 3, 5, 7, 9, 42],
    })
    out = (predict_linear(rd.from_arrow(t), "k", "w", "v", n=4,
                          steps_ahead=2, tier_seconds=3600)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    one = out[out.k == "one"]["predicted"]
    assert np.isnan(one.iloc[0])  # single sample: no slope
    s = out[out.k == "s"].sort_values("w")["predicted"].to_numpy()
    assert np.isnan(s[0])
    # from the second window on the fit is exact: value at +2 windows
    np.testing.assert_allclose(s[1:], [7.0, 9.0, 11.0, 13.0], atol=1e-12)


def test_promql_kernels_random_crosscheck(ray_session):
    """Seeded random sweep: the vectorized multi-series kernels (zscore,
    holt_winters, predict_linear, quantile_over_time) agree bit-for-bit
    with naive per-series Python references across ragged series lengths
    and duplicate values."""
    import ray.data as rd

    from vertex_ray.stages.promql import (
        holt_winters,
        over_time,
        predict_linear,
        zscore_over_time,
    )

    rng = np.random.default_rng(42)
    rows = []
    for s in range(12):
        ln = int(rng.integers(1, 15))
        vals = rng.integers(0, 6, ln)  # small ints, lots of ties
        for i, v in enumerate(vals):
            rows.append({"k": f"s{s:02d}", "w": i * 3600, "v": int(v)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(3)
    n = 4

    def per_series(fn):
        out = {}
        for k, g in df.groupby("k"):
            vs = g.sort_values("w")["v"].to_numpy()
            for i, w in enumerate(g.sort_values("w")["w"].to_numpy()):
                out[(k, w)] = fn(vs, i)
        return out

    # quantile_over_time
    def ref_quant(vs, i):
        fr = np.sort(vs[max(0, i - n + 1):i + 1].astype(np.float64))
        rn = (len(fr) - 1) * 0.9
        lo, hi = int(np.floor(rn)), int(np.ceil(rn))
        return fr[lo] if lo == hi else \
            (np.ceil(rn) - rn) * fr[lo] + (rn - np.floor(rn)) * fr[hi]

    got = over_time(ds, "k", "w", "v", n, agg="quantile", q=0.9,
                    out_col="x").to_pandas()
    want = per_series(ref_quant)
    for r in got.itertuples():
        assert r.x == want[(r.k, r.w)], (r.k, r.w)

    # zscore (baseline excludes current row)
    def ref_z(vs, i):
        base = vs[max(0, i - n):i].astype(np.int64)
        c = len(base)
        if c == 0:
            return None
        s, ss = float(base.sum()), float((base ** 2).sum())
        var = (ss - s * s / c) / c
        if var <= 0:
            return None
        return (float(vs[i]) - s / c) / np.sqrt(var)

    got = zscore_over_time(ds, "k", "w", "v", n).to_pandas()
    want = per_series(ref_z)
    for r in got.itertuples():
        w = want[(r.k, r.w)]
        assert (np.isnan(r.zscore) and w is None) or r.zscore == w, (r.k, r.w)

    # predict_linear (frame includes current row; x relative to current)
    def ref_pl(vs, i):
        fr = vs[max(0, i - n + 1):i + 1].astype(np.int64)
        c = len(fr)
        x = np.arange(i - c + 1, i + 1, dtype=np.int64) - i
        sy, sx = int(fr.sum()), int(x.sum())
        sxy, sxx = int((x * fr).sum()), int((x * x).sum())
        num, den = c * sxy - sx * sy, c * sxx - sx * sx
        if den <= 0:
            return None
        b = float(num) / den
        a = (float(sy) - b * float(sx)) / c
        return a + b * 2.0

    got = predict_linear(ds, "k", "w", "v", n=n, steps_ahead=2,
                         tier_seconds=3600).to_pandas()
    want = per_series(ref_pl)
    for r in got.itertuples():
        w = want[(r.k, r.w)]
        assert (np.isnan(r.predicted) and w is None) or r.predicted == w

    # holt_winters (series with >= 2 samples)
    def ref_hw_all():
        out = {}
        for k, g in df.groupby("k"):
            g = g.sort_values("w")
            vs = g["v"].to_numpy().astype(np.float64)
            if len(vs) < 2:
                continue
            s, b = vs[0], vs[1] - vs[0]
            res = [s]
            for x in vs[1:]:
                s_new = 0.4 * x + 0.6 * (s + b)
                b = 0.3 * (s_new - s) + 0.7 * b
                s = s_new
                res.append(s)
            for w, val in zip(g["w"].to_numpy(), res):
                out[(k, w)] = val
        return out

    got = holt_winters(ds, "k", "w", "v", sf=0.4, tf=0.3).to_pandas()
    want = ref_hw_all()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert r.smoothed == want[(r.k, r.w)], (r.k, r.w)


def test_resets_changes(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import resets_changes

    t = pa.table({
        # s indicators vs previous sample: dec=[0,1,0,0,1] chg=[0,1,0,1,1]
        # c: single-row series -> 0/0
        "k": ["s"] * 5 + ["c"],
        "w": [0, 60, 120, 180, 240, 0],
        "v": [5.0, 2.0, 2.0, 7.0, 1.0, 9.0],
    })
    out = (resets_changes(rd.from_arrow(t), "k", "w", "v", 3)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    # sorted order: c@0 then s@0..240; frame = 3 trailing rows, clipped
    # at the series start (sum of dec/chg indicators over rows p-2..p)
    assert out["resets"].tolist() == [0, 0, 1, 1, 1, 1]
    assert out["changes"].tolist() == [0, 0, 1, 1, 2, 2]


def test_deriv(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import deriv

    t = pa.table({
        "k": ["s"] * 4 + ["c"],
        "w": [0, 3600, 7200, 10800, 0],
        "v": np.array([10, 13, 10, 19, 5], dtype=np.int64),
    })
    out = (deriv(rd.from_arrow(t), "k", "w", "v", n=3, tier_seconds=3600)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    d = out["deriv"].tolist()
    # c@0 and s@0: single-sample frame -> NaN
    assert np.isnan(d[0]) and np.isnan(d[1])
    # s@3600: frame {10,13} at x={0,1} -> slope 3/window
    assert d[2] == 3.0 / 3600.0
    # s@7200: frame {10,13,10} -> slope 0
    assert d[3] == 0.0
    # s@10800: frame {13,10,19} at x={1,2,3} -> lstsq slope 3/window
    assert d[4] == 3.0 / 3600.0


def test_irate_idelta(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import irate_idelta

    t = pa.table({
        "k": ["s"] * 4 + ["c"],
        # uneven gaps: 60s then 120s then 60s
        "w": [0, 60, 180, 240, 0],
        "v": np.array([10, 16, 4, 4, 7], dtype=np.int64),
    })
    out = (irate_idelta(rd.from_arrow(t), "k", "w", "v")
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    idelta = out["idelta"].tolist()
    irate = out["irate"].tolist()
    # c@0, s@0: first sample of each series -> NaN
    assert np.isnan(idelta[0]) and np.isnan(irate[0])
    assert np.isnan(idelta[1]) and np.isnan(irate[1])
    # s@60: +6 over 60s
    assert idelta[2] == 6.0 and irate[2] == 0.1
    # s@180: decrease 16 -> 4 => idelta -12; reset rule: irate = 4/120
    assert idelta[3] == -12.0 and irate[3] == 4.0 / 120.0
    # s@240: flat
    assert idelta[4] == 0.0 and irate[4] == 0.0


def test_stddev_stdvar_over_time(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({
        "k": ["s"] * 4 + ["c"],
        "w": [0, 60, 120, 180, 0],
        "v": np.array([2, 4, 4, 4, 9], dtype=np.int64),
    })
    ds = rd.from_arrow(t)
    sv = (over_time(ds, "k", "w", "v", 3, agg="stdvar")
          .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    # c@0 and s@0: single-sample frame -> var 0
    # s@60 frame {2,4}: var 1; s@120 frame {2,4,4}: var 8/9; s@180 {4,4,4}: 0
    assert sv["stdvar_over"].tolist() == [0.0, 0.0, 1.0, 8.0 / 9.0, 0.0]
    sd = (over_time(ds, "k", "w", "v", 3, agg="stddev")
          .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    assert sd["stddev_over"].tolist() == [
        0.0, 0.0, 1.0, np.sqrt(8.0 / 9.0), 0.0]


def test_label_replace_join_clamp(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import clamp, label_join, label_replace

    t = pa.table({
        "series_key": [
            "m{conv_id=conv0007,role=user}",
            "m{conv_id=other,role=tool}",
            "m{role=assistant}",
        ],
        "v": [1.0, 5.0, 9.0],
    })
    ds = rd.from_arrow(t)

    # capture-group expansion; non-matching rows pass through; missing
    # src label matches as empty string only if the regex allows it
    out = (label_replace(ds, "conv_short", "$1", "conv_id",
                         r"conv0*(\d+)")
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["series_key"].tolist() == [
        "m{conv_id=conv0007,role=user,conv_short=7}",
        "m{conv_id=other,role=tool}",
        "m{role=assistant}",
    ]

    # overwrite an existing label: stripped then appended last
    out = (label_replace(ds, "role", "R", "role", r".*")
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["series_key"].tolist() == [
        "m{conv_id=conv0007,role=R}",
        "m{conv_id=other,role=R}",
        "m{role=R}",
    ]

    # empty replacement removes the label (down to {})
    out = (label_replace(ds, "role", "", "role", r".*")
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["series_key"].tolist() == [
        "m{conv_id=conv0007}",
        "m{conv_id=other}",
        "m{}",
    ]

    # label_join: missing srcs join as empty strings
    out = (label_join(ds, "combo", "-", ["role", "conv_id"])
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["series_key"].tolist() == [
        "m{conv_id=conv0007,role=user,combo=user-conv0007}",
        "m{conv_id=other,role=tool,combo=tool-other}",
        "m{role=assistant,combo=assistant-}",
    ]

    # clamp family
    got = (clamp(ds, "v", lo=2.0, hi=6.0).to_pandas()
           .sort_values("series_key")["v"].tolist())
    assert sorted(got) == [2.0, 5.0, 6.0]
    got = clamp(ds, "v", lo=4.0).to_pandas()["v"].tolist()
    assert sorted(got) == [4.0, 5.0, 9.0]
    with pytest.raises(ValueError):
        clamp(ds, "v")


def test_alert_state(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import alert_state

    t = pa.table({
        "k": ["s"] * 6 + ["q"] * 2,
        #                         gap breaks the run v
        "w": [0, 60, 120, 180, 300, 360, 0, 60],
        "v": [1.0, 9.0, 9.0, 9.0, 9.0, 2.0, 9.0, 9.0],
    })
    out = (alert_state(rd.from_arrow(t), "k", "w", "v",
                       threshold=5.0, for_windows=3, tier_seconds=60)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    # q: two consecutive breaches -> pending, pending... wait run 1,2 < 3
    assert out[out.k == "q"]["state"].tolist() == ["pending", "pending"]
    assert out[out.k == "q"]["run"].tolist() == [1, 2]
    s = out[out.k == "s"]
    # s: below, breach run 1,2,3 (fires at 180), gap resets -> run 1,
    # then below again
    assert s["run"].tolist() == [0, 1, 2, 3, 1, 0]
    assert s["state"].tolist() == [
        "inactive", "pending", "pending", "firing", "pending", "inactive"]


def test_alert_state_keep_firing(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import alert_state

    t = pa.table({
        "k": ["s"] * 7 + ["q"] * 3,
        "w": [0, 60, 120, 180, 240, 300, 420,   0, 60, 120],
        "v": [9.0, 9.0, 9.0, 2.0, 9.0, 2.0, 2.0,   9.0, 9.0, 2.0],
    })
    out = (alert_state(rd.from_arrow(t), "k", "w", "v",
                       threshold=5.0, for_windows=3, tier_seconds=60,
                       keep_firing_windows=2)
           .to_pandas().sort_values(["k", "w"]).reset_index(drop=True))
    s = out[out.k == "s"]
    # fires at w=120 (run 3); w=180 condition drops but is held
    # (within 2 windows of the last firing eval); w=240 re-breaches →
    # run restarts at 1 but the hold still covers it (240-120=120 ≤ 2w);
    # w=300 is held-expired? 300-120=180 > 120 → inactive; w=420 idem
    assert s["run"].tolist() == [1, 2, 3, 0, 1, 0, 0]
    assert s["state"].tolist() == [
        "pending", "pending", "firing", "firing", "firing",
        "inactive", "inactive"]
    # q never reaches for_windows → keep_firing never engages
    q = out[out.k == "q"]
    assert q["state"].tolist() == ["pending", "pending", "inactive"]


def test_burn_rate(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import burn_rate

    # one global series, budget 0.5, fast frame 2 / slow frame 4
    t = pa.table({
        "k": ["slo"] * 4,
        "w": [0, 60, 120, 180],
        "bad": np.array([0, 5, 5, 0], dtype=np.int64),
        "tot": np.array([10, 10, 10, 10], dtype=np.int64),
    })
    out = (burn_rate(rd.from_arrow(t), "k", "w", "bad", "tot",
                     n_fast=2, n_slow=4, budget=0.5, factor=0.55)
           .to_pandas().sort_values("w").reset_index(drop=True))
    # fast frames: [10],[20],[20],[20] bad [0],[5],[10],[5]
    assert out["burn_fast"].tolist() == [0.0, 0.5, 1.0, 0.5]
    # slow frames: [10],[20],[30],[40] bad [0],[5],[10],[10]
    assert out["burn_slow"].tolist() == [0.0, 0.5, 2.0 / 3.0, 0.5]
    # firing only where BOTH exceed 0.55
    assert out["firing"].tolist() == [False, False, True, False]


def test_label_aggregate_quantile(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import label_aggregate

    t = pa.table({
        "series_key": [
            "m{conv_id=a,role=u}", "m{conv_id=b,role=u}",
            "m{conv_id=c,role=u}", "m{conv_id=d,role=v}",
            "m{conv_id=a,role=u}",
        ],
        "window_start": [0, 0, 0, 0, 60],
        "count": np.array([1, 2, 10, 7, 5], dtype=np.int64),
    })
    out = (label_aggregate(rd.from_arrow(t), "role", "count",
                           out_col="p50", agg="quantile", q=0.5)
           .to_pandas().sort_values(["role", "window_start"])
           .reset_index(drop=True))
    # (u, 0): {1,2,10} -> median 2; (u, 60): {5}; (v, 0): {7}
    assert out["role"].tolist() == ["u", "u", "v"]
    assert out["p50"].tolist() == [2.0, 5.0, 7.0]
    # interpolated case: q=0.75 over {1,2,10} -> 0.5*2 + 0.5*10 = 6
    out2 = (label_aggregate(rd.from_arrow(t), "role", "count",
                            out_col="p75", agg="quantile", q=0.75)
            .to_pandas().sort_values(["role", "window_start"])
            .reset_index(drop=True))
    assert out2["p75"].tolist() == [6.0, 5.0, 7.0]


def test_promql_new_kernels_random_crosscheck(ray_session):
    """Seeded random sweep for the round-2 additions (deriv, irate/idelta,
    resets/changes, stddev_over_time): vectorized kernels agree
    bit-for-bit with naive per-series references on ragged series with
    duplicate values and irregular window gaps."""
    import ray.data as rd

    from vertex_ray.stages.promql import (
        deriv,
        irate_idelta,
        over_time,
        resets_changes,
    )

    rng = np.random.default_rng(7)
    rows = []
    for s in range(12):
        ln = int(rng.integers(1, 15))
        vals = rng.integers(0, 6, ln)
        # irregular gaps: windows are a strictly increasing subset
        gaps = np.cumsum(rng.integers(1, 4, ln)) * 3600
        for w, v in zip(gaps, vals):
            rows.append({"k": f"s{s:02d}", "w": int(w), "v": int(v)})
    df = pd.DataFrame(rows)
    ds = rd.from_pandas(df).repartition(3)
    n = 4

    def per_series(fn):
        out = {}
        for k, g in df.groupby("k"):
            g = g.sort_values("w")
            vs = g["v"].to_numpy()
            ws = g["w"].to_numpy()
            for i, w in enumerate(ws):
                out[(k, w)] = fn(vs, ws, i)
        return out

    # deriv: least-squares slope over trailing n windows, per second
    def ref_deriv(vs, ws, i):
        lo = max(0, i - n + 1)
        x = (ws[lo:i + 1] // 3600).astype(np.int64)
        y = vs[lo:i + 1].astype(np.int64)
        c = len(x)
        u = x[-1]
        sx = int(x.sum()) - c * u
        sy = int(y.sum())
        sxy = int((x * y).sum()) - u * sy
        sxx = int((x * x).sum()) - 2 * u * int(x.sum()) + c * u * u
        num = c * sxy - sx * sy
        den = c * sxx - sx * sx
        if den <= 0:
            return None
        return (float(num) / den) / 3600.0

    got = deriv(ds, "k", "w", "v", n=n, tier_seconds=3600).to_pandas()
    want = per_series(ref_deriv)
    for r in got.itertuples():
        w = want[(r.k, r.w)]
        assert (np.isnan(r.deriv) and w is None) or r.deriv == w

    # irate / idelta from the last two samples
    def ref_ir(vs, ws, i):
        if i == 0:
            return None
        dv = int(vs[i]) - int(vs[i - 1])
        dt = int(ws[i]) - int(ws[i - 1])
        num = dv if dv >= 0 else int(vs[i])
        return (float(dv), float(num) / float(dt))

    got = irate_idelta(ds, "k", "w", "v").to_pandas()
    want = per_series(ref_ir)
    for r in got.itertuples():
        w = want[(r.k, r.w)]
        if w is None:
            assert np.isnan(r.idelta) and np.isnan(r.irate)
        else:
            assert (r.idelta, r.irate) == w

    # resets / changes over the trailing n-row frame
    def ref_rc(vs, ws, i):
        lo = max(0, i - n + 1)
        dec = sum(1 for j in range(max(lo, 1), i + 1) if vs[j] < vs[j - 1])
        chg = sum(1 for j in range(max(lo, 1), i + 1) if vs[j] != vs[j - 1])
        return (dec, chg)

    got = resets_changes(ds, "k", "w", "v", n).to_pandas()
    want = per_series(ref_rc)
    for r in got.itertuples():
        assert (r.resets, r.changes) == want[(r.k, r.w)]

    # stddev_over_time from exact int sums
    def ref_sd(vs, ws, i):
        fr = vs[max(0, i - n + 1):i + 1].astype(np.int64)
        c = len(fr)
        s, ss = int(fr.sum()), int((fr ** 2).sum())
        return np.sqrt(np.float64(c * ss - s * s) / (c * c))

    got = over_time(ds, "k", "w", "v", n, agg="stddev").to_pandas()
    want = per_series(ref_sd)
    for r in got.itertuples():
        assert r.stddev_over == want[(r.k, r.w)]


def test_absent_over_time(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import absent_over_time

    t = pa.table({"window_start": np.array([60, 180, 300], dtype=np.int64)})
    out = (absent_over_time(rd.from_arrow(t), "window_start", 60, 0, 360)
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    assert out.window_start.tolist() == [0, 120, 240, 360]
    assert (out.absent == 1).all()
    # default bounds: only interior gaps
    out2 = absent_over_time(rd.from_arrow(t), "window_start", 60).to_pandas()
    assert sorted(out2.window_start) == [120, 240]


def test_binary_op_group_left(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import binary_op

    left = pa.table({
        "series_key": ["a", "b", "c"],
        "role": ["user", "user", "tool"],
        "window_start": np.array([0, 0, 0], dtype=np.int64),
        "count": np.array([1, 3, 2], dtype=np.int64),
    })
    right = pa.table({
        "role": ["user", "tool"],
        "window_start": np.array([0, 0], dtype=np.int64),
        "role_total": np.array([4, 2], dtype=np.int64),
    })
    out = (binary_op(rd.from_arrow(left), rd.from_arrow(right),
                     ["role", "window_start"], "count", "role_total",
                     op="div", out_col="share", carry_left=["series_key"])
           .to_pandas().sort_values("series_key").reset_index(drop=True))
    assert out.series_key.tolist() == ["a", "b", "c"]
    assert out.share.tolist() == [0.25, 0.75, 1.0]


def test_offset_modifier(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import binary_op, offset_modifier

    t = pa.table({
        "series_key": ["a"] * 4,
        "window_start": np.array([0, 60, 120, 180], dtype=np.int64),
        "count": np.array([5, 7, 4, 9], dtype=np.int64),
    })
    ds = rd.from_arrow(t)
    prev = offset_modifier(ds, "window_start", 60,
                           rename={"count": "count_prev"})
    out = (binary_op(ds, prev, ["series_key", "window_start"], "count",
                     "count_prev", op="sub", out_col="d")
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    # first window has no sample 60 s earlier → dropped
    assert out.window_start.tolist() == [60, 120, 180]
    assert out.d.tolist() == [2.0, -3.0, 5.0]


def test_window_time():
    from vertex_ray.stages.promql import window_time

    t = pa.table({"window_start": np.array(
        [0, 3600 * 5, 86400 * 3, 86400 * 3 + 82800], dtype=np.int64)})
    out = window_time(window_time(t, part="hour"), part="day_of_week")
    assert out["hour"].to_pylist() == [0, 5, 0, 23]
    # epoch day 0 = Thursday(4); 1970-01-04 = Sunday(0)
    assert out["day_of_week"].to_pylist() == [4, 4, 0, 0]


def test_count_values(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import count_values

    t = pa.table({
        "series_key": [f"m{{c={i}}}" for i in range(6)],
        "window_start": [0, 0, 0, 0, 60, 60],
        "count": np.array([2, 2, 5, 2, 5, 5], dtype=np.int64),
    })
    out = (count_values(rd.from_arrow(t), "count").to_pandas()
           .sort_values(["window_start", "count"]).reset_index(drop=True))
    assert out.values.tolist() == [
        [2, 0, 3], [5, 0, 1], [5, 60, 2]]


def test_limit_ratio_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from vertex_ray.stages.promql import limit_ratio

    keys = [f"m{{c={i}}}" for i in range(200)]
    t = pa.table({
        "series_key": keys * 2,
        "window_start": np.array([0] * 200 + [60] * 200, dtype=np.int64),
    })
    out = limit_ratio(rd.from_arrow(t), "series_key", 0.5).to_pandas()
    kept = set(out.series_key)
    # every window of a kept series survives (series-, not row-sampling)
    assert (out.groupby("series_key").size() == 2).all()
    want = {k for k in keys
            if hashlib.md5(k.encode()).hexdigest()[:16] < "8" + "0" * 15}
    assert kept == want and 0 < len(kept) < 200


def test_strip_labels_positions():
    from vertex_ray.stages.promql import strip_labels

    t = pa.table({"series_key": [
        "m{a=1,b=2,c=3}",   # middle
        "m{b=2,a=1}",       # tail
        "m{a=1,b=2}",       # head
        "m{a=1}",           # only label
        "m{b=2}",           # absent
    ]})
    got = strip_labels(t, ["a"])["series_key"].to_pylist()
    assert got == ["m{b=2,c=3}", "m{b=2}", "m{b=2}", "m{}", "m{b=2}"]
    both = strip_labels(t, ["a", "b"])["series_key"].to_pylist()
    assert both == ["m{c=3}", "m{}", "m{}", "m{}", "m{}"]


def test_aggregate_without(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import aggregate_without

    out = (aggregate_without(rd.from_arrow(_tier_table()), ["role"],
                             "count")
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    assert out.values.tolist() == [
        ["turns_total{conv_id=c1}", 60, 2],
        ["turns_total{conv_id=c1}", 120, 7],
        ["turns_total{conv_id=c2}", 60, 3],
        ["turns_total{conv_id=c2}", 180, 13],
        ["turns_total{conv_id=c3}", 60, 5],
        ["turns_total{conv_id=c3}", 120, 11],
    ]


def test_binary_op_comparison_filter_and_bool(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import binary_op

    l = rd.from_arrow(pa.table({
        "k": ["a", "b", "c"],
        "w": np.array([0, 0, 0], dtype=np.int64),
        "v": np.array([5, 2, 7], dtype=np.int64),
    }))
    r = rd.from_arrow(pa.table({
        "k": ["a", "b", "c"],
        "w": np.array([0, 0, 0], dtype=np.int64),
        "thr": np.array([4, 4, 9], dtype=np.int64),
    }))
    filt = (binary_op(l, r, ["k", "w"], "v", "thr", op="gt")
            .to_pandas().sort_values("k"))
    assert filt.k.tolist() == ["a"] and "value" not in filt.columns
    boolv = (binary_op(l, r, ["k", "w"], "v", "thr", op="gt",
                       bool_mode=True, out_col="hit")
             .to_pandas().sort_values("k"))
    assert boolv.hit.tolist() == [1.0, 0.0, 0.0]


def test_set_op_and_unless_or(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import set_op

    left = rd.from_arrow(pa.table({
        "k": ["a", "b", "c"],
        "w": np.array([0, 0, 60], dtype=np.int64),
        "v": np.array([1, 2, 3], dtype=np.int64),
    }))
    right = rd.from_arrow(pa.table({
        "k": ["a", "x"],
        "w": np.array([0, 0], dtype=np.int64),
        "v": np.array([9, 8], dtype=np.int64),
    }))
    a = set_op(left, right, ["k", "w"], op="and").to_pandas()
    assert a[["k", "v"]].values.tolist() == [["a", 1]]
    u = (set_op(left, right, ["k", "w"], op="unless").to_pandas()
         .sort_values("k"))
    assert u.k.tolist() == ["b", "c"]
    o = (set_op(left, right, ["k", "w"], op="or").to_pandas()
         .sort_values(["k", "w"]))
    # left wins on collision (a@0 keeps v=1); x@0 only on the right
    assert o[["k", "v"]].values.tolist() == [
        ["a", 1], ["b", 2], ["c", 3], ["x", 8]]


def test_mad_over_time(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({
        "series_key": ["s"] * 5,
        "window_start": np.array([0, 60, 120, 180, 240], dtype=np.int64),
        "v": np.array([1, 9, 5, 3, 7], dtype=np.int64),
    })
    out = (over_time(rd.from_arrow(t), "series_key", "window_start", "v",
                     3, agg="mad", out_col="mad")
           .to_pandas().sort_values("window_start").reset_index(drop=True))
    # frames: [1] mad 0; [1,9] med 5, devs {4,4} mad 4; [1,9,5] med 5,
    # devs {4,4,0} mad 4; [9,5,3] med 5 devs {4,0,2} mad 2;
    # [5,3,7] med 5 devs {0,2,2} mad 2
    assert out["mad"].tolist() == [0.0, 4.0, 4.0, 2.0, 2.0]


def test_strip_labels_fuzz_vs_reference():
    """strip_labels' three RE2 replaces == parse-remove-rerender on the
    canonical key, for any subset of labels at any position."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vertex_ray.stages.promql import strip_labels

    lbl = st.sampled_from(["aa", "bb", "cc", "dd"])
    val = st.text(alphabet="xyz0", min_size=0, max_size=3)

    @settings(max_examples=200, deadline=None)
    @given(pairs=st.dictionaries(lbl, val, min_size=0, max_size=4),
           drop=st.lists(lbl, min_size=1, max_size=2, unique=True))
    def check(pairs, drop):
        items = sorted(pairs.items())
        key = "m{" + ",".join(f"{k}={v}" for k, v in items) + "}"
        want = ("m{" + ",".join(f"{k}={v}" for k, v in items
                                if k not in drop) + "}")
        t = pa.table({"series_key": [key]})
        got = strip_labels(t, list(drop))["series_key"].to_pylist()[0]
        assert got == want

    check()


def test_aggregate_without_family(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import aggregate_without

    ds = rd.from_arrow(_tier_table())

    def run(agg):
        return (aggregate_without(ds, ["role"], "count", agg=agg,
                                  out_col="x")
                .to_pandas().sort_values(["series_key", "window_start"])
                .reset_index(drop=True))

    ct = run("count")
    assert ct.x.tolist() == [1, 1, 1, 1, 1, 1]  # one series per conv
    mx = run("max")
    assert mx.x.tolist() == [2, 7, 3, 13, 5, 11]
    mn = run("min")
    assert mn.x.tolist() == [2, 7, 3, 13, 5, 11]


def test_math_op(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import math_op

    t = pa.table({"k": ["a", "b"], "v": np.array([-4, 9], dtype=np.int64)})
    ds = rd.from_arrow(t)
    ab = math_op(ds, "v", "abs").to_pandas().sort_values("k")
    assert ab["abs"].tolist() == [4.0, 9.0]
    sq = math_op(ds, "v", "sqrt", out_col="s", scalar=2.0).to_pandas() \
        .sort_values("k")
    assert sq.s.tolist()[1] == 6.0 and np.isnan(sq.s.tolist()[0])
    sg = math_op(ds, "v", "sgn").to_pandas().sort_values("k")
    assert sg.sgn.tolist() == [-1.0, 1.0]


def test_review_fixes(ray_session):
    """Round-2 review fixes: group() accepts float vectors; math_op
    rejects a bad scalar op eagerly; limit_ratio validates range,
    hashes per distinct key, and negative r is the exact complement."""
    import ray.data as rd

    from vertex_ray.stages.promql import (
        label_aggregate,
        limit_ratio,
        math_op,
    )

    ft = pa.table({
        "series_key": ["m{conv_id=c1,role=user}", "m{conv_id=c2,role=user}"],
        "window_start": np.array([0, 0], dtype=np.int64),
        "share": np.array([0.25, 0.75], dtype=np.float64),
    })
    g = label_aggregate(rd.from_arrow(ft), "role", "share",
                        out_col="present", agg="group").to_pandas()
    assert g.present.tolist() == [1]

    with pytest.raises(ValueError, match="scalar op"):
        math_op(rd.from_arrow(ft), "share", "sqrt", scalar=2.0,
                scalar_op="times")
    with pytest.raises(ValueError, match=r"\[-1, 1\]"):
        limit_ratio(rd.from_arrow(ft), "series_key", 1.5)

    keys = pa.table({"series_key": [f"m{{c={i}}}" for i in range(100)],
                     "window_start": np.zeros(100, dtype=np.int64)})
    ds = rd.from_arrow(keys)
    pos = set(limit_ratio(ds, "series_key", 0.3)
              .to_pandas().series_key)
    neg = set(limit_ratio(ds, "series_key", -0.7)
              .to_pandas().series_key)
    assert pos | neg == set(keys["series_key"].to_pylist())
    assert not (pos & neg)  # exact partition


def test_window_time_calendar_parts_fuzz():
    """minute + the civil-from-days calendar parts vs pandas datetime on
    20k random windows spanning 1875–2096 (incl. pre-1970 floor-division
    behavior and leap years)."""
    from vertex_ray.stages.promql import window_time

    rng = np.random.default_rng(11)
    ws = rng.integers(-3_000_000_000, 4_000_000_000, size=20_000)
    t = pa.table({"window_start": ws})
    ref = pd.to_datetime(ws, unit="s", utc=True)
    for part, attr in [("minute", "minute"), ("hour", "hour"),
                       ("day_of_month", "day"), ("month", "month"),
                       ("year", "year"), ("day_of_year", "dayofyear"),
                       ("days_in_month", "days_in_month")]:
        got = window_time(t, part=part)[part].to_numpy()
        np.testing.assert_array_equal(
            got, getattr(ref, attr).to_numpy().astype(np.int64),
            err_msg=part)


def test_over_time_first_last(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import over_time

    t = pa.table({
        "k": ["a"] * 5 + ["b"] * 2,
        "w": np.array([0, 60, 120, 180, 240, 0, 60], dtype=np.int64),
        "v": np.array([1, 2, 3, 4, 5, 10, 20], dtype=np.int64),
    })
    first = (over_time(rd.from_arrow(t), "k", "w", "v", 3, agg="first",
                       out_col="f").to_pandas()
             .sort_values(["k", "w"]).reset_index(drop=True))
    # frame = 2 PRECEDING..CURRENT clipped at series start
    assert first.f.tolist() == [1, 1, 1, 2, 3, 10, 10]
    last = (over_time(rd.from_arrow(t), "k", "w", "v", 3, agg="last",
                      out_col="l").to_pandas()
            .sort_values(["k", "w"]).reset_index(drop=True))
    assert last.l.tolist() == [1, 2, 3, 4, 5, 10, 20]
    assert first.f.dtype == np.int64  # dtype preserved (pure gather)


def test_aggregate_without_avg(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import aggregate_without

    out = (aggregate_without(rd.from_arrow(_tier_table()), ["role"],
                             "count", agg="avg")
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    # averages of the per-role counts behind test_aggregate_without's sums
    assert out["count"].dtype == np.float64
    ref = (aggregate_without(rd.from_arrow(_tier_table()), ["role"],
                             "count", agg="sum").to_pandas()
           .merge(aggregate_without(rd.from_arrow(_tier_table()),
                                    ["role"], "count",
                                    agg="count", out_col="n").to_pandas(),
                  on=["series_key", "window_start"]))
    ref["avg"] = ref["count"].astype(np.float64) / ref["n"]
    m = out.merge(ref, on=["series_key", "window_start"])
    np.testing.assert_array_equal(m["count_x"].to_numpy(),
                                  m["avg"].to_numpy())

    f = pa.table({"series_key": ["m{a=1,role=x}"],
                  "window_start": np.array([0], dtype=np.int64),
                  "count": np.array([1.5])})
    with pytest.raises(Exception, match="integer"):
        aggregate_without(rd.from_arrow(f), ["role"], "count",
                          agg="avg").materialize()


def test_resample_windows(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import resample_windows

    t = pa.table({
        "series_key": ["a"] * 4 + ["b"] * 2,
        "window_start": np.array([0, 3600, 7200, 14400, 3600, 18000],
                                 dtype=np.int64),
        "count": np.array([1, 2, 3, 4, 10, 20], dtype=np.int64),
        "last": np.array([1.0, 2.0, 3.0, 4.0, 10.0, 20.0]),
    })
    out = (resample_windows(rd.from_arrow(t), 4 * 3600, 3600,
                            {"count": "sum", "last": "last"})
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    assert out.values.tolist() == [
        ["a", 0, 6, 3.0],       # three 1h windows merged; last from 7200
        ["a", 14400, 4, 4.0],
        ["b", 0, 10, 10.0],
        ["b", 14400, 20, 20.0],
    ]
    with pytest.raises(ValueError, match="nest"):
        resample_windows(rd.from_arrow(t), 5000, 3600, {"count": "sum"})
    with pytest.raises(ValueError, match="unsupported"):
        resample_windows(rd.from_arrow(t), 7200, 3600, {"count": "avg"})


def test_limitk_deterministic(ray_session):
    import hashlib

    import ray.data as rd

    from vertex_ray.stages.promql import limitk

    keys = [f"m{{c={i}}}" for i in range(40)]
    t = pa.table({
        "series_key": keys * 2,
        "window_start": np.array([0] * 40 + [60] * 40, dtype=np.int64),
        "count": np.arange(80, dtype=np.int64),
    })
    got = limitk(rd.from_arrow(t), "series_key", 5).to_pandas()
    want = set(sorted(keys, key=lambda s:
                      hashlib.md5(s.encode()).hexdigest())[:5])
    assert set(got.series_key) == want
    assert len(got) == 10  # both windows of each winner survive
    # idempotent across re-evaluation
    again = limitk(rd.from_arrow(t), "series_key", 5).to_pandas()
    assert set(again.series_key) == want
    with pytest.raises(ValueError, match="k >= 1"):
        limitk(rd.from_arrow(t), "series_key", 0)


def test_resample_matches_materialized_tier(ray_session):
    """The continuous-aggregate contract at READ time: resampling the 1m
    tier's real rows to 300s reproduces the engine's own materialized 5m
    tier bit-for-bit (counter count by sum; gauge last by greatest
    source window; min/max order-free) on the sf0.001 store."""
    import os
    import sys

    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e

    from vertex_ray.stages.promql import resample_windows

    for metric, col_ops in [
        ("turns_total", {"count": "sum"}),
        ("conv_turn_idx", {"min": "min", "max": "max", "last": "last"}),
    ]:
        cols = ["series_key", "window_start"] + list(col_ops)
        fine = e._metric_tier("/root/testdata/sf0.001", "1m", metric, cols)
        got = (resample_windows(fine, 300, 60, col_ops)
               .to_pandas().sort_values(cols).reset_index(drop=True))
        want = (e._metric_tier("/root/testdata/sf0.001", "5m", metric, cols)
                .to_pandas().sort_values(cols).reset_index(drop=True))
        got = got[want.columns]
        pd.testing.assert_frame_equal(
            got.astype({c: want[c].dtype for c in want.columns}), want)
        assert len(got) > 0


def test_limitk_multiblock(ray_session):
    """The per-batch k-smallest trim must still find the global winners
    when the dataset is split across many blocks (combiner correctness)."""
    import hashlib

    import ray.data as rd

    from vertex_ray.stages.promql import limitk

    keys = [f"m{{c={i}}}" for i in range(200)]
    t = pa.table({
        "series_key": keys,
        "window_start": np.zeros(200, dtype=np.int64),
        "count": np.arange(200, dtype=np.int64),
    })
    ds = rd.from_arrow(t).repartition(13)
    got = set(limitk(ds, "series_key", 7).to_pandas().series_key)
    want = set(sorted(keys, key=lambda s:
                      hashlib.md5(s.encode()).hexdigest())[:7])
    assert got == want


def test_dashboard_composition_smoke(ray_session):
    """Composition: stitched cross-tier read → read-time resample →
    over_time → alert_state runs as ONE Dataset graph over the sf0.001
    store (every stage consumes the previous stage's vector)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e

    from vertex_ray.pipelines.rollup_pipeline import transcripts_end_ts
    from vertex_ray.read import query_range_stitched
    from vertex_ray.stages.promql import alert_state, over_time, resample_windows
    from vertex_ray.synth import ensure_transcripts

    out = e._ensure_pipeline("/root/testdata/sf0.001")
    boundary = (transcripts_end_ts(
        ensure_transcripts("/root/testdata/sf0.001")) // 86400 * 86400)
    v = query_range_stitched(out, "1d", "1h", boundary,
                             metric="turns_total",
                             columns=["series_key", "window_start", "count"])
    v = resample_windows(v, 4 * 86400, 3600, {"count": "sum"})
    v = over_time(v, "series_key", "window_start", "count", 2, agg="max",
                  out_col="peak")
    alerts = alert_state(v, "series_key", "window_start", "peak",
                         threshold=1.0, for_windows=1,
                         tier_seconds=4 * 86400).to_pandas()
    assert len(alerts) > 0
    assert set(alerts.state.unique()) <= {"inactive", "pending", "firing"}


def test_aggregate_without_stddev(ray_session):
    import ray.data as rd

    from vertex_ray.stages.promql import aggregate_without

    out = (aggregate_without(rd.from_arrow(_tier_table()), ["role"],
                             "count", agg="stddev")
           .to_pandas().sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    # single-member groups -> population stddev 0
    one = out[out.series_key == "turns_total{conv_id=c3}"]
    assert (one["count"] == 0.0).all()
    # two-member group {2, 3} at window 60: mean 2.5, var 0.25
    t = pa.table({
        "series_key": ["m{c=x,role=a}", "m{c=x,role=b}"],
        "window_start": np.array([60, 60], dtype=np.int64),
        "count": np.array([2, 3], dtype=np.int64),
    })
    got = aggregate_without(rd.from_arrow(t), ["role"], "count",
                            agg="stddev").to_pandas()
    assert got["count"].tolist() == [0.5]


def test_resample_windows_fuzz(ray_session):
    """resample_windows == a single-partition pandas brute force on
    random inputs (random keys, windows, duplicate windows across
    batches, negative values), for every supported op — regardless of
    how Ray splits the input into blocks."""
    import ray.data as rd

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vertex_ray.stages.promql import resample_windows

    @settings(max_examples=20, deadline=None)
    @given(st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]),
                  st.integers(0, 40),          # tier window index
                  st.integers(-1000, 1000)),
        min_size=1, max_size=120), st.integers(2, 5))
    def run(rows, step_mult):
        tier_s = 60
        step = tier_s * step_mult
        df = pd.DataFrame(rows, columns=["series_key", "wi", "v"])
        # one row per (key, window): aggregate duplicates first (tier
        # rows are unique per series-window by construction)
        df = (df.groupby(["series_key", "wi"], as_index=False)["v"]
              .sum())
        df["window_start"] = df["wi"] * tier_s
        df["v"] = df["v"].astype(np.int64)
        t = pa.table({
            "series_key": df["series_key"],
            "window_start": df["window_start"].astype(np.int64),
            "v": df["v"],
        })
        ds = rd.from_arrow(t).repartition(4)
        for op in ["sum", "min", "max", "last"]:
            got = (resample_windows(ds, step, tier_s, {"v": op})
                   .to_pandas()
                   .sort_values(["series_key", "window_start"])
                   .reset_index(drop=True))
            ref = df.copy()
            ref["window_start"] = ref["window_start"] // step * step
            ref = ref.sort_values("wi", kind="stable")
            agg = {"sum": "sum", "min": "min", "max": "max",
                   "last": "last"}[op]
            ref = (ref.groupby(["series_key", "window_start"],
                               as_index=False)["v"].agg(agg)
                   .sort_values(["series_key", "window_start"])
                   .reset_index(drop=True))
            np.testing.assert_array_equal(
                got["v"].to_numpy(), ref["v"].to_numpy(), err_msg=op)

    run()


def test_rule_group_chained_and_alert(ray_session):
    """A rule GROUP evaluates in order: rule 2 aggregates rule 1's output
    vector (Prometheus sequential-evaluation semantics), and the alert
    rule classifies rule 1's vector; both record outputs decode from
    Gorilla blocks to the exact aggregate values."""
    import ray.data as rd

    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.stages.record import rule_group

    out = rule_group(
        rd.from_arrow(_tier_table()),
        [
            {"record": "role_turns", "label": "role", "agg": "sum"},
            # chained: max across roles of the DERIVED vector (float
            # values -> order-free aggs only)
            {"record": "peak_role_turns", "source": "role_turns",
             "without": ["role"], "agg": "max"},
            {"alert": "busy_role", "source": "role_turns",
             "threshold": 6.0, "for": 2},
        ],
        tier="1h", value_col="count", tier_seconds=60, n_buckets=4)
    assert set(out) == {"role_turns", "peak_role_turns", "busy_role"}

    r1 = (decode_tier_blocks(out["role_turns"]).to_pandas()
          .sort_values(["series_key", "window_start"])
          .reset_index(drop=True))
    got1 = {(r.series_key, int(r.window_start)): r.last
            for r in r1.itertuples()}
    assert got1 == {
        ("role_turns{role=assistant}", 60): 5.0,
        ("role_turns{role=assistant}", 120): 11.0,
        ("role_turns{role=user}", 60): 5.0,
        ("role_turns{role=user}", 120): 7.0,
        ("role_turns{role=user}", 180): 13.0,
    }

    r2 = (decode_tier_blocks(out["peak_role_turns"]).to_pandas()
          .sort_values("window_start").reset_index(drop=True))
    assert r2["series_key"].unique().tolist() == ["peak_role_turns"]
    got2 = dict(zip(r2["window_start"].astype(int), r2["last"]))
    assert got2 == {60: 5.0, 120: 11.0, 180: 13.0}

    al = (out["busy_role"].to_pandas()
          .sort_values(["series_key", "window_start"])
          .reset_index(drop=True))
    a = al[al.series_key == "role_turns{role=assistant}"]
    assert a["state"].tolist() == ["inactive", "pending"]
    u = al[al.series_key == "role_turns{role=user}"]
    assert u["state"].tolist() == ["inactive", "pending", "firing"]
    assert u["run"].tolist() == [0, 1, 2]


def test_rule_group_source_order_enforced(ray_session):
    import ray.data as rd

    from vertex_ray.stages.record import rule_group

    with pytest.raises(ValueError, match="not evaluated yet"):
        rule_group(rd.from_arrow(_tier_table()),
                   [{"record": "a", "source": "missing", "label": "role"}],
                   tier="1h")


def test_label_aggregate_count_accepts_floats(ray_session):
    """count is dtype-independent (non-null tally), so it must accept the
    float vectors chained rules derive."""
    import ray.data as rd

    from vertex_ray.stages.promql import label_aggregate

    t = pa.table({
        "series_key": ["m{a=x}", "m{a=x}", "m{a=y}"],
        "window_start": [60, 60, 60],
        "v": [1.5, 2.5, 9.0],
    })
    out = (label_aggregate(rd.from_arrow(t), "a", "v", agg="count",
                           out_col="n")
           .to_pandas().sort_values("a").reset_index(drop=True))
    assert out["n"].tolist() == [2, 1]
