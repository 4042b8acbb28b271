"""PromQL text front-end (vertex_ray/promql_lang): parser unit tests +
evaluator-lowering tests against brute-force pandas over the same
store read. The stage functions themselves are covered by
tests/test_promql.py; here we verify the TEXT expression lowers onto
them correctly (tier choice, matcher pushdown+filter, vector matching,
grouping, subqueries, offset)."""

import numpy as np
import pandas as pd
import pytest

from vertex_ray.promql_lang import (
    Agg,
    Bin,
    Call,
    Num,
    Sel,
    Subquery,
    eval_promql,
    parse,
)
from vertex_ray.synth import ensure_transcripts

COLS = ["series_key", "window_start", "count"]


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------


def test_parse_selector_matchers_range_offset():
    e = parse('turns_total{role="user", conv_id=~"c.*"}[5m] offset 1h')
    assert isinstance(e, Sel)
    assert e.name == "turns_total"
    assert e.matchers == [("role", "=", "user"), ("conv_id", "=~", "c.*")]
    assert e.range_s == 300
    assert e.offset_s == 3600


def test_parse_compound_duration_and_subquery():
    e = parse("max_over_time(increase(m[5m])[1h30m:5m])")
    assert isinstance(e, Call) and e.func == "max_over_time"
    sq = e.args[0]
    assert isinstance(sq, Subquery)
    assert sq.range_s == 5400 and sq.step_s == 300
    assert isinstance(sq.expr, Call) and sq.expr.func == "increase"


def test_parse_agg_forms():
    e = parse("sum by (role) (increase(turns_total[1h]))")
    assert isinstance(e, Agg) and e.op == "sum" and e.by == ["role"]
    e2 = parse("quantile by (role) (0.9, m)")
    assert e2.op == "quantile" and e2.param == 0.9
    e3 = parse("avg without (conv_id, role) (m)")
    assert e3.without == ["conv_id", "role"]
    # trailing grouping form
    e4 = parse("sum(m) by (role)")
    assert e4.by == ["role"]
    e5 = parse('count_values("turns", m)')
    assert e5.op == "count_values" and e5.param == "turns"


def test_parse_binary_precedence_and_matching():
    e = parse("a + b * c")
    assert isinstance(e, Bin) and e.op == "add"
    assert isinstance(e.rhs, Bin) and e.rhs.op == "mul"
    e2 = parse("a / on(conv_id) group_left b")
    assert e2.op == "div" and e2.on == ["conv_id"] and e2.group_left == []
    e3 = parse("a > bool 5")
    assert e3.op == "gt" and e3.bool_mode and isinstance(e3.rhs, Num)
    e4 = parse("a and on(role) b or c")
    assert e4.op == "or" and e4.lhs.op == "and" and e4.lhs.on == ["role"]
    e5 = parse("-2 * m")
    assert isinstance(e5.lhs, Num) and e5.lhs.v == -2.0
    e6 = parse("a / ignoring(role) b")
    assert e6.op == "div" and e6.ignoring == ["role"] and e6.on is None
    e7 = parse("a and ignoring(role, tool) b")
    assert e7.ignoring == ["role", "tool"]
    e8 = parse("a / on(role) group_right(series_key) b")
    assert e8.group_right == ["series_key"] and e8.group_left is None
    e9 = parse("increase(m[1h] @ 1767441600)")
    assert e9.args[0].at_s == 1767441600
    e10 = parse("m[1h] @ 1767441600 offset 2h")
    assert e10.at_s == 1767441600 and e10.offset_s == 7200


def test_parse_fuzz_roundtrip():
    """Property: rendering a random AST back to text and re-parsing
    reproduces the AST — the parser/precedence rules are total over the
    grammar (seeded, deterministic)."""
    import random

    rng = random.Random(1234)
    names = ["m", "turns_total", "up", "a_b:c"]
    labels = ["role", "conv_id", "tool"]

    def render(node, depth):
        # returns (text, must_parenthesize_in_binary)
        if isinstance(node, Num):
            return repr(node.v), False
        if isinstance(node, Sel):
            s = node.name
            if node.matchers:
                s += "{" + ",".join(f'{l}{op}"{v}"'
                                    for l, op, v in node.matchers) + "}"
            if node.range_s:
                s += f"[{node.range_s}s]"
            if node.offset_s:
                s += f" offset {node.offset_s}s"
            if node.at_s is not None:
                s += f" @ {node.at_s}"
            return s, False
        if isinstance(node, Call):
            return (f"{node.func}(" +
                    ", ".join(render(a, depth + 1)[0]
                              for a in node.args) + ")"), False
        if isinstance(node, Agg):
            g = ""
            if node.by is not None:
                g = f" by ({', '.join(node.by)}) "
            elif node.without is not None:
                g = f" without ({', '.join(node.without)}) "
            p = "" if node.param is None else f"{node.param}, "
            return f"{node.op}{g}({p}{render(node.expr, depth + 1)[0]})", \
                False
        if isinstance(node, Bin):
            sym = {"add": "+", "sub": "-", "mul": "*", "div": "/",
                   "gt": ">", "lt": "<", "and": "and", "or": "or",
                   "unless": "unless"}[node.op]
            mod = ""
            if node.on is not None:
                mod = f" on ({', '.join(node.on)})"
            elif node.ignoring is not None:
                mod = f" ignoring ({', '.join(node.ignoring)})"
            if node.group_left is not None:
                mod += " group_left" + (
                    f" ({', '.join(node.group_left)})"
                    if node.group_left else "")
            lt, _ = render(node.lhs, depth + 1)
            rt, _ = render(node.rhs, depth + 1)
            return f"({lt}) {sym}{mod} ({rt})", True
        raise AssertionError(node)

    def gen(depth):
        kinds = ["num", "sel", "call", "agg"] + \
            (["bin"] if depth < 3 else [])
        k = rng.choice(kinds)
        if k == "num":
            return Num(float(rng.randint(0, 99)))
        if k == "sel":
            ms = [(rng.choice(labels), rng.choice(["=", "!=", "=~"]),
                   "x1") for _ in range(rng.randint(0, 2))]
            return Sel(rng.choice(names), ms,
                       range_s=rng.choice([None, 60, 3600]),
                       offset_s=rng.choice([0, 3600]),
                       at_s=rng.choice([None, 1767441600]))
        if k == "call":
            inner = Sel(rng.choice(names), [], range_s=3600)
            return Call(rng.choice(["rate", "increase",
                                    "avg_over_time"]), [inner])
        if k == "agg":
            return Agg(rng.choice(["sum", "max", "avg"]), gen(depth + 1),
                       by=[rng.choice(labels)])
        return Bin(rng.choice(["add", "mul", "div", "and", "or"]),
                   gen(depth + 1), gen(depth + 1),
                   on=rng.choice([None, ["role"]]))

    for _ in range(300):
        ast = gen(0)
        text, _ = render(ast, 0)
        assert parse(text) == ast, text


def test_parse_errors():
    for bad in ("m[", "m{role=user}", "sum by role (m)",
                "topk(m)", "m )"):
        with pytest.raises((SyntaxError, ValueError)):
            parse(bad)


# --------------------------------------------------------------------------
# evaluator (real store at sf0.001)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    trans = ensure_transcripts(0.001, base="/tmp/vertex_ray_testdata")
    out = str(tmp_path_factory.mktemp("tiers_promql_lang"))
    from vertex_ray.pipelines.rollup_pipeline import run_pipeline

    run_pipeline(trans, out, n_buckets=4)
    return out


def _base(store, tier="1h", metric="turns_total", **kw):
    from vertex_ray.read import query_range

    return (query_range(store, tier, metric=metric, columns=COLS, **kw)
            .to_pandas())


def _run(store, expr, **kw):
    df = eval_promql(store, expr, **kw).to_pandas()
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def test_eval_rate_tier_read(store):
    got = _run(store, 'rate(turns_total{role="user"}[1h])')
    base = _base(store)
    base = base[base.series_key.str.contains(r"role=user\}")]
    exp = pd.DataFrame({
        "series_key": base.series_key,
        "window_start": base.window_start,
        "value": base["count"].astype(np.float64) / 3600.0,
    }).sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_increase_multiwindow_frame(store):
    # [2h] -> 1h tier, trailing 2-window moving sum per series
    got = _run(store, "increase(turns_total[2h])")
    base = _base(store).sort_values(["series_key", "window_start"])
    r = (base.groupby("series_key", sort=False)["count"]
         .rolling(2, min_periods=1).sum().reset_index(level=0))
    exp = pd.DataFrame({
        "series_key": r.series_key,
        "window_start": base.window_start,
        "value": r["count"].astype(np.float64),
    }).sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_sum_by_label(store):
    got = _run(store, "sum by (role) (increase(turns_total[1h]))")
    base = _base(store)
    base["role"] = base.series_key.str.extract(r"role=([^,}]*)")
    exp = (base.groupby(["role", "window_start"])["count"].sum()
           .reset_index().rename(columns={"count": "value"})
           .sort_values(["role", "window_start"]).reset_index(drop=True))
    exp = exp[["role", "window_start", "value"]]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_eval_regex_matcher_and_negation(store):
    got = _run(store, 'increase(turns_total{role=~"us.*"}[1h])')
    ref = _run(store, 'increase(turns_total{role="user"}[1h])')
    pd.testing.assert_frame_equal(got, ref)
    got_ne = _run(store, 'increase(turns_total{role!="user"}[1h])')
    base = _base(store)
    assert len(got_ne) == (~base.series_key.str.contains(
        r"role=user\}")).sum()


def test_eval_binary_ratio_on_conv(store):
    got = _run(store, 'increase(turns_total{role="user"}[1h]) '
                      "/ on(conv_id) "
                      "sum by (conv_id) (increase(turns_total[1h]))")
    base = _base(store)
    base["conv_id"] = base.series_key.str.extract(r"conv_id=([^,}]*)")
    tot = base.groupby(["conv_id", "window_start"])["count"].sum()
    user = base[base.series_key.str.contains(r"role=user\}")]
    exp = pd.DataFrame({
        "conv_id": user.conv_id,
        "window_start": user.window_start,
        "value": user["count"].to_numpy(np.float64)
        / tot.loc[list(zip(user.conv_id, user.window_start))]
        .to_numpy(np.float64),
    }).sort_values(["conv_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_comparison_filter_and_bool(store):
    expr = "sum by (role) (increase(turns_total[1h]))"
    full = _run(store, expr)
    kept = _run(store, f"{expr} > 50")
    assert (kept["value"] > 50).all()
    assert len(kept) == (full["value"] > 50).sum()
    flags = _run(store, f"{expr} > bool 50")
    assert set(flags["value"]) <= {0.0, 1.0}
    assert flags["value"].sum() == len(kept)


def test_eval_subquery_peak(store):
    got = _run(store, "max_over_time(increase(turns_total[5m])[1h:5m])")
    base = _base(store, tier="5m").sort_values(
        ["series_key", "window_start"])
    r = (base.groupby("series_key", sort=False)["count"]
         .rolling(12, min_periods=1).max().reset_index(level=0))
    exp = pd.DataFrame({
        "series_key": r.series_key,
        "window_start": base.window_start,
        "value": r["count"].astype(np.float64),
    }).sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_topk_and_scalar_arith(store):
    got = _run(store, "topk(3, sum by (role) (increase(turns_total[1h]))) "
                      "* 2")
    full = _run(store, "sum by (role) (increase(turns_total[1h]))")
    exp_rows = (full.sort_values(["value", "role"],
                                 ascending=[False, True], kind="stable")
                .groupby("window_start", sort=False).head(3))
    assert len(got) == len(exp_rows)
    merged = got.merge(full, on=["role", "window_start"],
                       suffixes=("", "_full"))
    assert np.allclose(merged["value"], 2.0 * merged["value_full"])


def test_eval_offset_restamp(store):
    base = _base(store)
    got = _run(store, "increase(turns_total[1h] offset 1h)")
    exp = base.copy()
    exp["window_start"] += 3600
    exp = (exp.rename(columns={"count": "value"})
           [["series_key", "window_start", "value"]]
           .sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    got["value"] = got["value"].astype(np.int64)
    exp["value"] = exp["value"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_set_op_unless(store):
    hot = "sum by (conv_id) (increase(turns_total[1h])) > 60"
    all_ = "sum by (conv_id) (increase(turns_total[1h]))"
    got = _run(store, f"{all_} unless ({hot})")
    full = _run(store, all_)
    kept = _run(store, hot)
    assert len(got) == len(full) - len(kept)
    assert (got["value"] <= 60).all()


def test_eval_ignoring_ratio(store):
    # ignoring(role): match user vs assistant series on the complement
    # key {conv_id=…}; result identity is the stripped key
    got = _run(store, 'increase(turns_total{role="user"}[1h]) '
                      "/ ignoring(role) "
                      'increase(turns_total{role="assistant"}[1h])')
    base = _base(store)
    base["conv_id"] = base.series_key.str.extract(r"conv_id=([^,}]*)")
    u = base[base.series_key.str.contains(r"role=user\}")]
    a = base[base.series_key.str.contains(r"role=assistant\}")]
    m = u.merge(a, on=["conv_id", "window_start"], suffixes=("_u", "_a"))
    exp = pd.DataFrame({
        "series_key": "{conv_id=" + m.conv_id + "}",
        "window_start": m.window_start,
        "value": m.count_u.to_numpy(np.float64)
        / m.count_a.to_numpy(np.float64),
    }).sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_ignoring_set_op(store):
    # and ignoring(role): left samples (FULL original labels) whose
    # complement key has a user-series match
    got = _run(store, 'increase(turns_total{role="assistant"}[1h]) '
                      "and ignoring(role) "
                      'increase(turns_total{role="user"}[1h])')
    assert got.series_key.str.contains(r"role=assistant\}").all()
    base = _base(store)
    base["conv_id"] = base.series_key.str.extract(r"conv_id=([^,}]*)")
    u = base[base.series_key.str.contains(r"role=user\}")]
    a = base[base.series_key.str.contains(r"role=assistant\}")]
    keys = set(zip(u.conv_id, u.window_start))
    exp_n = sum((c, w) in keys for c, w in zip(a.conv_id, a.window_start))
    assert len(got) == exp_n


_T_PIN = 1767441600  # 2026-01-03T12:00:00Z — inside every sf's range


def test_eval_at_pinned_baseline_ratio(store):
    # @ pins the rhs at one instant; matching becomes window-free and
    # the left side's window_start survives on every row
    got = _run(store, "increase(turns_total[1h]) / on(series_key) "
                      f"increase(turns_total[1h] @ {_T_PIN})")
    base = _base(store)
    pin = base[base.window_start == _T_PIN][["series_key", "count"]]
    m = base.merge(pin, on="series_key", suffixes=("", "_pin"))
    exp = pd.DataFrame({
        "series_key": m.series_key,
        "window_start": m.window_start,
        "value": m["count"].to_numpy(np.float64)
        / m["count_pin"].to_numpy(np.float64),
    }).sort_values(["series_key", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_at_pinned_left_and_agg(store):
    # pinned LEFT operand (swapped join sides) + aggregation over a
    # pinned vector keeps the pin
    got = _run(store, "sum by (role) (increase(turns_total[1h] "
                      f"@ {_T_PIN})) / on(role) "
                      "sum by (role) (increase(turns_total[1h]))")
    base = _base(store)
    base["role"] = base.series_key.str.extract(r"role=([^,}]*)")
    cur = base.groupby(["role", "window_start"], as_index=False)["count"] \
        .sum()
    pin = cur[cur.window_start == _T_PIN][["role", "count"]]
    m = cur.merge(pin, on="role", suffixes=("", "_pin"))
    exp = pd.DataFrame({
        "role": m.role,
        "window_start": m.window_start,
        "value": m["count_pin"].to_numpy(np.float64)
        / m["count"].to_numpy(np.float64),
    }).sort_values(["role", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_group_right(store):
    # one-side (role totals) op many-side (per-series) with the
    # series_key carried from the RIGHT vector
    got = _run(store, "sum by (role) (increase(turns_total[1h])) "
                      "/ on(role) group_right(series_key) "
                      "increase(turns_total[1h])")
    base = _base(store)
    base["role"] = base.series_key.str.extract(r"role=([^,}]*)")
    tot = base.groupby(["role", "window_start"], as_index=False)["count"] \
        .sum().rename(columns={"count": "tot"})
    m = base.merge(tot, on=["role", "window_start"])
    exp = pd.DataFrame({
        "role": m.role,
        "series_key": m.series_key,
        "window_start": m.window_start,
        "value": m["tot"].to_numpy(np.float64)
        / m["count"].to_numpy(np.float64),
    }).sort_values(["role", "series_key", "window_start"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_eval_timestamp_and_present(store):
    got = _run(store, "timestamp(sum by (role) "
                      "(increase(turns_total[1h])))")
    assert (got["value"] == got["window_start"].astype(np.float64)).all()
    pres = _run(store, "present_over_time(turns_total[1h])")
    base = _base(store)
    assert (pres["value"] == 1.0).all()
    assert len(pres) == len(base)


def test_explain_plan_notes(store):
    # explain runs the REAL lowering lazily and reports scans/exchanges
    from vertex_ray.promql_lang import explain_promql

    plan = explain_promql(
        store, 'sum by (role) (increase(turns_total{role="user"}[2h]))')
    assert "scan 1h tier: metric=turns_total col=count" in plan
    assert "key-pushdown=" in plan and "role=user" in plan
    assert "over_time sum n=2 — one bucket exchange" in plan
    assert "agg sum by(role)" in plan
    assert "output: vector identity=['role'] step=3600s" in plan

    plan2 = explain_promql(
        store, "increase(turns_total[1h]) / on(series_key) "
               f"increase(turns_total[1h] @ {_T_PIN})")
    assert f"PINNED@{_T_PIN}" in plan2
    assert "range=[" in plan2  # pinned frame became a block-pruned read
    assert "(window-free: pinned operand)" in plan2
    assert "one hash-join exchange" in plan2

    # the plan is a description, not an execution: the store is listed
    # but no block payload was decoded (explain returns a string)
    assert isinstance(plan, str) and plan.startswith("expr:")


def test_eval_hour_and_clamp(store):
    got = _run(store, "clamp_max(hour(sum by (role) "
                      "(increase(turns_total[1h]))), 12)")
    assert got["value"].between(0, 12).all()


def test_eval_absent_over_time(store):
    base = _base(store)
    conv = base.series_key.str.extract(r"conv_id=([^,}]*)")[0].iloc[0]
    lo, hi = int(base.window_start.min()), int(base.window_start.max())
    got = _run(store, "absent_over_time(turns_total{conv_id=\""
                      + conv + "\"}[1h])", start=lo, end=hi)
    present = set(base.loc[base.series_key.str.contains(
        f"conv_id={conv},"), "window_start"])
    grid = set(range(lo, hi + 1, 3600))
    assert len(got) > 0
    assert set(got["window_start"]) == grid - present
    assert (got["value"] == 1).all()


def test_eval_topk_by_label(store):
    """topk by (role): rank within each (role, window) group."""
    got = _run(store, "topk by (role) (1, increase(turns_total[1h]))")
    base = _base(store)
    base["role"] = base.series_key.str.extract(r"role=([^,}]*)")
    exp = (base.sort_values(["count", "series_key"],
                            ascending=[False, True], kind="stable")
           .groupby(["role", "window_start"], sort=False).head(1))
    assert len(got) == len(exp)
    m = got.merge(exp, on=["series_key", "window_start"])
    assert len(m) == len(got)
    assert (m["value"].to_numpy() == m["count"].to_numpy()).all()


def test_eval_federated_store_list(store):
    """A list of stores reads the federated fleet; the same store twice
    (no dedupe) doubles every sample."""
    one = _run(store, "sum by (role) (increase(turns_total[1h]))")
    two = eval_promql([store, store],
                      "sum by (role) (increase(turns_total[1h]))") \
        .to_pandas().sort_values(["role", "window_start"]) \
        .reset_index(drop=True)
    assert len(two) == len(one)
    assert (two["value"].to_numpy() == 2 * one["value"].to_numpy()).all()


def test_eval_gauge_col_override(store):
    """__col__ pseudo-matcher reads a different tier column: gauge
    delta through the parser equals the structured series_delta."""
    from vertex_ray.read import query_range
    from vertex_ray.stages.windows import series_delta

    got = _run(store, 'delta(conv_turn_idx{__col__="last"}[1m])')
    gauge = query_range(store, "1m", metric="conv_turn_idx",
                        columns=["series_key", "window_start", "last"])
    ref = (series_delta(gauge, "series_key", "window_start", "last")
           .to_pandas().rename(columns={"delta": "value"})
           .sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)


def test_eval_multi_label_by(store):
    got = _run(store, "sum by (conv_id, role) "
                      "(increase(turns_total[1h]))")
    base = _base(store)
    base["conv_id"] = base.series_key.str.extract(r"conv_id=([^,}]*)")
    base["role"] = base.series_key.str.extract(r"role=([^,}]*)")
    exp = (base.groupby(["conv_id", "role", "window_start"])["count"]
           .sum().reset_index().rename(columns={"count": "value"})
           .sort_values(["conv_id", "role", "window_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # avg across the two roles of each conversation-hour
    got2 = _run(store, "avg by (conv_id) (increase(turns_total[1h]))")
    exp2 = (base.groupby(["conv_id", "window_start"])["count"].mean()
            .reset_index().rename(columns={"count": "value"})
            .sort_values(["conv_id", "window_start"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)


def test_eval_histogram_quantile_and_fraction(store):
    from vertex_ray.read import query_range
    from vertex_ray.schema import BUCKET_COLS
    from vertex_ray.stages.quantile import (
        histogram_fraction_batch,
        histogram_quantile_batch,
    )

    got = _run(store, "histogram_quantile(0.9, "
                      "inter_turn_latency_seconds[1h])")
    cols = ["series_key", "window_start", "count"] + list(BUCKET_COLS)
    raw = query_range(store, "1h", metric="inter_turn_latency_seconds",
                      columns=cols).take_all()
    import pyarrow as pa

    t = pa.Table.from_pylist(raw)
    ref = histogram_quantile_batch(t, 0.9, out_col="value").to_pandas()
    ref = (ref[["series_key", "window_start", "value"]]
           .sort_values(["series_key", "window_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)

    fr = _run(store, "histogram_fraction(0.3, 2.5, "
                     "inter_turn_latency_seconds[1h])")
    reff = histogram_fraction_batch(t, 0.3, 2.5, out_col="value") \
        .to_pandas()
    reff = (reff[["series_key", "window_start", "value"]]
            .sort_values(["series_key", "window_start"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(fr, reff)


def test_rule_group_promql_chaining(store):
    """Record rule materializes a named vector; the alert rule selects
    it BY NAME (Prometheus sequential group evaluation); record blocks
    decode back to the exact aggregate."""
    from vertex_ray.pipelines.rollup_pipeline import decode_tier_blocks
    from vertex_ray.stages.record import rule_group_promql

    rules = [
        {"record": "role:turns:sum1h",
         "expr": "sum by (role) (increase(turns_total[1h]))"},
        {"alert": "High",
         "expr": "max_over_time(role:turns:sum1h[3h])",
         "threshold": 120.0, "for": 2},
    ]
    res = rule_group_promql(store, rules, tier="1h")

    # record blocks round-trip to the plain aggregate
    dec = decode_tier_blocks(res["role:turns:sum1h"]).to_pandas()
    ref = _run(store, "sum by (role) (increase(turns_total[1h]))")
    dec["role"] = dec.series_key.str.extract(r"role=([^,}]*)")
    dec = (dec[["role", "window_start", "last"]]
           .sort_values(["role", "window_start"]).reset_index(drop=True))
    assert np.array_equal(dec["last"].to_numpy(),
                          ref["value"].to_numpy(np.float64))

    # alert: run counts consecutive breaches, firing at >= for
    al = res["High"].to_pandas().sort_values(
        ["series_key", "window_start"]).reset_index(drop=True)
    assert set(al["state"]) <= {"inactive", "pending", "firing"}
    assert ((al["state"] == "firing") == (al["run"] >= 2)).all()
    breach = al["value"] > 120.0
    assert ((al["run"] > 0) == breach).all()


def test_eval_errors(store):
    with pytest.raises(ValueError):
        eval_promql(store, "turns_total[1h]")  # bare range selector
    with pytest.raises(ValueError):
        eval_promql(store, "increase(turns_total[90s])")  # no tier fits
    with pytest.raises(ValueError):
        # different steps on the two sides of a binary op
        eval_promql(store, "increase(turns_total[1h]) "
                           "/ on(conv_id) increase(turns_total[5m])")


def test_selector_empty_string_matcher_matches_absent_label(store):
    """Prometheus semantics: ``tool=""`` matches series that LACK the
    tool label — the push-down must not prune them (they only carry
    conv_id/role tags)."""
    got = _run(store, 'sum by (role) (turns_total{tool=""})')
    base = _run(store, "sum by (role) (turns_total)")
    assert got["value"].tolist() == base["value"].tolist()
    assert len(got)
