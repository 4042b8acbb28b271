"""Vectorized parse_* functions — the VTL stdlib's parser family
(lib/vtl/src/compiler/function/: parse_bytes, parse_duration, parse_json,
parse_query, parse_regex, parse_timestamp, parse_url, parse_user_agent,
cidr_contains, is_ipv4, is_ipv6).

Array → Array transforms, one vectorized pass per batch where the kernel
allows (pandas' cython str.extract / numpy integer math); the per-row
fallbacks (JSON, query strings) parse with C-implemented stdlib parsers
over a single comprehension, never nested Python loops.

Unparseable inputs yield null (the reference's fallible VTL expressions
surface per-event errors which rewrite routes to `dropped`; in columnar
form that's a null + downstream filter).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def _strs(arr) -> pd.Series:
    vals = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr, dtype=object)
    return pd.Series(vals, dtype=object)


# --- bytes / duration ------------------------------------------------------

_BYTE_UNITS = {
    "": 1, "b": 1,
    "kib": 1 << 10, "ki": 1 << 10, "kb": 10**3, "k": 10**3,
    "mib": 1 << 20, "mi": 1 << 20, "mb": 10**6, "m": 10**6,
    "gib": 1 << 30, "gi": 1 << 30, "gb": 10**9, "g": 10**9,
    "tib": 1 << 40, "ti": 1 << 40, "tb": 10**12, "t": 10**12,
    "pib": 1 << 50, "pi": 1 << 50, "pb": 10**15, "p": 10**15,
    "eib": 1 << 60, "ei": 1 << 60, "eb": 10**18, "e": 10**18,
}

_BYTES_RE = re.compile(r"^\s*([0-9]*\.?[0-9]+)\s*([A-Za-z]*)\s*$")


def parse_bytes(arr, unit: str | None = None) -> pa.Array:
    """'1MiB' → 1048576.0; optional output unit divides (parse_bytes.rs:
    unit table — b/k/kib/m/mib/.../eib, decimal and binary prefixes)."""
    div = float(_BYTE_UNITS[unit.lower()]) if unit else 1.0
    s = _strs(arr)
    m = s.str.extract(_BYTES_RE)
    num = pd.to_numeric(m[0], errors="coerce")
    mult = m[1].str.lower().map(_BYTE_UNITS)
    out = (num * mult / div).to_numpy(dtype=np.float64)
    return pa.array(out, type=pa.float64())


_DUR_UNITS_NS = {
    "ns": 1.0, "us": 1e3, "µs": 1e3, "ms": 1e6,
    "s": 1e9, "m": 60e9, "h": 3600e9, "d": 86400e9, "w": 604800e9,
}

_DUR_PART = re.compile(r"([0-9]*\.?[0-9]+)\s*(ns|us|µs|ms|s|m|h|d|w)")


def parse_duration(arr, unit: str = "s") -> pa.Array:
    """'1d1s' → 86401.0 (unit='s'); compound segments sum
    (parse_duration.rs tests: '30s'/'m' → 0.5, '1s1ms'/'ms' → 1001)."""
    div = _DUR_UNITS_NS[unit]
    s = _strs(arr)
    parts = s.str.extractall(_DUR_PART)
    out = np.full(len(s), np.nan, dtype=np.float64)
    if not parts.empty:
        ns = pd.to_numeric(parts[0]) * parts[1].map(_DUR_UNITS_NS)
        summed = ns.groupby(level=0).sum()
        # reject strings with unparsed residue (e.g. '1x'): the matched
        # segments must tile the whole (whitespace-stripped) input
        matched_len = (parts[0].str.len() + parts[1].str.len()).groupby(level=0).sum()
        clean = s.str.replace(r"\s+", "", regex=True).str.len()
        ok = summed.index[matched_len == clean.reindex(summed.index)]
        out[ok.to_numpy()] = (summed[ok] / div).to_numpy()
    return pa.array(out, type=pa.float64())


# --- JSON / query / regex / url / user-agent -------------------------------


def parse_json(arr) -> pa.Array:
    """JSON string column → inferred Arrow values (struct rows for
    objects). Invalid rows → null (parse_json.rs fallibility)."""
    import json

    vals = []
    for v in _strs(arr):
        if v is None:
            vals.append(None)
            continue
        try:
            vals.append(json.loads(v))
        except (ValueError, TypeError):
            vals.append(None)
    return pa.array(vals)


def parse_query(arr) -> pa.Array:
    """Query string ('a=1&b=x%20y') → map<string, string>
    (parse_query.rs; duplicate keys keep every pair, map preserves them)."""
    from urllib.parse import parse_qsl

    rows = [
        None if v is None else parse_qsl(v.lstrip("?"), keep_blank_values=True)
        for v in _strs(arr)
    ]
    return pa.array(rows, type=pa.map_(pa.string(), pa.string()))


def parse_regex(arr, pattern: str) -> pa.Table:
    """Named-group regex extract → one string column per group, null on
    no-match (parse_regex.rs) — ONE cython pass via pandas str.extract."""
    s = _strs(arr)
    w = s.str.extract(pattern)
    rx = re.compile(pattern)
    names = {v: k for k, v in rx.groupindex.items()}
    out = {}
    for i, col in enumerate(w.columns):
        name = col if isinstance(col, str) else names.get(i + 1, f"group_{i + 1}")
        c = w[col]
        out[str(name)] = pa.array(
            c.astype(object).where(pd.notna(c), None).to_numpy(dtype=object),
            type=pa.string(),
        )
    return pa.table(out)


_URL_RE = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):)?//"
    r"(?:(?P<username>[^:@/]*)(?::(?P<password>[^@/]*))?@)?"
    r"(?P<host>\[[0-9A-Fa-f:.]+\]|[^:/?#]*)"
    r"(?::(?P<port>\d+))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<fragment>.*))?$"
)


def parse_url(arr) -> pa.Table:
    """URL column → scheme/username/password/host/port/path/query/fragment
    columns (parse_url.rs field set) in ONE vectorized extract."""
    t = parse_regex(arr, _URL_RE)
    port = pa.array(
        pd.to_numeric(
            pd.Series(t["port"].to_numpy(zero_copy_only=False)), errors="coerce"
        ).to_numpy(dtype=np.float64),
        type=pa.float64(),
    )
    cols = {n: t[n] for n in t.column_names}
    cols["port"] = port
    return pa.table(cols)


_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/(?P<v>[\d.]+)"),
    ("Chrome", r"Chrome/(?P<v>[\d.]+)"),
    ("Firefox", r"Firefox/(?P<v>[\d.]+)"),
    ("Safari", r"Version/(?P<v>[\d.]+).*Safari"),
    ("curl", r"curl/(?P<v>[\d.]+)"),
]

_UA_OS = [
    ("Windows", r"Windows NT"),
    ("Android", r"Android"),
    ("iOS", r"iPhone|iPad"),
    ("macOS", r"Mac OS X"),
    ("Linux", r"Linux"),
]


def parse_user_agent(arr) -> pa.Table:
    """User-agent column → browser/version/os columns. Deliberately a
    small family-level classifier (parse_user_agent.rs wraps a full UA db;
    that db is not in this container — the columnar shape and null
    contract match, the taxonomy is the common families only)."""
    s = _strs(arr).fillna("")
    browser = pd.Series([None] * len(s), dtype=object)
    version = pd.Series([None] * len(s), dtype=object)
    todo = pd.Series(True, index=s.index)
    for name, rx in _UA_BROWSERS:
        hit = todo & s.str.contains(rx.replace("(?P<v>", "(?:"), regex=True)
        if hit.any():
            browser[hit] = name
            version[hit] = s[hit].str.extract(rx)["v"]
            todo &= ~hit
    osname = pd.Series([None] * len(s), dtype=object)
    todo = pd.Series(True, index=s.index)
    for name, rx in _UA_OS:
        hit = todo & s.str.contains(rx, regex=True)
        if hit.any():
            osname[hit] = name
            todo &= ~hit
    nulls = _strs(arr).isna()
    browser[nulls], version[nulls], osname[nulls] = None, None, None

    def col(c):
        return pa.array(c.to_numpy(dtype=object), type=pa.string())

    return pa.table({"browser": col(browser), "version": col(version), "os": col(osname)})


# --- IP / CIDR -------------------------------------------------------------

_IPV4_RE = re.compile(
    r"^(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}$"
)


def _ipv4_to_u32(s: pd.Series) -> np.ndarray:
    """Dotted-quad strings → uint32 (NaN-safe: invalid → 2**32 sentinel
    never matched by any /n prefix)."""
    parts = s.str.extract(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
    nums = parts.apply(pd.to_numeric, errors="coerce")
    bad = nums.isna().any(axis=1) | (nums > 255).any(axis=1)
    n = (
        nums[0].fillna(0) * 2**24 + nums[1].fillna(0) * 2**16
        + nums[2].fillna(0) * 2**8 + nums[3].fillna(0)
    ).to_numpy(dtype=np.int64)
    n[bad.to_numpy()] = 1 << 32
    return n


def is_ipv4(arr) -> pa.Array:
    s = _strs(arr)
    out = s.str.match(_IPV4_RE).to_numpy(dtype=object)
    out[pd.isna(out)] = False
    return pa.array(out.astype(bool), type=pa.bool_())


def is_ipv6(arr) -> pa.Array:
    import ipaddress

    def chk(v):
        if v is None:
            return False
        try:
            return isinstance(ipaddress.ip_address(v), ipaddress.IPv6Address)
        except ValueError:
            return False

    return pa.array([chk(v) for v in _strs(arr)], type=pa.bool_())


def cidr_contains(cidr: str, arr) -> pa.Array:
    """cidr_contains('10.0.0.0/8', ip_col) → bool. IPv4 is one numpy
    mask-compare over uint32; IPv6 falls back to stdlib ipaddress per row
    (cidr_contains.rs semantics: invalid IPs are simply not contained)."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    s = _strs(arr)
    if net.version == 4:
        ips = _ipv4_to_u32(s)
        base = int(net.network_address)
        mask = int(net.netmask)
        out = (ips & mask) == base
        out &= ips < (1 << 32)
        return pa.array(out, type=pa.bool_())

    def chk(v):
        if v is None:
            return False
        try:
            a = ipaddress.ip_address(v)
        except ValueError:
            return False
        return a.version == 6 and a in net

    return pa.array([chk(v) for v in s], type=pa.bool_())
