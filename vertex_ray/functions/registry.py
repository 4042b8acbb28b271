"""Scalar function surface — the engine's analogue of the reference's VTL
stdlib (lib/vtl/src/compiler/function/, 74 functions; SURVEY.md §2.5).

We do NOT build an expression language: user logic is plain Python over
Arrow batches, and this registry provides the vectorized building blocks
(pyarrow.compute kernels with consistent names) so pipeline configs can
name transformations. Every function maps Array/ChunkedArray → Array.

Coverage: the full 74-name VTL stdlib re-expressed columnar — string
case/trim/slice/split/replace/starts/ends/contains/find/format,
parse/format timestamp + unix conversion, the parse_* family
(bytes/duration/json/query/regex/url/user_agent — functions/parse.py),
cidr_contains + is_ipv4/is_ipv6, numeric abs/ceil/floor/round/mod/log,
type predicates + typeof + casts, list ops (append/push/compact/
includes/join/unique/length), struct/document ops (get/set/del/merge/
keys/values/flatten/exists), hashing (md5/sha256; xxhash's stable-64-bit
role is pandas' siphash since xxhash isn't in this container), base64,
redact, truncate, now/get_env/get_hostname, assert/assert_eq.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vertex_ray.functions.parse import (
    cidr_contains,
    is_ipv4,
    is_ipv6,
    parse_bytes,
    parse_duration,
    parse_json,
    parse_query,
    parse_regex,
    parse_url,
    parse_user_agent,
)


def _np_str(arr, fn):
    vals = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr)
    return pa.array([fn(v) if v is not None else None for v in vals])


def _camel(s: str) -> str:
    parts = [p for p in __import__("re").split(r"[_\-\s]+", s) if p]
    return parts[0].lower() + "".join(p.title() for p in parts[1:]) if parts else s


def _pascal(s: str) -> str:
    parts = [p for p in __import__("re").split(r"[_\-\s]+", s) if p]
    return "".join(p.title() for p in parts)


def _snake(s: str) -> str:
    import re

    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return re.sub(r"[\-\s]+", "_", s).lower()


def _kebab(s: str) -> str:
    return _snake(s).replace("_", "-")


def _md5hex(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def _sha256hex(s: str) -> str:
    import hashlib

    return hashlib.sha256(s.encode()).hexdigest()


def _b64e(s: str) -> str:
    import base64

    return base64.b64encode(s.encode()).decode()


def _b64d(s: str) -> str:
    import base64

    return base64.b64decode(s.encode()).decode()


# --- list ops (VTL: append push compact includes join unique length) -------


def _as_list(arr) -> pa.ListArray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _list_parts(arr):
    a = _as_list(arr)
    off = np.asarray(a.offsets)
    return a, off, a.values


def list_append(arr, value) -> pa.ListArray:
    """append/push: one value onto every row's list — vectorized rebuild
    (np.insert at each segment end; no per-row Python)."""
    a, off, vals = _list_parts(arr)
    v = vals.to_numpy(zero_copy_only=False)
    new_vals = np.insert(v, np.repeat(off[1:] - off[0], 1), value)
    new_off = (off - off[0]) + np.arange(len(off))
    return pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()),
                                    pa.array(new_vals, type=a.values.type))


def list_compact(arr) -> pa.ListArray:
    """compact: drop null/empty-string elements from every list."""
    a, off, vals = _list_parts(arr)
    keep = np.asarray(pc.is_valid(vals))
    if pa.types.is_string(vals.type):
        keep &= np.asarray(pc.not_equal(vals, "").fill_null(False))
    base = off - off[0]
    kept_cum = np.concatenate([[0], np.cumsum(keep)])
    new_off = kept_cum[base]
    return pa.ListArray.from_arrays(pa.array(new_off, type=pa.int32()),
                                    vals.filter(pa.array(keep)))


def list_includes(arr, value) -> pa.Array:
    """includes: does the row's list contain value — flattened equality +
    segmented any via reduceat."""
    a, off, vals = _list_parts(arr)
    eq = np.asarray(pc.equal(vals, value).fill_null(False))
    base = off - off[0]
    n = len(off) - 1
    out = np.zeros(n, dtype=bool)
    nz = base[:-1] < base[1:]
    if nz.any():
        out[nz] = np.logical_or.reduceat(eq, base[:-1][nz])
    return pa.array(out, type=pa.bool_())


# --- struct / object ops (VTL: get set del merge keys values flatten
# exists) — the log-document Value type (SURVEY §1.2) maps to Arrow struct
# columns; paths are dotted -----------------------------------------------


def _as_struct(arr) -> pa.StructArray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def struct_get(arr, path: str):
    """get: dotted-path field access; missing path → typed nulls are the
    caller's problem (raises KeyError like VTL's fallible get)."""
    cur = _as_struct(arr)
    for p in path.split("."):
        cur = _as_struct(cur).field(p)
    return cur


def struct_exists(arr, path: str) -> pa.Array:
    try:
        f = struct_get(arr, path)
    except KeyError:
        return pa.array(np.zeros(len(arr), dtype=bool), type=pa.bool_())
    return pc.is_valid(f)


def struct_set(arr, name: str, value) -> pa.StructArray:
    """set: replace-or-add a top-level field (value: Array or scalar)."""
    s = _as_struct(arr)
    if not isinstance(value, (pa.Array, pa.ChunkedArray)):
        value = pa.array([value] * len(s))
    names = [f.name for f in s.type]
    arrays = [s.field(i) for i in range(s.type.num_fields)]
    if name in names:
        arrays[names.index(name)] = value
    else:
        names.append(name)
        arrays.append(value)
    return pa.StructArray.from_arrays(arrays, names=names)


def struct_del(arr, name: str) -> pa.StructArray:
    s = _as_struct(arr)
    keep = [(f.name, s.field(i)) for i, f in enumerate(s.type) if f.name != name]
    return pa.StructArray.from_arrays([a for _, a in keep], names=[n for n, _ in keep])


def struct_merge(a, b) -> pa.StructArray:
    """merge: b's fields win on collision (VTL merge semantics)."""
    out = _as_struct(a)
    sb = _as_struct(b)
    for i, f in enumerate(sb.type):
        out = struct_set(out, f.name, sb.field(i))
    return out


def struct_keys(arr) -> pa.Array:
    s = _as_struct(arr)
    names = [f.name for f in s.type]
    return pa.array([names] * len(s), type=pa.list_(pa.string()))


def struct_values(arr) -> pa.Array:
    """values: per-row list of the field values cast to string (columnar
    stand-in for VTL's heterogeneous value list)."""
    s = _as_struct(arr)
    cols = [pc.cast(s.field(i), pa.string()) for i in range(s.type.num_fields)]
    n = len(s)
    k = len(cols)
    flat = np.empty(n * k, dtype=object)
    for j, c in enumerate(cols):
        flat[j::k] = c.to_numpy(zero_copy_only=False)
    off = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    return pa.ListArray.from_arrays(off, pa.array(flat, type=pa.string()))


def struct_flatten(arr, sep: str = ".") -> pa.Table:
    """flatten: nested struct column → flat table with dotted names."""
    s = _as_struct(arr)
    out = {}

    def walk(prefix: str, sa: pa.StructArray):
        for i, f in enumerate(sa.type):
            name = f"{prefix}{sep}{f.name}" if prefix else f.name
            child = sa.field(i)
            if pa.types.is_struct(child.type):
                walk(name, child)
            else:
                out[name] = child

    walk("", s)
    return pa.table(out)


# --- misc (VTL: format typeof now get_env get_hostname assert xxhash) ------


def format_str(fmt: str, *cols) -> pa.Array:
    """format: positional '{}' placeholders filled from columns — chained
    vectorized string concat, not a per-row format() call."""
    import pandas as pd

    parts = fmt.split("{}")
    if len(parts) != len(cols) + 1:
        raise ValueError(f"format: {len(parts) - 1} placeholders, {len(cols)} columns")
    # scalar args (literals in an expression) broadcast to the batch width
    def _is_col(c):
        return isinstance(c, (pa.Array, pa.ChunkedArray)) or (
            hasattr(c, "__len__") and not isinstance(c, (str, bytes)))

    n = max((len(c) for c in cols if _is_col(c)), default=1)
    cols = [c if _is_col(c) else pa.array([c] * n) for c in cols]
    acc = pd.Series([parts[0]] * n)
    for seg, col in zip(parts[1:], cols):
        cs = pd.Series(np.asarray(pc.cast(col, pa.string()).to_numpy(zero_copy_only=False)))
        acc = acc.str.cat(cs, na_rep="null").str.cat([seg] * n)
    return pa.array(acc.to_numpy(dtype=object), type=pa.string())


def typeof(arr) -> pa.Array:
    """typeof: columnar types are per-column, so the answer is one name
    repeated (null rows stay 'null' like VTL's dynamic check)."""
    t = arr.type
    if pa.types.is_boolean(t):
        name = "boolean"
    elif pa.types.is_integer(t):
        name = "integer"
    elif pa.types.is_floating(t):
        name = "float"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        name = "string"
    elif pa.types.is_timestamp(t):
        name = "timestamp"
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        name = "array"
    elif pa.types.is_struct(t) or pa.types.is_map(t):
        name = "object"
    else:
        name = str(t)
    valid = np.asarray(pc.is_valid(arr))
    out = np.where(valid, name, "null")
    return pa.array(out, type=pa.string())


def _is_type(arr, pred) -> pa.Array:
    ok = bool(pred(arr.type))
    valid = np.asarray(pc.is_valid(arr))
    return pa.array(valid & ok, type=pa.bool_())


def is_empty(arr) -> pa.Array:
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return pc.equal(pc.utf8_length(arr), 0).fill_null(True)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return pc.equal(pc.list_value_length(arr), 0).fill_null(True)
    return pc.is_null(arr)


def now(n: int = 1) -> pa.Array:
    import datetime as dt

    t = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    return pa.array([t] * n, type=pa.timestamp("us"))


def get_env(name: str, n: int = 1) -> pa.Array:
    import os

    return pa.array([os.environ.get(name)] * n, type=pa.string())


def get_hostname(n: int = 1) -> pa.Array:
    import socket

    return pa.array([socket.gethostname()] * n, type=pa.string())


def assert_all(mask, msg: str = "assert failed"):
    """assert: raise unless every (non-null counts as failure) value is
    true; returns the mask so it chains (VTL assert aborts resolution)."""
    ok = pc.all(pc.fill_null(mask, False)).as_py()
    if not ok or len(mask) == 0 and ok is None:
        raise AssertionError(msg)
    return mask


def assert_eq(a, b, msg: str = "assert_eq failed"):
    eq = pc.equal(a, b)
    if not pc.all(pc.fill_null(eq, False)).as_py():
        raise AssertionError(msg)
    return eq


def hash64(arr) -> pa.Array:
    """xxhash's role (stable fast 64-bit content hash) — xxhash is not in
    this container; pandas' siphash (fixed key, stable across processes)
    provides the same contract."""
    import pandas as pd

    v = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr)
    return pa.array(pd.util.hash_array(v, categorize=False).astype(np.uint64))


def levenshtein_to(arr, target: str) -> pa.Array:
    """Vectorized edit distance of every string in the batch against ONE
    target (fuzzy matching / data cleaning; DuckDB ``levenshtein`` is the
    oracle). The DP runs over (max_len × len(target)) scalar steps, each a
    numpy op across the WHOLE batch — no per-row Python loop: strings are
    viewed as a fixed-width uint32 codepoint matrix via numpy's 'U' dtype."""
    s = arr.to_numpy(zero_copy_only=False) if hasattr(arr, "to_numpy") else np.asarray(arr)
    n = len(s)
    if n == 0:
        return pa.array(np.zeros(0, dtype=np.int64))
    su = np.array(["" if x is None else str(x) for x in s], dtype="U")
    lens = np.char.str_len(su)
    L = int(lens.max())
    t = np.frombuffer(target.encode("utf-32-le"), dtype=np.uint32)
    m = len(t)
    if L == 0:
        return pa.array(np.full(n, m, dtype=np.int64))
    view = su.view(np.uint32).reshape(n, -1)[:, :L]
    v = np.broadcast_to(np.arange(m + 1, dtype=np.int64), (n, m + 1)).copy()
    new = np.empty_like(v)
    for i in range(1, L + 1):
        c = view[:, i - 1]
        new[:, 0] = i
        for j in range(1, m + 1):
            sub = v[:, j - 1] + (c != t[j - 1])
            np.minimum(v[:, j] + 1, new[:, j - 1] + 1, out=new[:, j])
            np.minimum(new[:, j], sub, out=new[:, j])
        alive = lens >= i
        v[alive] = new[alive]
    return pa.array(v[:, m])


def _path_get_fn(arr, path):
    from vertex_ray.functions.path import get_path

    return get_path(arr, path)


def _path_set_fn(arr, path, value):
    from vertex_ray.functions.path import set_path

    return set_path(arr, path, value)


FUNCTIONS: dict = {
    # string case / shape (VTL: lowercase uppercase camelcase pascalcase
    # snakecase kebabcase trim truncate slice split join replace)
    "lowercase": pc.utf8_lower,
    "levenshtein": levenshtein_to,
    "uppercase": pc.utf8_upper,
    "capitalize": pc.utf8_capitalize,
    "trim": pc.utf8_trim_whitespace,
    "camelcase": lambda a: _np_str(a, _camel),
    "pascalcase": lambda a: _np_str(a, _pascal),
    "snakecase": lambda a: _np_str(a, _snake),
    "kebabcase": lambda a: _np_str(a, _kebab),
    "truncate": lambda a, n=16: pc.utf8_slice_codeunits(a, 0, n),
    "slice": lambda a, start, stop: pc.utf8_slice_codeunits(a, start, stop),
    "split": lambda a, sep=" ": pc.split_pattern(a, sep),
    "replace": lambda a, pat, rep: pc.replace_substring(a, pat, rep),
    "starts_with": lambda a, p: pc.starts_with(a, p),
    "ends_with": lambda a, p: pc.ends_with(a, p),
    "contains": lambda a, p: pc.match_substring(a, p),
    "match": lambda a, rx: pc.match_substring_regex(a, rx),
    "length": pc.utf8_length,
    "redact": lambda a, rx, rep="[REDACTED]": pc.replace_substring_regex(a, rx, rep),
    # numeric (VTL: abs ceil floor round mod log to_float to_integer)
    "abs": pc.abs,
    "ceil": pc.ceil,
    "floor": pc.floor,
    "round": lambda a, n=0: pc.round(a, ndigits=n),
    "mod": lambda a, m: pa.array(a.to_numpy(zero_copy_only=False) % m),
    "log": pc.ln,
    "to_float": lambda a: pc.cast(a, pa.float64()),
    "to_integer": lambda a: pc.cast(a, pa.int64()),
    "to_string": lambda a: pc.cast(a, pa.string()),
    "to_bool": lambda a: pc.cast(a, pa.bool_()),
    # timestamps (VTL: parse_timestamp from/to_unix_timestamp format now)
    "parse_timestamp": lambda a, fmt="%Y-%m-%dT%H:%M:%S": pc.strptime(a, fmt, "us"),
    "to_unix_timestamp": lambda a: pc.divide(pc.cast(a, pa.int64()), 1_000_000),
    "from_unix_timestamp": lambda a: pc.cast(
        pc.multiply(pc.cast(a, pa.int64()), 1_000_000), pa.timestamp("us")
    ),
    "format_timestamp": lambda a, fmt="%Y-%m-%dT%H:%M:%S": pc.strftime(a, fmt),
    # predicates (VTL: is_null is_float is_integer is_string exists)
    "is_null": pc.is_null,
    "is_valid": pc.is_valid,
    # hashing / encoding (VTL: xxhash → md5/sha256 here; encode/decode_base64)
    "md5": lambda a: _np_str(a, _md5hex),
    "sha256": lambda a: _np_str(a, _sha256hex),
    "encode_base64": lambda a: _np_str(a, _b64e),
    "decode_base64": lambda a: _np_str(a, _b64d),
    # collections
    "unique": pc.unique,
    "list_length": pc.list_value_length,
    "append": list_append,
    "push": list_append,
    "compact": list_compact,
    "includes": list_includes,
    "join": lambda a, sep="": pc.binary_join(a, sep),
    "find": lambda a, sub: pc.find_substring(a, sub),
    # object / document ops (struct columns)
    "get": struct_get,
    "set": struct_set,
    "del": struct_del,
    "merge": struct_merge,
    "keys": struct_keys,
    "values": struct_values,
    "flatten": struct_flatten,
    "exists": struct_exists,
    # parsers (vectorized; functions/parse.py)
    "parse_bytes": parse_bytes,
    "parse_duration": parse_duration,
    "parse_json": parse_json,
    "parse_query": parse_query,
    "parse_regex": parse_regex,
    "parse_url": parse_url,
    "parse_user_agent": parse_user_agent,
    "cidr_contains": cidr_contains,
    # nested Value path get/set (lib/value/src/path analogue;
    # functions/path.py — exprlang also exposes `.a.b[2]` postfix)
    "get_path": _path_get_fn,
    "set_path": _path_set_fn,
    # type predicates / introspection
    "typeof": typeof,
    "is_bool": lambda a: _is_type(a, pa.types.is_boolean),
    "is_integer": lambda a: _is_type(a, pa.types.is_integer),
    "is_float": lambda a: _is_type(a, pa.types.is_floating),
    "is_string": lambda a: _is_type(
        a, lambda t: pa.types.is_string(t) or pa.types.is_large_string(t)
    ),
    "is_timestamp": lambda a: _is_type(a, pa.types.is_timestamp),
    "is_array": lambda a: _is_type(
        a, lambda t: pa.types.is_list(t) or pa.types.is_large_list(t)
    ),
    "is_object": lambda a: _is_type(
        a, lambda t: pa.types.is_struct(t) or pa.types.is_map(t)
    ),
    "is_empty": is_empty,
    "is_ipv4": is_ipv4,
    "is_ipv6": is_ipv6,
    # misc
    "format": format_str,
    "now": now,
    "get_env": get_env,
    "get_hostname": get_hostname,
    "assert": assert_all,
    "assert_eq": assert_eq,
    "xxhash": hash64,
    "hash64": hash64,
}


def apply(name: str, arr, *args, **kwargs):
    """Apply a registered function by name (the config-surface entry point)."""
    return FUNCTIONS[name](arr, *args, **kwargs)
