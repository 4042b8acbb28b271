"""Nested ``Value`` path addressing over Arrow struct/list/map columns —
the analogue of the reference's ``lib/value/src/path/``
(``parse_target_path``; every transform config addresses dynamic log
documents by paths like ``.a.b[2]``, ``lib/value/src/path/mod.rs``).

Vectorized: each path segment is ONE Arrow operation over the whole
column (``struct_field`` / list-offset gather / ``map_lookup``) — never
a per-row descent. Semantics mirror the reference's fallible get:
addressing a missing field, an out-of-range index (negative indices
count from the end), or descending into a non-container yields NULL for
that row, not an error.

``path_set`` covers the write side for FIELD paths (the rewrite/eval
transform's target), rebuilding the struct arrays along the path;
list-index writes are not supported (the reference's array-insert
padding semantics have no columnar analogue worth the complexity —
raise instead of guessing).
"""
from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_path", "path_get", "path_set", "get_path", "set_path"]

_FIELD_RE = re.compile(r'[A-Za-z_@][A-Za-z0-9_@]*')


def parse_path(path: str) -> list[tuple]:
    """``".a.b[2]"`` (leading dot optional) → segment list
    ``[("field", "a"), ("field", "b"), ("index", 2)]``. Quoted field
    segments (``."odd key"``) carry arbitrary characters."""
    steps: list[tuple] = []
    i = 0
    n = len(path)
    if i < n and path[i] == ".":
        i += 1
    while i < n:
        c = path[i]
        if c == ".":
            i += 1
            continue
        if c == "[":
            j = path.index("]", i)
            steps.append(("index", int(path[i + 1:j])))
            i = j + 1
            continue
        if c == '"':
            j = path.index('"', i + 1)
            steps.append(("field", path[i + 1:j]))
            i = j + 1
            continue
        m = _FIELD_RE.match(path, i)
        if not m:
            raise ValueError(f"path: bad segment at {path[i:]!r}")
        steps.append(("field", m.group()))
        i = m.end()
    if not steps:
        raise ValueError(f"path: empty path {path!r}")
    return steps


def _nulls(n: int) -> pa.Array:
    return pa.nulls(n)


def _combine(arr):
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def _get_field(arr: pa.Array, key: str) -> pa.Array:
    t = arr.type
    if pa.types.is_struct(t):
        if t.get_field_index(key) < 0:
            return _nulls(len(arr))
        return _combine(pc.struct_field(arr, key))
    if pa.types.is_map(t):
        return _combine(pc.map_lookup(arr, pa.scalar(key), "first"))
    return _nulls(len(arr))


def _get_index(arr: pa.Array, idx: int) -> pa.Array:
    t = arr.type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        return _nulls(len(arr))
    arr = _combine(arr)
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offsets[1:] - offsets[:-1]
    want = np.full(len(arr), idx, dtype=np.int64)
    if idx < 0:
        want = lens + idx
    valid = (want >= 0) & (want < lens)
    if arr.null_count:
        valid &= np.asarray(arr.is_valid())
    pos = offsets[:-1] + np.clip(want, 0, None)
    take = pa.array(np.where(valid, pos, 0),
                    mask=~valid)  # null index → null result row
    return _combine(arr.values.take(take))


def path_get(arr, steps: list[tuple] | str) -> pa.Array:
    """Vectorized nested get. ``steps`` is a parse_path list or the path
    text itself."""
    if isinstance(steps, str):
        steps = parse_path(steps)
    arr = _combine(arr)
    if not isinstance(arr, pa.Array):
        raise TypeError(f"path_get: not a column ({type(arr).__name__})")
    for kind, key in steps:
        if pa.types.is_null(arr.type):
            return _nulls(len(arr))
        arr = _get_field(arr, key) if kind == "field" \
            else _get_index(arr, key)
    return arr


def path_set(arr, steps: list[tuple] | str, value) -> pa.Array:
    """Vectorized nested set along a FIELD path: returns a new column
    with the addressed field replaced (or added). Rows where an
    intermediate struct is NULL become valid objects whose other fields
    stay null — the reference's insert-creates-objects behavior. A
    non-struct intermediate is replaced by a fresh single-field struct
    (lib/value Value::insert overwrites scalars with objects)."""
    if isinstance(steps, str):
        steps = parse_path(steps)
    arr = _combine(arr)
    n = len(arr)
    if isinstance(value, (pa.Array, pa.ChunkedArray)):
        value = _combine(value)
    else:
        value = pa.array([value] * n)
    kind, key = steps[0]
    if kind != "field":
        raise NotImplementedError("path_set: list-index writes are not "
                                  "supported (field paths only)")
    if not pa.types.is_struct(arr.type):
        inner = path_set(_nulls(n), steps[1:], value) if len(steps) > 1 \
            else value
        return pa.StructArray.from_arrays([inner], [key])
    names = [f.name for f in arr.type]
    children = {nm: _combine(pc.struct_field(arr, nm)) for nm in names}
    child = children.get(key, _nulls(n))
    children[key] = path_set(child, steps[1:], value) if len(steps) > 1 \
        else value
    if key not in names:
        names.append(key)
    return pa.StructArray.from_arrays([children[nm] for nm in names],
                                      names)


def get_path(arr, path: str) -> pa.Array:
    """Registry form: ``get_path(col, ".a.b[2]")``."""
    if isinstance(path, (pa.Array, pa.ChunkedArray)):
        raise TypeError("get_path: path must be a literal string")
    return path_get(arr, path)


def set_path(arr, path: str, value) -> pa.Array:
    """Registry form: ``set_path(col, ".a.b", value)``."""
    if isinstance(path, (pa.Array, pa.ChunkedArray)):
        raise TypeError("set_path: path must be a literal string")
    return path_set(arr, path, value)
