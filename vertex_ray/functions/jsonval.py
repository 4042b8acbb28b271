"""Truly dynamic (schemaless) log documents — the JSON-string fallback
for rows whose fields change TYPE across rows, which typed Arrow
structs (functions/path) cannot carry.

The reference's ``Value`` is schemaless with per-row heterogeneous
types (``lib/value/src/lib.rs:23-47``) and HASHES type-tagged
(``lib/value/src/lib.rs:49-83``: a discriminant byte before the
payload), so its dedup treats ``"123"`` (string) and ``123`` (integer)
as DIFFERENT keys even though their string renderings match
(``src/transforms/dedup.rs:375-399`` pins exactly that). This module
reproduces those semantics over a JSON-lines string column:

* :func:`json_extract_typed` — path extraction returning (tag, type
  name, canonical rendering) per row; the tag byte values mirror the
  reference's ``Hash`` discriminants, the type NAMES mirror DuckDB's
  ``json_type`` so results stay SQL-oracle-comparable.
* :func:`json_typed_op` — ``map_batches`` body materializing typed
  columns for a set of paths.
* :func:`dedup_json_typed` — exact dedup on the TYPE-TAGGED key tuple:
  one hash-bucket exchange on the key hash (the discriminant byte is
  part of the hashed bytes, the reference's Hash shape), keep the
  minimum-id row per key. 100 TB shape: key cardinality per task is
  bounded by its hash bucket; no driver materialization.

Parsing is ``json.loads`` per document — the boundary codec for
genuinely dynamic payloads (the reference parses per-event too,
lib/codecs json deserializer); everything downstream of extraction
(hashing, bucketing, grouping) is vectorized.
"""
from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from vertex_ray.functions.path import parse_path

__all__ = ["json_extract_typed", "json_typed_op", "dedup_json_typed",
           "TAG_BYTES", "TAG_FLOAT", "TAG_INT", "TAG_BOOL", "TAG_OBJECT",
           "TAG_ARRAY", "TAG_NULL"]

# discriminant bytes — lib/value/src/lib.rs:49-83 (Timestamp=5 has no
# JSON source form; JSON numbers split into Float=2 / Integer=3)
TAG_BYTES = 1
TAG_FLOAT = 2
TAG_INT = 3
TAG_BOOL = 4
TAG_OBJECT = 6
TAG_ARRAY = 7
TAG_NULL = 8

_MISSING = object()


def _walk(doc, steps):
    cur = doc
    for kind, key in steps:
        if kind == "field":
            if not isinstance(cur, dict) or key not in cur:
                return _MISSING
            cur = cur[key]
        else:
            if not isinstance(cur, list):
                return _MISSING
            k = key if key >= 0 else len(cur) + key
            if not (0 <= k < len(cur)):
                return _MISSING
            cur = cur[k]
    return cur


def _tag_name_rend(v):
    """value → (tag byte, DuckDB json_type name, canonical rendering).
    Missing and JSON null both tag NULL (the reference's fallible get
    yields Null for absent paths)."""
    if v is _MISSING or v is None:
        return TAG_NULL, "NULL", None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return TAG_BOOL, "BOOLEAN", "true" if v else "false"
    if isinstance(v, int):
        return TAG_INT, ("UBIGINT" if v >= 0 else "BIGINT"), str(v)
    if isinstance(v, float):
        return TAG_FLOAT, "DOUBLE", repr(v)
    if isinstance(v, str):
        return TAG_BYTES, "VARCHAR", v
    if isinstance(v, dict):
        return TAG_OBJECT, "OBJECT", json.dumps(
            v, separators=(",", ":"), ensure_ascii=False)
    return TAG_ARRAY, "ARRAY", json.dumps(
        v, separators=(",", ":"), ensure_ascii=False)


def json_extract_typed(texts, path: str):
    """JSON-document strings → (tags uint8, type names, renderings).
    Unparseable documents tag NULL (the decode-failure posture of the
    codecs: visible via the tag, never a crash)."""
    steps = parse_path(path)
    n = len(texts)
    tags = np.empty(n, dtype=np.uint8)
    names = np.empty(n, dtype=object)
    rends = np.empty(n, dtype=object)
    for i, s in enumerate(texts):
        try:
            v = _walk(json.loads(s), steps)
        except (ValueError, TypeError):
            v = _MISSING
        tags[i], names[i], rends[i] = _tag_name_rend(v)
    return tags, names, rends


def _key_hash(parts: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    """Type-tagged key hash per row: blake2b over the concatenation of
    (discriminant byte + rendering bytes) per path — the reference's
    ``Hash`` shape, so same-rendering different-type rows never
    collide into one key."""
    n = len(parts[0][0])
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        h = hashlib.blake2b(digest_size=8)
        for tags, rends in parts:
            h.update(bytes([int(tags[i])]))
            r = rends[i]
            h.update(b"\x00" if r is None else r.encode())
            h.update(b"\x1f")  # field separator
        out[i] = int.from_bytes(h.digest(), "big")
    return out


def json_typed_op(text_col: str, paths: dict[str, str]):
    """map_batches body: for each ``out_name -> path`` add
    ``<out>_type`` (DuckDB json_type name, 'NULL' for missing) and
    ``<out>_val`` (canonical rendering, null for missing/null)."""
    parsed = {out: p for out, p in paths.items()}

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        for out, p in parsed.items():
            _, names, rends = json_extract_typed(texts, p)
            t = t.append_column(f"{out}_type",
                                pa.array(names, type=pa.string()))
            t = t.append_column(f"{out}_val",
                                pa.array(rends, type=pa.string()))
        return t

    return fn


def dedup_json_typed(ds, text_col: str, paths: dict[str, str],
                     id_col: str, n_buckets: int = 64):
    """Exact dedup of dynamic JSON documents on the TYPE-TAGGED key
    tuple (reference dedup semantics, src/transforms/dedup.rs:375-420):
    string "123" and integer 123 are distinct keys. Keeps the
    minimum-``id_col`` row per key. One hash-bucket exchange."""
    import pandas as pd

    def tag(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_numpy(zero_copy_only=False)
        parts = []
        for out, p in paths.items():
            tags, names, rends = json_extract_typed(texts, p)
            t = t.append_column(f"{out}_type",
                                pa.array(names, type=pa.string()))
            t = t.append_column(f"{out}_val",
                                pa.array(rends, type=pa.string()))
            parts.append((tags, rends))
        kh = _key_hash(parts)
        t = t.append_column("__kh", pa.array(kh.view(np.int64)))
        return t.append_column(
            "__bucket", pa.array((kh % np.uint64(n_buckets))
                                 .astype(np.int32)))

    key_cols = [f"{o}_{s}" for o in paths for s in ("type", "val")]

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # __kh co-locates; the full (type, val) tuple decides — a 64-bit
        # hash collision can never merge two distinct keys
        g = g.sort_values(id_col, kind="stable")
        out = g.drop_duplicates(subset=key_cols, keep="first")
        return out.drop(columns=["__kh", "__bucket"])

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(keep_first, batch_format="pandas"))
