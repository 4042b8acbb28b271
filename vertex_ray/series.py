"""Series identity: canonical name + sorted-tag key.

Mirrors the reference's ``MetricSeries { name, tags }`` hash key
(``lib/event/src/metric/mod.rs:68``) where ``Tags`` is a sorted-by-key
vector (``lib/event/src/tags/mod.rs:36-44``) — sorted keys give a
canonical identity regardless of insertion order. We render it
Prometheus-style: ``name{k1=v1,k2=v2}`` with keys sorted, empty tag
values omitted.
"""

from __future__ import annotations

import numpy as np


def series_key(name: str, tags: dict[str, str]) -> str:
    items = sorted((k, v) for k, v in tags.items() if v is not None and v != "")
    if not items:
        return name
    inner = ",".join(f"{k}={v}" for k, v in items)
    return f"{name}{{{inner}}}"


def series_key_arrays(name: str, **tag_cols: np.ndarray) -> np.ndarray:
    """Vectorized series_key for parallel tag arrays (numpy unicode/object).

    ``tag_cols`` maps tag key -> value array; keys are sorted here once.
    Empty-string values are omitted per-row, matching series_key().
    """
    keys = sorted(tag_cols)
    n = len(next(iter(tag_cols.values())))
    parts = np.full(n, name, dtype=object)
    sep = np.full(n, "{", dtype=object)
    first = np.ones(n, dtype=bool)
    body = np.full(n, "", dtype=object)
    for k in keys:
        v = np.asarray(tag_cols[k], dtype=object)
        present = v != ""
        frag = np.where(present, (k + "=") + v, "")
        comma = np.where(present & ~first, ",", "")
        body = body + comma + np.where(present, frag, "")
        first = first & ~present
    has_tags = ~first
    out = np.where(has_tags, parts + sep + body + "}", parts)
    return out.astype(object)


def bucket_of(series: np.ndarray | list[str], n_buckets: int) -> np.ndarray:
    """Deterministic hash bucket for co-locating a series' windows.

    Stable across processes (unlike Python ``hash``): FNV-1a over the
    UTF-8 bytes, vectorized per unique value.
    """
    arr = np.asarray(series, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    h = np.fromiter((_fnv1a(s) % n_buckets for s in uniq), dtype=np.int32, count=len(uniq))
    return h[inv]


def _fnv1a(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
