"""Tombstone-based series deletion — the store's targeted-delete
lifecycle.

The reference expires whole series by TTL, skipped at read time by the
exporter sink (/root/reference src/sinks/prometheus_exporter.rs:351-356
drops expired entries while serving); targeted deletion here follows the
public Prometheus TSDB shape: a delete request records a TOMBSTONE
(series matchers + an inclusive ``[start, end]`` window range), reads
consult tombstones so deleted points disappear immediately WITHOUT
rewriting any block, and a later compaction applies them physically
(decode → drop → re-encode), after which the tombstone file is cleared.

Scale notes: the tombstone list is tiny driver-side metadata (a JSON
file next to the stage manifests, via fsio/pyarrow.fs so it lives on
the shared store on a multi-node cluster) broadcast into read tasks by
closure — never a shuffle. Block rows whose footer interval is FULLY
covered by a stone are dropped BEFORE decode, so pruning work is
proportional to the deletion; only partially-covered blocks decode and
then drop matching points.

A stone is a dict with keys:
  ``metric``     exact metric name, or None (any)
  ``key_regex``  RE2 over series_key, or None (any) — same matcher
                 language as the read façade's selection
  ``start``/``end``  inclusive window_start bounds (epoch s), None-open
  ``tiers``      list of tier names, or None (all tiers)
"""

from __future__ import annotations

import posixpath

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vertex_ray.state import fsio

__all__ = ["add_tombstone", "load_tombstones", "clear_tombstones",
           "block_keep_mask", "point_keep_mask", "filter_points"]

TOMBSTONE_FILE = "tombstones.json"


def _path(out_dir: str) -> str:
    return posixpath.join(out_dir, TOMBSTONE_FILE)


def load_tombstones(out_dir: str) -> list[dict]:
    p = _path(out_dir)
    return fsio.read_json(p) if fsio.exists(p) else []


def add_tombstone(out_dir: str, *, metric: str | None = None,
                  key_regex: str | None = None, start: int | None = None,
                  end: int | None = None,
                  tiers: list[str] | None = None) -> dict:
    """Record a delete request. Returns the appended stone. Deletion is
    visible to the next read (reads reload the file per query); the data
    itself is untouched until compaction applies the stones."""
    stone = {"metric": metric, "key_regex": key_regex,
             "start": start, "end": end, "tiers": tiers}
    stones = load_tombstones(out_dir)
    stones.append(stone)
    fsio.write_json(_path(out_dir), stones)
    return stone


def clear_tombstones(out_dir: str) -> None:
    """Forget all stones — call ONLY after a compaction that applied
    them was committed (the CleanTombstones step of the lifecycle)."""
    p = _path(out_dir)
    if fsio.exists(p):
        fsio.write_json(p, [])


def _series_match(t: pa.Table, stone: dict, tier: str | None):
    """Per-row bool array: does this row's series fall under the stone's
    matchers (name, key regex, tier)? Time bounds handled separately."""
    m = pa.array(np.ones(len(t), dtype=bool))
    st_tiers = stone.get("tiers")
    if st_tiers is not None:
        if "tier" in t.schema.names:
            m = pc.and_(m, pc.is_in(t["tier"],
                                    value_set=pa.array(list(st_tiers))))
        elif tier is not None and tier not in st_tiers:
            return pa.array(np.zeros(len(t), dtype=bool))
    if stone.get("metric") is not None and "name" in t.schema.names:
        m = pc.and_(m, pc.equal(t["name"], stone["metric"]))
    if stone.get("key_regex") is not None:
        m = pc.and_(m, pc.match_substring_regex(t["series_key"],
                                                stone["key_regex"]))
    return m


def block_keep_mask(t: pa.Table, stones: list[dict],
                    tier: str | None = None):
    """Keep-mask over BLOCK rows (footer interval columns
    ``block_start``/``block_end``): a block is dropped pre-decode only
    when a stone covers its WHOLE interval — partial overlap keeps the
    block for point-level filtering after decode."""
    drop = pa.array(np.zeros(len(t), dtype=bool))
    for s in stones:
        m = _series_match(t, s, tier)
        if s.get("start") is not None:
            m = pc.and_(m, pc.greater_equal(t["block_start"], s["start"]))
        if s.get("end") is not None:
            m = pc.and_(m, pc.less_equal(t["block_end"], s["end"]))
        drop = pc.or_(drop, m)
    return pc.invert(drop)


def point_keep_mask(t: pa.Table, stones: list[dict],
                    tier: str | None = None):
    """Keep-mask over decoded tier rows (``window_start`` column):
    inclusive-bounds range delete per matching series."""
    drop = pa.array(np.zeros(len(t), dtype=bool))
    for s in stones:
        m = _series_match(t, s, tier)
        if s.get("start") is not None:
            m = pc.and_(m, pc.greater_equal(t["window_start"], s["start"]))
        if s.get("end") is not None:
            m = pc.and_(m, pc.less_equal(t["window_start"], s["end"]))
        drop = pc.or_(drop, m)
    return pc.invert(drop)


def filter_points(t: pa.Table, stones: list[dict],
                  tier: str | None = None) -> pa.Table:
    if not stones:
        return t
    return t.filter(point_keep_mask(t, stones, tier))
