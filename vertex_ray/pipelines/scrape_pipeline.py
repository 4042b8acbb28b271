"""Scrape-to-store pipeline: OpenMetrics/Prometheus exposition text →
flat samples → MetricNormalize absolute→incremental → windowed delta
rollup → Gorilla-compressed gauge block rows.

This is the reference's PRIMARY metrics data path re-expressed
Ray-Data-first: ``prometheus_scrape`` parses exposition text
(/root/reference lib/prometheus/src/text.rs:12), ``MetricNormalizer``
converts cumulative counters to deltas
(lib/framework/src/sink/buffer/metrics.rs:100-146), and the exporter
sink holds per-series aggregates (src/sinks/prometheus_exporter.rs).
Here: a vectorized line parse per batch (sources/prometheus_text), one
``groupby(series_key)`` exchange whose group body applies the
normalize contract (sorted diff; a DECREASE is a counter reset and the
new value is the delta; the series' FIRST observation only sets the
reference and emits nothing — stages/normalize semantics) fused with
the per-window delta sum (the whole series is already in hand, so the
rollup costs no second exchange), then ``stages/record.vector_blocks``
encodes the windowed vector into flagship-store block rows (one more
bucket exchange + actor-pool Gorilla encode).

Exactness: with integer-valued counters (the Prometheus norm) every
delta and window sum is exact int64-in-float64 arithmetic, so the
decoded store is value-hash-identical to a SQL mirror computed by
telescoping (``max(cum) per window - lag``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["scrape_counters_to_store", "scrape_to_store"]


def _series_key_table(s: pa.Table, metric: str,
                      extra: dict | None = None) -> pa.Table:
    """Flat samples (name/tags/value/ts_ms) → (series_key, ts_ms, value
    [, extra]) rows in the store's key convention ``name{k=v,...}``."""
    tags = pd.Series(s["tags"].to_numpy(zero_copy_only=False),
                     dtype=object).str.replace('"', "", regex=False)
    key = metric + "{" + tags + "}"
    cols = {
        "series_key": pa.array(key.to_numpy(), type=pa.string()),
        "ts_ms": s["ts_ms"],
        "value": s["value"],
    }
    for k, col in (extra or {}).items():
        cols[k] = col
    return pa.table(cols)


def _empty_agg_frame() -> pd.DataFrame:
    from vertex_ray.schema import BUCKET_COLS

    cols = {"bucket": np.zeros(0, np.int32),
            "series_key": np.zeros(0, object),
            "name": np.zeros(0, object),
            "kind": np.zeros(0, np.uint8),
            "window_start": np.zeros(0, np.int64),
            "sum": np.zeros(0), "count": np.zeros(0),
            "min": np.zeros(0), "max": np.zeros(0), "last": np.zeros(0),
            "filled": np.zeros(0, bool), "stale": np.zeros(0, bool)}
    for b in BUCKET_COLS:
        cols[b] = np.zeros(0)
    return pd.DataFrame(cols)


def scrape_to_store(lines_ds, *, metric: str, kind: str = "counter",
                    window_s: int = 60, tier: str = "1m",
                    n_buckets: int = 32):
    """Exposition-text lines Dataset → Gorilla block rows for ONE metric
    family of the given kind (the reference's typed-family regrouping,
    /root/reference lib/prometheus/src/lib.rs:82-255, applied per
    family):

    - ``counter``: MetricNormalize absolute→incremental (decrease =
      reset, first sample emits nothing) + per-window delta sum —
      ``scrape_counters_to_store``.
    - ``gauge``: last observation per (series, window) — the
      ``MetricValue::Gauge`` replace-merge (metric/mod.rs:47-49); the
      decoded value lands in the ``last`` column.
    - ``histogram``: ``<metric>_bucket{le=}`` / ``_sum`` / ``_count``
      suffix routing; the cumulative count/sum/bucket counters are
      normalized JOINTLY (a decrease of ``count`` is a counter reset for
      every stream — the Prometheus rate() rule) and the per-window
      deltas land as ``KIND_HISTOGRAM`` store rows (bucket columns =
      windowed cumulative-``le`` increments). The family's finite ``le``
      uppers must equal the store layout (schema.DEFAULT_BUCKETS; the
      ``+Inf`` line is accepted and dropped — its count is ``count``);
      min/max/last carry 0 (a scrape exposes no raw observations).
    """
    if kind == "counter":
        return scrape_counters_to_store(lines_ds, metric=metric,
                                        window_s=window_s, tier=tier,
                                        n_buckets=n_buckets)
    if kind == "gauge":
        return _scrape_gauges(lines_ds, metric=metric, window_s=window_s,
                              tier=tier, n_buckets=n_buckets)
    if kind == "histogram":
        return _scrape_histograms(lines_ds, metric=metric,
                                  window_s=window_s, tier=tier,
                                  n_buckets=n_buckets)
    raise ValueError(f"unsupported scrape kind: {kind!r}")


def _scrape_gauges(lines_ds, *, metric: str, window_s: int, tier: str,
                   n_buckets: int):
    from vertex_ray.sources.prometheus_text import decode_prometheus_samples
    from vertex_ray.stages.record import vector_blocks

    def parse(t: pa.Table) -> pa.Table:
        s = decode_prometheus_samples(t)
        return _series_key_table(
            s.filter(pa.compute.equal(s["name"], metric)), metric)

    def window_last(g: pd.DataFrame) -> pd.DataFrame:
        # gauge merge = replace: last sample per window in (ts_ms, value)
        # order (value breaks ms-resolution ties deterministically)
        g = g.sort_values(["ts_ms", "value"], kind="stable")
        ws = (g["ts_ms"].to_numpy(dtype=np.int64)
              // (window_s * 1000)) * window_s
        out = (pd.DataFrame({"window_start": ws,
                             "value": g["value"].to_numpy()})
               .groupby("window_start", as_index=False)["value"].last())
        out.insert(0, "series_key", g["series_key"].iloc[0])
        return out

    vec = (lines_ds.map_batches(parse, batch_format="pyarrow")
           .groupby("series_key")
           .map_groups(window_last, batch_format="pandas"))
    return vector_blocks(vec, new_metric=metric, tier=tier,
                         n_buckets=n_buckets)


def _scrape_histograms(lines_ds, *, metric: str, window_s: int, tier: str,
                       n_buckets: int):
    from vertex_ray.schema import (
        BUCKET_COLS,
        DEFAULT_BUCKETS_ARR,
        KIND_HISTOGRAM,
    )
    from vertex_ray.sources.prometheus_text import decode_prometheus_samples
    from vertex_ray.stages.record import agg_rows_to_blocks

    def parse(t: pa.Table) -> pa.Table:
        s = decode_prometheus_samples(t)
        name = s["name"].to_numpy(zero_copy_only=False)
        role = np.where(name == metric + "_count", "count",
                        np.where(name == metric + "_sum", "sum",
                                 np.where(name == metric + "_bucket",
                                          "bucket", "")))
        s = s.filter(pa.array(role != ""))
        return _series_key_table(
            s, metric, extra={"role": pa.array(role[role != ""],
                                               type=pa.string()),
                              "le": s["le"]})

    def normalize_rollup(g: pd.DataFrame) -> pd.DataFrame:
        key = g["series_key"].iloc[0]
        cnt = g[g["role"] == "count"].groupby("ts_ms")["value"].last()
        sm = g[g["role"] == "sum"].groupby("ts_ms")["value"].last()
        b = g[g["role"] == "bucket"].pivot_table(
            index="ts_ms", columns="le", values="value", aggfunc="last")
        uppers = np.asarray([u for u in b.columns if np.isfinite(u)])
        if not np.array_equal(uppers, DEFAULT_BUCKETS_ARR):
            raise ValueError(
                f"scraped le uppers {list(uppers)} do not match the store "
                f"layout {list(DEFAULT_BUCKETS_ARR)} for {key}")
        if len(cnt) < 2:
            return _empty_agg_frame()
        # one wide matrix per scrape instant: count, sum, then the 11
        # cumulative-le counters, all normalized jointly on count resets
        mat = np.column_stack(
            [cnt.to_numpy(np.float64),
             sm.reindex(cnt.index).to_numpy(np.float64)]
            + [b[u].reindex(cnt.index).to_numpy(np.float64)
               for u in uppers])
        if np.isnan(mat).any():
            raise ValueError(f"incomplete scrape instants for {key}: every "
                             "ts must carry _count, _sum and all buckets")
        prev, cur = mat[:-1], mat[1:]
        reset = cur[:, 0] < prev[:, 0]
        delta = np.where(reset[:, None], cur, cur - prev)
        ts = cnt.index.to_numpy(np.int64)[1:]
        out = pd.DataFrame(delta, columns=["count", "sum"]
                           + list(BUCKET_COLS))
        out["window_start"] = (ts // (window_s * 1000)) * window_s
        out = out.groupby("window_start", as_index=False).sum()
        n = len(out)
        out.insert(0, "series_key", key)
        out.insert(0, "bucket", np.int32(
            pd.util.hash_array(np.array([key], dtype=object))[0]
            % np.uint64(n_buckets)))
        out["name"] = metric
        out["kind"] = np.uint8(KIND_HISTOGRAM)
        for c in ("min", "max", "last"):
            out[c] = np.zeros(n)
        out["filled"] = np.zeros(n, bool)
        out["stale"] = np.zeros(n, bool)
        return out[list(_empty_agg_frame().columns)]

    rows = (lines_ds.map_batches(parse, batch_format="pyarrow")
            .groupby("series_key")
            .map_groups(normalize_rollup, batch_format="pandas"))
    return agg_rows_to_blocks(rows, tier=tier)


def scrape_counters_to_store(lines_ds, *, metric: str, window_s: int = 60,
                             tier: str = "1m", n_buckets: int = 32):
    """Exposition-text lines Dataset → Gorilla block rows for ONE
    counter family.

    ``lines_ds``: Dataset with a ``text`` column of exposition lines
    (e.g. ``sources/codecs.read_lines`` over scraped files). ``metric``
    selects the family (a scrape job's series); samples must carry
    timestamps (``ts_ms``) and cumulative counter values. Returns block
    rows in the flagship store schema (decode with
    ``pipelines/rollup_pipeline.decode_tier_blocks`` — windowed delta
    sums land in the gauge ``last`` column)."""
    from vertex_ray.sources.prometheus_text import decode_prometheus_samples
    from vertex_ray.stages.record import vector_blocks

    def parse(t: pa.Table) -> pa.Table:
        s = decode_prometheus_samples(t)
        m = pa.compute.equal(s["name"], metric)
        s = s.filter(m)
        # store-convention series key: name{k=v,...} (tags arrive as the
        # canonical sorted k="v" join — strip the quotes)
        tags = pd.Series(s["tags"].to_numpy(zero_copy_only=False),
                         dtype=object).str.replace('"', "", regex=False)
        key = metric + "{" + tags + "}"
        return pa.table({
            "series_key": pa.array(key.to_numpy(), type=pa.string()),
            "ts_ms": s["ts_ms"],
            "value": s["value"],
        })

    def normalize_rollup(g: pd.DataFrame) -> pd.DataFrame:
        # normalize contract (stages/normalize.absolute_to_incremental):
        # sort, diff, decrease = reset, first observation emits nothing.
        # The cumulative value is the tie-breaker — it encodes arrival
        # order exactly (non-decreasing along the true order), so ms-
        # resolution timestamp ties stay deterministic.
        g = g.sort_values(["ts_ms", "value"], kind="stable")
        key = g["series_key"].iloc[0]
        v = g["value"].to_numpy(dtype=np.float64)
        if len(v) < 2:
            return pd.DataFrame({"series_key": [], "window_start": [],
                                 "value": []})
        prev, cur = v[:-1], v[1:]
        delta = np.where(cur >= prev, cur - prev, cur)
        ws = (g["ts_ms"].to_numpy(dtype=np.int64)[1:]
              // (window_s * 1000)) * window_s
        out = pd.DataFrame({"window_start": ws, "value": delta}) \
            .groupby("window_start", as_index=False)["value"].sum()
        out.insert(0, "series_key", key)
        return out

    vec = (lines_ds.map_batches(parse, batch_format="pyarrow")
           .groupby("series_key")
           .map_groups(normalize_rollup, batch_format="pandas"))
    return vector_blocks(vec, new_metric=metric, tier=tier,
                         n_buckets=n_buckets)
