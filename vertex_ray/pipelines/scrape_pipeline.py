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

__all__ = ["scrape_counters_to_store"]


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
