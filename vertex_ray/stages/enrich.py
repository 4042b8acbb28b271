"""Broadcast-lookup enrichment — the geoip pattern.

Reference: src/transforms/geoip.rs:85-91,158+ — a read-only mmap MaxMind
DB opened once per process; each event's IP field is looked up and a
city/ISP object inserted. The canonical Ray-first form of "join against a
small static side": ``ray.put`` the lookup table ONCE on the driver, and
an actor-pool class fetches it ONCE per actor in ``__init__`` (never per
batch), then does a vectorized merge per batch.

No MaxMind reader exists in this container, so the geoip DB itself is
modeled by any key→attributes mapping (tests use the testdata nation →
region dimension); the Ray-side plumbing (broadcast, actor pool,
vectorized lookup) is the real, tested component.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


class EnrichLookup:
    """Actor-pool stage: append attribute columns from a broadcast dict.

    lookup_ref: ray.ObjectRef of a pandas DataFrame indexed by the join key.
    key_col: column of the batch to look up.
    """

    def __init__(self, lookup_ref, key_col: str, prefix: str = ""):
        self.table: pd.DataFrame = ray.get(lookup_ref)  # once per actor
        self.key_col = key_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        joined = self.table.reindex(keys)
        for col in self.table.columns:
            vals = joined[col].to_numpy()
            batch = batch.append_column(f"{self.prefix}{col}", pa.array(vals))
        return batch


def enrich(ds, lookup_df: pd.DataFrame, key_col: str, prefix: str = "", concurrency: int = 4):
    # an actor pool reserving EVERY CPU starves its producer and can
    # deadlock the pipeline (observed: concurrency=4 at a 4-CPU session
    # hung the scan) — cap the pool below the session's CPU count
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    concurrency = max(1, min(concurrency, cpus - 2))
    ref = ray.put(lookup_df)
    return ds.map_batches(
        EnrichLookup,
        fn_constructor_args=(ref, key_col, prefix),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
