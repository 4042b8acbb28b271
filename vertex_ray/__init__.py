"""vertex_ray — a Ray-Data-native time-series rollup / downsample / retention
engine with the data-processing capabilities of f1shl3gs/vertex.

Brand-new engine (NOT a port): the reference (read-only at /root/reference)
defines WHAT to compute — the metric data model and merge semantics
(lib/event/src/metric/mod.rs), the series-keyed aggregation pattern
(src/transforms/metricalize.rs), the TTL/staleness model
(src/sinks/prometheus_exporter.rs) and the transform inventory
(src/transforms/*) — while everything here is expressed Ray-Data-first:
``ray.data.Dataset`` pipelines, ``map_batches`` over zero-copy Arrow,
actor pools for stateful stages, explicit hash-bucket partitioning for
the windowed-rollup shuffles, and per-partition checkpoint manifests.

Never calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from vertex_ray.schema import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    DEFAULT_BUCKETS,
    TIERS,
    STALE_NAN_BITS,
)
