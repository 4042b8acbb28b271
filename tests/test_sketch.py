"""HyperLogLog distinct sketch: accuracy across cardinality regimes and
partition-independence (the register merge is associative max)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def skewed_table():
    rng = np.random.default_rng(3)
    n = 120_000
    return pa.table({
        "g": np.repeat(["a", "b", "c"], n // 3),
        "v": np.concatenate([
            rng.integers(0, 20_000, n // 3),
            rng.integers(0, 1_000, n // 3),
            rng.integers(0, 40, n // 3),
        ]),
    })


def test_hll_accuracy(ray_session, skewed_table):
    import ray.data as rd

    from vertex_ray.stages.sketch import hll_distinct

    out = (
        hll_distinct(rd.from_arrow(skewed_table).repartition(8), "g", "v")
        .to_pandas()
        .set_index("g")["approx_distinct"]
    )
    exact = skewed_table.to_pandas().groupby("g")["v"].nunique()
    for g in exact.index:
        relerr = abs(out[g] - exact[g]) / exact[g]
        assert relerr < 0.05, (g, out[g], exact[g])


def test_hll_partition_independent(ray_session, skewed_table):
    """Estimate is identical no matter how the input is partitioned."""
    import ray.data as rd

    from vertex_ray.stages.sketch import hll_distinct

    a = (
        hll_distinct(rd.from_arrow(skewed_table).repartition(2), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        hll_distinct(rd.from_arrow(skewed_table).repartition(31), "g", "v")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_hll_p_bounds():
    from vertex_ray.stages.sketch import hll_partial_op

    with pytest.raises(ValueError):
        hll_partial_op("g", "v", p=8)
