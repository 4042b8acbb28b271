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


def test_heavy_hitters_exact_when_k_covers(ray_session):
    import ray.data as rd

    from vertex_ray.stages.sketch import heavy_hitters

    t = pa.table({"v": ["a"] * 50 + ["b"] * 30 + ["c"] * 20})
    out = heavy_hitters(
        rd.from_arrow(t).repartition(6), "v", k=8
    ).to_pandas()
    assert out["value"].tolist() == ["a", "b", "c"]
    assert out["approx_count"].tolist() == [50, 30, 20]


def test_heavy_hitters_guarantee_under_compression(ray_session):
    """Skewed stream, k far below distinct count: every value with true
    freq > n/(k+1) surfaces, and counts underestimate by <= n/(k+1)."""
    import ray.data as rd

    from vertex_ray.stages.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    k = 8
    heavy = np.repeat([f"H{i}" for i in range(3)], 3000)   # 3 heavy values
    tail = rng.integers(0, 2000, 6000).astype(str)          # long tail
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    n = len(vals)
    out = heavy_hitters(
        rd.from_arrow(pa.table({"v": vals})).repartition(10), "v", k=k
    ).to_pandas().set_index("value")["approx_count"]
    exact = pd.Series(vals).value_counts()
    bound = n / (k + 1)
    for h in ("H0", "H1", "H2"):
        assert h in out.index            # guaranteed to surface
        assert exact[h] - out[h] <= bound
        assert out[h] <= exact[h]        # never overestimates


def test_exact_quantiles_radix_selection(ray_session):
    import pandas as pd
    import ray.data as rd

    from vertex_ray.stages.quantile import exact_quantiles

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.standard_normal(5000) * 100,          # negatives + positives
        np.repeat([3.25, -7.5], 500),             # heavy duplicates
        np.array([1e-300, -1e-300, 1e308]),       # extreme magnitudes
    ])
    ds = rd.from_pandas(pd.DataFrame({"value": vals})).repartition(8)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = exact_quantiles(ds, "value", qs)
    srt = np.sort(vals)
    for q, got in zip(out["q"], out["value"]):
        k = max(int(np.ceil(q * len(srt))) - 1, 0)
        assert got == srt[k], (q, got, srt[k])


def test_exact_quantiles_empty_and_null(ray_session):
    import pandas as pd
    import ray.data as rd

    from vertex_ray.stages.quantile import exact_quantiles

    ds = rd.from_pandas(pd.DataFrame({"value": [np.nan, np.nan]}))
    out = exact_quantiles(ds, "value", [0.5])
    assert np.isnan(out["value"].iloc[0])


def test_hll_md5_matches_sql_raw_regime(ray_session):
    """50k distinct values puts the estimator in the RAW harmonic-mean
    regime (past linear counting); the DuckDB mirror must still match the
    rounded estimate bit-for-bit — this pins the exact-integer harmonic
    sum and the fixed-order float expression."""
    import duckdb
    import ray.data as rd

    from vertex_ray.pipelines.op_queries import SQL_HLL_MD5_DISTINCT_EVENTS
    from vertex_ray.stages.sketch import hll_distinct

    n = 50_000
    rows = pa.table({
        "event_type": pa.array(["big"] * n),
        "user_id": pa.array(np.arange(n, dtype=np.int64) * 7 + 13),
    })
    out = hll_distinct(rd.from_arrow(rows), "event_type", "user_id",
                       hash_family="md5").to_pandas()
    est = int(out["approx_distinct"].iloc[0])
    # sanity: inside the ~1.6% standard-error envelope (allow 4 sigma)
    assert abs(est - n) < 4 * 1.04 / (1 << 6) * n

    con = duckdb.connect()
    con.register("events_arrow", rows)
    sql = SQL_HLL_MD5_DISTINCT_EVENTS.replace("FROM events",
                                              "FROM events_arrow")
    ref = con.sql(sql).df()
    assert int(ref["approx_distinct"].iloc[0]) == est


def test_kll_rank_error_and_determinism():
    from vertex_ray.stages.sketch import KllSketch

    rng = np.random.default_rng(3)
    for dist in ("normal", "lognormal"):
        x = getattr(rng, dist)(size=200_000)
        sk = KllSketch(200)
        for chunk in np.array_split(x, 40):
            sk.update(chunk)
        xs = np.sort(x)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            v = sk.quantile(q)
            true_rank = np.searchsorted(xs, v, side="right")
            # empirical bound for the deterministic variant; the classic
            # randomized 1-sigma bound is ~2.3/k = 1.15% — allow 2%
            assert abs(true_rank - q * len(x)) / len(x) < 0.02, (dist, q)
        # memory is O(k log(n/k)), nowhere near n
        assert sk._size() < 1000
    # bit-deterministic across identical runs
    a, b = KllSketch(64), KllSketch(64)
    x = rng.normal(size=50_000)
    for chunk in np.array_split(x, 7):
        a.update(chunk)
        b.update(chunk)
    assert all((u == v).all() for u, v in zip(a.levels, b.levels))


def test_kll_merge_matches_single_sketch_error():
    from vertex_ray.stages.sketch import KllSketch

    rng = np.random.default_rng(11)
    x = rng.exponential(size=120_000)
    parts = np.array_split(x, 13)
    merged = None
    for p in parts:
        s = KllSketch(128).update(p)
        merged = s if merged is None else merged.merge(s)
    assert merged.n == len(x)
    xs = np.sort(x)
    for q in (0.05, 0.5, 0.95, 0.99):
        v = merged.quantile(q)
        tr = np.searchsorted(xs, v, side="right")
        assert abs(tr - q * len(x)) / len(x) < 0.03, q
    # dump/load round-trip preserves the estimate
    items, lvls, n = merged.dump()
    re = KllSketch.load(items, lvls, n, 128)
    assert re.quantile(0.5) == merged.quantile(0.5)


def test_kll_quantiles_distributed(ray_session):
    import ray.data as rd

    from vertex_ray.stages.sketch import kll_quantiles

    rng = np.random.default_rng(5)
    n = 60_000
    t = pa.table({
        "g": pa.array(np.where(np.arange(n) % 3 == 0, "a", "b")),
        "v": pa.array(rng.normal(size=n)),
    })
    out = kll_quantiles(rd.from_arrow(t).repartition(8), "v",
                        [0.1, 0.5, 0.9], k=200, group_col="g").to_pandas()
    assert len(out) == 6
    df = t.to_pandas()
    for _, row in out.iterrows():
        grp = df[df["g"] == row["g"]]["v"].to_numpy()
        tr = np.searchsorted(np.sort(grp), row["value"], side="right")
        assert abs(tr - row["q"] * len(grp)) / len(grp) < 0.03
