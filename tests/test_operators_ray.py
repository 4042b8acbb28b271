"""Distributed operator paths on Ray: exact dedup shuffle, throttle quota,
cardinality budget, broadcast enrichment."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet("/root/testdata/sf0.001/events.parquet")


def test_dedup_exact_distributed(ray_session):
    import ray.data as rd

    from vertex_ray.stages.dedup import dedup_exact

    t = pa.table(
        {
            "k": ["a", "a", "b", "a", "c"],
            "o": [3, 1, 5, 2, 4],
            "payload": ["p3", "p1", "p5", "p2", "p4"],
        }
    )
    out = dedup_exact(rd.from_arrow(t), ["k"], "o").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    # keeper = min order per key
    assert out["o"].tolist() == [1, 5, 4]
    assert out["payload"].tolist() == ["p1", "p5", "p4"]


def test_throttle_quota(events_ds):
    from vertex_ray.stages.ops import throttle_quota

    out = throttle_quota(
        events_ds, "user_id", "ts", 3600, threshold=2, tie_col="event_id"
    ).to_pandas()
    g = out.groupby(["user_id", "window_start"]).size()
    assert (g <= 2).all()
    # deterministic keeper: earliest (ts, event_id) pair per key/window
    src = events_ds.to_pandas()
    src["window_start"] = (
        src["ts"].astype("datetime64[us]").astype("int64") // (3600 * 10**6) * 3600
    )
    expect = (
        src.sort_values(["ts", "event_id"], kind="stable")
        .groupby(["user_id", "window_start"])
        .head(2)
    )
    assert len(out) == len(expect)
    assert set(out["event_id"]) == set(expect["event_id"])


def test_throttle_gcra(ray_session):
    """Mirrors the reference gcra-crate test (rate_limiter.rs tests:
    LIMIT=3 / WINDOW=1s): a burst of 3 conforms, the 4th is denied,
    and after one full window another conforms. Plus the property that
    distinguishes GCRA from the per-window quota: a steady stream at
    exactly the emission interval all conforms across window edges."""
    import ray.data as rd

    from vertex_ray.stages.ops import throttle_gcra

    base = 1_700_000_000_000_000  # epoch us
    rows = [
        # key a: 4 back-to-back at t=0, one more after window
        ("a", 0, 0), ("a", 0, 1), ("a", 0, 2), ("a", 0, 3),
        ("a", 1_000_000, 4),
        # key b: one event every T = window/3 — all conform forever
        *[("b", i * 333_334, 10 + i) for i in range(7)],
    ]
    t = pa.table({
        "k": [r[0] for r in rows],
        "ts": pa.array([base + r[1] for r in rows],
                       type=pa.timestamp("us")),
        "eid": [r[2] for r in rows],
    })
    out = throttle_gcra(rd.from_arrow(t), "k", "ts", 1, 3, "eid") \
        .to_pandas().sort_values("eid")
    got = dict(zip(out["eid"], out["allowed"]))
    assert [got[i] for i in range(5)] == [True, True, True, False, True]
    assert all(got[10 + i] for i in range(7))


def test_cardinality_budget(events_ds):
    from vertex_ray.stages.cardinality import allowed_values, enforce_limit

    allowed = allowed_values(events_ds, "event_type", "ts", limit=2)
    assert len(allowed) == 2
    # budget = first 2 distinct event types by earliest timestamp
    src = events_ds.to_pandas().sort_values(["ts", "event_type"], kind="stable")
    first_seen = src.drop_duplicates("event_type")["event_type"].tolist()
    assert allowed == set(first_seen[:2])

    dropped = enforce_limit(events_ds, "event_type", allowed, "drop").to_pandas()
    assert set(dropped["event_type"]) == allowed
    blanked = enforce_limit(events_ds, "event_type", allowed, "drop_tag").to_pandas()
    assert len(blanked) == len(src)
    assert set(blanked.loc[~blanked["event_type"].isin(allowed), "event_type"]) <= {""}


def test_enrich_broadcast_lookup(ray_session):
    import ray.data as rd

    from vertex_ray.stages.enrich import enrich

    nation = pd.read_parquet("/root/testdata/sf0.001/nation.parquet")
    lookup = nation.set_index("n_nationkey")[["n_name", "n_regionkey"]]
    cust = rd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    out = enrich(cust, lookup, "c_nationkey", prefix="nation_", concurrency=2).to_pandas()
    assert "nation_n_name" in out.columns
    merged = pd.read_parquet("/root/testdata/sf0.001/customer.parquet").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    assert len(out) == len(merged)
    got = out.sort_values("c_custkey")["nation_n_name"].tolist()
    want = merged.sort_values("c_custkey")["n_name"].tolist()
    assert got == want


def test_metricalize_distributed_matches_oracle(events_ds):
    import duckdb

    from vertex_ray.stages.metricalize import metricalize

    out = metricalize(
        events_ds, ["event_type"], "value", "ts", 60, uppers=[10.0, 50.0]
    ).to_pandas()
    ref = duckdb.sql(
        """
        SELECT event_type,
               (epoch_us(ts) // 60000000) * 60 AS window_start,
               count(*) AS count, min(value) AS min, max(value) AS max,
               arg_max(value, ts) AS last,
               SUM(CASE WHEN value <= 10 THEN 1 ELSE 0 END) AS b00,
               SUM(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS b01
        FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        GROUP BY 1, 2
        """
    ).df()
    a = out.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    b = ref.sort_values(["event_type", "window_start"]).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ("count", "min", "max", "last", "b00", "b01"):
        np.testing.assert_array_equal(
            a[col].to_numpy().astype(np.float64), b[col].to_numpy().astype(np.float64)
        )


def test_sessionize_and_sliding_windows(events_ds):
    import duckdb

    from vertex_ray.stages.windows import sessionize, sliding_count

    sess = sessionize(events_ds, "user_id", "ts", 1800, "event_id").to_pandas()
    ref = duckdb.sql(
        """
        WITH marked AS (
          SELECT user_id, epoch_us(ts) AS t,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
          FROM read_parquet('/root/testdata/sf0.001/events.parquet')
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, sum(ns) AS n_sessions, count(*) AS n_events
        FROM marked GROUP BY 1
        """
    ).df()
    got = sess.groupby("user_id").agg(
        n_sessions=("session_id", "nunique"), n_events=("n_events", "sum")
    ).reset_index()
    a = got.sort_values("user_id").reset_index(drop=True)
    b = ref.sort_values("user_id").reset_index(drop=True)
    assert a["n_sessions"].astype(int).tolist() == b["n_sessions"].astype(int).tolist()
    assert a["n_events"].astype(int).tolist() == b["n_events"].astype(int).tolist()

    sw = sliding_count(events_ds, "event_type", "ts", 300, 60).to_pandas()
    # every sliding count >= the tumbling 60s count it contains
    assert (sw["count"] >= 1).all()
    assert sw.groupby(["event_type", "window_start"]).size().max() == 1


def test_route_split_multi_output(ray_session):
    """route as true multi-output ports (route.rs:73-135): each port is a
    filtered Dataset view; a row can match several ports; non-matching
    rows land on _unmatched only."""
    import pyarrow.compute as pc
    import ray.data as rd

    from vertex_ray.stages.ops import route_split

    t = pa.table({"x": [1, 5, 10, 15, -3], "tag": ["a", "b", "a", "c", "b"]})
    ports = route_split(
        rd.from_arrow(t),
        {
            "big": lambda t: pc.greater(t["x"], 8),
            "tag_a": lambda t: pc.equal(t["tag"], "a"),
        },
    )
    assert set(ports) == {"big", "tag_a", "_unmatched"}
    big = ports["big"].to_pandas()
    tag_a = ports["tag_a"].to_pandas()
    unmatched = ports["_unmatched"].to_pandas()
    assert sorted(big["x"]) == [10, 15]
    assert sorted(tag_a["x"]) == [1, 10]  # x=10 matches BOTH ports
    assert sorted(unmatched["x"]) == [-3, 5]
    # flag columns travel with each port for downstream routing decisions
    assert bool(big[big["x"] == 10]["route_tag_a"].iloc[0])


def test_summarize_summary_kind(ray_session):
    """Summary metric kind: count/sum + exact discrete quantiles per
    (tag, window); quantile index rule = ceil(q*n)-1 of the sorted group
    (matches DuckDB quantile_disc, the oracle)."""
    import ray.data as rd

    from vertex_ray.stages.metricalize import summarize

    ts = pa.array([1_000_000 * s for s in [1, 2, 3, 4, 61, 62]], pa.timestamp("us"))
    t = pa.table(
        {
            "k": ["a", "a", "a", "a", "a", "b"],
            "ts": ts,
            "v": [4.0, 1.0, 3.0, 2.0, 9.0, 7.0],
        }
    )
    out = (
        summarize(rd.from_arrow(t), ["k"], "v", "ts", 60)
        .to_pandas()
        .sort_values(["k", "window_start"])
        .reset_index(drop=True)
    )
    # group (a, 0): sorted [1,2,3,4] -> q50=idx ceil(0.5*4)-1=1 -> 2.0;
    # q90=idx ceil(3.6)-1=3 -> 4.0
    row = out.iloc[0]
    assert row["count"] == 4 and row["sum"] == 10.0
    assert row["q50"] == 2.0 and row["q90"] == 4.0 and row["q99"] == 4.0
    # singleton groups: every quantile is the value itself
    assert out.iloc[1]["q50"] == 9.0 and out.iloc[2]["q99"] == 7.0


def test_bloom_cardinality_matches_exact(events_ds):
    from vertex_ray.stages.cardinality import (
        allowed_bloom,
        allowed_values,
        enforce_limit,
        enforce_limit_bloom,
    )

    exact = enforce_limit(
        events_ds, "user_id",
        allowed_values(events_ds, "user_id", "ts", 40), "drop",
    ).to_pandas()
    bloom = enforce_limit_bloom(
        events_ds, "user_id",
        allowed_bloom(events_ds, "user_id", "ts", 40, n_bytes=1 << 18), "drop",
    ).to_pandas()
    a = exact.sort_values("event_id").reset_index(drop=True)
    b = bloom.sort_values("event_id").reset_index(drop=True)
    assert a["event_id"].tolist() == b["event_id"].tolist()


def test_bloom_fp_one_sided(events_ds):
    """A degenerate 64-byte bloom may ACCEPT over-budget values (false
    positives) but never rejects an in-budget one."""
    from vertex_ray.stages.cardinality import (
        allowed_bloom,
        allowed_values,
        enforce_limit_bloom,
    )

    allowed = allowed_values(events_ds, "user_id", "ts", 10)
    tiny = allowed_bloom(events_ds, "user_id", "ts", 10, n_bytes=64)
    kept = set(
        enforce_limit_bloom(events_ds, "user_id", tiny, "drop")
        .to_pandas()["user_id"]
    )
    assert allowed <= kept


def test_bloom_merge_is_union():
    import numpy as np

    from vertex_ray.stages.cardinality import SplitBlockBloom, _hash_values

    a, b = SplitBlockBloom(1 << 12), SplitBlockBloom(1 << 12)
    ha = _hash_values(np.arange(100, dtype=np.int64))
    hb = _hash_values(np.arange(100, 200, dtype=np.int64))
    a.insert_hashes(ha)
    b.insert_hashes(hb)
    a.merge(b)
    assert a.contains_hashes(np.concatenate([ha, hb])).all()


def test_stratified_sample_truncation_lossless(ray_session):
    """Per-batch partial truncation never changes the global result:
    many tiny blocks == one block."""
    import hashlib

    import ray.data as rd

    from vertex_ray.stages.ops import stratified_sample

    rng = np.random.default_rng(11)
    n = 600
    t = pa.table({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.integers(0, 5, n).astype(str),
    })
    got = (
        stratified_sample(
            rd.from_arrow(t).repartition(20), "g", "id", n_per_group=7)
        .to_pandas()
        .sort_values(["g", "id"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["r"] = [hashlib.md5(str(i).encode()).hexdigest() for i in df["id"]]
    want = (
        df.sort_values(["r", "id"]).groupby("g", sort=False).head(7)
        [["id", "g"]].sort_values(["g", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_mix_proportions_rebalances(ray_session):
    import pandas as pd
    import ray.data as rd

    from vertex_ray.stages.ops import mix_proportions

    # interleaved so id % denom is uniform WITHIN each group (the
    # documented assumption of threshold sampling)
    df = pd.DataFrame({
        "id": range(1000),
        "g": ["big" if i % 5 < 4 else "small" for i in range(1000)],
    })
    out = mix_proportions(
        rd.from_pandas(df), "g", "id", {"big": 0.5, "small": 0.5},
        total_out=400, denom=1000,
    ).to_pandas()
    vc = out["g"].value_counts()
    # 50/50 target from an 80/20 corpus: both groups land near 200
    assert abs(int(vc["big"]) - 200) <= 30
    assert abs(int(vc["small"]) - 200) <= 30
    # deterministic: same call keeps exactly the same ids
    out2 = mix_proportions(
        rd.from_pandas(df), "g", "id", {"big": 0.5, "small": 0.5},
        total_out=400, denom=1000,
    ).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])


def test_late_data_flag_watermark(ray_session):
    import pandas as pd
    import ray.data as rd

    from vertex_ray.stages.windows import late_data_flag

    us = 1_000_000
    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"],
        # arrival order = seq; event times jump back and forth
        "seq": [1, 2, 3, 4, 5, 1],
        "ts": pd.to_datetime(
            [100 * us, 1000 * us, 950 * us,   # 950 within lateness 60 of 1000
             100 * us,                        # 100 < 1000-60 → LATE
             2000 * us,
             50 * us],                        # key b first row: never late
            unit="us"),
    })
    out = (
        late_data_flag(rd.from_pandas(df), "k", "ts", "seq",
                       allowed_lateness_s=60, window_s=100)
        .to_pandas().sort_values(["k", "seq"]).reset_index(drop=True)
    )
    assert out["late"].tolist() == [False, False, False, True, False, False]
    # on-time rows get their tumbling window; the late row gets -1
    assert out["window_start"].tolist() == [100, 1000, 900, -1, 2000, 0]
import numpy as np
import pyarrow as pa
import pytest


def test_epoch_shuffle(ray_session):
    import ray.data as rd

    from vertex_ray.stages.shuffle import epoch_shuffle, shuffle_key

    ids = np.arange(100, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "v": ids * 2}))

    out = epoch_shuffle(ds, "doc_id", seed=7).to_pandas()
    # totality + determinism: a permutation of the input, sorted by key
    assert sorted(out["doc_id"]) == list(range(100))
    k = shuffle_key(out["doc_id"].to_numpy(), 7)
    assert (out["shuffle_key"].to_numpy() == k).all()
    assert (np.diff(out["shuffle_key"].to_numpy()) >= 0).all()
    # actually scrambled (not identity / not reversed)
    assert out["doc_id"].tolist() != list(range(100))
    # different seed -> different order; same seed -> same order
    out2 = epoch_shuffle(ds, "doc_id", seed=8).to_pandas()
    assert out2["doc_id"].tolist() != out["doc_id"].tolist()
    out3 = epoch_shuffle(ds, "doc_id", seed=7).to_pandas()
    assert out3["doc_id"].tolist() == out["doc_id"].tolist()
    # payload stays attached
    assert (out["v"].to_numpy() == out["doc_id"].to_numpy() * 2).all()

    with pytest.raises(ValueError):
        shuffle_key(ids, -1)


def test_span_dedup(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.dedup_near import span_dedup

    docs = pa.table({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [
            "a b c d",          # spans (k=2): "a b", "c d"
            "c d a b",          # both spans already seen -> all dropped
            "a b x y a b",      # "a b" dup; "x y" new; trailing "a b" dup
        ],
    })
    out = (span_dedup(rd.from_arrow(docs), "text", "doc_id", k=2)
           .to_pandas().sort_values(["doc_id", "span_idx"])
           .reset_index(drop=True))
    assert out.values.tolist() == [
        [1, 0, "a b"], [1, 1, "c d"], [3, 1, "x y"]]
