"""As-of and range join kernels: constructed boundary cases (equal-ts
matches, tie-breaks, unmatched keys, window edges) + cross-bucket safety."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ts(us):
    return pa.array(np.asarray(us, dtype=np.int64), type=pa.timestamp("us"))


def test_asof_join_basic(ray_session):
    import ray.data as rd

    from vertex_ray.stages.joins import asof_join

    left = pa.table({
        "eid": [1, 2, 3, 4, 5],
        "k": [10, 10, 10, 20, 30],
        "t": _ts([100, 200, 50, 500, 7]),
    })
    right = pa.table({
        "rid": [101, 102, 103, 201],
        "k": [10, 10, 10, 20],
        "t": _ts([100, 150, 400, 450]),
    })
    out = (
        asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key=("k", "k"), ts=("t", "t"),
            left_cols=["eid"], right_cols=["rid"], right_tiebreak="rid",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("eid")
    )
    # eid=1 t=100 -> rid=101 (equal ts matches); eid=2 t=200 -> rid=102;
    # eid=3 t=50 -> no right row at/before -> dropped; eid=4 t=500 -> 201;
    # eid=5 key 30 has no right side -> dropped
    assert out["eid"].tolist() == [1, 2, 4]
    assert out["rid"].tolist() == [101, 102, 201]


def test_asof_join_tiebreak_deterministic(ray_session):
    import ray.data as rd

    from vertex_ray.stages.joins import asof_join

    right = pa.table({
        "rid": [7, 9, 8],
        "k": [1, 1, 1],
        "t": _ts([100, 100, 100]),  # three right rows tie on (key, ts)
    })
    left = pa.table({"eid": [1], "k": [1], "t": _ts([100])})
    out = asof_join(
        rd.from_arrow(left), rd.from_arrow(right),
        key=("k", "k"), ts=("t", "t"),
        left_cols=["eid"], right_cols=["rid"], right_tiebreak="rid",
    ).to_pandas()
    assert out["rid"].tolist() == [9]  # max tiebreak wins


def test_range_join_window_edges(ray_session):
    import ray.data as rd

    from vertex_ray.stages.joins import range_join

    # window [r.t, r.t + 100): left at r.t matches, left at r.t+100 does not
    right = pa.table({"rid": [1], "k": [5], "t": _ts([1000])})
    left = pa.table({
        "eid": [1, 2, 3, 4, 5],
        "k": [5, 5, 5, 5, 6],
        "t": _ts([999, 1000, 1099, 1100, 1000]),
    })
    out = (
        range_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key=("k", "k"), ts=("t", "t"),
            left_cols=["eid"], right_cols=["rid"], window_us=100,
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert out["eid"].tolist() == [2, 3]


def test_range_join_multi_match_expansion(ray_session):
    import ray.data as rd

    from vertex_ray.stages.joins import range_join

    # two overlapping windows for the same key -> a probe inside both
    # matches twice; keys hash to different buckets and never cross
    right = pa.table({"rid": [1, 2, 3], "k": [5, 5, 9], "t": _ts([0, 50, 50])})
    left = pa.table({"eid": [10, 11], "k": [5, 9], "t": _ts([60, 60])})
    out = (
        range_join(
            rd.from_arrow(left), rd.from_arrow(right),
            key=("k", "k"), ts=("t", "t"),
            left_cols=["eid"], right_cols=["rid"], window_us=100,
            n_buckets=8,
        )
        .to_pandas()
        .sort_values(["eid", "rid"])
    )
    assert list(map(tuple, out[["eid", "rid"]].to_numpy())) == [
        (10, 1), (10, 2), (11, 3)]


def test_joins_match_duckdb_sf0001(ray_session):
    """Whole-operator equivalence vs DuckDB on the sf0.001 tables."""
    import duckdb

    from vertex_ray.pipelines.op_queries import (
        SQL_ASOF_JOIN_EVENTS,
        SQL_RANGE_JOIN_EVENTS,
        q_asof_join_events,
        q_range_join_events,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{sf}/{t}.parquet')")
    for fn, sql in ((q_asof_join_events, SQL_ASOF_JOIN_EVENTS),
                    (q_range_join_events, SQL_RANGE_JOIN_EVENTS)):
        mine = fn(sf).to_pandas()
        want = con.sql(sql).df()
        cols = sorted(mine.columns)
        assert cols == sorted(want.columns)
        a = mine[cols].sort_values(cols).reset_index(drop=True)
        b = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hash_join_inner_dup_keys(ray_session):
    import ray.data as rd

    from vertex_ray.stages.join import hash_join

    left = pa.table({"k": [1, 1, 2, 3], "lv": [10, 11, 20, 30]})
    right = pa.table({"k": [1, 1, 4], "rv": [100, 101, 400]})
    out = (
        hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                  n_buckets=4)
        .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    )
    # dup keys on both sides -> full cartesian per key (2x2=4 for k=1)
    assert out["k"].tolist() == [1, 1, 1, 1]
    assert out["lv"].tolist() == [10, 10, 11, 11]
    assert out["rv"].tolist() == [100, 101, 100, 101]


def test_hash_join_left_outer_nulls(ray_session):
    import ray.data as rd

    from vertex_ray.stages.join import hash_join

    left = pa.table({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pa.table({"k": [2], "rv": [200]})
    out = (
        hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                  how="left", n_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3]
    assert out["rv"].fillna(-1).tolist() == [-1, 200, -1]


def test_topk_per_group_combiner_safe(ray_session):
    """Result is identical however rows split across input blocks, because
    each block keeps its own top-k per group before the exchange."""
    import ray.data as rd

    from vertex_ray.stages.ops import topk_per_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.integers(0, 4, 200),
        "v": rng.integers(0, 20, 200).astype(np.float64),  # many value ties
        "id": np.arange(200),
    })
    expect = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g").head(3).sort_values(["g", "v", "id"],
                                          ascending=[True, False, True])
        .reset_index(drop=True)
    )
    for nblocks in (1, 7):
        out = (
            topk_per_group(
                rd.from_pandas(df).repartition(nblocks), "g", "v", 3, "id")
            .to_pandas().sort_values(["g", "v", "id"],
                                     ascending=[True, False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[["g", "v", "id"]], expect[["g", "v", "id"]],
            check_dtype=False)


def test_decontaminate_flags_overlap(ray_session):
    import ray.data as rd

    from vertex_ray.stages.text import decontaminate

    bench = pd.DataFrame({
        "doc_id": [100],
        "text": ["the quick brown fox jumps"],
    })
    cand = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a sentence with the quick brown fox inside it",  # contaminated
            "completely novel words only here",               # clean
            "",                                               # empty: 0 grams
            "quick brown",                                    # short-doc gram, no match
        ],
    })
    out = (
        decontaminate(rd.from_pandas(cand), rd.from_pandas(bench),
                      "text", "doc_id", k=3, min_overlap=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [True, False, False, False]
    assert out.loc[0, "n_overlap"] >= 2  # 'the quick brown','quick brown fox'
    assert out.loc[2, "n_grams"] == 0


def test_hash_join_property_vs_pandas(ray_session):
    """Randomized equivalence: hash_join == pandas merge for inner and left,
    including duplicate keys, missing keys on either side, and a hot key
    holding ~1/3 of all rows (skew lands in one bucket — correctness must
    not depend on balance)."""
    import ray.data as rd

    from vertex_ray.stages.join import hash_join

    rng = np.random.default_rng(11)
    for trial in range(5):
        nl, nr = rng.integers(1, 120, 2)
        lk = rng.integers(0, 12, nl)
        lk[: nl // 3] = 3  # hot key
        rk = rng.integers(5, 17, nr)  # partial overlap
        left = pd.DataFrame({"k": lk, "lv": rng.integers(0, 100, nl)})
        right = pd.DataFrame({"k": rk, "rv": rng.integers(0, 100, nr)})
        for how in ("inner", "left"):
            got = (
                hash_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right).repartition(2),
                          "k", how=how, n_buckets=4)
                .to_pandas()
            )
            want = left.merge(right, on="k", how=how)
            key = ["k", "lv", "rv"]
            got = got.sort_values(key).reset_index(drop=True)
            want = want.sort_values(key).reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[key], want[key], check_dtype=False)


def test_hash_join_semi_anti(ray_session):
    import ray.data as rd

    from vertex_ray.stages.join import hash_join

    left = pa.table({"k": [1, 1, 2, 3, 4], "lv": [10, 11, 20, 30, 40]})
    right = pa.table({"k": [1, 1, 3, 9], "rv": [0, 0, 0, 0]})
    semi = (hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                      how="semi", n_buckets=4)
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    # each matching LEFT row exactly once, duplicate right keys don't fan out
    assert list(map(tuple, semi[["k", "lv"]].to_numpy())) == [
        (1, 10), (1, 11), (3, 30)]
    assert "rv" not in semi.columns
    anti = (hash_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                      how="anti", n_buckets=4)
            .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True))
    assert list(map(tuple, anti[["k", "lv"]].to_numpy())) == [
        (2, 20), (4, 40)]


def test_hash_join_skewed_equals_plain(ray_session):
    """Skew-aware plan == plain plan on every mode, with a genuinely hot
    key (40% of left rows) detected by the Misra-Gries probe."""
    import ray.data as rd

    from vertex_ray.stages.join import hash_join, hash_join_skewed

    rng = np.random.default_rng(13)
    nl = 500
    lk = rng.integers(0, 50, nl)
    lk[: nl * 2 // 5] = 7  # hot key
    left = pd.DataFrame({"k": lk, "lv": np.arange(nl)})
    right = pd.DataFrame({"k": np.arange(0, 60, 2), "rv": np.arange(30)})
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right).repartition(2)
    for how in ("inner", "left", "semi", "anti"):
        plain = (hash_join(rd.from_pandas(left), rd.from_pandas(right), "k",
                           how=how, n_buckets=4).to_pandas())
        skewed = (hash_join_skewed(lds, rds, "k", how=how, n_buckets=4,
                                   hot_fraction=0.05).to_pandas())
        cols = sorted(plain.columns)
        assert cols == sorted(skewed.columns), how
        a = plain[cols].sort_values(cols).reset_index(drop=True)
        b = skewed[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False), how

    # explicit hot_keys short-circuits the probe
    explicit = hash_join_skewed(lds, rds, "k", hot_keys=[7],
                                n_buckets=4).to_pandas()
    plain = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                      "k", n_buckets=4).to_pandas()
    assert len(explicit) == len(plain)
