"""Tombstone delete lifecycle (state/tombstones): delete request →
read-time skip with zero rewrite → compaction applies physically →
CleanTombstones. Mirrors the public Prometheus TSDB delete shape; the
reference skips expired entries at read time the same way
(src/sinks/prometheus_exporter.rs:351-356)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from vertex_ray.synth import ensure_transcripts

COLS = ["series_key", "window_start", "count"]


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    trans = ensure_transcripts(0.001, base="/tmp/vertex_ray_testdata")
    out = str(tmp_path_factory.mktemp("tiers_del"))
    from vertex_ray.pipelines.rollup_pipeline import run_pipeline

    run_pipeline(trans, out, n_buckets=4)
    return out


def _read(out, tier="1h", **kw):
    from vertex_ray.read import query_range

    df = query_range(out, tier, metric="turns_total", columns=COLS,
                     **kw).to_pandas()
    return df.sort_values(COLS, kind="stable").reset_index(drop=True)


def test_delete_lifecycle(store):
    from vertex_ray.pipelines.rollup_pipeline import (
        decode_tier_blocks,
        read_stage,
    )
    from vertex_ray.stages.compact import compact_blocks
    from vertex_ray.state.tombstones import (
        add_tombstone,
        clear_tombstones,
        load_tombstones,
    )

    base = _read(store, tombstones=False)
    lo, hi = int(base.window_start.min()), int(base.window_start.max())
    t1, t2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    hit = (base.series_key.str.contains(r"role=assistant\}")
           & base.window_start.between(t1, t2))
    assert hit.any() and (~hit).any()  # the stone is a strict subset

    # 1. delete request → next read (default tombstones=True) skips the
    #    points; nothing on disk but the stone file changed
    add_tombstone(store, metric="turns_total",
                  key_regex=r"role=assistant\}", start=t1, end=t2,
                  tiers=["1h"])
    after = _read(store)
    pd.testing.assert_frame_equal(
        after, base[~hit].reset_index(drop=True))

    # other tiers are untouched (the stone names only 1h)
    assert len(_read(store, tier="1m")) == len(
        _read(store, tier="1m", tombstones=False))

    # 2. compaction applies the stones physically: the compacted blocks
    #    decode to exactly the post-delete view
    stones = load_tombstones(store)
    comp = compact_blocks(read_stage(store, "blocks", "1h"),
                          tombstones=stones)

    def shape(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.invert(t["filled"]), pc.invert(t["stale"]))
        t = t.filter(pc.and_(m, pc.equal(t["name"], "turns_total")))
        t = t.select(COLS)
        i = t.schema.get_field_index("count")
        return t.set_column(i, "count", pc.cast(t["count"], pa.int64()))

    phys = (decode_tier_blocks(comp)
            .map_batches(shape, batch_format="pyarrow").to_pandas()
            .sort_values(COLS, kind="stable").reset_index(drop=True))
    pd.testing.assert_frame_equal(phys, after)

    # 3. CleanTombstones: stones cleared, reads stay stable against the
    #    (hypothetically committed) compacted store
    clear_tombstones(store)
    assert load_tombstones(store) == []
    pd.testing.assert_frame_equal(_read(store), base)  # raw store back


def test_unbounded_stone_prunes_whole_blocks(store):
    """A delete with open time bounds drops matching blocks BEFORE
    decode (block_keep_mask full-coverage rule) — the read returns no
    rows for the matched series and all rows for the rest."""
    base = _read(store, tombstones=False)
    stone = {"metric": "turns_total", "key_regex": r"role=user\}",
             "start": None, "end": None, "tiers": None}
    got = _read(store, tombstones=[stone])
    want = base[~base.series_key.str.contains(r"role=user\}")]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_block_prune_implies_point_delete_property():
    """Safety invariant of the two-level delete: whenever
    block_keep_mask drops a block pre-decode, EVERY point of that block
    would also be dropped by point_keep_mask — pruning can never delete
    more than the stone says."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vertex_ray.state.tombstones import block_keep_mask, point_keep_mask

    stone_st = st.fixed_dictionaries({
        "metric": st.sampled_from([None, "m1", "m2"]),
        "key_regex": st.sampled_from([None, "a", "b", "^m"]),
        "start": st.one_of(st.none(), st.integers(0, 500)),
        "end": st.one_of(st.none(), st.integers(0, 500)),
        "tiers": st.sampled_from([None, ["1m"], ["1h"]]),
    })

    @settings(max_examples=200, deadline=None)
    @given(
        stones=st.lists(stone_st, min_size=1, max_size=3),
        starts=st.lists(st.integers(0, 480), min_size=1, max_size=8),
        spans=st.lists(st.integers(0, 120), min_size=8, max_size=8),
        keys=st.lists(st.sampled_from(["ma", "mb", "xa"]), min_size=8,
                      max_size=8),
    )
    def check(stones, starts, spans, keys):
        n = len(starts)
        bs = np.array(starts, dtype=np.int64)
        be = bs + np.array(spans[:n], dtype=np.int64)
        blocks = pa.table({
            "name": ["m1" if k[0] == "m" else "x1" for k in keys[:n]],
            "series_key": keys[:n],
            "tier": ["1m"] * n,
            "block_start": bs,
            "block_end": be,
        })
        keep_blocks = block_keep_mask(blocks, stones).to_pylist()
        for i, kb in enumerate(keep_blocks):
            if kb:
                continue
            # decode this block: one point per window in its interval
            ws = np.arange(bs[i], be[i] + 1, 60, dtype=np.int64)
            if not len(ws):
                ws = np.array([bs[i]], dtype=np.int64)
            pts = pa.table({
                "name": [blocks["name"][i].as_py()] * len(ws),
                "series_key": [keys[i]] * len(ws),
                "tier": ["1m"] * len(ws),
                "window_start": ws,
            })
            assert not any(point_keep_mask(pts, stones).to_pylist())

    check()


def test_query_range_auto_picks_tier(store):
    from vertex_ray.read import pick_tier, query_range_auto

    assert pick_tier(3600) == "1h" and pick_tier(90) == "1m"
    auto = (query_range_auto(store, 3600, metric="turns_total",
                             columns=COLS, tombstones=False).to_pandas()
            .sort_values(COLS).reset_index(drop=True))
    explicit = _read(store, tier="1h", tombstones=False)
    pd.testing.assert_frame_equal(auto, explicit)


def test_point_keep_mask_fuzz_vs_reference():
    """point_keep_mask == a row-at-a-time reference evaluator for any
    stones and rows (regex matcher semantics: RE2 substring search)."""
    import re

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vertex_ray.state.tombstones import point_keep_mask

    stone_st = st.fixed_dictionaries({
        "metric": st.sampled_from([None, "m1", "m2"]),
        "key_regex": st.sampled_from([None, "a", "b=2", "^k"]),
        "start": st.one_of(st.none(), st.integers(0, 300)),
        "end": st.one_of(st.none(), st.integers(0, 300)),
        "tiers": st.sampled_from([None, ["1m"], ["1h"]]),
    })

    @settings(max_examples=200, deadline=None)
    @given(stones=st.lists(stone_st, min_size=0, max_size=3),
           n=st.integers(1, 12), seed=st.integers(0, 999))
    def check(stones, n, seed):
        rng = np.random.default_rng(seed)
        names = rng.choice(["m1", "m2"], n)
        keys = rng.choice(["ka{b=1}", "ka{b=2}", "xx{b=2}"], n)
        tiers = rng.choice(["1m", "1h"], n)
        ws = rng.integers(0, 300, n)
        t = pa.table({"name": names, "series_key": keys, "tier": tiers,
                      "window_start": ws})

        def ref_drop(i):
            for s in stones:
                if s["tiers"] is not None and tiers[i] not in s["tiers"]:
                    continue
                if s["metric"] is not None and names[i] != s["metric"]:
                    continue
                if (s["key_regex"] is not None
                        and not re.search(s["key_regex"], keys[i])):
                    continue
                if s["start"] is not None and ws[i] < s["start"]:
                    continue
                if s["end"] is not None and ws[i] > s["end"]:
                    continue
                return True
            return False

        got = point_keep_mask(t, stones).to_pylist()
        assert got == [not ref_drop(i) for i in range(n)]

    check()


def test_read_verbs_empty_selector(store):
    """A selector matching nothing must yield 0 rows from every read
    verb — never a schema crash from an empty exchange."""
    from vertex_ray.read import (
        label_cardinality,
        label_values,
        query_range,
        series_metadata,
        tsdb_status,
    )

    assert query_range(store, "1h", metric="nope",
                       columns=COLS).count() == 0
    assert series_metadata(store, "1h", metric="nope").count() == 0
    assert label_values(store, "1h", "no_such_label",
                        metric="turns_total").count() == 0
    assert tsdb_status(store, "1h", metric="nope").count() == 0
    assert label_cardinality(store, "1h", ["no_such_label"],
                             metric="turns_total").count() == 0


def test_federated_replica_dedupe(store):
    """query_range_multi over two replicas of the SAME store: plain
    union doubles rows; dedupe=True reconciles back to exactly the
    single-store answer (earlier store wins per (series, window))."""
    from vertex_ray.read import query_range_multi

    single = _read(store, tombstones=False)
    plain = query_range_multi([store, store], "1h", metric="turns_total",
                              columns=COLS, tombstones=False)
    assert plain.count() == 2 * len(single)
    ha = (query_range_multi([store, store], "1h", metric="turns_total",
                            dedupe=True, columns=COLS, tombstones=False)
          .to_pandas().sort_values(COLS).reset_index(drop=True))
    pd.testing.assert_frame_equal(ha, single)


def test_query_range_offset_modifier(store):
    """PromQL offset: the shifted read returns exactly the unshifted
    values from `offset` seconds earlier, re-stamped into the query
    frame; instant_query threads it through."""
    from vertex_ray.read import instant_query, query_range

    base = _read(store)
    w = sorted(base["window_start"].unique())
    assert len(w) >= 3
    start, end = int(w[1]), int(w[-1])
    off = int(w[1] - w[0])

    got = query_range(store, "1h", metric="turns_total", columns=COLS,
                      start=start, end=end, offset=off).to_pandas()
    got = got.sort_values(COLS, kind="stable").reset_index(drop=True)
    ref = base[(base.window_start >= start - off)
               & (base.window_start <= end - off)].copy()
    ref["window_start"] += off
    ref = ref.sort_values(COLS, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)

    inst = instant_query(store, "1h", at=end, lookback=3600,
                         metric="turns_total", columns=COLS,
                         offset=off).to_pandas()
    inst = inst.sort_values(COLS, kind="stable").reset_index(drop=True)
    iref = base[base.window_start == end - off].copy()
    iref["window_start"] += off
    iref = iref.sort_values(COLS, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(inst, iref)
