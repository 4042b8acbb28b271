"""Whole-store lifecycle integration: one store operated through every
admin phase — epoch ingest → delete (tombstone) → snapshot → compaction
(tombstones applied physically) → CleanTombstones → retention GC — with
the query facade answering identically-correct results at every step.
Each phase is covered by its own unit tests elsewhere; this pins the
COMPOSITION (the sequence a real deployment runs over a week)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TIERS_SMALL = (("1m", 60), ("5m", 300))
E0 = 1_700_000_000 // 3600 * 3600  # aligned epoch base


@pytest.fixture(scope="module")
def lifecycle_transcripts(tmp_path_factory):
    rows = []
    # three conversations across 4 hourly epochs; "c" is the one we delete
    rows += [("a", 0, "user", "t", "", E0 + 10),
             ("a", 1, "assistant", "t", "grep", E0 + 40),
             ("a", 2, "user", "t", "", E0 + 2 * 3600 + 125)]
    rows += [("b", 0, "user", "t", "", E0 + 3590),
             ("b", 1, "assistant", "t", "", E0 + 3605),
             ("b", 2, "user", "t", "", E0 + 3660)]
    rows += [("c", 0, "user", "t", "bash", E0 + 100),
             ("c", 1, "assistant", "t", "", E0 + 150),
             ("c", 2, "user", "t", "", E0 + 3 * 3600 + 500)]
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = (pd.to_datetime(df["ts"], unit="s", utc=True)
                .dt.tz_localize(None).astype("datetime64[us]"))
    p = tmp_path_factory.mktemp("lifecycle") / "transcripts.parquet"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(p))
    return str(p)


def _frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (df.sort_values(list(df.columns), kind="stable")
            .reset_index(drop=True))


def _bitwise_equal(a: pd.DataFrame, b: pd.DataFrame, msg=""):
    assert list(a.columns) == list(b.columns), msg
    assert len(a) == len(b), f"{msg}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        va, vb = a[c].to_numpy(), b[c].to_numpy()
        if va.dtype == np.float64:
            np.testing.assert_array_equal(
                va.view(np.uint64), vb.view(np.uint64), err_msg=f"{msg}:{c}")
        else:
            np.testing.assert_array_equal(va, vb, err_msg=f"{msg}:{c}")


def test_store_lifecycle(ray_session, lifecycle_transcripts, tmp_path):
    from vertex_ray.cli import main
    from vertex_ray.pipelines.epoch_pipeline import (
        read_epochs_stage,
        run_pipeline_epochs,
    )
    from vertex_ray.read import query_range
    from vertex_ray.schema import TIER_SECONDS
    from vertex_ray.stages.compact import compact_blocks
    from vertex_ray.stages.retention import apply_retention
    from vertex_ray.state.checkpoint import write_stage
    from vertex_ray.state.tombstones import (
        add_tombstone,
        clear_tombstones,
        load_tombstones,
    )

    epo = os.path.join(str(tmp_path), "epochs")
    run_pipeline_epochs(lifecycle_transcripts, epo, epoch_seconds=3600,
                        n_buckets=4, tiers=TIERS_SMALL)

    def q(store, layout, **kw):
        return _frame(query_range(store, "1m", metric="turns_total",
                                  layout=layout, **kw))

    # phase 1: baseline read over the live epoch store
    q1 = q(epo, "epochs")
    assert len(q1) > 0
    assert q1["series_key"].str.contains("conv_id=c").any()

    # phase 2: delete conversation "c" — reads hide it immediately
    add_tombstone(epo, metric="turns_total", key_regex=r"conv_id=c[,}]")
    q2 = q(epo, "epochs")
    assert not q2["series_key"].str.contains("conv_id=c").any()
    keep = q1[~q1["series_key"].str.contains("conv_id=c")]
    _bitwise_equal(keep.reset_index(drop=True), q2, "post-delete read")

    # phase 3: snapshot the live store (tombstone file travels with it)
    snap = os.path.join(str(tmp_path), "snap")
    assert main(["snapshot", epo, snap]) == 0
    _bitwise_equal(q(snap, "epochs"), q2, "snapshot read")

    # phase 4: compaction applies the tombstones PHYSICALLY, then
    # CleanTombstones forgets the applied stones
    comp = os.path.join(str(tmp_path), "compacted")
    stones = load_tombstones(epo)
    assert len(stones) == 1
    write_stage(compact_blocks(read_epochs_stage(epo, "blocks"),
                               tombstones=stones),
                os.path.join(comp, "blocks"), {"compacted_from": epo})
    q3 = q(comp, "oneshot")
    _bitwise_equal(q3, q2, "compacted read")
    clear_tombstones(epo)
    assert load_tombstones(epo) == []

    # phase 5: retention GC of the compacted store — only the horizon
    # survives, and surviving rows are bit-identical to the pre-GC read
    now_s = E0 + 4 * 3600
    horizon = 3 * 3600
    gc = os.path.join(str(tmp_path), "gc")
    apply_retention(comp, gc, {"1m": horizon, "5m": horizon}, now_s=now_s,
                    tier_seconds=dict(TIER_SECONDS))
    q4 = q(gc, "oneshot")
    assert len(q4) > 0
    assert int(q4["window_start"].min()) >= now_s - horizon
    expect = q3[q3["window_start"] >= now_s - horizon]
    _bitwise_equal(expect.reset_index(drop=True), q4, "post-GC read")

    # phase 6: the snapshot is immutable — mutate the live store again,
    # the snapshot still answers the phase-2 result
    add_tombstone(epo, metric="turns_total", key_regex=r"conv_id=a[,}]")
    assert not q(epo, "epochs")["series_key"].str.contains("conv_id=a").any()
    _bitwise_equal(q(snap, "epochs"), q2, "snapshot after live mutation")
