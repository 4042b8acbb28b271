"""Virtual fill runs (kernel.fill_runs / pack_arrays_virtual) must be a
lossless re-representation of the materialized fill path: expansion back
to the dense layout — at the packed table, the agg sink, and the decoded
block level — is bit-for-bit identical, and the block metadata
(block_start / block_end / n_points) keeps its dense semantics."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from vertex_ray.schema import TIERS
from vertex_ray.stages.encode import GorillaEncode, decode_blocks_batch
from vertex_ray.stages.fill import expand_packed, unpack_series
from vertex_ray.stages.kernel import (
    bucket_kernel,
    concat_agg,
    fill_arrays,
    fill_runs,
    pack_arrays,
    pack_arrays_virtual,
    sort_agg,
    window_agg,
)
from vertex_ray.synth import generate_transcripts


def _kernel_packed(n_turns=6000, tiers=TIERS):
    """One bucket's virtual-packed output over synthetic transcripts."""
    from vertex_ray.stages.derive import project_for_rollup_fast

    t = generate_transcripts(n_turns)
    fast = project_for_rollup_fast(t, n_buckets=1)
    end = int(t["ts"].cast("int64").to_numpy().max() // 1_000_000)
    return bucket_kernel(
        fast["conv_id"].to_numpy(zero_copy_only=False),
        fast["conv_hash"].to_numpy(),
        fast["turn_idx"].to_numpy(),
        fast["role_code"].to_numpy(),
        fast["tool_code"].to_numpy(),
        fast["ts"].cast(pa.int64()).to_numpy(),
        tiers,
        end,
        0,
        1,
    )


def _agg_from_obs(uid, ts_s, vals, hist, window_seconds=60):
    ts_us = np.asarray(ts_s, dtype=np.int64) * 1_000_000
    return window_agg(
        np.asarray(uid, dtype=np.int64), ts_us,
        np.asarray(vals, dtype=np.float64), window_seconds, hist)


def _assert_tables_bit_identical(a: pa.Table, b: pa.Table):
    assert a.schema.names == b.schema.names
    assert a.num_rows == b.num_rows
    for name in a.schema.names:
        ca, cb = a[name].combine_chunks(), b[name].combine_chunks()
        if pa.types.is_list(ca.type):
            va = ca.flatten().to_numpy(zero_copy_only=False)
            vb = cb.flatten().to_numpy(zero_copy_only=False)
            la = pa.compute.list_value_length(ca).to_numpy(zero_copy_only=False)
            lb = pa.compute.list_value_length(cb).to_numpy(zero_copy_only=False)
            np.testing.assert_array_equal(la, lb, err_msg=f"{name} lengths")
            if va.dtype.kind == "f":
                np.testing.assert_array_equal(
                    va.view(np.uint64), vb.view(np.uint64), err_msg=name)
            else:
                np.testing.assert_array_equal(va, vb, err_msg=name)
        elif pa.types.is_floating(ca.type):
            np.testing.assert_array_equal(
                ca.to_numpy(zero_copy_only=False).view(np.uint64),
                cb.to_numpy(zero_copy_only=False).view(np.uint64),
                err_msg=name)
        else:
            assert ca.equals(cb), name


def _dense_and_virtual(agg, window_seconds=60, end_window=None):
    agg = sort_agg(agg)
    if end_window is None:
        end_window = int(agg["window"].max()) if len(agg["window"]) else 0
    conv_strs = np.array([f"c{i}" for i in range(1 << 8)], dtype=object)
    dense = pack_arrays(
        fill_arrays(agg, window_seconds, end_window), conv_strs, 7)
    codes = fill_runs(agg, window_seconds, end_window)
    virt = pack_arrays_virtual(agg, codes, conv_strs, 7, window_seconds)
    return dense, virt


def test_expand_packed_matches_dense_pack():
    # three series: a counter with gaps, a gauge, a histogram — all with
    # trailing windows so stale markers appear
    base = np.int64(1) << np.int64(40)
    obs = []
    obs.append(_agg_from_obs([2 << 8] * 3, [0, 70, 2000], [1, 1, 1], False))
    g_uid = int(3 * base) + (5 << 8)
    obs.append(_agg_from_obs([g_uid] * 3, [10, 700, 1500], [4, 7, 2], False))
    h_uid = int(2 * base) + (9 << 8)
    obs.append(_agg_from_obs([h_uid] * 4, [5, 65, 1000, 1100],
                             [0.1, 3.0, 0.5, 9.9], True))
    agg = concat_agg(obs)
    dense, virt = _dense_and_virtual(agg, 60, 2400)
    got = expand_packed(virt)
    _assert_tables_bit_identical(got, dense)


def test_unpack_series_expands_virtual():
    packed = _kernel_packed(4000)
    assert "runs" in packed.schema.names
    flat_virtual = unpack_series(packed)
    flat_dense = unpack_series(expand_packed(packed))
    _assert_tables_bit_identical(flat_virtual, flat_dense)
    # fills/stales really exist in this workload
    assert pa.compute.any(flat_virtual["filled"]).as_py()
    assert pa.compute.any(flat_virtual["stale"]).as_py()


def test_sparse_agg_sink_roundtrip():
    """unpack_series(sparse_fills=True) + expand_agg_table == the dense
    unpack, bit-for-bit — the agg store's virtual-fill write/read
    contract. Also holds across an arbitrary row split (expansion is
    row-local) and under dict_encode after an undict pass."""
    from vertex_ray.pipelines.rollup_pipeline import undict_table
    from vertex_ray.stages.fill import expand_agg_table

    packed = _kernel_packed(4000)
    dense = unpack_series(packed)
    sparse = unpack_series(packed, sparse_fills=True)
    assert sparse.num_rows < dense.num_rows
    _assert_tables_bit_identical(expand_agg_table(sparse), dense)
    # split the sparse table mid-stream: per-batch expansion must concat
    # to the same dense table
    cut = sparse.num_rows // 3
    parts = [expand_agg_table(sparse.slice(0, cut)),
             expand_agg_table(sparse.slice(cut))]
    _assert_tables_bit_identical(pa.concat_tables(parts).combine_chunks(),
                                 dense)
    # dict-encoded write path → undict → expand
    sparse_d = unpack_series(packed, dict_encode=True, sparse_fills=True)
    _assert_tables_bit_identical(
        expand_agg_table(undict_table(sparse_d)), dense)


def test_encode_decode_virtual_matches_dense():
    packed = _kernel_packed(4000)
    enc = GorillaEncode()
    v3 = enc(packed)
    dense = enc(expand_packed(packed))
    # block metadata keeps dense semantics
    for col in ("series_key", "tier", "block_start", "block_end", "n_points"):
        assert v3[col].equals(dense[col]), col
    # the virtual blocks carry fewer stream bytes
    def payload(t):
        return int(pa.compute.sum(
            pa.compute.binary_length(t["val_blocks"].combine_chunks()
                                     .flatten())).as_py())
    assert payload(v3) < payload(dense)
    da, db = decode_blocks_batch(v3), decode_blocks_batch(dense)
    _assert_tables_bit_identical(da, db)


def test_decode_mixed_v2_v3_batch():
    packed = _kernel_packed(2500)
    enc = GorillaEncode()
    v3 = enc(packed)
    dense = enc(expand_packed(packed))
    # interleave: even rows virtual, odd rows dense
    n = v3.num_rows
    take_v3 = list(range(0, n, 2))
    take_v2 = list(range(1, n, 2))
    mixed = pa.concat_tables([v3.take(take_v3), dense.take(take_v2)])
    got = decode_blocks_batch(mixed).to_pandas().sort_values(
        ["tier", "series_key", "window_start"], kind="stable").reset_index(drop=True)
    want = decode_blocks_batch(dense).to_pandas().sort_values(
        ["tier", "series_key", "window_start"], kind="stable").reset_index(drop=True)
    assert len(got) == len(want)
    for col in want.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(a.view(np.uint64), b.view(np.uint64),
                                          err_msg=col)
        else:
            np.testing.assert_array_equal(a, b, err_msg=col)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                    # metric: counter/hist/gauge
            st.integers(0, 3),                    # sub code
            st.lists(st.integers(0, 5000), min_size=1, max_size=12,
                     unique=True),                # observation seconds
        ),
        min_size=1, max_size=6,
    ),
    st.integers(4000, 8000),                      # global end second
)
def test_virtual_fill_property(series_spec, end_s):
    base = np.int64(1) << np.int64(40)
    metric_of = {0: 0, 1: 2, 2: 3}  # counter, histogram, gauge metrics
    parts = []
    for m, sub, secs in series_spec:
        metric = metric_of[m]
        uid = int(metric * base) + (sub << 8)
        vals = [float((s % 7) + 0.5) for s in secs]
        parts.append(_agg_from_obs([uid] * len(secs), sorted(secs), vals,
                                   metric == 2))
    agg = concat_agg(parts)
    end_window = end_s // 60 * 60
    dense, virt = _dense_and_virtual(agg, 60, end_window)
    _assert_tables_bit_identical(expand_packed(virt), dense)
    # and through encode/decode with a tier column
    enc = GorillaEncode()
    tcol = lambda t: t.append_column(
        "tier", pa.array(["1m"] * t.num_rows, type=pa.string()))
    _assert_tables_bit_identical(
        decode_blocks_batch(enc(tcol(virt))),
        decode_blocks_batch(enc(tcol(dense))),
    )


def test_decode_pre_runs_column_store():
    """Block rows written before the runs column existed (old committed
    stores) must decode unchanged — absence of the column means dense."""
    packed = _kernel_packed(2000)
    enc = GorillaEncode()
    dense = enc(expand_packed(packed))
    legacy = dense.drop_columns(["runs"])
    got = decode_blocks_batch(legacy)
    want = decode_blocks_batch(dense)
    _assert_tables_bit_identical(got, want)


def test_oversize_horizon_falls_back_to_dense():
    """A horizon spanning more fill windows than the 15-bit run code can
    hold (fine windows + long staleness) must NOT abort: bucket_kernel
    routes the whole call to the materialized fill_arrays/pack_arrays
    layout, which decode_blocks reads as a v2 (dense) store."""
    import numpy as np

    from vertex_ray.stages.kernel import bucket_kernel, runs_encodable

    assert runs_encodable(60) and not runs_encodable(1, 50_000)
    conv = np.array(["c1", "c1", "c2"], dtype=object)
    h = np.array([1, 1, 2], dtype=np.uint64)
    args = (conv, h, np.array([0, 1, 0]), np.array([1, 2, 1]),
            np.array([0, 0, 3]),
            np.array([0, 2_000_000, 65_000_000], dtype=np.int64))
    dense = bucket_kernel(*args, (("1s", 1),), 70, 0,
                          horizon_seconds=50_000)
    assert "runs" not in dense.schema.names
    assert "flags" in dense.schema.names
    virt = bucket_kernel(*args, (("1s", 1),), 70, 0)
    assert "runs" in virt.schema.names
    # empty groups pick the SAME layout as non-empty ones (one Dataset
    # schema per run)
    empty = bucket_kernel(np.array([], dtype=object),
                          np.array([], np.uint64), np.array([], np.int64),
                          np.array([], np.int64), np.array([], np.int64),
                          np.array([], np.int64), (("1s", 1),), 70, 0,
                          horizon_seconds=50_000)
    assert empty.schema.names == dense.schema.names
