"""Distributed spherical k-means: recovers constructed well-separated
clusters and the streaming partial-sum reduction matches a single-node
reference implementation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def separable():
    rng = np.random.default_rng(5)
    d, per = 16, 400
    centers = rng.normal(size=(3, d)) * 4
    vecs = np.concatenate(
        [c + rng.normal(scale=0.05, size=(per, d)) for c in centers])
    labels = np.repeat([0, 1, 2], per)
    return pa.table({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": list(vecs.astype(np.float32)),
        "truth": labels,
    })


def test_kmeans_recovers_separable_clusters(ray_session, separable):
    import ray.data as rd

    from vertex_ray.stages.cluster import kmeans_assign, kmeans_fit

    ds = rd.from_arrow(separable).repartition(8)
    cents = kmeans_fit(ds, "embedding", k=3, iters=6)
    out = kmeans_assign(ds, cents, "embedding", "vec_id").to_pandas()
    m = out.merge(separable.to_pandas()[["vec_id", "truth"]], on="vec_id")
    # accuracy up to label permutation: majority truth per cluster
    acc = (
        m.groupby("cluster")["truth"].transform(lambda s: s == s.mode()[0])
    ).mean()
    assert acc > 0.99
    assert m["cluster"].nunique() == 3


def test_kmeans_streaming_equals_singlenode(ray_session, separable):
    """The distributed per-batch partial-sum Lloyd pass computes the same
    centroids (to fp tolerance) as a plain single-process implementation
    seeded identically."""
    import ray.data as rd

    from vertex_ray.stages.ann import train_centroids
    from vertex_ray.stages.cluster import kmeans_fit

    ds = rd.from_arrow(separable).repartition(5)
    got = kmeans_fit(ds, "embedding", k=3, iters=4)

    vecs = np.stack(separable["embedding"].to_pandas().to_numpy()).astype(
        np.float64)
    cents = train_centroids(ds, "embedding", 3)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(4):
        u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        assign = np.argmax(u @ cents.T, axis=1)
        new = cents.copy()
        for c in range(3):
            mask = assign == c
            if mask.any():
                new[c] = vecs[mask].mean(axis=0)
        cents = new / np.linalg.norm(new, axis=1, keepdims=True)
    assert np.allclose(np.sort(got, axis=0), np.sort(cents, axis=0),
                       atol=1e-8)


def test_pca_fit_project(ray_session):
    import ray.data as rd

    from vertex_ray.stages.cluster import pca_fit, pca_project

    rng = np.random.default_rng(7)
    # anisotropic 8-d data: variance concentrated on a known direction
    base = rng.standard_normal((400, 8))
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    df = pd.DataFrame({"vec_id": range(400),
                       "embedding": [list(r) for r in base]})
    ds = rd.from_pandas(df).repartition(4)
    mean, comps = pca_fit(ds, "embedding", k=2)
    assert comps.shape == (2, 8)
    # components recover the stretched axes (up to sign, which is fixed)
    assert abs(comps[0, 0]) > 0.95 and abs(comps[1, 1]) > 0.9
    assert comps[0, np.abs(comps[0]).argmax()] > 0  # deterministic sign

    out = pca_project(ds, mean, comps, "embedding", "vec_id").to_pandas()
    proj = np.stack(out.sort_values("vec_id")["proj"].to_numpy())
    # projected variance ordered and dominated by the stretched axis
    assert proj[:, 0].var() > proj[:, 1].var() > 0
    # exact equivalence with the numpy reference computation
    want = (base - base.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(proj, want, atol=1e-9)

    # fit is partition-invariant (associative merge of partials)
    mean2, comps2 = pca_fit(rd.from_pandas(df).repartition(1), "embedding", 2)
    np.testing.assert_allclose(mean, mean2, atol=1e-12)
    np.testing.assert_allclose(comps, comps2, atol=1e-9)


def test_semantic_dedup_keeps_far_from_centroid(ray_session):
    import pandas as pd
    import ray.data as rd

    from vertex_ray.stages.dedup_near import semantic_dedup

    # two well-separated clusters on orthogonal axes; in cluster A, vecs
    # 0 and 1 are near-identical (cos > 0.99), vec 2 is distinct
    a = np.array([1.0, 0.02, 0, 0])
    vecs = [a, a + [0, 0.005, 0, 0], [1.0, -0.8, 0, 0]]
    # cluster B filler, fanned 0.25 apart so every pairwise cos < 0.99
    for i in range(7):
        vecs.append([0, 0, 1.0, -0.75 + 0.25 * i])
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [list(map(float, v)) for v in vecs]})
    out = (semantic_dedup(rd.from_pandas(df).repartition(3), "embedding",
                          "vec_id", k=2, iters=4, threshold=0.99)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert len(out) == len(vecs)
    v01 = out.iloc[[0, 1]]
    # exactly one of the near-dup pair survives: the one FARTHER from the
    # centroid (smaller centroid cosine)
    assert sorted(v01["keep"].tolist()) == [False, True]
    kept = v01.loc[v01["keep"], "cosine"].item()
    droppd = v01.loc[~v01["keep"], "cosine"].item()
    assert kept <= droppd
    # the distinct member of the cluster and all of cluster B survive
    assert bool(out.loc[2, "keep"])
    assert out.loc[3:, "keep"].all()


def test_linear_probe_separable(ray_session):
    """Exact recovery on linearly separable clusters; distributed fit
    matches the single-machine normal-equations solve closely."""
    import ray.data as rd

    from vertex_ray.stages.cluster import (
        linear_probe_fit,
        linear_probe_score,
    )

    rng = np.random.default_rng(11)
    centers = np.eye(4) * 10.0  # 4 well-separated classes in 4-d
    y = rng.integers(0, 4, size=400)
    X = centers[y] + rng.normal(0, 0.3, size=(400, 4))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(400), type=pa.int64()),
        "embedding": pa.array(list(X.astype(np.float32))),
        "label": pa.array(y, type=pa.int32()),
    })).repartition(7)

    W, classes = linear_probe_fit(ds, "embedding", "label", n_classes=4)
    out = linear_probe_score(ds, W, "embedding", "vec_id",
                             label_col="label").to_pandas()
    assert out["correct"].all()

    # reference solve on the same (float32-cast) data
    Xd = X.astype(np.float32).astype(np.float64)
    Y = np.eye(4)[y]
    Wref = np.linalg.solve(Xd.T @ Xd + 1e-3 * np.eye(4), Xd.T @ Y)
    assert np.allclose(W, Wref, atol=1e-8)


def test_linear_probe_real_embeddings_above_chance(ray_session):
    import ray.data as rd

    from vertex_ray.stages.cluster import (
        linear_probe_fit,
        linear_probe_score,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    W, _ = linear_probe_fit(ds, "embedding", "label", n_classes=10)
    out = linear_probe_score(ds, W, "embedding", "vec_id",
                             label_col="label").to_pandas()
    acc = out["correct"].mean()
    assert acc > 0.3  # 10 classes -> chance is 0.1


def test_kmeans_int_recovers_separable_clusters(ray_session):
    """Integer Lloyd recovers well-separated clusters and is exactly
    reproducible (int64 sufficient statistics, order-free reduce)."""
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.cluster import kmeans_int_assign, kmeans_int_fit

    rng = np.random.default_rng(5)
    centers = np.array([[1.0] + [0.0] * 7, [0.0] * 7 + [1.0],
                        [0.0, 1.0] + [0.0] * 6])
    vecs, want = [], []
    for i in range(300):
        c = i % 3
        vecs.append(centers[c] + rng.normal(0, 0.05, 8))
        want.append(c)
    t = pa.table({
        "vec_id": pa.array(list(range(300)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    ds = rd.from_arrow(t).repartition(4)
    cents = kmeans_int_fit(ds, "embedding", "vec_id", k=3, iters=5)
    assert cents.dtype == np.int64
    cents2 = kmeans_int_fit(ds, "embedding", "vec_id", k=3, iters=5)
    assert (cents == cents2).all()  # exact reproducibility
    out = kmeans_int_assign(ds, cents, "embedding", "vec_id") \
        .to_pandas().sort_values("vec_id")
    # cluster labels are a permutation of the true ones: purity ≥ 0.95
    import pandas as pd

    df = pd.DataFrame({"got": out["cluster"].to_numpy(),
                       "want": want})
    purity = df.groupby("got")["want"].agg(
        lambda s: s.value_counts().iloc[0]).sum() / len(df)
    assert purity >= 0.95


def test_kmeans_int_empty_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from vertex_ray.stages.cluster import kmeans_int_fit

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="empty input"):
        kmeans_int_fit(rd.from_arrow(empty), "embedding", "vec_id", k=3,
                       iters=2)


def test_ivf_int_topk_exact_properties(ray_session):
    """Integer IVF: deterministic across runs; with nprobe == all
    centroids the result equals exact integer brute-force top-k."""
    import pyarrow as pa
    import ray.data as rd

    from vertex_ray.stages.ann import ivf_int_topk_exact

    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, (200, 16))
    t = pa.table({
        "vec_id": pa.array(list(range(200)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    })
    ds = rd.from_arrow(t).repartition(3)
    kw = dict(n_centroids=4, iters=2, nq=2, topk=5, quant=128)
    a = ivf_int_topk_exact(ds, "embedding", "vec_id", nprobe=4, **kw) \
        .to_pandas().sort_values(["query_vec_id", "score", "vec_id"],
                                 ascending=[True, False, True])
    b = ivf_int_topk_exact(ds, "embedding", "vec_id", nprobe=4, **kw) \
        .to_pandas().sort_values(["query_vec_id", "score", "vec_id"],
                                 ascending=[True, False, True])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # nprobe == n_centroids → exhaustive: equals integer brute force
    xq = np.floor(vecs * 128).astype(np.int64)
    for qid in (0, 1):
        sc = xq @ xq[qid]
        order = np.lexsort((np.arange(200), -sc))[:5]
        got = a[a.query_vec_id == qid]["vec_id"].tolist()
        assert got == list(order), qid


def test_pca_power_int_fit_project(ray_session):
    import ray.data as rd

    from vertex_ray.stages.cluster import (
        pca_fit, pca_power_int_fit, pca_power_int_project,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 8))
    base[:, 2] *= 8.0  # dominant axis
    df = pd.DataFrame({"vec_id": range(300),
                       "embedding": [list(r) for r in base]})
    ds = rd.from_pandas(df).repartition(4)
    n, s, v = pca_power_int_fit(ds, "embedding")
    assert n == 300 and s.dtype == np.int64 and v.dtype == np.int64
    # deterministic sign: largest-|entry| coordinate positive
    assert v[np.abs(v).argmax()] > 0
    # the integer direction aligns with the float top component
    _, comps = pca_fit(ds, "embedding", k=1)
    cos = abs(v @ comps[0]) / (np.linalg.norm(v) * np.linalg.norm(comps[0]))
    assert cos > 0.99

    # fit is partition-invariant (int partials merge order-free, exactly)
    n1, s1, v1 = pca_power_int_fit(
        rd.from_pandas(df).repartition(1), "embedding")
    assert n1 == n and np.array_equal(s1, s) and np.array_equal(v1, v)

    out = pca_power_int_project(ds, n, s, v, "embedding", "vec_id") \
        .to_pandas().sort_values("vec_id")
    # exact integer reference
    xq = np.floor(base * 128).astype(np.int64)
    want = (n * xq - s) @ v
    np.testing.assert_array_equal(out["proj"].to_numpy(), want)


def test_lsh_near_pairs_md5(ray_session):
    import ray.data as rd

    from vertex_ray.stages.ann import lsh_near_pairs_md5

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    # plant 3 near-dup pairs (ids 100/101, 102/103, 104/105)
    vecs = list(base)
    ids = list(range(40))
    for k in range(3):
        v = rng.standard_normal(64)
        vecs += [v, v + rng.standard_normal(64) * 0.05]
        ids += [100 + 2 * k, 101 + 2 * k]
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [list(v) for v in vecs]})
    out = lsh_near_pairs_md5(
        rd.from_pandas(df).repartition(3), "embedding", "vec_id"
    ).to_pandas()
    got = {tuple(r) for r in out[["a", "b"]].to_numpy()}
    assert {(100, 101), (102, 103), (104, 105)} <= got
    # verified pairs satisfy the integer cosine bound exactly
    xq = {i: np.floor(np.asarray(v) * 128).astype(np.int64)
          for i, v in zip(ids, vecs)}
    for _, r in out.iterrows():
        d = int(xq[r["a"]] @ xq[r["b"]])
        assert d == r["dot"] and d >= 0
        assert 400 * d * d >= 81 * int(xq[r["a"]] @ xq[r["a"]]) * int(
            xq[r["b"]] @ xq[r["b"]])
    # partition-invariant
    out2 = lsh_near_pairs_md5(
        rd.from_pandas(df).repartition(1), "embedding", "vec_id"
    ).to_pandas()
    assert got == {tuple(r) for r in out2[["a", "b"]].to_numpy()}


def test_brute_force_topk_int_tie_break_across_batches(ray_session):
    """Many candidates tie on score: the per-batch top-k must keep the
    lowest vec_ids (the merge's and the SQL oracle's tie-break), not an
    arbitrary argpartition subset."""
    import ray.data as rd

    from vertex_ray.stages.ann import brute_force_topk_int

    # 40 vectors all IDENTICAL → every dot ties; ids shuffled across
    # partitions so argpartition order ≠ id order
    ids = [17, 3, 25, 8, 31, 1, 14, 22, 6, 38, 12, 29, 4, 35, 9, 19,
           27, 0, 33, 11, 24, 7, 36, 2, 15, 28, 5, 39, 13, 21, 30, 10,
           18, 34, 23, 16, 37, 20, 32, 26]
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [[1, 0, 1, 0]] * len(ids)})
    out = brute_force_topk_int(
        rd.from_pandas(df).repartition(5),
        np.array([[1, 0, 1, 0]]), np.array([77]), 5,
        "embedding", "vec_id").to_pandas().sort_values("rank")
    assert out["vec_id"].tolist() == [0, 1, 2, 3, 4]
    assert (out["query_id"] == 77).all()
    assert (out["score"] == 2).all()
