"""Oracles for distributed k-means and SemDeDup semantic dedup:
planted Gaussian blobs must be recovered, planted near-duplicate pairs
must collapse to the lowest id, and results must be partition- and
concurrency-invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.similarity import kmeans_fit, semantic_dedup


def _blobs(rng, n_per=40, k=4, d=16, spread=0.05):
    """k well-separated unit-vector blobs; returns (ids, X, labels)."""
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, n_per, axis=0) + rng.normal(
        scale=spread, size=(k * n_per, d))
    labels = np.repeat(np.arange(k), n_per)
    ids = np.arange(k * n_per)
    return ids, X.astype(np.float32), labels


def _ds(ids, X, parts=4):
    import ray.data as rd

    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([row.tolist() for row in X],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(parts)


def test_kmeans_recovers_planted_blobs(ray_session):
    rng = np.random.default_rng(42)
    ids, X, labels = _blobs(rng)
    assigned, cents, inertia = kmeans_fit(_ds(ids, X), n_clusters=4,
                                          iters=5, sample_size=1000)
    df = assigned.to_pandas().sort_values("vec_id")
    # each planted blob maps to exactly one learned cluster (purity 1)
    purity = df.groupby(pd.Series(labels, name="truth"))["cluster"] \
        .nunique()
    assert (purity == 1).all()
    assert df["cluster"].nunique() == 4
    assert cents.shape == (4, 16)
    # unit centroids; low inertia on tight blobs
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0,
                               rtol=1e-5)
    assert inertia / len(ids) < 0.05


def test_kmeans_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    ids, X, _ = _blobs(rng, n_per=25, k=3)
    outs = []
    for parts in (1, 8):
        assigned, cents, inertia = kmeans_fit(
            _ds(ids, X, parts), n_clusters=3, iters=4, sample_size=1000)
        outs.append((assigned.to_pandas().sort_values("vec_id")
                     .reset_index(drop=True), cents, inertia))
    # assignments (the semantic output) must be identical; centroids
    # only to float tolerance — per-batch partial sums differ bitwise
    # under different partitionings, by construction of float addition
    pd.testing.assert_frame_equal(outs[0][0][["vec_id", "cluster"]],
                                  outs[1][0][["vec_id", "cluster"]])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)
    assert abs(outs[0][2] - outs[1][2]) < 1e-3


def test_kmeans_invariant_when_sample_smaller_than_table(ray_session):
    """Regression (r3 review): with sample_size < n_rows the init
    sample must be the deterministic min-hash prefix, not whatever
    blocks limit() saw first — assignments must not move with the
    partitioning."""
    rng = np.random.default_rng(29)
    ids, X, _ = _blobs(rng, n_per=40, k=3)  # 120 rows
    outs = []
    for parts in (1, 9):
        assigned, cents, _ = kmeans_fit(_ds(ids, X, parts), n_clusters=3,
                                        iters=4, sample_size=40,
                                        with_inertia=False)
        outs.append((assigned.to_pandas().sort_values("vec_id")
                     .reset_index(drop=True), cents))
    pd.testing.assert_frame_equal(outs[0][0][["vec_id", "cluster"]],
                                  outs[1][0][["vec_id", "cluster"]])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-5)


def test_semdedup_string_ids(ray_session):
    """Regression (r3 review): id_col is generic — string ids must
    work and dup_of must carry the shadowing STRING id."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    X = np.vstack([base, base + 1e-4, rng.normal(size=8)]) \
        .astype(np.float32)
    t = pa.table({
        "url": pa.array(["a.example", "b.example", "c.example"]),
        "embedding": pa.array([r.tolist() for r in X],
                              pa.list_(pa.float32())),
    })
    out = semantic_dedup(rd.from_arrow(t), n_clusters=1, threshold=0.99,
                         iters=2, id_col="url").to_pandas() \
        .set_index("url").sort_index()
    assert bool(out.loc["a.example", "keep"])
    assert not bool(out.loc["b.example", "keep"])
    assert out.loc["b.example", "dup_of"] == "a.example"
    assert out.loc[out["keep"], "dup_of"].isna().all()


def test_semdedup_collapses_planted_pairs(ray_session):
    rng = np.random.default_rng(3)
    ids, X, _ = _blobs(rng, n_per=30, k=3, spread=0.08)
    # plant near-dups: ids 1000+i is a tiny perturbation of row i
    dup_src = [0, 31, 62, 5]
    dup_ids = np.array([1000 + i for i in range(len(dup_src))])
    dups = X[dup_src] + rng.normal(scale=1e-3,
                                   size=(len(dup_src), X.shape[1]))
    all_ids = np.concatenate([ids, dup_ids])
    all_X = np.vstack([X, dups.astype(np.float32)])
    # threshold above any natural in-blob pair (spread 0.08 → cos ≈
    # 0.9) but below the planted perturbations (1e-3 noise → ≈ 0.9999)
    out = semantic_dedup(_ds(all_ids, all_X, 5), n_clusters=3,
                         threshold=0.995, iters=4).to_pandas() \
        .set_index("vec_id").sort_index()
    # every planted dup is dropped, shadowed by its (lower-id) source
    for src, did in zip(dup_src, dup_ids):
        assert not out.loc[did, "keep"], did
        assert out.loc[did, "dup_of"] == src
        assert out.loc[src, "keep"]
    assert out["keep"].sum() == len(ids)  # only the originals survive
    # kept rows carry null dup_of
    assert out.loc[out["keep"], "dup_of"].isna().all()


def test_semdedup_partition_invariant_and_cap(ray_session):
    rng = np.random.default_rng(11)
    ids, X, _ = _blobs(rng, n_per=20, k=2)
    outs = [
        semantic_dedup(_ds(ids, X, p), n_clusters=2, threshold=0.95,
                       iters=3).to_pandas()
        .sort_values("vec_id").reset_index(drop=True)
        for p in (1, 6)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    with pytest.raises(Exception, match="max_cluster"):
        semantic_dedup(_ds(ids, X, 2), n_clusters=1, threshold=0.95,
                       iters=1, max_cluster=10).materialize()


def test_grouped_vector_mean_partition_invariant(ray_session):
    import ray.data as rdm
    from maestro_ray.ops.similarity import grouped_vector_mean

    rng = np.random.default_rng(13)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    labels = np.repeat([0, 1, 2], 20)
    t = pa.table({
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array([r.tolist() for r in X] ,
                              pa.list_(pa.float32())),
    })
    outs = []
    for parts in (1, 7):
        o = grouped_vector_mean(rdm.from_arrow(t).repartition(parts),
                                "label", "embedding", round_to=6)
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # exact vs numpy (round 6)
    for lbl in (0, 1, 2):
        exp = X[labels == lbl].astype(np.float64).mean(axis=0).round(6)
        got = outs[0][outs[0].label == lbl].sort_values("dim")["avg_val"] \
            .to_numpy()
        np.testing.assert_allclose(got, exp, atol=2e-6)
    assert list(outs[0].columns) == ["label", "dim", "avg_val"]
    assert outs[0]["dim"].min() == 1  # 1-based, the SQL convention
