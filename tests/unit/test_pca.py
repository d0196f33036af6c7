"""Covariance / PCA (ops/similarity.py): exact-vs-numpy oracle,
orthonormality, determinism across partitionings."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.similarity import (
    covariance_matrix,
    pca_fit,
    pca_project,
)

RNG = np.random.default_rng(7)
N, D = 200, 6
X = (RNG.normal(size=(N, D)) @ np.diag([5, 3, 2, 1, 0.5, 0.1])
     + RNG.normal(size=D))


def _ds(blocks=4):
    t = pa.table({
        "vec_id": pa.array(np.arange(N), pa.int64()),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in X],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(blocks)


def _np_cov():
    x = X.astype(np.float32).astype(np.float64)
    return np.cov(x, rowvar=False, bias=True)


def test_covariance_matches_numpy():
    got = covariance_matrix(_ds(), "embedding", round_to=None)
    m = np.zeros((D, D))
    m[got.dim_i - 1, got.dim_j - 1] = got["cov"]
    assert np.allclose(m, _np_cov(), atol=1e-9)


def test_covariance_partition_invariant_at_rounding():
    a = covariance_matrix(_ds(2), "embedding").sort_values(
        ["dim_i", "dim_j"]).reset_index(drop=True)
    b = covariance_matrix(_ds(7), "embedding").sort_values(
        ["dim_i", "dim_j"]).reset_index(drop=True)
    assert (a["cov"] == b["cov"]).all()


def test_pca_fit_matches_numpy_eig():
    model = pca_fit(_ds(), "embedding", k=3)
    comps = model["components"]
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    # eigenvalues descend and match numpy's on the same covariance
    w = np.linalg.eigvalsh(_np_cov())[::-1][:3]
    assert np.allclose(model["explained_variance"], w, atol=1e-9)
    assert (np.diff(model["explained_variance"]) <= 1e-12).all()
    assert model["explained_variance_ratio"][0] > 0.5  # var 25 dominates


def test_pca_project_matches_direct_matmul():
    ds = _ds()
    model = pca_fit(ds, "embedding", k=3)
    out = pca_project(ds, "embedding", model, id_col="vec_id") \
        .to_pandas().sort_values("vec_id")
    got = np.stack(out["pc"].to_numpy())
    x = X.astype(np.float32).astype(np.float64)
    want = (x - model["mean"]) @ model["components"].T
    assert np.allclose(got, want, atol=1e-9)


def test_pca_k_guard_and_null_vectors():
    ds = _ds()
    with pytest.raises(ValueError):
        pca_fit(ds, "embedding", k=D + 1)
    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([None, [1.0] * D], pa.list_(pa.float32())),
    })
    model = pca_fit(_ds(), "embedding", k=2)
    out = pca_project(rd.from_arrow(t), "embedding", model,
                      id_col="vec_id").to_pandas()
    assert list(out.vec_id) == [2]


def test_moment_dim_guard_fires():
    import maestro_ray.ops.similarity as S

    wide = pa.table({
        "vec_id": pa.array([1], pa.int64()),
        "embedding": pa.array([[0.0] * (S._MAX_MOMENT_DIM + 1)],
                              pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="reduce dimensionality"):
        covariance_matrix(rd.from_arrow(wide), "embedding")


def test_covariance_stable_under_large_mean_offset():
    """The r4 review finding: the one-pass XᵀX/n − μμᵀ form loses ~1e-4
    absolute accuracy at |μ|~1e6; the two-pass centered plan must stay
    6dp-exact vs numpy's stable np.cov."""
    off = X + 1.0e6
    t = pa.table({
        "vec_id": pa.array(np.arange(N), pa.int64()),
        "embedding": pa.array([r.tolist() for r in off],
                              pa.list_(pa.float64())),
    })
    got = covariance_matrix(rd.from_arrow(t).repartition(5), "embedding",
                            round_to=None)
    m = np.zeros((D, D))
    m[got.dim_i - 1, got.dim_j - 1] = got["cov"]
    want = np.cov(off, rowvar=False, bias=True)
    assert np.abs(m - want).max() < 1e-7
