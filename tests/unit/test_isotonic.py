"""Isotonic PAV calibration (ops/ml.py isotonic_fit): hand-checked
pooling, monotonicity + pool-mean preservation on a random fixture,
already-monotone passthrough, and degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.ml import isotonic_fit


def _ds(scores, labels):
    return rd.from_arrow(pa.table({
        "s": pa.array(scores, pa.float64()),
        "y": pa.array(labels, pa.int64()),
    }))


def test_hand_checked_pooling(ray_session):
    # rates by score: 1.0, 0.0, 1.0 → PAV pools the first two to 1/2,
    # leaves the last at 1.0
    out = isotonic_fit(_ds([1.0, 2.0, 3.0], [1, 0, 1]), "s", "y")
    assert out["score"].tolist() == [1.0, 2.0, 3.0]
    assert out["fitted"].tolist() == [0.5, 0.5, 1.0]


def test_monotone_input_passthrough(ray_session):
    scores = [1.0, 2.0, 3.0, 4.0]
    # empirical rates 0, 1/3, 1/2, 1 — already nondecreasing
    ds = _ds([1, 2, 2, 2, 3, 3, 4], [0, 0, 0, 1, 1, 0, 1])
    out = isotonic_fit(ds, "s", "y")
    assert out["score"].tolist() == scores
    assert out["fitted"].tolist() == [0.0, 1 / 3, 0.5, 1.0]


def test_monotone_and_mean_preserving(ray_session):
    rng = np.random.default_rng(7)
    scores = rng.integers(0, 40, size=400).astype(float)
    labels = (rng.random(400) < scores / 60).astype(int)
    out = isotonic_fit(_ds(scores.tolist(), labels.tolist()), "s", "y")
    f = out["fitted"].to_numpy()
    assert (np.diff(f) >= 0).all()
    # global weighted mean preserved (PAV is a projection)
    n = out["n"].to_numpy()
    assert np.isclose((f * n).sum(), out["pos"].sum(), atol=1e-9)
    # within each constant pool, fitted equals the pool's exact rate
    edges = np.flatnonzero(np.diff(f) != 0)
    starts = np.concatenate(([0], edges + 1))
    ends = np.concatenate((edges + 1, [len(f)]))
    for a, b in zip(starts, ends):
        assert f[a] == out["pos"][a:b].sum() / n[a:b].sum()


def test_all_one_score_and_empty(ray_session):
    out = isotonic_fit(_ds([5.0, 5.0, 5.0], [1, 0, 1]), "s", "y")
    assert out["fitted"].tolist() == [2 / 3]
    empty = isotonic_fit(_ds([], []), "s", "y")
    assert empty.empty and list(empty.columns) == ["score", "n", "pos",
                                                   "fitted"]


def test_guard(ray_session):
    with pytest.raises(RuntimeError, match="distinct"):
        isotonic_fit(_ds([1.0, 2.0, 3.0], [0, 1, 1]), "s", "y",
                     max_distinct=2)
