"""logreg_fit / logreg_predict: separable-blob convergence, exact
agreement with a driver-side numpy reference (same fold order), run
determinism, and edge guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.ml import logreg_fit, logreg_predict


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _blobs(rng, n_per=80, d=6, sep=3.0):
    x0 = rng.normal(size=(n_per, d)) - sep / 2
    x1 = rng.normal(size=(n_per, d)) + sep / 2
    X = np.vstack([x0, x1]).astype(np.float32)
    y = np.array([0] * n_per + [1] * n_per, dtype=np.int64)
    order = rng.permutation(len(y))
    return X[order], y[order]


def _ds(rd, X, y, parts=4):
    t = pa.table({
        "features": pa.array([r.tolist() for r in X],
                             pa.list_(pa.float32())),
        "label": pa.array(y, pa.int64()),
    })
    return rd.from_arrow(t).repartition(parts)


def test_logreg_separable_blobs_converge(rd):
    rng = np.random.default_rng(3)
    X, y = _blobs(rng)
    w, b, hist = logreg_fit(_ds(rd, X, y), "features", "label", iters=30)
    assert hist["loss"].iloc[-1] < hist["loss"].iloc[0] * 0.2
    scored = logreg_predict(_ds(rd, X, y), "features", w, b).to_pandas()
    acc = ((scored["prob"] > 0.5).astype(int) == scored["label"]).mean()
    assert acc > 0.97


def test_logreg_matches_numpy_reference(rd):
    # full-batch GD with one partial per run is sum-order sensitive;
    # on ONE partition there is a single partial, so the distributed
    # fit must equal the plain numpy loop bit-for-bit
    rng = np.random.default_rng(5)
    X, y = _blobs(rng, n_per=40, d=4)
    w, b, _ = logreg_fit(_ds(rd, X, y, parts=1), "features", "label",
                         iters=10, lr=0.3)
    wr = np.zeros(4)
    br = 0.0
    Xd = X.astype(np.float64)
    n = float(len(y))
    for _ in range(10):
        p = 1.0 / (1.0 + np.exp(-(Xd @ wr + br)))
        r = p - y
        # mirror the engine's float association exactly: lr * (g/n)
        wr -= 0.3 * ((Xd.T @ r) / n + 0.0 * wr)
        br -= 0.3 * (r.sum() / n)
    np.testing.assert_array_equal(w, wr)
    assert b == br


def test_logreg_deterministic_per_partitioning(rd):
    rng = np.random.default_rng(7)
    X, y = _blobs(rng, n_per=50, d=5)
    outs = [logreg_fit(_ds(rd, X, y, parts=4), "features", "label",
                       iters=8)[0] for _ in range(2)]
    np.testing.assert_array_equal(outs[0], outs[1])


def test_logreg_guards(rd):
    t = pa.table({
        "features": pa.array([None, None], pa.list_(pa.float32())),
        "label": pa.array([0, 1], pa.int64()),
    })
    import ray.data as rdm

    with pytest.raises(ValueError, match="no non-null"):
        logreg_fit(rdm.from_arrow(t), "features", "label")
    with pytest.raises(ValueError, match="iters"):
        logreg_fit(rdm.from_arrow(t), "features", "label", iters=0)


def test_logreg_null_rows_dropped(rd):
    rng = np.random.default_rng(9)
    X, y = _blobs(rng, n_per=30, d=3)
    t = pa.table({
        "features": pa.array([r.tolist() for r in X] + [None],
                             pa.list_(pa.float32())),
        "label": pa.array(list(y) + [1], pa.int64()),
    })
    import ray.data as rdm

    w, b, hist = logreg_fit(rdm.from_arrow(t), "features", "label",
                            iters=5)
    assert np.isfinite(w).all() and np.isfinite(b)


def test_logreg_predict_null_features_score_null(rd):
    """Regression (r3 review): ListArray.flatten drops null entries —
    predict on a batch WITH null vectors must emit null probs, not
    crash or misalign rows."""
    rng = np.random.default_rng(11)
    X, y = _blobs(rng, n_per=20, d=3)
    w, b, _ = logreg_fit(_ds(rd, X, y, parts=1), "features", "label",
                         iters=5)
    import ray.data as rdm

    t = pa.table({
        "features": pa.array([X[0].tolist(), None, X[1].tolist()],
                             pa.list_(pa.float32())),
        "label": pa.array([0, 1, 0], pa.int64()),
    })
    # equal-length lists + a null trip Ray's tensor-extension casting
    # in from_arrow; parquet-sourced data (the real path) does not
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.enable_tensor_extension_casting
    ctx.enable_tensor_extension_casting = False
    try:
        out = logreg_predict(rdm.from_arrow(t), "features", w, b) \
            .to_pandas()
    finally:
        ctx.enable_tensor_extension_casting = prev
    assert len(out) == 3
    assert pd.isna(out.loc[1, "prob"])
    assert np.isfinite(out.loc[0, "prob"]) and \
        np.isfinite(out.loc[2, "prob"])
    # row alignment: the two valid rows score like a null-free batch
    clean = logreg_predict(rdm.from_arrow(pa.table({
        "features": pa.array([X[0].tolist(), X[1].tolist()],
                             pa.list_(pa.float32())),
        "label": pa.array([0, 0], pa.int64()),
    })), "features", w, b).to_pandas()
    assert out.loc[0, "prob"] == clean.loc[0, "prob"]
    assert out.loc[2, "prob"] == clean.loc[1, "prob"]
