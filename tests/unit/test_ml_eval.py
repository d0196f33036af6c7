"""ops/ml.py eval/training additions: confusion_report,
calibration_curve, ridge_fit (the rows-only key's numpy-exact oracle
lives here)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.ml import calibration_curve, confusion_report, ridge_fit


def _ds(table: pa.Table, blocks: int = 1) -> rd.Dataset:
    ds = rd.from_arrow(table)
    return ds.repartition(blocks) if blocks > 1 else ds


# ------------------------------------------------------- confusion_report


def test_confusion_report_hand_counts(ray_session):
    t = pa.table({
        "s": pa.array([0.1, 0.4, 0.6, 0.9, 0.5, None], pa.float64()),
        "y": pa.array([0, 0, 1, 1, 0, 1], pa.int64()),
    })
    out = confusion_report(_ds(t), "s", "y", thresholds=[0.5])
    row = out.iloc[0]
    # scores >= 0.5: 0.6(y1), 0.9(y1), 0.5(y0); null row excluded
    assert (row.tp, row.fp, row.fn, row.tn) == (2, 1, 0, 2)
    assert row.accuracy == pytest.approx(4 / 5)
    assert row.precision == pytest.approx(2 / 3)
    assert row.recall == pytest.approx(1.0)
    assert row.f1 == pytest.approx(2 * (2 / 3) * 1.0 / (2 / 3 + 1.0))


def test_confusion_report_partition_invariant(ray_session):
    rng = np.random.default_rng(7)
    t = pa.table({
        "s": pa.array(rng.random(500), pa.float64()),
        "y": pa.array((rng.random(500) < 0.3).astype(np.int64)),
    })
    a = confusion_report(_ds(t), "s", "y", [0.25, 0.5, 0.75])
    b = confusion_report(_ds(t, blocks=7), "s", "y", [0.25, 0.5, 0.75])
    pd.testing.assert_frame_equal(a, b)  # int counts: bit-identical


def test_confusion_report_zero_denominators(ray_session):
    # no positives → recall null; no predicted positives → precision null
    t = pa.table({"s": pa.array([0.1, 0.2], pa.float64()),
                  "y": pa.array([0, 0], pa.int64())})
    out = confusion_report(_ds(t), "s", "y", [0.9])
    assert np.isnan(out.iloc[0]["precision"])
    assert np.isnan(out.iloc[0]["recall"])
    assert np.isnan(out.iloc[0]["f1"])
    assert out.iloc[0]["accuracy"] == 1.0


def test_confusion_report_empty_thresholds_raises(ray_session):
    t = pa.table({"s": pa.array([0.1]), "y": pa.array([1])})
    with pytest.raises(ValueError, match="threshold"):
        confusion_report(_ds(t), "s", "y", [])


# ------------------------------------------------------ calibration_curve


def test_calibration_curve_hand_bins(ray_session):
    t = pa.table({
        "s": pa.array([0.0, 5.0, 10.0, 15.0, 25.0], pa.float64()),
        "y": pa.array([0, 1, 1, 1, 0], pa.int64()),
    })
    out = calibration_curve(_ds(t), "s", "y", bin_width=10.0)
    assert out["bin"].tolist() == [0.0, 10.0, 20.0]
    assert out["n"].tolist() == [2, 2, 1]
    assert out["n_pos"].tolist() == [1, 2, 0]
    assert out["pos_rate"].tolist() == [0.5, 1.0, 0.0]
    assert out["mean_score"].tolist() == [2.5, 12.5, 25.0]


def test_calibration_curve_empty(ray_session):
    t = pa.table({"s": pa.array([], pa.float64()),
                  "y": pa.array([], pa.int64())})
    out = calibration_curve(_ds(t), "s", "y", bin_width=10.0)
    assert out.empty
    assert list(out.columns) == ["bin", "n", "n_pos", "pos_rate",
                                 "mean_score"]


# -------------------------------------------------------------- ridge_fit


def _ridge_direct(x: np.ndarray, y: np.ndarray, l2: float) -> np.ndarray:
    xi = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    pen = np.eye(xi.shape[1]) * l2
    pen[-1, -1] = 0.0
    return np.linalg.solve(xi.T @ xi + pen, xi.T @ y)


def test_ridge_single_block_numpy_exact(ray_session):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(120, 3)).astype(np.float32)
    y = (x @ np.array([2.0, -1.0, 0.5]) + 3.0
         + rng.normal(scale=0.1, size=120))
    t = pa.table({
        "features": pa.array([list(r) for r in x], pa.list_(pa.float32())),
        "label": pa.array(y, pa.float64()),
    })
    out = ridge_fit(_ds(t), "features", "label", l2=0.5)
    want = _ridge_direct(x.astype(np.float64), y, 0.5)
    # one block → one partial → the fold IS the direct computation
    np.testing.assert_array_equal(out["coef"].to_numpy(), want)
    assert out["feature"].tolist() == ["x0", "x1", "x2", "intercept"]
    assert (out["n"] == 120).all()


def test_ridge_multiblock_close_and_deterministic(ray_session):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(200, 2)).astype(np.float32)
    y = x @ np.array([1.0, 2.0]) + rng.normal(scale=0.05, size=200)
    t = pa.table({
        "features": pa.array([list(r) for r in x], pa.list_(pa.float32())),
        "label": pa.array(y, pa.float64()),
    })
    a = ridge_fit(_ds(t, blocks=5), "features", "label", l2=1.0)
    b = ridge_fit(_ds(t, blocks=5), "features", "label", l2=1.0)
    # sorted-bytes fold: bit-reproducible for a fixed partitioning
    np.testing.assert_array_equal(a["coef"].to_numpy(),
                                  b["coef"].to_numpy())
    want = _ridge_direct(x.astype(np.float64), y, 1.0)
    np.testing.assert_allclose(a["coef"].to_numpy(), want, rtol=1e-9)


def test_ridge_drops_null_and_nan_rows(ray_session):
    x = [[1.0, 0.0], [0.0, 1.0], None, [float("nan"), 1.0], [2.0, 2.0]]
    y = [1.0, 2.0, 9.0, 9.0, float("nan")]
    t = pa.table({
        "features": pa.array(x, pa.list_(pa.float32())),
        "label": pa.array(y, pa.float64()),
    })
    out = ridge_fit(_ds(t), "features", "label", l2=0.1)
    assert out["n"].iloc[0] == 2  # only the two clean rows survive


def test_ridge_empty_raises(ray_session):
    t = pa.table({"features": pa.array([], pa.list_(pa.float32())),
                  "label": pa.array([], pa.float64())})
    with pytest.raises(ValueError, match="empty"):
        ridge_fit(_ds(t), "features", "label")


# --------------------------------------------------------------- ridge_cv


def test_ridge_cv_matches_per_fold_direct(ray_session):
    from maestro_ray.ops.corpus import _mult_hash
    from maestro_ray.ops.ml import ridge_cv

    rng = np.random.default_rng(6)
    n = 300
    x = rng.normal(size=(n, 2)).astype(np.float32)
    y = x @ np.array([1.5, -2.0]) + 0.7 + rng.normal(scale=0.1, size=n)
    keys = np.arange(n, dtype=np.int64)
    t = pa.table({
        "k": pa.array(keys),
        "features": pa.array([list(r) for r in x], pa.list_(pa.float32())),
        "label": pa.array(y, pa.float64()),
    })
    out = ridge_cv(_ds(t, blocks=4), "k", "features", "label",
                   n_folds=3, l2=0.5)
    fold = (_mult_hash(keys, "t") % np.uint64(3)).astype(int)
    xd = np.concatenate([x.astype(np.float64), np.ones((n, 1))], axis=1)
    pen = np.eye(3) * 0.5
    pen[-1, -1] = 0.0
    for f in range(3):
        tr, te = fold != f, fold == f
        coef = np.linalg.solve(xd[tr].T @ xd[tr] + pen, xd[tr].T @ y[tr])
        rmse = float(np.sqrt(np.mean((xd[te] @ coef - y[te]) ** 2)))
        row = out[out["fold"] == f].iloc[0]
        assert row["n_train"] == int(tr.sum())
        assert row["n_test"] == int(te.sum())
        assert row["rmse"] == pytest.approx(rmse, rel=1e-9)


def test_ridge_cv_reproducible_and_validates(ray_session):
    t = pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64)),
        "features": pa.array([[float(i)] for i in range(50)],
                             pa.list_(pa.float32())),
        "label": pa.array(np.arange(50, dtype=np.float64)),
    })
    from maestro_ray.ops.ml import ridge_cv

    a = ridge_cv(_ds(t, blocks=3), "k", "features", "label", n_folds=2)
    b = ridge_cv(_ds(t, blocks=3), "k", "features", "label", n_folds=2)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="n_folds"):
        ridge_cv(_ds(t), "k", "features", "label", n_folds=1)


def test_ridge_cv_null_keys_dropped_not_cast(ray_session):
    from maestro_ray.ops.ml import ridge_cv

    # a null key is float-NaN after to_numpy; NaN→uint64 is
    # platform-undefined and bypasses the negative-key guard
    # (review r4 s6 #2) — the row must leave via the validity bitmap
    t = pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6, 7, 8, None], pa.int64()),
        "features": pa.array([[float(i)] for i in range(9)],
                             pa.list_(pa.float32())),
        "label": pa.array(np.arange(9, dtype=np.float64)),
    })
    out = ridge_cv(_ds(t), "k", "features", "label", n_folds=2)
    assert int(out["n_test"].sum()) == 8  # null-key row excluded


def test_ridge_fit_first_row_null_feature(ray_session):
    from maestro_ray.ops.ml import ridge_fit

    t = pa.table({
        "features": pa.array([None, [1.0, 2.0], [3.0, 4.0], [5.0, 1.0]],
                             pa.list_(pa.float32())),
        "label": pa.array([9.0, 1.0, 2.0, 3.0], pa.float64()),
    })
    out = ridge_fit(_ds(t), "features", "label", l2=0.1)
    assert len(out) == 3 and out["n"].iloc[0] == 3

    all_null = pa.table({
        "features": pa.array([None, None], pa.list_(pa.float32())),
        "label": pa.array([1.0, 2.0], pa.float64()),
    })
    with pytest.raises(ValueError, match="non-null"):
        ridge_fit(_ds(all_null), "features", "label")
