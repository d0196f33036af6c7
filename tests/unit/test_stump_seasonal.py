"""Edge cases for stump_splits (ops/ml.py) and seasonal_decompose
(ops/analytics.py) — the oracle keys cover the happy path at scale;
these pin the guards, empty/degenerate inputs, and the hand-checkable
math on a tiny series."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import seasonal_decompose
from maestro_ray.ops.ml import stump_splits


def _ds(**cols):
    return rd.from_arrow(pa.table(cols))


# ---------- stump_splits ----------

def test_stump_hand_checked():
    # x<=1 separates perfectly: left = 4 pos, right = 4 neg
    ds = _ds(x=pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
             y=pa.array([1, 1, 1, 1, 0, 0, 0, 0], pa.int64()))
    out = stump_splits(ds, "x", "y")
    assert out["threshold"].tolist() == [1]
    assert out["n_left"].tolist() == [4] and out["pos_left"].tolist() == [4]
    assert out["n_right"].tolist() == [4] and out["pos_right"].tolist() == [0]
    # pure sides: gini = 4 - 16/4 + 4 - 16/4 = 0
    assert out["gini"].tolist() == [0.0]
    assert out["is_best"].tolist() == [True]


def test_stump_tie_breaks_to_smallest_threshold():
    # constant label: every split scores identically → best = smallest t
    ds = _ds(x=pa.array([1, 2, 3, 4], pa.int64()),
             y=pa.array([1, 1, 1, 1], pa.int64()))
    out = stump_splits(ds, "x", "y")
    assert out["gini"].nunique() == 1
    assert out.loc[out["is_best"], "threshold"].tolist() == [1]


def test_stump_constant_feature_empty():
    ds = _ds(x=pa.array([7, 7, 7], pa.int64()),
             y=pa.array([1, 0, 1], pa.int64()))
    out = stump_splits(ds, "x", "y")
    assert out.empty
    assert list(out.columns) == ["threshold", "n_left", "pos_left",
                                 "n_right", "pos_right", "gini",
                                 "is_best"]


def test_stump_nulls_excluded_and_guard():
    ds = _ds(x=pa.array([1, None, 2, 2], pa.int64()),
             y=pa.array([1, 1, None, 0], pa.int64()))
    out = stump_splits(ds, "x", "y")  # rows 0 and 3 survive
    assert out["n_left"].tolist() == [1]
    assert out["pos_left"].tolist() == [1]
    with pytest.raises(RuntimeError, match="distinct"):
        stump_splits(_ds(x=pa.array([1, 2, 3], pa.int64()),
                         y=pa.array([0, 1, 0], pa.int64())),
                     "x", "y", max_distinct=2)


# ---------- seasonal_decompose ----------

def test_seasonal_hand_checked():
    # period 2, window 3 over buckets 0..5 with counts per bucket:
    # bucket b appears v_b times
    v = [2, 1, 2, 1, 2, 1]
    buckets = np.repeat(np.arange(6, dtype=np.int64), v)
    out = seasonal_decompose(_ds(b=pa.array(buckets)), "b",
                             period=2, window=3)
    assert out["bucket"].tolist() == [0, 1, 2, 3, 4, 5]
    assert out["v"].tolist() == v
    # interior frame sums alternate 5,4,5,4 → trend 5/3,4/3,5/3,4/3
    assert np.isnan(out["trend"][0]) and np.isnan(out["trend"][5])
    assert out["trend"][1:5].tolist() == [5 / 3, 4 / 3, 5 / 3, 4 / 3]
    # detrended*3 = 3v - sw: phase1 rows give -2,-2; phase0 rows 2,2
    # → seasonal phase0 = 4/6, phase1 = -4/6
    assert out["seasonal"][1:5].tolist() == pytest.approx(
        [-2 / 3, 2 / 3, -2 / 3, 2 / 3])
    # resid interior = v - trend - seasonal, computed left-to-right
    want = [v[i] - out["trend"][i] - out["seasonal"][i]
            for i in range(1, 5)]
    assert out["resid"][1:5].tolist() == want
    assert np.isnan(out["resid"][0]) and np.isnan(out["resid"][5])


def test_seasonal_short_series_all_nan_trend():
    out = seasonal_decompose(
        _ds(b=pa.array([0, 1], pa.int64())), "b", period=2, window=3)
    assert out["trend"].isna().all()
    assert out["seasonal"].isna().all()


def test_seasonal_guards():
    ds = _ds(b=pa.array([0, 1, 2], pa.int64()))
    with pytest.raises(ValueError, match="odd"):
        seasonal_decompose(ds, "b", window=4)
    with pytest.raises(RuntimeError, match="driver bound"):
        seasonal_decompose(ds, "b", window=3, max_points=2)


def test_seasonal_empty_and_null_buckets():
    out = seasonal_decompose(
        _ds(b=pa.array([], pa.int64())), "b")
    assert out.empty and "resid" in out.columns
    out2 = seasonal_decompose(
        _ds(b=pa.array([None, 3, 3], pa.int64())), "b",
        period=2, window=3)
    assert out2["bucket"].tolist() == [3] and out2["v"].tolist() == [2]
