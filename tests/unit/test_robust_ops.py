"""Robust-stat ops (holt_linear, mad_outliers, robust_scale,
quantile_transform, degree_assortativity): recursion bit-equality,
null safety, zero-variance / zero-IQR degenerate cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import holt_linear, mad_outliers
from maestro_ray.ops.graph import degree_assortativity
from maestro_ray.ops.mlprep import quantile_transform, robust_scale


def _ds(**cols):
    return rd.from_arrow(pa.table(cols))


def test_holt_linear_matches_manual_fold_bitwise(ray_session):
    rng = np.random.default_rng(7)
    x = np.round(rng.normal(0, 50, 40), 2)
    ds = _ds(k=["a"] * 25 + ["b"] * 15,
             i=pa.array(range(40), pa.int64()),
             v=pa.array(x, pa.float64()))
    out = holt_linear(ds, "k", ["i"], "v", alpha=0.25, beta=0.5) \
        .to_pandas().sort_values(["k", "i"])
    a, b = 0.25, 0.5
    for key, g in out.groupby("k"):
        xs = g.v.to_numpy()
        lvl, trd = xs[0], 0.0
        assert g.level.iloc[0] == xs[0] and g.trend.iloc[0] == 0.0
        for t in range(1, len(xs)):
            lt = a * xs[t] + (1 - a) * (lvl + trd)
            trd = b * (lt - lvl) + (1 - b) * trd
            lvl = lt
            # bitwise: the documented float contract
            assert g.level.iloc[t] == lvl
            assert g.trend.iloc[t] == trd


def test_holt_linear_rejects_bad_coefficients(ray_session):
    ds = _ds(k=["a"], i=pa.array([0], pa.int64()),
             v=pa.array([1.0], pa.float64()))
    with pytest.raises(ValueError):
        holt_linear(ds, "k", ["i"], "v", alpha=0.0, beta=0.5)
    with pytest.raises(ValueError):
        holt_linear(ds, "k", ["i"], "v", alpha=0.5, beta=1.5)


def test_mad_outliers_flags_and_ignores_nulls(ray_session):
    # med=10, MAD=1 → only the 100 exceeds 10 ± 3
    vals = [8.0, 9.0, 10.0, 11.0, 12.0, 100.0, None]
    ds = _ds(id=pa.array(range(7), pa.int64()),
             v=pa.array(vals, pa.float64()))
    out = mad_outliers(ds, "v", k=3.0).to_pandas()
    assert out.id.tolist() == [5]


def test_mad_outliers_all_null_returns_empty(ray_session):
    ds = _ds(id=pa.array([0, 1], pa.int64()),
             v=pa.array([None, None], pa.float64()))
    assert mad_outliers(ds, "v").count() == 0


def test_robust_scale_zero_iqr_is_null(ray_session):
    ds = _ds(id=pa.array(range(4), pa.int64()),
             c=pa.array([5, 5, 5, 5], pa.int64()),
             x=pa.array([1, 2, 3, None], pa.int64()))
    out = robust_scale(ds, ["c", "x"]).to_pandas()
    assert out.c_scaled.isna().all()           # constant feature
    # x: med=2, iqr=1 → (1-2)/1, (2-2)/1, (3-2)/1
    got = out.sort_values("id").x_scaled.tolist()
    assert got[:3] == [-1.0, 0.0, 1.0] and pd.isna(got[3])


def test_quantile_transform_percent_rank_semantics(ray_session):
    # ties share the min rank: percent_rank of [1,2,2,4] = 0, 1/3, 1/3, 1
    ds = _ds(id=pa.array(range(5), pa.int64()),
             v=pa.array([1.0, 2.0, 2.0, 4.0, None], pa.float64()))
    out = quantile_transform(ds, "v").to_pandas().sort_values("id")
    got = out.q_uniform.tolist()
    assert got[:4] == [0.0, 1 / 3, 1 / 3, 1.0] and pd.isna(got[4])


def test_quantile_transform_single_value_maps_to_zero(ray_session):
    ds = _ds(id=pa.array([0], pa.int64()),
             v=pa.array([7.0], pa.float64()))
    out = quantile_transform(ds, "v").to_pandas()
    assert out.q_uniform.tolist() == [0.0]


def test_degree_assortativity_hand_check(ray_session):
    # star out of 'h': h→a, h→b, h→c plus a→b. out_deg: h=3, a=1;
    # in_deg: a=1, b=2, c=1. Edge (x,y) pairs: (3,1),(3,2),(3,1),(1,2)
    e = _ds(s=["h", "h", "h", "a", "h"],   # one duplicate edge folds
            d=["a", "b", "c", "b", "a"])
    out = degree_assortativity(e, "s", "d")
    assert out.n_edges.iloc[0] == 4
    x = np.array([3, 3, 3, 1], dtype=float)
    y = np.array([1, 2, 1, 2], dtype=float)
    n = 4.0
    num = n * (x * y).sum() - x.sum() * y.sum()
    den = np.sqrt(n * (x * x).sum() - x.sum() ** 2) * \
        np.sqrt(n * (y * y).sum() - y.sum() ** 2)
    assert out.r.iloc[0] == pytest.approx(num / den, abs=0)


def test_degree_assortativity_constant_degree_is_nan(ray_session):
    # a→b, c→d: every out_deg = in_deg = 1 → zero variance → NaN
    e = _ds(s=["a", "c"], d=["b", "d"])
    out = degree_assortativity(e, "s", "d")
    assert out.n_edges.iloc[0] == 2 and np.isnan(out.r.iloc[0])
