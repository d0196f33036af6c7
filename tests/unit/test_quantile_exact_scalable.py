"""Sketch-guided exact selection (ops/aggregates.py
quantile_exact_scalable): exact order statistics with tiny window
limits forcing multi-round refinement, duplicate-mass collapse, and
the quantile_disc rank rule."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import quantile_exact_scalable


def _ds(vals):
    return rd.from_arrow(pa.table({
        "v": pa.array(vals, pa.float64())})).repartition(5)


def _expected(vals, q):
    s = np.sort(np.asarray([x for x in vals if x == x and x is not None],
                           dtype=np.float64))
    k = max(1, int(np.ceil(q * len(s))))
    return float(s[k - 1])


def test_exact_vs_sorted_with_forced_refinement(ray_session):
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.lognormal(3, 2, 5000),              # heavy tail
        rng.normal(0, 1, 5000),
        np.full(1000, 7.25),                    # duplicate mass
    ])
    ds = _ds(vals.tolist())
    qs = [0.01, 0.25, 0.5, 0.9, 0.999]
    # window_limit=64 forces several refinement rounds
    out = quantile_exact_scalable(ds, "v", qs, n_bins=32,
                                  window_limit=64)
    for q, v in zip(out["q"], out["value"]):
        assert v == _expected(vals, q), (q, v, _expected(vals, q))


def test_duplicate_heavy_window_collapses_exactly(ray_session):
    # one value repeated far past any window limit
    vals = [3.5] * 10_000 + [1.0, 99.0]
    out = quantile_exact_scalable(_ds(vals), "v", [0.5], n_bins=8,
                                  window_limit=10)
    assert out["value"].iloc[0] == 3.5


def test_nulls_ignored_and_empty(ray_session):
    vals = [None, 2.0, None, 1.0, 3.0]
    out = quantile_exact_scalable(_ds(vals), "v", [0.5])
    assert out["value"].iloc[0] == 2.0
    allnull = quantile_exact_scalable(_ds([None, None]), "v", [0.5])
    assert np.isnan(allnull["value"].iloc[0])


def test_matches_duckdb_quantile_disc(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    vals = rng.normal(100, 30, 4000).round(2)
    con = duckdb.connect()
    for q in (0.1, 0.5, 0.95):
        exp = con.execute(
            "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
            [q, vals.tolist()]).fetchone()[0]
        got = quantile_exact_scalable(_ds(vals.tolist()), "v", [q],
                                      n_bins=64, window_limit=50)
        assert got["value"].iloc[0] == exp


def test_infinities_ignored(ray_session):
    vals = [float("inf"), 1.0, 2.0, 3.0, float("-inf"), None]
    out = quantile_exact_scalable(_ds(vals), "v", [0.5])
    assert out["value"].iloc[0] == 2.0


def test_boundary_rank_with_tiny_bins(ray_session):
    """Edge ranks at bin boundaries with adversarial bin counts — the
    shared-edge-array property (binning and cuts can't disagree)."""
    vals = [float(x) for x in range(1, 101)]
    for q in (0.01, 0.02, 0.5, 0.99, 1.0):
        out = quantile_exact_scalable(_ds(vals), "v", [q], n_bins=3,
                                      window_limit=2)
        assert out["value"].iloc[0] == _expected(vals, q), q


def test_duplicate_mass_at_zero_with_denormal_tail(ray_session):
    """The hypothesis-found stall: a large duplicate mass at exactly
    0.0 hugging the window's lower edge — equal-width halving alone
    would need hundreds of rounds; the min/max re-anchor resolves it."""
    vals = [0.0] * 500 + [5e-324, 1.0]
    out = quantile_exact_scalable(_ds(vals), "v",
                                  [0.1, 0.5, 0.999], n_bins=8,
                                  window_limit=4)
    for q, v in zip(out["q"], out["value"]):
        assert v == _expected(vals, q), (q, v)
