"""Unit oracles for the distribution-stats batch: gini_grouped,
trimmed_mean_grouped, benford_digits (ops/aggregates.py) and
drift_psi (ops/diff.py). The DuckDB twins cover the happy path at
scale; these pin edge semantics the fixtures can't reach."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import (
    benford_digits,
    gini_grouped,
    trimmed_mean_grouped,
)
from maestro_ray.ops.diff import drift_psi


def _ds(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def test_gini_known_values(ray_session):
    # perfectly equal distribution -> 0 (up to the (n+1)/n finite-n
    # formula: 2*sum(i*x)/(n*sum) - (n+1)/n with x const == 0 exactly)
    df = pd.DataFrame({"k": ["a"] * 4, "v": [5.0] * 4})
    out = gini_grouped(_ds(df), "k", "v")
    assert out["gini"].iloc[0] == pytest.approx(0.0, abs=1e-12)

    # one-holder-takes-all of n=4: G = (n-1)/n = 0.75
    df = pd.DataFrame({"k": ["a"] * 4, "v": [0.0, 0.0, 0.0, 8.0]})
    out = gini_grouped(_ds(df), "k", "v")
    assert out["gini"].iloc[0] == pytest.approx(0.75, abs=1e-12)


def test_gini_ties_match_expanded_formula(ray_session):
    rng = np.random.default_rng(7)
    v = rng.integers(1, 6, size=200).astype("float64")
    df = pd.DataFrame({"k": ["g"] * 200, "v": v})
    out = gini_grouped(_ds(df), "k", "v")
    s = np.sort(v)
    n = len(s)
    expected = 2.0 * np.sum(np.arange(1, n + 1) * s) / (n * s.sum()) \
        - (n + 1.0) / n
    assert out["gini"].iloc[0] == pytest.approx(expected, rel=1e-12)


def test_trimmed_mean_small_groups(ray_session):
    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 2,
        "v": [100.0, 1.0, 2.0, 3.0, -50.0, 7.0, 9.0],
    })
    # trim 1/5: k=1 for group a (n=5) -> drop -50 and 100 -> mean(1,2,3)
    # group b: n=2, k=0 -> plain mean
    out = trimmed_mean_grouped(_ds(df), "k", "v", 1, 5)
    assert dict(zip(out["k"], out["trimmed_mean"])) == {
        "a": pytest.approx(2.0), "b": pytest.approx(8.0)}
    # trim 1/2: odd group keeps exactly its median; even group (n=2,
    # k=1) is fully trimmed and yields no row
    out = trimmed_mean_grouped(_ds(df), "k", "v", 1, 2)
    assert dict(zip(out["k"], out["trimmed_mean"])) == {
        "a": pytest.approx(2.0)}


def test_trimmed_mean_tie_runs_are_sum_invariant(ray_session):
    # ties straddling the trim boundary: which duplicates drop is
    # arbitrary but the kept-sum is not
    df = pd.DataFrame({"k": ["a"] * 6, "v": [1.0, 2.0, 2.0, 2.0, 2.0, 9.0]})
    out = trimmed_mean_grouped(_ds(df), "k", "v", 1, 6)  # k=1
    assert out["trimmed_mean"].iloc[0] == pytest.approx(8.0 / 4)


def test_benford_counts_and_missing_digits(ray_session):
    df = pd.DataFrame({"x": [1, 19, 123, 2, 29, 9]})
    out = benford_digits(_ds(df), "x")
    assert list(out["digit"]) == [1, 2, 9]  # absent digits absent
    assert list(out["n"]) == [3, 2, 1]
    assert out["frac"].sum() == pytest.approx(1.0)


def test_drift_psi_identical_and_disjoint(ray_session):
    a = pd.DataFrame({"v": np.arange(100, dtype="float64")})
    out = drift_psi(_ds(a), _ds(a.copy()), "v", 10.0, round_to=None)
    assert out["psi"].iloc[0] == pytest.approx(0.0, abs=1e-15)
    assert out["n_bins"].iloc[0] == 10

    b = pd.DataFrame({"v": np.arange(1000, 1100, dtype="float64")})
    out = drift_psi(_ds(a), _ds(b), "v", 10.0, round_to=None)
    # epsilon-free variant: no shared bins -> empty sum, documented
    assert out["n_bins"].iloc[0] == 0
    assert out["psi"].iloc[0] == 0.0


def test_drift_psi_known_two_bin_value(ray_session):
    # a: 75/25 split, b: 50/50 over the same two bins
    a = pd.DataFrame({"v": [0.0] * 75 + [10.0] * 25})
    b = pd.DataFrame({"v": [0.0] * 50 + [10.0] * 50})
    out = drift_psi(_ds(a), _ds(b), "v", 10.0, round_to=None)
    exp = (0.75 - 0.5) * np.log(0.75 / 0.5) \
        + (0.25 - 0.5) * np.log(0.25 / 0.5)
    assert out["psi"].iloc[0] == pytest.approx(exp, rel=1e-12)
