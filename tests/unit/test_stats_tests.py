"""Oracles for the round-4 session-7 statistics batch: KS two-sample,
Mann–Whitney U, Cramér's V, DAU/WAU active users, lagged daily
cross-correlation, PMI collocations, categorical naive Bayes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import (active_users, cramers_v,
                                       ks_two_sample, lagged_corr,
                                       mann_whitney_u)
from maestro_ray.ops.corpus import collocations_pmi
from maestro_ray.ops.ml import naive_bayes_classify


def _two_sample_ds(a, b):
    return rd.from_pandas(pd.DataFrame({
        "g": ["a"] * len(a) + ["b"] * len(b),
        "v": list(a) + list(b)}))


# ----------------------------------------------------------------- KS

def _ks_brute(a, b):
    grid = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    return max(abs(sum(x <= t for x in a) / na
                   - sum(x <= t for x in b) / nb) for t in grid)


def test_ks_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    a = np.round(rng.normal(0, 1, 300), 1)
    b = np.round(rng.normal(0.4, 1.2, 200), 1)
    out = ks_two_sample(_two_sample_ds(a, b), "g", "v", "a", "b")
    assert out["n1"][0] == 300 and out["n2"][0] == 200
    assert out["d"][0] == pytest.approx(_ks_brute(list(a), list(b)),
                                        abs=1e-12)


def test_ks_identical_and_disjoint(ray_session):
    a = [1.0, 2.0, 3.0]
    out = ks_two_sample(_two_sample_ds(a, a), "g", "v", "a", "b")
    assert out["d"][0] == 0.0
    out = ks_two_sample(_two_sample_ds([1.0, 2.0], [5.0, 6.0]),
                        "g", "v", "a", "b")
    assert out["d"][0] == 1.0


def test_ks_ignores_other_groups_and_nulls(ray_session):
    ds = rd.from_pandas(pd.DataFrame({
        "g": ["a", "a", "b", "c", "a"],
        "v": [1.0, 2.0, 1.5, 99.0, None]}))
    out = ks_two_sample(ds, "g", "v", "a", "b")
    assert out["n1"][0] == 2 and out["n2"][0] == 1


def test_ks_empty_cohort_raises(ray_session):
    with pytest.raises(ValueError, match="empty cohort"):
        ks_two_sample(_two_sample_ds([1.0], []), "g", "v", "a", "b")


# ------------------------------------------------------- Mann-Whitney

def _mwu_brute(a, b):
    """Direct pair-counting U1 (wins + half-ties for sample a)."""
    return sum(1.0 if x > y else 0.5 if x == y else 0.0
               for x in a for y in b)


def test_mwu_u_matches_pair_counting(ray_session):
    rng = np.random.default_rng(11)
    a = list(np.round(rng.normal(0, 1, 120), 1))
    b = list(np.round(rng.normal(0.5, 1, 80), 1))
    out = mann_whitney_u(_two_sample_ds(a, b), "g", "v", "a", "b")
    assert out["u1"][0] == pytest.approx(_mwu_brute(a, b), abs=1e-9)
    assert out["n1"][0] == 120 and out["n2"][0] == 80


def test_mwu_z_known_value(ray_session):
    # no ties: classic closed form. a = {1..5}, b = {6..10} → U1 = 0,
    # mu = 12.5, sigma = sqrt(25*11/12); z = -12.5/sigma
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [6.0, 7.0, 8.0, 9.0, 10.0]
    out = mann_whitney_u(_two_sample_ds(a, b), "g", "v", "a", "b")
    assert out["u1"][0] == 0.0
    sigma = np.sqrt(25 * 11 / 12.0)
    assert out["z"][0] == pytest.approx(-12.5 / sigma, rel=1e-12)


def test_mwu_all_tied_zero_variance(ray_session):
    out = mann_whitney_u(_two_sample_ds([2.0] * 4, [2.0] * 3),
                         "g", "v", "a", "b")
    assert out["z"][0] == 0.0
    assert out["u1"][0] == pytest.approx(4 * 3 / 2.0)


# ---------------------------------------------------------- Cramér's V

def test_cramers_v_perfect_association(ray_session):
    # x determines y exactly → V = 1
    ds = rd.from_pandas(pd.DataFrame({
        "x": ["a", "a", "b", "b", "c", "c"],
        "y": [1, 1, 2, 2, 3, 3]}))
    out = cramers_v(ds, "x", "y")
    assert out["v"][0] == pytest.approx(1.0)
    assert out["dof"][0] == 4 and out["n"][0] == 6


def test_cramers_v_independence(ray_session):
    # perfectly balanced 2x2 → chi2 = 0
    ds = rd.from_pandas(pd.DataFrame({
        "x": ["a", "a", "b", "b"] * 5,
        "y": [0, 1, 0, 1] * 5}))
    out = cramers_v(ds, "x", "y")
    assert out["chi2"][0] == 0.0 and out["v"][0] == 0.0


# --------------------------------------------------------- active users

def test_active_users_small_fixture(ray_session):
    day = pd.Timestamp("2024-03-01")
    rows = []
    # u1 active days 0 and 8 (outside each other's 7-day window);
    # u2 active days 0..2; u3 active day 8 only
    for u, offs in [(1, [0, 8]), (2, [0, 1, 2]), (3, [8])]:
        for o in offs:
            rows.append({"user_id": u,
                         "ts": day + pd.Timedelta(days=o, hours=5)})
    out = active_users(rd.from_pandas(pd.DataFrame(rows)),
                       "user_id", "ts", window=7)
    got = {r["day"].day: (r["dau"], r["wau"]) for _, r in out.iterrows()}
    # day 1: users {1,2} → dau 2, wau 2; day 9: {1,3} active, window
    # [3..9] excludes u2 (last active day 3 = 2024-03-03 IS inside
    # [2024-03-03, 2024-03-09] → u2 counts too)
    assert got[1] == (2, 2)
    assert got[3] == (1, 2)          # only u2 active; wau = {1, 2}
    assert got[9] == (2, 3)          # u1, u3 active; u2 in window
    assert (out["stickiness"] == out["dau"] / out["wau"]).all()


# ---------------------------------------------------------- lagged corr

def test_lagged_corr_planted_shift(ray_session):
    # y(d) = x(d - 2) exactly → corr at lag 2 == 1
    base = pd.Timestamp("2024-05-01")
    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    rows = []
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append({"ts": base + pd.Timedelta(days=d),
                         "event_type": "click"})
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append({"ts": base + pd.Timedelta(days=d + 2),
                         "event_type": "purchase"})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = lagged_corr(ds, "ts", "event_type", "click", "purchase",
                      max_lag=3)
    r = {int(a): b for a, b in zip(out["lag"], out["corr"])}
    assert r[2] == pytest.approx(1.0)
    assert r[0] < 1.0
    # n shrinks by lag over the 12-day grid
    assert list(out["n"]) == [12, 11, 10, 9]


# --------------------------------------------------------- collocations

def test_collocations_planted_pair(ray_session):
    # "zx qv" always co-occur; filler tokens are shuffled pairs
    rng = np.random.default_rng(5)
    docs = []
    for _ in range(40):
        filler = rng.permutation(["aa", "bb", "cc", "dd"]).tolist()
        docs.append(" ".join(filler[:2] + ["zx", "qv"] + filler[2:]))
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    out = collocations_pmi(ds, "text", min_count=5, k=5)
    assert len(out) == 5
    assert out.loc[0, "w1"] == "zx" and out.loc[0, "w2"] == "qv"
    assert out.loc[0, "c12"] == 40
    # pmi ordering is descending with deterministic tie-break
    assert (out["pmi"].values[:-1] >= out["pmi"].values[1:]).all()


def test_collocations_min_count_filter(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": ["a b", "a b", "c d"]}))
    out = collocations_pmi(ds, "text", min_count=2, k=10)
    assert list(zip(out["w1"], out["w2"])) == [("a", "b")]


# ---------------------------------------------------------- naive Bayes

def test_naive_bayes_learns_separable_classes(ray_session):
    # f=0 → class "x", f=1 → class "y"; fully separable
    train = rd.from_pandas(pd.DataFrame({
        "id": range(100),
        "f": [0] * 50 + [1] * 50,
        "lbl": ["x"] * 50 + ["y"] * 50}))
    test = rd.from_pandas(pd.DataFrame({
        "id": [1000, 1001], "f": [0, 1], "lbl": ["?", "?"]}))
    out = naive_bayes_classify(train, test, ["f"], "lbl", "id")
    assert list(out["predicted"]) == ["x", "y"]


def test_naive_bayes_unseen_value_falls_back_to_prior(ray_session):
    # value 9 unseen in training → likelihoods equal across classes →
    # prior decides (class "x" has 3/4 of the mass)
    train = rd.from_pandas(pd.DataFrame({
        "id": range(8),
        "f": [0, 0, 0, 0, 0, 0, 1, 1],
        "lbl": ["x"] * 6 + ["y"] * 2}))
    test = rd.from_pandas(pd.DataFrame({"id": [99], "f": [9]}))
    out = naive_bayes_classify(train, test, ["f"], "lbl", "id")
    assert list(out["predicted"]) == ["x"]


def test_naive_bayes_null_rows_excluded(ray_session):
    train = rd.from_pandas(pd.DataFrame({
        "id": range(4),
        "f": pd.array([0, 0, None, 1], dtype="Int64"),
        "lbl": ["x", "x", "x", "y"]}))
    test = rd.from_pandas(pd.DataFrame({
        "id": [10, 11], "f": pd.array([0, None], dtype="Int64")}))
    out = naive_bayes_classify(train, test, ["f"], "lbl", "id")
    # the null test row is dropped, not predicted
    assert list(out["id"]) == [10]
    assert list(out["predicted"]) == ["x"]


def test_two_sample_distinct_guard(ray_session):
    ds = _two_sample_ds([1.0, 2.0, 3.0], [4.0])
    with pytest.raises(ValueError, match="max_distinct"):
        ks_two_sample(ds, "g", "v", "a", "b", max_distinct=2)
    with pytest.raises(ValueError, match="max_distinct"):
        mann_whitney_u(ds, "g", "v", "a", "b", max_distinct=2)
