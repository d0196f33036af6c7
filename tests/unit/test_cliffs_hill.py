"""cliffs_delta and hill_tail (ops/analytics.py): brute-force pair
reference / closed-form Pareto recovery, ties, guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import cliffs_delta, hill_tail


def _ds(rows, cols):
    return rd.from_pandas(pd.DataFrame(rows, columns=cols))


def test_cliffs_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 20, 60).tolist()
    b = rng.integers(5, 25, 45).tolist()
    rows = [("A", v) for v in a] + [("B", v) for v in b] \
        + [("C", 1), ("A", None)]  # other cohort + null excluded
    out = cliffs_delta(_ds(rows, ["g", "v"]), "g", "v", "A", "B")
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    assert int(out["n_gt"].iloc[0]) == gt
    assert int(out["n_lt"].iloc[0]) == lt
    assert out["delta"].iloc[0] == (gt - lt) / (60 * 45)
    assert int(out["n1"].iloc[0]) == 60 and int(out["n2"].iloc[0]) == 45


def test_cliffs_extremes_and_ties(ray_session):
    # complete separation: delta = +1 / all ties: delta = 0
    rows = [("A", 10)] * 3 + [("B", 1)] * 4
    out = cliffs_delta(_ds(rows, ["g", "v"]), "g", "v", "A", "B")
    assert out["delta"].iloc[0] == 1.0
    rows = [("A", 7)] * 3 + [("B", 7)] * 4
    out = cliffs_delta(_ds(rows, ["g", "v"]), "g", "v", "A", "B")
    assert out["delta"].iloc[0] == 0.0


def test_cliffs_empty_cohort_raises(ray_session):
    with pytest.raises(Exception, match="empty cohort"):
        cliffs_delta(_ds([("A", 1)], ["g", "v"]), "g", "v", "A", "B")


def test_hill_recovers_pareto_alpha(ray_session):
    # exact Pareto(alpha) sample via inverse CDF on a deterministic
    # uniform grid: x = (1-u)^(-1/alpha); Hill on the top tail must
    # land near alpha
    alpha = 2.5
    u = (np.arange(1, 5001) - 0.5) / 5000
    x = (1 - u) ** (-1 / alpha)
    ds = rd.from_pandas(pd.DataFrame({"v": x})).repartition(4)
    out = hill_tail(ds, "v", k=400)
    assert out["alpha"].iloc[0] == pytest.approx(alpha, rel=0.15)
    assert int(out["k"].iloc[0]) == 400


def test_hill_guards(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": [5.0] * 50}))
    with pytest.raises(Exception, match="degenerate"):
        hill_tail(ds, "v", k=10)
    with pytest.raises(Exception, match="at least"):
        hill_tail(ds, "v", k=100)
    neg = rd.from_pandas(pd.DataFrame({"v": [-1.0] * 50}))
    with pytest.raises(Exception, match="positive"):
        hill_tail(neg, "v", k=10)
