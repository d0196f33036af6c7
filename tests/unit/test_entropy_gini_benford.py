"""entropy_grouped / gini_grouped (ops/analytics.py) and
benford_digits (ops/quality.py) — hand-computed references, null
exclusion, edge cases, guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import entropy_grouped, gini_grouped
from maestro_ray.ops.quality import benford_digits


def test_entropy_uniform_and_point_mass(ray_session):
    rows = (
        [("u1", c) for c in ("a", "b", "c", "d")]      # uniform: ln 4
        + [("u2", "a")] * 5                            # point mass: 0
        + [("u3", "a"), ("u3", "a"), ("u3", "b")]      # 2/3, 1/3
        + [(None, "a"), ("u4", None)]                  # excluded
    )
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "c"]))
    out = entropy_grouped(ds, "g", "c").set_index("g")
    assert set(out.index) == {"u1", "u2", "u3"}
    assert out.loc["u1", "entropy"] == pytest.approx(np.log(4), abs=1e-6)
    assert out.loc["u2", "entropy"] == 0.0
    h3 = -(2 / 3) * np.log(2 / 3) - (1 / 3) * np.log(1 / 3)
    assert out.loc["u3", "entropy"] == pytest.approx(h3, abs=1e-6)
    assert out.loc["u1", "k_categories"] == 4
    assert out.loc["u2", "n"] == 5


def _gini_ref(vals):
    x = np.sort(np.asarray(vals, dtype=np.int64))
    n = len(x)
    i = np.arange(1, n + 1)
    return (2.0 * np.sum(i * x)) / (n * x.sum()) - (n + 1) / n


def test_gini_matches_sorted_reference(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 200).tolist()
    b = [7] * 50                     # perfect equality: G = 0
    rows = [("A", v) for v in a] + [("B", v) for v in b] + [("A", None)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["g", "v"]))
    out = gini_grouped(ds, "g", "v").set_index("g")
    assert out.loc["A", "gini"] == pytest.approx(_gini_ref(a), abs=0)
    assert out.loc["B", "gini"] == pytest.approx(0.0, abs=0)
    assert out.loc["A", "n"] == 200
    assert out.loc["B", "total"] == 350


def test_gini_negative_raises(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"g": ["A"], "v": [-1]}))
    with pytest.raises(Exception, match="negative"):
        gini_grouped(ds, "g", "v")


def test_benford_hand_counts(ray_session):
    # 1.5->1, 19.2->1, 250->2, 0.4 excluded, 9.99->9, null excluded
    ds = rd.from_pandas(pd.DataFrame(
        {"v": [1.5, 19.2, 250.0, 0.4, 9.99, None]}))
    out = benford_digits(ds, "v").set_index("digit")
    assert out.loc[1, "n"] == 2
    assert out.loc[2, "n"] == 1
    assert out.loc[9, "n"] == 1
    assert out["n"].sum() == 4
    assert out.loc[1, "p_obs"] == pytest.approx(0.5)
    assert out.loc[1, "p_benford"] == pytest.approx(
        np.log10(2), abs=1e-6)
    # chisq equals the direct formula over the same counts
    counts = out["n"].to_numpy(dtype=np.float64)
    exp = 4 * np.log10(1 + 1 / np.arange(1, 10))
    assert out["chisq"].iloc[0] == pytest.approx(
        float(np.sum((counts - exp) ** 2 / exp)), abs=1e-5)


def test_benford_conforming_sample(ray_session):
    # 2^k leading digits follow Benford closely (equidistribution of
    # k·log10(2) mod 1): chisq stays small; exact doubles below 2^53
    vals = 2.0 ** np.arange(1, 50)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    out = benford_digits(ds, "v")
    assert out["n"].sum() == 49
    assert out["chisq"].iloc[0] < 25
