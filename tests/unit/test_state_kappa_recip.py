"""state_durations / cohen_kappa (ops/analytics.py) and reciprocity
(ops/graph.py): hand-computed references, null exclusion, edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import cohen_kappa, state_durations
from maestro_ray.ops.graph import reciprocity


def test_state_durations_hand_case(ray_session):
    rows = [
        # u1: a[0..10) b[10..15) a[15..?  -> a: 10+?, last event open
        ("u1", "a", 0, 1), ("u1", "b", 10, 2), ("u1", "a", 15, 3),
        # u2: a[5..9) -> a: 4; last open
        ("u2", "a", 5, 1), ("u2", "b", 9, 2),
        # null state / null ts excluded BEFORE nexting
        ("u3", None, 0, 1), ("u3", "c", 7, 2),
    ]
    ds = rd.from_pandas(pd.DataFrame(
        rows, columns=["u", "s", "ts", "i"])).repartition(3)
    out = state_durations(ds, key="u", state_col="s",
                          order_cols=["ts", "i"], ts_col="ts") \
        .set_index("state")
    assert out.loc["a", "total_us"] == 10 + 4
    assert out.loc["a", "n_intervals"] == 2
    assert out.loc["b", "total_us"] == 5
    assert "c" not in out.index  # u3's only valid event has no next


def test_cohen_kappa_hand_case(ray_session):
    # 2x2: 40 agree-a, 40 agree-b, 10 a->b, 10 b->a
    rows = [("a", "a")] * 40 + [("b", "b")] * 40 \
        + [("a", "b")] * 10 + [("b", "a")] * 10
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["ra", "rb"]))
    out = cohen_kappa(ds, "ra", "rb")
    n = 100
    p_o = 80 / n
    p_e = (50 * 50 + 50 * 50) / (n * n)
    assert out["p_o"].iloc[0] == p_o
    assert out["p_e"].iloc[0] == p_e
    assert out["kappa"].iloc[0] == (p_o - p_e) / (1 - p_e)


def test_cohen_kappa_perfect_and_chance(ray_session):
    rows = [("x", "x")] * 30 + [("y", "y")] * 30
    out = cohen_kappa(rd.from_pandas(
        pd.DataFrame(rows, columns=["ra", "rb"])), "ra", "rb")
    assert out["kappa"].iloc[0] == 1.0
    # single category on both sides: p_e = 1 -> kappa undefined
    rows = [("x", "x")] * 30
    out = cohen_kappa(rd.from_pandas(
        pd.DataFrame(rows, columns=["ra", "rb"])), "ra", "rb")
    assert pd.isna(out["kappa"].iloc[0])


def test_reciprocity_hand_case(ray_session):
    # 1->2 and 2->1 mutual; 1->3 one-way; self-loop + dup dropped
    rows = [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2)]
    ds = rd.from_pandas(pd.DataFrame(rows, columns=["a", "b"]))
    out = reciprocity(ds)
    assert int(out["n_edges"].iloc[0]) == 3
    assert int(out["n_mutual"].iloc[0]) == 2
    assert out["reciprocity"].iloc[0] == pytest.approx(2 / 3)


def test_reciprocity_empty(ray_session):
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({
        "a": pa.array([1], pa.int64()),
        "b": pa.array([1], pa.int64())}))  # only a self-loop
    out = reciprocity(ds)
    assert int(out["n_edges"].iloc[0]) == 0
    assert np.isnan(out["reciprocity"].iloc[0])
