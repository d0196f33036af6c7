"""count_distinct_grouped / distinct_on / pivot_sum (r4): pandas
oracles, null and tie edges, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import (
    count_distinct_grouped,
    distinct_on,
    pivot_sum,
)


@pytest.mark.parametrize("npart", [1, 5])
def test_count_distinct_grouped(ray_session, npart):
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"k": rng.integers(0, 4, 500),
                       "v": rng.integers(0, 40, 500).astype(float)})
    df.loc[df.sample(30, random_state=0).index, "v"] = np.nan
    ds = rd.from_pandas(df).repartition(npart)
    got = count_distinct_grouped(ds, "k", "v")
    exp = (df.dropna(subset=["v"]).groupby("k")["v"].nunique()
           .rename("n_distinct").reset_index())
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_distinct": "int64"}), check_dtype=False)


def test_distinct_on_ties_and_nulls(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "v": [5.0, 5.0, np.nan, 1.0, 2.0, np.nan],
        "id": [2, 1, 0, 7, 8, 9],
    })
    ds = rd.from_pandas(df).repartition(3)
    got = (distinct_on(ds, "k", "v", descending=True, tie_break=["id"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: v=5 tie -> smaller id wins (1); null v never beats non-null;
    # b: v=2 wins; c: only a null row exists -> it IS the row
    assert got["id"].tolist() == [1, 8, 9]
    assert list(got.columns) == ["k", "v", "id"]


def test_distinct_on_multikey_partition_invariant(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k1": rng.integers(0, 3, 300),
        "k2": rng.integers(0, 3, 300),
        "v": rng.integers(0, 50, 300),
        "id": np.arange(300),
    })
    a = (distinct_on(rd.from_pandas(df).repartition(1), ["k1", "k2"],
                     "v", tie_break=["id"]).to_pandas()
         .sort_values(["k1", "k2"]).reset_index(drop=True))
    b = (distinct_on(rd.from_pandas(df).repartition(7), ["k1", "k2"],
                     "v", tie_break=["id"]).to_pandas()
         .sort_values(["k1", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    exp = (df.sort_values(["k1", "k2", "v", "id"]).groupby(["k1", "k2"])
           .head(1).sort_values(["k1", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, exp, check_dtype=False)


def test_pivot_sum_nulls_and_missing(ray_session):
    df = pd.DataFrame({
        "k": ["x", "x", "y", "y", "z"],
        "p": ["A", "B", "A", "C", "B"],
        "v": [1.0, 2.0, np.nan, 4.0, 8.0],
    })
    ds = rd.from_pandas(df).repartition(2)
    got = pivot_sum(ds, "k", "p", ["A", "B"], "v")
    # y's A value is null (contributes nothing), z has no A rows -> 0
    exp = pd.DataFrame({"k": ["x", "y", "z"],
                        "sum_A": [1.0, 0.0, 0.0],
                        "sum_B": [2.0, 0.0, 8.0]})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
