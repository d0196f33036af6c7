"""Unit oracles for grouped skewness/kurtosis (Chan central-moment
merging) and GROUPING SETS."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import grouped_skew_kurt, grouping_sets_agg


def _ds(ray_session, table: pa.Table, parts: int):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parts)


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_grouped_skew_kurt_matches_duckdb_across_partitionings(
        ray_session, parts):
    """The Chan pairwise merge must be partitioning-invariant and agree
    with DuckDB's streaming accumulator to float precision."""
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 400),
        "v": np.where(rng.random(400) < 0.1, np.nan,
                      rng.lognormal(8.0, 1.5, 400)),
    })
    got = grouped_skew_kurt(
        _ds(ray_session, pa.Table.from_pandas(df), parts), "k", "v",
        round_to=8)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, round(skewness(v), 8) AS skewness, "
        "round(kurtosis(v), 8) AS kurtosis FROM t GROUP BY 1 ORDER BY 1"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_grouped_skew_kurt_null_edge_rules(ray_session):
    # pinned against DuckDB: n<3 or zero variance -> NULL skewness;
    # n<4 or zero variance -> NULL kurtosis; n=3 -> skew real, kurt NULL
    t = pa.table({
        "k": pa.array(["n2"] * 2 + ["n3"] * 3 + ["n4"] * 4 + ["const"] * 5),
        "v": pa.array([1.0, 2.0,
                       1.0, 2.0, 4.0,
                       1.0, 2.0, 4.0, 9.0,
                       7.0, 7.0, 7.0, 7.0, 7.0]),
    })
    got = grouped_skew_kurt(_ds(ray_session, t, 3), "k", "v")
    row = {k: i for i, k in enumerate(got["k"])}
    assert pd.isna(got.loc[row["n2"], "skewness"])
    assert pd.isna(got.loc[row["n2"], "kurtosis"])
    assert not pd.isna(got.loc[row["n3"], "skewness"])
    assert pd.isna(got.loc[row["n3"], "kurtosis"])
    assert not pd.isna(got.loc[row["n4"], "kurtosis"])
    assert pd.isna(got.loc[row["const"], "skewness"])
    assert pd.isna(got.loc[row["const"], "kurtosis"])


def test_grouping_sets_arbitrary_subsets(ray_session):
    t = pa.table({
        "a": pa.array(["x", "x", "y"]),
        "b": pa.array(["p", "q", "p"]),
        "v": pa.array([1.0, 2.0, 4.0]),
    })
    out = grouping_sets_agg(
        _ds(ray_session, t, 2), ["a", "b"], [["a"], []],
        {"s": ("v", "sum"), "n": (None, "count")})
    # (a) level: x->3, y->4; () level: ALL,ALL -> 7
    assert out[["a", "b"]].values.tolist() == [
        ["ALL", "ALL"], ["x", "ALL"], ["y", "ALL"]]
    assert out["s"].tolist() == [7.0, 3.0, 4.0]
    assert out["n"].tolist() == [3, 2, 1]


def test_grouping_sets_rejects_unknown_key(ray_session):
    t = pa.table({"a": pa.array(["x"]), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="not in keys"):
        grouping_sets_agg(_ds(ray_session, t, 1), ["a"], [["zz"]],
                          {"s": ("v", "sum")})
