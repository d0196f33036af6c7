"""Unit oracles for grouped entropy, unpivot, and the full-outer
hash_join path."""

import numpy as np
import pandas as pd
import pyarrow as pa

from maestro_ray.ops.aggregates import entropy_grouped
from maestro_ray.ops.functions import unpivot
from maestro_ray.ops.joins import hash_join


def _ds(ray_session, table: pa.Table, parts: int = 3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parts)


def test_entropy_grouped_hand_computed_and_null_rules(ray_session):
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 2 + ["c"], pa.string()),
        "v": pa.array(["x", "x", "y", "z", "x", None, None]),
    })
    got = entropy_grouped(_ds(ray_session, t), "k", "v")
    # a: p = (.5, .25, .25) -> 1.5 bits; b: one non-null value -> 0;
    # c: all null -> NO row (SQL aggregate-over-empty under GROUP BY)
    assert got["k"].tolist() == ["a", "b"]
    assert got["entropy"].tolist() == [1.5, 0.0]


def test_entropy_grouped_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 300),
        "v": rng.integers(0, 7, 300).astype(str),
    })
    got = entropy_grouped(_ds(ray_session, pa.Table.from_pandas(df)),
                          "k", "v", round_to=9)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, round(entropy(v), 9) AS entropy FROM t "
        "GROUP BY 1 ORDER BY 1").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unpivot_shape_types_and_null_preservation(ray_session):
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "a": pa.array([10, None], pa.int64()),
        "b": pa.array([0.5, 2.5], pa.float64()),
    })
    out = (unpivot(_ds(ray_session, t, parts=2), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "measure"])
           .reset_index(drop=True))
    assert len(out) == 4                       # rows x value_cols
    assert out["measure"].tolist() == ["a", "b", "a", "b"]
    assert out["val"].tolist()[:2] == [10.0, 0.5]
    assert pd.isna(out["val"].iloc[2]) and out["val"].iloc[3] == 2.5
    assert out["val"].dtype == np.float64      # single long-column type


def test_hash_join_full_outer_keeps_both_unmatched_sides(ray_session):
    l = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "lv": pa.array(["a", "b"])})
    r = pa.table({"k": pa.array([2, 3], pa.int64()),
                  "rv": pa.array([20, 30], pa.int64())})
    out = (hash_join(_ds(ray_session, l, parts=2),
                     _ds(ray_session, r, parts=2), keys="k",
                     num_buckets=4, join_type="full outer")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3]      # key coalesced
    assert out.loc[0, "lv"] == "a" and pd.isna(out.loc[0, "rv"])
    assert out.loc[1, "lv"] == "b" and out.loc[1, "rv"] == 20
    assert pd.isna(out.loc[2, "lv"]) and out.loc[2, "rv"] == 30
