"""Property tests (hypothesis) for the r3 operators: grouped_topk vs a
pandas reference, quantiles_disc vs DuckDB, lag_lead vs pandas shift,
pivot_count vs a crosstab — randomized inputs, exact equality."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_ray.ops.aggregates import (
    grouped_topk,
    lag_lead,
    pivot_count,
    quantiles_disc,
)

_frames = st.lists(
    st.tuples(
        st.integers(0, 4),      # grp
        st.integers(-50, 50),   # val
    ),
    min_size=1, max_size=80,
)


def _ds(rows, ray_session=None):
    import ray.data as rd

    t = pa.table({
        "grp": pa.array([r[0] for r in rows], pa.int64()),
        "val": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(range(len(rows)), pa.int64()),
    })
    return rd.from_arrow(t), t


@settings(max_examples=12, deadline=None)
@given(rows=_frames, k=st.integers(1, 5))
def test_grouped_topk_property(ray_session, rows, k):
    ds, t = _ds(rows)
    got = (
        grouped_topk(ds, keys="grp", sort_col="val", k=k, tie_break=["id"])
        .to_pandas().sort_values(["grp", "id"]).reset_index(drop=True)
    )
    df = t.to_pandas()
    want = (
        df.sort_values(["val", "id"], ascending=[False, True],
                       kind="mergesort")
        .groupby("grp", sort=False).head(k)
        .sort_values(["grp", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "val", "id"]],
                                  want[["grp", "val", "id"]])


@settings(max_examples=12, deadline=None)
@given(rows=_frames)
def test_quantiles_disc_property(ray_session, rows):
    ds, t = _ds(rows)
    qs = [0.0, 0.31, 0.5, 0.77, 1.0]
    got = quantiles_disc(ds, "val", qs)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        f"WITH x AS (SELECT quantile_disc(val, {qs}) AS l FROM t) "
        f"SELECT unnest({qs}) AS q, unnest(l) AS value FROM x"
    ).fetchdf()
    assert got["value"].tolist() == want["value"].tolist()


@settings(max_examples=12, deadline=None)
@given(rows=_frames)
def test_lag_lead_property(ray_session, rows):
    ds, t = _ds(rows)
    got = (
        lag_lead(ds, key="grp", order_cols=["val", "id"], value_col="id")
        .to_pandas().sort_values(["grp", "val", "id"])
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["grp", "val", "id"], kind="mergesort")
    g = df.groupby("grp", sort=False)["id"]
    want_prev = g.shift(1).reset_index(drop=True)
    want_next = g.shift(-1).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["prev_value"].astype("float64"), want_prev.astype("float64"),
        check_names=False)
    pd.testing.assert_series_equal(
        got["next_value"].astype("float64"), want_next.astype("float64"),
        check_names=False)


@settings(max_examples=12, deadline=None)
@given(rows=_frames)
def test_pivot_count_property(ray_session, rows):
    import ray.data as rd

    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "cat": pa.array([f"c{abs(r[1]) % 3}" for r in rows], pa.string()),
    })
    got = pivot_count(rd.from_arrow(t), key="k", pivot_col="cat",
                      values=["c0", "c1", "c2"])
    df = t.to_pandas()
    assert set(got["k"]) == set(df["k"])  # no dropped/duplicated groups
    assert len(got) == df["k"].nunique()
    for _, row in got.iterrows():
        sub = df[df["k"] == row["k"]]
        for v in ["c0", "c1", "c2"]:
            assert row[f"n_{v}"] == (sub["cat"] == v).sum(), (row["k"], v)
