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


# ------------------------- r4 s4: bucketed exchange / exact selection


_kv_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**62), 2**62)),  # key
        st.integers(-1000, 1000),                            # val
    ),
    min_size=0, max_size=80,
)


@settings(max_examples=12, deadline=None)
@given(_kv_rows, st.integers(1, 7))
def test_bucketed_agg_equals_pandas_groupby(ray_session, rows, nb):
    import pandas as pd
    import ray.data as rd

    from maestro_ray.ops.aggregates import bucketed_agg

    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
    })
    got_t = pa.concat_tables(
        [b for b in bucketed_agg(
            rd.from_arrow(t).repartition(3), "k",
            [("v", "sum", "s"), (None, "count_all", "n"),
             ("v", "min", "mn")],
            n_buckets=nb).iter_batches(batch_size=None,
                                       batch_format="pyarrow")]
    ) if rows else None
    if not rows:
        return
    # expectation via ARROW group_by — a pandas groupby would coerce
    # nullable int64 keys to float64 and MERGE keys near 2^62
    # (hypothesis-found test unsoundness, not an operator bug)
    exp_t = t.group_by(["k"]).aggregate(
        [("v", "sum"), ([], "count_all"), ("v", "min")])

    def norm(tbl, cols):
        d = {c: tbl.column(c).to_pylist() for c in cols}
        rows_ = list(zip(*[d[c] for c in cols]))
        return sorted(rows_, key=lambda r: (r[0] is not None, r[0]))

    assert norm(got_t, ["k", "s", "n", "mn"]) == \
        norm(exp_t, ["k", "v_sum", "count_all", "v_min"])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=64),
             min_size=1, max_size=120),
    st.floats(0.01, 0.99),
)
def test_quantile_exact_scalable_is_exact(ray_session, vals, q):
    import numpy as np
    import ray.data as rd

    from maestro_ray.ops.aggregates import quantile_exact_scalable

    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    out = quantile_exact_scalable(ds.repartition(3), "v", [q],
                                  n_bins=8, window_limit=4)
    s = np.sort(np.asarray(vals, dtype=np.float64))
    k = max(1, int(np.ceil(q * len(s))))
    assert out["value"].iloc[0] == float(s[k - 1])


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(st.integers(0, 30),
                    st.one_of(st.none(), st.integers(-5, 5)),
                    max_size=25),
    st.dictionaries(st.integers(0, 30),
                    st.one_of(st.none(), st.integers(-5, 5)),
                    max_size=25),
)
def test_diff_tables_classification_property(ray_session, left, right):
    import ray.data as rd

    from maestro_ray.ops.diff import diff_tables

    def mk(d):
        return rd.from_arrow(pa.table({
            "k": pa.array(sorted(d), pa.int64()),
            "v": pa.array([d[k] for k in sorted(d)], pa.float64()),
        }))

    out = diff_tables(mk(left), mk(right), key="k", cols=["v"]) \
        .to_pandas()
    got = {int(r.k): r.diff_op for r in out.itertuples()}
    exp = {}
    for k in set(left) | set(right):
        if k not in left:
            exp[k] = "insert"
        elif k not in right:
            exp[k] = "delete"
        elif left[k] != right[k]:
            exp[k] = "update"
    assert got == exp
