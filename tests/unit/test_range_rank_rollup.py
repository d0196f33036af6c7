"""range/band joins, ranking windows, rollup, ordered string_agg —
brute-force oracles on deterministic synthetic tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import (
    grouped_string_agg,
    quantiles_cont,
    rank_window,
    rollup_agg,
)
from maestro_ray.ops.joins import band_join, range_join


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _points(rd, n=200, seed=7, with_nulls=True):
    rng = np.random.RandomState(seed)
    ts = rng.randint(0, 10_000, n).astype("int64")
    t = pa.table({
        "pid": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.randint(0, 9, n), pa.int64()),
        "ts": pa.array(ts, pa.int64()),
    })
    if with_nulls:
        mask = np.zeros(n, dtype=bool)
        mask[::37] = True
        t = t.set_column(
            2, "ts", pa.array(np.where(mask, None, ts), pa.int64())
        )
    return rd.from_arrow(t)


def _intervals(rd, n=40, seed=11):
    rng = np.random.RandomState(seed)
    lo = rng.randint(0, 9_500, n).astype("int64")
    span = rng.randint(0, 900, n).astype("int64")  # span 0 => empty interval
    t = pa.table({
        "k": pa.array(rng.randint(0, 12, n), pa.int64()),  # keys 9-11: no points
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(lo + span, pa.int64()),
        "iid": pa.array(np.arange(100, 100 + n), pa.int64()),
    })
    return rd.from_arrow(t)


def _brute_pairs(pts: pd.DataFrame, ivs: pd.DataFrame, keyed: bool):
    out = []
    for _, p in pts.iterrows():
        if pd.isna(p["ts"]):
            continue
        for _, iv in ivs.iterrows():
            if keyed and p["k"] != iv["k"]:
                continue
            if iv["lo"] <= p["ts"] < iv["hi"]:
                out.append((p["pid"], iv["iid"]))
    return sorted(out)


def test_range_join_matches_brute_force(rd):
    pts, ivs = _points(rd), _intervals(rd)
    out = range_join(pts, ivs, by="k", left_on="ts",
                     right_start="lo", right_end="hi",
                     right_cols=["iid"], num_buckets=5).to_pandas()
    got = sorted(zip(out["pid"], out["iid"]))
    want = _brute_pairs(pts.to_pandas(), ivs.to_pandas(), keyed=True)
    assert got == want and len(want) > 0
    # left columns + right minus key, left dtypes preserved
    assert list(out.columns) == ["pid", "k", "ts", "lo", "hi", "iid"]
    assert out["pid"].dtype == "int64"


def test_band_join_matches_brute_force_any_width(rd):
    pts, ivs = _points(rd), _intervals(rd)
    want = _brute_pairs(pts.to_pandas(), ivs.to_pandas(), keyed=False)
    # widths below/at/above typical span; 1000 puts interval ends
    # exactly on band edges for round lo values
    for width in (64, 1000, 50_000):
        out = band_join(pts, ivs, left_on="ts", right_start="lo",
                        right_end="hi", band_width=width,
                        right_cols=["iid"]).to_pandas()
        got = sorted(zip(out["pid"], out["iid"]))
        assert got == want, f"width={width}"
    assert "__band" not in out.columns


def test_band_join_edge_cases(rd):
    # interval ending exactly on a band edge must not leak into the
    # next band; empty (lo==hi) and null-bound intervals match nothing
    pts = rd.from_arrow(pa.table({
        "pid": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([99, 100, 250], pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "lo": pa.array([0, 200, None], pa.int64()),
        "hi": pa.array([100, 200, 300], pa.int64()),
        "iid": pa.array([1, 2, 3], pa.int64()),
    }))
    out = band_join(pts, ivs, left_on="ts", right_start="lo",
                    right_end="hi", band_width=100,
                    right_cols=["iid"]).to_pandas()
    assert sorted(zip(out["pid"], out["iid"])) == [(0, 1)]


def test_band_join_rejects_bad_width(rd):
    pts = _points(rd, n=4, with_nulls=False)
    with pytest.raises(ValueError, match="band_width"):
        band_join(pts, _intervals(rd, n=2), left_on="ts",
                  right_start="lo", right_end="hi", band_width=0)


def test_rank_window_row_number(rd):
    ds = _points(rd, with_nulls=False)
    out = rank_window(ds, key="k", order_cols=["ts", "pid"]).to_pandas()
    df = ds.to_pandas()
    df["rn"] = (
        df.sort_values(["ts", "pid"]).groupby("k").cumcount() + 1
    )
    got = out.sort_values("pid").reset_index(drop=True)
    want = df.sort_values("pid").reset_index(drop=True)[got.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
    assert got["rn"].dtype == "int64"


def test_rank_window_dense_rank_ties_and_nulls(rd):
    t = pa.table({
        "k": pa.array([1] * 6 + [2] * 2, pa.int64()),
        "v": pa.array([10, 10, 20, None, None, 30, 5, 5], pa.int64()),
        "pid": pa.array(range(8), pa.int64()),
    })
    out = rank_window(rd.from_arrow(t), key="k", order_cols=["v"],
                      method="dense_rank", out="dr").to_pandas()
    by_pid = out.set_index("pid")["dr"]
    # arrow sort places nulls last; ties share a rank with no gaps
    assert by_pid[0] == by_pid[1] == 1
    assert by_pid[2] == 2 and by_pid[5] == 3
    assert by_pid[3] == by_pid[4] == 4
    assert by_pid[6] == by_pid[7] == 1


def test_rank_window_rejects_bad_method(rd):
    # "rank" graduated to a real method in r3 — reject only unknowns
    with pytest.raises(ValueError, match="method"):
        rank_window(_points(rd), key="k", order_cols=["ts"],
                    method="rankle")


def test_rollup_agg_levels(rd):
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 300),
        "b": rng.choice(["p", "q", "r"], 300),
        "v": rng.randint(1, 100, 300).astype("float64"),
    })
    out = rollup_agg(
        rd.from_pandas(df), ["a", "b"],
        {"n": (None, "count"), "s": ("v", "sum"), "m": ("v", "mean"),
         "mx": ("v", "max")},
    )
    fin = df.groupby(["a", "b"])["v"].agg(["count", "sum", "mean", "max"])
    assert len(out) == len(fin) + df["a"].nunique() + 1
    total = out[(out.a == "ALL") & (out.b == "ALL")].iloc[0]
    assert total["n"] == 300 and total["s"] == pytest.approx(df["v"].sum())
    assert total["m"] == pytest.approx(df["v"].mean())
    assert total["mx"] == df["v"].max()
    xs = out[(out.a == "x") & (out.b == "ALL")].iloc[0]
    sub = df[df.a == "x"]["v"]
    assert xs["n"] == len(sub) and xs["m"] == pytest.approx(sub.mean())
    row = out[(out.a == "y") & (out.b == "r")].iloc[0]
    assert row["s"] == pytest.approx(fin.loc[("y", "r"), "sum"])
    assert out["n"].dtype == "int64"


def test_rollup_agg_rejects_std(rd):
    with pytest.raises(ValueError, match="std"):
        rollup_agg(_points(rd), ["k"], {"s": ("ts", "std")})


def test_quantiles_cont_matches_numpy_linear(rd):
    rng = np.random.RandomState(5)
    vals = rng.randint(0, 50, 400).astype("int64")  # heavy ties
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    qs = [0.0, 0.25, 0.5, 0.731, 1.0]
    out = quantiles_cont(ds, "v", qs)
    want = np.quantile(vals, qs, method="linear")
    assert out["q"].tolist() == qs
    np.testing.assert_allclose(out["value"].to_numpy(), want, rtol=0, atol=1e-12)


def test_quantiles_cont_single_value(rd):
    ds = rd.from_arrow(pa.table({"v": pa.array([7], pa.int64())}))
    out = quantiles_cont(ds, "v", [0.1, 0.9])
    assert out["value"].tolist() == [7.0, 7.0]


def test_grouped_string_agg_order_and_nulls(rd):
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array(["b", None, "a", "z", "y"], pa.string()),
        "o": pa.array([2, 1, 1, 1, 2], pa.int64()),
        "tb": pa.array([0, 0, 1, 0, 0], pa.int64()),
    })
    out = grouped_string_agg(rd.from_arrow(t), key="k", value_col="v",
                             order_cols=["o", "tb"]).to_pandas()
    seq = out.set_index("k")["seq"]
    # k=1 sorted by (o, tb): (1,0)->None dropped, (1,1)->'a', (2,0)->'b'
    assert seq[1] == "a,b" and seq[2] == "z,y"


def test_grouped_string_agg_all_null_key_yields_null(rd):
    # SQL string_agg over an all-null group is NULL, not ''
    t = pa.table({
        "k": pa.array([5, 5], pa.int64()),
        "v": pa.array([None, None], pa.string()),
        "o": pa.array([1, 2], pa.int64()),
    })
    out = grouped_string_agg(rd.from_arrow(t), key="k", value_col="v",
                             order_cols=["o"]).to_pandas()
    assert len(out) == 1 and pd.isna(out["seq"].iloc[0])


def test_quantiles_cont_ignores_nulls(rd):
    # SQL aggregates skip nulls; the null group must not poison the
    # cumulative walk with NaN
    ds = rd.from_arrow(pa.table({
        "v": pa.array([1, 2, 3, 4, None, None, None, None], pa.int64())
    }))
    out = quantiles_cont(ds, "v", [0.5])
    assert out["value"].tolist() == [2.5]


def test_quantiles_disc_ignores_nulls(rd):
    from maestro_ray.ops.aggregates import quantiles_disc

    ds = rd.from_arrow(pa.table({
        "v": pa.array([10, 20, 30, 40, None, None], pa.int64())
    }))
    out = quantiles_disc(ds, "v", [0.5, 1.0])
    assert out["value"].tolist() == [20, 40]


def test_rollup_agg_keeps_null_key_subtotals(rd):
    # pandas groupby default dropna=True would silently drop the
    # (a=NULL, b=ALL) subtotal while the grand total still counts the
    # rows — levels must stay mutually consistent
    t = pa.table({
        "a": pa.array(["x", "x", None, None], pa.string()),
        "b": pa.array(["p", "q", "p", "q"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    out = rollup_agg(rd.from_arrow(t), ["a", "b"],
                     {"n": (None, "count"), "s": ("v", "sum")})
    null_sub = out[out["a"].isna() & (out["b"] == "ALL")]
    assert len(null_sub) == 1
    assert null_sub["n"].iloc[0] == 2 and null_sub["s"].iloc[0] == 7.0
    total = out[(out["a"] == "ALL") & (out["b"] == "ALL")].iloc[0]
    assert total["n"] == 4 and total["s"] == 10.0


def test_band_join_big_int64_with_nulls_keeps_precision(rd):
    # a null in the column forces pandas/numpy toward float64 where
    # 2^53 and 2^53+1 collapse — bands must stay exact int64
    base = 2**53
    pts = rd.from_arrow(pa.table({
        "pid": pa.array([0, 1, 2], pa.int64()),
        "ts": pa.array([base, base + 1, None], pa.int64()),
    }))
    ivs = rd.from_arrow(pa.table({
        "lo": pa.array([base + 1], pa.int64()),
        "hi": pa.array([base + 2], pa.int64()),
        "iid": pa.array([9], pa.int64()),
    }))
    out = band_join(pts, ivs, left_on="ts", right_start="lo",
                    right_end="hi", band_width=1,
                    right_cols=["iid"]).to_pandas()
    assert sorted(zip(out["pid"], out["iid"])) == [(1, 9)]


def test_band_join_rejects_reserved_column_either_side(rd):
    pts = rd.from_arrow(pa.table({"ts": pa.array([1], pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "lo": pa.array([0], pa.int64()),
        "hi": pa.array([2], pa.int64()),
        "__band": pa.array([0], pa.int64()),
    }))
    with pytest.raises(ValueError, match="right"):
        band_join(pts, ivs, left_on="ts", right_start="lo",
                  right_end="hi", band_width=1)


def test_rank_window_dense_rank_big_int64(rd):
    # ordering values above 2^53: a float64 round-trip would merge
    # adjacent distinct values into one rank
    base = 2**53
    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "v": pa.array([base, base + 1, base + 1], pa.int64()),
        "pid": pa.array([0, 1, 2], pa.int64()),
    })
    out = rank_window(rd.from_arrow(t), key="k", order_cols=["v"],
                      method="dense_rank", out="dr").to_pandas()
    assert out.set_index("pid")["dr"].tolist() == [1, 2, 2]
