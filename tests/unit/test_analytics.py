"""Unit oracles for the event-analytics ops: ordered funnel and cohort
retention."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.analytics import cohort_retention, funnel


def _ds(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def _ev(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]) \
        .assign(ts=lambda d: pd.to_datetime(d.ts))


def test_funnel_strict_order_and_ties(ray_session):
    df = _ev([
        # u1: full funnel in order
        (1, "2026-01-01 00:00", "view"),
        (1, "2026-01-01 01:00", "click"),
        (1, "2026-01-01 02:00", "purchase"),
        # u2: click BEFORE view -> depth 1 (strict after)
        (2, "2026-01-01 01:00", "click"),
        (2, "2026-01-01 02:00", "view"),
        # u3: click at the SAME instant as view -> tie does not advance
        (3, "2026-01-01 00:00", "view"),
        (3, "2026-01-01 00:00", "click"),
        # u4: never viewed -> absent from output
        (4, "2026-01-01 00:00", "purchase"),
        # u5: view then a LATER click than an earlier ignored one
        (5, "2026-01-01 02:00", "view"),
        (5, "2026-01-01 01:00", "click"),
        (5, "2026-01-01 03:00", "click"),
    ])
    out = funnel(_ds(df), "user_id", "ts", "event_type",
                 ["view", "click", "purchase"]).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2, 3, 5]
    assert out["funnel_depth"].tolist() == [3, 1, 1, 2]
    assert out.loc[0, "ts_3"] == pd.Timestamp("2026-01-01 02:00")
    assert pd.isna(out.loc[1, "ts_2"])
    assert out.loc[3, "ts_2"] == pd.Timestamp("2026-01-01 03:00")
    with pytest.raises(ValueError, match="2 steps"):
        funnel(_ds(df), "user_id", "ts", "event_type", ["view"])


def test_cohort_retention_hand_case(ray_session):
    wk = pd.Timedelta("7d")
    # epoch-aligned base so the hand math is readable
    base = pd.Timestamp("1970-01-01") + 2800 * wk
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [base, base + wk, base + 3 * wk,   # u1: w0, w1, w3
               base, base + wk,                  # u2: w0, w1
               base + wk],                       # u3 cohorts a week later
    })
    out = cohort_retention(_ds(df), "user_id", "ts", period="1w") \
        .to_pandas().sort_values(["cohort", "period_index"]) \
        .reset_index(drop=True)
    got = list(zip(out["cohort"], out["period_index"], out["n_active"]))
    assert got == [
        (base, 0, 2), (base, 1, 2), (base, 3, 1),
        (base + wk, 0, 1),
    ]


def test_analytics_partition_invariance(ray_session):
    rng = np.random.default_rng(31)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, 500),
        "ts": pd.Timestamp("2026-01-01")
        + pd.to_timedelta(rng.integers(0, 40 * 86400, 500), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], 500),
    })
    f = [funnel(_ds(df, p), "user_id", "ts", "event_type",
                ["view", "click", "purchase"]).to_pandas()
         .sort_values("user_id").reset_index(drop=True) for p in (1, 7)]
    pd.testing.assert_frame_equal(f[0], f[1])
    c = [cohort_retention(_ds(df, p), "user_id", "ts").to_pandas()
         .sort_values(["cohort", "period_index"]).reset_index(drop=True)
         for p in (1, 7)]
    pd.testing.assert_frame_equal(c[0], c[1])


def test_interp_fill_edges_and_weights(ray_session):
    import numpy as np
    import pandas as pd_
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.aggregates import interp_fill

    t = pd_.Timestamp
    ds = rd.from_arrow(pa.table({
        "k": [1] * 5,
        "ts": [t("2024-01-01"), t("2024-01-02"), t("2024-01-04"),
               t("2024-01-05"), t("2024-01-06")],
        "v": pa.array([None, 10.0, None, 40.0, None], pa.float64()),
    }))
    out = interp_fill(ds, key="k", ts_col="ts", value_col="v") \
        .to_pandas().sort_values("ts").reset_index(drop=True)
    vi = out.value_interp
    assert pd_.isna(vi.iloc[0]) and pd_.isna(vi.iloc[4])  # no extrapolation
    assert vi.iloc[1] == 10.0 and vi.iloc[3] == 40.0      # passthrough
    # Jan 4 is 2/3 of the way from Jan 2 to Jan 5: 10 + 30*(2/3) = 30
    assert abs(vi.iloc[2] - 30.0) < 1e-9


def test_ohlc_buckets(ray_session):
    import pandas as pd_
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.analytics import ohlc

    t = pd_.Timestamp
    ds = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 1],
        "ts": [t("2024-01-01 01:00"), t("2024-01-01 09:00"),
               t("2024-01-02 03:00"), t("2024-01-01 05:00")],
        "seq": [1, 2, 3, 4],
        "v": pa.array([5.0, 2.0, 7.0, None], pa.float64()),
    }))
    out = ohlc(ds, key="k", ts_col="ts", value_col="v", bucket="1D",
               seq_col="seq").to_pandas().sort_values("bucket_ts") \
        .reset_index(drop=True)
    assert len(out) == 2
    d1 = out.iloc[0]
    assert (d1.open, d1.high, d1.low, d1.close, d1.n) == (5.0, 5.0, 2.0, 2.0, 2)
    d2 = out.iloc[1]
    assert (d2.open, d2.close, d2.n) == (7.0, 7.0, 1)


# ------------------------------------------------------------------- cusum


def test_cusum_matches_recursion(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import cusum

    rng = np.random.default_rng(17)
    n = 200
    t = pa.table({
        "k": pa.array(rng.integers(0, 4, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "x": pa.array(rng.integers(0, 20, n), pa.int64()),
    })
    out = cusum(rd.from_arrow(t).repartition(3), "k", ["o"], "x",
                drift=9, threshold=15).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = []
    state = {}
    for _, r in df.iterrows():
        s = max(0, state.get(r["k"], 0) + (int(r["x"]) - 9))
        state[r["k"]] = s
        want.append(s)
    assert out["cusum"].tolist() == want
    assert out["alarm"].tolist() == [w > 15 for w in want]


def test_cusum_rejects_nulls(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import cusum

    t = pa.table({"k": pa.array([1, 1]), "o": pa.array([1, 2]),
                  "x": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="null"):
        cusum(rd.from_arrow(t), "k", ["o"], "x", 0, 1).to_pandas()


# ----------------------------------------------------------------- skyline


def _sky_brute(xy):
    # dominance needs >= in both coordinates and > in at least one —
    # so a duplicate point never dominates its twin (both kept)
    out = []
    for i, (x, y) in enumerate(xy):
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (x2, y2) in enumerate(xy) if j != i)
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_matches_bruteforce(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import skyline_2d

    rng = np.random.default_rng(23)
    xy = [(float(a), float(b))
          for a, b in rng.integers(0, 30, size=(300, 2))]
    t = pa.table({"x": pa.array([p[0] for p in xy], pa.float64()),
                  "y": pa.array([p[1] for p in xy], pa.float64())})
    out = skyline_2d(rd.from_arrow(t).repartition(5), "x", "y")
    assert list(zip(out["x"], out["y"])) == _sky_brute(xy)


def test_skyline_keeps_duplicate_frontier_points(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import skyline_2d

    t = pa.table({"x": pa.array([1.0, 1.0, 0.0], pa.float64()),
                  "y": pa.array([2.0, 2.0, 9.0], pa.float64())})
    out = skyline_2d(rd.from_arrow(t), "x", "y")
    assert list(zip(out["x"], out["y"])) == [(0.0, 9.0), (1.0, 2.0),
                                             (1.0, 2.0)]


def test_skyline_guard_fires(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import skyline_2d

    # anti-correlated: the frontier IS the dataset
    n = 50
    t = pa.table({"x": pa.array(np.arange(n, dtype=np.float64)),
                  "y": pa.array(np.arange(n, 0, -1, dtype=np.float64))})
    with pytest.raises(RuntimeError, match="driver bound"):
        skyline_2d(rd.from_arrow(t), "x", "y", max_frontier=10)


# --------------------------------------------------------- merge_intervals


def test_merge_intervals_islands(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import merge_intervals

    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "s": pa.array([0, 5, 20, 22, 100], pa.int64()),
        "e": pa.array([10, 12, 21, 30, 101], pa.int64()),
    })
    out = merge_intervals(rd.from_arrow(t).repartition(2), "k", "s", "e") \
        .to_pandas().sort_values(["k", "island"]).reset_index(drop=True)
    # k=1: [0,10)+[5,12) merge; [20,21)+[22,30) do NOT touch → 2 islands
    assert out[out["k"] == 1][["start_ts", "end_ts", "n"]].values.tolist() \
        == [[0, 12, 2], [20, 21, 1], [22, 30, 1]]
    assert out[out["k"] == 1]["island"].tolist() == [1, 2, 3]
    assert out[out["k"] == 2][["start_ts", "end_ts", "n"]].values.tolist() \
        == [[100, 101, 1]]


def test_merge_intervals_touching_and_contained(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import merge_intervals

    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "s": pa.array([0, 10, 2], pa.int64()),   # [0,10) touches [10,20)
        "e": pa.array([10, 20, 5], pa.int64()),  # [2,5) contained
    })
    out = merge_intervals(rd.from_arrow(t), "k", "s", "e").to_pandas()
    assert len(out) == 1
    assert out.iloc[0][["start_ts", "end_ts", "n"]].tolist() == [0, 20, 3]


def test_merge_intervals_rejects_nulls(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import merge_intervals

    t = pa.table({"k": pa.array([1, 1]), "s": pa.array([0, None],
                                                       pa.int64()),
                  "e": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="null interval"):
        merge_intervals(rd.from_arrow(t), "k", "s", "e").to_pandas()


def test_skyline_nan_coordinates_dropped(ray_session):
    import ray.data as rd

    from maestro_ray.ops.analytics import skyline_2d

    # one NaN y used to poison the running max: the dominated (2, 1)
    # escaped the mask (review r4 s6 #4)
    t = pa.table({"x": pa.array([3.0, 2.5, 2.0], pa.float64()),
                  "y": pa.array([float("nan"), 10.0, 1.0], pa.float64())})
    out = skyline_2d(rd.from_arrow(t), "x", "y")
    assert list(zip(out["x"], out["y"])) == [(2.5, 10.0)]
