"""ROW-frame moving aggregates (ops/aggregates.py moving_agg): every
mode (sum/avg/min/max) must match DuckDB's windowed aggregate over the
same frame, including null handling and short leading frames."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import moving_agg


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n = 600
    vals = rng.uniform(0, 100, n).round(2)
    vals[rng.random(n) < 0.15] = np.nan  # nulls inside frames
    return pd.DataFrame({
        "k": rng.integers(0, 25, n),
        "o": np.arange(n),  # unique order tiebreak
        "v": vals,
    })


@pytest.mark.parametrize("how,fn", [
    ("sum", "sum"), ("avg", "avg"), ("min", "min"), ("max", "max"),
])
@pytest.mark.parametrize("window", [1, 3, 7])
def test_matches_duckdb_window(ray_session, data, how, fn, window):
    out = moving_agg(
        rd.from_pandas(data), key="k", order_cols=["o"], value_col="v",
        window=window, out="m", how=how,
    ).to_pandas().sort_values("o").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", data)
    exp = con.execute(
        f"SELECT k, o, v, {fn}(v) OVER (PARTITION BY k ORDER BY o "
        f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW) AS m "
        "FROM t ORDER BY o"
    ).fetchdf()
    assert np.allclose(out["m"], exp["m"], equal_nan=True, atol=1e-9)


def test_all_null_frame_is_null(ray_session):
    df = pd.DataFrame({"k": [1, 1, 1], "o": [0, 1, 2],
                       "v": [np.nan, np.nan, 5.0]})
    out = moving_agg(rd.from_pandas(df), key="k", order_cols=["o"],
                     value_col="v", window=2, out="m", how="sum") \
        .to_pandas().sort_values("o")
    assert np.isnan(out["m"].iloc[0]) and np.isnan(out["m"].iloc[1])
    assert out["m"].iloc[2] == 5.0


def test_rejects_unknown_mode(ray_session):
    df = pd.DataFrame({"k": [1], "o": [0], "v": [1.0]})
    with pytest.raises(ValueError, match="how="):
        moving_agg(rd.from_pandas(df), key="k", order_cols=["o"],
                   value_col="v", window=2, how="median")


def test_ewma_bitwise_matches_manual_recursion(ray_session):
    """The float contract the SQL twin relies on: pandas ewm
    (adjust=False) == the (1-α)y + αx fold, BITWISE, for binary-exact
    α."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.aggregates import ewma

    rng = np.random.default_rng(3)
    n = 300
    keys = rng.integers(0, 7, n)
    x = rng.uniform(0, 10000, n)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(x, pa.float64()),
    })).repartition(5)
    got = ewma(ds, key="k", order_cols=["o"], value_col="v", alpha=0.25) \
        .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    import pandas as pd_
    df = pd_.DataFrame({"k": keys, "o": np.arange(n), "v": x}) \
        .sort_values(["k", "o"])
    want = []
    for _, g in df.groupby("k"):
        y = None
        for v in g.v:
            y = v if y is None else 0.75 * y + 0.25 * v
            want.append(y)
    assert (got.ewma.to_numpy() == np.array(want)).all()

    import pytest as pt
    with pt.raises(ValueError):
        ewma(ds, key="k", order_cols=["o"], value_col="v", alpha=0.0)


def test_running_agg_null_handling(ray_session):
    """Leading nulls → null sum/min/max/avg and count 0; nulls never
    contribute (SQL window-aggregate rule)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.aggregates import running_agg

    ds = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 1],
        "o": [1, 2, 3, 4],
        "v": pa.array([None, 2.0, None, 5.0], pa.float64()),
    }))
    out = running_agg(ds, "k", ["o"], "v",
                      {"n": "count", "s": "sum", "mn": "min",
                       "mx": "max", "a": "avg"}) \
        .to_pandas().sort_values("o").reset_index(drop=True)
    assert list(out.n) == [0, 1, 1, 2]
    import pandas as pd_
    assert pd_.isna(out.s.iloc[0]) and pd_.isna(out.mn.iloc[0]) \
        and pd_.isna(out.a.iloc[0])
    assert list(out.s)[1:] == [2.0, 2.0, 7.0]
    assert list(out.mn)[1:] == [2.0, 2.0, 2.0]
    assert list(out.mx)[1:] == [2.0, 2.0, 5.0]
    assert list(out.a)[1:] == [2.0, 2.0, 3.5]

    import pytest as pt
    with pt.raises(ValueError):
        running_agg(ds, "k", ["o"], "v", {"x": "median"})


def test_moving_median_nulls_and_guard(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from maestro_ray.ops.aggregates import moving_median

    ds = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 1],
        "o": [1, 2, 3, 4],
        "v": pa.array([None, 4.0, 2.0, None], pa.float64()),
    }))
    out = moving_median(ds, "k", ["o"], "v", window=2) \
        .to_pandas().sort_values("o").reset_index(drop=True)
    import pandas as pd_
    assert pd_.isna(out.mov_median.iloc[0])       # all-null frame
    assert out.mov_median.iloc[1] == 4.0          # (null,4) -> 4
    assert out.mov_median.iloc[2] == 3.0          # (4,2) -> interpolated
    assert out.mov_median.iloc[3] == 2.0          # (2,null) -> 2

    import pytest as pt
    with pt.raises(ValueError):
        moving_median(ds, "k", ["o"], "v", window=0)


def test_anomaly_zscore_vs_duckdb(ray_session):
    """Rolling z-score anomaly flags match DuckDB's windowed
    avg/stddev_pop, incl. nulls, zero-variance frames, and the
    round-before-threshold flag contract."""
    from maestro_ray.ops.aggregates import anomaly_zscore

    rng = np.random.default_rng(7)
    n = 400
    vals = rng.normal(50, 5, n).round(3)
    vals[rng.random(n) < 0.1] = np.nan
    vals[50] = 500.0      # planted spike
    vals[200:210] = 42.0  # zero-variance stretch
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "i": np.arange(n),
        "v": vals,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = anomaly_zscore(ds, "k", ["i"], "v", window=8, threshold=2.0) \
        .to_pandas().sort_values("i").reset_index(drop=True)
    exp = duckdb.query_df(df, "t", """
        WITH w AS (SELECT k, i, v, avg(v) OVER f AS m,
          stddev_pop(v) OVER f AS s FROM t WINDOW f AS (
          PARTITION BY k ORDER BY i
          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT k, i, CASE WHEN s > 0 THEN round((v - m)/s, 4) END
          AS zscore, CAST(CASE WHEN s > 0 AND
          abs(round((v - m)/s, 4)) > 2.0 THEN 1 ELSE 0 END AS BIGINT)
          AS is_anomaly FROM w ORDER BY i
    """).df()
    pd.testing.assert_series_equal(got["zscore"], exp["zscore"],
                                   check_exact=True)
    pd.testing.assert_series_equal(got["is_anomaly"], exp["is_anomaly"])
    assert got.loc[got.i == 50, "is_anomaly"].iloc[0] == 1
    with pytest.raises(ValueError, match="window"):
        anomaly_zscore(ds, "k", ["i"], "v", window=0, threshold=2.0)
    with pytest.raises(ValueError, match="threshold"):
        anomaly_zscore(ds, "k", ["i"], "v", window=8, threshold=0.0)


# -------------------------------------------------------------- moving_corr


def test_moving_corr_matches_pandas_rolling(ray_session):
    import ray.data as rd

    from maestro_ray.ops.aggregates import moving_corr

    rng = np.random.default_rng(9)
    n = 120
    t = pa.table({
        "k": pa.array(rng.integers(0, 3, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "x": pa.array(rng.integers(0, 50, n), pa.int64()),
        "y": pa.array(rng.integers(0, 1000, n), pa.int64()),
    })
    out = moving_corr(rd.from_arrow(t).repartition(4), "k", ["o"],
                      "x", "y", window=6).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    want = (df.groupby("k")
            .apply(lambda g: g["x"].rolling(6, min_periods=2)
                   .corr(g["y"]), include_groups=False)
            .reset_index(drop=True))
    got = out["mov_corr"]
    mask = ~want.isna().to_numpy()
    np.testing.assert_allclose(got.to_numpy()[mask],
                               want.to_numpy()[mask], rtol=1e-12)
    # pandas yields NaN/inf where variance is 0 — we pin null there too
    assert np.isnan(got.to_numpy()[~np.isfinite(want.to_numpy())]).all()


def test_moving_corr_null_pairs_excluded(ray_session):
    import ray.data as rd

    from maestro_ray.ops.aggregates import moving_corr

    t = pa.table({
        "k": pa.array([1] * 5, pa.int64()),
        "o": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "x": pa.array([1, 2, None, 4, 5], pa.int64()),
        "y": pa.array([2, 4, 9, 8, 10], pa.int64()),
    })
    out = moving_corr(rd.from_arrow(t), "k", ["o"], "x", "y",
                      window=5).to_pandas().sort_values("o")
    # last frame: pairs (1,2),(2,4),(4,8),(5,10) — perfectly linear
    assert out["mov_corr"].iloc[-1] == pytest.approx(1.0)
    # first frame: single pair → n<2 → null
    assert np.isnan(out["mov_corr"].iloc[0])


def test_moving_corr_window_guard(ray_session):
    import ray.data as rd

    from maestro_ray.ops.aggregates import moving_corr

    t = pa.table({"k": pa.array([1]), "o": pa.array([1]),
                  "x": pa.array([1]), "y": pa.array([1])})
    with pytest.raises(ValueError, match="window > 256"):
        moving_corr(rd.from_arrow(t), "k", ["o"], "x", "y", window=500)


def test_moving_corr_rejects_degenerate_window(ray_session):
    import ray.data as rd

    from maestro_ray.ops.aggregates import moving_corr

    t = pa.table({"k": pa.array([1]), "o": pa.array([1]),
                  "x": pa.array([1]), "y": pa.array([1])})
    for w in (0, 1):
        with pytest.raises(ValueError, match=">= 2"):
            moving_corr(rd.from_arrow(t), "k", ["o"], "x", "y", window=w)
