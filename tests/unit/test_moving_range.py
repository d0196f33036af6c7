"""Unit oracles for the RANGE-frame (time-interval) moving aggregate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import moving_agg_range


def _frame(rng, n=300, null_frac=0.1, tie_frac=0.3):
    """Random keyed event frame with tied timestamps and null values."""
    ts = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        rng.integers(0, 3600, n), unit="s")
    # force ties: round a fraction of timestamps to the minute
    tie = rng.random(n) < tie_frac
    ts = pd.Series(ts).where(~tie, pd.Series(ts).dt.floor("min"))
    return pd.DataFrame({
        "k": rng.integers(0, 4, n),
        "ts": ts,
        "rid": np.arange(n),
        "v": np.where(rng.random(n) < null_frac, np.nan,
                      rng.normal(100.0, 30.0, n)),
    })


def _run(ray_session, df, parts, how, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
    out = moving_agg_range(ds, key="k", ts_col="ts", value_col="v",
                           preceding="10min", out="mv", how=how, **kw
                           ).to_pandas()
    return out.sort_values("rid").reset_index(drop=True)


@pytest.mark.parametrize("how,sql", [
    ("sum", "sum(v)"), ("avg", "avg(v)"), ("count", "count(v)")])
def test_range_frame_matches_duckdb(ray_session, how, sql):
    """RANGE INTERVAL-PRECEDING frames with tied timestamps and null
    values must match DuckDB's window engine (ties share one frame —
    both directions: earlier AND later peers included)."""
    import duckdb

    df = _frame(np.random.default_rng(7))
    got = _run(ray_session, df, 5, how)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"SELECT rid, {sql} OVER (PARTITION BY k ORDER BY ts "
        "RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW) "
        "AS mv FROM t ORDER BY rid").df()
    np.testing.assert_allclose(
        got["mv"].astype(float).to_numpy(),
        want["mv"].astype(float).to_numpy(), rtol=1e-9, equal_nan=True)


def test_prefix_sum_path_equals_direct_path(ray_session):
    """Forcing the O(n) prefix-sum fallback (direct_max_frame=1) must
    give the same answers as the per-frame direct path to float noise."""
    df = _frame(np.random.default_rng(13), n=200)
    direct = _run(ray_session, df, 3, "sum")
    prefix = _run(ray_session, df, 3, "sum", direct_max_frame=1)
    np.testing.assert_allclose(direct["mv"].to_numpy(),
                               prefix["mv"].to_numpy(),
                               rtol=1e-9, equal_nan=True)


def test_all_null_frame_and_null_ts_guard(ray_session):
    import ray.data as rd

    # a key whose every value is null -> sum/avg null, count 0
    df = pd.DataFrame({
        "k": [1, 1, 1],
        "ts": pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:01:00",
                              "2026-01-01 00:02:00"]),
        "rid": [0, 1, 2],
        "v": [np.nan, np.nan, np.nan],
    })
    s = _run(ray_session, df, 1, "sum")
    assert s["mv"].isna().all()
    c = _run(ray_session, df, 1, "count")
    assert c["mv"].tolist() == [0, 0, 0]

    bad = df.copy()
    bad.loc[1, "ts"] = pd.NaT
    ds = rd.from_arrow(pa.Table.from_pandas(bad))
    with pytest.raises(Exception, match="null 'ts'"):
        moving_agg_range(ds, key="k", ts_col="ts", value_col="v",
                         preceding="5min").materialize()
