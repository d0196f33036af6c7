"""Unit oracles for ffill / gap_fill / mad_grouped / grouped_arg_extremum
/ the distribution rank windows (ntile, percent_rank, cume_dist, rank)
and the webtext boilerplate + blocklist ops."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import (
    ffill,
    gap_fill,
    grouped_arg_extremum,
    mad_grouped,
    rank_window,
)
from maestro_ray.ops.web import blocklist_count, boilerplate_chunks


def _ds(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


# ------------------------------------------------------------------ ffill


def test_ffill_leading_nulls_and_dtype(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2],
        "o": [1, 2, 3, 4, 1, 2],
        "v": ["x", None, None, "y", None, None],
    })
    out = ffill(_ds(df), "k", ["o"], "v", out="f").to_pandas() \
        .sort_values(["k", "o"])
    assert out["f"].tolist() == ["x", "x", "x", "y", None, None]
    # filled column is a gather of the original -> dtype preserved
    assert out["f"].dtype == object


def test_ffill_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 400),
        "o": np.arange(400),
        "v": np.where(rng.random(400) < 0.4, np.nan,
                      rng.normal(0, 1, 400)),
    })
    got = ffill(_ds(df, 5), "k", ["o"], "v", out="f").to_pandas() \
        .sort_values("o").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT o, last_value(v IGNORE NULLS) OVER (PARTITION BY k "
        "ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS f FROM t ORDER BY o").df()
    np.testing.assert_allclose(got["f"].to_numpy(dtype=float),
                               want["f"].to_numpy(dtype=float),
                               equal_nan=True)


# ---------------------------------------------------------------- gap_fill


def test_gap_fill_fills_missing_buckets(ray_session):
    ts = pd.to_datetime(["2026-01-01 00:10", "2026-01-01 03:20",
                         "2026-01-01 03:40"])
    df = pd.DataFrame({"k": [7, 7, 7], "ts": ts, "v": [1.0, 2.0, 3.0]})
    out = gap_fill(_ds(df, 1), "k", "ts", "1h", "v").to_pandas() \
        .sort_values("bucket").reset_index(drop=True)
    assert len(out) == 4  # 00:00 .. 03:00 inclusive
    assert out["value_sum"].tolist() == [1.0, 0.0, 0.0, 5.0]
    assert out["bucket"].iloc[1] == pd.Timestamp("2026-01-01 01:00")


def test_gap_fill_null_ts_guard_and_custom_fill(ray_session):
    df = pd.DataFrame({
        "k": [1, 1], "ts": pd.to_datetime(["2026-01-01", None]),
        "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="null 'ts'"):
        gap_fill(_ds(df, 1), "k", "ts", "1h", "v").materialize()
    ok = df.dropna()
    out = gap_fill(_ds(ok, 1), "k", "ts", "1h", "v",
                   fill=-1.0).to_pandas()
    assert len(out) == 1 and out["value_sum"].iloc[0] == 1.0


# ------------------------------------------------------------- mad_grouped


def test_mad_matches_duckdb_with_nulls(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 500),
        # discrete values -> count-merge partials stay small
        "v": np.where(rng.random(500) < 0.1, np.nan,
                      rng.integers(0, 40, 500).astype(float)),
    })
    got = mad_grouped(_ds(df, 4), "k", "v", round_to=9) \
        .sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("SELECT k, round(mad(v), 9) AS mad FROM t "
                       "GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------- grouped_arg_extremum


def test_arg_extremum_ties_nulls_and_min(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "a": [5.0, 5.0, 1.0, np.nan, 2.0, np.nan],
        "tb": [9, 4, 1, 1, 2, 1],
        "p": list("abcdef"),
    })
    got = grouped_arg_extremum(_ds(df, 3), "k", "a", "tb", ["p"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # k=1: tie at a=5 -> smallest tb (4) wins; k=2: null never wins;
    # k=3: all-null key absent
    assert got["k"].tolist() == [1, 2]
    assert got["p"].tolist() == ["b", "e"]
    lo = grouped_arg_extremum(_ds(df, 3), "k", "a", "tb", ["p"],
                              how="min").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert lo["p"].tolist() == ["c", "e"]


def test_arg_extremum_partition_invariant(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "k": rng.integers(0, 6, 300),
        "a": rng.integers(0, 10, 300).astype(float),  # many ties
        "tb": np.arange(300),
        "p": rng.integers(0, 1000, 300),
    })
    outs = [
        grouped_arg_extremum(_ds(df, p), "k", "a", "tb", ["p"])
        .to_pandas().sort_values("k").reset_index(drop=True)
        for p in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1], check_dtype=False)


# ------------------------------------------------------- rank distribution


def test_rank_distribution_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 400),
        "rid": np.arange(400),
        # heavy ties + nulls: the tie-aware methods must share ranks
        "v": np.where(rng.random(400) < 0.15, np.nan,
                      rng.integers(0, 8, 400).astype(float)),
    })
    got = rank_window(_ds(df, 5), "k", ["v"],
                      methods={"rk": "rank", "pr": "percent_rank",
                               "cd": "cume_dist"}).to_pandas()
    got = rank_window(_ds(got, 5), "k", ["rid"],
                      methods={"n3": "ntile"}, n_tiles=3).to_pandas() \
        .sort_values("rid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT rid, rank() OVER w AS rk, percent_rank() OVER w AS pr, "
        "cume_dist() OVER w AS cd, ntile(3) OVER (PARTITION BY k "
        "ORDER BY rid) AS n3 FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY v) ORDER BY rid").df()
    for c in ("rk", "pr", "cd", "n3"):
        np.testing.assert_allclose(got[c].to_numpy(dtype=float),
                                   want[c].to_numpy(dtype=float),
                                   err_msg=c)


def test_ntile_fewer_rows_than_tiles_and_guards(ray_session):
    df = pd.DataFrame({"k": [1, 1], "o": [1, 2]})
    out = rank_window(_ds(df, 1), "k", ["o"], methods={"t": "ntile"},
                      n_tiles=5).to_pandas().sort_values("o")
    assert out["t"].tolist() == [1, 2]
    with pytest.raises(ValueError, match="n_tiles"):
        rank_window(_ds(df, 1), "k", ["o"], method="ntile")
    with pytest.raises(ValueError, match="method="):
        rank_window(_ds(df, 1), "k", ["o"], method="nope")


# ------------------------------------------------------- webtext operators


def test_boilerplate_removes_all_occurrences(ray_session):
    boiler = "click here to subscribe"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [f"{boiler} unique one", f"{boiler} unique two",
                 f"{boiler} unique three", boiler],
    })
    out = boilerplate_chunks(_ds(docs, 2), chunk_tokens=4, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # the 4-token boilerplate chunk appears in 4 docs >= 3 -> removed
    # everywhere, INCLUDING its first occurrence; doc 4 disappears
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["text_clean"].tolist() == ["unique one", "unique two",
                                          "unique three"]
    assert (out["n_chunks_kept"] == 1).all()


def test_blocklist_word_boundaries(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["bad stuff and bad words", "badge is not bad-free",
                 "clean text"],
    })
    out = blocklist_count(_ds(docs, 2), "text", ["bad"]).to_pandas() \
        .sort_values("doc_id")
    # 'badge' must NOT match; 'bad-free' has a word boundary -> matches
    assert out["n_blocked"].tolist() == [2, 1, 0]
    with pytest.raises(ValueError, match="empty term"):
        blocklist_count(_ds(docs, 1), "text", [])


def test_lag_lead_offset_and_default(ray_session):
    from maestro_ray.ops.aggregates import lag_lead

    df = pd.DataFrame({"k": [1, 1, 1, 1, 2],
                       "o": [1, 2, 3, 4, 1],
                       "v": [10.0, 20.0, 30.0, 40.0, 99.0]})
    out = lag_lead(_ds(df, 2), "k", ["o"], "v", offset=2,
                   default=-1.0).to_pandas().sort_values(["k", "o"])
    assert out["prev_value"].tolist() == [-1.0, -1.0, 10.0, 20.0, -1.0]
    assert out["next_value"].tolist() == [30.0, 40.0, -1.0, -1.0, -1.0]
    # default=None -> SQL NULL fill
    nul = lag_lead(_ds(df, 2), "k", ["o"], "v", offset=3).to_pandas() \
        .sort_values(["k", "o"])
    assert nul["prev_value"].isna().tolist() == [True, True, True,
                                                 False, True]
    with pytest.raises(ValueError, match="offset"):
        lag_lead(_ds(df, 1), "k", ["o"], "v", offset=0)
