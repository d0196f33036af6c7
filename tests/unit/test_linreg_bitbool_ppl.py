"""Unit oracles for grouped_linreg, grouped_bitbool, and the corpus
bigram-LM perplexity scorer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import grouped_bitbool, grouped_linreg
from maestro_ray.ops.corpus import bigram_lm_perplexity


def _ds(df, parts=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


def _nullsafe(s):
    return [None if pd.isna(v) else v for v in s]


def test_linreg_edges_match_duckdb(ray_session):
    """Zero var(x), zero var(y) (r2=1 rule), n=1, one-sided nulls."""
    import duckdb

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3, 4, 4, 5, 5],
        "x": [1.0, 1.0, 1.0, 1.0, 2.0, 7.0, 1.0, 2.0, np.nan, 3.0],
        "y": [1.0, 2.0, 3.0, 5.0, 5.0, 9.0, 1.0, np.nan, 4.0, 2.0],
    })
    got = grouped_linreg(_ds(df), "k", "x", "y", round_to=9)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, round(regr_slope(y,x),9) AS slope, "
        "round(regr_intercept(y,x),9) AS intercept, "
        "round(regr_r2(y,x),9) AS r2, "
        "CAST(regr_count(y,x) AS BIGINT) AS n FROM t "
        "GROUP BY k ORDER BY k").df()
    for c in ("slope", "intercept", "r2", "n"):
        assert _nullsafe(got[c]) == _nullsafe(want[c]), c


def test_linreg_property_partition_invariant(ray_session):
    import duckdb

    rng = np.random.default_rng(19)
    df = pd.DataFrame({
        "k": rng.integers(0, 4, 600),
        "x": rng.normal(10, 3, 600),
    })
    df["y"] = 2.5 * df.x + rng.normal(0, 1, 600)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, round(regr_slope(y,x),6) s, "
        "round(regr_intercept(y,x),6) i, round(regr_r2(y,x),6) r "
        "FROM t GROUP BY k ORDER BY k").df()
    for parts in (1, 8):
        got = grouped_linreg(_ds(df, parts), "k", "x", "y", round_to=6)
        assert got["slope"].tolist() == want["s"].tolist()
        assert got["intercept"].tolist() == want["i"].tolist()
        assert got["r2"].tolist() == want["r"].tolist()


def test_bitbool_nulls_and_partition_invariance(ray_session):
    df = pd.DataFrame({
        "k": [1, 1, 2, 2, 3],
        "i": pd.array([6, 3, None, None, 5], dtype="Int64"),
        "b": pd.array([True, None, None, None, False], dtype="boolean"),
    })
    for parts in (1, 3):
        got = grouped_bitbool(_ds(df, parts), "k", int_col="i",
                              bool_col="b")
        assert _nullsafe(got["bit_and"]) == [2, None, 5]
        assert _nullsafe(got["bit_or"]) == [7, None, 5]
        assert _nullsafe(got["bit_xor"]) == [5, None, 5]
        assert _nullsafe(got["bool_and"]) == [True, None, False]
        assert _nullsafe(got["bool_or"]) == [True, None, False]
    with pytest.raises(ValueError, match="need int_col or bool_col"):
        grouped_bitbool(_ds(df, 1), "k")


def test_bitbool_single_column_modes(ray_session):
    df = pd.DataFrame({"k": [1, 1], "i": [12, 10], "b": [True, True]})
    ints = grouped_bitbool(_ds(df, 1), "k", int_col="i")
    assert list(ints.columns) == ["k", "bit_and", "bit_or", "bit_xor"]
    assert ints.iloc[0].tolist() == [1, 8, 14, 6]
    bools = grouped_bitbool(_ds(df, 1), "k", bool_col="b")
    assert list(bools.columns) == ["k", "bool_and", "bool_or"]


def test_perplexity_hand_case_and_outlier(ray_session):
    # tiny corpus: "a b" twice is the typical pattern; "z q" is atypical
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a b", "a b", "z q", "a"],  # doc 4: <2 tokens
    })
    out = bigram_lm_perplexity(_ds(docs, 2), round_to=9)
    assert out["doc_id"].tolist() == [1, 2, 3]  # doc 4 absent
    # V=4 {a,b,z,q}; c(ab)=3, c(ba)=1, c(zq)=1; CONTEXT counts are
    # bigram-first-token counts: c(a·)=3, c(b·)=1, c(z·)=1
    import math
    p_ab = (3 + 0.5) / (3 + 0.5 * 4)
    p_ba = (1 + 0.5) / (1 + 0.5 * 4)
    p_zq = (1 + 0.5) / (1 + 0.5 * 4)
    d1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3 / math.log(2)
    d2 = -math.log(p_ab) / math.log(2)
    d3 = -math.log(p_zq) / math.log(2)
    np.testing.assert_allclose(out["ppl_bits"].to_numpy(),
                               np.round([d1, d2, d3], 9))
    # the common pattern scores LOWER (more typical) than the rare one
    assert d2 < d3


def test_quantile_sketch_within_bin_error(ray_session):
    """Sketch quantiles on a continuous column must sit within the
    advertised one-bin-width error of the exact answer, and be
    partition-invariant (bincount partials are integer — exact
    merge)."""
    from maestro_ray.ops.aggregates import quantile_sketch

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"v": rng.lognormal(0.0, 1.0, 20000)})
    qs = [0.1, 0.5, 0.9, 0.99]
    # the sketch approximates the DISC order statistic at rank
    # max(1, ceil(q*n)) — the only target the one-bin bound covers
    sv = np.sort(df["v"].to_numpy())
    exact = [sv[max(1, int(np.ceil(q * len(sv)))) - 1] for q in qs]
    outs = []
    for parts in (2, 9):
        got = quantile_sketch(_ds(df, parts), "v", qs, n_bins=2048)
        for (_, row), ex in zip(got.iterrows(), exact):
            assert abs(row["value"] - ex) <= row["err_bound"] + 1e-9, \
                (row["q"], row["value"], ex)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_quantile_sketch_sparse_bins_bound_holds(ray_session):
    """Regression (r3 review): two far-apart points — the located
    order statistic must stay within one bin width even though the
    CONT-interpolated midpoint is half the range away."""
    from maestro_ray.ops.aggregates import quantile_sketch

    df = pd.DataFrame({"v": [0.0, 100.0]})
    got = quantile_sketch(_ds(df, 1), "v", [0.5, 1.0], n_bins=4096)
    # rank max(1, ceil(.5*2)) = 1 -> order stat 0.0; rank 2 -> 100.0
    assert abs(got.loc[0, "value"] - 0.0) <= got.loc[0, "err_bound"]
    assert abs(got.loc[1, "value"] - 100.0) <= got.loc[1, "err_bound"]
    # heavy tail: one outlier far from the mass
    df2 = pd.DataFrame({"v": [1.0] * 99 + [1e9]})
    got2 = quantile_sketch(_ds(df2, 3), "v", [0.5, 0.99, 1.0],
                           n_bins=1024)
    sv = np.sort(df2["v"].to_numpy())
    for _, row in got2.iterrows():
        ex = sv[max(1, int(np.ceil(row["q"] * len(sv)))) - 1]
        assert abs(row["value"] - ex) <= row["err_bound"] + 1e-6


def test_quantile_sketch_edges(ray_session):
    from maestro_ray.ops.aggregates import quantile_sketch

    # constant column: zero width, exact answer
    const = pd.DataFrame({"v": [3.5] * 100})
    got = quantile_sketch(_ds(const, 2), "v", [0.0, 0.5, 1.0])
    assert got["value"].tolist() == [3.5, 3.5, 3.5]
    # all-null column: NaN quantiles, no crash
    nul = pd.DataFrame({"v": [np.nan] * 10})
    got = quantile_sketch(_ds(nul, 2), "v", [0.5])
    assert np.isnan(got["value"]).all()
    with pytest.raises(ValueError, match="empty quantile"):
        quantile_sketch(_ds(const, 1), "v", [])
