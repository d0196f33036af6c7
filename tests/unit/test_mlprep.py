"""ML-prep ops (ops/mlprep.py): null safety, zero variance, frozen
categories, unseen keys."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.mlprep import (bin_equal_width, categorical_encode,
                                    one_hot, standardize, target_encode)


def test_standardize_zero_variance_and_nulls(ray_session):
    t = pa.table({
        "k": ["a", "a", "b", "b", None, "a"],
        "v": pa.array([1.0, 3.0, 5.0, 5.0, 2.0, None], pa.float64()),
    })
    out = standardize(rd.from_arrow(t), "k", "v").to_pandas()
    a = out[out.k == "a"].z.dropna().to_numpy()
    assert np.allclose(sorted(a), [-1.0, 1.0])       # μ=2, σ_pop=1
    assert out[out.k == "b"].z.isna().all()          # zero variance
    assert out[out.k.isna()].z.isna().all()          # null key
    assert out[(out.k == "a") & out.v.isna()].z.isna().all()


def test_one_hot_frozen_categories_and_nulls(ray_session):
    t = pa.table({"c": ["x", "y", None, "z"]})
    out = one_hot(rd.from_arrow(t), "c", categories=["x", "y"]).to_pandas()
    assert list(out.c_x) == [1, 0, 0, 0]
    assert list(out.c_y) == [0, 1, 0, 0]
    assert "c_z" not in out.columns                  # frozen space
    # inferred categories exclude nulls
    out2 = one_hot(rd.from_arrow(t), "c").to_pandas()
    assert {"c_x", "c_y", "c_z"} <= set(out2.columns)


def test_bin_equal_width_edges_clip_and_nulls(ray_session):
    t = pa.table({"v": pa.array([0.0, 2.5, 5.0, 9.999, 10.0, None],
                                pa.float64())})
    out = bin_equal_width(rd.from_arrow(t), "v", 4).to_pandas()
    # lo=0 hi=10 w=2.5 → bins 1..4; hi itself clips into the top bin
    assert list(out.bin.dropna()) == [1, 2, 3, 4, 4]
    assert out.bin.isna().sum() == 1


def test_bin_equal_width_explicit_bounds_clip(ray_session):
    t = pa.table({"v": pa.array([-5.0, 0.0, 50.0, 120.0], pa.float64())})
    out = bin_equal_width(rd.from_arrow(t), "v", 10, lo=0.0,
                          hi=100.0).to_pandas()
    assert list(out.bin) == [1, 1, 6, 10]  # out-of-range clips to edges


def test_bin_equal_width_constant_and_all_null(ray_session):
    t = pa.table({"v": pa.array([7.0, 7.0, None], pa.float64())})
    out = bin_equal_width(rd.from_arrow(t), "v", 5).to_pandas()
    assert list(out.bin.dropna()) == [1, 1]          # lo == hi → bin 1
    t2 = pa.table({"v": pa.array([None, None], pa.float64())})
    out2 = bin_equal_width(rd.from_arrow(t2), "v", 5).to_pandas()
    assert out2.bin.isna().all()
    with pytest.raises(ValueError, match="n_bins"):
        bin_equal_width(rd.from_arrow(t), "v", 0)


def test_target_encode_smoothing_and_priors(ray_session):
    t = pa.table({
        "k": ["a", "a", "b", None, "c", "c"],
        "y": pa.array([1.0, 3.0, 10.0, 5.0, None, None], pa.float64()),
    })
    out = target_encode(rd.from_arrow(t), "k", "y", smoothing=2.0) \
        .to_pandas()
    # prior over non-null-key rows: (1+3+10)/3
    gm = 14.0 / 3.0
    enc = dict(zip(out.k.fillna("<null>"), out.enc))
    assert enc["a"] == pytest.approx((4.0 + 2 * gm) / 4.0)
    assert enc["b"] == pytest.approx((10.0 + 2 * gm) / 3.0)
    assert enc["c"] == pytest.approx(gm)             # all-null targets
    assert enc["<null>"] == pytest.approx(gm)        # null key → prior
    with pytest.raises(ValueError, match="smoothing"):
        target_encode(rd.from_arrow(t), "k", "y", smoothing=-1.0)


def test_target_encode_all_null_targets(ray_session):
    t = pa.table({"k": ["a", "b"],
                  "y": pa.array([None, None], pa.float64())})
    out = target_encode(rd.from_arrow(t), "k", "y").to_pandas()
    assert out.enc.isna().all()                      # no prior exists


def test_categorical_encode_dense_rank_semantics(ray_session):
    t = pa.table({"c": ["m", "z", "a", "m", None]})
    out = categorical_encode(rd.from_arrow(t), "c").to_pandas()
    got = dict(zip(out.c, out.code))
    assert got["a"] == 1 and got["m"] == 2 and got["z"] == 3
    assert out[out.c.isna()].code.isna().all()


# ----------------------------------------------------------------- winsorize


def test_winsorize_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd_mod

    from maestro_ray.ops.mlprep import winsorize

    rng = np.random.default_rng(21)
    n = 400
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.normal(50, 20, n),
    })
    out = winsorize(rd_mod.from_pandas(df).repartition(4), "g", "v",
                    0.1, 0.9).to_pandas()
    want = duckdb.sql(
        "WITH q AS (SELECT g, quantile_cont(v, 0.1) lo, "
        "quantile_cont(v, 0.9) hi FROM df GROUP BY g) "
        "SELECT df.g, df.v, least(greatest(df.v, q.lo), q.hi) AS v_w "
        "FROM df JOIN q USING (g)").df()
    got = out.sort_values(["g", "v"]).reset_index(drop=True)
    want = want.sort_values(["g", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["v_w"].to_numpy(),
                                  want["v_w"].to_numpy())


def test_winsorize_null_value_stays_null_and_null_key_unclipped(ray_session):
    import pyarrow as pa
    import ray.data as rd_mod

    from maestro_ray.ops.mlprep import winsorize

    t = pa.table({
        "g": pa.array(["a"] * 10 + [None], pa.string()),
        "v": pa.array([float(i) for i in range(10)] + [1000.0],
                      pa.float64()),
    })
    t = t.append_column("row", pa.array(range(11), pa.int64()))
    out = winsorize(rd_mod.from_arrow(t), "g", "v", 0.0, 0.5) \
        .to_pandas().sort_values("row")
    # group a: clipped to [0, 4.5]; null-key row passes through
    assert out["v_w"].iloc[:10].max() == 4.5
    assert out["v_w"].iloc[10] == 1000.0

    t2 = pa.table({"g": pa.array(["a", "a"]),
                   "v": pa.array([1.0, None], pa.float64())})
    out2 = winsorize(rd_mod.from_arrow(t2), "g", "v").to_pandas()
    assert out2["v_w"].isna().sum() == 1


def test_winsorize_bad_quantiles_raise(ray_session):
    import ray.data as rd_mod

    from maestro_ray.ops.mlprep import winsorize

    ds = rd_mod.from_pandas(pd.DataFrame({"g": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError, match="q_lo"):
        winsorize(ds, "g", "v", 0.9, 0.1)
