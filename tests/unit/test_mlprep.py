"""ML-prep ops (ops/mlprep.py): null safety, zero variance, frozen
categories, unseen keys."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.mlprep import categorical_encode, one_hot, standardize


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


def test_categorical_encode_dense_rank_semantics(ray_session):
    t = pa.table({"c": ["m", "z", "a", "m", None]})
    out = categorical_encode(rd.from_arrow(t), "c").to_pandas()
    got = dict(zip(out.c, out.code))
    assert got["a"] == 1 and got["m"] == 2 and got["z"] == 3
    assert out[out.c.isna()].code.isna().all()
