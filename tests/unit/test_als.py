"""als_factorize: planted low-rank matrix recovery, determinism across
partitionings, null handling, guards."""

import numpy as np
import pyarrow as pa
import pytest

from maestro_ray.ops.ml import als_factorize


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _planted(n_users=30, n_items=12, rank=2, seed=5):
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(n_users, rank))
    v = rng.normal(size=(n_items, rank))
    r = u @ v.T
    rows = [(ui, ii, float(r[ui, ii]))
            for ui in range(n_users) for ii in range(n_items)]
    return pa.table({
        "user": pa.array([x[0] for x in rows], pa.int64()),
        "item": pa.array([x[1] for x in rows], pa.int64()),
        "rating": pa.array([x[2] for x in rows], pa.float64()),
    })


def test_als_recovers_planted_low_rank(rd):
    t = _planted()
    out = als_factorize(rd.from_arrow(t).repartition(4), "user",
                        "item", "rating", k=2, rounds=10, reg=1e-3)
    # exact rank-2 data: ALS must fit it nearly perfectly
    assert out["rmse"] < 0.05, out["rmse"]
    uf, vf = out["user_factors"], out["item_factors"]
    assert len(uf) == 30 and len(vf) == 12
    assert list(uf.columns) == ["user", "f0", "f1"]
    # reconstruction spot check
    r = t.to_pandas()
    um = uf[["f0", "f1"]].to_numpy()
    vm = vf[["f0", "f1"]].to_numpy()
    pred = (um[r["user"].to_numpy()] * vm[r["item"].to_numpy()]).sum(1)
    np.testing.assert_allclose(pred, r["rating"], atol=0.2)


def test_als_deterministic_across_partitionings(rd):
    t = _planted(n_users=12, n_items=6)
    a = als_factorize(rd.from_arrow(t).repartition(2), "user", "item",
                      "rating", k=2, rounds=3)
    b = als_factorize(rd.from_arrow(t).repartition(7), "user", "item",
                      "rating", k=2, rounds=3)
    np.testing.assert_array_equal(
        a["user_factors"].to_numpy(), b["user_factors"].to_numpy())
    np.testing.assert_array_equal(
        a["item_factors"].to_numpy(), b["item_factors"].to_numpy())
    assert a["rmse"] == b["rmse"]


def test_als_nulls_excluded_and_guards(rd):
    t = pa.table({
        "user": pa.array([1, 1, None, 2], pa.int64()),
        "item": pa.array([1, 2, 1, None], pa.int64()),
        "rating": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    out = als_factorize(rd.from_arrow(t), "user", "item", "rating",
                        k=2, rounds=2)
    assert out["user_factors"]["user"].tolist() == [1]
    assert out["item_factors"]["item"].tolist() == [1, 2]

    with pytest.raises(RuntimeError, match="max_side_rows"):
        als_factorize(rd.from_arrow(_planted(n_users=5, n_items=8)),
                      "user", "item", "rating", k=2, rounds=1,
                      max_side_rows=3)
    with pytest.raises(ValueError, match="k=0"):
        als_factorize(rd.from_arrow(t), "user", "item", "rating", k=0)
