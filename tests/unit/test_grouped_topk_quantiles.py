"""grouped_topk / quantiles_disc / cosine_pairs_exact unit oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import grouped_topk, quantiles_disc


@pytest.fixture(scope="module")
def num_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5000
    return rd.from_arrow(pa.table({
        "grp": pa.array(rng.integers(0, 7, n), pa.int64()),
        "val": pa.array(rng.integers(0, 400, n), pa.int64()),
        "id": pa.array(range(n), pa.int64()),
    })).repartition(8), n


def test_grouped_topk_matches_pandas(num_ds):
    ds, _n = num_ds
    got = (
        grouped_topk(ds, keys="grp", sort_col="val", k=5, tie_break=["id"])
        .to_pandas().sort_values(["grp", "id"]).reset_index(drop=True)
    )
    df = ds.to_pandas()
    want = (
        df.sort_values(["val", "id"], ascending=[False, True], kind="mergesort")
        .groupby("grp", sort=False).head(5)
        .sort_values(["grp", "id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["grp", "val", "id"]],
                                  want[["grp", "val", "id"]])


def test_grouped_topk_null_keys_form_one_group(ray_session):
    import ray.data as rd

    t = pa.table({
        "grp": pa.array([None, None, None, "a"], pa.string()),
        "val": pa.array([3, 1, 2, 9], pa.int64()),
        "id": pa.array([0, 1, 2, 3], pa.int64()),
    })
    got = (
        grouped_topk(rd.from_arrow(t), keys="grp", sort_col="val", k=2,
                     tie_break=["id"])
        .to_pandas()
    )
    nulls = got[got["grp"].isna()]
    assert sorted(nulls["val"].tolist()) == [2, 3]  # top-2 of the null group


def test_quantiles_disc_matches_duckdb(num_ds):
    import duckdb

    ds, _n = num_ds
    qs = [0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 0.99, 1.0]
    got = quantiles_disc(ds, "val", qs)
    df = ds.to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"WITH x AS (SELECT quantile_disc(val, {qs}) AS l FROM t) "
        f"SELECT unnest({qs}) AS q, unnest(l) AS value FROM x"
    ).fetchdf()
    assert got["q"].tolist() == want["q"].tolist()
    assert got["value"].tolist() == want["value"].tolist()


def test_lag_lead_per_key(ray_session):
    import ray.data as rd

    from maestro_ray.ops.aggregates import lag_lead

    t = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([30, 10, 20, 5], pa.int64()),
        "v": pa.array([3.0, 1.0, 2.0, 9.0], pa.float64()),
    })
    got = (
        lag_lead(rd.from_arrow(t), key="k", order_cols=["ts"], value_col="v")
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert np.isnan(got["prev_value"].iloc[0])
    assert got["prev_value"].tolist()[1:3] == [1.0, 2.0]
    assert got["next_value"].tolist()[:2] == [2.0, 3.0]
    assert np.isnan(got["next_value"].iloc[2])
    # single-row group: both neighbors null
    assert got.iloc[3][["prev_value", "next_value"]].isna().all()


def test_cosine_pairs_exact_planted(ray_session):
    import ray.data as rd

    from maestro_ray.ops.similarity import cosine_pairs_exact

    rng = np.random.default_rng(5)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    planted = np.vstack([base, base[3] * 2.0, base[7] + 1e-3])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(planted)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in planted],
                              pa.list_(pa.float32())),
    }))
    got = cosine_pairs_exact(ds, threshold=0.99).to_pandas()
    pairs = set(map(tuple, got[["a", "b"]].to_numpy().tolist()))
    assert (3, 30) in pairs and (7, 31) in pairs
    # exact == brute-force numpy reference at the same threshold
    m = planted.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ref = {
        (i, j)
        for i in range(len(m)) for j in range(i + 1, len(m))
        if sims[i, j] >= 0.99
    }
    assert pairs == ref


def test_cosine_pairs_exact_guard_fires(ray_session):
    """ADVICE r3: the exact tier collects the corpus on the driver —
    above max_rows it must fail loudly naming the LSH path, not OOM."""
    import ray.data as rd

    from maestro_ray.ops.similarity import cosine_pairs_exact

    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(10), pa.int64()),
        "embedding": pa.array([[float(i), 1.0] for i in range(10)],
                              pa.list_(pa.float32())),
    }))
    with pytest.raises(RuntimeError, match="embedding_near_dup"):
        cosine_pairs_exact(ds, threshold=0.5, max_rows=5)
    # and under the guard it still answers
    assert cosine_pairs_exact(ds, threshold=0.5, max_rows=10).count() > 0


def test_exact_quantile_guard_fires_on_high_cardinality(ray_session):
    """r3 VERDICT #3: the exact quantile family is driver-bound by
    distinct values — above max_distinct it must fail loudly naming
    quantile_sketch, not OOM. Under the bound it still answers."""
    import ray.data as rd

    from maestro_ray.ops.aggregates import _count_merge, quantiles_cont

    ds = rd.from_arrow(pa.table({
        "v": pa.array(np.linspace(0.0, 1.0, 5000), pa.float64()),
    }))
    with pytest.raises(RuntimeError, match="quantile_sketch"):
        _count_merge(ds, ["v"], max_distinct=1000)
    got = quantiles_cont(ds, "v", [0.5])
    assert abs(got["value"].iloc[0] - 0.5) < 1e-9
