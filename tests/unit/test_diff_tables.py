"""Keyed reconciliation (ops/diff.py diff_tables): insert/delete/update
classification with null-safe payload comparison."""

import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.diff import diff_tables


def _t(keys, vals):
    return rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "v": pa.array(vals, pa.float64()),
    }))


def test_classification_and_equal_rows_dropped(ray_session):
    left = _t([1, 2, 3, 4], [10.0, 20.0, 30.0, 40.0])
    right = _t([2, 3, 4, 5], [20.0, 31.0, 40.0, 50.0])
    out = diff_tables(left, right, key="k", cols=["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    got = list(zip(out["k"], out["diff_op"]))
    # 2 and 4 are equal → never emitted
    assert got == [(1, "delete"), (3, "update"), (5, "insert")]


def test_null_payloads_are_null_safe(ray_session):
    left = _t([1, 2, 3], [None, 5.0, None])
    right = _t([1, 2, 3], [None, None, 7.0])
    out = diff_tables(left, right, key="k", cols=["v"]) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    got = list(zip(out["k"], out["diff_op"]))
    # null == null → equal (dropped); null vs value → update both ways
    assert got == [(2, "update"), (3, "update")]


def test_multi_column_any_difference_updates(ray_session):
    def t2(keys, a, b):
        return rd.from_arrow(pa.table({
            "k": pa.array(keys, pa.int64()),
            "a": pa.array(a, pa.float64()),
            "b": pa.array(b, pa.string()),
        }))

    left = t2([1, 2], [1.0, 2.0], ["x", "y"])
    right = t2([1, 2], [1.0, 2.0], ["x", "z"])
    out = diff_tables(left, right, key="k", cols=["a", "b"]) \
        .to_pandas()
    assert list(zip(out["k"], out["diff_op"])) == [(2, "update")]


def test_all_equal_yields_empty(ray_session):
    left = _t([1, 2], [1.0, 2.0])
    out = diff_tables(left, _t([1, 2], [1.0, 2.0]), key="k",
                      cols=["v"]).to_pandas()
    assert len(out) == 0


def test_profile_columns_nulls_and_empty(ray_session):
    """profile_columns (ops/profile.py): null exclusion from distinct,
    all-null columns, empty input."""
    from maestro_ray.ops.profile import profile_columns

    t = pa.table({
        "a": pa.array([1, 1, 2, None], pa.int64()),
        "b": pa.array([None, None, None, None], pa.string()),
    })
    out = profile_columns(rd.from_arrow(t), ["a", "b"])
    assert out[out.column == "a"].iloc[0].tolist() == ["a", 4, 1, 2]
    assert out[out.column == "b"].iloc[0].tolist() == ["b", 4, 4, 0]

    empty = pa.table({"a": pa.array([], pa.int64())})
    out2 = profile_columns(rd.from_arrow(empty), ["a"])
    assert out2.iloc[0].tolist() == ["a", 0, 0, 0]


def test_sample_weighted_bias_and_guards(ray_session):
    """sample_weighted (ops/corpus.py): heavier keys are sampled more
    often; non-positive weights fail loudly; k > n returns all."""
    import numpy as np
    import pytest
    from maestro_ray.ops.corpus import sample_weighted

    n = 2000
    keys = np.arange(n, dtype=np.int64)
    # half the keys carry 20x the weight
    w = np.where(keys % 2 == 0, 20.0, 1.0)
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "w": pa.array(w, pa.float64()),
    })).repartition(5)
    out = sample_weighted(ds, "k", "w", k=200)
    assert len(out) == 200 and out["k"].is_unique
    heavy_frac = (out["k"] % 2 == 0).mean()
    assert heavy_frac > 0.8  # E ≈ 20/21 ≈ 0.95

    small = sample_weighted(ds.limit(3), "k", "w", k=10)
    assert len(small) == 3  # k > n returns everything

    bad = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "w": pa.array([1.0, 0.0], pa.float64()),
    }))
    with pytest.raises(Exception, match="positive"):
        sample_weighted(bad, "k", "w", k=1)
