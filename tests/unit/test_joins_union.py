"""Join variants (outer/left) and schema-evolving union."""

import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.core.schema import SchemaContractError
from maestro_ray.ops.joins import broadcast_join, hash_join
from maestro_ray.ops.parse import union_evolved


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _left(rd):
    return rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "lv": ["a", "b", "c", "d"],
    }))


def _right(rd):
    return rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 5], pa.int64()),
        "rv": pa.array([20.0, 30.0, 50.0]),
    }))


def test_hash_join_inner(rd):
    out = hash_join(_left(rd), _right(rd), keys=["k"], num_buckets=4).to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_hash_join_left_outer(rd):
    out = hash_join(_left(rd), _right(rd), keys=["k"], num_buckets=4,
                    join_type="left outer").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3, 4]
    assert out.set_index("k")["rv"].isna().loc[[1, 4]].all()


def test_hash_join_full_outer(rd):
    out = hash_join(_left(rd), _right(rd), keys=["k"], num_buckets=4,
                    join_type="full outer").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3, 4, 5]
    row5 = out[out.k == 5].iloc[0]
    assert pd.isna(row5["lv"]) and row5["rv"] == 50.0


def test_broadcast_join_left_outer(rd):
    small = pa.table({"k": pa.array([2], pa.int64()), "rv": [9.0]})
    out = broadcast_join(_left(rd), small, keys=["k"],
                         join_type="left outer").to_pandas()
    assert sorted(out["k"]) == [1, 2, 3, 4]
    assert out[out.k == 2]["rv"].iloc[0] == 9.0


def test_union_evolved_add_and_widen(rd):
    s1 = pa.schema([("a", pa.int32()), ("b", pa.string())])
    s2 = pa.schema([("a", pa.int64()), ("c", pa.float64())])
    d1 = rd.from_arrow(pa.table({"a": pa.array([1], pa.int32()), "b": ["x"]}))
    d2 = rd.from_arrow(pa.table({"a": pa.array([2], pa.int64()), "c": [3.5]}))
    out = union_evolved([d1, d2], [s1, s2]).to_pandas().sort_values("a")
    assert out["a"].tolist() == [1, 2]
    assert out["b"].tolist()[0] == "x" and pd.isna(out["b"].tolist()[1])
    assert pd.isna(out["c"].tolist()[0]) and out["c"].tolist()[1] == 3.5


def test_union_evolved_conflict_rejected(rd):
    s1 = pa.schema([("a", pa.string())])
    s2 = pa.schema([("a", pa.int64())])
    d = rd.from_arrow(pa.table({"a": ["x"]}))
    with pytest.raises(SchemaContractError):
        union_evolved([d, d], [s1, s2])


def test_cross_join_expansion_suffix_guard(ray_session):
    import ray.data as rdm
    from maestro_ray.ops.joins import cross_join

    left = rdm.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["a", "b", "c"]),
    })).repartition(2)
    right = pa.table({
        "name": pa.array(["x", "y"]),          # overlaps -> name_r
        "w": pa.array([10.0, 20.0]),
    })
    out = cross_join(left, right).to_pandas() \
        .sort_values(["k", "name_r"]).reset_index(drop=True)
    assert len(out) == 6
    assert list(out.columns) == ["k", "name", "name_r", "w"]
    assert list(out[out.k == 2]["name_r"]) == ["x", "y"]
    assert (out[out.name_r == "y"]["w"] == 20.0).all()
    # guard: oversized right refuses
    import pytest as _pt
    big = pa.table({"z": pa.array(range(101), pa.int64())})
    with _pt.raises(ValueError, match="max_right_rows"):
        cross_join(left, big, max_right_rows=100)
    # empty right: empty result, schema intact
    empty = pa.table({"name": pa.array([], pa.string()),
                      "w": pa.array([], pa.float64())})
    out2 = cross_join(left, empty).to_pandas()
    assert len(out2) == 0


def test_levenshtein_join_matches_and_guards(ray_session):
    import numpy as np
    import ray.data as rdm
    from maestro_ray.ops.joins import levenshtein_join

    left = rdm.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "name": pa.array(["kitten", "flaw", None, "abc"]),
    })).repartition(2)
    right = pa.table({
        "rid": pa.array([10, 11, 12], pa.int64()),
        "name": pa.array(["sitting", "lawn", None]),  # overlaps -> name_r
    })
    out = levenshtein_join(left, right, "name", "name", max_dist=3) \
        .to_pandas().sort_values(["id", "rid"]).reset_index(drop=True)
    # kitten-sitting = 3, flaw-lawn = 2, abc-lawn = 3 (insert l, sub
    # b→w, sub c→n); nulls never match either side
    assert list(zip(out["id"], out["rid"], out["dist"])) == \
        [(1, 10, 3), (2, 11, 2), (4, 11, 3)]
    assert "name_r" in out.columns
    with pytest.raises(ValueError, match="max_right_rows"):
        levenshtein_join(left, right, "name", "name", 1,
                         max_right_rows=2)
    with pytest.raises(ValueError, match="max_dist"):
        levenshtein_join(left, right, "name", "name", -1)
    # empty match set keeps the schema
    none = levenshtein_join(left, right, "name", "name", 0).to_pandas()
    assert len(none) == 0
