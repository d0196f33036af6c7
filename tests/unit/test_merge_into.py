"""merge_into (ops/joins.py): all action combinations + guards."""

import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.joins import merge_into


def _sides(src_keys=(2, 3, 9), src_v="S"):
    target = rd.from_arrow(pa.table({
        "k": [1, 2, 3], "v": ["a", "b", "c"]}))
    source = rd.from_arrow(pa.table({
        "k": list(src_keys), "v": [src_v] * len(src_keys)}))
    return target, source


def _run(**kw):
    t, s = _sides()
    out = merge_into(t, s, key="k", **kw).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    return list(zip(out.k, out.v))


def test_update_insert():
    assert _run() == [(1, "a"), (2, "S"), (3, "S"), (9, "S")]


def test_delete_matched():
    assert _run(when_matched="delete") == [(1, "a"), (9, "S")]


def test_keep_matched_ignore_unmatched():
    assert _run(when_matched="keep", when_not_matched="ignore") == \
        [(1, "a"), (2, "b"), (3, "c")]


def test_guards():
    t, s = _sides()
    with pytest.raises(ValueError):
        merge_into(t, s, key="k", when_matched="replace")
    dup = rd.from_arrow(pa.table({"k": [2, 2], "v": ["x", "y"]}))
    with pytest.raises(Exception, match="duplicate source keys"):
        merge_into(t, dup, key="k").materialize()
    nullk = rd.from_arrow(pa.table({"k": pa.array([None], pa.int64()),
                                    "v": ["x"]}))
    with pytest.raises(Exception, match="null key"):
        merge_into(t, nullk, key="k").materialize()
    wrong = rd.from_arrow(pa.table({"k": [1], "other": ["x"]}))
    with pytest.raises(ValueError, match="identical column sets"):
        merge_into(t, wrong, key="k")


def test_null_target_keys_always_survive():
    t = rd.from_arrow(pa.table({"k": pa.array([None, 5], pa.int64()),
                                "v": ["n", "e"]}))
    s = rd.from_arrow(pa.table({"k": [5], "v": ["S"]}))
    out = merge_into(t, s, key="k").to_pandas()
    assert sorted(out.v) == ["S", "n"]
