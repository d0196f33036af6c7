"""P3/P4: quarantine split + error-threshold abort semantics."""

import pyarrow as pa
import pytest

from maestro_ray.ops.parse import error_threshold, quarantine_rows, validate_split


def _tbl():
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "kind": ["a", "b", "zz", "a", None],
        "v": [1.0, -5.0, 2.0, 3.0, 4.0],
    })


def test_validate_split_quarantines_with_reason():
    ok, bad = validate_split(
        _tbl(), reason="bad_kind_or_v",
        one_of={"kind": ["a", "b"]}, ranges={"v": (0.0, None)},
    )
    # id=1 (a, 1.0) ok; id=2 (b, -5) bad v; id=3 (zz) bad kind;
    # id=4 (a, 3) ok; id=5 (None kind) bad
    assert set(bad.column("_error_reason").to_pylist()) == {"bad_kind_or_v"}


def test_validate_split_exact_rows():
    ok, bad = validate_split(
        _tbl(), one_of={"kind": ["a", "b"]}, ranges={"v": (0.0, None)},
    )
    assert ok.column("id").to_pylist() == [1, 4]
    assert bad.column("id").to_pylist() == [2, 3, 5]


def test_error_threshold_aborts_when_dirty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    with pytest.raises(ValueError, match="error_threshold exceeded"):
        error_threshold(ds, 0.2, one_of={"kind": ["a", "b"]},
                        ranges={"v": (0.0, None)})


def test_error_threshold_passes_under_theta(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_tbl())
    ok_ds, frac = error_threshold(ds, 0.9, one_of={"kind": ["a", "b"]},
                                  ranges={"v": (0.0, None)})
    assert abs(frac - 3 / 5) < 1e-9
    assert ok_ds.count() == 2


def test_quarantine_channel(ray_session):
    import ray.data as rd

    bad = quarantine_rows(rd.from_arrow(_tbl()), reason="r",
                          one_of={"kind": ["a", "b"]},
                          ranges={"v": (0.0, None)}).to_pandas()
    assert sorted(bad["id"]) == [2, 3, 5]
    assert (bad["_error_reason"] == "r").all()
