"""Event-time watermark / allowed-lateness (ops/watermark.py, r4):
exclusive-prefix-max semantics vs a sequential reference, null rules,
split_late routing, duplicate-key guard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.scan import ordered_cummax
from maestro_ray.ops.watermark import split_late, tag_late


def _stream():
    # arrival order 0..9; event times with genuine disorder + a null
    ts = [100, 500, 480, 90, 520, None, 510, 530, 100, 540]
    return pa.table({
        "k": pa.array(range(10), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def _ref_wm(ts):
    out, cur = [], None
    for v in ts:
        out.append(cur)
        if v is not None and (cur is None or v > cur):
            cur = v
    return out


def test_ordered_cummax_matches_sequential_reference(ray_session):
    t = _stream()
    ds = rd.from_arrow(t).repartition(4)
    got = (ordered_cummax(ds, "k", "ts", out_col="wm", n_buckets=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    ts = t.column("ts").cast(pa.int64()).to_pylist()
    ref = _ref_wm(ts)
    got_wm = [None if v is None or v != v else int(v)
              for v in got["wm"].astype("float").tolist()]
    assert got_wm == ref


def test_tag_late_null_and_threshold_semantics(ray_session):
    ds = rd.from_arrow(_stream()).repartition(3)
    out = (tag_late(ds, "k", "ts", allowed_lateness_us=300)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # row 3: ts=90, wm=500 -> 90 < 500-300 -> late. row 8: ts=100,
    # wm=530 -> late. row 2: 480 < 500-300? 480 < 200 no. first row
    # (no wm) and the null-ts row are never late.
    assert out["is_late"].tolist() == [
        False, False, False, True, False, False, False, False, True,
        False]
    on_time, late = split_late(
        rd.from_arrow(_stream()), "k", "ts", 300)
    assert late.count() == 2 and on_time.count() == 8


def test_duplicate_order_key_rejected(ray_session):
    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "ts": pa.array([1, 2, 3], pa.timestamp("us"))})
    with pytest.raises(ValueError, match="duplicate"):
        ordered_cummax(rd.from_arrow(t), "k", "ts").to_pandas()


def test_negative_lateness_rejected(ray_session):
    with pytest.raises(ValueError, match=">= 0"):
        tag_late(rd.from_arrow(_stream()), "k", "ts", -1)
