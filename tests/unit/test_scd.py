"""SCD Type 2 history (ops/scd.py): intervals, deletes, compression."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.scd import scd2_history

TS = [pd.Timestamp(f"2024-01-0{d}") for d in range(1, 10)]


def _changelog():
    # key 1: insert, update, no-op update, delete, re-insert
    # key 2: single insert (stays current)
    # key 3: insert then delete (no current row)
    return pa.table({
        "k":   [1, 1, 1, 1, 1, 2, 3, 3],
        "ts":  [TS[0], TS[1], TS[2], TS[3], TS[4], TS[0], TS[1], TS[2]],
        "seq": [10, 11, 12, 13, 14, 20, 30, 31],
        "op":  ["insert", "update", "update", "delete", "insert",
                "insert", "insert", "delete"],
        "v":   ["a", "b", "b", None, "c", "x", "y", None],
    })


def _hist(**kw):
    ds = rd.from_arrow(_changelog())
    out = scd2_history(ds, key="k", ts_col="ts", attrs=["v"],
                       seq_col="seq", op_col="op", **kw)
    return (out.to_pandas().sort_values(["k", "valid_from"])
            .reset_index(drop=True))


def test_intervals_deletes_and_current():
    h = _hist()
    k1 = h[h.k == 1]
    # delete row emits no version; the version before it is CLOSED at
    # the delete's ts; the re-insert after it opens a new current one
    assert list(k1.v) == ["a", "b", "b", "c"]
    assert list(k1.valid_from) == [TS[0], TS[1], TS[2], TS[4]]
    assert list(k1.valid_to)[:3] == [TS[1], TS[2], TS[3]]
    assert pd.isna(k1.valid_to.iloc[3]) and bool(k1.is_current.iloc[3])
    assert list(k1.is_current) == [False, False, False, True]
    # key 2: one open version
    k2 = h[h.k == 2]
    assert len(k2) == 1 and bool(k2.is_current.iloc[0])
    # key 3: history exists but NO current row (ends in delete)
    k3 = h[h.k == 3]
    assert len(k3) == 1 and not bool(k3.is_current.iloc[0])
    assert k3.valid_to.iloc[0] == TS[2]


def test_compress_collapses_noop_updates():
    h = _hist(compress=True)
    k1 = h[h.k == 1]
    # the second "b" update is a no-op → predecessor's validity extends
    # to the delete ts; everything else unchanged
    assert list(k1.v) == ["a", "b", "c"]
    assert list(k1.valid_from) == [TS[0], TS[1], TS[4]]
    assert list(k1.valid_to)[:2] == [TS[1], TS[3]]
    assert list(k1.is_current) == [False, False, True]


def test_no_op_col_every_change_is_a_version():
    ds = rd.from_arrow(pa.table({
        "k": [7, 7], "ts": [TS[0], TS[1]], "seq": [1, 2],
        "v": ["p", "q"],
    }))
    h = (scd2_history(ds, key="k", ts_col="ts", attrs=["v"], seq_col="seq")
         .to_pandas().sort_values("valid_from").reset_index(drop=True))
    assert list(h.v) == ["p", "q"]
    assert h.valid_to.iloc[0] == TS[1] and pd.isna(h.valid_to.iloc[1])


def test_compress_null_safe_equality():
    # consecutive null attrs are EQUAL (no new version), null→value is a
    # change
    ds = rd.from_arrow(pa.table({
        "k": [5, 5, 5], "ts": TS[:3], "seq": [1, 2, 3],
        "v": [None, None, "z"],
    }))
    h = (scd2_history(ds, key="k", ts_col="ts", attrs=["v"], seq_col="seq",
                      compress=True)
         .to_pandas().sort_values("valid_from").reset_index(drop=True))
    assert len(h) == 2
    assert pd.isna(h.v.iloc[0]) and h.v.iloc[1] == "z"
    assert h.valid_to.iloc[0] == TS[2]
