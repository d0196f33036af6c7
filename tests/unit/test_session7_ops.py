"""Round-4 session-7 operators: peak concurrency sweep, mutual
information, item-item cosine CF, Kaplan–Meier, grid radius join,
data-quality expectations, Zipf fit."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import (
    item_similarity_cosine,
    kaplan_meier,
    mutual_information,
    peak_concurrency,
)
from maestro_ray.ops.corpus import zipf_fit
from maestro_ray.ops.quality import data_quality_report
from maestro_ray.ops.spatial import radius_join

# ------------------------------------------------------ peak_concurrency


def _iv(keys, s, e):
    return rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "s": pa.array(s, pa.int64()),
        "e": pa.array(e, pa.int64()),
    }))


def test_peak_concurrency_basic(ray_session):
    # key 1: [0,10) [5,15) [14,20) → peak 2; key 2: three nested → 3
    ds = _iv([1, 1, 1, 2, 2, 2],
             [0, 5, 14, 0, 1, 2],
             [10, 15, 20, 10, 9, 8])
    out = peak_concurrency(ds, "k", "s", "e").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(out["peak"]) == [2, 3]
    assert list(out["n_intervals"]) == [3, 3]


def test_peak_concurrency_touching_is_not_overlap(ray_session):
    # [0,5) then [5,10): half-open — end fires before start at t=5
    ds = _iv([1, 1], [0, 5], [5, 10])
    out = peak_concurrency(ds, "k", "s", "e").to_pandas()
    assert list(out["peak"]) == [1]


def test_peak_concurrency_null_bounds_loud(ray_session):
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "s": pa.array([0, None], pa.int64()),
        "e": pa.array([5, 9], pa.int64()),
    }))
    with pytest.raises(Exception, match="null interval bounds"):
        peak_concurrency(ds, "k", "s", "e").to_pandas()


# ----------------------------------------------------- mutual_information


def test_mutual_information_independent_is_zero(ray_session):
    # uniform product distribution → MI exactly 0
    xs, ys = [], []
    for x in ("a", "b"):
        for y in ("u", "v"):
            xs += [x] * 10
            ys += [y] * 10
    ds = rd.from_arrow(pa.table({"x": xs, "y": ys}))
    out = mutual_information(ds, "x", "y")
    assert out["mi"][0] == pytest.approx(0.0, abs=1e-9)
    assert out["n"][0] == 40


def test_mutual_information_identical_is_entropy(ray_session):
    # y == x with two equiprobable values → MI = ln 2
    xs = ["a"] * 8 + ["b"] * 8
    ds = rd.from_arrow(pa.table({"x": xs, "y": xs}))
    out = mutual_information(ds, "x", "y")
    assert out["mi"][0] == pytest.approx(round(math.log(2), 6))


def test_mutual_information_null_rows_excluded(ray_session):
    ds = rd.from_arrow(pa.table({
        "x": ["a", "a", None, "b"],
        "y": ["u", None, "u", "v"],
    }))
    out = mutual_information(ds, "x", "y")
    assert out["n"][0] == 2


def test_mutual_information_cell_guard(ray_session):
    ds = rd.from_arrow(pa.table({
        "x": [str(i) for i in range(40)],
        "y": [str(i) for i in range(40)],
    }))
    with pytest.raises(ValueError, match="cells exceeds"):
        mutual_information(ds, "x", "y", max_cells=10)


# -------------------------------------------------- item_similarity_cosine


def test_item_cf_hand_case(ray_session):
    # baskets: {1,2}, {1,2}, {1,3}  → deg 1:3, 2:2, 3:1
    # support (1,2)=2, (1,3)=1, (2,3)=0
    ds = rd.from_arrow(pa.table({
        "b": pa.array([10, 10, 11, 11, 12, 12], pa.int64()),
        "i": pa.array([1, 2, 1, 2, 1, 3], pa.int64()),
    }))
    out = item_similarity_cosine(ds, "b", "i", k=5, min_support=1)
    assert list(zip(out["p1"], out["p2"], out["support"])) == \
        [(1, 2, 2), (1, 3, 1)]
    assert out["cosine"][0] == pytest.approx(2 / math.sqrt(6))
    assert out["cosine"][1] == pytest.approx(1 / math.sqrt(3))


def test_item_cf_duplicate_rows_count_once(ray_session):
    # basket listing an item twice: DISTINCT semantics
    ds = rd.from_arrow(pa.table({
        "b": pa.array([10, 10, 10], pa.int64()),
        "i": pa.array([1, 1, 2], pa.int64()),
    }))
    out = item_similarity_cosine(ds, "b", "i", k=5, min_support=1)
    assert list(out["support"]) == [1]
    assert out["cosine"][0] == pytest.approx(1.0)


def test_item_cf_empty_typed(ray_session):
    ds = rd.from_arrow(pa.table({
        "b": pa.array([10], pa.int64()),
        "i": pa.array([1], pa.int64()),
    }))
    out = item_similarity_cosine(ds, "b", "i", k=5, min_support=2)
    assert out.empty
    assert list(out.columns) == ["p1", "p2", "support", "cosine"]


# -------------------------------------------------------- kaplan_meier


def test_kaplan_meier_hand_case(ray_session):
    # classic: durations 1,2,3,4 with events at 1,3; censored at 2,4
    ds = rd.from_arrow(pa.table({
        "dur": pa.array([1, 2, 3, 4], pa.int64()),
        "obs": pa.array([True, False, True, False]),
    }))
    out = kaplan_meier(ds, "dur", "obs")
    # t=1: n=4, d=1 → 3/4 ; t=3: n=2, d=1 → 3/8
    assert list(out["t"]) == [1, 3]
    assert list(out["n_risk"]) == [4, 2]
    assert list(out["n_event"]) == [1, 1]
    assert out["survival"][0] == pytest.approx(0.75)
    assert out["survival"][1] == pytest.approx(0.375)


def test_kaplan_meier_same_time_death_before_censor(ray_session):
    # death and censor at t=2: both still at risk at 2
    ds = rd.from_arrow(pa.table({
        "dur": pa.array([2, 2, 5], pa.int64()),
        "obs": pa.array([True, False, False]),
    }))
    out = kaplan_meier(ds, "dur", "obs")
    assert list(out["n_risk"]) == [3]
    assert out["survival"][0] == pytest.approx(round(2 / 3, 6))


def test_kaplan_meier_guard_and_empty(ray_session):
    ds = rd.from_arrow(pa.table({
        "dur": pa.array([1, 2, 3], pa.int64()),
        "obs": pa.array([True, True, True]),
    }))
    with pytest.raises(ValueError, match="max_times"):
        kaplan_meier(ds, "dur", "obs", max_times=1)
    empty = rd.from_arrow(pa.table({
        "dur": pa.array([None], pa.int64()),
        "obs": pa.array([None], pa.bool_()),
    }))
    out = kaplan_meier(empty, "dur", "obs")
    assert out.empty
    assert list(out.columns) == ["t", "n_risk", "n_event", "survival"]


# --------------------------------------------------------- radius_join


def _pts(name, ids, x, y):
    return rd.from_arrow(pa.table({
        name: pa.array(ids, pa.int64()),
        "x": pa.array(x, pa.int64()),
        "y": pa.array(y, pa.int64()),
    }))


def test_radius_join_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    lx = rng.randint(-500, 500, 80)
    ly = rng.randint(-500, 500, 80)
    rx = rng.randint(-500, 500, 60)
    ry = rng.randint(-500, 500, 60)
    left = _pts("lid", np.arange(80), lx, ly)
    right = _pts("rid", np.arange(60), rx, ry)
    out = radius_join(left, right, radius=120,
                      left_cols=("lid", "x", "y"),
                      right_cols=("rid", "x", "y")).to_pandas()
    got = sorted(zip(out["lid"], out["rid"], out["dist2"]))
    exp = []
    for i in range(80):
        for j in range(60):
            d2 = int(lx[i] - rx[j]) ** 2 + int(ly[i] - ry[j]) ** 2
            if d2 <= 120 * 120:
                exp.append((i, j, d2))
    assert got == sorted(exp)
    # exactly-once: no duplicate pairs from the 3x3 replication
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_radius_join_nulls_dropped_and_guards(ray_session):
    left = rd.from_arrow(pa.table({
        "lid": pa.array([1, None], pa.int64()),
        "x": pa.array([0, 0], pa.int64()),
        "y": pa.array([0, None], pa.int64()),
    }))
    right = _pts("rid", [9], [3], [4])
    out = radius_join(left, right, radius=5,
                      left_cols=("lid", "x", "y"),
                      right_cols=("rid", "x", "y")).to_pandas()
    assert list(zip(out["lid"], out["rid"], out["dist2"])) == [(1, 9, 25)]
    with pytest.raises(ValueError, match="radius must be positive"):
        radius_join(left, right, radius=0)


def test_radius_join_cell_range_guard(ray_session):
    left = _pts("lid", [1], [2**40], [0])
    right = _pts("rid", [2], [2**40], [0])
    with pytest.raises(Exception, match="cell-id range"):
        radius_join(left, right, radius=3,
                    left_cols=("lid", "x", "y"),
                    right_cols=("rid", "x", "y")).to_pandas()


# ------------------------------------------------------- data_quality


def test_data_quality_each_rule_type(ray_session):
    t = rd.from_arrow(pa.table({
        "id": pa.array([1, 1, 2, None], pa.int64()),
        "status": ["ok", "bad", None, "ok"],
        "qty": pa.array([5.0, -1.0, 99.0, None], pa.float64()),
        "fk": pa.array([10, 11, 99, None], pa.int64()),
    }))
    ref = rd.from_arrow(pa.table({"k": pa.array([10, 11], pa.int64())}))
    out = data_quality_report([
        {"check": "a.id.not_null", "type": "not_null", "ds": t,
         "column": "id"},
        {"check": "b.id.unique", "type": "unique", "ds": t,
         "column": "id"},
        {"check": "c.status.accepted", "type": "accepted_values",
         "ds": t, "column": "status", "values": ["ok"]},
        {"check": "d.qty.range", "type": "in_range", "ds": t,
         "column": "qty", "lo": 0.0, "hi": 10.0},
        {"check": "e.fk.ref", "type": "foreign_key", "ds": t,
         "column": "fk", "ref_ds": ref, "ref_column": "k"},
    ])
    got = dict(zip(out["check"], out["n_violations"]))
    assert got == {
        "a.id.not_null": 1,     # one null id
        "b.id.unique": 1,       # 3 non-null, 2 distinct
        "c.status.accepted": 2,  # 'bad' + null
        "d.qty.range": 3,        # -1, 99, null
        "e.fk.ref": 1,           # 99 (null fk not a violation)
    }


def test_data_quality_guards(ray_session):
    t = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="duplicate check names"):
        data_quality_report([
            {"check": "x", "type": "not_null", "ds": t, "column": "a"},
            {"check": "x", "type": "not_null", "ds": t, "column": "a"},
        ])
    with pytest.raises(ValueError, match="unknown rule type"):
        data_quality_report([
            {"check": "x", "type": "nope", "ds": t, "column": "a"},
        ])


# ----------------------------------------------------------- zipf_fit


def test_zipf_fit_matches_numpy_reference(ray_session):
    # corpus with known counts: 'a'x8 'b'x4 'c'x2 'd'x1 in one lang
    docs = ["a a a a", "a a a a b b", "b b c c d"]
    ds = rd.from_arrow(pa.table({
        "lang": ["en"] * 3, "text": docs,
    }))
    out = zipf_fit(ds, "lang", "text", top_n=10)
    counts = np.array([8, 4, 2, 1], dtype=np.float64)
    x = np.log(np.arange(1, 5, dtype=np.float64))
    y = np.log(counts)
    slope = np.polyfit(x, y, 1)[0]
    assert out["lang"][0] == "en"
    assert out["n_terms"][0] == 4
    assert out["slope"][0] == pytest.approx(slope, abs=1e-6)


def test_zipf_fit_single_term_degenerate(ray_session):
    ds = rd.from_arrow(pa.table({"lang": ["en"], "text": ["solo"]}))
    out = zipf_fit(ds, "lang", "text")
    assert out["n_terms"][0] == 1
    assert np.isnan(out["slope"][0])


def test_zipf_fit_empty_typed(ray_session):
    ds = rd.from_arrow(pa.table({
        "lang": pa.array([None], pa.string()),
        "text": pa.array(["x"], pa.string()),
    }))
    out = zipf_fit(ds, "lang", "text")
    assert out.empty
    assert list(out.columns) == ["lang", "slope", "icept", "n_terms"]
