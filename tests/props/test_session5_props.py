"""Property tests (hypothesis) for the r4-s5 operators:
grouped_topk_ties vs a brute-force rank filter, weighted_median vs a
brute-force cumulative scan, dedup_consecutive vs an itertools.groupby
reference, running_distinct vs a set-scan — randomized inputs, exact
equality."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from maestro_ray.ops.aggregates import (
    dedup_consecutive,
    grouped_topk_ties,
    running_distinct,
    weighted_median_grouped,
)

_rows = st.lists(
    st.tuples(
        st.integers(0, 3),       # grp
        st.integers(-20, 20),    # val (narrow: force ties)
        st.integers(1, 9),       # weight
    ),
    min_size=1, max_size=60,
)


def _ds(t):
    import ray.data as rd

    return rd.from_arrow(t)


@settings(max_examples=12, deadline=None)
@given(rows=_rows, k=st.integers(1, 4))
def test_topk_ties_equals_rank_filter(ray_session, rows, k):
    t = pa.table({
        "grp": pa.array([r[0] for r in rows], pa.int64()),
        "val": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(range(len(rows)), pa.int64()),
    })
    got = grouped_topk_ties(_ds(t), "grp", "val", k).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    df = t.to_pandas()
    df["rank"] = df.groupby("grp")["val"].rank(
        method="min", ascending=False).astype("int64")
    want = df[df["rank"] <= k].sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(want["id"])
    # and the rank column matches SQL rank() restricted to survivors
    assert list(got["rank"]) == list(want["rank"])


@settings(max_examples=12, deadline=None)
@given(rows=_rows)
def test_weighted_median_equals_bruteforce(ray_session, rows):
    t = pa.table({
        "grp": pa.array([r[0] for r in rows], pa.int64()),
        "val": pa.array([float(r[1]) for r in rows], pa.float64()),
        "w": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = weighted_median_grouped(_ds(t), "grp", "val", "w")
    df = t.to_pandas()
    for g, sub in df.groupby("grp"):
        s = sub.sort_values("val")
        cw = s["w"].cumsum()
        want = float(s["val"][cw >= 0.5 * s["w"].sum()].iloc[0])
        have = float(got.set_index("grp").loc[g, "weighted_median"])
        assert have == want, (g, want, have)


@settings(max_examples=12, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(0, 2), st.sampled_from(["a", "b", None])),
    min_size=1, max_size=50,
))
def test_dedup_consecutive_equals_groupby_runs(ray_session, rows):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "t": pa.array(range(len(rows)), pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.string()),
    })
    got = dedup_consecutive(_ds(t), "k", ["t"], "v").to_pandas()
    if "t" not in got.columns:  # fully-dropped input: empty Dataset
        got = pd.DataFrame({"t": pd.Series([], dtype="int64")})
    df = t.to_pandas()
    keep_ts = []
    for _k, sub in df.groupby("k"):
        vals = list(sub.sort_values("t")[["t", "v"]].itertuples(
            index=False, name=None))
        first = True
        for _key, run in itertools.groupby(
                vals, key=lambda p: p[1] if p[1] is not None
                else "\0NULL"):
            run = list(run)
            # SQL quirk: a first row with null value is NOT kept
            # (null IS DISTINCT FROM lag-null is false)
            if first and run[0][1] is None:
                first = False
                continue
            first = False
            keep_ts.append(run[0][0])
    assert sorted(got["t"]) == sorted(keep_ts)


@settings(max_examples=12, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 5)),  # id, bucket
    min_size=1, max_size=60,
))
def test_running_distinct_equals_set_scan(ray_session, rows):
    t = pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
    })
    got = running_distinct(_ds(t), "id", "b")
    # engine reports only buckets where at least one id FIRST appears
    want_new = {}
    firsts = {}
    for i, b in rows:
        firsts[i] = min(firsts.get(i, b), b)
    for i, b in firsts.items():
        want_new[b] = want_new.get(b, 0) + 1
    have = dict(zip(got["b"], got["new_ids"]))
    assert have == want_new
    have_cum = dict(zip(got["b"], got["cum_distinct"]))
    running = 0
    for b in sorted(want_new):
        running += want_new[b]
        assert have_cum[b] == running == \
            len({i for i, fb in firsts.items() if fb <= b})
