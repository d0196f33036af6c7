"""Oracles for the session-6 operator batch: exact AUC, TWAP,
market-basket co-occurrence, set Jaccard, multi-source BFS."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.analytics import (_pairs_within_runs,
                                       cooccurrence_pairs, jaccard_sets)
from maestro_ray.ops.graph import bfs_levels
from maestro_ray.ops.ml import auc_exact
from maestro_ray.ops.aggregates import twap_grouped


# ---------------------------------------------------------------- auc

def _auc_brute(scores, labels):
    """O(P*N) pair-counting reference: wins + half-ties."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def test_auc_matches_brute_with_ties(ray_session):
    rng = np.random.default_rng(7)
    # quantized scores force heavy ties
    scores = np.round(rng.random(400), 1)
    labels = (rng.random(400) < 0.3).astype(int)
    ds = rd.from_pandas(pd.DataFrame({"s": scores, "y": labels}))
    out = auc_exact(ds, "s", "y", round_to=None)
    assert out["n_pos"][0] == labels.sum()
    assert out["n_neg"][0] == (1 - labels).sum()
    assert out["auc"][0] == pytest.approx(
        _auc_brute(scores, labels), abs=1e-12)


def test_auc_degenerate_one_class(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"s": [1.0, 2.0], "y": [1, 1]}))
    out = auc_exact(ds, "s", "y")
    assert pd.isna(out["auc"][0]) and out["n_neg"][0] == 0


def test_auc_nulls_excluded_and_guard(ray_session):
    df = pd.DataFrame({"s": [0.1, None, 0.9, 0.4],
                       "y": [0, 1, 1, None]})
    out = auc_exact(rd.from_pandas(df), "s", "y", round_to=None)
    # survivors: (0.1, 0) and (0.9, 1) -> perfect separation
    assert out["auc"][0] == 1.0
    with pytest.raises(RuntimeError, match="distinct score"):
        auc_exact(rd.from_pandas(pd.DataFrame(
            {"s": np.arange(100.0), "y": [0, 1] * 50})),
            "s", "y", max_distinct=10)


# --------------------------------------------------------------- twap

def test_twap_holds_value_until_next(ray_session):
    ts = pd.to_datetime(["2020-01-01 00:00:00", "2020-01-01 00:00:10",
                         "2020-01-01 00:00:40", "2020-01-02 00:00:00"])
    df = pd.DataFrame({"k": [1, 1, 1, 2], "ts": ts,
                       "eid": [1, 2, 3, 4],
                       "v": [10.0, 40.0, 99.0, 5.0]})
    out = twap_grouped(rd.from_pandas(df), "k", ["ts", "eid"],
                       "ts", "v", round_to=None)
    # k=1: (10*10 + 40*30) / 40 = 32.5; k=2 has one row -> dropped
    assert out["k"].tolist() == [1]
    assert out["twap"][0] == pytest.approx(32.5)


def test_twap_zero_span_is_null(ray_session):
    ts = pd.to_datetime(["2020-01-01", "2020-01-01"])
    df = pd.DataFrame({"k": [1, 1], "ts": ts, "eid": [1, 2],
                       "v": [3.0, 4.0]})
    out = twap_grouped(rd.from_pandas(df), "k", ["ts", "eid"],
                       "ts", "v")
    assert pd.isna(out["twap"][0])


# -------------------------------------------------- co-occurrence

def test_pairs_within_runs_matches_itertools():
    rng = np.random.default_rng(3)
    sizes = rng.integers(1, 7, size=40)
    items = rng.integers(0, 1000, size=int(sizes.sum()))
    lefts, rights = _pairs_within_runs(items, sizes)
    expect = []
    start = 0
    for k in sizes:
        expect.extend(itertools.combinations(items[start:start + k], 2))
        start += k
    got = list(zip(lefts.tolist(), rights.tolist()))
    assert got == expect


def test_pairs_within_runs_empty():
    l, r = _pairs_within_runs(np.array([], dtype=np.int64),
                              np.array([], dtype=np.int64))
    assert len(l) == 0 and len(r) == 0


def test_cooccurrence_distinct_and_support(ray_session):
    # basket 1 lists item 10 twice -> counts once per basket
    df = pd.DataFrame({"b": [1, 1, 1, 1, 2, 2, 3, 3],
                       "i": [10, 10, 20, 30, 10, 20, 10, 20]})
    out = cooccurrence_pairs(rd.from_pandas(df), "b", "i",
                             min_support=2).to_pandas()
    out = out.sort_values(["p1", "p2"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"p1": 10, "p2": 20, "support": 3}]


def test_jaccard_sets_brute(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"t": rng.choice(list("abcd"), 300),
                       "u": rng.integers(0, 40, 300)})
    out = jaccard_sets(rd.from_pandas(df), "t", "u", round_to=None)
    sets = {t: set(g["u"]) for t, g in df.groupby("t")}
    for row in out.itertuples():
        a, b = sets[row.s1], sets[row.s2]
        assert row.s1 < row.s2
        assert row.inter == len(a & b)
        assert row.union_ == len(a | b)
        assert row.jaccard == pytest.approx(len(a & b) / len(a | b))
    # every overlapping pair present
    expect_pairs = {(x, y) for x, y in
                    itertools.combinations(sorted(sets), 2)
                    if sets[x] & sets[y]}
    assert {(r.s1, r.s2) for r in out.itertuples()} == expect_pairs


# ---------------------------------------------------------------- bfs

def _bfs_ref(edges, seeds, max_depth, directed):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    univ = set(adj) | {b for vs in adj.values() for v in [0] for b in vs}
    dist = {s: 0 for s in seeds if s in univ}
    frontier = set(dist)
    for d in range(1, max_depth + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.add(m)
        frontier = nxt
    return dist


@pytest.mark.parametrize("directed", [True, False])
def test_bfs_levels_matches_reference(ray_session, directed):
    rng = np.random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 60, size=(300, 2))]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    seeds = [0, 7, 999]  # 999 not in the universe -> ignored
    out = bfs_levels(ds, seeds, max_depth=3, directed=directed)
    ref = _bfs_ref(edges, seeds, 3, directed)
    assert dict(zip(out["node"], out["dist"])) == ref


def test_bfs_empty_and_depth_zero(ray_session):
    empty = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                         "b": pd.Series(dtype="int64")}))
    out = bfs_levels(empty, [1], max_depth=3)
    assert out.empty
    ds = rd.from_pandas(pd.DataFrame({"a": [1], "b": [2]}))
    out0 = bfs_levels(ds, [1], max_depth=0)
    assert out0.to_dict("records") == [{"node": 1, "dist": 0}]


# ------------------------------------------------- rules + rounding

def test_sql_round_half_away_and_nan():
    from maestro_ray.ops.aggregates import sql_round

    assert sql_round(2.3015625, 6) == 2.301563  # np.round gives ...62
    assert sql_round(-2.3015625, 6) == -2.301563
    assert sql_round(65 / 128, 6) == 0.507813
    arr = sql_round(np.array([0.1, np.nan]), 6)
    assert arr[0] == 0.1 and np.isnan(arr[1])


def test_association_rules_brute(ray_session):
    df = pd.DataFrame({"b": [1, 1, 1, 2, 2, 3, 3, 4],
                       "i": [10, 20, 30, 10, 20, 10, 20, 30]})
    from maestro_ray.ops.analytics import association_rules

    out = association_rules(rd.from_pandas(df), "b", "i",
                            min_support=2, round_to=None)
    # supports: 10->3, 20->3, 30->2 baskets; n_baskets=4
    # pair (10,20): support 3
    rules = {(r.ante, r.cons): (r.support, r.confidence, r.lift)
             for r in out.itertuples()}
    assert rules[(10, 20)] == (3, 1.0, pytest.approx(3 * 4 / 9))
    assert rules[(20, 10)] == (3, 1.0, pytest.approx(3 * 4 / 9))
    assert set(rules) == {(10, 20), (20, 10)}


def test_association_rules_empty(ray_session):
    df = pd.DataFrame({"b": [1, 2], "i": [10, 20]})
    from maestro_ray.ops.analytics import association_rules

    out = association_rules(rd.from_pandas(df), "b", "i",
                            min_support=2)
    assert out.empty and list(out.columns) == [
        "ante", "cons", "support", "confidence", "lift"]


def test_gain_curve_brute(ray_session):
    """Grouped-tie gain table vs a brute reference built by sorting
    the per-score histogram and extending each cutoff to the end of
    its tie run."""
    from maestro_ray.ops.ml import gain_curve

    rng = np.random.default_rng(9)
    scores = np.round(rng.random(500), 1)  # heavy ties
    labels = (rng.random(500) < 0.25).astype(int)
    ds = rd.from_pandas(pd.DataFrame({"s": scores, "y": labels}))
    out = gain_curve(ds, "s", "y", n_bins=4, round_to=None)

    hist = pd.DataFrame({"s": scores, "y": labels}) \
        .groupby("s").agg(pos=("y", "sum"), cnt=("y", "size")) \
        .sort_index(ascending=False)
    cum_cnt = hist["cnt"].cumsum().to_numpy()
    cum_pos = hist["pos"].cumsum().to_numpy()
    n, p = cum_cnt[-1], cum_pos[-1]
    for row in out.itertuples():
        cutoff = -(-row.bin * n // 4)  # ceil
        i = np.searchsorted(cum_cnt, cutoff)
        assert row.cutoff_rank == cutoff
        assert row.n_taken == cum_cnt[i]
        assert row.n_pos_taken == cum_pos[i]
        assert row.capture == pytest.approx(cum_pos[i] / p)
        assert row.lift == pytest.approx(
            (cum_pos[i] / cum_cnt[i]) / (p / n))
    assert out["bin"].tolist() == [1, 2, 3, 4]
    assert out["capture"].iloc[-1] == 1.0


def test_top_paths_brute(ray_session):
    from maestro_ray.ops.analytics import top_paths

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n),
        "ts": rng.integers(0, 10_000, n),
        "eid": np.arange(n),
        "et": rng.choice(["a", "b", None], n, p=[0.5, 0.4, 0.1]),
    })
    out = top_paths(rd.from_pandas(df), "u", ["ts", "eid"], "et",
                    max_steps=2, k=5, sep=">")
    ref = (df.assign(et=df["et"].fillna(""))
           .sort_values(["u", "ts", "eid"])
           .groupby("u")["et"]
           .apply(lambda s: ">".join(s.head(2)))
           .value_counts())
    ref = ref.reset_index()
    ref.columns = ["path", "n_keys"]
    ref = ref.sort_values(["n_keys", "path"],
                          ascending=[False, True]).head(5)
    assert out["path"].tolist() == ref["path"].tolist()
    assert out["n_keys"].tolist() == ref["n_keys"].tolist()


def test_histogram2d_brute(ray_session):
    from maestro_ray.ops.analytics import histogram2d

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"x": rng.random(300) * 10,
                       "y": rng.random(300) * 100})
    df.loc[5, "x"] = np.nan  # excluded
    out = histogram2d(rd.from_pandas(df), "x", "y", 2.0, 25.0)
    ref = df.dropna()
    cells = ref.assign(xb=np.floor(ref["x"] / 2.0) * 2.0,
                       yb=np.floor(ref["y"] / 25.0) * 25.0) \
        .groupby(["xb", "yb"]).size()
    assert len(out) == len(cells)
    for row in out.itertuples():
        assert cells[(row.x_bin, row.y_bin)] == row.n
    assert out["n"].sum() == len(ref)
