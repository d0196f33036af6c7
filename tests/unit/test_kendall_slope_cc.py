"""kendall_trend / moving_slope / local_clustering: brute-force
references on random + crafted fixtures, guard and edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import kendall_trend, moving_slope
from maestro_ray.ops.graph import local_clustering


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


# ------------------------------------------------------------ kendall_trend


def _tau_ref(v):
    """Brute-force Mann–Kendall tau-b over an ordered value sequence."""
    v = np.asarray(v, dtype=float)
    n = len(v)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            if v[j] > v[i]:
                c += 1
            elif v[j] < v[i]:
                d += 1
    n0 = n * (n - 1) // 2
    _, cnt = np.unique(v, return_counts=True)
    n2 = int((cnt * (cnt - 1) // 2).sum())
    if n < 2 or n0 == n2:
        return None
    return (c, d, float(c - d) / np.sqrt(float(n0) * float(n0 - n2)))


def test_kendall_trend_matches_bruteforce(rd):
    rng = np.random.default_rng(17)
    n = 200
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        # small value domain forces plenty of ties
        "v": pa.array(rng.integers(0, 8, n).astype(float), pa.float64()),
    })
    out = kendall_trend(rd.from_arrow(t).repartition(4), "k", ["o"], "v")
    df = t.to_pandas().sort_values(["k", "o"])
    for k, g in df.groupby("k"):
        ref = _tau_ref(g["v"].to_numpy())
        row = out[out["k"] == k]
        assert ref is not None and len(row) == 1
        c, d, tau = ref
        assert int(row["concordant"].iloc[0]) == c
        assert int(row["discordant"].iloc[0]) == d
        assert row["tau_b"].iloc[0] == tau  # bit-exact contract


def test_kendall_trend_ties_nulls_and_degenerate(rd):
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 2, 3], pa.int64()),
        "o": pa.array([0, 1, 2, 3, 0, 1, 2, 0], pa.int64()),
        # k=1: nulls drop → [1, 3, 2]; k=2: all tied; k=3: n=1
        "v": pa.array([1.0, None, 3.0, 2.0, 5.0, 5.0, 5.0, 9.0],
                      pa.float64()),
    })
    out = kendall_trend(rd.from_arrow(t), "k", ["o"], "v")
    assert out["k"].tolist() == [1]  # tied + single groups omitted
    assert int(out["n"].iloc[0]) == 3
    assert int(out["concordant"].iloc[0]) == 2  # (1,3) (1,2)
    assert int(out["discordant"].iloc[0]) == 1  # (3,2)


def test_kendall_trend_group_guard(rd):
    t = pa.table({
        "k": pa.array([1] * 20, pa.int64()),
        "o": pa.array(np.arange(20), pa.int64()),
        "v": pa.array(np.arange(20).astype(float), pa.float64()),
    })
    with pytest.raises(Exception, match="max_group_rows|sample"):
        kendall_trend(rd.from_arrow(t), "k", ["o"], "v",
                      max_group_rows=10)


def test_kendall_trend_empty(rd):
    t = pa.table({
        "k": pa.array([], pa.int64()),
        "o": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()),
    })
    out = kendall_trend(rd.from_arrow(t), "k", ["o"], "v")
    assert out.empty and "tau_b" in out.columns


# ------------------------------------------------------------- moving_slope


def test_moving_slope_matches_polyfit(rd):
    rng = np.random.default_rng(23)
    n = 90
    t = pa.table({
        "k": pa.array(rng.integers(0, 3, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "y": pa.array(rng.integers(0, 500, n), pa.int64()),
    })
    w = 6
    out = moving_slope(rd.from_arrow(t).repartition(4), "k", ["o"],
                       "y", window=w).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    got = out["mov_slope"].to_numpy()
    i = 0
    for _, g in df.groupby("k"):
        y = g["y"].to_numpy(dtype=float)
        x = np.arange(1, len(y) + 1, dtype=float)
        for j in range(len(y)):
            lo = max(0, j - w + 1)
            if j - lo + 1 >= 2:
                want = np.polyfit(x[lo:j + 1], y[lo:j + 1], 1)[0]
                np.testing.assert_allclose(got[i], want, rtol=1e-9)
            else:
                assert np.isnan(got[i])
            i += 1


def test_moving_slope_null_y_drops_from_sums(rd):
    t = pa.table({
        "k": pa.array([1] * 4, pa.int64()),
        "o": pa.array([0, 1, 2, 3], pa.int64()),
        "y": pa.array([2, None, 6, 8], pa.int64()),
    })
    out = moving_slope(rd.from_arrow(t), "k", ["o"], "y",
                       window=3).to_pandas().sort_values("o")
    s = out["mov_slope"].to_numpy()
    assert np.isnan(s[0]) and np.isnan(s[1])
    # frame rows 0..2: points (1,2),(3,6) → slope 2; rows 1..3:
    # (3,6),(4,8) → slope 2
    assert s[2] == 2.0 and s[3] == 2.0


def test_moving_slope_window_guards(rd):
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "o": pa.array([0], pa.int64()),
                  "y": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match=">= 2"):
        moving_slope(rd.from_arrow(t), "k", ["o"], "y", window=1)
    with pytest.raises(ValueError, match="256"):
        moving_slope(rd.from_arrow(t), "k", ["o"], "y", window=500)


# --------------------------------------------------------- local_clustering


def _cc(rd, pairs):
    t = pa.table({"a": pa.array([p[0] for p in pairs], pa.string()),
                  "b": pa.array([p[1] for p in pairs], pa.string())})
    out = local_clustering(rd.from_arrow(t).repartition(2), "a", "b") \
        .to_pandas()
    return out.set_index("node").sort_index()


def test_local_clustering_complete_k4(rd):
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(nodes)
             for v in nodes[i + 1:]]
    out = _cc(rd, pairs)
    assert list(out.index) == nodes
    assert (out["degree"] == 3).all()
    assert (out["triangles"] == 3).all()
    assert (out["cc"] == 1.0).all()


def test_local_clustering_path_zero_and_deg1_omitted(rd):
    # path x-y-z: y has degree 2, cc 0; x and z have degree 1 → omitted
    out = _cc(rd, [("x", "y"), ("y", "z")])
    assert list(out.index) == ["y"]
    assert out.loc["y", "triangles"] == 0
    assert out.loc["y", "cc"] == 0.0


def test_local_clustering_mixed_graph(rd):
    # triangle a-b-c plus pendant edges and a duplicate/reversed edge
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"),
             ("a", "d"), ("d", "e"), ("a", "a")]
    out = _cc(rd, pairs)
    # a: deg 3 (b, c, d), 1 triangle → cc = 2/(3·2) = 1/3
    assert out.loc["a", "degree"] == 3
    assert out.loc["a", "triangles"] == 1
    assert out.loc["a", "cc"] == pytest.approx(1 / 3)
    assert out.loc["b", "cc"] == 1.0 and out.loc["c", "cc"] == 1.0
    assert out.loc["d", "degree"] == 2 and out.loc["d", "cc"] == 0.0
    assert "e" not in out.index  # degree 1


def test_local_clustering_no_triangles_empty_safe(rd):
    # star graph: hub degree 3, zero triangles (left-join null fill)
    out = _cc(rd, [("h", "a"), ("h", "b"), ("h", "c")])
    assert list(out.index) == ["h"]
    assert out.loc["h", "triangles"] == 0 and out.loc["h", "cc"] == 0.0


def test_kendall_trend_group_crossing_chunk_boundary(rd):
    # one group larger than the 256-row pair-count block: the chunked
    # path must equal the brute force exactly (review r4 s8b — the
    # n×n matrix was replaced with O(blk·n) chunks)
    rng = np.random.default_rng(31)
    n = 600
    t = pa.table({
        "k": pa.array([1] * n, pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 25, n).astype(float),
                      pa.float64()),
    })
    out = kendall_trend(rd.from_arrow(t).repartition(3), "k", ["o"],
                        "v")
    c, d, tau = _tau_ref(t.column("v").to_numpy())
    assert int(out["concordant"].iloc[0]) == c
    assert int(out["discordant"].iloc[0]) == d
    assert out["tau_b"].iloc[0] == tau


def test_moving_slope_twin_null_semantics_vs_duckdb(rd):
    # review r4 s8b (execution-confirmed): the twin's sum(x)/sum(x*x)
    # must CASE-gate on y nulls exactly like the engine — pin the
    # engine against the FIXED twin SQL on a null-bearing fixture
    import duckdb

    import __ray_entry__ as e

    t = pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "source": pa.array(["s"] * 12, pa.string()),
        "n_chars": pa.array([10, None, 13, 7, None, 20, 5, None,
                             None, 9, 30, 2], pa.int64()),
    })
    # window=8 — the key's pinned frame (ROWS BETWEEN 7 PRECEDING)
    out = moving_slope(rd.from_arrow(t), "source", ["doc_id"],
                       "n_chars", window=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.sql(e.oracle_sql()["window_moving_slope"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    got = out["mov_slope"].to_numpy()
    exp = want["mov_slope"].to_numpy()
    mask = ~np.isnan(exp)
    assert (got[mask] == exp[mask]).all()
    assert np.isnan(got[~mask]).all()


# ------------------------------------------------------------ theil_sen


def test_theil_sen_matches_bruteforce(rd):
    from maestro_ray.ops.aggregates import theil_sen_trend

    rng = np.random.default_rng(43)
    n = 120
    t = pa.table({
        "k": pa.array(rng.integers(0, 4, n), pa.int64()),
        "o": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.normal(size=n).round(2), pa.float64()),
    })
    out = theil_sen_trend(rd.from_arrow(t).repartition(4), "k", ["o"],
                          "v").set_index("k")
    df = t.to_pandas().sort_values(["k", "o"])
    for k, g in df.groupby("k"):
        v = g["v"].to_numpy()
        slopes = sorted(
            (v[j] - v[i]) / (j - i)
            for i in range(len(v)) for j in range(i + 1, len(v)))
        m = len(slopes)
        p = 0.5 * (m - 1)
        lo, hi = int(np.floor(p)), int(np.ceil(p))
        want = slopes[lo] + (slopes[hi] - slopes[lo]) * (p - lo)
        assert out.loc[k, "sen_slope"] == want  # bit-exact contract


def test_theil_sen_clean_trend_and_guards(rd):
    from maestro_ray.ops.aggregates import theil_sen_trend

    # perfect linear trend with one wild outlier: the median slope
    # must stay at the clean 3.0 (robustness, unlike OLS)
    v = [3.0 * i for i in range(11)]
    v[5] = 1000.0
    t = pa.table({"k": pa.array([1] * 11, pa.int64()),
                  "o": pa.array(np.arange(11), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    out = theil_sen_trend(rd.from_arrow(t), "k", ["o"], "v")
    assert out["sen_slope"].iloc[0] == 3.0

    big = pa.table({"k": pa.array([1] * 30, pa.int64()),
                    "o": pa.array(np.arange(30), pa.int64()),
                    "v": pa.array(np.arange(30.0), pa.float64())})
    with pytest.raises(Exception, match="max_group_rows|sample"):
        theil_sen_trend(rd.from_arrow(big), "k", ["o"], "v",
                        max_group_rows=10)
