"""Unit oracles for the round-3 tail batch: grouped bivariate stats
(corr/covar), per-key mode, CUBE, the analytic-window pack, the
bloom-pruned semi join, and the persisted IVF ANN index."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import (
    analytic_window,
    cube_agg,
    grouped_corr,
    grouped_mode,
)


def _ds(ray_session, table: pa.Table, parts: int = 4):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parts)


# ------------------------------------------------------------ grouped_corr


def test_grouped_corr_matches_pandas_and_null_rule(ray_session):
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 3 + ["c"], pa.string()),
        "x": pa.array([1.0, 2.0, 3.0, None, 1.0, 2.0, 3.0, 5.0]),
        "y": pa.array([2.0, 4.0, 7.0, 9.0, 5.0, None, 1.0, 2.0]),
    })
    got = grouped_corr(_ds(ray_session, t), "k", "x", "y")
    # pairwise-complete semantics: a row counts only when BOTH non-null
    a = pd.DataFrame({"x": [1.0, 2.0, 3.0], "y": [2.0, 4.0, 7.0]})
    b = pd.DataFrame({"x": [1.0, 3.0], "y": [5.0, 1.0]})
    assert got["k"].tolist() == ["a", "b", "c"]
    assert got.loc[0, "covar_samp"] == pytest.approx(a["x"].cov(a["y"]))
    assert got.loc[0, "corr"] == pytest.approx(a["x"].corr(a["y"]))
    assert got.loc[1, "covar_samp"] == pytest.approx(b["x"].cov(b["y"]))
    assert got.loc[1, "corr"] == pytest.approx(-1.0)
    # n < 2 after the null filter -> NULL stats (SQL covar_samp/corr)
    assert pd.isna(got.loc[2, "covar_samp"]) and pd.isna(got.loc[2, "corr"])


def test_grouped_corr_zero_variance_yields_null_corr(ray_session):
    t = pa.table({
        "k": pa.array(["a"] * 3, pa.string()),
        "x": pa.array([5.0, 5.0, 5.0]),
        "y": pa.array([1.0, 2.0, 3.0]),
    })
    got = grouped_corr(_ds(ray_session, t, parts=2), "k", "x", "y")
    assert got.loc[0, "covar_samp"] == pytest.approx(0.0)
    assert pd.isna(got.loc[0, "corr"])


# ------------------------------------------------------------ grouped_mode


def test_grouped_mode_tie_breaks_smallest_and_ignores_nulls(ray_session):
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "v": pa.array(["z", "b", "z", "b", None, None, "q"], pa.string()),
    })
    got = grouped_mode(_ds(ray_session, t), "k", "v")
    # key 1: b and z tie at 2 -> smallest ("b") wins deterministically
    assert got[got["k"] == 1]["v"].item() == "b"
    assert got[got["k"] == 1]["n"].item() == 2
    # key 2: nulls are ignored, q (count 1) is the mode
    assert got[got["k"] == 2]["v"].item() == "q"
    assert got[got["k"] == 2]["n"].item() == 1


# ------------------------------------------------------------------ cube


def test_cube_agg_matches_pandas_all_subsets(ray_session):
    rng = np.random.default_rng(11)
    n = 400
    t = pa.table({
        "a": pa.array(rng.choice(["x", "y"], n)),
        "b": pa.array(rng.choice(["p", "q", "r"], n)),
        "v": pa.array(rng.uniform(0, 10, n)),
    })
    got = cube_agg(_ds(ray_session, t), ["a", "b"],
                   {"n": (None, "count"), "s": ("v", "sum"),
                    "m": ("v", "mean")}, round_to=6)
    df = t.to_pandas()
    frames = []
    for kept in ([["a", "b"], ["a"], ["b"], []]):
        if kept:
            lv = df.groupby(kept, as_index=False).agg(
                n=("v", "size"), s=("v", "sum"), m=("v", "mean"))
        else:
            lv = pd.DataFrame({"n": [len(df)], "s": [df["v"].sum()],
                               "m": [df["v"].mean()]})
        for c in ["a", "b"]:
            if c not in kept:
                lv[c] = "ALL"
        frames.append(lv[["a", "b", "n", "s", "m"]])
    want = pd.concat(frames, ignore_index=True)
    want["s"] = want["s"].round(6)
    want["m"] = want["m"].round(6)
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want) == 2 * 3 + 2 + 3 + 1
    pd.testing.assert_frame_equal(got[["a", "b", "n", "s", "m"]], want,
                                  check_dtype=False)


def test_cube_agg_rejects_non_remergeable_kind(ray_session):
    t = pa.table({"a": pa.array(["x"]), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="std"):
        cube_agg(_ds(ray_session, t, parts=1), ["a"], {"s": ("v", "std")})


# ------------------------------------------------------- analytic_window


def test_analytic_window_sql_tie_semantics(ray_session):
    # one partition, ordering column WITH ties: [10, 10, 20, 20, 20, 30]
    t = pa.table({
        "k": pa.array([1] * 6, pa.int64()),
        "o": pa.array([10, 10, 20, 20, 20, 30], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    out = (
        analytic_window(_ds(ray_session, t, parts=2), key="k",
                        order_cols=["o"], value_col="v", tiles=4)
        .to_pandas().sort_values("rn").reset_index(drop=True)
    )
    n = 6
    # peers share pct_rank (first-peer rank) and cume_dist (last-peer)
    assert out["pct_rank"].tolist() == pytest.approx(
        [0.0, 0.0, 2 / (n - 1), 2 / (n - 1), 2 / (n - 1), 1.0])
    assert out["cume_dist"].tolist() == pytest.approx(
        [2 / n, 2 / n, 5 / n, 5 / n, 5 / n, 1.0])
    # NTILE(4) over 6 rows: first 6 % 4 = 2 buckets get the extra row
    assert out["bucket"].tolist() == [1, 1, 2, 2, 3, 4]
    assert out["rn"].tolist() == [1, 2, 3, 4, 5, 6]
    assert set(out["first_val"]) == {out.loc[0, "v"]}
    assert set(out["last_val"]) == {out.loc[n - 1, "v"]}


def test_analytic_window_single_row_partition_and_bad_tiles(ray_session):
    t = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "o": pa.array([1, 1], pa.int64()),
        "v": pa.array([7.0, 8.0]),
    })
    out = analytic_window(_ds(ray_session, t, parts=1), key="k",
                          order_cols=["o"], value_col="v").to_pandas()
    # SQL: a one-row partition has pct_rank 0 and cume_dist 1
    assert out["pct_rank"].tolist() == [0.0, 0.0]
    assert out["cume_dist"].tolist() == [1.0, 1.0]
    with pytest.raises(ValueError, match="tiles"):
        analytic_window(_ds(ray_session, t, parts=1), key="k",
                        order_cols=["o"], value_col="v", tiles=0)


# ------------------------------------------------------------- bloom join


def test_bloom_filter_never_drops_true_members(ray_session):
    from maestro_ray.ops.joins import bloom_filter_ds, build_bloom

    import ray.data as rd

    rng = np.random.default_rng(5)
    right_keys = rng.choice(100_000, size=500, replace=False)
    left_keys = np.concatenate([right_keys, rng.integers(200_000, 300_000, 2000)])
    right = rd.from_arrow(pa.table({"k": pa.array(right_keys, pa.int64())}))
    left = _ds(ray_session,
               pa.table({"k": pa.array(left_keys, pa.int64()),
                         "rid": pa.array(range(len(left_keys)), pa.int64())}))
    m_bits = 1 << 14
    bloom = build_bloom(right, "k", m_bits=m_bits, k_hashes=4)
    survivors = bloom_filter_ds(left, "k", bloom, m_bits, 4).to_pandas()
    # no false NEGATIVES ever: every true member survives the bitmap
    assert set(right_keys) <= set(survivors["k"])
    # and the bitmap actually prunes (false-positive rate << 1)
    assert len(survivors) < len(left_keys)


def test_bloom_semi_join_equals_semi_join(ray_session):
    from maestro_ray.ops.joins import bloom_semi_join, semi_join

    import ray.data as rd

    rng = np.random.default_rng(9)
    left = _ds(ray_session, pa.table({
        "k": pa.array([None, 1, 2] + rng.integers(0, 5000, 3000).tolist(),
                      pa.int64()),
        "rid": pa.array(range(3003), pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([None, 1] + rng.integers(0, 2500, 400).tolist(),
                       pa.int64()),
    }))
    got = (bloom_semi_join(left, right, key="k", right_key="rk",
                           m_bits=1 << 13, num_buckets=4)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    want = (semi_join(left, right, key="k", right_key="rk")
            .to_pandas().sort_values("rid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "rid"]], want[["k", "rid"]])
    # null keys never semi-match
    assert not got["k"].isna().any()


def test_build_bloom_rejects_unaligned_bits(ray_session):
    from maestro_ray.ops.joins import build_bloom

    with pytest.raises(ValueError, match="multiple of 8"):
        build_bloom(pa.table({"k": pa.array([1], pa.int64())}), "k",
                    m_bits=1001)


# --------------------------------------------------------------- IVF index


def _clustered_embeddings(n_clusters=8, per=40, dim=16, seed=3):
    """Planted clusters: IVF's sweet spot, so few probes ~= exact."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(n_clusters * per, dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), vecs


def test_ivf_probe_recall_and_sublinear_io(ray_session, tmp_path):
    from maestro_ray.ops.similarity import (
        build_ivf_index,
        knn_brute,
        knn_ivf_probe,
    )

    import ray.data as rd

    table, vecs = _clustered_embeddings()
    ds = rd.from_arrow(table).repartition(4)
    idx = str(tmp_path / "ivf")
    man = build_ivf_index(ds, idx, n_centroids=8, sample_size=320, seed=7)
    assert len(man["partitions"]) <= 8 and man["dim"] == 16
    q = vecs[::40][:4]  # one query per planted cluster
    out, stats = knn_ivf_probe(idx, q, k=5, n_probes=2, with_stats=True)
    # sublinear probe: strictly fewer files AND bytes than the index
    assert 0 < stats["files_probed"] < stats["files_total"]
    assert 0 < stats["bytes_probed"] < stats["bytes_total"]
    brute = knn_brute(ds, q, k=5)
    hits = 0
    for qi in range(len(q)):
        g = set(out[out["query_id"] == qi]["vec_id"])
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        hits += len(g & b)
    # clustered data: 2-probe IVF recall@5 is near-perfect
    assert hits / (5 * len(q)) >= 0.9


def test_ivf_full_probe_matches_brute_exactly(ray_session, tmp_path):
    from maestro_ray.ops.similarity import (
        build_ivf_index,
        knn_brute,
        knn_ivf_probe,
    )

    import ray.data as rd

    table, vecs = _clustered_embeddings(n_clusters=4, per=25, seed=5)
    ds = rd.from_arrow(table).repartition(3)
    idx = str(tmp_path / "ivf_full")
    build_ivf_index(ds, idx, n_centroids=4, sample_size=100, seed=1)
    q = vecs[[3, 57]]
    # probing EVERY centroid degenerates to the exact scan
    got = knn_ivf_probe(idx, q, k=7, n_probes=4)
    want = knn_brute(ds, q, k=7)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


def test_ivf_build_is_deterministic(ray_session, tmp_path):
    from maestro_ray.ops.similarity import build_ivf_index, knn_ivf_probe

    import ray.data as rd

    table, vecs = _clustered_embeddings(n_clusters=3, per=20, seed=2)
    ds = rd.from_arrow(table).repartition(2)
    m1 = build_ivf_index(ds, str(tmp_path / "a"), n_centroids=3,
                         sample_size=60, seed=4)
    m2 = build_ivf_index(ds, str(tmp_path / "b"), n_centroids=3,
                         sample_size=60, seed=4)
    assert m1["centroids"] == m2["centroids"]
    q = vecs[[0]]
    o1 = knn_ivf_probe(str(tmp_path / "a"), q, k=4, n_probes=1)
    o2 = knn_ivf_probe(str(tmp_path / "b"), q, k=4, n_probes=1)
    pd.testing.assert_frame_equal(o1, o2)
