"""Edge cases for the r4-s5 aggregate batch: avg_rank window ties,
grouped_topk_ties tie/short-group behavior, ratio_to_report nulls,
dedup_consecutive null runs, spearman vs a pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.aggregates import (
    dedup_consecutive,
    grouped_topk_ties,
    rank_window,
    ratio_to_report,
    spearman_grouped,
)


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_avg_rank_ties_average_the_run():
    ds = _ds([
        {"g": "a", "v": 10}, {"g": "a", "v": 20}, {"g": "a", "v": 20},
        {"g": "a", "v": 30}, {"g": "b", "v": 5},
    ])
    out = rank_window(ds, "g", ["v"], out="r", method="avg_rank") \
        .to_pandas().sort_values(["g", "v"]).reset_index(drop=True)
    # the two 20s share rank (2+3)/2 = 2.5
    assert list(out["r"]) == [1.0, 2.5, 2.5, 4.0, 1.0]
    # cross-check against pandas' average rank
    pdf = ds.to_pandas()
    want = pdf.groupby("g")["v"].rank(method="average")
    got = rank_window(ds, "g", ["v"], out="r", method="avg_rank") \
        .to_pandas()
    merged = got.merge(pdf.assign(want=want), on=["g", "v"]) \
        .drop_duplicates()
    assert (merged["r"] == merged["want"]).all()


def test_grouped_topk_ties_includes_all_peers():
    ds = _ds([
        {"g": "a", "v": 9, "id": 1}, {"g": "a", "v": 9, "id": 2},
        {"g": "a", "v": 9, "id": 3}, {"g": "a", "v": 7, "id": 4},
        {"g": "a", "v": 5, "id": 5},
        # short group: fewer rows than k → everything qualifies
        {"g": "b", "v": 1, "id": 6},
    ])
    out = grouped_topk_ties(ds, "g", "v", 2).to_pandas() \
        .sort_values(["g", "id"]).reset_index(drop=True)
    a = out[out["g"] == "a"]
    # k=2 but three 9s tie at rank 1 → all three survive; 7 has rank 4
    # (> 2) and is excluded — SQL RANK, not row_number
    assert sorted(a["id"]) == [1, 2, 3]
    assert set(a["rank"]) == {1}
    b = out[out["g"] == "b"]
    assert list(b["id"]) == [6] and list(b["rank"]) == [1]


def test_grouped_topk_ties_rank_past_tie_run():
    ds = _ds([
        {"g": "a", "v": 9, "id": 1}, {"g": "a", "v": 8, "id": 2},
        {"g": "a", "v": 8, "id": 3}, {"g": "a", "v": 7, "id": 4},
    ])
    out = grouped_topk_ties(ds, "g", "v", 3).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    # ranks 1, 2, 2 qualify; 7 has rank 4 > 3 — dropped by tie gap
    assert list(out["id"]) == [1, 2, 3]
    assert list(out["rank"]) == [1, 2, 2]


def test_ratio_to_report_nulls_and_exactness():
    ds = _ds([
        {"g": "a", "v": 1.0}, {"g": "a", "v": 3.0},
        {"g": "a", "v": None}, {"g": "b", "v": 2.0},
    ])
    out = ratio_to_report(ds, "g", "v").to_pandas() \
        .sort_values(["g", "v"]).reset_index(drop=True)
    vals = out[out["g"] == "a"]["ratio"].tolist()
    assert vals[0] == 0.25 and vals[1] == 0.75  # bit-exact on ints
    assert np.isnan(vals[2])  # null value → null ratio
    assert out[out["g"] == "b"]["ratio"].tolist() == [1.0]


def test_dedup_consecutive_matches_sql_lag_semantics():
    rows = [
        {"k": 1, "t": 1, "v": "x"}, {"k": 1, "t": 2, "v": "x"},
        {"k": 1, "t": 3, "v": "y"}, {"k": 1, "t": 4, "v": None},
        {"k": 1, "t": 5, "v": None}, {"k": 1, "t": 6, "v": "x"},
        # first row null: SQL lag yields null, IS DISTINCT FROM is
        # false → dropped (the documented quirk)
        {"k": 2, "t": 1, "v": None}, {"k": 2, "t": 2, "v": "z"},
    ]
    out = dedup_consecutive(_ds(rows), "k", ["t"], "v").to_pandas() \
        .sort_values(["k", "t"]).reset_index(drop=True)
    assert list(zip(out["k"], out["t"])) == [
        (1, 1), (1, 3), (1, 4), (1, 6), (2, 2)]


def test_spearman_matches_pandas_reference():
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 200),
        "x": np.concatenate([rng.integers(0, 20, 200),
                             rng.normal(size=200)]),
    })
    # monotone-ish with noise + heavy ties in group a
    pdf["y"] = pdf["x"] * 2 + rng.normal(scale=3.0, size=400)
    got = spearman_grouped(rd.from_pandas(pdf), "g", "x", "y")
    for g in ["a", "b"]:
        sub = pdf[pdf["g"] == g]
        want = sub["x"].rank(method="average").corr(
            sub["y"].rank(method="average"))
        have = float(got[got["g"] == g]["spearman"].iloc[0])
        assert have == pytest.approx(want, abs=1e-12), g


def test_spearman_degenerate_groups_null():
    ds = _ds([
        {"g": "one", "x": 1.0, "y": 2.0},          # n = 1
        {"g": "const", "x": 5.0, "y": 1.0},        # zero x-variance
        {"g": "const", "x": 5.0, "y": 2.0},
        {"g": "nulls", "x": None, "y": 1.0},       # no both-valid pair
        {"g": "nulls", "x": 1.0, "y": None},
    ])
    out = spearman_grouped(ds, "g", "x", "y")
    present = dict(zip(out["g"], out["spearman"]))
    assert np.isnan(present["one"]) and np.isnan(present["const"])
    # the nulls group has zero comparable rows → no output row at all
    # (matches SQL: corr over an empty set inside GROUP BY still emits
    # the group; we filter first, so the group vanishes — documented)
    assert "nulls" not in present


def test_welch_matches_numpy_reference():
    rng = np.random.default_rng(11)
    a = rng.normal(10, 2, 300)
    b = rng.normal(9.5, 4, 150)
    pdf = pd.DataFrame({
        "g": ["a"] * 300 + ["b"] * 150,
        "v": np.concatenate([a, b]),
    })
    from maestro_ray.ops.aggregates import welch_ttest

    out = welch_ttest(rd.from_pandas(pdf), "g", "v", "a", "b")
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / 300 + vb / 150
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2 ** 2 / ((va / 300) ** 2 / 299 + (vb / 150) ** 2 / 149)
    assert out["t_stat"].iloc[0] == pytest.approx(t, rel=1e-9)
    assert out["df"].iloc[0] == pytest.approx(df, rel=1e-9)
    with pytest.raises(ValueError, match="missing"):
        welch_ttest(rd.from_pandas(pdf), "g", "v", "a", "zzz")


def test_power_means_domain_and_values():
    from maestro_ray.ops.aggregates import power_means_grouped

    ds = _ds([
        {"g": "a", "x": 2.0}, {"g": "a", "x": 8.0},
        {"g": "a", "x": 0.0},    # excluded: not > 0
        {"g": "a", "x": -3.0},   # excluded
        {"g": "a", "x": None},   # excluded
        {"g": "b", "x": 5.0},
    ])
    out = power_means_grouped(ds, "g", "x")
    a = out[out["g"] == "a"].iloc[0]
    assert a["n_pos"] == 2
    assert a["geomean"] == pytest.approx(4.0)          # sqrt(2*8)
    assert a["harmonic"] == pytest.approx(3.2)         # 2/(1/2+1/8)
    b = out[out["g"] == "b"].iloc[0]
    assert b["geomean"] == pytest.approx(5.0)
    assert b["harmonic"] == pytest.approx(5.0)


def test_weighted_median_tie_crossing_and_guard():
    from maestro_ray.ops.aggregates import weighted_median_grouped

    ds = _ds([
        # total weight 10; half = 5; cum at v=1 is 4, the tie run at
        # v=2 (weights 1+2) crosses mid-run → median is 2 either way
        {"g": "a", "v": 1.0, "w": 4}, {"g": "a", "v": 2.0, "w": 1},
        {"g": "a", "v": 2.0, "w": 2}, {"g": "a", "v": 3.0, "w": 3},
        # exact half boundary: cw == 0.5*tw qualifies (lower median)
        {"g": "b", "v": 10.0, "w": 1}, {"g": "b", "v": 20.0, "w": 1},
    ])
    out = weighted_median_grouped(ds, "g", "v", "w")
    got = dict(zip(out["g"], out["weighted_median"]))
    assert got == {"a": 2.0, "b": 10.0}
    with pytest.raises(RuntimeError, match="quantile_sketch"):
        weighted_median_grouped(ds, "g", "v", "w", max_distinct=2)


def test_autocorr_matches_pandas_reference():
    from maestro_ray.ops.aggregates import autocorr_grouped

    rng = np.random.default_rng(3)
    n = 120
    pdf = pd.DataFrame({
        "k": np.repeat(["a", "b"], n),
        "t": np.tile(np.arange(n), 2),
        "v": np.concatenate([
            np.sin(np.arange(n) / 3) + rng.normal(scale=0.1, size=n),
            rng.normal(size=n),
        ]),
    })
    out = autocorr_grouped(rd.from_pandas(pdf), "k", ["t"], "v", lag=2)
    for k in ["a", "b"]:
        s = pdf[pdf["k"] == k].sort_values("t")["v"].reset_index(drop=True)
        x, y = s[2:].to_numpy(), s[:-2].to_numpy()
        want = np.corrcoef(x, y)[0, 1]
        have = float(out[out["k"] == k]["autocorr"].iloc[0])
        assert have == pytest.approx(want, abs=1e-10), k
        assert int(out[out["k"] == k]["n_pairs"].iloc[0]) == n - 2


def test_autocorr_null_and_short_groups():
    from maestro_ray.ops.aggregates import autocorr_grouped

    ds = _ds([
        {"k": "one", "t": 1, "v": 5.0},                  # 0 pairs
        {"k": "gap", "t": 1, "v": 1.0},                  # null voids
        {"k": "gap", "t": 2, "v": None},                 # both pairs
        {"k": "gap", "t": 3, "v": 2.0},
        {"k": "const", "t": 1, "v": 7.0},                # zero variance
        {"k": "const", "t": 2, "v": 7.0},
        {"k": "const", "t": 3, "v": 7.0},
    ])
    out = autocorr_grouped(ds, "k", ["t"], "v")
    got = out.set_index("k")
    assert np.isnan(got.loc["one", "autocorr"])
    assert got.loc["one", "n_pairs"] == 0
    assert got.loc["gap", "n_pairs"] == 0  # both pairs voided by null
    assert np.isnan(got.loc["const", "autocorr"])  # n=2 pairs, var 0
    assert got.loc["const", "n_pairs"] == 2
    with pytest.raises(ValueError, match="lag"):
        autocorr_grouped(ds, "k", ["t"], "v", lag=0)


def test_empty_inputs_keep_schema_everywhere():
    """The empty-Dataset schema-loss class (CLAUDE.md: bitten 10x):
    every new aggregate must survive empty / all-null-filtered input
    with a typed result instead of a KeyError."""
    from maestro_ray.ops.aggregates import (
        autocorr_grouped,
        power_means_grouped,
        running_distinct,
        weighted_median_grouped,
        welch_ttest,
    )

    empty = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()), "t": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()), "w": pa.array([], pa.int64()),
    }))
    allnull = _ds([{"g": None, "t": None, "v": None, "w": None}])

    for ds in (empty, allnull):
        out = running_distinct(ds, "g", "t")
        assert list(out.columns) == ["t", "new_ids", "cum_distinct"]
        assert len(out) == 0
        out = spearman_grouped(ds, "g", "v", "w")
        assert list(out.columns) == ["g", "spearman"]
        out = autocorr_grouped(ds, "g", ["t"], "v")
        assert list(out.columns) == ["g", "autocorr", "n_pairs"]
        out = power_means_grouped(ds, "g", "v")
        assert list(out.columns) == ["g", "n_pos", "geomean",
                                     "harmonic"]
        out = weighted_median_grouped(ds, "g", "v", "w")
        assert list(out.columns) == ["g", "weighted_median"]
        with pytest.raises(ValueError, match="missing"):
            welch_ttest(ds, "g", "v", "a", "b")

    # Dataset-returning ops: no crash, zero rows (an empty Dataset's
    # to_pandas loses schema — Ray's documented wart, tolerated here)
    assert len(ratio_to_report(empty, "g", "v").to_pandas()) == 0
    assert len(grouped_topk_ties(empty, "g", "v", 2).to_pandas()) == 0
    assert len(grouped_topk_ties(allnull, "g", "v", 2).to_pandas()) == 0
    # all-null input with a row: ratio column rides along, value null
    got = ratio_to_report(allnull, "g", "v").to_pandas()
    assert "ratio" in got.columns and len(got) == 1
    assert got["ratio"].isna().all()


def test_sample_group_k_exact_k_and_determinism():
    from maestro_ray.ops.corpus import sample_group_k

    rows = [{"g": "a", "id": i} for i in range(40)] \
        + [{"g": "b", "id": i} for i in range(100, 103)]  # short group
    out = sample_group_k(_ds(rows), "g", "id", 5).to_pandas()
    a = sorted(out[out["g"] == "a"]["id"])
    b = sorted(out[out["g"] == "b"]["id"])
    assert len(a) == 5 and len(set(a)) == 5
    assert b == [100, 101, 102]  # fewer than k: all rows
    # deterministic: a second run picks the identical sample
    again = sample_group_k(_ds(rows), "g", "id", 5).to_pandas()
    assert sorted(again[again["g"] == "a"]["id"]) == a
    # the loud hash-domain guard surfaces wrapped in RayTaskError
    with pytest.raises(Exception, match="non-negative"):
        sample_group_k(_ds([{"g": "a", "id": -1}]), "g", "id", 2) \
            .to_pandas()
    with pytest.raises(ValueError, match="k="):
        sample_group_k(_ds(rows), "g", "id", 0)


def test_sample_group_k_drops_null_keys():
    from maestro_ray.ops.corpus import sample_group_k

    rows = [{"g": "a", "id": 1}, {"g": "a", "id": None},
            {"g": "a", "id": 2}, {"g": "b", "id": None}]
    out = sample_group_k(_ds(rows), "g", "id", 3).to_pandas()
    a = out[out["g"] == "a"] if "g" in out.columns else out
    assert sorted(a["id"]) == [1, 2]  # nulls never sampled
    assert "b" not in set(out.get("g", []))  # all-null group vanishes
