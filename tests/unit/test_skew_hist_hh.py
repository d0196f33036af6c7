"""skew_join, grouped_quantiles_disc, histogram, heavy_hitters —
brute-force pandas oracles on deterministic synthetic tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.aggregates import (
    grouped_quantiles_disc,
    heavy_hitters,
    histogram,
)
from maestro_ray.ops.joins import skew_join


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _skewed_left(rd, n=3000, seed=3):
    """Key 1 owns ~60% of rows; keys 2-49 share the rest; key 99 has no
    right match (exercises inner-drop / left-outer-null)."""
    rng = np.random.RandomState(seed)
    keys = np.where(
        rng.rand(n) < 0.6, 1, rng.randint(2, 50, n)
    ).astype("int64")
    keys[:5] = 99
    return rd.from_arrow(pa.table({
        "rid": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(keys, pa.int64()),
        "val": pa.array(rng.randint(0, 1000, n), pa.int64()),
    })), keys


def _right_dim(rd, seed=5):
    rng = np.random.RandomState(seed)
    ks = np.arange(1, 50, dtype="int64")
    return rd.from_arrow(pa.table({
        "k": pa.array(ks, pa.int64()),
        "name": pa.array([f"dim{k}" for k in ks]),
        # overlapping column name → must be suffixed _r on BOTH paths
        "val": pa.array(rng.randint(0, 9, len(ks)), pa.int64()),
    }))


def _brute_join(left: pd.DataFrame, right: pd.DataFrame, how: str):
    r = right.rename(columns={"val": "val_r"})
    return left.merge(r, on="k", how=how)


def _canon(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    return sorted(
        df[cols].itertuples(index=False, name=None),
        key=lambda t: tuple((v is None or v != v, v) for v in t),
    )


def test_skew_join_inner_matches_plain_join(rd):
    left, _ = _skewed_left(rd)
    right = _right_dim(rd)
    out = skew_join(left, right, key="k", hot_keys={1}).to_pandas()
    want = _brute_join(left.to_pandas(), right.to_pandas(), "inner")
    assert sorted(out.columns) == sorted(want.columns)
    assert _canon(out) == _canon(want)
    assert len(want) > 0


def test_skew_join_left_outer_keeps_unmatched(rd):
    left, _ = _skewed_left(rd)
    right = _right_dim(rd)
    out = skew_join(left, right, key="k", join_type="left outer",
                    hot_keys={1}).to_pandas()
    want = _brute_join(left.to_pandas(), right.to_pandas(), "left")
    assert len(out) == len(want) == left.count()
    assert out.loc[out["k"] == 99, "name"].isna().all()
    got = sorted(zip(out["rid"], out["name"].fillna("∅")))
    exp = sorted(zip(want["rid"], want["name"].fillna("∅")))
    assert got == exp


def test_skew_join_autodetect_hot_key(rd):
    left, keys = _skewed_left(rd)
    right = _right_dim(rd)
    # threshold between the hot key's ~1800 rows and the cold ~25/key,
    # full sample → detection is exact and MUST find key 1
    out = skew_join(left, right, key="k", hot_threshold=500,
                    sample_fraction=1.0).to_pandas()
    want = _brute_join(left.to_pandas(), right.to_pandas(), "inner")
    assert _canon(out) == _canon(want)


def test_skew_join_hot_key_missing_from_right(rd):
    left, _ = _skewed_left(rd)
    right = _right_dim(rd)
    # 99 is hot-flagged but absent from right → empty hot broadcast side
    out = skew_join(left, right, key="k", hot_keys={99}).to_pandas()
    want = _brute_join(left.to_pandas(), right.to_pandas(), "inner")
    assert _canon(out) == _canon(want)


def test_skew_join_no_hot_keys_falls_through(rd):
    left, _ = _skewed_left(rd)
    right = _right_dim(rd)
    out = skew_join(left, right, key="k", hot_keys=set()).to_pandas()
    want = _brute_join(left.to_pandas(), right.to_pandas(), "inner")
    assert _canon(out) == _canon(want)


def test_skew_join_rejects_right_outer(rd):
    left, _ = _skewed_left(rd)
    with pytest.raises(ValueError, match="join_type"):
        skew_join(left, _right_dim(rd), key="k", join_type="right outer")


def _events(rd, n=5000, seed=11):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 200, n).astype("float64")
    vals[::61] = np.nan  # nulls must be ignored by quantiles
    return rd.from_arrow(pa.table({
        "g": pa.array(rng.randint(0, 4, n), pa.int64()),
        "v": pa.array(vals, pa.float64()),
    })), vals


def test_grouped_quantiles_disc_matches_brute(rd):
    ds, _ = _events(rd)
    out = grouped_quantiles_disc(ds, "g", "v", [0.25, 0.5, 0.9])
    pdf = ds.to_pandas()
    for g, grp in pdf.dropna(subset=["v"]).groupby("g"):
        vs = np.sort(grp["v"].to_numpy())
        for q in (0.25, 0.5, 0.9):
            # quantile_disc: value at 1-based position ceil(q*n)
            want = vs[max(1, int(np.ceil(q * len(vs)))) - 1]
            got = out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0]
            assert got == want, (g, q)
    assert len(out) == 4 * 3


def test_histogram_matches_numpy(rd):
    ds, vals = _events(rd)
    out = histogram(ds, "v", 0.0, 200.0, 8).sort_values("bin")
    ncol = [c for c in out.columns if c != "bin"][0]
    clean = vals[~np.isnan(vals)]
    want, _ = np.histogram(clean, bins=8, range=(0.0, 200.0))
    # np.histogram's last bin is closed [175, 200]; ours is half-open —
    # max value here is 199 < 200 so they agree
    got = dict(zip(out["bin"], out[ncol]))
    for b in range(8):
        assert got.get(b, 0) == want[b], b
    assert sum(got.values()) == len(clean)


def test_histogram_drops_out_of_range_and_validates(rd):
    ds = rd.from_arrow(pa.table({
        "v": pa.array([-5.0, 0.0, 49.9, 50.0, 99.9, 100.0, None],
                      pa.float64()),
    }))
    out = histogram(ds, "v", 0.0, 100.0, 2)
    ncol = [c for c in out.columns if c != "bin"][0]
    got = dict(zip(out["bin"], out[ncol]))
    assert got == {0: 2, 1: 2}  # -5, 100, null all dropped
    with pytest.raises(ValueError):
        histogram(ds, "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        histogram(ds, "v", 100.0, 0.0, 4)


def test_histogram_inexact_width_clamps_to_last_bin(rd):
    # width 0.9/3 = 0.3 is inexact: nextafter(0.9, -inf)/0.3 floors to 3
    edge = float(np.nextafter(0.9, -np.inf))
    ds = rd.from_arrow(pa.table({"v": pa.array([edge, 0.1, 0.45],
                                               pa.float64())}))
    out = histogram(ds, "v", 0.0, 0.9, 3)
    ncol = [c for c in out.columns if c != "bin"][0]
    got = dict(zip(out["bin"], out[ncol]))
    assert got == {0: 1, 1: 1, 2: 1}


def _zipfish(rd, n=8000, seed=17):
    """Two values above 15%, a long tail of ~200 distinct below — forces
    the Misra-Gries compression (distinct >> k) on every batch."""
    rng = np.random.RandomState(seed)
    u = rng.rand(n)
    vals = np.where(u < 0.30, 0, np.where(u < 0.48, 1,
                    rng.randint(2, 200, n))).astype("int64")
    return rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})), vals


def test_heavy_hitters_exact_vs_value_counts(rd):
    ds, vals = _zipfish(rd)
    out = heavy_hitters(ds, "x", 0.15)
    vc = pd.Series(vals).value_counts()
    thresh = int(np.ceil(0.15 * len(vals)))
    want = vc[vc >= thresh].sort_index()
    assert list(out["x"]) == list(want.index)
    assert list(out["n"]) == list(want.values)
    assert len(out) >= 2  # 0 and 1 are planted above threshold


def test_heavy_hitters_none_qualify(rd):
    rng = np.random.RandomState(23)
    ds = rd.from_arrow(pa.table({
        "x": pa.array(rng.randint(0, 500, 2000), pa.int64()),
    }))
    out = heavy_hitters(ds, "x", 0.5)
    assert len(out) == 0


def test_heavy_hitters_nulls_ignored_in_values_counted_in_n(rd):
    # 6/10 non-null 'a' but 6/10 of TOTAL rows is the denominator:
    # a=5, b=1, nulls=4 → a is 50% of 10 rows, passes at 0.5 exactly
    ds = rd.from_arrow(pa.table({
        "x": pa.array(["a"] * 5 + ["b"] + [None] * 4),
    }))
    out = heavy_hitters(ds, "x", 0.5)
    assert list(out["x"]) == ["a"] and list(out["n"]) == [5]
    with pytest.raises(ValueError):
        heavy_hitters(ds, "x", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(ds, "x", 1.0)


def test_heavy_hitters_all_null_column(rd):
    ds = rd.from_arrow(pa.table({"x": pa.array([None] * 50, pa.string())}))
    out = heavy_hitters(ds, "x", 0.2)
    assert len(out) == 0 and list(out.columns) == ["x", "n"]
