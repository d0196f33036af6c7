"""_jaro_winkler_pairs: pinned bit-exact to DuckDB's
jaro_winkler_similarity on random pairs (ASCII, multibyte, empties),
plus the join's guard/null/threshold behavior."""

import random
import string

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from maestro_ray.ops.joins import _jaro_winkler_pairs, jaro_winkler_join


def _duck(pairs):
    con = duckdb.connect()
    out = []
    for a, b in pairs:
        out.append(con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0])
    return np.array(out, np.float64)


def test_kernel_bit_exact_vs_duckdb_random():
    rng = random.Random(41)
    pairs = [("", ""), ("", "a"), ("a", ""), ("a", "a"), ("ab", "ba"),
             ("martha", "marhta"), ("dixon", "dicksonx"),
             ("café", "cafe"), ("naïve", "naive"), ("ééé", "eee")]
    for i in range(600):
        alpha = "abcd" if i % 2 else string.ascii_lowercase + "é"
        pairs.append((
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14))),
        ))
    mine = _jaro_winkler_pairs([p[0] for p in pairs],
                               [p[1] for p in pairs])
    want = _duck(pairs)
    # BIT-exact (==, not allclose): the cross-engine threshold filter
    # relies on identical doubles
    assert (mine == want).all(), \
        [(p, m, w) for p, m, w in zip(pairs, mine, want) if m != w][:5]


def test_kernel_empty_input():
    assert _jaro_winkler_pairs([], []).shape == (0,)


def test_join_threshold_nulls_and_guard(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "a": pa.array(["martha", "dwayne", None, "xxxx"], pa.string()),
    }))
    right = pa.table({"b": pa.array(["marhta", "duane", None],
                                    pa.string())})
    out = jaro_winkler_join(left, right, "a", "b",
                            min_sim=0.8).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert ("martha", "marhta") in got
    assert ("dwayne", "duane") in got
    assert not any(x is None or y is None for x, y in got)
    assert (out["jw"] >= 0.8).all()

    with pytest.raises(ValueError, match="max_right_rows"):
        jaro_winkler_join(left, pa.table({
            "b": pa.array([str(i) for i in range(50)], pa.string())}),
            "a", "b", min_sim=0.5, max_right_rows=10)
    with pytest.raises(ValueError, match="min_sim"):
        jaro_winkler_join(left, right, "a", "b", min_sim=1.5)


def test_scalar_jw_nulls_and_values(ray_session):
    import ray.data as rd

    from maestro_ray.ops.joins import jaro_winkler_scalar

    t = pa.table({
        "a": pa.array(["martha", None, "abc", ""], pa.string()),
        "b": pa.array(["marhta", "x", None, ""], pa.string()),
    })
    out = jaro_winkler_scalar(rd.from_arrow(t), "a", "b").to_pandas()
    want = _duck([("martha", "marhta")])[0]
    assert out["jw"].iloc[0] == want
    assert out["jw"].isna().tolist() == [False, True, True, False]
    assert out["jw"].iloc[3] == 0.0  # DuckDB empty-vs-empty rule
