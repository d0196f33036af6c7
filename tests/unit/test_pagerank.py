"""pagerank (ops/graph.py): numpy power-iteration reference, closed
forms, dangling handling, partition invariance, guards."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.graph import pagerank


def _ref(edges, d=0.85, it=20):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for a, _ in edges:
        deg[ix[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(it):
        share = r / np.maximum(deg, 1.0)
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[ix[b]] += share[ix[a]]
        dm = r[deg == 0].sum()
        r = (1 - d) / n + d * (inflow + dm / n)
    return dict(zip(nodes, r))


def _ds(edges, blocks=3):
    a, b = zip(*edges)
    return rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
    })).repartition(blocks)


STAR = [(i, 0) for i in range(1, 6)]          # 5 spokes -> hub
CHAIN_CYCLE = [(1, 2), (2, 3), (3, 1), (3, 4), (9, 4)]


@pytest.mark.parametrize("edges", [STAR, CHAIN_CYCLE])
def test_matches_numpy_reference(ray_session, edges):
    got = pagerank(_ds(edges)).set_index("node")["rank"].to_dict()
    want = _ref(edges)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k
    assert abs(sum(got.values()) - 1.0) < 1e-9   # stochastic


def test_star_hub_dominates_and_partition_invariance(ray_session):
    a = pagerank(_ds(STAR, 2)).sort_values("node").reset_index(drop=True)
    b = pagerank(_ds(STAR, 7)).sort_values("node").reset_index(drop=True)
    assert np.allclose(a["rank"], b["rank"], atol=1e-12)
    hub = a[a.node == 0]["rank"].iloc[0]
    assert (a[a.node != 0]["rank"] < hub).all()


def test_guards_and_nulls(ray_session):
    ds = _ds(STAR)
    with pytest.raises(ValueError):
        pagerank(ds, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(ds, iterations=0)
    with pytest.raises(ValueError, match="state"):
        pagerank(ds, state="bogus")
    withnull = rd.from_arrow(pa.table({
        "a": pa.array([1, None], pa.int64()),
        "b": pa.array([2, 3], pa.int64())}))
    out = pagerank(withnull)
    assert set(out.node) == {1, 2}               # null edge dropped
