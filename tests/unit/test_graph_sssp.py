"""SSSP (ops/graph.py sssp) vs a heap Dijkstra reference."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.graph import sssp


def _dijkstra(edges, source, directed):
    adj = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, [])
        if not directed:
            adj[b].append((a, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, np.inf):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _ds(edges):
    return rd.from_pandas(pd.DataFrame(
        edges, columns=["a", "b", "w"]))


@pytest.mark.parametrize("directed", [True, False])
def test_sssp_matches_dijkstra_random(ray_session, directed):
    rng = np.random.default_rng(17)
    n, m = 60, 300
    edges = [(int(rng.integers(n)), int(rng.integers(n)),
              float(np.round(rng.random() * 5 + 0.1, 3)))
             for _ in range(m)]
    out = sssp(_ds(edges), 0, directed=directed)
    ref = _dijkstra(edges, 0, directed)
    got = dict(zip(out["node"], out["dist"]))
    # source may be absent from the edge list's node set only if 0
    # never appears; rng makes that effectively impossible at m=300
    assert set(got) == {k for k, v in ref.items() if np.isfinite(v)}
    for k, v in got.items():
        assert v == pytest.approx(ref[k], rel=1e-12)


def test_sssp_prefers_multi_hop_cheap_path(ray_session):
    edges = [(0, 1, 10.0), (0, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    out = sssp(_ds(edges), 0)
    got = dict(zip(out["node"], out["dist"]))
    assert got[1] == pytest.approx(3.0)


def test_sssp_unreachable_and_missing_source(ray_session):
    edges = [(0, 1, 1.0), (5, 6, 1.0)]
    out = sssp(_ds(edges), 0)
    assert set(out["node"]) == {0, 1}
    # source not in the graph → empty result, not a crash
    out = sssp(_ds(edges), 99)
    assert out.empty


def test_sssp_negative_weight_raises(ray_session):
    with pytest.raises(Exception, match="negative"):
        sssp(_ds([(0, 1, -1.0)]), 0)


def test_sssp_directed_respects_direction(ray_session):
    edges = [(1, 0, 1.0)]
    out = sssp(_ds(edges), 0, directed=True)
    assert set(out["node"]) == {0}
    out = sssp(_ds(edges), 0, directed=False)
    assert dict(zip(out["node"], out["dist"]))[1] == 1.0


# ------------------------------------------------------------------ HITS

def _hits_ref(edges, n_iter):
    import numpy as np
    nodes = sorted({a for a, b in edges} | {b for a, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(n_iter):
        a2 = np.zeros(n)
        for a, b in edges:
            a2[idx[b]] += hub[idx[a]]
        norm = np.sqrt((a2 * a2).sum())
        auth = a2 / norm if norm > 0 else a2
        h2 = np.zeros(n)
        for a, b in edges:
            h2[idx[a]] += auth[idx[b]]
        norm = np.sqrt((h2 * h2).sum())
        hub = h2 / norm if norm > 0 else h2
    return nodes, hub, auth


def test_hits_matches_numpy_reference(ray_session):
    from maestro_ray.ops.graph import hits
    rng = np.random.default_rng(29)
    edges = sorted({(int(rng.integers(30)), int(rng.integers(30)))
                    for _ in range(150)})
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    out = hits(ds, iterations=15)
    nodes, hub, auth = _hits_ref(edges, 15)
    assert list(out["node"]) == nodes
    np.testing.assert_allclose(out["hub"], hub, atol=1e-9)
    np.testing.assert_allclose(out["authority"], auth, atol=1e-9)


def test_hits_star_graph(ray_session):
    from maestro_ray.ops.graph import hits
    # hub 0 points at 1..4: node 0 is the pure hub, others pure auths
    ds = rd.from_pandas(pd.DataFrame(
        [(0, i) for i in range(1, 5)], columns=["a", "b"]))
    out = hits(ds, iterations=5).set_index("node")
    assert out.loc[0, "hub"] == pytest.approx(1.0)
    assert out.loc[0, "authority"] == pytest.approx(0.0)
    for i in range(1, 5):
        assert out.loc[i, "authority"] == pytest.approx(0.5)
        assert out.loc[i, "hub"] == pytest.approx(0.0)


def test_hits_empty_edges(ray_session):
    from maestro_ray.ops.graph import hits
    ds = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                      "b": pd.Series(dtype="int64")}))
    out = hits(ds)
    assert out.empty and list(out.columns) == ["node", "hub",
                                               "authority"]
