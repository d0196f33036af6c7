"""Partitioned-vertex-state paths for pagerank / sssp / hits /
bfs_levels (ops/graph.py) — the >max_broadcast_nodes plan where the
rank/distance/score state is a hash-bucketed Dataset instead of a
driver broadcast. Each test FORCES the partitioned path (via
max_broadcast_nodes=2 auto-dispatch or state="partitioned") and pins
it against the broadcast path / an independent reference:
float-iterative ops at 1e-9 (the distributed-float rule), integer /
min-fold ops exactly."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.graph import bfs_levels, hits, pagerank, sssp


def _edges_ds(edges, blocks=3):
    a, b = zip(*edges)
    return rd.from_arrow(pa.table({
        "a": pa.array(a, pa.int64()),
        "b": pa.array(b, pa.int64()),
    })).repartition(blocks)


def test_pagerank_partitioned_matches_broadcast(ray_session):
    rng = np.random.default_rng(11)
    edges = sorted({(int(rng.integers(25)), int(rng.integers(25)))
                    for _ in range(90)})
    # include a dangling node (only appears as dst) + an isolated spoke
    edges += [(99, 0)]
    ds = _edges_ds(edges)
    want = pagerank(ds, iterations=8, state="broadcast")
    # auto-dispatch: node guard of 2 forces the partitioned plan
    got = pagerank(ds, iterations=8, max_broadcast_nodes=2,
                   num_buckets=4)
    assert list(got["node"]) == list(want["node"])
    np.testing.assert_allclose(got["rank"], want["rank"], atol=1e-9)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


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


@pytest.mark.parametrize("directed", [True, False])
def test_sssp_partitioned_matches_dijkstra(ray_session, directed):
    rng = np.random.default_rng(7)
    n, m = 30, 120
    edges = [(int(rng.integers(n)), int(rng.integers(n)),
              float(np.round(rng.random() * 5 + 0.1, 3)))
             for _ in range(m)]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["a", "b", "w"]))
    out = sssp(ds, 0, directed=directed, state="partitioned",
               num_buckets=4)
    ref = _dijkstra(edges, 0, directed)
    got = dict(zip(out["node"], out["dist"]))
    assert set(got) == {k for k, v in ref.items() if np.isfinite(v)}
    for k, v in got.items():
        assert v == pytest.approx(ref[k], rel=1e-12)


def test_sssp_partitioned_missing_source_empty(ray_session):
    ds = rd.from_pandas(pd.DataFrame(
        [(0, 1, 1.0)], columns=["a", "b", "w"]))
    out = sssp(ds, 42, state="partitioned", num_buckets=4)
    assert out.empty
    assert list(out.columns) == ["node", "dist"]


def test_hits_partitioned_matches_broadcast(ray_session):
    rng = np.random.default_rng(3)
    edges = sorted({(int(rng.integers(15)), int(rng.integers(15)))
                    for _ in range(60)})
    ds = _edges_ds(edges)
    want = hits(ds, iterations=5, state="broadcast")
    got = hits(ds, iterations=5, max_broadcast_nodes=2, num_buckets=4)
    assert list(got["node"]) == list(want["node"])
    np.testing.assert_allclose(got["hub"], want["hub"], atol=1e-9)
    np.testing.assert_allclose(got["authority"], want["authority"],
                               atol=1e-9)


@pytest.mark.parametrize("directed", [True, False])
def test_bfs_partitioned_matches_broadcast(ray_session, directed):
    rng = np.random.default_rng(5)
    edges = sorted({(int(rng.integers(20)), int(rng.integers(20)))
                    for _ in range(50)})
    ds = _edges_ds(edges)
    want = bfs_levels(ds, [0, 7], directed=directed, max_depth=6,
                      state="broadcast")
    got = bfs_levels(ds, [0, 7], directed=directed, max_depth=6,
                     state="partitioned", num_buckets=4)
    pd.testing.assert_frame_equal(got, want)


def test_bfs_partitioned_no_seed_in_graph(ray_session):
    ds = _edges_ds([(1, 2), (2, 3)])
    out = bfs_levels(ds, [99], state="partitioned", num_buckets=4)
    assert out.empty
    assert list(out.columns) == ["node", "dist"]
