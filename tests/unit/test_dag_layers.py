"""dag_layers (ops/graph.py): longest-path layering vs a reference
DP, multi-predecessor waits, cycle detection, isolated tails."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from maestro_ray.ops.graph import dag_layers


def _ds(edges):
    a, b = zip(*edges)
    return rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(3)


def _ref_layers(edges):
    # longest path ending at v, by DP over a topological order
    nodes = sorted({x for e in edges for x in e})
    preds = {v: [] for v in nodes}
    for a, b in edges:
        preds[b].append(a)
    layer = {}

    def depth(v, seen=()):
        if v in layer:
            return layer[v]
        if v in seen:
            raise ValueError("cycle")
        if not preds[v]:
            layer[v] = 0
            return 0
        layer[v] = 1 + max(depth(u, seen + (v,)) for u in preds[v])
        return layer[v]

    for v in nodes:
        depth(v)
    return layer


def test_matches_dp_reference(ray_session):
    rng = np.random.default_rng(11)
    # random DAG: edges only low -> high node id
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.integers(0, 25, (80, 2)) if a < b})
    out = dag_layers(_ds(edges), num_buckets=4)
    ref = _ref_layers(edges)
    got = dict(zip(out["node"], out["layer"]))
    assert got == ref


def test_diamond_waits_for_longest_predecessor(ray_session):
    # 0->1->2->3 and the shortcut 0->3: layer(3) must be 3, not 1
    out = dag_layers(_ds([(0, 1), (1, 2), (2, 3), (0, 3)]),
                     num_buckets=4)
    got = dict(zip(out["node"], out["layer"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_cycle_raises(ray_session):
    with pytest.raises(Exception, match="CYCLE"):
        dag_layers(_ds([(0, 1), (1, 2), (2, 0)]), num_buckets=4)


def test_empty_and_null_edges(ray_session):
    import pyarrow as pa

    ds = rd.from_arrow(pa.table({
        "a": pa.array([None], pa.int64()),
        "b": pa.array([1], pa.int64())}))
    out = dag_layers(ds)
    assert out.empty
