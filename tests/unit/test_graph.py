"""connected_components: union-find ground truth on random graphs,
chain diameter via the pointer-doubling closure, both the local-finish
and distributed-contraction paths, and input edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.graph import connected_components


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def _edges(rd, pairs, parts=4):
    t = pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                  "b": pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t).repartition(parts)


def _uf(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    lab = {}
    for ms in comp.values():
        m = min(ms)
        for x in ms:
            lab[x] = m
    return lab


def test_components_match_union_find(rd):
    rng = np.random.default_rng(7)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 200, (250, 2))]
    nodes = sorted({x for p in pairs for x in p})
    exp = _uf(pairs, nodes)
    out = connected_components(_edges(rd, pairs)).to_pandas()
    got = dict(zip(out.node.astype(int), out.label.astype(int)))
    assert got == exp


def test_chain_converges_via_local_finish(rd):
    pairs = [(i, i + 1) for i in range(300)]
    out = connected_components(_edges(rd, pairs, 5)).to_pandas()
    assert len(out) == 301 and (out.label == 0).all()


def test_distributed_contraction_path(rd):
    # force distributed rounds with a tiny guard: a 48-chain needs the
    # pointer-doubling closure (plain contraction shrinks chains by
    # only one edge per round — the r3 redesign's whole point)
    pairs = [(i, i + 1) for i in range(48)]
    out = connected_components(_edges(rd, pairs, 3),
                               local_edge_threshold=5).to_pandas()
    assert len(out) == 49 and (out.label == 0).all()


def test_edge_cases(rd):
    t = pa.table({"a": pa.array([1, 2, None, 5], pa.int64()),
                  "b": pa.array([2, 1, 9, 5], pa.int64())})
    import ray.data as rdm

    out = connected_components(rdm.from_arrow(t)).to_pandas() \
        .set_index("node")
    # parallel edges fold, self-loop keeps its node, null edge drops
    assert out.loc[1, "label"] == 1 and out.loc[2, "label"] == 1
    assert out.loc[5, "label"] == 5
    assert 9 not in out.index
    with pytest.raises(ValueError, match="integer"):
        connected_components(
            rdm.from_arrow(pa.table({"a": ["x"], "b": ["y"]})))


def test_uint64_hash_ids_survive(rd):
    """Regression (r3 review): hash_array output is uint64 — values
    >= 2^63 must not wrap into corrupt labels or crash the cast."""
    big = np.array([2**63 + 5, 7, 2**63 + 5, 2**64 - 1],
                   dtype=np.uint64)
    t = pa.table({"a": pa.array(big[:2], pa.uint64()),
                  "b": pa.array(big[2:], pa.uint64())})
    import ray.data as rdm

    out = connected_components(rdm.from_arrow(t)).to_pandas() \
        .set_index("node")
    # bit-view of 2^63+5 is a NEGATIVE int64: both components keyed by
    # the signed view; edge1 = (2^63+5, 2^63+5) self-loop,
    # edge2 = (7, 2^64-1)
    k1 = np.uint64(2**63 + 5).astype(np.int64) if False else \
        np.array([2**63 + 5], dtype=np.uint64).view(np.int64)[0]
    k2 = np.array([2**64 - 1], dtype=np.uint64).view(np.int64)[0]
    assert out.loc[k1, "label"] == k1          # self-loop component
    assert out.loc[7, "label"] == min(7, k2)   # signed-view minimum
    assert out.loc[k2, "label"] == min(7, k2)


def test_empty_and_all_null_edges(rd):
    import ray.data as rdm

    t = pa.table({"a": pa.array([None, 3], pa.int64()),
                  "b": pa.array([5, None], pa.int64())})
    out_ds = connected_components(rdm.from_arrow(t))
    # schema asserted on the DATASET (empty to_pandas loses it — the
    # documented CLAUDE.md hazard)
    assert out_ds.schema().names == ["node", "label"]
    assert len(out_ds.to_pandas()) == 0
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    out2 = connected_components(rdm.from_arrow(empty)).to_pandas()
    assert len(out2) == 0


# ----------------------------------------------------------- triangle_count


def _tri(rd, pairs):
    from maestro_ray.ops.graph import triangle_count

    return int(triangle_count(_edges(rd, pairs))["triangles"].iloc[0])


def test_triangle_k4_is_four(rd):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(rd, k4) == 4


def test_triangle_dups_reversals_selfloops_ignored(rd):
    base = [(1, 2), (2, 3), (1, 3)]
    noisy = base + [(2, 1), (3, 2), (1, 2), (1, 1), (3, 3)]
    assert _tri(rd, noisy) == 1


def test_triangle_path_and_star_have_none(rd):
    assert _tri(rd, [(1, 2), (2, 3), (3, 4)]) == 0
    assert _tri(rd, [(0, i) for i in range(1, 6)]) == 0


def test_triangle_two_disjoint_plus_shared_edge(rd):
    # two triangles sharing edge (1,2) + one isolated triangle
    pairs = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4),
             (7, 8), (8, 9), (7, 9)]
    assert _tri(rd, pairs) == 3


def test_triangle_random_matches_bruteforce(rd):
    rng = np.random.default_rng(5)
    n = 30
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(220, 2)) if a != b]
    # brute force over the canonical edge set
    es = {(min(a, b), max(a, b)) for a, b in pairs}
    want = sum(1 for a in range(n) for b in range(a + 1, n)
               for c in range(b + 1, n)
               if (a, b) in es and (b, c) in es and (a, c) in es)
    assert _tri(rd, pairs) == want


# --------------------------------------------------------- common_neighbors


def test_common_neighbors_square(rd):
    from maestro_ray.ops.graph import common_neighbors

    # 4-cycle: each diagonal pair shares exactly 2 neighbors
    out = common_neighbors(
        _edges(rd, [(1, 2), (2, 3), (3, 4), (1, 4)]), k=10)
    got = set(zip(out["a"], out["c"], out["n_common"]))
    assert got == {(1, 3, 2), (2, 4, 2)}


def test_common_neighbors_excludes_existing_edges(rd):
    from maestro_ray.ops.graph import common_neighbors

    # triangle + pendant: (1,2),(1,3),(2,3) adjacent pairs never appear
    out = common_neighbors(
        _edges(rd, [(1, 2), (1, 3), (2, 3), (3, 4)]), k=10)
    pairs = set(zip(out["a"], out["c"]))
    assert (1, 2) not in pairs and (1, 3) not in pairs
    assert (1, 4) in pairs and (2, 4) in pairs


def test_common_neighbors_k_boundary_deterministic(rd):
    from maestro_ray.ops.graph import common_neighbors

    star = [(0, i) for i in range(1, 8)]  # all leaf pairs share hub 0
    a = common_neighbors(_edges(rd, star), k=5)
    b = common_neighbors(_edges(rd, star, parts=2), k=5)
    pd.testing.assert_frame_equal(a, b)  # (n desc, a, c) total order
    assert len(a) == 5 and (a["n_common"] == 1).all()
    assert list(a["a"]) == [1, 1, 1, 1, 1]  # smallest (a, c) win ties


# ------------------------------------------------------------------- kcore


def _kcore_brute(pairs, k):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        es = {(a, b) for a, b in es if a not in drop and b not in drop}


def test_kcore_peels_pendant_chain(rd):
    from maestro_ray.ops.graph import kcore

    # triangle with a tail: 2-core is exactly the triangle
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    out = kcore(_edges(rd, pairs), k=2)
    assert out["node"].tolist() == [1, 2, 3]
    assert out["degree"].tolist() == [2, 2, 2]


def test_kcore_random_matches_bruteforce(rd):
    from maestro_ray.ops.graph import kcore

    rng = np.random.default_rng(13)
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, 25, size=(120, 2)) if a != b]
    for k in (2, 3, 4):
        want = _kcore_brute(pairs, k)
        out = kcore(_edges(rd, pairs), k=k)
        assert out["node"].tolist() == sorted(want)
        assert dict(zip(out["node"], out["degree"])) == want


def test_kcore_empty_and_validation(rd):
    from maestro_ray.ops.graph import kcore

    out = kcore(_edges(rd, [(1, 2)]), k=5)  # everything peels away
    assert out.empty and list(out.columns) == ["node", "degree"]
    with pytest.raises(ValueError, match="k must be"):
        kcore(_edges(rd, [(1, 2)]), k=0)
