"""Sharded NSW graph ANN (ops/nsw.py, r4): recall floor vs brute
force on planted blobs, sublinear distance evaluations, determinism,
persisted-index reuse."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.nsw import (
    _beam_search,
    _build_graph,
    build_nsw_index,
    knn_nsw_probe,
)
from maestro_ray.ops.similarity import _normalize


def _blobs(n_per=400, k=10, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)).astype(np.float32) * 3
    X = np.vstack([
        c + rng.standard_normal((n_per, dim)).astype(np.float32)
        for c in centers
    ])
    return X


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    X = _blobs()
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(X), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in X],
                              pa.list_(pa.float32())),
    })).repartition(4)
    idx = str(tmp_path_factory.mktemp("nsw") / "idx")
    meta = build_nsw_index(ds, idx, n_shards=4, m=8, ef_build=24)
    assert meta["n_vectors"] == len(X)
    return idx, X


def test_recall_floor_vs_brute_force(index):
    idx, X = index
    qs = X[[5, 1000, 2222, 3999]] + 0.01
    res = knn_nsw_probe(idx, qs, k=10, ef_search=64).to_pandas()
    V = _normalize(X.astype(np.float32))
    Q = _normalize(qs.astype(np.float32))
    sims = Q @ V.T
    recall = 0.0
    for qi in range(len(qs)):
        true = set(np.argsort(-sims[qi])[:10].tolist())
        got = set(res[res.query_id == qi]["vec_id"].tolist())
        recall += len(true & got) / 10
    assert recall / len(qs) >= 0.9


def test_distance_evals_sublinear(index):
    idx, X = index
    res = knn_nsw_probe(idx, X[[7]], k=10, ef_search=64).to_pandas()
    # each shard holds ~1000 vectors; the beam must touch well under
    # half of them (the property brute force lacks)
    assert res["n_dist"].max() < 400


def test_probe_deterministic(index):
    idx, X = index
    a = knn_nsw_probe(idx, X[[123]], k=5).to_pandas()
    b = knn_nsw_probe(idx, X[[123]], k=5).to_pandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert 123 in a["vec_id"].tolist()  # the vector finds itself


def test_multi_entry_rescues_clustered_insertion():
    """Single-entry greedy NSW gets stuck in the entry's cluster;
    the multi-entry beam must reach a far cluster."""
    X = _blobs(n_per=200, k=4, seed=3)
    V = _normalize(X.astype(np.float32))
    rng = np.random.default_rng(1)
    perm = rng.permutation(len(V))
    nbrs = _build_graph(V[perm], m=8, ef_build=24)
    q = V[perm][700]  # a far-cluster member
    found = [n for _s, n in _beam_search(V[perm], nbrs, q, 32)]
    assert 700 in found[:3]


def test_rebuild_clears_stale_shards(ray_session, tmp_path):
    """Rebuilding into an existing index_dir must not serve vectors
    from the previous corpus: a shard that receives no rows on the new
    (smaller) corpus must lose its old shard file, and old ids must
    never appear in probe results."""
    X = _blobs(n_per=50, k=4, dim=16, seed=7)

    def make_ds(ids, vecs):
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })).repartition(2)

    idx = str(tmp_path / "idx")
    build_nsw_index(make_ds(np.arange(len(X)), X), idx,
                    n_shards=8, m=4, ef_build=8)
    # rebuild over a DIFFERENT corpus: 3 vectors with huge ids
    small = X[:3]
    new_ids = np.array([10_001, 10_002, 10_003], dtype=np.int64)
    meta = build_nsw_index(make_ds(new_ids, small), idx,
                           n_shards=8, m=4, ef_build=8)
    assert meta["n_vectors"] == 3
    res = knn_nsw_probe(idx, X[:2], k=5, ef_search=16).to_pandas()
    assert set(res["vec_id"]) <= set(new_ids.tolist())
