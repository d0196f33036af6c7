"""Product-quantization ANN (ops/similarity.py build_pq_index /
knn_pq_probe): recall vs brute cosine, blob-level correctness,
self-retrieval, compression, determinism, guards."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from maestro_ray.ops.similarity import (
    _normalize,
    build_pq_index,
    knn_pq_probe,
)


def _ds(x):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(x)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in x],
                              pa.list_(pa.float32())),
    }))


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    # spread (gaussian) corpus: the discriminative regime for PQ —
    # blob data collapses intra-blob distinctions into code ties (see
    # test_blob_queries_stay_in_blob for that regime)
    x = np.random.default_rng(3).normal(size=(400, 64)) \
        .astype(np.float32)
    d = str(tmp_path_factory.mktemp("pq") / "idx")
    man = build_pq_index(_ds(x), d, m=16, n_codes=64, n_shards=4,
                         sample_size=400)
    return x, d, man


def test_recall_vs_brute(index):
    x, idx_dir, _man = index
    xn = _normalize(x)
    q = xn[:20] + 0.01  # near-copies of corpus points
    out, stats = knn_pq_probe(idx_dir, q, k=10, with_stats=True)
    brute = np.argsort(-(_normalize(q) @ xn.T), axis=1)[:, :10]
    hits = 0
    for qi in range(20):
        got = set(out[out.query_idx == qi]["id"])
        hits += len(got & set(brute[qi].tolist()))
    recall = hits / (20 * 10)
    assert recall >= 0.55, f"recall@10 {recall:.2f}"  # measured 0.705
    # the compression claim is real: m bytes/vec vs d*4 raw
    assert stats["bytes_codes"] * 4 < stats["bytes_raw_equiv"]


def test_blob_queries_stay_in_blob(ray_session, tmp_path):
    """Clustered corpus: PQ cells tie within a blob, but every top-k
    answer must still COME FROM the query's blob."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 64)).astype(np.float32) * 4
    blob = np.arange(400) % 8
    x = (centers[blob] + rng.normal(size=(400, 64)).astype(np.float32)
         ).astype(np.float32)
    d = str(tmp_path / "idx")
    build_pq_index(_ds(x), d, m=8, n_codes=16, n_shards=4,
                   sample_size=400)
    q = _normalize(x[:8])  # one query per blob
    out = knn_pq_probe(d, q, k=10)
    for qi in range(8):
        got = out[out.query_idx == qi]["id"].to_numpy()
        assert (blob[got] == blob[qi]).mean() >= 0.9


def test_self_retrieval_rank1(index):
    """A corpus vector queries itself: identical codes give it (or an
    exact code-tie) the top score."""
    x, idx_dir, _man = index
    q = x[[5, 17, 333]]
    out = knn_pq_probe(idx_dir, q, k=3)
    for qi, vid in enumerate([5, 17, 333]):
        rows = out[out.query_idx == qi]
        top_score = rows["score"].iloc[0]
        tied = set(rows[rows["score"] == top_score]["id"])
        assert vid in tied or rows["id"].iloc[0] == vid


def test_deterministic_rebuild(ray_session, index, tmp_path):
    x, idx_dir, man = index
    d2 = str(tmp_path / "idx2")
    man2 = build_pq_index(_ds(x), d2, m=16, n_codes=64, n_shards=4,
                          sample_size=400)
    assert man["codebooks"] == man2["codebooks"]
    q = _normalize(x[:4])
    a = knn_pq_probe(idx_dir, q, k=5)
    b = knn_pq_probe(d2, q, k=5)
    assert a.values.tolist() == b.values.tolist()


def test_guards(ray_session, index, tmp_path):
    x, _idx, _man = index
    with pytest.raises(ValueError, match="not divisible"):
        build_pq_index(_ds(x), str(tmp_path / "g1"), m=7)
    with pytest.raises(ValueError, match="cap at 256"):
        build_pq_index(_ds(x), str(tmp_path / "g2"), m=8, n_codes=512)


def test_manifest_shape(index):
    _x, idx_dir, man = index
    with open(os.path.join(idx_dir, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["kind"] == "pq"
    assert sum(p["rows"] for p in on_disk["partitions"]) == 400
    assert len(on_disk["codebooks"]) == 16


# ---------------------------------------------------------------- IVF-PQ


@pytest.fixture(scope="module")
def ivfpq(ray_session, tmp_path_factory):
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(8, 64)).astype(np.float32) * 4
    blob = np.arange(400) % 8
    x = (centers[blob] + rng.normal(size=(400, 64)).astype(np.float32)
         ).astype(np.float32)
    d = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    from maestro_ray.ops.similarity import build_ivfpq_index

    man = build_ivfpq_index(_ds(x), d, n_centroids=8, m=32, n_codes=64,
                            sample_size=400)
    return x, blob, d, man


def test_ivfpq_recall_and_sublinear_probe(ivfpq):
    from maestro_ray.ops.similarity import knn_ivfpq_probe

    x, _blob, idx_dir, _man = ivfpq
    xn = _normalize(x)
    q = xn[:20] + 0.01
    out = knn_ivfpq_probe(idx_dir, q, k=10, n_probes=2)
    brute = np.argsort(-(_normalize(q) @ xn.T), axis=1)[:, :10]
    hits = sum(
        len(set(out[out.query_idx == qi]["id"]) & set(brute[qi].tolist()))
        for qi in range(20))
    recall = hits / 200
    assert recall >= 0.6, f"recall@10 {recall:.2f}"  # measured 0.745
    # per-query probe I/O is sublinear: 2 of 8 cell files
    _o, s1 = knn_ivfpq_probe(idx_dir, q[:1], k=10, n_probes=2,
                             with_stats=True)
    assert s1["files_probed"] == 2 and s1["files_total"] == 8
    assert s1["bytes_raw_equiv"] >= 3 * s1["bytes_total"]  # compressed


def test_ivfpq_residual_beats_whole_vector_pq_on_blobs(ray_session,
                                                       ivfpq, tmp_path):
    """The reason IVF-PQ exists: residual coding preserves intra-cell
    structure that whole-vector PQ at the same code budget collapses."""
    from maestro_ray.ops.similarity import knn_ivfpq_probe

    x, _blob, idx_dir, _man = ivfpq
    d2 = str(tmp_path / "flatpq")
    build_pq_index(_ds(x), d2, m=32, n_codes=64, n_shards=4,
                   sample_size=400)
    xn = _normalize(x)
    q = xn[:20] + 0.01
    brute = np.argsort(-(_normalize(q) @ xn.T), axis=1)[:, :10]

    def recall(out):
        return sum(
            len(set(out[out.query_idx == qi]["id"])
                & set(brute[qi].tolist())) for qi in range(20)) / 200

    r_ivfpq = recall(knn_ivfpq_probe(idx_dir, q, k=10, n_probes=8))
    r_flat = recall(knn_pq_probe(d2, q, k=10))
    assert r_ivfpq > r_flat


def test_ivfpq_deterministic(ray_session, ivfpq, tmp_path):
    from maestro_ray.ops.similarity import (
        build_ivfpq_index,
        knn_ivfpq_probe,
    )

    x, _blob, idx_dir, man = ivfpq
    d2 = str(tmp_path / "idx2")
    man2 = build_ivfpq_index(_ds(x), d2, n_centroids=8, m=32,
                             n_codes=64, sample_size=400)
    assert man["centroids"] == man2["centroids"]
    assert man["codebooks"] == man2["codebooks"]
    q = _normalize(x[:4])
    a = knn_ivfpq_probe(idx_dir, q, k=5, n_probes=3)
    b = knn_ivfpq_probe(d2, q, k=5, n_probes=3)
    assert a.values.tolist() == b.values.tolist()
