"""Near-dup + similarity-search tests on planted fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from maestro_ray.ops.dedup import (
    dedup_near_minhash,
    dedup_near_simhash,
    embedding_near_dup,
    hamming64,
    jaccard,
    minhash_signature,
    simhash_batch,
    _shingle_hashes,
)
from maestro_ray.ops.similarity import knn_brute, knn_lsh

BASE = (
    "the quick brown fox jumps over the lazy dog while the data engine "
    "streams arrow batches through the object store with backpressure "
    "and partitioned parquet outputs for every epoch of the changelog"
)


def _docs_table():
    docs = {
        0: BASE,
        1: BASE.replace("lazy", "sleepy"),  # near-dup of 0
        2: BASE + " trailing words appended here",  # near-dup of 0
        3: "completely different content about cooking pasta with garlic "
           "and olive oil in a big pot of salted boiling water tonight",
        4: "yet another unrelated document mentioning mountains rivers "
           "forests and the long hike we took last autumn in the north",
        5: BASE,  # exact dup of 0
    }
    return pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_minhash_signature_similarity_tracks_jaccard():
    from maestro_ray.ops.dedup import _perm_params

    a, b = _perm_params(128)
    s0 = minhash_signature(_shingle_hashes(BASE), a, b)
    s1 = minhash_signature(_shingle_hashes(BASE.replace("lazy", "sleepy")), a, b)
    s3 = minhash_signature(_shingle_hashes("pasta with garlic and oil"), a, b)
    est01 = (s0 == s1).mean()
    est03 = (s0 == s3).mean()
    true01 = jaccard(BASE, BASE.replace("lazy", "sleepy"))
    assert abs(est01 - true01) < 0.15
    assert est03 < 0.1 < est01


def test_minhash_lsh_finds_planted_cluster(docs_ds):
    out = dedup_near_minhash(docs_ds, threshold=0.5).to_pandas()
    rep = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert rep[0] == rep[1] == rep[2] == rep[5] == 0
    assert rep[3] == 3 and rep[4] == 4


def test_minhash_deterministic(docs_ds):
    a = dedup_near_minhash(docs_ds, threshold=0.5).to_pandas()
    b = dedup_near_minhash(docs_ds, threshold=0.5).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_simhash_near_dups(docs_ds):
    tbl = simhash_batch(_docs_table())
    fp = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("simhash").to_pylist()))
    assert fp[0] == fp[5]  # identical docs -> identical fingerprint
    assert hamming64(fp[0], fp[1]) < hamming64(fp[0], fp[3])
    pairs = dedup_near_simhash(docs_ds, max_hamming=6).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].to_numpy().tolist()))
    assert (0, 5) in got


def test_simhash_degenerate_block_capped(ray_session):
    """A degenerate block (every doc identical → one 16-bit bucket per
    block) must complete with O(N) pairs via the star+chain cap, not
    N²/2 — and still connect the cluster (every doc reachable)."""
    import ray.data as rd

    n = 600
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["same text for everyone"] * n, pa.string()),
    }))
    pairs = dedup_near_simhash(ds, max_hamming=3, max_bucket=64).to_pandas()
    # capped: star + chain = 2(n-1) distinct pairs max, far below n²/2
    assert 0 < len(pairs) <= 2 * (n - 1)
    # connectivity: union-find over the emitted pairs joins all docs
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs[["a", "b"]].to_numpy().tolist():
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(n)}) == 1


def test_minhash_distributed_assignment_matches_broadcast(docs_ds):
    """assign_broadcast_limit=0 forces the hash-join (no driver dict)
    assignment path; results must be identical to the broadcast path."""
    bcast = (
        dedup_near_minhash(docs_ds, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    dist = (
        dedup_near_minhash(docs_ds, threshold=0.5, assign_broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bcast, dist)


def test_minhash_degenerate_bucket_converges(ray_session):
    """A planted 100%-dup corpus far beyond max_bucket: the capped
    star+chain+jump edges must keep one cluster and converge within
    component_rounds even with the broadcast path disabled."""
    import ray.data as rd

    n = 300
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([BASE] * n, pa.string()),
    }))
    out = dedup_near_minhash(
        ds, threshold=0.5, max_bucket=16, component_rounds=16,
        assign_broadcast_limit=0,
    ).to_pandas()
    assert len(out) == n
    assert set(out["cluster_rep"]) == {0}


def _emb_ds(rd):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 32)).astype(np.float32)
    # plant: vec 20 = vec 0 + tiny noise; vec 21 = vec 1 scaled
    planted = np.vstack([
        base,
        base[0] + 0.01 * rng.standard_normal(32).astype(np.float32),
        base[1] * 3.0,
    ])
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(planted)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in planted],
                              pa.list_(pa.float32())),
    })), planted


def test_embedding_near_dup_finds_planted(ray_session):
    import ray.data as rd

    ds, _ = _emb_ds(rd)
    pairs = embedding_near_dup(ds, threshold=0.98, n_planes=6)
    got = set(map(tuple, pairs[["a", "b"]].to_numpy().tolist()))
    assert (0, 20) in got
    assert (1, 21) in got


def test_knn_brute_matches_numpy_exact(ray_session):
    import ray.data as rd

    ds, planted = _emb_ds(rd)
    q = planted[:2]
    out = knn_brute(ds, q, k=5)
    # exact reference
    norm = planted / np.linalg.norm(planted, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = norm @ qn.T
    for qi in range(2):
        expect = set(np.argsort(-sims[:, qi])[:5].tolist())
        got = set(out[out["query_id"] == qi]["vec_id"].tolist())
        assert got == expect, f"query {qi}"
    assert out[(out.query_id == 0) & (out.vec_id == 0)]["score"].iloc[0] == 1.0


def test_knn_lsh_recall_against_brute(ray_session):
    import ray.data as rd

    ds, planted = _emb_ds(rd)
    q = planted[:3]
    brute = knn_brute(ds, q, k=5)
    approx = knn_lsh(ds, q, k=5, n_planes=6, n_probes=7)
    recalls = []
    for qi in range(3):
        b = set(brute[brute.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # multi-probe LSH recall floor


def test_ann_index_probe_recall_and_sublinear_io(ray_session, tmp_path):
    """Persisted bucket index: probe must (a) reach knn_lsh-grade recall
    vs brute force and (b) read strictly less than the whole index —
    the property scan-time knn_lsh lacks."""
    import ray.data as rd

    from maestro_ray.ops.similarity import build_ann_index, knn_lsh_probe

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }))
    idx = str(tmp_path / "annidx")
    man = build_ann_index(ds, idx, n_planes=6, n_tables=4)
    assert sum(b["rows"] for b in man["buckets"]) == 200 * 4  # 1 row/table
    q = vecs[:3]
    out, stats = knn_lsh_probe(idx, q, k=5, n_probes=7, with_stats=True)
    brute = knn_brute(ds, q, k=5)
    recalls = []
    for qi in range(3):
        b = set(brute[brute.query_id == qi]["vec_id"])
        a = set(out[out.query_id == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6
    # sublinear probe: strictly fewer files AND bytes than the index
    assert 0 < stats["files_probed"] < stats["files_total"]
    assert 0 < stats["bytes_probed"] < stats["bytes_total"]


def test_ann_index_probe_matches_scan_lsh(ray_session, tmp_path):
    """Same plane family + probe set => indexed probe returns a superset-
    quality result comparable to scan-time knn_lsh (identical candidates
    per table/bucket), and rebuilding is deterministic."""
    import ray.data as rd

    from maestro_ray.ops.similarity import build_ann_index, knn_lsh_probe

    ds, planted = _emb_ds(rd)
    idx = str(tmp_path / "annidx")
    m1 = build_ann_index(ds, idx, n_planes=6, n_tables=4)
    m2 = build_ann_index(ds, str(tmp_path / "annidx2"), n_planes=6, n_tables=4)
    assert [(b["table"], b["bucket"], b["rows"]) for b in m1["buckets"]] == [
        (b["table"], b["bucket"], b["rows"]) for b in m2["buckets"]
    ]
    q = planted[:3]
    scan = knn_lsh(ds, q, k=5, n_planes=6, n_probes=7, n_tables=4)
    probe = knn_lsh_probe(idx, q, k=5, n_probes=7)
    for qi in range(3):
        s = set(scan[scan.query_id == qi]["vec_id"])
        p = set(probe[probe.query_id == qi]["vec_id"])
        assert s == p, f"query {qi}: {s} != {p}"


def test_ngram_jaccard_exact_planted(docs_ds):
    """Exact operator: planted pair values must equal set-Jaccard over
    word-3-gram strings computed naively in Python."""
    from maestro_ray.ops.dedup import _shingle_strings, dedup_ngram_jaccard

    out = dedup_ngram_jaccard(docs_ds, threshold=0.3).to_pandas()
    got = {(r.a, r.b): r.jaccard for r in out.itertuples()}
    docs = {r["doc_id"]: r["text"] for r in _docs_table().to_pylist()}

    def naive(x, y):
        sa, sb = set(_shingle_strings(docs[x])), set(_shingle_strings(docs[y]))
        return round(len(sa & sb) / len(sa | sb), 6)

    assert got[(0, 5)] == 1.0  # exact dup
    assert (0, 1) in got and got[(0, 1)] == naive(0, 1)
    assert (0, 2) in got and got[(0, 2)] == naive(0, 2)
    assert (0, 3) not in got and (3, 4) not in got  # unrelated docs


def test_ngram_jaccard_ids_beyond_31_bits(ray_session):
    """doc ids ≥ 2^31 must take the two-column fallback (the packed
    int64 key would silently corrupt) and produce the same jaccard
    values as the same corpus with small ids."""
    import ray.data as rd
    from maestro_ray.ops.dedup import dedup_ngram_jaccard

    base = _docs_table()
    small = rd.from_arrow(base)
    shift = 1 << 32
    big = rd.from_arrow(base.set_column(
        0, "doc_id",
        pa.array([i + shift for i in base.column("doc_id").to_pylist()],
                 pa.int64()),
    ))
    out_small = dedup_ngram_jaccard(small, threshold=0.3).to_pandas()
    out_big = dedup_ngram_jaccard(big, threshold=0.3).to_pandas()
    small_pairs = {
        (r.a, r.b): r.jaccard for r in out_small.itertuples()
    }
    big_pairs = {
        (r.a - shift, r.b - shift): r.jaccard for r in out_big.itertuples()
    }
    assert small_pairs == big_pairs and len(small_pairs) > 0


def test_batch_shingle_hashes_matches_per_doc():
    """r4: the batch-vectorized shingle path must reproduce
    _shingle_hashes per doc exactly (sorted unique segments), incl.
    empty/short/null/repetitive docs and boundary whitespace."""
    import numpy as np

    from maestro_ray.ops.dedup import _batch_shingle_hashes

    texts = ["", "   ", None, "one", "one two", "a a a a a",
             "x y z x y z x y z", "  lead and trail  ",
             "tab\tsep\nnewline words here"]
    h, s = _batch_shingle_hashes(pa.array(texts, pa.string()), 3)
    e = np.append(s[1:], len(h))
    for i, t in enumerate(texts):
        seg = h[s[i]:e[i]]
        ref = _shingle_hashes(t or "", 3)
        assert np.array_equal(seg, ref), (i, t)


def test_minhash_simhash_batch_vectorized_identity():
    """r4: minhash_batch / simhash_batch (batch-vectorized) must be
    bit-identical to the per-doc reference computation."""
    import numpy as np

    from maestro_ray.ops.dedup import (_perm_params, _shingle_hashes,
                                       minhash_batch)
    from maestro_ray.ops.hashing import hash_array

    texts = ["the quick brown fox jumps", "the quick brown fox jumps",
             "", "pasta with oil", "a b", None,
             "  spaced   out   tokens everywhere again and again  "]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = minhash_batch(batch, n_hashes=64, n_bands=16)
    a, b = _perm_params(64)
    import pandas as pd
    rows_band, rows_hash, rows_id = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(_shingle_hashes(t or "", 3), a, b)
        bands = sig.reshape(16, 4)
        bh = hash_array(pd.Series([bands[j].tobytes() for j in range(16)]))
        rows_band.extend(range(16))
        rows_hash.extend(bh.tolist())
        rows_id.extend([i] * 16)
    ref = pa.table({
        "band_id": pa.array(rows_band, pa.int32()),
        "band_hash": pa.array(rows_hash, pa.uint64()),
        "doc_id": pa.array(rows_id, pa.int64()),
    })
    assert got.equals(ref)

    sh = simhash_batch(batch).column("simhash").to_numpy()
    bits = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        import re
        words = re.findall(r"\S+", t or "")
        if not words:
            assert sh[i] == 0
            continue
        uniq, counts = np.unique(words, return_counts=True)
        h = hash_array(pd.Series(uniq))
        signs = ((h[:, None] >> bits[None, :]) & np.uint64(1)
                 ).astype(np.int64) * 2 - 1
        v = (signs * counts[:, None]).sum(axis=0)
        ref_fp = np.sum((v > 0).astype(np.uint64) << bits, dtype=np.uint64)
        assert sh[i] == ref_fp, (i, t)


def test_minhash_null_doc_id_raises():
    """astype(int64) on a null-bearing id column would fold every null
    onto INT64_MIN, collapsing null-id docs into one fake doc with
    spurious band collisions — the stage must fail loudly instead."""
    import pyarrow as pa
    import pytest as _pytest

    from maestro_ray.ops.dedup import minhash_batch

    t = pa.table({
        "doc_id": pa.array([1, None, 3], pa.int64()),
        "text": pa.array(["a b c d", "a b c d", "x y z w"]),
    })
    with _pytest.raises(ValueError, match="null"):
        minhash_batch(t)
