"""Deduplication suite (SURVEY.md §2.G + training-data ops):
exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Ray-Data-first shapes (ray_guide 'Exact dedup / Near-dup'):

- **exact**: content-hash column (vectorized) → hash-partitioned
  groupby → deterministic winner (min id) per group.
- **MinHash-LSH**: per-batch vectorized shingle→minhash signatures →
  explode to (band_id, band_hash, doc_id) rows → groupby bands →
  candidate pairs → exact-Jaccard verification → connected components
  by iterative min-label propagation (driver-side union-find only on
  the verified edge list, which LSH keeps small).
- **SimHash**: 64-bit weighted-sign fingerprint; candidate blocking by
  16-bit sub-blocks (any hamming-≤-k pair shares a block for k ≤ 3·…).
- **embedding near-dup**: random-hyperplane signature buckets →
  within-bucket pairwise cosine.

Scale notes: signatures/fingerprints are per-batch vectorized numpy;
the only shuffles are the band/bucket groupbys whose rows are tiny
(ints). Verification re-reads only candidate docs. At 100 TB the
verify step must join candidates back to text via a bucketed join on
doc id rather than the broadcast used below (flagged per call site).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from maestro_ray.ops.hashing import hash_array

_MERSENNE = np.uint64((1 << 61) - 1)
_WORD_RE = re.compile(r"\S+")


# ----------------------------------------------------------------- shingles


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (deterministic, order-sensitive)."""
    words = _WORD_RE.findall(text or "")
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(hash_array(pd.Series(shingles)))


def _perm_params(n_hashes: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=n_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_hashes,) uint64 minhash signature — fully vectorized."""
    with np.errstate(over="ignore"):
        # (n_hashes, n_shingles) permuted hashes mod Mersenne prime
        m = (a[:, None] * (shingles[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    return m.min(axis=1)


def minhash_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 128,
    shingle_k: int = 3,
    n_bands: int = 32,
    seed: int = 17,
) -> pa.Table:
    """Per-batch stage: doc → (band_id, band_hash, doc_id) rows."""
    a, b = _perm_params(n_hashes, seed)
    rows_band, rows_hash, rows_id = [], [], []
    r = n_hashes // n_bands
    ids = batch.column(id_col).to_pylist()
    for i, text in enumerate(batch.column(text_col).to_pylist()):
        sig = minhash_signature(_shingle_hashes(text, shingle_k), a, b)
        bands = sig.reshape(n_bands, r)
        bh = hash_array(pd.Series([bands[j].tobytes() for j in range(n_bands)]))
        rows_band.extend(range(n_bands))
        rows_hash.extend(bh.tolist())
        rows_id.extend([ids[i]] * n_bands)
    return pa.table(
        {
            "band_id": pa.array(rows_band, pa.int32()),
            "band_hash": pa.array(rows_hash, pa.uint64()),
            "doc_id": pa.array(rows_id, pa.int64()),
        }
    )


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, shingle_k).tolist())
    sb = set(_shingle_hashes(text_b, shingle_k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find on the verified edge list (driver-side; edge list is
    post-LSH small). Returns node -> min-id representative."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def dedup_near_minhash(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 32,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """D4: MinHash-LSH near-dup clusters.

    Returns DataFrame (doc_id, cluster_rep); docs in no near-dup pair
    map to themselves. Verification broadcasts the candidate docs' texts
    (fine while candidates ≪ memory; at 100 TB swap the broadcast for a
    bucketed join of candidate pairs against the corpus by doc id).
    """
    bands = ds.map_batches(
        lambda t: minhash_batch(
            t, text_col, id_col, n_hashes, shingle_k, n_bands
        ),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist()))
        if len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    pairs = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
    )
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col]
    if pairs.empty:
        return pd.DataFrame({id_col: all_ids, "cluster_rep": all_ids})
    # verify candidates with exact jaccard on the involved docs only
    cand_ids = sorted(set(pairs["a"]) | set(pairs["b"]))
    texts_tbl = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=pa.array(cand_ids)))
        .select([id_col, text_col]),
        batch_format="pyarrow",
    ).to_pandas()
    texts = dict(zip(texts_tbl[id_col], texts_tbl[text_col]))
    edges = [
        (int(a), int(b))
        for a, b in zip(pairs["a"], pairs["b"])
        if jaccard(texts[a], texts[b], shingle_k) >= threshold
    ]
    rep = _components(edges)
    return pd.DataFrame(
        {id_col: all_ids, "cluster_rep": [rep.get(i, i) for i in all_ids]}
    )


# ------------------------------------------------------------------ simhash


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash fingerprint per doc (token-count weighted signs)."""
    out = np.zeros(batch.num_rows, dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    for i, text in enumerate(batch.column(text_col).to_pylist()):
        words = _WORD_RE.findall(text or "")
        if not words:
            continue
        uniq, counts = np.unique(words, return_counts=True)
        h = hash_array(pd.Series(uniq))
        signs = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64) * 2 - 1
        v = (signs * counts[:, None]).sum(axis=0)
        out[i] = np.sum((v > 0).astype(np.uint64) << bits, dtype=np.uint64)
    return batch.append_column(out_col, pa.array(out, pa.uint64()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def dedup_near_simhash(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> pd.DataFrame:
    """SimHash near-dup pairs via 16-bit block LSH: a pair with hamming
    ≤ 3 must agree on at least one of the four 16-bit blocks."""
    fp = ds.map_batches(
        lambda t: simhash_batch(t, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def explode_blocks(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        blocks, keys, out_ids, out_sh = [], [], [], []
        for blk in range(4):
            part = (sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            blocks.extend([blk] * len(ids))
            keys.extend(part.tolist())
            out_ids.extend(ids.tolist())
            out_sh.extend(sh.tolist())
        return pa.table({
            "block": pa.array(blocks, pa.int32()),
            "key": pa.array(keys, pa.int64()),
            id_col: pa.array(out_ids, pa.int64()),
            "simhash": pa.array(out_sh, pa.uint64()),
        })

    def block_pairs(g: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(g.column(id_col).to_pylist(), g.column("simhash").to_pylist()))
        )
        a_o, b_o = [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if hamming64(rows[i][1], rows[j][1]) <= max_hamming:
                    a_o.append(rows[i][0])
                    b_o.append(rows[j][0])
        return pa.table({"a": pa.array(a_o, pa.int64()), "b": pa.array(b_o, pa.int64())})

    pairs = (
        fp.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby(["block", "key"])
        .map_groups(block_pairs, batch_format="pyarrow")
        .to_pandas()
        .drop_duplicates()
        .reset_index(drop=True)
    )
    return pairs


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 23,
    dim: int | None = None,
) -> pd.DataFrame:
    """Near-duplicate vectors: random-hyperplane bucket LSH + exact
    within-bucket cosine. Returns verified pairs (a, b, cosine)."""
    first = None
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    planes_ref = ray.put(planes)
    bits = np.arange(n_planes, dtype=np.uint64)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        emb = np.asarray(t.column(emb_col).to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.clip(norms, 1e-12, None)
        signs = (emb @ pl) > 0
        bucket = (signs.astype(np.uint64) << bits[None, :]).sum(axis=1)
        flat = [emb[i].tobytes() for i in range(len(emb))]
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            id_col: t.column(id_col),
            "vec": pa.array(flat, pa.binary()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        vecs = np.stack([
            np.frombuffer(b, dtype=np.float32) for b in g.column("vec").to_pylist()
        ])
        sims = vecs @ vecs.T
        a_o, b_o, s_o = [], [], []
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if sims[i, j] >= threshold:
                    a_o.append(ids[i])
                    b_o.append(ids[j])
                    s_o.append(round(float(sims[i, j]), 6))
        return pa.table({
            "a": pa.array(a_o, pa.int64()),
            "b": pa.array(b_o, pa.int64()),
            "cosine": pa.array(s_o, pa.float64()),
        })

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty or "a" not in out.columns:  # empty Ray result loses schema
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return (
        out.drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
