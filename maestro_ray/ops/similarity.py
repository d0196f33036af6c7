"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact top-k cosine — numpy matmul per batch against a
  broadcast query matrix (``ray.put`` once), per-batch local top-k
  (combiner), tiny global merge. The baseline every ANN variant is
  verified against.
- ``knn_lsh``: random-hyperplane-bucketed approximate variant — the
  scale path: queries probe only vectors sharing a bucket (multi-probe
  over nearby buckets for recall).

Zero-copy notes: embeddings stay Arrow list<float> until the numpy
kernel; query matrix is broadcast once per job, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _emb_matrix(t: pa.Table, emb_col: str) -> np.ndarray:
    col = t.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def knn_brute(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
) -> pd.DataFrame:
    """Exact top-k cosine per query row. Returns (query_id, vec_id,
    score) with deterministic ties (higher score, then lower vec_id)."""
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    if normalize:
        q = _normalize(q)
    q_ref = ray.put(q)

    def local_topk(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        emb = _emb_matrix(t, emb_col)
        if normalize:
            emb = _normalize(emb)
        sims = emb @ qm.T  # (n, nq)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        kk = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[part].tolist())
            out_s.extend(sims[part, qi].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    survivors = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    survivors["score"] = survivors["score"].round(6)
    out = (
        survivors.sort_values(["query_id", "score", id_col],
                              ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def knn_lsh(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_probes: int = 9,
    n_tables: int = 4,
    seed: int = 23,
) -> pd.DataFrame:
    """Approximate top-k: MULTI-TABLE hyperplane LSH + multi-probe.

    ``n_tables`` independent hyperplane sets; per table the query probes
    its own bucket plus the ``n_probes-1`` nearest single-bit flips
    (least-confident planes first). A vector is a candidate if ANY
    table buckets it with the query — the standard recall amplifier for
    unclustered data, where a single table's recall collapses. Same
    output shape as knn_brute; recall measured in tests against it."""
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    q = _normalize(q)
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, dim, n_planes)).astype(np.float32)
    bits = np.arange(n_planes, dtype=np.uint64)

    # per-table probe sets
    probes: list[list[set[int]]] = []  # [table][query] -> bucket set
    for t_i in range(n_tables):
        qproj = q @ planes[t_i]
        per_q = []
        for qi in range(q.shape[0]):
            base = int(((qproj[qi] > 0).astype(np.uint64) << bits).sum())
            order = np.argsort(np.abs(qproj[qi]))
            ps = {base}
            for flip in order[: max(0, n_probes - 1)]:
                ps.add(base ^ (1 << int(flip)))
            per_q.append(ps)
        probes.append(per_q)
    planes_ref = ray.put(planes)
    q_ref = ray.put(q)
    probes_ref = ray.put(probes)

    def local(t: pa.Table) -> pa.Table:
        pl, qm, prb = ray.get(planes_ref), ray.get(q_ref), ray.get(probes_ref)
        emb = _normalize(_emb_matrix(t, emb_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        buckets = [
            ((emb @ pl[t_i] > 0).astype(np.uint64) << bits[None, :]).sum(axis=1)
            for t_i in range(len(pl))
        ]
        out_q, out_id, out_s = [], [], []
        sims = None
        for qi in range(qm.shape[0]):
            cand = np.zeros(len(ids), dtype=bool)
            for t_i in range(len(pl)):
                cand |= np.isin(
                    buckets[t_i], np.fromiter(prb[t_i][qi], dtype=np.uint64)
                )
            if not cand.any():
                continue
            if sims is None:
                sims = emb @ qm.T
            s = sims[cand, qi]
            cids = ids[cand]
            kk = min(k, len(cids))
            part = np.argpartition(-s, kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(cids[part].tolist())
            out_s.extend(s[part].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    survivors = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if survivors.empty:
        return survivors
    survivors["score"] = survivors["score"].round(6)
    return (
        survivors.sort_values(["query_id", "score", id_col],
                              ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
