"""Graph-based ANN: sharded Navigable-Small-World index (r3 VERDICT
"what's missing" #4 — the HNSW-class recall/latency point).

Design, Ray-Data-first: a single global proximity graph is a
sequential insert structure — the wrong shape for a cluster — so the
index is S independent NSW graphs over a hash-sharding of the corpus
(the FAISS-shard pattern): build = ONE groupby(shard) with a per-group
graph construction (pure numpy, greedy beam insertion), persisted one
``shard-<s>.npz`` each; search = one task per shard (queries broadcast
via ``ray.put``), beam search per shard graph, then a tiny global
top-k merge. Both sides touch a number of vectors sublinear in the
corpus (asserted in tests via a distance-evaluation counter), which is
the property LSH/IVF cannot give on data without cluster/bucket
structure — NSW's greedy routing adapts per query.

Graph: single-layer NSW (HNSW's layer-0 with random-order long-range
links): node i links to the ``m`` nearest of a beam-``ef_build``
search over the graph built so far, bidirectionally, each node capped
at ``2m`` neighbors (trim keeps the nearest). Cosine metric on
L2-normalized float32 vectors.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from maestro_ray.ops.hashing import hash_array
from maestro_ray.ops.similarity import _emb_matrix, _normalize


def _beam_search(vecs: np.ndarray, nbrs: np.ndarray, q: np.ndarray,
                 ef: int, counter: list | None = None,
                 n_entries: int = 8) -> list[tuple[float, int]]:
    """Best-first beam search over one shard graph from MULTIPLE entry
    points (evenly spaced through the pseudo-random insertion order =
    spread through the space — single-entry greedy NSW measurably gets
    stuck in the entry's cluster; multi-entry restores recall for a
    few extra distance evals). Returns up to ``ef`` (similarity, node)
    pairs, best first. ``counter`` (optional one-element list)
    accumulates distance evaluations — the sublinearity evidence used
    by the tests."""
    n = len(vecs)
    if n == 0:
        return []
    entries = sorted(set(
        int(i) for i in np.linspace(0, n - 1, min(n_entries, n),
                                    dtype=np.int64)))
    ev = np.asarray(entries, dtype=np.int64)
    es = vecs[ev] @ q
    if counter is not None:
        counter[0] += len(ev)
    import heapq

    cand = [(-float(s), int(e)) for s, e in zip(es, ev)]
    heapq.heapify(cand)
    best: list[tuple[float, int]] = [(float(s), int(e))
                                     for s, e in zip(es, ev)]
    visited = set(entries)
    while cand:
        neg, node = heapq.heappop(cand)
        worst = min(best)[0] if len(best) >= ef else -np.inf
        if -neg < worst:
            break
        fresh = [x for x in nbrs[node] if x >= 0 and x not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        fr = np.asarray(fresh, dtype=np.int64)
        s = vecs[fr] @ q
        if counter is not None:
            counter[0] += len(fr)
        worst = min(best)[0] if len(best) >= ef else -np.inf
        for sim, x in zip(s.tolist(), fresh):
            if sim > worst or len(best) < ef:
                heapq.heappush(cand, (-sim, x))
                best.append((sim, x))
                if len(best) > ef:
                    best.remove(min(best))
                    worst = min(best)[0]
    return sorted(best, reverse=True)


def _build_graph(vecs: np.ndarray, m: int, ef_build: int) -> np.ndarray:
    """Greedy NSW construction; returns (n, 2m) int32 neighbor lists,
    -1-padded. Insertion order is array order (callers pass a
    deterministic order)."""
    n = len(vecs)
    m_max = 2 * m
    nbrs = np.full((n, m_max), -1, dtype=np.int32)
    deg = np.zeros(n, dtype=np.int32)

    def link(a: int, b: int) -> None:
        if deg[a] < m_max:
            nbrs[a, deg[a]] = b
            deg[a] += 1
        else:  # trim: keep the m_max nearest of current ∪ {b}
            cur = np.append(nbrs[a], b)
            s = vecs[cur] @ vecs[a]
            keep = cur[np.argsort(-s)[:m_max]]
            nbrs[a] = keep
            deg[a] = m_max

    for i in range(1, n):
        sub_nbrs = nbrs[:i]
        found = _beam_search(vecs[:i], sub_nbrs, vecs[i], ef_build)
        for _sim, j in found[:m]:
            link(i, j)
            link(j, i)
    return nbrs


def build_nsw_index(
    ds: rd.Dataset,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_shards: int = 8,
    m: int = 12,
    ef_build: int = 32,
) -> dict:
    """Build the sharded NSW index under ``index_dir``. One
    groupby(shard) — each group sorts by id (deterministic insertion
    order), builds its graph, writes ``shard-<s>.npz``. Returns
    ``{"n_shards", "n_vectors"}``."""
    os.makedirs(index_dir, exist_ok=True)
    # Rebuild safety: invalidate FIRST (drop meta.json so a crash
    # mid-rebuild can't leave old meta declaring a mixed index valid),
    # then clear stale shard files — an old shard-s.npz whose shard
    # receives no rows this build would otherwise silently serve
    # vectors from the previous corpus.
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)
    for name in os.listdir(index_dir):
        if name.startswith("shard-") and (
                name.endswith(".npz") or ".npz.tmp" in name):
            os.remove(os.path.join(index_dir, name))

    def tag(t: pa.Table) -> pa.Table:
        shard = (hash_array(t.column(id_col))
                 % np.uint64(n_shards)).astype(np.int32)
        return t.append_column("__shard", pa.array(shard))

    def build_one(g: pa.Table) -> pa.Table:
        s = int(g.column("__shard")[0].as_py())
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        # deterministic PSEUDO-RANDOM insertion order (hash of id):
        # NSW's long-range links come from early inserts being spread
        # across the space — id order would correlate with data order
        # (e.g. cluster-appended corpora) and collapse recall
        order = np.argsort(hash_array(g.column(id_col)), kind="stable")
        ids = ids[order]
        vecs = _normalize(_emb_matrix(g, emb_col).astype(np.float32)
                          )[order]
        nbrs = _build_graph(vecs, m, ef_build)
        tmp = os.path.join(index_dir, f"shard-{s}.npz.tmp.{os.getpid()}")
        with open(tmp, "wb") as f:
            np.savez(f, ids=ids, vecs=vecs, nbrs=nbrs)
        os.replace(tmp, os.path.join(index_dir, f"shard-{s}.npz"))
        return pa.table({"shard": pa.array([s], pa.int32()),
                         "n": pa.array([len(ids)], pa.int64())})

    acks = (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__shard")
            .map_groups(build_one, batch_format="pyarrow")
            .to_pandas())
    meta = {"n_shards": n_shards, "m": m,
            "n_vectors": int(acks["n"].sum())}
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


def knn_nsw_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    ef_search: int = 64,
) -> pa.Table:
    """Top-k over the sharded NSW index: one Ray task per shard (the
    query matrix is broadcast once), beam search per query per shard,
    global merge of the S·k partials on the driver (tiny). Returns
    (query_id, vec_id, cosine, n_dist) — ``n_dist`` is the shard-level
    distance-evaluation count, the sublinearity evidence."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(q)
    n_shards = meta["n_shards"]

    def probe(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        out = {"query_id": [], "vec_id": [], "cosine": [], "n_dist": []}
        for s in batch.column("id").to_pylist():
            path = os.path.join(index_dir, f"shard-{s}.npz")
            if not os.path.exists(path):
                continue
            z = np.load(path)
            vecs, ids, nbrs = z["vecs"], z["ids"], z["nbrs"]
            for qi in range(len(qm)):
                counter = [0]
                found = _beam_search(vecs, nbrs, qm[qi],
                                     max(ef_search, k), counter)
                for sim, node in found[:k]:
                    out["query_id"].append(qi)
                    out["vec_id"].append(int(ids[node]))
                    out["cosine"].append(float(sim))
                    out["n_dist"].append(counter[0])
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.int64()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "cosine": pa.array(out["cosine"], pa.float64()),
            "n_dist": pa.array(out["n_dist"], pa.int64()),
        })

    parts = (rd.range(n_shards).repartition(n_shards)
             .map_batches(probe, batch_format="pyarrow", batch_size=1)
             .to_pandas())
    # global top-k per query over the S·k shard partials
    top = (parts.sort_values(["query_id", "cosine", "vec_id"],
                             ascending=[True, False, True])
           .groupby("query_id").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(top, preserve_index=False)
