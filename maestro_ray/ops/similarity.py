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
import pyarrow.compute as pc
import ray
import ray.data as rd


def _emb_matrix(t: pa.Table, emb_col: str,
                dtype=np.float32) -> np.ndarray:
    col = t.column(emb_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(dtype)
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


def cosine_pairs_exact(
    ds: rd.Dataset,
    threshold: float,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 1_000_000,
) -> rd.Dataset:
    """EXACT cosine-similarity self-join: all (a, b) pairs with
    cosine ≥ threshold, a < b — the exact baseline
    ``embedding_near_dup``'s LSH variant is recall-tested against,
    itself SQL-twinnable (DuckDB ``list_cosine_similarity`` self-join).

    Plan: the corpus matrix is broadcast ONCE (``ray.put``); each batch
    computes its block of the similarity matrix with one float64
    matmul and emits only above-threshold pairs. O(n²/batches) work per
    task, nothing driver-side. This is the ≤~10^6-vector exact tier —
    use ``embedding_near_dup`` (bucketed LSH) above it; float64 math on
    both engine and oracle sides, so only a pair lying within one ulp
    of the threshold could diverge (measure-zero for real data)."""
    ds = ds.materialize()  # count() then refs without re-executing
    n = ds.count()
    if n > max_rows:
        raise RuntimeError(
            f"cosine_pairs_exact collects the corpus matrix on the "
            f"driver: {n} rows exceeds max_rows={max_rows}. Use the "
            "bucketed LSH path (embedding_near_dup / lsh_bucket_pairs) "
            "for corpora above the exact tier, or raise max_rows "
            "deliberately."
        )
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return rd.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
        }))
    full = pa.concat_tables(tabs)
    all_ids = full.column(id_col).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(all_ids, kind="stable")
    all_ids = all_ids[order]
    mat = _normalize(_emb_matrix(full, emb_col).astype(np.float64))[order]
    mat_ref = ray.put((all_ids, mat))

    def block_pairs(t: pa.Table) -> pa.Table:
        ids_all, m = ray.get(mat_ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        emb = _normalize(_emb_matrix(t, emb_col).astype(np.float64))
        sims = emb @ m.T  # (batch, n)
        keep = sims >= threshold
        # a < b only: mask the lower triangle against the GLOBAL ids
        keep &= ids[:, None] < ids_all[None, :]
        bi, bj = np.nonzero(keep)
        return pa.table({
            "a": pa.array(ids[bi], pa.int64()),
            "b": pa.array(ids_all[bj], pa.int64()),
        })

    return ds.map_batches(block_pairs, batch_format="pyarrow")


def _probe_sets(
    q: np.ndarray, planes: np.ndarray, n_probes: int
) -> list[list[set[int]]]:
    """Per-table, per-query probe bucket sets: the query's own bucket
    plus the ``n_probes - 1`` nearest single-bit flips (least-confident
    hyperplanes first) — standard multi-probe LSH."""
    n_planes = planes.shape[2]
    bits = np.arange(n_planes, dtype=np.uint64)
    probes: list[list[set[int]]] = []
    for t_i in range(planes.shape[0]):
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
    return probes


def _lsh_planes(
    dim: int, n_planes: int, n_tables: int, seed: int
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, dim, n_planes)).astype(np.float32)


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
    planes = _lsh_planes(dim, n_planes, n_tables, seed)
    bits = np.arange(n_planes, dtype=np.uint64)
    probes = _probe_sets(q, planes, n_probes)
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


# ------------------------------------------------- persisted bucket index


def build_ann_index(
    ds: rd.Dataset,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 23,
) -> dict:
    """Build-once persisted LSH bucket layout (r1 VERDICT #6).

    ``knn_lsh`` is scan-time LSH: every query run still streams ALL
    vectors and recomputes their buckets — it saves matmul, not I/O. At
    100 TB an ANN needs the shuffle-by-bucket done ONCE and written
    down, so probes touch only matching buckets' files. This builds
    exactly that: vectors are exploded to one row per (table, bucket),
    shuffled by bucket, and each bucket is written as its own parquet
    file of (id, normalized float32 vector bytes); a JSON manifest maps
    (table, bucket) -> file + rows + bytes. Probing is
    ``knn_lsh_probe`` — its I/O is the probed buckets only, asserted
    sublinear in tests.
    """
    import json
    import os

    first = ds.take(1)[0][emb_col]
    dim = len(first)
    planes = _lsh_planes(dim, n_planes, n_tables, seed)
    planes_ref = ray.put(planes)
    bits = np.arange(n_planes, dtype=np.uint64)

    def explode(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        emb = _normalize(_emb_matrix(t, emb_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        vec_bytes = [emb[i].tobytes() for i in range(len(ids))]
        tabs, bucks, out_ids, out_vec = [], [], [], []
        for t_i in range(pl.shape[0]):
            b = ((emb @ pl[t_i] > 0).astype(np.uint64) << bits[None, :]).sum(axis=1)
            tabs.extend([t_i] * len(ids))
            bucks.extend(b.astype(np.int64).tolist())
            out_ids.extend(ids.tolist())
            out_vec.extend(vec_bytes)
        return pa.table({
            "table": pa.array(tabs, pa.int32()),
            "bucket": pa.array(bucks, pa.int64()),
            "id": pa.array(out_ids, pa.int64()),
            "vec": pa.array(out_vec, pa.binary()),
        })

    def write_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        t_i = g.column("table")[0].as_py()
        b = g.column("bucket")[0].as_py()
        rel = os.path.join(f"t{t_i}", f"b{b:06d}.parquet")
        path = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        out = g.select(["id", "vec"])
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent on task retry
        return pa.table({
            "table": pa.array([t_i], pa.int32()),
            "bucket": pa.array([b], pa.int64()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })

    rows = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()  # O(buckets) manifest rows only
    )
    manifest = {
        "n_planes": n_planes,
        "n_tables": n_tables,
        "seed": seed,
        "dim": dim,
        "id_col": id_col,
        "buckets": [
            {k: (int(v) if k in ("table", "bucket", "rows", "bytes") else v)
             for k, v in r.items()}
            for r in sorted(rows, key=lambda r: (r["table"], r["bucket"]))
        ],
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def knn_lsh_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probes: int = 9,
    id_col: str = "vec_id",
    with_stats: bool = False,
):
    """Approximate top-k against a persisted ``build_ann_index`` layout.

    Reads ONLY the bucket files any query probes (multi-probe over the
    same plane family the index was built with) — probe I/O is
    sublinear in corpus size, unlike scan-time ``knn_lsh``. Each probed
    file becomes one Ray task computing its local exact-cosine top-k
    for exactly the queries that probed it; the tiny partials merge on
    the driver. ``with_stats=True`` additionally returns
    {files,bytes}_{probed,total} for the sublinearity assertion.
    """
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    q = _normalize(q)
    planes = _lsh_planes(man["dim"], man["n_planes"], man["n_tables"], man["seed"])
    probes = _probe_sets(q, planes, n_probes)
    by_key = {(b["table"], b["bucket"]): b for b in man["buckets"]}
    tasks: dict[str, list[int]] = {}
    bytes_probed = 0
    for t_i in range(man["n_tables"]):
        for qi in range(q.shape[0]):
            for bucket in probes[t_i][qi]:
                b = by_key.get((t_i, bucket))
                if b is None:
                    continue
                lst = tasks.setdefault(b["file"], [])
                if qi not in lst:
                    lst.append(qi)
    files_probed = sorted(tasks)
    bytes_probed = sum(by_key[k_]["bytes"] for k_ in by_key
                       if by_key[k_]["file"] in tasks)
    stats = {
        "files_probed": len(files_probed),
        "files_total": len(man["buckets"]),
        "bytes_probed": bytes_probed,
        "bytes_total": sum(b["bytes"] for b in man["buckets"]),
    }
    out = _probe_files(index_dir, tasks, q, k, id_col)
    return (out, stats) if with_stats else out


def _probe_files(
    index_dir: str,
    tasks: dict[str, list[int]],
    q: np.ndarray,
    k: int,
    id_col: str,
) -> pd.DataFrame:
    """Shared probe executor for the persisted index layouts (LSH
    buckets and IVF centroid partitions share the (id, vec) file
    schema): one Ray task per probed file computes its local exact
    cosine top-k for exactly the queries that probed it, the O(files·k)
    partials merge on the driver."""
    import os

    files_probed = sorted(tasks)
    empty = pd.DataFrame({
        "query_id": pd.Series([], dtype="int64"),
        id_col: pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64"),
    })
    if not files_probed:
        return empty
    q_ref = ray.put(q)
    desc = pa.table({
        "file": pa.array(files_probed, pa.string()),
        "qids": pa.array([tasks[f] for f in files_probed],
                         pa.list_(pa.int64())),
    })

    def probe_file(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        qm = ray.get(q_ref)
        out_q, out_id, out_s = [], [], []
        for row in t.to_pylist():
            tab = pq.read_table(os.path.join(index_dir, row["file"]))
            ids = tab.column("id").to_numpy(zero_copy_only=False)
            vecs = np.stack([
                np.frombuffer(b, dtype=np.float32)
                for b in tab.column("vec").to_pylist()
            ])
            sims = vecs @ qm[row["qids"]].T
            for j, qi in enumerate(row["qids"]):
                kk = min(k, len(ids))
                part = np.argpartition(-sims[:, j], kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[part].tolist())
                out_s.extend(sims[part, j].astype(np.float64).tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            id_col: pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    # from_arrow yields ONE block; repartition so each probed file is
    # its own task (otherwise all probes run serially in one task)
    survivors = (
        rd.from_arrow(desc)
        .repartition(len(files_probed))
        .map_batches(probe_file, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    if survivors.empty:
        return empty
    survivors["score"] = survivors["score"].round(6)
    survivors = survivors.drop_duplicates(subset=["query_id", id_col])
    return (
        survivors.sort_values(["query_id", "score", id_col],
                              ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


# ------------------------------------------------------- IVF centroid index


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int,
            seed: int) -> np.ndarray:
    """Lloyd k-means on unit-normalized vectors (cosine = dot),
    deterministic seed. Runs on the DRIVER over a bounded sample only —
    the classic IVF recipe (train small, assign distributed).

    Seeding is farthest-first traversal (the deterministic k-means++
    variant): first center from the seeded rng, each next center the
    sample point least similar to every chosen one — on separated
    blobs each new center provably lands in an uncovered blob, where
    uniform seeding can drop two centers into one blob and Lloyd never
    recovers (r3 review regression)."""
    rng = np.random.default_rng(seed)
    x = _normalize(np.asarray(sample, dtype=np.float32))
    if len(x) < n_centroids:
        raise ValueError(f"sample of {len(x)} < n_centroids={n_centroids}")
    c = np.empty((n_centroids, x.shape[1]), dtype=np.float32)
    c[0] = x[int(rng.integers(len(x)))]
    best = x @ c[0]  # cos to the nearest chosen center, per point
    for j in range(1, n_centroids):
        c[j] = x[int(np.argmin(best))]  # farthest point (ties: first)
        np.maximum(best, x @ c[j], out=best)
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=n_centroids)
        live = counts > 0
        c[live] = sums[live] / counts[live, None]
        c = _normalize(c)
    return c


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 23,
) -> dict:
    """Build-once persisted IVF (inverted-file) centroid layout — the
    second scale path beside the LSH bucket index (``build_ann_index``).

    Centroids are trained on the driver from a bounded sample
    (first ``sample_size`` vectors — deterministic; at real scale feed
    a ``sample_hash`` fraction instead for spread), broadcast once, and
    every vector is assigned to its nearest centroid in one distributed
    pass (per-batch matmul, no shuffle of the raw floats beyond the one
    groupby that co-locates each centroid's members into its own
    parquet file). Probing (``knn_ivf_probe``) reads only the
    ``n_probes`` nearest centroids' files — I/O sublinear in corpus
    size, same guarantee the LSH index asserts in tests. Unlike LSH the
    vectors are written ONCE (not once per table), so the index is
    ~n_tables× smaller for equal probe quality on clustered data."""
    import json
    import os

    sample = ds.limit(sample_size)
    smat = np.vstack([
        _emb_matrix(b, emb_col)
        for b in sample.iter_batches(batch_size=None, batch_format="pyarrow")
    ])
    cents = _kmeans(smat, n_centroids, iters, seed)
    c_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        emb = _normalize(_emb_matrix(t, emb_col))
        cid = (emb @ c.T).argmax(axis=1).astype(np.int32)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        vec_bytes = [emb[i].tobytes() for i in range(len(ids))]
        return pa.table({
            "centroid": pa.array(cid, pa.int32()),
            "id": pa.array(ids, pa.int64()),
            "vec": pa.array(vec_bytes, pa.binary()),
        })

    def write_centroid(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        cid = g.column("centroid")[0].as_py()
        rel = f"c{cid:05d}.parquet"
        path = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        out = g.select(["id", "vec"])
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent on task retry
        return pa.table({
            "centroid": pa.array([cid], pa.int32()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })

    rows = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("centroid")
        .map_groups(write_centroid, batch_format="pyarrow")
        .take_all()  # O(centroids) manifest rows only
    )
    manifest = {
        "kind": "ivf",
        "n_centroids": n_centroids,
        "dim": int(cents.shape[1]),
        "id_col": id_col,
        "centroids": [[float(v) for v in row] for row in cents],
        "partitions": [
            {k: (int(v) if k in ("centroid", "rows", "bytes") else v)
             for k, v in r.items()}
            for r in sorted(rows, key=lambda r: r["centroid"])
        ],
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def knn_ivf_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probes: int = 4,
    id_col: str = "vec_id",
    with_stats: bool = False,
):
    """Approximate top-k against a persisted ``build_ivf_index`` layout:
    each query probes only its ``n_probes`` nearest centroids' files
    (exact cosine within each — the ``_probe_files`` executor). I/O is
    the probed partitions only; ``with_stats=True`` adds the
    {files,bytes}_{probed,total} counters for the sublinearity assert."""
    import json
    import os

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    cents = np.asarray(man["centroids"], dtype=np.float32)
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    q = _normalize(q)
    n_probes = min(n_probes, len(cents))
    near = np.argpartition(-(q @ cents.T), n_probes - 1, axis=1)[:, :n_probes]
    by_cid = {p["centroid"]: p for p in man["partitions"]}
    tasks: dict[str, list[int]] = {}
    for qi in range(q.shape[0]):
        for cid in near[qi]:
            p = by_cid.get(int(cid))
            if p is None:
                continue  # empty centroid: no file was written
            lst = tasks.setdefault(p["file"], [])
            if qi not in lst:
                lst.append(qi)
    stats = {
        "files_probed": len(tasks),
        "files_total": len(man["partitions"]),
        "bytes_probed": sum(p["bytes"] for p in man["partitions"]
                            if p["file"] in tasks),
        "bytes_total": sum(p["bytes"] for p in man["partitions"]),
    }
    out = _probe_files(index_dir, tasks, q, k, id_col)
    return (out, stats) if with_stats else out


# ------------------------------------------------- distributed clustering


def kmeans_fit(
    ds: rd.Dataset,
    n_clusters: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    sample_size: int = 4096,
    seed: int = 23,
    with_inertia: bool = True,
) -> tuple[rd.Dataset, np.ndarray, float | None]:
    """Distributed Lloyd k-means on unit-normalized vectors (cosine
    assignment) over the FULL table — the clustering stage of
    SemDeDup-style semantic curation. Init = the driver-sample
    ``_kmeans`` (deterministic seed, the IVF recipe), then each
    refinement iteration is one streaming pass: centroids broadcast via
    ``ray.put``, every batch emits k mergeable partial rows
    (per-centroid vector sum + count from one matmul + np.add.at),
    the driver folds O(k × batches) partials — the raw vectors are
    never collected and never shuffled. The (id, embedding) projection
    is materialized ONCE so iterations re-read object-store blocks
    instead of re-parsing parquet.

    Returns (assignment Dataset (id_col, cluster, sim), centroids
    [k × d unit rows], inertia = Σ(1 − cos) over all vectors, or None
    with ``with_inertia=False`` — the assignment Dataset is LAZY, so
    skipping inertia skips a whole pass). Empty clusters keep their
    previous centroid (standard Lloyd rule, matches ``_kmeans``)."""
    from maestro_ray.ops.hashing import hash_array

    proj = ds.select_columns([id_col, emb_col]).materialize()

    # deterministic init sample: the sample_size rows with the SMALLEST
    # (hash(id), id) — a total order on rows, so the selection (and
    # thus the init, and thus every assignment) is independent of block
    # count, arrival order and scheduling. limit() would take whatever
    # blocks came first. Per-batch top-k prefilter keeps the driver at
    # O(sample_size × batches) rows — the standard topk combiner shape.
    def _top_by_hash(t: pa.Table) -> pa.Table:
        h = (t.column("__h").to_numpy(zero_copy_only=False)
             if "__h" in t.column_names else hash_array(t.column(id_col)))
        ids_np = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_np, h))[:sample_size]
        sel = t.take(pa.array(order, pa.int64()))
        if "__h" not in sel.column_names:
            sel = sel.append_column("__h", pa.array(h[order], pa.uint64()))
        return sel

    cands = pa.concat_tables(
        list(proj.map_batches(_top_by_hash, batch_format="pyarrow")
             .iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default")
    stab = _top_by_hash(cands).drop_columns(["__h"])
    cents = _kmeans(_emb_matrix(stab, emb_col), n_clusters, iters=3,
                    seed=seed)

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            x = _normalize(_emb_matrix(t, emb_col))
            a = (x @ c.T).argmax(axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c))
            live = np.flatnonzero(counts)
            return pa.table({
                "cluster": pa.array(live, pa.int32()),
                "vsum": pa.array(list(sums[live]), pa.list_(pa.float32())),
                "n": pa.array(counts[live], pa.int64()),
            })

        parts = proj.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        # deterministic fold order: partial arrival order depends on
        # scheduling, and float addition does not commute bit-exactly
        parts["_k"] = [np.asarray(v, dtype=np.float32).tobytes()
                       for v in parts["vsum"]]
        parts = parts.sort_values(["cluster", "n", "_k"])
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for cid, vs, n, _ in parts.itertuples(index=False):
            sums[cid] += np.asarray(vs, dtype=np.float32)
            counts[cid] += n
        live = counts > 0
        cents[live] = _normalize(sums[live] / counts[live, None])

    c_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = _normalize(_emb_matrix(t, emb_col))
        sims = x @ c.T
        a = sims.argmax(axis=1)
        return pa.table({
            id_col: t.column(id_col),
            "cluster": pa.array(a, pa.int32()),
            "sim": pa.array(sims[np.arange(len(a)), a], pa.float32()),
        })

    assigned = proj.map_batches(assign, batch_format="pyarrow")
    inertia = float(assigned.map_batches(
        lambda t: pa.table({"d": [float(np.sum(
            1.0 - t.column("sim").to_numpy(zero_copy_only=False)))]}),
        batch_format="pyarrow").sum("d")) if with_inertia else None
    return assigned, cents, inertia


def semantic_dedup(
    ds: rd.Dataset,
    n_clusters: int = 16,
    threshold: float = 0.97,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 5,
    seed: int = 23,
    max_cluster: int = 200_000,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal —
    k-means-cluster the embeddings, then WITHIN each cluster greedily
    drop any vector whose cosine to an already-kept vector is
    ``>= threshold`` (scan in ascending ``id_col`` order, so the result
    is deterministic and partition-invariant: the lowest id of a
    duplicate set survives). Cross-cluster near-dups are accepted
    misses — the method's documented recall trade (the clustering
    bounds the O(n²) to per-cluster work).

    Plan: ``kmeans_fit`` trains the centroids (streaming passes, the
    driver holds only k × d floats); cluster tagging is then FUSED into
    the embedding stream (one matmul per batch appending a cluster
    column — no join: Acero can't carry list<float> payloads, and a
    shuffle of the vectors is not needed anyway) → ONE
    ``groupby(cluster)`` co-locates each cluster for the greedy scan.
    The scan is one numpy row-vs-kept matvec per row over a
    PREALLOCATED kept matrix — the O(n_c²) flops are BLAS, only the
    loop counter is Python. Clusters larger than ``max_cluster`` fail
    loudly (re-run with more clusters) instead of silently OOMing a
    worker.

    Returns (id_col, cluster, keep, dup_of) for every vector; dup_of
    is the kept id that shadowed a dropped one (null for kept)."""
    _, cents, _ = kmeans_fit(ds, n_clusters, emb_col=emb_col,
                             id_col=id_col, iters=iters, seed=seed,
                             with_inertia=False)
    c_ref = ray.put(cents)

    def tag(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = _normalize(_emb_matrix(t, emb_col))
        a = (x @ c.T).argmax(axis=1)
        return t.append_column("cluster", pa.array(a, pa.int32()))

    joined = ds.select_columns([id_col, emb_col]).map_batches(
        tag, batch_format="pyarrow")

    def dedup_cluster(g: pa.Table) -> pa.Table:
        if g.num_rows > max_cluster:
            raise ValueError(
                f"semantic_dedup: cluster of {g.num_rows} rows exceeds "
                f"max_cluster={max_cluster}; raise n_clusters")
        s = g.take(pc.sort_indices(g, sort_keys=[(id_col, "ascending")]))
        x = _normalize(_emb_matrix(s, emb_col))
        n = s.num_rows
        keep = np.zeros(n, dtype=bool)
        # bookkeeping by ROW index, not id value: id_col is generic
        # (string urls, negative ints, ...) — the shadowing id is
        # gathered from the Arrow column at the end
        dup_idx = np.full(n, -1, dtype=np.int64)
        kept = np.empty_like(x)  # preallocated: kept rows prefix
        kept_rowidx = np.empty(n, dtype=np.int64)
        nk = 0
        for i in range(n):
            if nk:
                sims = kept[:nk] @ x[i]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    dup_idx[i] = kept_rowidx[j]
                    continue
            keep[i] = True
            kept[nk] = x[i]
            kept_rowidx[nk] = i
            nk += 1
        ids = s.column(id_col).combine_chunks()
        dup_of = pc.if_else(
            pa.array(dup_idx >= 0),
            ids.take(pa.array(np.maximum(dup_idx, 0), pa.int64())),
            pa.nulls(n, ids.type))
        return pa.table({
            id_col: ids,
            "cluster": s.column("cluster"),
            "keep": pa.array(keep),
            "dup_of": dup_of,
        })

    return joined.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow")


def grouped_vector_mean(
    ds: rd.Dataset,
    key_col: str,
    emb_col: str,
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Per-key mean embedding in LONG format (key, dim, avg_val) —
    class centroids, per-language embedding profiles. Mergeable plan:
    each batch groups locally and emits (key, dim, Σ, n) partials —
    O(keys × d) rows per batch, the vectors themselves never shuffle —
    then ONE distributed groupby(key, dim) sums the partials. Long
    output is deliberate: it is exactly SQL-twinnable
    (unnest + generate_series), where a list column would not be.
    Sums are float64 regardless of input width (dim is 1-BASED, the
    SQL convention). Null keys and null embeddings are dropped."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(key_col)),
                             pc.is_valid(t.column(emb_col))))
        if t.num_rows == 0:
            return pa.table({
                key_col: pa.array([], t.schema.field(key_col).type),
                "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        x = _emb_matrix(t, emb_col).astype(np.float64)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        k, d = len(uniq), x.shape[1]
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, inv, x)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            key_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1), k), pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.float64()),
            "n": pa.array(np.repeat(cnt, d), pa.int64()),
        })

    from maestro_ray.ops.aggregates import grouped_agg

    agg = grouped_agg(
        ds.select_columns([key_col, emb_col])
        .map_batches(partial, batch_format="pyarrow"),
        [key_col, "dim"], {"s": ("s", "sum"), "n": ("n", "sum")})
    agg["avg_val"] = agg["s"] / agg["n"]
    if round_to is not None:
        agg["avg_val"] = agg["avg_val"].round(round_to)
    return agg[[key_col, "dim", "avg_val"]].sort_values(
        [key_col, "dim"]).reset_index(drop=True)


# ------------------------------------------------- covariance / PCA

#: moment-partial width bound: d=2048 → 32 MB per block partial
_MAX_MOMENT_DIM = 2048


def _fold_payload_rows(parts: pd.DataFrame) -> np.ndarray:
    """Driver fold of per-block payload vectors in lexicographic order
    (the repo's sorted-fold idiom, cf. kmeans / logreg) so the result
    is independent of block arrival order."""
    rows = np.stack([np.asarray(p, dtype=np.float64)
                     for p in parts["payload"]])
    order = np.lexsort(rows.T[::-1])
    return rows[order].sum(axis=0)


def _moment_partials(
    ds: rd.Dataset, emb_col: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """Shared streaming covariance pass — TWO-PASS for numerical
    stability: pass 1 folds (n, Σx) partials into the mean; pass 2
    folds CENTERED second moments Σ(x−μ)ᵀ(x−μ) against the broadcast
    mean. The textbook one-pass XᵀX/n − μμᵀ cancels catastrophically
    when |μ| ≫ σ (error ~1e-16·|μ|² swamps a 6dp oracle for means
    ≥1e3); the centered form matches DuckDB's stable covar_pop on
    arbitrary offsets. O(d²) floats per BLOCK leave a worker, the
    vectors themselves never move. Returns (n, μ, population cov)."""

    def guard(x: np.ndarray) -> None:
        if x.shape[1] > _MAX_MOMENT_DIM:
            # d² floats per BLOCK partial: 4096 → 134 MB each — the
            # driver fold would then hold blocks × that. Fail loudly
            # (the repo's guard idiom) instead of OOMing silently.
            raise ValueError(
                f"covariance/PCA moment pass: d={x.shape[1]} > "
                f"{_MAX_MOMENT_DIM} — reduce dimensionality first "
                "(e.g. pca_project on a column subset) or sample")

    def mean_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(emb_col)))
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "payload": pa.array([], pa.list_(pa.float64()))})
        # float64 EXTRACTION (not a post-hoc cast): a float32 hop
        # destroys large-offset inputs' low digits before centering
        x = _emb_matrix(t, emb_col, dtype=np.float64)
        guard(x)
        return pa.table({"n": pa.array([x.shape[0]], pa.int64()),
                         "payload": pa.array([x.sum(axis=0).tolist()],
                                             pa.list_(pa.float64()))})

    narrow = ds.select_columns([emb_col])
    parts = narrow.map_batches(mean_partial, batch_format="pyarrow") \
        .to_pandas()
    if parts.empty:
        raise ValueError(f"no non-null {emb_col!r} vectors")
    n = int(parts["n"].sum())
    mu = _fold_payload_rows(parts) / n

    mu_ref = ray.put(mu)

    def centered_partial(t: pa.Table) -> pa.Table:
        m = ray.get(mu_ref)
        t = t.filter(pc.is_valid(t.column(emb_col)))
        if t.num_rows == 0:
            return pa.table({"payload": pa.array([], pa.list_(pa.float64()))})
        x = _emb_matrix(t, emb_col, dtype=np.float64) - m
        return pa.table({"payload": pa.array([(x.T @ x).reshape(-1).tolist()],
                                             pa.list_(pa.float64()))})

    parts2 = narrow.map_batches(centered_partial, batch_format="pyarrow") \
        .to_pandas()
    d = len(mu)
    cov = _fold_payload_rows(parts2).reshape(d, d) / n
    return n, mu, cov


def covariance_matrix(
    ds: rd.Dataset,
    emb_col: str,
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Population covariance matrix of the embedding dimensions in LONG
    format (dim_i, dim_j, cov; 1-based dims, the SQL convention) — the
    stable two-pass centered-moment plan (see _moment_partials).
    Output is d² rows (d is model width, never corpus-sized); at 100 TB
    the corpus streams twice and only O(blocks · d²) floats travel."""
    n, mu, cov = _moment_partials(ds, emb_col)
    d = len(mu)
    i, j = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                       indexing="ij")
    vals = cov.reshape(-1)
    if round_to is not None:
        vals = np.round(vals, round_to)
    return pd.DataFrame({"dim_i": i.reshape(-1), "dim_j": j.reshape(-1),
                         "cov": vals})


def pca_fit(ds: rd.Dataset, emb_col: str, k: int) -> dict:
    """Fit a k-component PCA from the same streaming moment pass:
    eigendecomposition of the d×d covariance happens on the DRIVER
    (d is model width — 64..4096 — never corpus-sized). Component
    signs are canonicalized (largest-|loading| coordinate positive) so
    the fit is deterministic. Returns {components (k,d), mean,
    explained_variance, explained_variance_ratio}."""
    n, mu, cov = _moment_partials(ds, emb_col)
    d = len(mu)
    if not 1 <= k <= d:
        raise ValueError(f"k={k}: need 1..{d}")
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    w, v = w[::-1][:k], v[:, ::-1][:, :k]
    flip = np.sign(v[np.abs(v).argmax(axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    comps = (v * flip).T                # (k, d)
    total = max(np.trace(cov), 1e-300)
    return {"components": comps, "mean": mu, "explained_variance": w,
            "explained_variance_ratio": w / total, "n": n}


def pca_project(
    ds: rd.Dataset,
    emb_col: str,
    model: dict,
    id_col: str,
    out_col: str = "pc",
) -> rd.Dataset:
    """Project every embedding onto the fitted components — a pure
    per-batch matmul against the broadcast (k, d) component matrix;
    output rows are (id, out_col list<double> of length k). Null
    embeddings are dropped."""
    comps_ref = ray.put(model["components"])
    mean_ref = ray.put(model["mean"])

    def project(t: pa.Table) -> pa.Table:
        comps = ray.get(comps_ref)
        mu = ray.get(mean_ref)
        t = t.filter(pc.is_valid(t.column(emb_col)))
        if t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                out_col: pa.array([], pa.list_(pa.float64()))})
        x = _emb_matrix(t, emb_col).astype(np.float64)
        proj = (x - mu) @ comps.T
        return pa.table({
            id_col: t.column(id_col),
            out_col: pa.array(proj.tolist(), pa.list_(pa.float64()))})

    return ds.select_columns([id_col, emb_col]) \
        .map_batches(project, batch_format="pyarrow")


# ------------------------------------------------ product quantization (PQ)

def _invalidate_index_dir(index_dir: str) -> None:
    """Remove a persisted index's manifest FIRST, then its data files —
    no reader can ever pair fresh data with a stale manifest (or vice
    versa) across a rebuild crash."""
    import os

    man = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man):
        os.remove(man)
    if os.path.isdir(index_dir):
        for fn in os.listdir(index_dir):
            if fn.endswith(".parquet") or fn.endswith(".tmp"):
                os.remove(os.path.join(index_dir, fn))




def _kmeans_l2(sample: np.ndarray, k: int, iters: int,
               seed: int) -> np.ndarray:
    """Plain L2 Lloyd with deterministic farthest-first seeding — the
    subspace trainer for PQ (subvectors are NOT unit vectors, so the
    cosine variant above does not apply)."""
    x = np.asarray(sample, dtype=np.float32)
    if len(x) < k:
        raise ValueError(f"sample of {len(x)} < k={k}")
    rng = np.random.default_rng(seed)
    c = np.empty((k, x.shape[1]), dtype=np.float32)
    c[0] = x[int(rng.integers(len(x)))]
    d2 = ((x - c[0]) ** 2).sum(axis=1)
    for j in range(1, k):
        c[j] = x[int(np.argmax(d2))]
        np.minimum(d2, ((x - c[j]) ** 2).sum(axis=1), out=d2)
    for _ in range(iters):
        # assign via the expanded form: argmin ||x-c||² = argmax x·c − ||c||²/2
        assign = (x @ c.T - 0.5 * (c * c).sum(axis=1)).argmax(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=k)
        live = counts > 0
        c[live] = sums[live] / counts[live, None]
    return c


def _pq_encode(emb: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) float32 → (n, m) uint8 codes: per subspace, the nearest
    codebook entry (expanded-form argmin, one matmul per subspace)."""
    m, k, sub = books.shape
    n = emb.shape[0]
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        xj = emb[:, j * sub:(j + 1) * sub]
        cj = books[j]
        codes[:, j] = (xj @ cj.T - 0.5 * (cj * cj).sum(axis=1)) \
            .argmax(axis=1).astype(np.uint8)
    return codes



def _topk_frame(parts, k: int, id_col: str = "id"):
    """Global top-k finalize shared by the ADC probes (and the vector
    index): (score desc, id asc) order, head(k) per query, 1-based
    rank."""
    parts = parts.sort_values(["query_idx", "score", id_col],
                              ascending=[True, False, True])
    out = parts.groupby("query_idx", as_index=False).head(k).copy()
    out["rank"] = out.groupby("query_idx").cumcount() + 1
    return out.reset_index(drop=True)


def build_pq_index(
    ds: rd.Dataset,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 16,
    n_shards: int = 8,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 29,
) -> dict:
    """Build-once persisted PRODUCT-QUANTIZATION index — the
    compressed-scan path beside LSH (bucket-pruned), IVF
    (centroid-pruned) and NSW (graph-walked): vectors are
    unit-normalized, split into ``m`` subvectors, and each subvector
    replaced by the id of its nearest codebook entry (codebooks
    trained driver-side on a bounded sample — the IVF recipe — then
    broadcast for ONE distributed encode pass). The index stores
    ``m`` BYTES per vector instead of ``d`` floats (32× at d=64, m=8):
    at 100 TB of embeddings the scan touches ~3 TB of codes, and
    probes never open the raw vectors at all (ADC — asymmetric
    distance — scores codes against per-query lookup tables).

    Shards are written idempotently (tmp+rename, one file per
    ``id % n_shards``) with byte counters for the compression assert."""
    import json
    import os

    # rebuild safety (the NSW r4 lesson): a rebuild must invalidate the
    # OLD manifest first and clear old shard files — otherwise a crash
    # mid-rebuild (or a concurrent probe) pairs new codes with old
    # codebooks, silently wrong neighbors
    _invalidate_index_dir(index_dir)
    sample = ds.limit(sample_size)
    smat = _normalize(np.vstack([
        _emb_matrix(b, emb_col)
        for b in sample.iter_batches(batch_size=None, batch_format="pyarrow")
    ]))
    d = smat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes}: uint8 codes cap at 256")
    sub = d // m
    books = np.stack([
        _kmeans_l2(smat[:, j * sub:(j + 1) * sub], n_codes, iters,
                   seed + j)
        for j in range(m)
    ])  # (m, n_codes, sub)
    b_ref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        bks = ray.get(b_ref)
        emb = _normalize(_emb_matrix(t, emb_col))
        codes = _pq_encode(emb, bks)
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "shard": pa.array((ids % n_shards).astype(np.int32),
                              pa.int32()),
            "id": pa.array(ids, pa.int64()),
            "code": pa.array([c.tobytes() for c in codes], pa.binary()),
        })

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        sid = g.column("shard")[0].as_py()
        rel = f"s{sid:05d}.parquet"
        path = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        out = g.select(["id", "code"]).sort_by("id")  # deterministic
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return pa.table({
            "shard": pa.array([sid], pa.int32()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })

    rows = (
        ds.map_batches(encode, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()  # O(shards) manifest rows only
    )
    manifest = {
        "kind": "pq",
        "m": m, "n_codes": n_codes, "dim": d, "id_col": id_col,
        "codebooks": books.astype(float).tolist(),
        "partitions": [
            {k: (int(v) if k in ("shard", "rows", "bytes") else v)
             for k, v in r.items()}
            for r in sorted(rows, key=lambda r: r["shard"])
        ],
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def knn_pq_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    with_stats: bool = False,
):
    """ADC top-k against a persisted ``build_pq_index`` layout: each
    query precomputes an (m × n_codes) inner-product table against the
    codebooks, then every shard is scanned DISTRIBUTED with pure
    uint8-gather + sum — the raw vectors are never read. Returns
    (query_idx, id, score, rank) rows, ties broken by id."""
    import json
    import os

    import pandas as pd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    books = np.asarray(man["codebooks"], dtype=np.float32)
    m, n_codes, sub = books.shape
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    q = _normalize(q)
    nq = q.shape[0]
    # tables[qi, j, code] = q_j · c_{j,code}
    tables = np.einsum("qjs,jks->qjk",
                       q.reshape(nq, m, sub), books).astype(np.float32)
    t_ref = ray.put(tables)
    files = [os.path.join(index_dir, p["file"]) for p in man["partitions"]]
    if not files:
        out = pd.DataFrame({"query_idx": [], "id": [], "score": [],
                            "rank": []})
        return (out, {"bytes_codes": 0, "bytes_raw_equiv": 0}) \
            if with_stats else out
    import ray.data as rd_

    def scan(t: pa.Table) -> pa.Table:
        tabs = ray.get(t_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False)
        codes = np.frombuffer(
            b"".join(t.column("code").to_pylist()), dtype=np.uint8
        ).reshape(len(ids), tabs.shape[1])
        if len(ids) and not (ids[1:] >= ids[:-1]).all():
            # a read batch can CONCATENATE several id-sorted shard
            # files; re-establish id order so the stable sort below
            # yields exact (score desc, id asc) tie-breaks
            order = np.argsort(ids, kind="stable")
            ids, codes = ids[order], codes[order]
        qs, os_, ss = [], [], []
        for qi in range(tabs.shape[0]):
            # gather per subspace then sum — O(n·m) byte lookups
            sc = tabs[qi][np.arange(tabs.shape[1]), codes].sum(axis=1)
            kk = min(k, len(ids))
            # STABLE sort + id-sorted shard files = (score desc, id
            # asc) even through code ties — argpartition broke ties by
            # shard layout (r4 s4 review finding)
            top = np.argsort(-sc, kind="stable")[:kk]
            qs.append(np.full(kk, qi, dtype=np.int64))
            os_.append(ids[top].astype(np.int64))
            ss.append(sc[top].astype(np.float64))
        return pa.table({
            "query_idx": pa.array(np.concatenate(qs), pa.int64()),
            "id": pa.array(np.concatenate(os_), pa.int64()),
            "score": pa.array(np.concatenate(ss), pa.float64()),
        })

    from maestro_ray.io.changelog import _num_read_blocks

    parts = rd_.read_parquet(
        files, override_num_blocks=_num_read_blocks(files)
    ).map_batches(scan, batch_format="pyarrow").to_pandas()
    out = _topk_frame(parts, k)
    if with_stats:
        stats = {
            "bytes_codes": sum(p["bytes"] for p in man["partitions"]),
            "bytes_raw_equiv": sum(p["rows"] for p in man["partitions"])
            * man["dim"] * 4,
        }
        return out, stats
    return out


def build_ivfpq_index(
    ds: rd.Dataset,
    index_dir: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    sample_size: int = 4096,
    iters: int = 10,
    seed: int = 31,
) -> dict:
    """IVF-PQ — the production composite of the two scale paths
    (FAISS's IVFPQ shape): coarse k-means centroids PRUNE the scan to
    ``n_probes`` cells, and within each cell vectors are stored as
    ``m`` uint8 codes of their RESIDUAL (x − centroid) — residual
    coding preserves intra-cell structure that whole-vector PQ
    collapses into code ties. Probes therefore read only the probed
    cells' CODE files: sublinear I/O × 32× compression, and the raw
    vectors never exist on disk at all.

    Training (driver, bounded sample — the IVF recipe): centroids via
    cosine k-means, then ONE shared set of per-subspace L2 codebooks
    over the sample residuals. Encode is one distributed pass."""
    import json
    import os

    # rebuild safety (the NSW r4 lesson): a rebuild must invalidate the
    # OLD manifest first and clear old shard files — otherwise a crash
    # mid-rebuild (or a concurrent probe) pairs new codes with old
    # codebooks, silently wrong neighbors
    _invalidate_index_dir(index_dir)
    sample = ds.limit(sample_size)
    smat = _normalize(np.vstack([
        _emb_matrix(b, emb_col)
        for b in sample.iter_batches(batch_size=None, batch_format="pyarrow")
    ]))
    d = smat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n_codes > 256:
        raise ValueError(f"n_codes={n_codes}: uint8 codes cap at 256")
    cents = _kmeans(smat, n_centroids, iters, seed)
    resid = smat - cents[(smat @ cents.T).argmax(axis=1)]
    sub = d // m
    books = np.stack([
        _kmeans_l2(resid[:, j * sub:(j + 1) * sub], n_codes, iters,
                   seed + 1 + j)
        for j in range(m)
    ])
    state = ray.put((cents, books))

    def encode(t: pa.Table) -> pa.Table:
        c, bks = ray.get(state)
        emb = _normalize(_emb_matrix(t, emb_col))
        cid = (emb @ c.T).argmax(axis=1).astype(np.int32)
        codes = _pq_encode(emb - c[cid], bks)
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "centroid": pa.array(cid, pa.int32()),
            "id": pa.array(ids, pa.int64()),
            "code": pa.array([x.tobytes() for x in codes], pa.binary()),
        })

    def write_cell(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        cid = g.column("centroid")[0].as_py()
        rel = f"c{cid:05d}.parquet"
        path = os.path.join(index_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        out = g.select(["id", "code"]).sort_by("id")
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return pa.table({
            "centroid": pa.array([cid], pa.int32()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
            "bytes": pa.array([os.path.getsize(path)], pa.int64()),
        })

    rows = (ds.map_batches(encode, batch_format="pyarrow")
            .groupby("centroid")
            .map_groups(write_cell, batch_format="pyarrow")
            .take_all())
    manifest = {
        "kind": "ivfpq",
        "n_centroids": n_centroids, "m": m, "n_codes": n_codes,
        "dim": d, "id_col": id_col,
        "centroids": cents.astype(float).tolist(),
        "codebooks": books.astype(float).tolist(),
        "partitions": [
            {k: (int(v) if k in ("centroid", "rows", "bytes") else v)
             for k, v in r.items()}
            for r in sorted(rows, key=lambda r: r["centroid"])
        ],
    }
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


def knn_ivfpq_probe(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probes: int = 4,
    with_stats: bool = False,
):
    """ADC top-k against a ``build_ivfpq_index`` layout: per query,
    score(x) ≈ q·centroid + Σ_j T[j, code_j] with ONE shared lookup
    table (codebooks are global, residual-based) — only the probed
    cells' code files are read."""
    import json
    import os

    import pandas as pd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    cents = np.asarray(man["centroids"], dtype=np.float32)
    books = np.asarray(man["codebooks"], dtype=np.float32)
    m, n_codes, sub = books.shape
    q = np.asarray(queries, dtype=np.float32)
    if q.ndim == 1:
        q = q[None, :]
    q = _normalize(q)
    nq = q.shape[0]
    tables = np.einsum("qjs,jks->qjk",
                       q.reshape(nq, m, sub), books).astype(np.float32)
    qc = q @ cents.T  # (nq, n_centroids): the per-cell constant term
    n_probes = min(n_probes, len(cents))
    near = np.argpartition(-qc, n_probes - 1, axis=1)[:, :n_probes]
    by_cid = {p["centroid"]: p for p in man["partitions"]}
    jobs: dict[int, list[int]] = {}
    for qi in range(nq):
        for cid in near[qi]:
            if int(cid) in by_cid:
                jobs.setdefault(int(cid), []).append(qi)
    stats = {
        "files_probed": len(jobs),
        "files_total": len(man["partitions"]),
        "bytes_probed": sum(by_cid[c]["bytes"] for c in jobs),
        "bytes_total": sum(p["bytes"] for p in man["partitions"]),
        "bytes_raw_equiv": sum(p["rows"] for p in man["partitions"])
        * man["dim"] * 4,
    }
    t_ref = ray.put((tables, qc))

    def scan_cell(item: dict) -> pa.Table:
        import pyarrow.parquet as pq

        tabs, qc_ = ray.get(t_ref)
        t = pq.read_table(os.path.join(index_dir, item["file"]))
        ids = t.column("id").to_numpy(zero_copy_only=False)
        codes = np.frombuffer(
            b"".join(t.column("code").to_pylist()), dtype=np.uint8
        ).reshape(len(ids), tabs.shape[1])
        qs, os_, ss = [], [], []
        for qi in item["qis"]:
            sc = tabs[qi][np.arange(tabs.shape[1]), codes].sum(axis=1) \
                + qc_[qi, item["cid"]]
            kk = min(k, len(ids))
            top = np.argsort(-sc, kind="stable")[:kk]  # id-asc ties
            qs.append(np.full(kk, qi, dtype=np.int64))
            os_.append(ids[top].astype(np.int64))
            ss.append(sc[top].astype(np.float64))
        return pa.table({
            "query_idx": pa.array(np.concatenate(qs), pa.int64()),
            "id": pa.array(np.concatenate(os_), pa.int64()),
            "score": pa.array(np.concatenate(ss), pa.float64()),
        })

    import ray.data as rd_

    items = [{"cid": c, "file": by_cid[c]["file"], "qis": qis}
             for c, qis in sorted(jobs.items())]
    if not items:
        out = pd.DataFrame({"query_idx": [], "id": [], "score": [],
                            "rank": []})
        return (out, stats) if with_stats else out
    parts = rd_.from_items(items).map_batches(
        lambda b: pa.concat_tables(
            [scan_cell(dict(zip(b.column_names,
                                [c[i].as_py() for c in b.columns])))
             for i in range(b.num_rows)]),
        batch_size=1, batch_format="pyarrow").to_pandas()
    out = _topk_frame(parts, k)
    return (out, stats) if with_stats else out
