"""Incremental VECTOR index over the CDC lake — the embedding analog
of the incremental text index (pipelines/search.py): as pages
upsert/delete, a url→embedding store stays current in O(churn) per
epoch, and similarity search runs against the store without touching
the lake.

Embeddings come from the deterministic hashed-n-gram featurizer
(ops/embed.py — the documented model stand-in; swap `embed_batch` for
a learned model and everything else holds). Layout: ``n_shards``
parquet files keyed by ``hash64(url) % n_shards`` — each holds
(url, vec float32-bytes) sorted by url — plus ``_vector_meta.json``
(the commit point, written last).

Maintenance is a NET-CHANGE apply: ``table_changes(cursor → head)``
routes by shard, one task per TOUCHED shard rewrites it (drop every
mentioned url, re-insert the live versions, re-sort); untouched shards
aren't read. The apply is idempotent — re-running the same change set
against a half-updated index converges (drop-then-insert of the same
urls), so a crash between shard writes and the meta write is repaired
by the next run. Search embeds the queries driver-side (tiny),
broadcasts the matrix, and scans shards distributed with a local
top-k combiner.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from maestro_ray.core.manifest import list_epochs
from maestro_ray.ops.embed import embed_batch
from maestro_ray.ops.hashing import hash_array

META = "_vector_meta.json"


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, META)


def _shard_path(index_dir: str, k: int) -> str:
    return os.path.join(index_dir, f"s{k:05d}.parquet")


def _shard_of(urls: pa.ChunkedArray | pa.Array, n_shards: int
              ) -> np.ndarray:
    return (hash_array(urls) % np.uint64(n_shards)).astype(np.int32)


def _encode_rows(urls: pa.Array, texts: pa.Array, dim: int) -> pa.Table:
    vecs = embed_batch(texts, dim=dim)
    return pa.table({
        "url": pc.cast(urls, pa.string()),
        "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
    })


def _write_shard(index_dir: str, k: int, t: pa.Table) -> dict:
    t = t.sort_by("url")  # deterministic bytes
    path = _shard_path(index_dir, k)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return {"rows": t.num_rows, "bytes": os.path.getsize(path)}


def bootstrap_vector_index(
    lake_dir: str, index_dir: str, dim: int = 64, n_shards: int = 8,
) -> dict:
    """One full encode pass over the lake's live state → sharded
    url→vec store. Meta (with the epoch cursor) is written LAST."""
    from maestro_ray.io.lake import read_lake

    os.makedirs(index_dir, exist_ok=True)
    head = list_epochs(lake_dir)[-1]

    def enc(t: pa.Table) -> pa.Table:
        out = _encode_rows(t.column("url"), t.column("text"), dim)
        return out.append_column(
            "shard", pa.array(_shard_of(out.column("url"), n_shards),
                              pa.int32()))

    def write(g: pa.Table) -> pa.Table:
        k = g.column("shard")[0].as_py()
        info = _write_shard(index_dir, k, g.select(["url", "vec"]))
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([info["rows"]], pa.int64())})

    rows = (read_lake(lake_dir, columns=["url", "text"])
            .map_batches(enc, batch_format="pyarrow")
            .groupby("shard").map_groups(write, batch_format="pyarrow")
            .take_all())  # O(shards) rows
    written = {int(r["shard"]) for r in rows}
    for k in range(n_shards):  # empty shards still need a typed file
        if k not in written:
            _write_shard(index_dir, k, pa.table({
                "url": pa.array([], pa.string()),
                "vec": pa.array([], pa.binary())}))
    meta = {"kind": "vector", "dim": dim, "n_shards": n_shards,
            "epoch": head}
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return meta


def update_vector_index(lake_dir: str, index_dir: str) -> dict:
    """Catch the store up to the lake head from the net change feed —
    one rewrite task per TOUCHED shard, O(churn + touched shard
    bytes). Idempotent (module docstring)."""
    from maestro_ray.pipelines.changefeed import table_changes

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    head = list_epochs(lake_dir)[-1]
    if head == meta["epoch"]:
        return meta
    dim, n_shards = meta["dim"], meta["n_shards"]
    changes = table_changes(lake_dir, from_epoch=meta["epoch"],
                            to_epoch=head, payload_columns=("text",))

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard", pa.array(_shard_of(t.column("url"), n_shards),
                              pa.int32()))

    def apply_shard(g: pa.Table) -> pa.Table:
        k = g.column("shard")[0].as_py()
        old = pq.read_table(_shard_path(index_dir, k))
        mentioned = pc.cast(g.column("url"), pa.string())
        keep = pc.invert(pc.is_in(old.column("url"),
                                  value_set=pc.unique(
                                      mentioned.combine_chunks())))
        survivors = old.filter(keep)
        live = g.filter(pc.is_in(g.column("change_op"),
                                 value_set=pa.array(
                                     ["insert", "update"])))
        fresh = _encode_rows(live.column("url").combine_chunks(),
                             live.column("text").combine_chunks(), dim)
        info = _write_shard(index_dir, k,
                            pa.concat_tables([survivors, fresh]))
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([info["rows"]], pa.int64())})

    (changes.map_batches(route, batch_format="pyarrow")
     .groupby("shard").map_groups(apply_shard, batch_format="pyarrow")
     .take_all())  # O(touched shards) rows
    meta["epoch"] = head
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))  # THE commit point
    return meta


def read_vector_index(index_dir: str) -> pd.DataFrame:
    """The full (url, vec bytes) store — test/diagnostic surface."""
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    parts = [pq.read_table(_shard_path(index_dir, k)).to_pandas()
             for k in range(meta["n_shards"])]
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("url").reset_index(drop=True)


def search_vector_index(
    index_dir: str, query_texts: list[str], k: int = 10,
) -> pd.DataFrame:
    """Cosine top-k of the store against featurized query texts:
    queries embed driver-side (tiny) and broadcast; shards scan
    distributed (one matmul per batch + local top-k). Ties break by
    url for determinism."""
    import ray
    import ray.data as rd

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    dim = meta["dim"]
    q = embed_batch(pa.array(query_texts, pa.string()), dim=dim)
    q_ref = ray.put(q.astype(np.float32))
    files = [_shard_path(index_dir, i) for i in range(meta["n_shards"])]

    def scan(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        if t.num_rows == 0:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        vecs = np.frombuffer(
            b"".join(t.column("vec").to_pylist()), dtype=np.float32
        ).reshape(t.num_rows, dim)
        urls = t.column("url").to_numpy(zero_copy_only=False)
        if len(urls) > 1 and not all(
                urls[i] <= urls[i + 1] for i in range(len(urls) - 1)):
            # batch spans several url-sorted shard files: re-sort so
            # the stable top-k below breaks ties url-ascending
            order = np.argsort(urls, kind="stable")
            urls, vecs = urls[order], vecs[order]
        scores = qm @ vecs.T  # (nq, n)
        qs, us, ss = [], [], []
        for qi in range(qm.shape[0]):
            kk = min(k, t.num_rows)
            # stable sort over url-sorted shards = url-asc within ties
            top = np.argsort(-scores[qi], kind="stable")[:kk]
            qs.append(np.full(kk, qi, dtype=np.int64))
            us.append(urls[top])
            ss.append(scores[qi][top].astype(np.float64))
        return pa.table({
            "query_idx": pa.array(np.concatenate(qs), pa.int64()),
            "url": pa.array(np.concatenate(us), pa.string()),
            "score": pa.array(np.concatenate(ss), pa.float64()),
        })

    from maestro_ray.io.changelog import _num_read_blocks

    parts = rd.read_parquet(
        files, override_num_blocks=_num_read_blocks(files)
    ).map_batches(scan, batch_format="pyarrow").to_pandas()
    from maestro_ray.ops.similarity import _topk_frame

    return _topk_frame(parts, k, id_col="url")
