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

from maestro_ray.ops.embed import embed_batch

META = "_vector_meta.json"


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, META)


def _shard_path(index_dir: str, k: int) -> str:
    return os.path.join(index_dir, f"s{k:05d}.parquet")


def _encode_rows(urls: pa.Array, texts: pa.Array, dim: int) -> pa.Table:
    vecs = embed_batch(texts, dim=dim)
    return pa.table({
        "url": pc.cast(urls, pa.string()),
        "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
    })


#: the shardstore spec: encode must take (urls, texts, meta)
_SPEC = {
    "encode": lambda urls, texts, meta: _encode_rows(
        urls if not isinstance(urls, pa.ChunkedArray)
        else urls.combine_chunks(),
        texts if not isinstance(texts, pa.ChunkedArray)
        else texts.combine_chunks(),
        meta["dim"]),
    "sort_keys": [("url", "ascending")],
    "empty": lambda: pa.table({"url": pa.array([], pa.string()),
                               "vec": pa.array([], pa.binary())}),
}


def bootstrap_vector_index(
    lake_dir: str, index_dir: str, dim: int = 64, n_shards: int = 8,
) -> dict:
    """One full encode pass over the lake's live state → sharded
    url→vec store. Meta (with the epoch cursor) is written LAST.
    Plumbing shared with every incremental shard store
    (pipelines/shardstore.py)."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.bootstrap_store(
        lake_dir, index_dir,
        {"kind": "vector", "dim": dim, "n_shards": n_shards},
        _SPEC, META)


def update_vector_index(lake_dir: str, index_dir: str) -> dict:
    """Catch the store up to the lake head from the net change feed —
    one rewrite task per TOUCHED shard, O(churn + touched shard
    bytes). Idempotent (module docstring; pipelines/shardstore.py)."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.update_store(lake_dir, index_dir, _SPEC, META)


def read_vector_index(index_dir: str) -> pd.DataFrame:
    """The full (url, vec bytes) store — test/diagnostic surface."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.read_store(index_dir, META, ["url"])


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
