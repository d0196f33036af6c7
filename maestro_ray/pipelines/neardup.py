"""Incremental NEAR-DUP (MinHash band) index over the CDC lake.

The expensive half of near-dedup is shingling + signatures over the
corpus; the cheap half is the band-bucket groupby. This module keeps
the signature/band table current in O(churn) per epoch — the same
net-change apply as the vector index (pipelines/vectorindex.py): band
rows live in ``n_shards`` parquet files keyed by ``hash64(url) %
n_shards`` (a url's 32 band rows co-locate, so removal touches exactly
its shard), sorted by (url, band_id); per epoch one task per TOUCHED
shard drops every mentioned url's rows and appends freshly-signed rows
for the live versions. The apply is idempotent (drop-then-insert), so
a crash between shard writes and the meta commit is repaired by the
next run. Candidate-pair queries then run over the INDEX — skipping
re-shingling the corpus entirely — as one distributed band groupby.

Sharding by url (not by band) is the maintenance-first tradeoff:
updates stay O(churn), while a candidate query reads all shards once
(it is a full groupby anyway). Signatures are bit-deterministic
(ops/dedup.minhash_batch), which the incremental ≡ rebuild oracle
relies on.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from maestro_ray.ops.dedup import minhash_batch

META = "_neardup_meta.json"


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, META)


def _shard_path(index_dir: str, k: int) -> str:
    return os.path.join(index_dir, f"s{k:05d}.parquet")


def _band_rows(urls, texts, meta: dict) -> pa.Table:
    """(url, band_id, band_hash int64-bit-view) rows for a batch —
    positional ids bridge minhash_batch's int64 id contract to string
    urls; null text signs as '' (a deterministic constant signature)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(urls)
    t = pa.table({
        "__i": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "text": pc.fill_null(pc.cast(texts, pa.string()), ""),
    })
    b = minhash_batch(t, "text", "__i", n_hashes=meta["n_hashes"],
                      shingle_k=meta["shingle_k"],
                      n_bands=meta["n_bands"])
    idx = b.column("doc_id").to_numpy(zero_copy_only=False)
    bh = b.column("band_hash").to_numpy(zero_copy_only=False) \
        .astype(np.uint64).view(np.int64)  # int64 BIT VIEW for storage
    return pa.table({
        "url": pc.cast(urls, pa.string()).take(
            pa.array(idx, pa.int64())),
        "band_id": b.column("band_id"),
        "band_hash": pa.array(bh, pa.int64()),
    })


#: the shardstore spec (pipelines/shardstore.py)
_SPEC = {
    "encode": _band_rows,
    "sort_keys": [("url", "ascending"), ("band_id", "ascending")],
    "empty": lambda: pa.table({"url": pa.array([], pa.string()),
                               "band_id": pa.array([], pa.int32()),
                               "band_hash": pa.array([], pa.int64())}),
}


def bootstrap_neardup_index(
    lake_dir: str, index_dir: str,
    n_hashes: int = 128, n_bands: int = 32, shingle_k: int = 3,
    n_shards: int = 8,
) -> dict:
    """One signing pass over the lake's live state → sharded band
    table. Meta (with the epoch cursor) is written LAST. Plumbing
    shared with every incremental shard store
    (pipelines/shardstore.py)."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.bootstrap_store(
        lake_dir, index_dir,
        {"kind": "neardup", "n_hashes": n_hashes, "n_bands": n_bands,
         "shingle_k": shingle_k, "n_shards": n_shards},
        _SPEC, META)


def update_neardup_index(lake_dir: str, index_dir: str) -> dict:
    """Catch the band table up to the lake head from the net change
    feed — one rewrite task per TOUCHED shard (module docstring;
    pipelines/shardstore.py)."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.update_store(lake_dir, index_dir, _SPEC, META)


def read_neardup_index(index_dir: str) -> pd.DataFrame:
    """The full band table — test/diagnostic surface."""
    from maestro_ray.pipelines import shardstore as ss

    return ss.read_store(index_dir, META, ["url", "band_id"])


def neardup_candidates(index_dir: str, max_bucket: int = 64):
    """Distinct near-dup CANDIDATE url pairs (a < b) of the current
    index state: one distributed groupby over the persisted band rows —
    the corpus is never re-shingled. Degenerate buckets emit a star +
    chain (the capped-emission rule from ops/dedup); exact-Jaccard
    verification composes downstream exactly as in dedup_near."""
    import ray.data as rd

    from maestro_ray.io.changelog import _num_read_blocks
    from maestro_ray.ops.aggregates import bucketed_distinct

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    files = [_shard_path(index_dir, k)
             for k in range(meta["n_shards"])]

    def bucket_pairs(g: pa.Table) -> pa.Table:
        urls = sorted(set(g.column("url").to_pylist()))
        n = len(urls)
        if n < 2:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        if n > max_bucket:
            a = [urls[0]] * (n - 1) + urls[1:-1]
            b = urls[1:] + urls[2:]
        else:
            a, b = [], []
            for i in range(n):
                for j in range(i + 1, n):
                    a.append(urls[i])
                    b.append(urls[j])
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    ds = rd.read_parquet(files,
                         override_num_blocks=_num_read_blocks(files))
    pairs = (ds.groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pyarrow"))
    return bucketed_distinct(pairs, ["a", "b"])
