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
import pyarrow.parquet as pq

from maestro_ray.core.manifest import list_epochs
from maestro_ray.ops.dedup import minhash_batch
from maestro_ray.ops.hashing import hash_array

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


def _write_shard(index_dir: str, k: int, t: pa.Table) -> int:
    t = t.sort_by([("url", "ascending"), ("band_id", "ascending")])
    path = _shard_path(index_dir, k)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return t.num_rows


def _shard_of(urls, n_shards: int) -> np.ndarray:
    return (hash_array(urls) % np.uint64(n_shards)).astype(np.int32)


def bootstrap_neardup_index(
    lake_dir: str, index_dir: str,
    n_hashes: int = 128, n_bands: int = 32, shingle_k: int = 3,
    n_shards: int = 8,
) -> dict:
    """One signing pass over the lake's live state → sharded band
    table. Meta (with the epoch cursor) is written LAST."""
    from maestro_ray.io.lake import read_lake

    os.makedirs(index_dir, exist_ok=True)
    head = list_epochs(lake_dir)[-1]
    meta = {"kind": "neardup", "n_hashes": n_hashes, "n_bands": n_bands,
            "shingle_k": shingle_k, "n_shards": n_shards, "epoch": head}

    def sign(t: pa.Table) -> pa.Table:
        out = _band_rows(t.column("url"), t.column("text"), meta)
        return out.append_column(
            "shard", pa.array(_shard_of(out.column("url"), n_shards),
                              pa.int32()))

    def write(g: pa.Table) -> pa.Table:
        k = g.column("shard")[0].as_py()
        n = _write_shard(index_dir, k,
                         g.select(["url", "band_id", "band_hash"]))
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([n], pa.int64())})

    rows = (read_lake(lake_dir, columns=["url", "text"])
            .map_batches(sign, batch_format="pyarrow")
            .groupby("shard").map_groups(write, batch_format="pyarrow")
            .take_all())
    written = {int(r["shard"]) for r in rows}
    for k in range(n_shards):
        if k not in written:
            _write_shard(index_dir, k, pa.table({
                "url": pa.array([], pa.string()),
                "band_id": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64())}))
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))
    return meta


def update_neardup_index(lake_dir: str, index_dir: str) -> dict:
    """Catch the band table up to the lake head from the net change
    feed — one rewrite task per TOUCHED shard (module docstring)."""
    from maestro_ray.pipelines.changefeed import table_changes

    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    head = list_epochs(lake_dir)[-1]
    if head == meta["epoch"]:
        return meta
    n_shards = meta["n_shards"]
    changes = table_changes(lake_dir, from_epoch=meta["epoch"],
                            to_epoch=head, payload_columns=("text",))

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard", pa.array(_shard_of(t.column("url"), n_shards),
                              pa.int32()))

    def apply_shard(g: pa.Table) -> pa.Table:
        k = g.column("shard")[0].as_py()
        old = pq.read_table(_shard_path(index_dir, k))
        mentioned = pc.unique(
            pc.cast(g.column("url"), pa.string()).combine_chunks())
        keep = pc.invert(pc.is_in(old.column("url"),
                                  value_set=mentioned))
        survivors = old.filter(keep)
        live = g.filter(pc.is_in(g.column("change_op"),
                                 value_set=pa.array(
                                     ["insert", "update"])))
        fresh = _band_rows(live.column("url"), live.column("text"),
                           meta)
        n = _write_shard(index_dir, k,
                         pa.concat_tables([survivors, fresh]))
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([n], pa.int64())})

    (changes.map_batches(route, batch_format="pyarrow")
     .groupby("shard").map_groups(apply_shard, batch_format="pyarrow")
     .take_all())
    meta["epoch"] = head
    tmp = _meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(index_dir))  # THE commit point
    return meta


def read_neardup_index(index_dir: str) -> pd.DataFrame:
    """The full band table — test/diagnostic surface."""
    with open(_meta_path(index_dir)) as f:
        meta = json.load(f)
    parts = [pq.read_table(_shard_path(index_dir, k)).to_pandas()
             for k in range(meta["n_shards"])]
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["url", "band_id"]).reset_index(drop=True)


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
