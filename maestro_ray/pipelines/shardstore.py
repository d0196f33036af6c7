"""Shared skeleton for INCREMENTAL url-keyed shard stores over the CDC
lake — the common machinery of the vector index
(pipelines/vectorindex.py) and the near-dup band index
(pipelines/neardup.py), defined once so their durability contract can
never drift:

- layout: ``n_shards`` sorted parquet files keyed by
  ``hash64(url) % n_shards`` (a url's derived rows co-locate) plus a
  meta JSON holding the epoch cursor — ALWAYS written last (the commit
  point, tmp+fsync-free rename).
- bootstrap: one encode pass over the lake's live state.
- update: the NET change feed (cursor → head) routes by shard; one
  task per TOUCHED shard drops every mentioned url's rows and appends
  freshly-encoded rows for the live versions. Drop-then-insert is
  idempotent, so a crash between shard writes and the meta commit is
  repaired by the next run.

A store is described by a small spec dict:
  ``encode(urls, texts, meta) -> pa.Table``  (must include "url"),
  ``sort_keys``                               (shard-file order),
  ``empty()   -> pa.Table``                   (typed empty schema).
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
from maestro_ray.ops.hashing import hash_array


def _meta_path(index_dir: str, meta_name: str) -> str:
    return os.path.join(index_dir, meta_name)


def _shard_path(index_dir: str, k: int) -> str:
    return os.path.join(index_dir, f"s{k:05d}.parquet")


def _shard_of(urls, n_shards: int) -> np.ndarray:
    return (hash_array(urls) % np.uint64(n_shards)).astype(np.int32)


def _write_shard(index_dir: str, k: int, t: pa.Table,
                 sort_keys: list) -> int:
    t = t.sort_by(sort_keys)  # deterministic bytes
    path = _shard_path(index_dir, k)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return t.num_rows


def _commit_meta(index_dir: str, meta_name: str, meta: dict) -> None:
    """THE atomic JSON meta commit (tmp + fsync + rename) — shared by
    every incremental store (vector/near-dup via this module, the SCD2
    view via import) so the durability ritual exists once."""
    tmp = _meta_path(index_dir, meta_name) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _meta_path(index_dir, meta_name))  # commit point


def _invalidate_store(index_dir: str, meta_name: str) -> None:
    """Remove the meta FIRST, then stale shard files — a re-bootstrap
    crash can never leave the OLD meta pointing at a mix of old and new
    shards (the NSW r4 rebuild lesson, and a shrink of n_shards can't
    orphan high-numbered shard files)."""
    meta = _meta_path(index_dir, meta_name)
    if os.path.exists(meta):
        os.remove(meta)
    if os.path.isdir(index_dir):
        for fn in os.listdir(index_dir):
            if fn.endswith(".parquet") or fn.endswith(".tmp"):
                os.remove(os.path.join(index_dir, fn))


def bootstrap_store(lake_dir: str, index_dir: str, meta: dict,
                    spec: dict, meta_name: str) -> dict:
    from maestro_ray.io.lake import read_lake

    os.makedirs(index_dir, exist_ok=True)
    _invalidate_store(index_dir, meta_name)
    n_shards = meta["n_shards"]
    meta = {**meta, "epoch": list_epochs(lake_dir)[-1]}
    encode, sort_keys = spec["encode"], spec["sort_keys"]

    def enc(t: pa.Table) -> pa.Table:
        out = encode(t.column("url"), t.column("text"), meta)
        return out.append_column(
            "shard", pa.array(_shard_of(out.column("url"), n_shards),
                              pa.int32()))

    def write(g: pa.Table) -> pa.Table:
        k = g.column("shard")[0].as_py()
        n = _write_shard(index_dir, k, g.drop_columns(["shard"]),
                         sort_keys)
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([n], pa.int64())})

    # encode fused INTO the read stage (never post-union — the
    # measured fusion rule); an all-tombstone lake reads as None and
    # bootstraps to typed empty shards
    src = read_lake(lake_dir, columns=["url", "text"], transform=enc)
    rows = ([] if src is None else
            src.groupby("shard")
            .map_groups(write, batch_format="pyarrow")
            .take_all())  # O(shards) rows
    written = {int(r["shard"]) for r in rows}
    for k in range(n_shards):  # empty shards still need a typed file
        if k not in written:
            _write_shard(index_dir, k, spec["empty"](), sort_keys)
    _commit_meta(index_dir, meta_name, meta)
    return meta


def update_store(lake_dir: str, index_dir: str, spec: dict,
                 meta_name: str) -> dict:
    from maestro_ray.pipelines.changefeed import table_changes

    with open(_meta_path(index_dir, meta_name)) as f:
        meta = json.load(f)
    head = list_epochs(lake_dir)[-1]
    if head == meta["epoch"]:
        return meta
    n_shards = meta["n_shards"]
    encode, sort_keys = spec["encode"], spec["sort_keys"]
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
        survivors = old.filter(
            pc.invert(pc.is_in(old.column("url"),
                               value_set=mentioned)))
        live = g.filter(pc.is_in(g.column("change_op"),
                                 value_set=pa.array(
                                     ["insert", "update"])))
        fresh = encode(live.column("url"), live.column("text"), meta)
        n = _write_shard(index_dir, k,
                         pa.concat_tables([survivors, fresh]),
                         sort_keys)
        return pa.table({"shard": pa.array([k], pa.int32()),
                         "rows": pa.array([n], pa.int64())})

    (changes.map_batches(route, batch_format="pyarrow")
     .groupby("shard").map_groups(apply_shard, batch_format="pyarrow")
     .take_all())  # O(touched shards) rows
    meta["epoch"] = head
    _commit_meta(index_dir, meta_name, meta)
    return meta


def read_store(index_dir: str, meta_name: str,
               sort_cols: list[str]) -> pd.DataFrame:
    """The full store content — test/diagnostic surface."""
    with open(_meta_path(index_dir, meta_name)) as f:
        meta = json.load(f)
    parts = [pq.read_table(_shard_path(index_dir, k)).to_pandas()
             for k in range(meta["n_shards"])]
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(sort_cols).reset_index(drop=True)
