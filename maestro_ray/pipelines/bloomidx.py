"""Bloom file-skipping index over the CDC lake — secondary-column
point lookups without a full scan.

The lake's primary key (url) already routes point reads to one
partition (io/lake.py lookup_urls). Any OTHER column — the canonical
use is exact-content lookup on ``text`` ("is this document already in
the corpus, and where?") — needs a scan of every partition file. This
module keeps one small Bloom filter PER PARTITION FILE as an
``index_dir`` sidecar, so a k-value lookup opens only the files whose
filter may contain a queried value, then verifies with an exact
filter (false positives cost an extra file open, never a wrong row).

Scale/maintenance shape: lake files are IMMUTABLE by design, so a
sidecar is a pure cache — ``maintain_bloom_index`` builds filters only
for head-manifest files that lack one (O(churn) per epoch; Ray tasks
when a session exists, threads otherwise) and GCs sidecars whose
source file is gone (vacuum/expire/purge). No commit protocol is
needed: sidecar contents are deterministic per file, written
tmp+rename, and a missing sidecar only degrades that file to
"always a candidate" (correct, just unpruned).

Sizing: ``bits_per_value=16`` with ``n_hashes=6`` gives a ~0.2%
false-positive rate per file; the sidecar for a 1M-distinct-value file
is ~2 MiB — trivia next to the file it prunes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.io.lake import live_mask, require_readable
from maestro_ray.ops.hashing import _splitmix64, hash_array

META = "meta.json"


def _sidecar(index_dir: str, rel: str) -> str:
    return os.path.join(index_dir, rel.replace(os.sep, "__") + ".npz")


def _hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Double-hashing basis: h1 from the shared vectorized content
    hash, h2 an independent odd step (odd ⇒ full-period mod any power
    of two m)."""
    h1 = hash_array(values)
    h2 = _splitmix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int,
               m: int) -> np.ndarray:
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).ravel()


def _build_one(lake_dir: str, rel: str, index_dir: str, column: str,
               bits_per_value: int, n_hashes: int) -> dict:
    path = os.path.join(lake_dir, rel)
    names = pq.read_schema(path).names
    need = [c for c in (column, "op") if c in names]
    t = pq.read_table(path, columns=need)
    if column in t.column_names:
        t = t.filter(live_mask(t))
        vals = pc.drop_null(t.column(column)).combine_chunks()
        vals = pc.unique(vals)
    else:  # pre-evolution file: column absent everywhere → empty filter
        vals = pa.array([], pa.string())
    n = len(vals)
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n) * bits_per_value))))
    bits = np.zeros(m, dtype=bool)
    if n:
        h1, h2 = _hash_pair(vals)
        bits[_positions(h1, h2, n_hashes, m)] = True
    out = _sidecar(index_dir, rel)
    tmp = out + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, bits=np.packbits(bits),
                            m=np.int64(m), k=np.int64(n_hashes),
                            n_values=np.int64(n))
    os.replace(tmp, out)
    return {"rel": rel, "n_values": n, "m_bits": m}


def maintain_bloom_index(lake_dir: str, index_dir: str, column: str,
                         bits_per_value: int = 16,
                         n_hashes: int = 6) -> dict:
    """Bring the index current with the lake head: build filters for
    head files that lack one, GC sidecars of vanished files. Idempotent
    and crash-safe (tmp+rename; a half-built index just prunes less).
    Returns {built, reused, removed, files}."""
    import ray

    m = latest_manifest(lake_dir)
    if m is None:
        raise ValueError(f"no committed epochs in {lake_dir}")
    require_readable(lake_dir, m, "bloom index")
    os.makedirs(index_dir, exist_ok=True)
    ident = {"column": column, "bits_per_value": bits_per_value,
             "n_hashes": n_hashes, "version": 1}
    meta_path = os.path.join(index_dir, META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != ident:
            raise ValueError(
                f"{index_dir} holds a bloom index of {prev}; this call "
                f"is {ident} — use a fresh directory")
    else:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ident, f)
        os.replace(tmp, meta_path)

    rels = [ent["file"] for _p, ent in sorted(m.partitions.items())
            if ent["rows"] > 0]
    todo = [r for r in rels if not os.path.exists(_sidecar(index_dir, r))]
    if ray.is_initialized() and len(todo) > 1:
        task = ray.remote(num_cpus=1)(_build_one)
        built = ray.get([
            task.remote(lake_dir, r, index_dir, column,
                        bits_per_value, n_hashes) for r in todo])
    else:
        built = [_build_one(lake_dir, r, index_dir, column,
                            bits_per_value, n_hashes) for r in todo]

    # GC: a sidecar whose SOURCE FILE is gone (vacuum/expire/purge) can
    # never serve a lookup again — head-manifest membership alone is
    # not the test, because older retained epochs may still be read
    removed = 0
    for name in os.listdir(index_dir):
        if not name.endswith(".npz"):
            continue
        rel = name[:-len(".npz")].replace("__", os.sep)
        if not os.path.exists(os.path.join(lake_dir, rel)):
            os.remove(os.path.join(index_dir, name))
            removed += 1
    return {"built": len(built), "reused": len(rels) - len(todo),
            "removed": removed, "files": len(rels)}


def bloom_candidates(lake_dir: str, index_dir: str,
                     values: list) -> dict:
    """The pruning decision, exposed for audit: which head-manifest
    files MAY contain any of ``values``. A file without a sidecar is
    conservatively a candidate. Returns {candidates: [rel..],
    pruned: n, files: n}."""
    m = latest_manifest(lake_dir)
    if m is None:
        raise ValueError(f"no committed epochs in {lake_dir}")
    if any(v is None for v in values):
        raise ValueError("bloom lookup values must be non-null")
    rels = [ent["file"] for _p, ent in sorted(m.partitions.items())
            if ent["rows"] > 0]
    if not values:
        return {"candidates": [], "pruned": len(rels), "files": len(rels)}
    h1, h2 = _hash_pair(pa.array(values))
    cands = []
    for rel in rels:
        side = _sidecar(index_dir, rel)
        if not os.path.exists(side):
            cands.append(rel)  # unindexed → must be checked
            continue
        with np.load(side) as z:
            bits, m_bits, k = z["bits"], int(z["m"]), int(z["k"])
        pos = _positions(h1, h2, k, m_bits).reshape(k, len(values))
        hit = np.unpackbits(bits)[pos].all(axis=0)  # all k bits per value
        if hit.any():
            cands.append(rel)
    return {"candidates": cands, "pruned": len(rels) - len(cands),
            "files": len(rels)}


def bloom_lookup(lake_dir: str, index_dir: str, values: list,
                 columns: list[str] | None = None) -> pa.Table:
    """Live rows whose indexed column equals any of ``values``, reading
    ONLY bloom-candidate files; exact verification filter inside each —
    bloom false positives can cost a file open, never a wrong row.
    Result is url-sorted for determinism."""
    from concurrent.futures import ThreadPoolExecutor

    with open(os.path.join(index_dir, META)) as f:
        column = json.load(f)["column"]
    plan = bloom_candidates(lake_dir, index_dir, values)
    want = columns or ["url", column]
    val_arr = pa.array(values)

    def read_one(rel: str) -> pa.Table:
        path = os.path.join(lake_dir, rel)
        names = pq.read_schema(path).names
        need = sorted({*(c for c in want if c in names), column}
                      | ({"op"} if "op" in names else set()))
        t = pq.read_table(path, columns=need)
        t = t.filter(live_mask(t))
        if column not in t.column_names:
            return None
        t = t.filter(pc.is_in(t.column(column), value_set=val_arr))
        for c in want:
            if c not in t.column_names:
                t = t.append_column(c, pa.nulls(t.num_rows, pa.string()))
        return t.select(want)

    parts = []
    if plan["candidates"]:
        with ThreadPoolExecutor(
                max_workers=min(16, len(plan["candidates"]))) as ex:
            parts = [p for p in ex.map(read_one, plan["candidates"])
                     if p is not None and p.num_rows]
    if not parts:
        # typed empty result — the empty-schema class (10+ lifetime)
        return pa.table({c: pa.array([], pa.string()) for c in want})
    t = pa.concat_tables(parts)
    if "url" in t.column_names:
        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    return t
