"""INCREMENTAL full-text search index over the CDC lake — the
Lucene-segment model driven by the lake's change feed (the
cdc_ingest × webtext integration piece, sibling of
pipelines/views.py's incremental aggregates).

A full index rebuild per epoch is O(corpus); this maintains the
inverted index in O(churn):

- *Bootstrap* (``bootstrap_text_index``): one full build of the live
  lake state as ``segment-<epoch>/`` — the ``ops/searchidx`` postings
  layout (term-sharded, via the shared ``explode_postings``) plus a
  ``docs-<shard>.parquet`` forward sidecar (url, dl) sharded by
  ``hash64(url) % n_shards`` so later rounds can look up the OLD
  document length of a deleted url by opening only its shard. One
  tokenize pass, one shuffle — postings and sidecars ride the same
  exchange tagged by kind.
- *Maintain* (``update_text_index``): per round, the net change feed
  over ``(indexed_epoch, to_epoch]`` (``changefeed.table_changes`` —
  one task per changed partition, no corpus rescan) splits into
  upserts → a NEW segment, and deletes/updates → a tombstone round
  file ``_tombstones/round-<epoch>.parquet`` that masks the url in
  every OLDER segment. Corpus stats (N, Σdl) are maintained EXACTLY:
  inserts add the new segment's totals, deletes/updates subtract the
  old dl found via the doc sidecars (a missing lookup is index
  corruption and raises). The meta pointer is written LAST, so a
  crashed round replays idempotently (segment shard writes are
  atomic per file, tombstone rounds are atomic, re-running overwrites
  with identical bytes).
- *Probe* (``search_lake_index``): open (live segments × the query
  terms' shards) postings files only, drop a posting when a tombstone
  round NEWER than its segment names its url (an updated url's fresh
  postings live in a newer segment than every round that killed its
  old versions, so ``max_kill_round > seg_epoch`` is exact under
  re-insertion chains), then score with the shared
  ``ops/searchidx.bm25_fold`` — the result is EXACTLY what a fresh
  full rebuild at the head epoch would return (pinned by
  tests/replay/test_search_index_cdc.py, check_exact).

Segments accumulate with rounds; ``compact_text_index`` is the
Lucene-style force-merge: re-bootstrap at the head epoch and drop the
segment chain (probe cost resets to one segment).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.ops.searchidx import (
    _term_shards,
    bm25_fold,
    explode_postings,
)

_META = "_index_meta.json"
_TOMB = "_tombstones"


def _write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, _META))


def _read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as fh:
        return json.load(fh)


def _url_shards(urls: np.ndarray, n_shards: int) -> np.ndarray:
    # same 64-bit hash family as the postings' term router
    return _term_shards(urls, n_shards)


def _build_segment(ds: rd.Dataset, seg_dir: str, n_shards: int) -> dict:
    """Postings layout + (url, dl) forward sidecars for one segment —
    ONE tokenize pass and ONE shuffle total (r4 review finding: the
    build_text_index + sidecar composition tokenized the corpus three
    times and shuffled twice). Each batch emits postings rows (kind 0,
    routed by term hash) and doc rows (kind 1, routed by url hash)
    into the same exchange; the grouped writer emits both file types
    plus the (rows, Σdl) stats the meta needs.

    Live lake rows must carry non-null text (extract_text is total —
    '' for null html); a null here would silently skew avgdl and later
    make delete lookups miss, so it fails LOUDLY instead."""
    os.makedirs(seg_dir, exist_ok=True)

    def rows(batch: pa.Table) -> pa.Table:
        if batch.column("text").null_count:
            raise ValueError(
                "_build_segment: null text in live lake rows — the "
                "lake index requires total text (extract_text yields "
                "'' for null html); fix the producer")
        post = explode_postings(batch, "url", "text", n_shards)
        if batch.num_rows == 0:
            docs = pa.table({"shard": pa.array([], pa.int64()),
                             "url": pa.array([], pa.string()),
                             "dl": pa.array([], pa.int64())})
        else:
            # doc rows: dl already computed inside explode_postings is
            # per-posting; recover per-doc dl from the batch directly
            # (one extra list_value_length, no second tokenize-and-sort)
            toks = pc.split_pattern(
                batch.column("text").combine_chunks(), " ")
            dl = pc.list_value_length(toks) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            urls = np.asarray(batch.column("url").to_pylist())
            docs = pa.table({
                "shard": pa.array(_url_shards(urls, n_shards),
                                  pa.int64()),
                "url": pa.array(urls, pa.string()),
                "dl": pa.array(dl, pa.int64()),
            })
        post = pa.table({
            "kind": pa.array(np.zeros(post.num_rows, np.int8)),
            "shard": post.column("shard"),
            "term": post.column("term"),
            "url": post.column("url"),
            "tf": post.column("tf"),
            "dl": post.column("dl"),
        })
        docs = pa.table({
            "kind": pa.array(np.ones(docs.num_rows, np.int8)),
            "shard": docs.column("shard"),
            "term": pa.nulls(docs.num_rows, pa.string()),
            "url": docs.column("url"),
            "tf": pa.nulls(docs.num_rows, pa.int64()),
            "dl": docs.column("dl"),
        })
        return pa.concat_tables([post, docs])

    def write_group(g: pa.Table) -> pa.Table:
        kind = g.column("kind")[0].as_py()
        s = g.column("shard")[0].as_py()
        if kind == 0:
            out = g.select(["term", "url", "tf", "dl"])
            out = out.take(pc.sort_indices(
                out, sort_keys=[("term", "ascending"),
                                ("url", "ascending")]))
            name = f"shard-{s:05d}.parquet"
        else:
            out = g.select(["url", "dl"])
            out = out.take(pc.sort_indices(
                out, sort_keys=[("url", "ascending")]))
            name = f"docs-{s:05d}.parquet"
        path = os.path.join(seg_dir, name)
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent on task retry
        n_docs = out.num_rows if kind == 1 else 0
        sum_dl = (int(np.sum(out.column("dl")
                             .to_numpy(zero_copy_only=False)))
                  if kind == 1 else 0)
        return pa.table({
            "kind": pa.array([kind], pa.int8()),
            "shard": pa.array([s], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "sum_dl": pa.array([sum_dl], pa.int64()),
        })

    from maestro_ray.ops.partition import push_based_shuffle

    with push_based_shuffle():
        stats = (ds.map_batches(rows, batch_format="pyarrow")
                 .groupby(["kind", "shard"])
                 .map_groups(write_group, batch_format="pyarrow")
                 .take_all())  # O(2 · n_shards) manifest rows
    return {
        "n_docs": sum(r["n_docs"] for r in stats),
        "sum_dl": sum(r["sum_dl"] for r in stats),
    }


def bootstrap_text_index(index_dir: str, lake_dir: str,
                         n_shards: int = 16) -> dict:
    """Full build of the lake's LIVE state at the newest epoch."""
    from maestro_ray.core.manifest import latest_manifest
    from maestro_ray.io.lake import read_lake

    m = latest_manifest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {lake_dir}")
    os.makedirs(index_dir, exist_ok=True)
    seg_name = f"segment-{m.epoch:012d}"
    seg_meta = _build_segment(
        read_lake(lake_dir, columns=["url", "text"]),
        os.path.join(index_dir, seg_name), n_shards)
    meta = {
        "id_col": "url",
        "n_shards": n_shards,
        "indexed_epoch": m.epoch,
        "n_docs": seg_meta["n_docs"],
        "sum_dl": seg_meta["sum_dl"],
        "segments": [{"name": seg_name, "epoch": m.epoch,
                      "rows": seg_meta["n_docs"]}],
        "tombstone_rounds": [],
    }
    _write_meta(index_dir, meta)
    return meta


def _lookup_old_dl(index_dir: str, meta: dict,
                   urls: list[str]) -> pd.Series:
    """Old document length of each (previously live) url: probe the doc
    sidecars of the NEWEST segment holding the url — that copy is the
    live one by construction (older copies were superseded by the
    tombstone round that accompanied their replacement). Opens only
    the urls' shards per segment. Raises on a miss (index corruption —
    the feed guarantees deleted/updated urls were live)."""
    want = np.array(sorted(set(urls)))
    shards = set(_url_shards(want, meta["n_shards"]).tolist())
    found: dict[str, tuple[int, int]] = {}  # url -> (seg_epoch, dl)
    for seg in meta["segments"]:
        for s in sorted(shards):
            path = os.path.join(index_dir, seg["name"],
                                f"docs-{s:05d}.parquet")
            if not os.path.exists(path):
                continue
            t = pq.read_table(path,
                              filters=[("url", "in", want.tolist())])
            for u, dl in zip(t.column("url").to_pylist(),
                             t.column("dl").to_pylist()):
                cur = found.get(u)
                if cur is None or seg["epoch"] > cur[0]:
                    found[u] = (seg["epoch"], int(dl))
    missing = [u for u in urls if u not in found]
    if missing:
        raise RuntimeError(
            f"update_text_index: {len(missing)} deleted/updated urls "
            f"missing from the doc sidecars (e.g. {missing[0]!r}) — "
            "index is corrupt or behind its meta; re-bootstrap")
    return pd.Series({u: found[u][1] for u in urls})


def update_text_index(index_dir: str, lake_dir: str,
                      to_epoch: int | None = None,
                      max_round_changes: int = 5_000_000) -> dict:
    """One maintenance round: apply the net change feed over
    ``(indexed_epoch, to_epoch]``. Idempotent — re-running a crashed
    round rewrites identical files; the meta pointer moves last."""
    from maestro_ray.core.manifest import latest_manifest

    meta = _read_meta(index_dir)
    head = latest_manifest(lake_dir)
    if head is None:
        raise FileNotFoundError(f"no manifest in {lake_dir}")
    to_epoch = head.epoch if to_epoch is None else to_epoch
    if to_epoch <= meta["indexed_epoch"]:
        return meta  # nothing new
    from maestro_ray.pipelines.changefeed import table_changes

    feed = table_changes(lake_dir, from_epoch=meta["indexed_epoch"],
                         to_epoch=to_epoch, payload_columns=("text",))
    chg = feed.to_pandas()  # O(churn) — guarded below, never O(corpus)
    if len(chg) > max_round_changes:
        raise RuntimeError(
            f"update_text_index: {len(chg)} changed urls in one round "
            f"exceeds max_round_changes={max_round_changes}; "
            "re-bootstrap instead (compact_text_index)")
    ups = chg[chg["change_op"].isin(["insert", "update"])]
    dead = chg[chg["change_op"].isin(["update", "delete"])]

    # stats deltas need the OLD dl of every superseded url
    sum_dl_removed = 0
    if len(dead):
        old_dl = _lookup_old_dl(index_dir, meta, dead["url"].tolist())
        sum_dl_removed = int(old_dl.sum())

    seg_name = f"segment-{to_epoch:012d}"
    seg_meta = None
    if len(ups):
        seg_tbl = pa.table({
            "url": pa.array(ups["url"].tolist(), pa.string()),
            "text": pa.array(ups["text"].tolist(), pa.string()),
        })
        seg_meta = _build_segment(rd.from_arrow(seg_tbl),
                                  os.path.join(index_dir, seg_name),
                                  meta["n_shards"])
    if len(dead):
        tomb_dir = os.path.join(index_dir, _TOMB)
        os.makedirs(tomb_dir, exist_ok=True)
        path = os.path.join(tomb_dir, f"round-{to_epoch:012d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(
            pa.table({"url": pa.array(sorted(dead["url"].tolist()),
                                      pa.string())}), tmp)
        os.replace(tmp, path)

    n_ins = int((chg["change_op"] == "insert").sum())
    n_del = int((chg["change_op"] == "delete").sum())
    meta["n_docs"] += n_ins - n_del
    meta["sum_dl"] += (seg_meta["sum_dl"] if seg_meta else 0) \
        - sum_dl_removed
    if seg_meta:
        meta["segments"].append({"name": seg_name, "epoch": to_epoch,
                                 "rows": seg_meta["n_docs"]})
    if len(dead):
        meta["tombstone_rounds"].append(
            {"epoch": to_epoch, "urls": int(len(dead))})
    meta["indexed_epoch"] = to_epoch
    _write_meta(index_dir, meta)
    return meta


def compact_text_index(index_dir: str, lake_dir: str) -> dict:
    """Force-merge: rebuild one segment at the head epoch, drop the
    chain. Invalidate the meta FIRST (a crash mid-compact must read as
    'needs re-bootstrap', never as a stale mixed layout — the r4 NSW
    rebuild lesson)."""
    meta_path = os.path.join(index_dir, _META)
    n_shards = 16
    if os.path.exists(meta_path):
        n_shards = _read_meta(index_dir).get("n_shards", 16)
        os.remove(meta_path)  # invalidate FIRST
    for name in os.listdir(index_dir):
        p = os.path.join(index_dir, name)
        if name.startswith("segment-") or name == _TOMB:
            shutil.rmtree(p, ignore_errors=True)
    return bootstrap_text_index(index_dir, lake_dir, n_shards=n_shards)


def lake_probe_files(index_dir: str,
                     query_terms: list[str]) -> list[tuple[int, str]]:
    """(segment epoch, shard file) pairs a query must open — the
    sublinear-I/O proof hook: (live segments × the query terms'
    shards), never the whole index."""
    meta = _read_meta(index_dir)
    qt = sorted(set(query_terms))
    qs = sorted(set(_term_shards(np.array(qt),
                                 meta["n_shards"]).tolist()))
    out: list[tuple[int, str]] = []
    for seg in meta["segments"]:
        for s in qs:
            path = os.path.join(index_dir, seg["name"],
                                f"shard-{s:05d}.parquet")
            if os.path.exists(path):
                out.append((seg["epoch"], path))
    return out


def search_lake_index(
    index_dir: str,
    query_terms: list[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    max_postings: int = 5_000_000,
) -> pd.DataFrame:
    """BM25 probe over the segment chain — open only (live segments ×
    query shards), mask tombstoned/superseded postings, shared fold."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    meta = _read_meta(index_dir)
    qt = sorted(set(query_terms))
    parts: list[tuple[int, pa.Table]] = []
    total = 0
    for seg_epoch, path in lake_probe_files(index_dir, qt):
        t = pq.read_table(path, filters=[("term", "in", qt)])
        if t.num_rows == 0:
            continue
        total += t.num_rows
        if total > max_postings:
            raise RuntimeError(
                "search_lake_index: query postings exceed "
                f"max_postings={max_postings}")
        parts.append((seg_epoch, t))
    # tombstone mask, restricted to the PROBED urls (reading whole
    # rounds into a driver dict made every probe O(total deletions
    # ever) — r4 review finding); the url filter pushes into the
    # url-sorted round files, bounded by max_postings above
    hit_urls = sorted({u for _e, t in parts
                       for u in t.column("url").to_pylist()})
    kill: dict[str, int] = {}
    if hit_urls and meta["tombstone_rounds"]:
        tomb_dir = os.path.join(index_dir, _TOMB)
        for r in meta["tombstone_rounds"]:
            t = pq.read_table(
                os.path.join(tomb_dir,
                             f"round-{r['epoch']:012d}.parquet"),
                filters=[("url", "in", hit_urls)])
            for u in t.column("url").to_pylist():
                kill[u] = max(kill.get(u, -1), r["epoch"])
    if kill:
        masked = []
        for seg_epoch, t in parts:
            urls = t.column("url").to_pylist()
            alive = pa.array(
                [kill.get(u, -1) <= seg_epoch for u in urls])
            masked.append((seg_epoch, t.filter(alive)))
        parts = masked
    total = sum(t.num_rows for _e, t in parts)
    parts = [t for _e, t in parts if t.num_rows]
    if not parts or total == 0:
        return pd.DataFrame({"url": pd.Series(dtype=object),
                             "bm25": pd.Series(dtype="float64")})
    post = pa.concat_tables(parts)
    if meta["n_docs"] <= 0:
        return pd.DataFrame({"url": pd.Series(dtype=object),
                             "bm25": pd.Series(dtype="float64")})
    # n_docs == docs-with-text here: _build_segment REJECTS null text
    # loudly, so this denominator cannot silently drift from the
    # full-rebuild reference (sum_dl / n_docs_text)
    avgdl = meta["sum_dl"] / meta["n_docs"]
    out = bm25_fold(post, "url", meta["n_docs"], avgdl,
                    k1=k1, b=b, round_to=round_to)
    return out if k is None else out.head(k).reset_index(drop=True)
