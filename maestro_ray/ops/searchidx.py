"""Persisted INVERTED TEXT INDEX with BM25-scored probes — the lexical
sibling of the ANN bucket index (ops/similarity.build_ann_index).

``ops/corpus.bm25_scores`` is scan-time retrieval: every query streams
the WHOLE corpus. At 100 TB repeated queries need the (term → postings)
shuffle done ONCE and written down so a probe's I/O is proportional to
the query's postings, not the corpus. This builds exactly that:

- *Build*: one streaming pass explodes each batch to (term, doc, tf,
  dl) postings rows (single-space tokenizer — the module contract
  shared with bm25_scores/term_stats, so scores are comparable), routes
  them by ``hash64(term) % n_shards``, and writes each shard as its own
  parquet file SORTED BY TERM (row-group stats then prune within the
  shard too). A tiny mergeable partial pass records (N, Σdl) in
  ``_meta.json``. df is NOT stored — postings are one row per distinct
  (term, doc), so df(t) is a row count at probe time (always
  consistent, never stale).
- *Probe*: hash the query terms, open ONLY their shard files
  (``probe_files`` is the FS-level proof hook), filter to the query
  vocabulary with parquet predicate pushdown, score with the same
  Lucene-idf BM25 fold as ``bm25_scores`` (sorted-term order, 6dp) —
  the two paths agree EXACTLY (pytest pins frame equality).

Probe cost: O(query postings) I/O + a driver-side fold guarded by
``max_postings`` (a stop-word query pulling a corpus-sized postings
list must fail loudly, not OOM the driver — the repo's guard idiom)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.ops.hashing import hash_array

_META = "_meta.json"


def _term_shards(terms: np.ndarray, n_shards: int) -> np.ndarray:
    return (hash_array(pd.Series(terms)) % np.uint64(n_shards)) \
        .astype(np.int64)


def explode_postings(batch: pa.Table, id_col: str, text_col: str,
                     n_shards: int) -> pa.Table:
    """One batch → distinct (term, doc) postings rows with tf and dl,
    routed by ``hash64(term) % n_shards`` (one tokenize + one lexsort
    per batch). Shared by the standalone index build and the lake
    index's segment builds so the two layouts can never drift."""
    tbl = batch.filter(pc.is_valid(batch.column(text_col)))
    if tbl.num_rows == 0:
        return pa.table({
            "shard": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            id_col: pa.array([], batch.schema.field(id_col).type),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
        })
    toks = pc.split_pattern(tbl.column(text_col).combine_chunks(), " ")
    dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = toks.flatten()
    doc_of = np.repeat(np.arange(len(dl)), dl)
    # distinct (term, doc) with counts — one lexsort per batch
    terms = np.asarray(flat.to_pylist())
    order = np.lexsort((doc_of, terms))
    ts, ds_ = terms[order], doc_of[order]
    new = np.r_[True, (ts[1:] != ts[:-1]) | (ds_[1:] != ds_[:-1])]
    starts = np.flatnonzero(new)
    tf = np.diff(np.r_[starts, len(ts)]).astype(np.int64)
    ut, ud = ts[starts], ds_[starts]
    ids = tbl.column(id_col).take(pa.array(ud, pa.int64()))
    return pa.table({
        "shard": pa.array(_term_shards(ut, n_shards), pa.int64()),
        "term": pa.array(ut, pa.string()),
        id_col: ids,
        "tf": pa.array(tf, pa.int64()),
        "dl": pa.array(dl[ud], pa.int64()),
    })


def build_text_index(
    ds: rd.Dataset,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> dict:
    """Build the persisted postings layout under ``index_dir``.
    Returns the meta dict. One corpus pass for postings + one tiny
    partial pass for (N, Σdl); ONE shuffle, keyed by term shard."""
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards}")
    os.makedirs(index_dir, exist_ok=True)

    def postings(batch: pa.Table) -> pa.Table:
        return explode_postings(batch, id_col, text_col, n_shards)

    def write_shard(g: pa.Table) -> pa.Table:
        s = g.column("shard")[0].as_py()
        out = g.drop_columns(["shard"])
        out = out.take(pc.sort_indices(
            out, sort_keys=[("term", "ascending"), (id_col, "ascending")]))
        rel = f"shard-{s:05d}.parquet"
        path = os.path.join(index_dir, rel)
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # idempotent on task retry
        return pa.table({
            "shard": pa.array([s], pa.int64()),
            "file": pa.array([rel], pa.string()),
            "rows": pa.array([out.num_rows], pa.int64()),
        })

    from maestro_ray.ops.partition import push_based_shuffle

    with push_based_shuffle():
        rows = (ds.map_batches(postings, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(write_shard, batch_format="pyarrow")
                .take_all())  # O(n_shards) manifest rows only

    def corpus_partial(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        if tbl.num_rows:
            toks = pc.split_pattern(
                tbl.column(text_col).combine_chunks(), " ")
            sum_dl = int(np.sum(pc.list_value_length(toks)
                                .to_numpy(zero_copy_only=False)))
        else:
            sum_dl = 0
        return pa.table({
            "n_rows": pa.array([batch.num_rows], pa.int64()),
            "n_docs_text": pa.array([tbl.num_rows], pa.int64()),
            "sum_dl": pa.array([sum_dl], pa.int64()),
        })

    agg = ds.map_batches(corpus_partial, batch_format="pyarrow") \
        .to_pandas().sum()
    # a zero-block input (generator sources on empty data) loses its
    # schema in to_pandas — the documented empty-Dataset pitfall; an
    # empty corpus must still build a valid (empty) index
    empty = "n_rows" not in agg
    try:
        t = ds.schema().base_schema.field(id_col).type
        id_kind = "string" if (pa.types.is_string(t)
                               or pa.types.is_large_string(t)) else "int64"
    except Exception:  # zero-block generator source: schema unknowable
        id_kind = "string"
    meta = {
        "n_shards": n_shards,
        "id_col": id_col,
        "id_kind": id_kind,
        "n_docs": 0 if empty else int(agg["n_rows"]),
        "n_docs_text": 0 if empty else int(agg["n_docs_text"]),
        "sum_dl": 0 if empty else int(agg["sum_dl"]),
        "shards": sorted(
            ({"shard": int(r["shard"]), "file": r["file"],
              "rows": int(r["rows"])} for r in rows),
            key=lambda r: r["shard"]),
    }
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(index_dir, _META))
    return meta


def probe_files(index_dir: str, query_terms: list[str]) -> list[str]:
    """Shard files a query must open — the sublinear-I/O proof hook."""
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    qs = set(_term_shards(np.array(sorted(set(query_terms))),
                          meta["n_shards"]).tolist())
    by_shard = {s["shard"]: s["file"] for s in meta["shards"]}
    return [os.path.join(index_dir, by_shard[s])
            for s in sorted(qs) if s in by_shard]


def search_text_index(
    index_dir: str,
    query_terms: list[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    max_postings: int = 5_000_000,
) -> pd.DataFrame:
    """BM25-scored probe: open ONLY the query terms' shard files,
    push the term filter into the parquet read (term-sorted row
    groups), fold per-doc scores exactly like ``bm25_scores`` and
    return the top ``k`` (score desc, id asc) — or every hit when
    ``k`` is None."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    id_col = meta["id_col"]
    qt = sorted(set(query_terms))
    parts = []
    total = 0
    for path in probe_files(index_dir, qt):
        t = pq.read_table(path, filters=[("term", "in", qt)])
        total += t.num_rows
        if total > max_postings:
            raise RuntimeError(
                f"search_text_index: query postings exceed "
                f"max_postings={max_postings} (stop-word-like term?). "
                "Raise the bound or drop the high-df terms — scoring "
                "that list on the driver would not be sublinear.")
        parts.append(t)
    if not parts or total == 0:
        # typed to the INDEX's id kind (a url index's empty probe must
        # still carry an object column — r4 review finding)
        id_dtype = "object" if meta.get("id_kind") == "string" else "int64"
        return pd.DataFrame({id_col: pd.Series(dtype=id_dtype),
                             "bm25": pd.Series(dtype="float64")})
    post = pa.concat_tables(parts)
    if meta["n_docs_text"] == 0:
        raise ValueError("search_text_index: empty index")
    avgdl = meta["sum_dl"] / meta["n_docs_text"]
    out = bm25_fold(post, id_col, meta["n_docs"], avgdl,
                    k1=k1, b=b, round_to=round_to)
    return out if k is None else out.head(k).reset_index(drop=True)


def bm25_fold(post: pa.Table, id_col: str, n_docs: int, avgdl: float,
              k1: float = 1.2, b: float = 0.75,
              round_to: int = 6) -> pd.DataFrame:
    """Score a LIVE postings table (one row per distinct (term, doc):
    term, id, tf, dl) with the pinned Lucene-idf BM25 and the
    deterministic per-doc fold (sorted by (doc, term), reduceat, round
    at ``round_to``) — the same float ops as ``bm25_scores``, so both
    probe paths and the brute scan agree EXACTLY. df per term is the
    posting row count (callers must pass only live, de-superseded
    rows). Returns (id_col, bm25) sorted by (score desc, id asc)."""
    terms = np.asarray(post.column("term").to_pylist())
    ids = post.column(id_col).to_numpy(zero_copy_only=False)
    tf = post.column("tf").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    dl = post.column("dl").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    ut, inv, df_cnt = np.unique(terms, return_inverse=True,
                                return_counts=True)
    df = df_cnt.astype(np.float64)[inv]
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    contrib = idf * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * dl / avgdl))
    key = np.lexsort((terms, ids))
    ids_s = ids[key]
    starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
    sums = np.round(np.add.reduceat(contrib[key], starts), round_to)
    out = pd.DataFrame({id_col: ids_s[starts], "bm25": sums})
    return out.sort_values(["bm25", id_col], ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)
