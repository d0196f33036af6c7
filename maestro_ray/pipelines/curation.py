"""Incremental CURATED-CORPUS view over the CDC lake — the
training-data refresh loop: as pages churn through the changelog, keep
current (a) each live doc's quality-gate verdict and content hash, and
(b) the curated set = the canonical (smallest-url) live PASSING doc
per distinct content — without re-scoring the corpus.

Split of work (the search-index df precedent):

- The EXPENSIVE axis — tokenizing/scoring/hashing document TEXT — is
  incremental: the per-url (url, chash, n_tokens, pass) derivation
  lives in a ``pipelines/shardstore`` url-sharded store and is
  re-computed only for churned urls, O(churn)/epoch, with the store's
  idempotent drop-then-insert apply and meta-last commit.
- The CHEAP axis — picking winners per content hash — is one
  distributed ``bucketed_agg`` min over the NARROW derived store
  (url + 2 scalars per doc; ~0.1% of corpus bytes at web scale), run
  at read time. Winner maintenance keyed by content hash is
  deliberately NOT incremental state: a winner can flip when any
  same-hash sibling churns, and the full narrow pass is cheaper than
  the bookkeeping (measured shape, same call as search.py's exact df).

The gate is a pure deterministic function of the text pinned by
``meta`` (token-count bounds on the pinned single-space tokenizer), so
the incremental store ≡ full recompute oracle holds bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from maestro_ray.ops.hashing import hash_array
from maestro_ray.pipelines import shardstore as ss

META = "_curation_meta.json"


def _doc_stats(urls, texts, meta: dict) -> pa.Table:
    """(url, chash, n_tokens, pass) for a batch — one split_pattern +
    one deterministic content hash (ops/hashing.hash_array, stored as
    an int64 BIT VIEW), vectorized gate verdict. Null text is scored
    as the empty string (the neardup-index rule — a live row always
    gets a verdict)."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    txt = pc.fill_null(pc.cast(texts, pa.string()), "")
    n_tok = pc.list_value_length(pc.split_pattern(txt, " ")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    chash = hash_array(txt).view(np.int64)
    ok = (n_tok >= meta["min_tokens"]) & (n_tok <= meta["max_tokens"])
    return pa.table({
        "url": pc.cast(urls, pa.string()),
        "chash": pa.array(chash, pa.int64()),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "pass": pa.array(ok),
    })


_SPEC = {
    "encode": _doc_stats,
    "sort_keys": [("url", "ascending")],
    "empty": lambda: pa.table({
        "url": pa.array([], pa.string()),
        "chash": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "pass": pa.array([], pa.bool_()),
    }),
}


def bootstrap_curation(lake_dir: str, index_dir: str,
                       n_shards: int = 8, min_tokens: int = 3,
                       max_tokens: int = 100_000) -> dict:
    """Full derivation pass over the live lake (once); thereafter
    ``update_curation`` is O(churn)."""
    meta = {"n_shards": n_shards, "min_tokens": min_tokens,
            "max_tokens": max_tokens}
    return ss.bootstrap_store(lake_dir, index_dir, meta, _SPEC, META)


def update_curation(lake_dir: str, index_dir: str) -> dict:
    """Advance the derived store to the lake head — re-scores ONLY
    churned urls (one task per touched shard)."""
    return ss.update_store(lake_dir, index_dir, _SPEC, META)


def read_curation_store(index_dir: str) -> pd.DataFrame:
    """Full derived store — test/diagnostic surface."""
    return ss.read_store(index_dir, META, ["url"])


def curated_corpus(index_dir: str) -> rd.Dataset:
    """The curated set as a lazy Dataset (chash, url): the smallest
    live PASSING url per distinct content hash — exact dedup with a
    deterministic canonical winner. One column-pruned read over the
    narrow store shards + one ``bucketed_agg`` min; the corpus text is
    never touched."""
    import json

    with open(os.path.join(index_dir, META)) as f:
        meta = json.load(f)
    from maestro_ray.ops.aggregates import bucketed_agg

    paths = [os.path.join(index_dir, f"s{k:05d}.parquet")
             for k in range(meta["n_shards"])]
    store = rd.read_parquet(paths, columns=["url", "chash", "pass"],
                            override_num_blocks=min(meta["n_shards"], 32))

    def passing(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(t.column("pass"), False)) \
            .select(["chash", "url"])

    return bucketed_agg(
        store.map_batches(passing, batch_format="pyarrow"),
        "chash", [("url", "min", "url")])
