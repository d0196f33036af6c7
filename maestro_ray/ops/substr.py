"""Exact duplicated-SUBSTRING detection and removal — the
suffix-array-style training-data dedup of Lee et al., *Deduplicating
Training Data Makes Language Models Better* (ACL 2022), re-expressed
Ray-Data-first at CHARACTER level.

Semantics (pinned, matches the SQL twin exactly):

- Every length-``L`` character gram of every document is a corpus
  occurrence; a gram is DUPLICATED when it occurs more than once
  anywhere in the corpus (including twice in the same document).
- Every occurrence of a duplicated gram marks the character interval
  ``[pos, pos+L)``; per document, overlapping/adjacent intervals merge
  into maximal duplicated SPANS. ALL occurrences are marked (the
  simpler, deterministic variant — same convention as
  ``ops/web.boilerplate_chunks``), not all-but-one.
- ``duplicated_span_stats`` reports, per document, the total
  duplicated characters and span count (0/0 for clean/short/null
  docs — one output row per input row, the relation is never empty).
- ``remove_duplicated_spans`` excises the spans from the text.

Scale plan (nothing corpus-sized ever sits on the driver):

1. *Detect* (one pass): each batch computes a 64-bit rolling
   polynomial hash of every gram position — one vectorized
   ``H = H*B + cp[j:]`` fold over the batch's FLAT codepoint buffer
   (L numpy ops per batch, no per-doc loop) — and emits its
   batch-local ``np.unique`` (hash, count) partial. A single
   ``groupby(h).sum`` reduces to global counts; only hashes with
   count > 1 (the duplicated set — small for natural corpora) are
   collected under a loud ``max_dup_grams`` guard and broadcast via
   ``ray.put``.
2. *Mark* (second pass over the same Dataset): each batch recomputes
   its position hashes, probes the broadcast sorted set with one
   ``searchsorted``, and merges hit intervals into spans with a
   vectorized gaps-and-islands fold (``cumsum`` over new-island
   flags + ``bincount`` per doc). Text surgery is a flat boolean
   mask over the batch's codepoint buffer + one re-encode — never a
   per-doc Python loop.

Character-exactness on ANY input (not just ASCII): the UTF-8 string
buffer is decoded ONCE per batch to a flat UTF-32 codepoint array,
and Arrow's byte offsets are remapped to character offsets with one
cumsum over the UTF-8 continuation-byte mask — so positions, lengths
and spans are in characters, matching SQL ``substring``/``length``,
and span boundaries can never split a multi-byte character.

Hashes are compared, not grams: two DIFFERENT grams colliding in the
64-bit rolling hash would falsely mark a span. Collision odds are
~G²/2⁶⁵ for G corpus grams (≈1e-7 at a billion grams) — documented,
not guarded, same stance as the minhash band hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (kept: module family convention)
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_BASE = np.uint64(1099511628211)  # FNV-1a prime, odd — uint64 wraparound


def _codepoints_flat(col: pa.ChunkedArray | pa.Array
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole utf8/large_utf8 column to ONE flat uint32
    codepoint array plus per-row CHARACTER offsets (n+1, int64).
    Nulls count as empty strings (callers track validity separately).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if isinstance(col, pa.ChunkedArray):  # fill_null may re-chunk
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint32), np.zeros(1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], off_dtype)[col.offset: col.offset + n + 1]
    off = off.astype(np.int64)
    data = (np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None
            else np.empty(0, np.uint8))
    seg = data[off[0]: off[-1]]
    if seg.size == 0:
        return np.empty(0, np.uint32), np.zeros(n + 1, np.int64)
    # char offset of each byte boundary = # of char-start bytes before it
    starts = (seg & 0xC0) != 0x80
    cum = np.empty(seg.size + 1, np.int64)
    cum[0] = 0
    np.cumsum(starts, out=cum[1:])
    coffs = cum[off - off[0]]
    cp = np.frombuffer(seg.tobytes().decode("utf-8").encode("utf-32-le"),
                       dtype="<u4").astype(np.uint32, copy=False)
    return cp, coffs


def _gram_hashes(cp: np.ndarray, L: int) -> np.ndarray:
    """Rolling polynomial hash of every length-L window of the flat
    codepoint array (uint64 wraparound) — L vectorized ops total."""
    T = cp.size
    if T < L:
        return np.empty(0, np.uint64)
    m = T - L + 1
    H = np.zeros(m, np.uint64)
    v = cp.astype(np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            H = H * _BASE + v[j: m + j]
    return H


def _valid_positions(coffs: np.ndarray, L: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """(global char positions, doc index) of every gram start that lies
    wholly inside one document — ragged-arange, no Python loop."""
    lens = np.diff(coffs)
    g = np.maximum(lens - L + 1, 0)
    G = int(g.sum())
    if G == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    gc = np.zeros(g.size, np.int64)
    np.cumsum(g[:-1], out=gc[1:])
    within = np.arange(G, dtype=np.int64) - np.repeat(gc, g)
    pos = np.repeat(coffs[:-1], g) + within
    doc = np.repeat(np.arange(g.size, dtype=np.int64), g)
    return pos, doc


def _dup_hash_set(ds: rd.Dataset, text_col: str, L: int,
                  max_dup_grams: int) -> np.ndarray:
    """Global duplicated-gram hash set, sorted — detect pass."""

    def partial(batch: pa.Table) -> pa.Table:
        cp, coffs = _codepoints_flat(batch.column(text_col))
        pos, _ = _valid_positions(coffs, L)
        if pos.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        hv = _gram_hashes(cp, L)[pos].view(np.int64)
        u, c = np.unique(hv, return_counts=True)
        # int64 bit-view: Ray's aggregate re-materializes uint64 keys
        # as Python ints > C long and falls back to pickled objects
        return pa.table({"h": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64), pa.int64())})

    from maestro_ray.ops.aggregates import bucketed_sum

    # bucketed exchange beats Ray's native range-sorted groupby 11x on
    # millions of distinct gram hashes (measured: 18.0 s -> 1.6 s at
    # sf0.1 under push_based_shuffle) -- see bucketed_sum docstring.
    counts = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"), "h", "cnt")

    def only_dups(batch: pa.Table) -> pa.Table:
        cname = [c for c in batch.column_names if c != "h"][0]
        keep = pc.greater(batch.column(cname), pa.scalar(1, pa.int64()))
        return batch.filter(keep).select(["h"])

    from maestro_ray.ops.partition import push_based_shuffle

    dup = counts.map_batches(only_dups, batch_format="pyarrow")
    with push_based_shuffle():
        dup = dup.materialize()
    parts: list[np.ndarray] = []
    total = 0
    for b in dup.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += b.num_rows
        if total > max_dup_grams:
            raise RuntimeError(
                f"duplicated_span_stats: > {max_dup_grams} distinct "
                f"duplicated {L}-grams — the broadcast set no longer "
                "fits a worker heap. Raise max_dup_grams, raise L, or "
                "fall back to doc-level near-dedup "
                "(ops.dedup.dedup_near_minhash)."
            )
        parts.append(b.column("h").to_numpy(zero_copy_only=False))
    if not parts:
        return np.empty(0, np.int64)
    return np.sort(np.concatenate(parts)).astype(np.int64)


def _mark_spans(batch: pa.Table, text_col: str, L: int,
                dup_sorted: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                           np.ndarray, np.ndarray]:
    """Per-batch span extraction against the broadcast duplicated set.

    Returns ``(cp, coffs, span_start, span_end, span_doc)`` — spans in
    GLOBAL char coords of the batch's flat codepoint buffer, sorted by
    (doc, start), already merged (gaps-and-islands)."""
    cp, coffs = _codepoints_flat(batch.column(text_col))
    pos, doc = _valid_positions(coffs, L)
    empty = np.empty(0, np.int64)
    if pos.size == 0 or dup_sorted.size == 0:
        return cp, coffs, empty, empty, empty
    hv = _gram_hashes(cp, L)[pos].view(np.int64)
    idx = np.searchsorted(dup_sorted, hv)
    idx_c = np.minimum(idx, dup_sorted.size - 1)
    hit = dup_sorted[idx_c] == hv
    p, d = pos[hit], doc[hit]
    if p.size == 0:
        return cp, coffs, empty, empty, empty
    nf = np.empty(p.size, bool)
    nf[0] = True
    nf[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + L)
    si = np.flatnonzero(nf)
    s = p[si]
    last = np.empty(si.size, np.int64)
    last[:-1] = si[1:] - 1
    last[-1] = p.size - 1
    e = p[last] + L
    return cp, coffs, s, e, d[si]


def duplicated_span_stats(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    L: int = 20,
    max_dup_grams: int = 5_000_000,
) -> rd.Dataset:
    """Per-document duplicated-span statistics: ``(id_col, dup_chars,
    n_spans)``, one row per input row (0/0 when clean). ``ds`` is read
    twice (detect + mark) — pass a re-readable Dataset (a parquet
    read, not an exhausted generator)."""
    if L < 2:
        raise ValueError(f"duplicated_span_stats: L={L} must be >= 2")
    dup_ref = ray.put(_dup_hash_set(ds, text_col, L, max_dup_grams))

    def stats(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        n = batch.num_rows
        _, _, s, e, sd = _mark_spans(batch, text_col, L, dup)
        dup_chars = np.zeros(n, np.int64)
        n_spans = np.zeros(n, np.int64)
        if s.size:
            np.add.at(dup_chars, sd, e - s)
            np.add.at(n_spans, sd, 1)
        return pa.table({
            id_col: batch.column(id_col),
            "dup_chars": pa.array(dup_chars, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _utf8_lengths(cp: np.ndarray) -> np.ndarray:
    return np.select([cp < 0x80, cp < 0x800, cp < 0x10000],
                     [1, 2, 3], 4).astype(np.int64)


def remove_duplicated_spans(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    L: int = 20,
    max_dup_grams: int = 5_000_000,
) -> rd.Dataset:
    """Excise every duplicated span from ``text_col`` (all other
    columns pass through; null text stays null). The surgery is one
    flat boolean mask + one re-encode per batch — offsets are
    recomputed vectorized, no per-doc string building."""
    if L < 2:
        raise ValueError(f"remove_duplicated_spans: L={L} must be >= 2")
    dup_ref = ray.put(_dup_hash_set(ds, text_col, L, max_dup_grams))

    def clean(batch: pa.Table) -> pa.Table:
        dup = ray.get(dup_ref)
        col = batch.column(text_col)
        null_mask = pc.is_null(col)
        cp, coffs, s, e, _ = _mark_spans(batch, text_col, L, dup)
        n = batch.num_rows
        if s.size == 0:
            return batch  # nothing duplicated in this batch
        T = cp.size
        delta = np.zeros(T + 1, np.int64)
        np.add.at(delta, s, 1)
        np.add.at(delta, e, -1)
        rm = np.cumsum(delta[:-1]) > 0
        kept = cp[~rm]
        rm_cum = np.empty(T + 1, np.int64)
        rm_cum[0] = 0
        np.cumsum(rm, out=rm_cum[1:])
        new_coffs = coffs - rm_cum[coffs]
        data = kept.astype("<u4").tobytes().decode("utf-32-le") \
            .encode("utf-8")
        boffs = np.zeros(kept.size + 1, np.int64)
        if kept.size:
            np.cumsum(_utf8_lengths(kept), out=boffs[1:])
        new_offs = boffs[new_coffs]
        if new_offs[-1] < 2**31:
            arr = pa.Array.from_buffers(
                pa.utf8(), n,
                [None, pa.py_buffer(new_offs.astype(np.int32).tobytes()),
                 pa.py_buffer(data)])
        else:
            arr = pa.Array.from_buffers(
                pa.large_utf8(), n,
                [None, pa.py_buffer(new_offs.tobytes()),
                 pa.py_buffer(data)])
        # restore original nulls (filled as "" for the surgery)
        if col.null_count:
            arr = pc.if_else(null_mask, pa.scalar(None, arr.type), arr)
        i = batch.column_names.index(text_col)
        return batch.set_column(i, text_col, arr)

    return ds.map_batches(clean, batch_format="pyarrow")
