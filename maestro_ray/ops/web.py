"""Webtext curation operators — the CCNet/RefinedWeb-style stages a
Common-Crawl-scale training-data pipeline runs between raw extraction
and tokenization: URL structure parsing, PII redaction, within-document
repetition/diversity signals (the Gopher quality rules' core), and
corpus-wide chunk-level dedup with document reassembly (the "remove
every repeated paragraph, keep the first occurrence" pass).

Design rules shared with ops/corpus.py: the tokenizer is a SINGLE SPACE
split (exact ``string_split(text, ' ')`` twin), every regex is RE2-safe
so pyarrow's C++ kernels, Python ``re`` and DuckDB agree byte-for-byte
(verified in tests), and every stage is a streaming ``map_batches``
plan — the only shuffles are the one ``groupby(chunk_text)`` winner
pass plus the per-doc reassembly groupby in ``dedup_chunks_global``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# --------------------------------------------------------------- URL parse

#: One pass over the URL: scheme, full host, path (query dropped).
#: RE2 named groups — the same pattern (positional) is the SQL twin.
_URL_RE = r"^(?P<scheme>[a-z][a-z0-9+.-]*)://(?P<host>[^/?#]+)(?P<path>/[^?#]*)?"
#: Registrable domain = the last two dot-labels of the host. An
#: anchored RE2 on host avoids list gymnastics and twins directly as
#: ``regexp_extract(host, '([^.]+\.[^.]+)$', 1)``.
_DOMAIN_RE = r"(?P<domain>[^.]+\.[^.]+)$"


def parse_urls(ds: rd.Dataset, url_col: str = "url") -> rd.Dataset:
    """Add ``scheme / host / domain / path`` columns parsed from
    ``url_col`` — one vectorized RE2 ``extract_regex`` per batch (the
    identical regex engine DuckDB embeds, so the SQL twin is exact).
    Unparseable or null URLs yield null fields (quarantine-not-crash,
    same policy as the multimodal decoders). No shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        ex = pc.extract_regex(urls, _URL_RE)
        scheme = pc.struct_field(ex, "scheme")
        host = pc.struct_field(ex, "host")
        # path group is optional -> "" when absent; normalize to "/"
        path = pc.struct_field(ex, "path")
        path = pc.if_else(
            pc.and_(pc.is_valid(path), pc.equal(path, "")),
            pa.scalar("/", pa.string()), path)
        path = pc.if_else(pc.is_valid(host),
                          pc.fill_null(path, "/"), path)
        dom = pc.struct_field(pc.extract_regex(host, _DOMAIN_RE), "domain")
        return (batch.append_column("scheme", scheme)
                     .append_column("host", host)
                     .append_column("domain", dom)
                     .append_column("path", path))

    return ds.map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------ PII redaction

#: Applied IN ORDER — counts are taken on each intermediate string, so
#: digits inside an email can never double-count as a phone number.
#: All three are RE2-safe AND Python-re-identical (no backrefs, no
#: lookaround); parity is pinned by tests/unit/test_web_ops.py.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


class PiiRedact:
    """Actor-pool stage: sequentially redact email → IPv4 → phone from
    ``text_col`` (adding ``text_redacted``) and count total hits
    (``pii_count``). Patterns are fixed module constants; the per-batch
    work is pyarrow's C++ ``replace_substring_regex`` /
    ``count_substring_regex`` — no Python-level string handling."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cur = batch.column(self.text_col)
        n = pa.nulls(batch.num_rows, pa.int64())
        total = pc.if_else(pc.is_valid(cur), pa.scalar(0, pa.int64()), n)
        for pat, rep in PII_PATTERNS:
            total = pc.add(total, pc.count_substring_regex(cur, pattern=pat))
            cur = pc.replace_substring_regex(cur, pattern=pat,
                                             replacement=rep)
        return (batch.append_column("text_redacted", cur)
                     .append_column("pii_count", total))


def pii_redact(ds: rd.Dataset, text_col: str = "text",
               concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(PiiRedact(text_col), batch_format="pyarrow",
                          concurrency=concurrency)


# ------------------------------------------------- repetition / diversity


def repetition_stats(ds: rd.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """Per-document Gopher-rule repetition signals: ``n_words``,
    ``distinct_frac`` (distinct words / words), ``top_word_frac``
    (most-frequent-word share) and ``top_bigram_frac``
    (most-frequent-adjacent-2-gram share; null when the doc has < 2
    words). Null text yields no row (aggregate-over-tokens semantics,
    same as term_stats).

    Fully batch-vectorized: ONE ``split_pattern`` per batch, words
    exploded with their parent doc index, all four stats computed by
    two pandas hash-groupbys over the exploded frame — no per-document
    Python loop, no shuffle (each doc lives inside one batch). Every
    output fraction is a ratio of two exact ints computed identically
    by the SQL twin, so floats compare EXACTLY (IEEE division is
    deterministic)."""

    def f(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        out_ids = tbl.column(id_col)
        empty = pa.table({
            id_col: pa.array([], batch.schema.field(id_col).type),
            "n_words": pa.array([], pa.int64()),
            "distinct_frac": pa.array([], pa.float64()),
            "top_word_frac": pa.array([], pa.float64()),
            "top_bigram_frac": pa.array([], pa.float64()),
        })
        if tbl.num_rows == 0:
            return empty
        texts = tbl.column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = (texts.chunk(0) if texts.num_chunks else
                     pa.array([], pa.string()))
        toks = pc.split_pattern(texts, " ")
        offs = toks.offsets.to_numpy()
        n_tok = np.diff(offs).astype(np.int64)          # ≥1 per doc
        doc_idx = np.repeat(np.arange(len(n_tok)), n_tok)
        words = toks.values.to_pandas()                  # flat token col
        df = pd.DataFrame({"d": doc_idx, "w": words.values})
        per = df.groupby(["d", "w"], sort=False).size()
        by_doc = per.groupby(level=0)
        distinct = by_doc.size().reindex(range(len(n_tok))).to_numpy()
        top_w = by_doc.max().reindex(range(len(n_tok))).to_numpy()
        # adjacent bigrams: positions whose successor is in the same doc
        pos = np.arange(len(doc_idx))
        keep = np.zeros(len(doc_idx), dtype=bool)
        if len(doc_idx) > 1:
            keep[:-1] = doc_idx[:-1] == doc_idx[1:]
        first = pos[keep]
        n_big = n_tok - 1                                # may be 0
        top_b = np.zeros(len(n_tok), dtype=np.float64)
        if first.size:
            bg = pd.DataFrame({
                "d": doc_idx[first],
                "w1": words.values[first],
                "w2": words.values[first + 1],
            })
            bper = bg.groupby(["d", "w1", "w2"], sort=False).size()
            bmax = bper.groupby(level=0).max()
            top_b[bmax.index.to_numpy()] = bmax.to_numpy()
        n_tf = n_tok.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            top_bigram = np.where(n_big > 0, top_b / n_big, np.nan)
        return pa.table({
            id_col: out_ids,
            "n_words": pa.array(n_tok, pa.int64()),
            "distinct_frac": pa.array(distinct / n_tf, pa.float64()),
            "top_word_frac": pa.array(top_w / n_tf, pa.float64()),
            "top_bigram_frac": pa.array(top_bigram, pa.float64(),
                                        from_pandas=True),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# ----------------------------------------------- corpus-wide chunk dedup



def _reassemble_docs(survivors, id_col: str, out_name: str):
    """Rebuild documents from surviving chunks — ONE vectorized pass
    per HASH BUCKET of docs instead of one Python map_groups call per
    document: sort the bucket by (doc, chunk_id), detect doc runs,
    build a single ListArray over the run offsets, and one
    ``binary_join`` emits every doc's text at once."""
    import numpy as np

    from maestro_ray.ops.hashing import hash_array

    def route(t: pa.Table) -> pa.Table:
        b = (hash_array(t.column(id_col)) % np.uint64(32)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    def rebuild(g: pa.Table) -> pa.Table:
        s = g.take(pc.sort_indices(
            g, sort_keys=[(id_col, "ascending"),
                          ("chunk_id", "ascending")]))
        ids = s.column(id_col).to_numpy(zero_copy_only=False)
        txt = s.column("chunk_text").combine_chunks()
        if isinstance(txt, pa.ChunkedArray):
            txt = (txt.chunk(0) if txt.num_chunks
                   else pa.array([], pa.string()))
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]]) \
            if len(ids) else np.empty(0, np.int64)
        offs = np.r_[starts, len(ids)].astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), txt)
        return pa.table({
            id_col: s.column(id_col).take(pa.array(starts, pa.int64())),
            out_name: pc.binary_join(lst, " "),
            "n_chunks_kept": pa.array(np.diff(offs).astype(np.int64),
                                      pa.int64()),
        })

    return (survivors.map_batches(route, batch_format="pyarrow")
            .groupby("__b").map_groups(rebuild, batch_format="pyarrow"))


def dedup_chunks_global(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
    num_buckets: int = 16,
) -> rd.Dataset:
    """Corpus-WIDE repeated-passage removal (the RefinedWeb/CCNet
    line-dedup pass, expressed over token chunks since the synthetic
    corpus has no newlines): split every doc into non-overlapping
    ``chunk_tokens`` windows (ops/corpus.py chunk_documents — exact,
    streaming), keep each distinct chunk text's FIRST occurrence
    (lexicographic min of (doc_id, chunk_id) — within-doc repeats are
    removed too), then reassemble each doc from its surviving chunks in
    order. Docs whose every chunk was seen earlier disappear entirely.

    Output: (id_col, text_dedup, n_chunks_kept).

    Plan + scale shape: chunking is a flat map; the winner per chunk
    text is ONE ``groupby(chunk_text).min(packed_pos)`` (partial
    per-block combining happens in Ray's aggregate push-down); survivors
    are selected by the bucketed ``hash_join`` back onto the chunks (the
    corpus never transits the driver); reassembly is one
    ``groupby(doc).map_groups`` local sort + ``binary_join``. At 100 TB
    swap the string group key for its 128-bit content hash to shrink
    shuffle bytes — exact text is kept here so the DuckDB twin is
    hash-collision-free by construction. Packing requires
    doc_id < 2^31 and chunk_id < 2^32 — asserted loudly (ADVICE r2
    pattern)."""
    from maestro_ray.ops.corpus import chunk_documents
    from maestro_ray.ops.joins import hash_join

    chunks = chunk_documents(ds, id_col, text_col, chunk_tokens,
                             overlap_tokens=0)

    def pack(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cid = t.column("chunk_id").to_numpy(zero_copy_only=False)
        if len(ids) and (ids.min() < 0 or ids.max() >= 2**31):
            raise ValueError("dedup_chunks_global: doc ids must fit "
                             "uint31 for position packing")
        packed = ids.astype(np.int64) * np.int64(2**32) + cid
        return t.append_column("packed", pa.array(packed, pa.int64()))

    from maestro_ray.ops.aggregates import bucketed_agg

    packed = chunks.map_batches(pack, batch_format="pyarrow")
    # distinct chunk_text is O(corpus chunks) — the bucketed exchange,
    # not Ray's range-sorted groupby (see bucketed_agg's scale notes)
    winners = bucketed_agg(packed.map_batches(
        lambda t: t.select(["chunk_text", "packed"]),
        batch_format="pyarrow"),
        "chunk_text", [("packed", "min", "min(packed)")])
    joined = hash_join(packed, winners, keys="chunk_text",
                       num_buckets=num_buckets)
    survivors = joined.map_batches(
        lambda t: t.filter(pc.equal(t.column("packed"),
                                    t.column("min(packed)"))),
        batch_format="pyarrow",
    )

    return _reassemble_docs(survivors, id_col, "text_dedup")


# ----------------------------------------------------- boilerplate removal


def boilerplate_chunks(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
    min_docs: int = 2,
    num_buckets: int = 16,
) -> rd.Dataset:
    """Corpus-frequency boilerplate removal (the CCNet/C4 "drop lines
    that appear on many pages" pass, over token chunks since the
    synthetic corpus has no newlines): split every doc into
    non-overlapping ``chunk_tokens`` windows, count the DISTINCT docs
    containing each chunk text, drop EVERY occurrence of chunks seen in
    ``>= min_docs`` docs (unlike ``dedup_chunks_global``, the first
    occurrence goes too — boilerplate is noise, not content), then
    reassemble docs from the survivors. Docs that were pure boilerplate
    disappear.

    Output: (id_col, text_clean, n_chunks_kept).

    Plan: chunking is a streaming flat map; the doc-frequency table is
    ONE ``groupby(chunk_text)`` whose per-group reduce is a single
    ``count_distinct`` (output is O(distinct chunks), never the
    corpus); survivors are selected by the bucketed ``hash_join`` back
    onto the chunk stream; reassembly is one per-doc group sort +
    ``binary_join``. At 100 TB swap the string key for its 128-bit
    content hash to shrink both shuffles (exact text kept here so the
    DuckDB twin is collision-free by construction)."""
    from maestro_ray.ops.corpus import chunk_documents
    from maestro_ray.ops.joins import hash_join

    chunks = chunk_documents(ds, id_col, text_col, chunk_tokens,
                             overlap_tokens=0)

    from maestro_ray.ops.aggregates import bucketed_agg

    # count_distinct is NON-mergeable — exactly what the bucketed
    # exchange enables exactly (a chunk's rows co-locate wholly in one
    # bucket); the old groupby+map_groups paid one Python call per
    # DISTINCT CHUNK
    freq = bucketed_agg(chunks.map_batches(
        lambda t: t.select(["chunk_text", id_col]),
        batch_format="pyarrow"),
        "chunk_text", [(id_col, "count_distinct", "nd")])
    joined = hash_join(chunks, freq, keys="chunk_text",
                       num_buckets=num_buckets)
    survivors = joined.map_batches(
        lambda t: t.filter(pc.less(t.column("nd"), min_docs)),
        batch_format="pyarrow",
    )

    return _reassemble_docs(survivors, id_col, "text_clean")


# ------------------------------------------------------- blocklist scoring


def blocklist_count(
    ds: rd.Dataset,
    text_col: str,
    terms: list[str],
    out: str = "n_blocked",
) -> rd.Dataset:
    """Per-doc blocklist hit count (the C4 bad-words pass, kept as a
    SCORE so downstream thresholds stay a policy choice): count
    non-overlapping word-boundary matches of any term. One anchored RE2
    alternation evaluated by pyarrow's C++ ``count_substring_regex``
    per batch — streaming, no shuffle, no Python on the hot path; RE2
    semantics are shared with DuckDB's ``regexp_extract_all`` so the
    twin is exact. Terms are regex-escaped (they are words, not
    patterns)."""
    import re as _re

    if not terms:
        raise ValueError("blocklist_count: empty term list")
    pat = r"\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"

    def score(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(t.column(text_col), pat)
        return t.append_column(out, n.cast(pa.int64()))

    return ds.map_batches(score, batch_format="pyarrow")


_CANON_URL_RE = (r"^(?P<cscheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                 r"(?P<chost>[^/?#]+)(?P<cpath>[^?#]*)")


def canonicalize_urls(
    ds: rd.Dataset, url_col: str = "url", out_col: str = "url_canonical"
) -> rd.Dataset:
    """Canonical content URL for keying/dedup: lowercase scheme+host,
    default port stripped (:80 for http, :443 for https), query and
    fragment DROPPED (the content-identity rule — tracking params can
    never split a key), trailing slashes collapsed (empty path → '/').
    One vectorized RE2 extract + rebuild per batch — the identical
    engine DuckDB embeds, so the SQL twin is the same pattern.
    Unparseable/null URLs yield null (quarantine-not-crash)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        parts = pc.extract_regex(urls, _CANON_URL_RE)
        ok = pc.is_valid(parts)
        scheme = pc.utf8_lower(pc.struct_field(parts, "cscheme"))
        host = pc.utf8_lower(pc.struct_field(parts, "chost"))
        host = pc.if_else(
            pc.equal(scheme, pa.scalar("http")),
            pc.replace_substring_regex(host, r":80$", ""), host)
        host = pc.if_else(
            pc.equal(scheme, pa.scalar("https")),
            pc.replace_substring_regex(host, r":443$", ""), host)
        path = pc.replace_substring_regex(
            pc.struct_field(parts, "cpath"), r"/+$", "")
        path = pc.if_else(pc.equal(path, pa.scalar("")),
                          pa.scalar("/"), path)
        canon = pc.binary_join_element_wise(scheme, "://", host, path, "")
        canon = pc.if_else(ok, canon, pa.nulls(len(urls), pa.string()))
        return batch.append_column(out_col, canon)

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------- link extraction


def extract_links(
    ds: rd.Dataset,
    html_col: str = "html",
    doc_col: str = "doc_id",
    out_col: str = "href",
) -> rd.Dataset:
    """Outlink extraction — every ``href="..."`` value in an HTML
    column, exploded to one (doc, href) row per link, preserving
    per-document multiplicity (the link-graph edge list wants weights).

    Fully vectorized, no per-doc Python: ONE ``split_pattern`` on the
    literal ``href="`` per batch, flatten with the list offsets (the
    first fragment of each doc is pre-link text and is masked out by
    position, not content), then the link is each surviving fragment's
    prefix up to the closing quote — one more ``split_pattern`` +
    ``list_element(0)``. Null/linkless docs contribute zero rows.
    Streaming map_batches; the downstream edge aggregate owns the only
    shuffle."""

    def links(t: pa.Table) -> pa.Table:
        html = pc.cast(t.column(html_col), pa.string())
        parts = pc.split_pattern(html, pattern='href="')
        lens = pc.fill_null(pc.list_value_length(parts), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_links = np.maximum(lens - 1, 0)
        flat = pc.list_flatten(parts)
        # mask: within each doc's fragment run, keep positions > 0
        total = int(lens.sum())
        first_pos = np.zeros(total, dtype=bool)
        starts = np.cumsum(lens) - lens
        first_pos[starts[lens > 0]] = True
        keep = ~first_pos
        frags = flat.filter(pa.array(keep))
        href = pc.list_element(
            pc.split_pattern(frags, pattern='"', max_splits=1), 0)
        doc = t.column(doc_col).take(
            pa.array(np.repeat(np.arange(len(t)), n_links)))
        return pa.table({doc_col: doc, out_col: href})

    return ds.map_batches(links, batch_format="pyarrow")


# ------------------------------------------------------ compression signal


def compression_ratio(
    ds: rd.Dataset,
    text_col: str = "text",
    out: str = "zlib_ratio",
    level: int = 6,
) -> rd.Dataset:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic redundancy quality signal (near-random text ≈ 1, heavily
    repetitive/boilerplate text ≪ 1; RefinedWeb/Gopher-family rules
    threshold on it). Deterministic for a fixed zlib level, so the
    score is reproducible across runs and partitionings; it has no SQL
    twin (DEFLATE is not SQL-expressible) — pytest owns the oracle via
    planted repetitive-vs-random docs.

    The per-doc loop is inherent (one DEFLATE stream per document) but
    each iteration is a single C call on the raw UTF-8 buffer —
    comparable to a hash kernel, no Python string work. Empty/null
    docs yield null."""
    import zlib

    def score(t: pa.Table) -> pa.Table:
        texts = pc.cast(t.column(text_col), pa.string())
        raw = pc.binary_length(pc.cast(texts, pa.binary())) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        vals = texts.to_pylist()
        comp = np.fromiter(
            (len(zlib.compress(v.encode("utf-8"), level))
             if v else 0 for v in vals),
            dtype=np.float64, count=len(vals))
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = comp / raw
        ratio = np.where(raw > 0, ratio, np.nan)
        return t.append_column(
            out, pa.array(ratio, pa.float64(), from_pandas=True))

    return ds.map_batches(score, batch_format="pyarrow")
