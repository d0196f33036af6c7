"""Corpus-preparation operators for training-data pipelines: document
chunking (token windows with overlap), deterministic hash sampling
(reproducible corpus subsetting, optionally stratified), and term /
document-frequency statistics with a TF-IDF scoring stage.

All are streaming ``map_batches`` plans. The tokenizer is a SINGLE
SPACE split everywhere in this module — the same semantics as DuckDB's
``string_split(text, ' ')`` — so every operator has an exact SQL twin
(consecutive spaces yield empty tokens, the empty string yields one
empty token, null text yields nothing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


# --------------------------------------------------------------- chunking


def chunk_documents(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
) -> rd.Dataset:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap_tokens`` shared between consecutive chunks (stride =
    chunk − overlap) — the standard context-window prep for training
    pipelines. Streaming flat-map: each batch expands independently, no
    shuffle, no driver state; output rows are (id, chunk_id,
    chunk_text, n_tokens).

    Fully Arrow-side: one ``split_pattern`` per batch, chunk membership
    as one vectorized ``take`` over the flattened token array, chunk
    text via ``binary_join`` — no Python objects on the hot path. Chunk
    text is a verbatim substring of the input (tokens re-joined by the
    single separator they were split on), so bytes survive round-trips.
    """
    if chunk_tokens <= 0 or not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need chunk_tokens>0, 0<=overlap<chunk; got "
            f"{chunk_tokens}, {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens

    def chunk_batch(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        if tbl.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "chunk_id": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            })
        texts = tbl.column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):  # zero/one chunk cases
            texts = (texts.chunk(0) if texts.num_chunks else
                     pa.array([], pa.string()))
        toks = pc.split_pattern(texts, " ")
        offs = toks.offsets.to_numpy()              # token-index bounds/doc
        n_tok = np.diff(offs)                       # ≥1 per non-null doc
        n_chunks = (n_tok + stride - 1) // stride   # ceil(n/stride), n≥1
        doc_idx = np.repeat(np.arange(len(n_tok)), n_chunks)
        chunk_id = np.concatenate([np.arange(c) for c in n_chunks]) \
            if len(n_chunks) else np.empty(0, dtype=np.int64)
        s_tok = offs[doc_idx] + chunk_id * stride   # global 1st-token idx
        e_tok = np.minimum(s_tok + chunk_tokens, offs[doc_idx] + n_tok[doc_idx])
        lens = e_tok - s_tok
        bounds = np.concatenate([[0], np.cumsum(lens)])
        # flat token index per (chunk, position): start + within-chunk pos
        flat_idx = np.repeat(s_tok, lens) + (
            np.arange(int(bounds[-1])) - np.repeat(bounds[:-1], lens))
        chunk_vals = toks.values.take(pa.array(flat_idx, pa.int64()))
        chunks = pa.ListArray.from_arrays(
            pa.array(bounds, pa.int32()), chunk_vals)
        return pa.table({
            id_col: tbl.column(id_col).take(pa.array(doc_idx, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "chunk_text": pc.binary_join(chunks, " "),
            "n_tokens": pa.array(lens, pa.int64()),
        })

    return ds.map_batches(chunk_batch, batch_format="pyarrow")


# ---------------------------------------------------------- hash sampling

#: Knuth multiplicative constant — shared with the checksum twin policy
#: (__ray_entry__ docstring): reduce the key mod 2^32 BEFORE the
#: multiply so both numpy uint64 and the SQL twin (HUGEINT) stay exact.
_HASH_MULT = 2654435761
_HASH_MOD = 2**32


def _mult_hash(keys: np.ndarray, op_name: str) -> np.ndarray:
    """THE multiplicative key hash — the cross-engine contract every
    sampling twin pins (``(key % 2^32 * 2654435761) % 2^32``), defined
    ONCE so the operators sharing it can never desynchronize from their
    oracles independently.

    Keys must be NON-NEGATIVE: SQL ``%`` yields negative remainders for
    negative operands while uint64 arithmetic wraps, so the engine and
    the oracle twin would silently disagree — fail loudly instead."""
    if len(keys) and keys.min() < 0:
        raise ValueError(
            f"{op_name} requires non-negative integer keys (negative "
            "keys diverge between uint64 wrap and SQL % semantics)"
        )
    k = keys.astype(np.uint64) % _HASH_MOD
    return (k * np.uint64(_HASH_MULT)) % np.uint64(_HASH_MOD)


def _bucket100(keys: np.ndarray) -> np.ndarray:
    """Deterministic 0-99 bucket per integer key, overflow-safe."""
    return _mult_hash(keys, "sample_hash") % np.uint64(100)


def sample_hash(ds: rd.Dataset, key_col: str, pct: int) -> rd.Dataset:
    """Deterministic ``pct``-percent sample by integer key: keep rows
    whose multiplicative-hash bucket (0-99) is < ``pct``. Reproducible
    across runs/cluster sizes and consistent across TABLES (the same
    key always lands the same side — join-compatible sampling), unlike
    ``Dataset.random_sample``. Pure per-batch filter, no shuffle.

    SQL twin: ``(CAST(key % 2^32 AS HUGEINT) * 2654435761) % 2^32 %
    100 < pct`` — exact on both engines at any key scale."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct={pct}: need 0..100")

    def keep(batch: pa.Table) -> pa.Table:
        # null keys hash nowhere: fill for the arithmetic, then drop via
        # the validity bitmap (SQL twin: NULL < pct is NULL → filtered)
        keys = pc.fill_null(batch.column(key_col), 0).to_numpy(
            zero_copy_only=False)
        mask = _bucket100(keys) < pct
        valid = pc.is_valid(batch.column(key_col)).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(mask & valid))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_hash(
    ds: rd.Dataset, key_col: str, strata_col: str, pcts: dict[str, int],
    default_pct: int = 0,
) -> rd.Dataset:
    """Per-stratum deterministic sampling: each stratum value gets its
    own keep-percentage (absent strata fall back to ``default_pct``) —
    e.g. keep 100% of rare languages, 5% of English. Same hash contract
    as ``sample_hash``; still a pure per-batch filter."""
    for s, p in pcts.items():
        if not 0 <= p <= 100:
            raise ValueError(f"pct for stratum {s!r} = {p}: need 0..100")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct={default_pct}: need 0..100")

    def keep(batch: pa.Table) -> pa.Table:
        keys = pc.fill_null(batch.column(key_col), 0).to_numpy(
            zero_copy_only=False)
        strata = batch.column(strata_col).to_pylist()
        thresh = np.fromiter(
            (pcts.get(s, default_pct) for s in strata),
            dtype=np.uint64, count=len(strata),
        )
        mask = _bucket100(keys) < thresh
        valid = pc.is_valid(batch.column(key_col)).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(mask & valid))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_exact_k(ds: rd.Dataset, key_col: str, k: int) -> pd.DataFrame:
    """Deterministic uniform-without-replacement sample of EXACTLY k
    rows: the k rows with the globally smallest multiplicative hash of
    ``key_col`` (ties broken by the key itself). ``sample_hash`` gives
    a deterministic RATE; this gives a deterministic SIZE — the "give
    me exactly 10k eval docs" ask — while keeping the same properties
    (reproducible across runs/cluster sizes, consistent across tables
    sharing the key). Plan: one derived hash column + the local-top-k
    combiner (no global sort, no shuffle; ≤ k·num_batches survivors on
    the driver — k is small by contract).

    SQL twin: ``ORDER BY (CAST(key % 2^32 AS HUGEINT) * 2654435761)
    % 2^32, key LIMIT k`` — exact on both engines. Null keys are
    dropped (they hash nowhere; SQL NULLS LAST + non-null k-prefix
    matches only if k ≤ non-null count, so we pin the drop rule)."""
    from maestro_ray.ops.aggregates import topk

    def add_h(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column(key_col)))
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
        h = _mult_hash(keys, "sample_exact_k")
        return tbl.append_column("__h", pa.array(h.astype(np.int64)))

    out = topk(ds.map_batches(add_h, batch_format="pyarrow"),
               "__h", k, descending=False, tie_break=[key_col])
    return out.drop(columns="__h")


def mixture_sample(
    ds: rd.Dataset, key_col: str, strata_col: str, counts: dict[str, int]
) -> rd.Dataset:
    """Deterministic corpus MIXING: exactly ``counts[s]`` rows from
    stratum ``s`` (fewer only if the stratum is smaller), selected as
    the smallest-multiplicative-hash keys within the stratum — the
    "assemble a training mix with fixed per-source quotas" operator.
    Strata not in ``counts`` are excluded.

    Same hash, same determinism guarantees as ``sample_exact_k``
    (reproducible across runs, cluster sizes and partitionings). Plan:
    per-batch combiner keeps at most ``counts[s]`` rows per stratum per
    batch (sort + run-rank kernel, no Python loop), then ONE
    groupby(strata) re-applies the same kernel — the exchange carries
    ≤ Σ counts per input block, never the corpus.

    SQL twin: ``row_number() OVER (PARTITION BY strata ORDER BY hash,
    key) <= counts[strata]``.
    """
    from maestro_ray.ops.aggregates import _rank_in_key_runs

    if not counts or any(k < 0 for k in counts.values()):
        raise ValueError("counts must be a non-empty {stratum: n>=0} map")
    strata_sorted = np.array(sorted(counts))
    k_by_stratum = np.array([counts[s] for s in strata_sorted],
                            dtype=np.int64)
    sort_keys = [(strata_col, "ascending"), ("__h", "ascending"),
                 (key_col, "ascending")]

    def local(batch: pa.Table) -> pa.Table:
        tbl = batch
        if "__h" not in tbl.column_names:
            tbl = tbl.filter(
                pc.and_(pc.is_valid(tbl.column(key_col)),
                        pc.is_in(tbl.column(strata_col),
                                 value_set=pa.array(strata_sorted))))
            if tbl.num_rows == 0:
                return tbl.append_column(
                    "__h", pa.array([], pa.int64()))
            keys = tbl.column(key_col).to_numpy(zero_copy_only=False)
            h = _mult_hash(keys, "mixture_sample")
            tbl = tbl.append_column("__h", pa.array(h.astype(np.int64)))
        if tbl.num_rows == 0:
            return tbl
        s = tbl.take(pc.sort_indices(tbl, sort_keys=sort_keys))
        rank = _rank_in_key_runs(s, [strata_col])
        pos = np.searchsorted(
            strata_sorted,
            np.asarray(s.column(strata_col).to_pylist()))
        return s.filter(pa.array(rank < k_by_stratum[pos]))

    pruned = ds.map_batches(local, batch_format="pyarrow")
    out = pruned.groupby(strata_col).map_groups(
        local, batch_format="pyarrow")
    return out.drop_columns(["__h"])


# ------------------------------------------------------ term statistics


def _explode_term_counts(
    batch: pa.Table, id_col: str, text_col: str, key_order: list[str]
) -> pa.Table:
    """Shared explode plan: drop null texts, single-space split, repeat
    ids over tokens, count per (id, term) — the per-batch partial for
    both ``term_doc_stats`` and ``tfidf_scores``. Output columns are
    ``key_order`` + ["tf"]."""
    tbl = batch.filter(pc.is_valid(batch.column(text_col)))
    toks = pc.split_pattern(tbl.column(text_col).combine_chunks(), " ")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = tbl.column(id_col).take(
        pa.array(np.repeat(np.arange(len(n)), n), pa.int64()))
    flat = pa.table({id_col: ids, "term": toks.flatten()}).select(key_order)
    out = flat.group_by(key_order).aggregate([([], "count_all")])
    return out.rename_columns([*key_order, "tf"])


def term_doc_stats(
    ds: rd.Dataset, id_col: str, text_col: str, min_df: int = 1
) -> rd.Dataset:
    """Per-term corpus statistics: document frequency (docs containing
    the term) and total term frequency. Plan: per-batch explode →
    group_by (term, id) — each document lives wholly inside one input
    row, so per-batch (term, doc) partials are already globally
    distinct — then ONE distributed groupby(term) folds df (row count)
    and tf (sum). The exchange carries distinct (term, doc) pairs, not
    tokens; driver holds nothing."""

    def explode_partial(batch: pa.Table) -> pa.Table:
        out = _explode_term_counts(batch, id_col, text_col,
                                   ["term", id_col])
        return out.append_column(
            "df", pa.array(np.ones(out.num_rows, dtype=np.int64)))

    merged = (
        ds.map_batches(explode_partial, batch_format="pyarrow")
        .groupby("term")
        .sum(["df", "tf"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        names = {c: c.replace("sum(", "").rstrip(")")
                 for c in batch.column_names if c.startswith("sum(")}
        batch = batch.rename_columns(
            [names.get(c, c) for c in batch.column_names])
        if min_df > 1:
            batch = batch.filter(
                pc.greater_equal(batch.column("df"),
                                 pa.scalar(min_df, pa.int64())))
        return batch.select(["term", "df", "tf"])

    return merged.map_batches(finish, batch_format="pyarrow")


def tfidf_scores(
    ds: rd.Dataset, id_col: str, text_col: str, n_docs: int | None = None,
    round_to: int = 6,
) -> rd.Dataset:
    """TF-IDF score for every (doc, term) pair: tf(d,t) · ln(N / df(t)).
    The df table is computed once by ``term_doc_stats`` (small — one row
    per distinct TERM) and broadcast via ``ray.put``; the scoring pass
    is a per-batch explode + count + dict-free vectorized lookup
    (searchsorted into the sorted broadcast term array). No shuffle
    touches the (doc, term) pairs — the canonical broadcast-small-side
    shape. Scores are rounded to ``round_to`` dp (cross-engine float
    policy, __ray_entry__ docstring)."""
    if n_docs is None:
        n_docs = ds.count()
    df_tbl = term_doc_stats(ds, id_col, text_col).to_pandas()
    df_tbl = df_tbl.sort_values("term").reset_index(drop=True)
    terms_ref = ray.put(df_tbl["term"].to_numpy())
    idf_ref = ray.put(np.log(float(n_docs) / df_tbl["df"].to_numpy()))

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted = ray.get(terms_ref)
        idf = ray.get(idf_ref)
        cnt = _explode_term_counts(batch, id_col, text_col,
                                   [id_col, "term"])
        pos = np.searchsorted(
            terms_sorted, np.asarray(cnt.column("term").to_pylist()))
        score = cnt.column("tf").to_numpy(zero_copy_only=False) * idf[pos]
        return cnt.append_column(
            "score", pa.array(np.round(score, round_to), pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_scores(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    round_to: int = 6,
) -> rd.Dataset:
    """Okapi BM25 retrieval score of every document against a fixed
    term query — the classic lexical ranking for corpus search and
    RAG-style retrieval. score(d) = Σ_t idf(t) · tf·(k1+1) / (tf +
    k1·(1−b+b·dl/avgdl)) with the Lucene idf = ln(1 + (N−df+0.5)/
    (df+0.5)); docs with no query-term hit are omitted.

    Plan: corpus stats need TWO tiny aggregates — df per QUERY term
    (term_doc_stats filtered to the query vocabulary; |query| rows) and
    (Σ dl, N_dl) for avgdl (one mergeable partial per batch) — both
    broadcast via ``ray.put``. The scoring pass is then per-batch only:
    each doc lives wholly inside one input row, so tf, dl and the
    per-doc sum are batch-local. No shuffle ever touches (doc, term)
    pairs; the corpus streams once for stats and once for scores.

    Per-doc term contributions are summed in sorted-term order
    (deterministic fold) and rounded to ``round_to`` dp (cross-engine
    float policy, __ray_entry__ docstring). Tokenizer is the module's
    single-space split — exact SQL twin semantics.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = np.array(sorted(set(query_terms)))
    qt_set_ref = ray.put(qt)

    # ONE stats pass over the corpus: per-batch (rows, non-null rows,
    # Σdl) plus per-QUERY-term df — tokens are filtered to the
    # broadcast query vocabulary BEFORE any aggregation, so neither
    # the exchange nor the driver ever sees the corpus vocabulary
    # (a full term_doc_stats here would shuffle every distinct
    # (term, doc) pair to compute |query| numbers).
    def stats_partial(batch: pa.Table) -> pa.Table:
        terms_sorted = ray.get(qt_set_ref)
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        toks = pc.split_pattern(tbl.column(text_col).combine_chunks(), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        hit = pc.is_in(flat, value_set=pa.array(terms_sorted))
        doc_of = np.repeat(np.arange(len(n)), n)
        hidx = hit.to_numpy(zero_copy_only=False)
        # distinct (term, doc-in-batch) pairs → df contribution
        ht = np.asarray(flat.filter(pa.array(hidx)).to_pylist())
        hd = doc_of[hidx]
        if len(ht):
            tpos = np.searchsorted(terms_sorted, ht).astype(np.int64)
            # distinct (term, doc) pairs, then count docs per term
            pair = np.unique(tpos * (len(n) + 1) + hd)
            dfc = np.bincount(pair // (len(n) + 1),
                              minlength=len(terms_sorted))
        else:
            dfc = np.zeros(len(terms_sorted), dtype=np.int64)
        return pa.table({
            "kind": pa.array(
                ["dl"] + [f"df:{i}" for i in range(len(terms_sorted))]),
            "v1": pa.array([int(batch.num_rows)]
                           + dfc.astype(np.int64).tolist(), pa.int64()),
            "v2": pa.array([int(n.sum())] + [0] * len(terms_sorted),
                           pa.int64()),
            "v3": pa.array([len(n)] + [0] * len(terms_sorted), pa.int64()),
        })

    agg = ds.map_batches(stats_partial, batch_format="pyarrow") \
        .to_pandas().groupby("kind").sum()
    if n_docs is None:
        n_docs = int(agg["v1"].get("dl", 0))
    df_by_term = np.array([int(agg["v1"].get(f"df:{i}", 0))
                           for i in range(len(qt))], dtype=np.float64)
    n_dl = int(agg["v3"].get("dl", 0))
    if n_dl == 0:
        raise ValueError("bm25_scores: no non-null documents")
    avgdl = int(agg["v2"].get("dl", 0)) / n_dl
    idf = np.log(1.0 + (n_docs - df_by_term + 0.5) / (df_by_term + 0.5))

    qt_ref = ray.put(qt)
    idf_ref = ray.put(idf)

    def score(batch: pa.Table) -> pa.Table:
        terms_sorted = ray.get(qt_ref)
        idf_v = ray.get(idf_ref)
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        if tbl.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "bm25": pa.array([], pa.float64()),
            })
        toks = pc.split_pattern(tbl.column(text_col).combine_chunks(), " ")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cnt = _explode_term_counts(tbl, id_col, text_col, [id_col, "term"])
        terms = np.asarray(cnt.column("term").to_pylist())
        p = np.searchsorted(terms_sorted, terms)
        hit = (p < len(terms_sorted)) & (terms_sorted[np.minimum(
            p, len(terms_sorted) - 1)] == terms)
        cnt = cnt.filter(pa.array(hit))
        if cnt.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "bm25": pa.array([], pa.float64()),
            })
        p = p[hit]
        # dl lookup: position of each hit's doc within this batch
        ids_np = tbl.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_np, kind="stable")
        doc_pos = order[np.searchsorted(
            ids_np[order],
            cnt.column(id_col).to_numpy(zero_copy_only=False))]
        tf = cnt.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[doc_pos] / avgdl)
        contrib = idf_v[p] * tf * (k1 + 1.0) / denom
        # deterministic per-doc fold: sort by (doc, term), reduceat
        key = np.lexsort((terms[hit], doc_pos))
        doc_sorted = doc_pos[key]
        starts = np.flatnonzero(
            np.r_[True, doc_sorted[1:] != doc_sorted[:-1]])
        sums = np.add.reduceat(contrib[key], starts)
        out_ids = tbl.column(id_col).take(
            pa.array(doc_sorted[starts], pa.int64()))
        return pa.table({
            id_col: out_ids,
            "bm25": pa.array(np.round(sums, round_to), pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ----------------------------------------------------- bigram LM scoring


def _explode_bigrams(ds: rd.Dataset, id_col: str,
                     text_col: str) -> rd.Dataset:
    """Streaming flat map: (id, w1, w2) for every ADJACENT token pair
    of every doc (single-space tokenizer, module contract). Docs with
    fewer than two tokens emit nothing. Fully Arrow-side: one
    split_pattern per batch, the pair columns are two offset gathers of
    the flattened token array — no Python on the hot path."""

    def explode(batch: pa.Table) -> pa.Table:
        tbl = batch.filter(pc.is_valid(batch.column(text_col)))
        empty = pa.table({
            id_col: pa.array([], batch.schema.field(id_col).type),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
        })
        if tbl.num_rows == 0:
            return empty
        texts = tbl.column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = (texts.chunk(0) if texts.num_chunks else
                     pa.array([], pa.string()))
        toks = pc.split_pattern(texts, " ")
        offs = toks.offsets.to_numpy()
        n_pairs = np.maximum(np.diff(offs) - 1, 0)
        if not n_pairs.sum():
            return empty
        doc_idx = np.repeat(np.arange(len(n_pairs)), n_pairs)
        bounds = np.concatenate(([0], np.cumsum(n_pairs)))
        first = np.repeat(offs[:-1], n_pairs) + (
            np.arange(int(bounds[-1])) - np.repeat(bounds[:-1], n_pairs))
        return pa.table({
            id_col: tbl.column(id_col).take(pa.array(doc_idx, pa.int64())),
            "w1": toks.values.take(pa.array(first, pa.int64())),
            "w2": toks.values.take(pa.array(first + 1, pa.int64())),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def bigram_lm_perplexity(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
    round_to: int | None = 6,
    num_buckets: int = 16,
    broadcast_below: int = 4_000_000,
) -> pd.DataFrame:
    """Per-doc statistical-LM quality score (the CCNet/KenLM filtering
    signal, with the corpus itself as training data): train an add-k
    smoothed bigram model over ALL docs — P(w2|w1) = (c(w1w2) + k) /
    (c(w1) + k·V), c(w1) the context count, V the corpus's distinct
    token count — and score each doc by its mean negative log₂
    probability (bits per bigram; low = typical text, high = atypical).
    Docs with fewer than two tokens are absent.

    Plan, all distributed: ONE bigram flat map feeds (a) per-batch
    count partials → small groupby for the bigram and context tables,
    (b) the scoring stream, which takes the model back via joins; V is
    an exact distinct count (per-batch dedup partials). Per-doc
    reduction is the mergeable ``grouped_agg``. Output: (id_col,
    ppl_bits), O(docs).

    Join strategy is picked from the already-computed V: the bigram
    table is ≤ V², so when V² ≤ ``broadcast_below`` the model is
    ``ray.put`` ONCE and joined per batch with no shuffle
    (broadcast_join); above it the model can be larger than any one
    node and the two bucketed ``hash_join``s apply — never a
    driver-side Python dict either way."""
    from maestro_ray.ops.aggregates import distinct, grouped_agg_ds
    from maestro_ray.ops.joins import broadcast_join, hash_join

    # materialized ONCE: the bigram stream feeds three consumers (bc,
    # cc, the scoring join) — without this, the read+split+gather
    # explode re-executes per consumer (same rationale as kmeans_fit's
    # projection; the object store spills if it must)
    big = _explode_bigrams(ds, id_col, text_col).materialize()
    if big.count() == 0:
        # degenerate corpus (every doc < 2 tokens / all null): an
        # empty result with the contract schema, never a crash
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "ppl_bits": pd.Series([], dtype="float64")})

    def count_partial(cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            g = t.select(cols).group_by(cols).aggregate([([], "count_all")])
            return g.rename_columns([*cols, "cnt"])
        return f

    bc = (big.map_batches(count_partial(["w1", "w2"]),
                          batch_format="pyarrow")
          .groupby(["w1", "w2"]).sum("cnt")
          .map_batches(lambda t: t.rename_columns(["w1", "w2", "c2"]),
                       batch_format="pyarrow"))
    cc = (big.map_batches(count_partial(["w1"]), batch_format="pyarrow")
          .groupby("w1").sum("cnt")
          .map_batches(lambda t: t.rename_columns(["w1", "c1"]),
                       batch_format="pyarrow"))

    def tok_explode(batch: pa.Table) -> pa.Table:
        texts = batch.filter(pc.is_valid(batch.column(text_col))) \
            .column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = (texts.chunk(0) if texts.num_chunks else
                     pa.array([], pa.string()))
        toks = pc.split_pattern(texts, " ")
        return pa.table({"tok": toks.values.unique()})  # batch partial

    vocab = int(distinct(ds.map_batches(tok_explode, batch_format="pyarrow"),
                         "tok").count())

    if vocab * vocab <= broadcast_below:
        joined = broadcast_join(
            broadcast_join(big, pa.concat_tables(list(bc.iter_batches(
                batch_size=None, batch_format="pyarrow"))),
                keys=["w1", "w2"]),
            pa.concat_tables(list(cc.iter_batches(
                batch_size=None, batch_format="pyarrow"))),
            keys="w1")
    else:
        joined = hash_join(hash_join(big, bc, keys=["w1", "w2"],
                                     num_buckets=num_buckets),
                           cc, keys="w1", num_buckets=num_buckets)
    kv = float(k)

    def logprob(t: pa.Table) -> pa.Table:
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.log((c2 + kv) / (c1 + kv * vocab))
        return pa.table({
            id_col: t.column(id_col),
            "lp": pa.array(lp, pa.float64()),
        })

    scored = joined.map_batches(logprob, batch_format="pyarrow")
    # per-doc reduction on the DATASET variant (r3 VERDICT #4): the
    # per-doc (sum, count) table is corpus-keyed — it must never park
    # on the driver as an intermediate; ppl finalization is fused per
    # output batch and only the final report is collected
    agg = grouped_agg_ds(scored, id_col, {"s": ("lp", "sum"),
                                          "n": (None, "count")})

    def ppl(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        v = -(s / n) / np.log(2.0)
        if round_to is not None:
            v = np.round(v, round_to)
        return pa.table({id_col: t.column(id_col),
                         "ppl_bits": pa.array(v, pa.float64())})

    out = agg.map_batches(ppl, batch_format="pyarrow").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


# ------------------------------------------------- decontamination


def _explode_ngrams(batch: pa.Table, id_col: str, text_col: str,
                    n: int) -> pa.Table:
    """(id, g) for every word ``n``-gram of every doc — the n-ary
    generalization of ``_explode_bigrams``'s offset-gather plan: one
    ``split_pattern`` per batch, the n token columns are n shifted
    gathers of the flattened token array, joined with a single space.
    Docs with fewer than ``n`` tokens emit nothing; null texts emit
    nothing."""
    tbl = batch.filter(pc.is_valid(batch.column(text_col)))
    empty = pa.table({
        id_col: pa.array([], batch.schema.field(id_col).type),
        "g": pa.array([], pa.string()),
    })
    if tbl.num_rows == 0:
        return empty
    texts = tbl.column(text_col).combine_chunks()
    if isinstance(texts, pa.ChunkedArray):
        texts = (texts.chunk(0) if texts.num_chunks else
                 pa.array([], pa.string()))
    toks = pc.split_pattern(texts, " ")
    offs = toks.offsets.to_numpy()
    n_grams = np.maximum(np.diff(offs) - (n - 1), 0)
    if not n_grams.sum():
        return empty
    doc_idx = np.repeat(np.arange(len(n_grams)), n_grams)
    bounds = np.concatenate(([0], np.cumsum(n_grams)))
    first = np.repeat(offs[:-1], n_grams) + (
        np.arange(int(bounds[-1])) - np.repeat(bounds[:-1], n_grams))
    cols = [toks.values.take(pa.array(first + i, pa.int64()))
            for i in range(n)]
    return pa.table({
        id_col: tbl.column(id_col).take(pa.array(doc_idx, pa.int64())),
        "g": pc.binary_join_element_wise(*cols, " "),
    })


def decontaminate(
    ds: rd.Dataset,
    eval_ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> rd.Dataset:
    """Benchmark decontamination: per document, the number of DISTINCT
    word ``n``-grams it shares with the evaluation corpus ``eval_ds``
    (same ``text_col``), plus a ``contaminated`` flag (overlap ≥ 1) —
    the GPT-3-style 13-gram overlap check re-expressed Ray-Data-first.

    Scale plan: the eval side is SMALL by contract (a benchmark suite —
    thousands of docs, not the corpus). Its distinct n-grams are folded
    DISTRIBUTED (explode → groupby distinct), collected once (O(eval
    n-grams) rows — the only driver materialization), sorted, and
    broadcast via ``ray.put``. The corpus pass is a per-batch explode +
    vectorized ``pc.is_in`` hash probe + per-batch distinct fold — docs
    live wholly inside one input row, so per-batch distinct counts are
    globally exact and NOTHING about the corpus is ever shuffled or
    collected. One output row per non-null-text doc (overlap 0 when
    clean — the relation is left-join shaped, never empty).

    Tokenizer is the module's single-space contract, so the result has
    an exact SQL twin (string_split + generate_series n-gram walk)."""
    if n < 1:
        raise ValueError(f"decontaminate: n={n} must be >= 1")

    ev = (
        eval_ds.map_batches(
            lambda t: _explode_ngrams(t, id_col, text_col, n)
            .select(["g"]),
            batch_format="pyarrow")
        .groupby("g")
        .count()
    )
    ev_batches = list(ev.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
    ev_tbl = (pa.concat_tables(ev_batches) if ev_batches
              else pa.table({"g": pa.array([], pa.string())}))
    ev_arr = pa.array(
        np.sort(ev_tbl.column("g").to_numpy(zero_copy_only=False))
        if ev_tbl.num_rows else [], pa.string())
    ev_ref = ray.put(ev_arr)

    def overlap(batch: pa.Table) -> pa.Table:
        eval_grams = ray.get(ev_ref)
        ids = batch.filter(pc.is_valid(batch.column(text_col))) \
            .select([id_col])
        ng = _explode_ngrams(batch, id_col, text_col, n)
        hit = ng.filter(pc.is_in(ng.column("g"), value_set=eval_grams))
        per_doc = (
            hit.group_by([id_col, "g"]).aggregate([])  # distinct pairs
            .group_by([id_col]).aggregate([([], "count_all")])
            .rename_columns([id_col, "overlap"])
        )
        out = ids.join(per_doc, keys=id_col, join_type="left outer")
        ov = pc.fill_null(out.column("overlap"), 0)
        return pa.table({
            id_col: out.column(id_col),
            "overlap": ov,
            "contaminated": pc.greater_equal(ov, pa.scalar(1, pa.int64())),
        })

    return ds.map_batches(overlap, batch_format="pyarrow")


# --------------------------------------------------- sequence packing


def pack_sequences(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """Concat-and-chunk training-shard packing: documents are laid out
    end-to-end in ``id_col`` order and cut into fixed ``seq_len``-token
    training sequences (the GPT-style packing rule — no padding, docs
    may span sequence boundaries). Per doc: its token count, the
    sequence it STARTS in, the offset within that sequence, and how
    many sequences it spans — everything a shard writer needs to place
    every doc without ever materializing the token stream.

    The global token prefix sum is ``ops/scan.ordered_cumsum`` (bucketed
    three-pass scan: O(n_buckets) driver state, one groupby shuffle) —
    NOT a driver-side walk. Tokenizer is the module's single-space
    contract, so the layout has an exact SQL twin
    (``SUM(n) OVER (ORDER BY id)``). Null texts are skipped; ids must
    be unique non-null integers (enforced by the scan)."""
    if seq_len < 1:
        raise ValueError(f"pack_sequences: seq_len={seq_len}")
    from maestro_ray.ops.scan import ordered_cumsum

    keep = list(keep_cols or [])

    def count_tokens(t: pa.Table) -> pa.Table:
        tbl = t.filter(pc.is_valid(t.column(text_col)))
        toks = pc.split_pattern(tbl.column(text_col).combine_chunks(),
                                " ")
        out = pa.table({
            id_col: tbl.column(id_col),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })
        for c in keep:  # payload rides the scan shuffle once
            out = out.append_column(c, tbl.column(c))
        return out

    counted = ds.select_columns(
        list(dict.fromkeys([id_col, text_col, *keep]))).map_batches(
        count_tokens, batch_format="pyarrow")
    scanned = ordered_cumsum(counted, id_col, "n_tokens",
                             out_col="__cum_prev")

    def place(t: pa.Table) -> pa.Table:
        cum = t.column("__cum_prev").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        seq_id = cum // seq_len
        # split_pattern yields >=1 token per non-null doc, so n >= 1
        n_seqs = (cum + n - 1) // seq_len - seq_id + 1
        out = pa.table({
            id_col: t.column(id_col),
            "n_tokens": t.column("n_tokens"),
            "seq_id": pa.array(seq_id, pa.int64()),
            "seq_offset": pa.array(cum % seq_len, pa.int64()),
            "n_seqs": pa.array(n_seqs, pa.int64()),
        })
        for c in keep:
            out = out.append_column(c, t.column(c))
        return out

    return scanned.map_batches(place, batch_format="pyarrow")


def write_packed_shards(
    ds: rd.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    seqs_per_shard: int = 64,
    resume: bool = True,
) -> pd.DataFrame:
    """Materialize the packed-sequence layout to RESUMABLE partitioned
    parquet: shard ``s`` owns sequences ``[s·seqs_per_shard,
    (s+1)·seqs_per_shard)``; every doc is written into EVERY shard its
    token span touches (a boundary doc appears in both shards so each
    shard is self-contained for training), sorted by id, one file per
    shard written atomically (tmp + rename). With ``resume=True`` a
    shard whose file already exists is SKIPPED (never rewritten) — a
    killed run re-invoked finishes only the missing shards, the lake
    writer's idempotence story applied to the export side.

    One groupby(shard) shuffle moves each doc's payload once (boundary
    docs twice). Returns the shard manifest (shard, n_docs, n_tokens,
    path, written) — O(#shards) rows."""
    import os

    if seqs_per_shard < 1:
        raise ValueError(f"write_packed_shards: seqs_per_shard="
                         f"{seqs_per_shard}")
    os.makedirs(out_dir, exist_ok=True)
    placed = pack_sequences(ds, id_col, text_col, seq_len,
                            keep_cols=[text_col])

    def to_shards(t: pa.Table) -> pa.Table:
        s0 = t.column("seq_id").to_numpy(zero_copy_only=False) \
            // seqs_per_shard
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        off = t.column("seq_offset").to_numpy(zero_copy_only=False)
        last_seq = t.column("seq_id").to_numpy(zero_copy_only=False) \
            + (off + n - 1) // seq_len
        s1 = last_seq // seqs_per_shard
        reps = (s1 - s0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        bounds = np.concatenate(([0], np.cumsum(reps)))
        shard = np.repeat(s0, reps) + (
            np.arange(int(bounds[-1])) - np.repeat(bounds[:-1], reps))
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("shard", pa.array(shard, pa.int64()))

    sharded = placed.map_batches(to_shards, batch_format="pyarrow")

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = int(g.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"shard-{shard:06d}.parquet")
        n_docs = g.num_rows
        n_tokens = int(pc.sum(g.column("n_tokens")).as_py() or 0)
        if resume and os.path.exists(path):
            return pa.table({
                "shard": pa.array([shard], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_tokens": pa.array([n_tokens], pa.int64()),
                "path": pa.array([path]),
                "written": pa.array([False]),
            })
        body = g.drop_columns(["shard"])
        body = body.take(pc.sort_indices(
            body, sort_keys=[(id_col, "ascending")]))
        tmp = path + ".tmp"
        pq.write_table(body, tmp)
        os.replace(tmp, path)
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "path": pa.array([path]),
            "written": pa.array([True]),
        })

    manifest = sharded.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow").to_pandas()
    return manifest.sort_values("shard").reset_index(drop=True)


def explode_tokens(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = " ",
) -> rd.Dataset:
    """Positional tokenization: one row per token with its 1-based
    position — (id, tidx, token). Plain-substring split (Arrow
    ``split_pattern``; identical semantics to SQL ``str_split``),
    flattened via list_flatten + parent-index repeat — no Python loop,
    no shuffle (embarrassingly parallel per batch). The base relation
    for positional n-gram work."""
    from maestro_ray.ops.functions import explode_list

    def split(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({
            id_col: t.column(id_col),
            "__toks": pc.split_pattern(col, pattern=delim),
        })

    out = explode_list(ds.map_batches(split, batch_format="pyarrow"),
                       "__toks", keep=[id_col], with_pos=True,
                       out_col="token")

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "tidx": pc.add(t.column("pos"), 1),  # SQL subscripts: 1-based
            "token": t.column("token"),
        })

    return out.map_batches(widen, batch_format="pyarrow")


def sample_weighted(
    ds: rd.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
) -> "pd.DataFrame":
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ExpJ form): every row draws the deterministic uniform
    ``u = (mult_hash(key)+1) / (2³²+1)`` and the exponential key
    ``e = −ln(u) / w``; the k SMALLEST e are the sample — inclusion
    probability proportional to weight, reproducible across engines
    because u is the shared cross-engine hash contract and e is two
    IEEE ops. Distributed as per-batch top-k partials (O(batches·k)
    ever reaches the driver). Non-positive weights fail loudly.
    Returns the selected keys sorted."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = t.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(w) and (np.isnan(w).any() or (w <= 0).any()):
            raise ValueError(
                "sample_weighted: weights must be positive and non-null")
        h = _mult_hash(keys, "sample_weighted")
        u = (h.astype(np.float64) + 1.0) / float(int(_HASH_MOD) + 1)
        e = -np.log(u) / w
        kk = min(k, len(e))
        idx = np.argpartition(e, kk - 1)[:kk] if kk else \
            np.empty(0, np.int64)
        return pa.table({key_col: pa.array(keys[idx], pa.int64()),
                         "__e": pa.array(e[idx], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series(dtype="int64")})
    top = parts.sort_values(["__e", key_col]).head(k)
    return top[[key_col]].sort_values(key_col).reset_index(drop=True)


def sample_group_k(
    ds: rd.Dataset,
    group_col: str,
    key_col: str,
    k: int,
) -> rd.Dataset:
    """Deterministic EXACT-k per-group sample: the k smallest
    mult-hash values of ``key_col`` per group (hash ties broken by the
    key) — the stratified-sampling shape where every stratum needs
    exactly k rows (per-language eval sets, per-domain spot checks),
    reproducible across engines because the hash is the shared
    cross-engine contract (``_mult_hash``).

    Plan: the ``grouped_topk`` combiner (at most k rows per group
    survive each batch — never a full sort, nothing group-sized on the
    driver). Groups with fewer than k rows return all their rows.
    Null keys are DROPPED before hashing (the sample_hash rule — a
    null key hashes nowhere; the SQL twin pins WHERE key IS NOT NULL),
    never cast through float NaN, whose int64 conversion is
    platform-undefined. Keys must be non-negative integers (the
    contract's documented domain — fails loudly otherwise)."""
    if k < 1:
        raise ValueError(f"k={k}: need >= 1")
    from maestro_ray.ops.aggregates import grouped_topk

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(key_col)))
        keys = t.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _mult_hash(keys, "sample_group_k")
        return t.append_column("__h", pa.array(h.astype(np.int64),
                                               pa.int64()))

    pruned = grouped_topk(
        ds.map_batches(prep, batch_format="pyarrow"),
        [group_col], "__h", k, descending=False, tie_break=[key_col])
    return pruned.map_batches(
        lambda t: t.drop_columns(["__h"]), batch_format="pyarrow")


def dataset_split(
    ds: rd.Dataset,
    key_col: str,
    fractions: dict[str, int],
    out: str = "split",
) -> rd.Dataset:
    """Deterministic train/valid/test assignment by integer key: the
    splits partition the 0-99 multiplicative-hash bucket space
    (``fractions`` maps split name → percent, summing to 100, assigned
    in ALPHABETICAL split-name order so the layout is a pure function
    of the fractions). The same key always lands the same split across
    runs, cluster sizes AND tables (leakage-safe: a joined row can
    never straddle train and test). Pure per-batch append, no shuffle;
    null keys get a null split (SQL CASE semantics).

    SQL twin: bucket = ``(CAST(key % 2^32 AS HUGEINT) * 2654435761) %
    2^32 % 100``, then CASE over cumulative fraction boundaries."""
    if sum(fractions.values()) != 100:
        raise ValueError(
            f"dataset_split: fractions sum to {sum(fractions.values())},"
            " need exactly 100")
    names = sorted(fractions)
    bounds = np.cumsum([fractions[n] for n in names]).astype(np.uint64)

    def assign(batch: pa.Table) -> pa.Table:
        keys = pc.fill_null(batch.column(key_col), 0).to_numpy(
            zero_copy_only=False)
        b = _bucket100(keys)
        idx = np.searchsorted(bounds, b, side="right")
        lab = pa.array(np.asarray(names, dtype=object)[idx],
                       pa.string())
        valid = pc.is_valid(batch.column(key_col))
        return batch.append_column(
            out, pc.if_else(valid, lab, pa.scalar(None, pa.string())))

    return ds.map_batches(assign, batch_format="pyarrow")


def doc_bigrams(
    ds: rd.Dataset,
    text_col: str = "text",
    group_col: str = "lang",
    delim: str = " ",
) -> rd.Dataset:
    """(group, bigram) rows — one per ADJACENT token pair per document
    (pairs never span documents), on the pinned single-space tokenizer.
    Fully vectorized: one ``split_pattern`` per batch, list offsets
    mark each doc's last token (no successor), and the pair strings are
    built by Arrow's C++ ``binary_join_element_wise`` over two
    offset-shifted takes — no Python string work, no shuffle. Null/
    empty docs contribute nothing. The base relation for bigram
    frequency / collocation stats (the LM-perplexity sibling that keeps
    raw pairs instead of a trained model)."""
    def bg(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, pattern=delim)
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        total = int(lens.sum())
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lens) - 1
        is_last[ends[lens > 0]] = True
        idx = np.flatnonzero(~is_last)
        pairs = pc.binary_join_element_wise(
            flat.take(pa.array(idx)), flat.take(pa.array(idx + 1)),
            delim)
        grp = t.column(group_col).take(
            pa.array(np.repeat(np.arange(len(t)), lens)[idx]))
        return pa.table({group_col: grp, "bigram": pairs})

    return ds.map_batches(bg, batch_format="pyarrow")


def bigram_diversity(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = " ",
) -> rd.Dataset:
    """Per-document lexical diversity at the bigram level: total
    adjacent-pair count, DISTINCT pair count, and their ratio — the
    distinct-n diversity signal (a low ratio flags template/boilerplate
    repetition; the per-doc dual of ``repetition_stats``).

    The ``doc_bigrams`` vectorized shape, finished per batch: every
    document's pairs are contiguous within its batch, so ONE Arrow C++
    hash-aggregate per batch computes exact per-doc distinct counts —
    no shuffle anywhere, the result streams one row per document.
    Diversity is a per-row division of exact ints (bit-exact
    cross-engine, no rounding). Docs with no bigram (< 2 tokens, null
    text) are omitted — mirror ``WHERE bg IS NOT NULL`` in a SQL twin."""
    def stats(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern(texts, pattern=delim)
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        total = int(lens.sum())
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lens) - 1
        is_last[ends[lens > 0]] = True
        idx = np.flatnonzero(~is_last)
        pairs = pc.binary_join_element_wise(
            flat.take(pa.array(idx)), flat.take(pa.array(idx + 1)),
            delim)
        ids = t.column(id_col).take(
            pa.array(np.repeat(np.arange(len(t)), lens)[idx]))
        per_pair = pa.table({id_col: ids, "bigram": pairs}) \
            .group_by([id_col, "bigram"]) \
            .aggregate([([], "count_all")])
        per_doc = per_pair.group_by(id_col).aggregate(
            [("count_all", "sum"), ([], "count_all")])
        n_bg = pc.cast(per_doc.column("count_all_sum"), pa.int64())
        n_di = pc.cast(per_doc.column("count_all"), pa.int64())
        div = pc.divide(pc.cast(n_di, pa.float64()),
                        pc.cast(n_bg, pa.float64()))
        return pa.table({id_col: per_doc.column(id_col),
                         "n_bigrams": n_bg, "n_distinct": n_di,
                         "diversity": div})

    return ds.map_batches(stats, batch_format="pyarrow")


def zipf_fit(
    ds: rd.Dataset,
    group_col: str,
    text_col: str,
    top_n: int = 1000,
) -> pd.DataFrame:
    """Zipf's-law fit per corpus group: OLS slope/intercept of
    ln(freq) against ln(rank) over the ``top_n`` most frequent tokens
    (rank by count desc, token asc — a total order, so the rank
    variable is cross-engine exact). Natural-language corpora sit
    near slope −1; a far-off slope flags boilerplate or spam — the
    corpus-health companion to the quality scorers.

    One vectorized token explode + one bucketed (group, token) count
    exchange + grouped top-k; the regression runs on the driver over
    ≤ top_n·|groups| rows. Frequencies are exact ints; the OLS
    moments accumulate in float → returned rounded (the reduction
    policy). Returns (group, slope, icept, n_terms) sorted."""
    from maestro_ray.ops.aggregates import bucketed_agg, grouped_topk

    def toks(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(group_col)),
                     pc.is_valid(t.column(text_col)))
        t = t.filter(ok)
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        split = pc.split_pattern(texts, pattern=" ")
        lens = pc.list_value_length(split) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        grp = t.column(group_col).take(
            pa.array(np.repeat(np.arange(len(t)), lens)))
        return pa.table({group_col: grp,
                         "term": pc.list_flatten(split)})

    counts = bucketed_agg(ds.map_batches(toks, batch_format="pyarrow"),
                          [group_col, "term"],
                          [(None, "count_all", "n")])
    top = grouped_topk(counts, group_col, "n", k=top_n,
                       tie_break=["term"]).to_pandas()
    if top.empty:
        return pd.DataFrame({
            group_col: pd.Series([], dtype="object"),
            "slope": pd.Series([], dtype="float64"),
            "icept": pd.Series([], dtype="float64"),
            "n_terms": pd.Series([], dtype="int64")})
    rows = []
    for g, sub in top.groupby(group_col, sort=True):
        sub = sub.sort_values(["n", "term"],
                              ascending=[False, True])
        y = np.log(sub["n"].to_numpy(np.float64))
        x = np.log(np.arange(1, len(sub) + 1, dtype=np.float64))
        mx, my = x.mean(), y.mean()
        varx = ((x - mx) ** 2).sum()
        slope = (((x - mx) * (y - my)).sum() / varx
                 if varx > 0 else np.nan)
        icept = my - slope * mx if varx > 0 else np.nan
        rows.append((g, round(float(slope), 6),
                     round(float(icept), 6), len(sub)))
    out = pd.DataFrame(rows, columns=[group_col, "slope", "icept",
                                      "n_terms"])
    out["n_terms"] = out["n_terms"].astype("int64")
    return out.reset_index(drop=True)


def collocations_pmi(
    ds: rd.Dataset,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    the 'New York' / 'machine learning' phrase-mining query:

        pmi(w1, w2) = ln( (c12/Nb) / ((c1/Nu) · (c2/Nu)) )

    with c12 the corpus bigram count, c1/c2 unigram counts, Nb/Nu the
    bigram/unigram totals, on the pinned single-space tokenizer (pairs
    never span documents).

    Plan, all distributed: ONE vectorized adjacent-pair flat map (the
    doc_bigrams offsets kernel, emitting w1/w2 separately), a bucketed
    pair count and a bucketed unigram count; unigram counts re-attach
    to surviving pairs (``min_count`` filter first) via two bucketed
    hash joins — the vocabulary can be corpus-sized and never lands on
    the driver; totals are two scalar aggregates. pmi is one fixed
    expression of exact integer counts, rounded to 6dp (ln across
    engines), ordered (pmi desc, w1, w2), local-top-k combined."""
    from maestro_ray.ops.aggregates import bucketed_agg, topk
    from maestro_ray.ops.joins import hash_join

    def pair_batch(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if len(texts) == 0 or pa.types.is_null(texts.type):
            # all-null batch → null-typed column, no utf8 kernels
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        toks = pc.split_pattern(texts, pattern=" ")
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        total = int(lens.sum())
        is_last = np.zeros(total, dtype=bool)
        ends = np.cumsum(lens) - 1
        is_last[ends[lens > 0]] = True
        idx = np.flatnonzero(~is_last)
        return pa.table({
            "w1": flat.take(pa.array(idx)),
            "w2": flat.take(pa.array(idx + 1)),
        })

    def tok_batch(t: pa.Table) -> pa.Table:
        texts = t.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if len(texts) == 0 or pa.types.is_null(texts.type):
            return pa.table({"tok": pa.array([], pa.string())})
        return pa.table(
            {"tok": pc.list_flatten(pc.split_pattern(texts,
                                                     pattern=" "))})

    nn = ds.map_batches(
        lambda t: t.select([text_col]).filter(
            pc.is_valid(t.column(text_col))),
        batch_format="pyarrow")
    bc = bucketed_agg(nn.map_batches(pair_batch, batch_format="pyarrow"),
                      ["w1", "w2"], [(None, "count_all", "c12")],
                      n_buckets=n_buckets).materialize()
    uc = bucketed_agg(nn.map_batches(tok_batch, batch_format="pyarrow"),
                      ["tok"], [(None, "count_all", "c")],
                      n_buckets=n_buckets).materialize()
    empty = pd.DataFrame({
        "w1": pd.Series([], dtype="object"),
        "w2": pd.Series([], dtype="object"),
        "c12": pd.Series([], dtype="int64"),
        "pmi": pd.Series([], dtype="float64")})
    if bc.count() == 0:
        return empty
    n_big = int(bc.sum("c12"))
    n_uni = int(uc.sum("c"))
    surv = bc.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c12"),
                                            int(min_count))),
        batch_format="pyarrow")
    from maestro_ray.ops.partition import compact_blocks
    surv = compact_blocks(surv.materialize())
    if surv.count() == 0:
        return empty

    def u_side(t: pa.Table, name: str) -> pa.Table:
        return pa.table({name: t.column("tok"),
                         f"c_{name}": t.column("c")})

    u1 = uc.map_batches(lambda t: u_side(t, "w1"),
                        batch_format="pyarrow")
    u2 = uc.map_batches(lambda t: u_side(t, "w2"),
                        batch_format="pyarrow")
    joined = hash_join(hash_join(surv, u1, "w1",
                                 num_buckets=n_buckets),
                       u2, "w2", num_buckets=n_buckets)

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c1 = t.column("c_w1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c2 = t.column("c_w2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pmi = np.log((c12 / n_big) / ((c1 / n_uni) * (c2 / n_uni)))
        return pa.table({
            "w1": t.column("w1"), "w2": t.column("w2"),
            "c12": t.column("c12"),
            "pmi": pa.array(np.round(pmi, 6), pa.float64()),
        })

    out = topk(joined.map_batches(score, batch_format="pyarrow"),
               "pmi", k, descending=True, tie_break=["w1", "w2"])
    if out.empty:
        return empty
    out["c12"] = out["c12"].astype("int64")
    return out[["w1", "w2", "c12", "pmi"]].reset_index(drop=True)


# ----------------------------------------------------- TextRank keywords


def keywords_textrank(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    damping: float = 0.85,
    iterations: int = 20,
) -> pd.DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, PAPERS.md
    family): rank tokens by weighted PageRank over the corpus's token
    co-occurrence graph and return the top ``k``.

    Plan, all distributed: the shared adjacent-pair flat map
    (``_explode_bigrams``, single-space tokenizer contract) feeds the
    edge stream; each pair is emitted in BOTH directions (TextRank's
    graph is undirected) and repeated co-occurrences simply stream
    again — multiplicity IS the edge weight, because the pagerank
    contribution pass sums per-edge r_u/deg_u with deg counted over
    the same multiset. Node ids are the int64 bit-view of the token
    content hash (the repo's groupby-safe idiom), so the vocabulary
    never shuffles as strings; the k winning labels are recovered with
    ONE filtered scan (np.isin against the k hashes) — the vocabulary
    never lands on the driver either. Fixed ``iterations`` rounds (the
    repo rule for float-iterative ops); ranks' last ulp is
    partitioning-dependent (inherent distributed float addition), so
    this op is pytest-oracled (numpy reference at 1e-9), not
    SQL-twinned.

    Returns (token, rank) ordered by rank desc, token asc."""
    from maestro_ray.ops.graph import pagerank
    from maestro_ray.ops.hashing import hash_array

    pairs = _explode_bigrams(ds, id_col, text_col)

    def to_edges(t: pa.Table) -> pa.Table:
        a = hash_array(t.column("w1")).view(np.int64)
        b = hash_array(t.column("w2")).view(np.int64)
        return pa.table({
            "a": pa.array(np.concatenate([a, b]), pa.int64()),
            "b": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    ranks = pagerank(pairs.map_batches(to_edges, batch_format="pyarrow"),
                     damping=damping, iterations=iterations)
    empty = pd.DataFrame({"token": pd.Series(dtype="object"),
                          "rank": pd.Series(dtype="float64")})
    if ranks.empty:
        return empty
    top = ranks.sort_values(["rank", "node"], ascending=[False, True],
                            kind="stable").head(k)
    want = top["node"].to_numpy(dtype=np.int64)

    def labels(t: pa.Table) -> pa.Table:
        tbl = t.filter(pc.is_valid(t.column(text_col)))
        texts = tbl.column(text_col).combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = (texts.chunk(0) if texts.num_chunks
                     else pa.array([], pa.string()))
        toks = pc.split_pattern(texts, " ").values if tbl.num_rows \
            else pa.array([], pa.string())
        toks = pc.unique(toks)
        h = hash_array(toks).view(np.int64) if len(toks) \
            else np.array([], dtype=np.int64)
        m = np.isin(h, want)
        return pa.table({"node": pa.array(h[m], pa.int64()),
                         "token": toks.filter(pa.array(m))})

    lab = pd.concat(
        [b.to_pandas() for b in ds.map_batches(
            labels, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow")],
        ignore_index=True) if len(want) else empty
    if lab.empty:
        return empty
    # a hash collision (two tokens, one node) is ~2^-64; keep the
    # lexicographically-first label deterministically if it ever fires
    lab = (lab.sort_values("token", kind="stable")
           .drop_duplicates("node").reset_index(drop=True))
    out = top.merge(lab, on="node", how="inner")
    out = out.sort_values(["rank", "token"], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
    return out[["token", "rank"]]
