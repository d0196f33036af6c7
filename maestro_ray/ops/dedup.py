"""Deduplication suite (SURVEY.md §2.G + training-data ops):
exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Ray-Data-first shapes (ray_guide 'Exact dedup / Near-dup'):

- **exact**: content-hash column (vectorized) → hash-partitioned
  groupby → deterministic winner (min id) per group.
- **MinHash-LSH**: per-batch vectorized shingle→minhash signatures →
  explode to (band_id, band_hash, doc_id) rows → groupby bands →
  candidate pairs (per-bucket emission capped; degenerate buckets emit
  a star) → exact-Jaccard verification via bucketed pairs⋈corpus hash
  joins → connected components by DISTRIBUTED min-label propagation.
  Nothing corpus-sized ever lands on the driver.
- **SimHash**: 64-bit weighted-sign fingerprint; candidate blocking by
  16-bit sub-blocks (any hamming-≤-k pair shares a block for k ≤ 3·…).
- **embedding near-dup**: random-hyperplane signature buckets →
  within-bucket pairwise cosine.

Scale notes: signatures/fingerprints are per-batch vectorized numpy;
the shuffles are the band/bucket groupbys (tiny int rows) and, for
MinHash verification, two hash joins that stream the corpus's text
through the bucket exchange once per endpoint.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from maestro_ray.ops.hashing import hash_array

_MERSENNE = np.uint64((1 << 61) - 1)
_WORD_RE = re.compile(r"\S+")


# ----------------------------------------------------------------- shingles


def _ids_int64(arr: pa.ChunkedArray | pa.Array, ctx: str, id_col: str
               ) -> np.ndarray:
    """Null-guarded int64 extraction of a doc-id column. astype(int64)
    on a null-bearing column folds every null onto INT64_MIN via NaN,
    silently collapsing all null-id docs into one fake id."""
    if arr.null_count:
        raise ValueError(
            f"{ctx}: {arr.null_count} null values in id column "
            f"{id_col!r}; drop or fill null ids before near-dedup"
        )
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (deterministic, order-sensitive)."""
    words = _WORD_RE.findall(text or "")
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(hash_array(pd.Series(shingles)))


def _split_words(col: pa.ChunkedArray | pa.Array
                 ) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Whitespace word split for a WHOLE string column at once, matching
    ``_WORD_RE.findall`` per doc (Arrow's split keeps empty boundary
    tokens — filtered here; nulls count as zero words).

    Returns ``(flat_words, doc_index_per_word, words_per_doc)``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    split = pc.utf8_split_whitespace(pc.fill_null(col, ""))
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    lens = pc.list_value_length(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(split)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    d = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.all():
        idx = np.flatnonzero(keep)
        flat = flat.take(pa.array(idx, pa.int64()))
        d = d[idx]
    counts = np.bincount(d, minlength=n).astype(np.int64)
    return flat, d, counts


def _batch_shingle_hashes(col: pa.ChunkedArray | pa.Array, k: int = 3
                          ) -> tuple[np.ndarray, np.ndarray]:
    """Word-k-shingle hashes for EVERY doc of a column in one pass.

    Returns ``(hashes, starts)``: each doc's ``_shingle_hashes`` result
    (sorted UNIQUE hashes, ≥1 entry per doc) concatenated in doc order,
    and each doc's segment start (int64, one per doc) for
    ``np.minimum.reduceat``-style per-doc folds. The within-doc dedup
    is one batch lexsort — it keeps the downstream permutation multiply
    proportional to unique shingles (repetitive docs would otherwise
    inflate it arbitrarily).

    This is the r3-VERDICT batch-level rewrite of the per-doc shingle
    loop: one Arrow whitespace split, one element-wise string join, one
    ``hash_array`` call per batch — no per-doc pandas Series.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    flat, d, counts = _split_words(col)
    parts_str: list[pa.Array] = []
    parts_doc: list[np.ndarray] = []
    total = len(flat)
    if total >= k:
        p = np.arange(total - k + 1, dtype=np.int64)
        p = p[d[p] == d[p + k - 1]]  # shingle fully inside one doc
        if len(p):
            words = [flat.take(pa.array(p + j, pa.int64()))
                     for j in range(k)]
            parts_str.append(pc.binary_join_element_wise(*words, " "))
            parts_doc.append(d[p])
    rest = np.flatnonzero(counts < k)  # short docs (incl. empty: "")
    if len(rest):
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        clean = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat)
        joined = pc.binary_join(clean.take(pa.array(rest, pa.int64())),
                                " ")
        parts_str.append(joined)
        parts_doc.append(rest)
    arrs = [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            for s in parts_str]
    strs = arrs[0] if len(arrs) == 1 else pa.concat_arrays(arrs)
    docs = parts_doc[0] if len(parts_doc) == 1 else np.concatenate(parts_doc)
    order = np.argsort(docs, kind="stable")
    hashes = hash_array(strs.take(pa.array(order, pa.int64())))
    seg = np.maximum(counts - k + 1, 1)
    # per-doc sorted unique (the _shingle_hashes contract), vectorized:
    # one lexsort over (doc, hash), drop within-doc duplicate runs
    d_sh = np.repeat(np.arange(n, dtype=np.int64), seg)
    o2 = np.lexsort((hashes, d_sh))
    hs, dss = hashes[o2], d_sh[o2]
    keep2 = np.empty(len(hs), dtype=bool)
    keep2[0] = True
    keep2[1:] = (hs[1:] != hs[:-1]) | (dss[1:] != dss[:-1])
    hashes = hs[keep2]
    seg = np.bincount(dss[keep2], minlength=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(seg[:-1], out=starts[1:])
    return hashes, starts


def _perm_params(n_hashes: int, seed: int = 17) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=n_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, (1 << 61) - 1, size=n_hashes, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_hashes,) uint64 minhash signature — fully vectorized."""
    with np.errstate(over="ignore"):
        # (n_hashes, n_shingles) permuted hashes mod Mersenne prime
        m = (a[:, None] * (shingles[None, :] & _MERSENNE) + b[:, None]) % _MERSENNE
    return m.min(axis=1)


def minhash_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 128,
    shingle_k: int = 3,
    n_bands: int = 32,
    seed: int = 17,
) -> pa.Table:
    """Per-batch stage: doc → (band_id, band_hash, doc_id) rows.

    Batch-vectorized (r3 VERDICT #2): one shingle split + one
    ``hash_array`` for the whole batch, signature mins via
    ``np.minimum.reduceat`` over per-doc segments (permutation matrix
    chunked to ~64 MB), band hashes via ONE pandas hash call over the
    band byte rows. Bit-identical to the former per-doc loop (same
    shingle strings, same hash, same band bytes)."""
    n_docs = batch.num_rows
    if n_docs == 0:
        return pa.table({
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.uint64()),
            "doc_id": pa.array([], pa.int64()),
        })
    a, b = _perm_params(n_hashes, seed)
    r = n_hashes // n_bands
    hashes, starts = _batch_shingle_hashes(batch.column(text_col), shingle_k)
    sh = hashes & _MERSENNE
    total = len(sh)
    sigs = np.empty((n_hashes, n_docs), dtype=np.uint64)
    chunk = max(1, min(n_hashes, int(64_000_000 // max(total * 8, 1))))
    with np.errstate(over="ignore"):
        for h0 in range(0, n_hashes, chunk):
            m = (a[h0:h0 + chunk, None] * sh[None, :]
                 + b[h0:h0 + chunk, None]) % _MERSENNE
            sigs[h0:h0 + chunk] = np.minimum.reduceat(m, starts, axis=1)
    band_rows = np.ascontiguousarray(sigs.T).reshape(n_docs * n_bands, r)
    buf = band_rows.tobytes()
    rb = r * 8
    bh = hash_array(pd.Series(
        [buf[i * rb:(i + 1) * rb] for i in range(n_docs * n_bands)]))
    ids = _ids_int64(batch.column(id_col), "minhash_batch", id_col)
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(n_bands, dtype=np.int32), n_docs)),
            "band_hash": pa.array(bh, pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
        }
    )


def jaccard(text_a: str, text_b: str, shingle_k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, shingle_k).tolist())
    sb = set(_shingle_hashes(text_b, shingle_k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _min_label_components(edges: rd.Dataset, max_rounds: int = 10) -> rd.Dataset:
    """Connected components of a (a, b) edge Dataset; returns the
    (node, label) DATASET of nodes that appear in any edge (every other
    node is its own rep), label = the component's minimum id.

    Since r3 this DELEGATES to ``ops/graph.connected_components`` —
    edge contraction with pointer-doubling closure and a guarded
    driver union-find fast path. The previous per-round
    join-propagation loop here stalled at sf0.1: every round's
    hash_join DOUBLED the labels' block count (the measured 24→768
    explosion, see ops/graph.py) and its changed-count was a further
    join per round — dedup_near went from a 17-minute hang to seconds
    on the same 7k-pair graph. The RuntimeError-on-no-convergence
    contract is preserved by the delegate."""
    from maestro_ray.ops.graph import connected_components

    return connected_components(edges, "a", "b", max_rounds=max_rounds)


def dedup_near_minhash(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = 128,
    n_bands: int = 32,
    shingle_k: int = 3,
    max_bucket: int = 64,
    component_rounds: int = 64,
    assign_broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """D4: MinHash-LSH near-dup clusters, fully distributed.

    Returns a Dataset (doc_id, cluster_rep); docs in no near-dup pair
    map to themselves. No whole-corpus driver materialization anywhere:
    candidate pairs stay a Dataset, verification texts arrive via two
    bucketed hash joins of the pairs against the corpus (never a
    broadcast id-set rescan), components run as distributed min-label
    propagation, and the final (node → representative) assignment is a
    bucketed LEFT-OUTER hash join of the labels Dataset onto the id
    column (fill-self on miss). Only when the label table is provably
    small (≤ ``assign_broadcast_limit`` rows, ≈32 MB of int pairs at
    the 2M default) is it collected and broadcast instead — the join
    exchange costs more than a dictionary lookup at that size. Set
    ``assign_broadcast_limit=0`` to force the distributed path.

    ``max_bucket`` caps per-bucket pair emission: a bucket with more
    than ``max_bucket`` members (degenerate — e.g. N identical docs)
    emits a STAR to its min id PLUS a consecutive-id CHAIN (so the
    bucket stays connected through verification even when the min-id
    doc is a band-hash false positive) PLUS BINARY-JUMP edges
    (ids[i]—ids[i+2^k]) so the surviving graph's diameter is O(log N)
    rather than N — ~N·log₂N edges total instead of N²/2.
    ``component_rounds`` bounds min-label propagation: with the jump
    edges, 64 rounds covers a degenerate bucket of ~2^60 genuine dups;
    if verification knocks out enough jump edges to stretch the
    diameter past the bound, the failure is LOUD (RuntimeError from
    ``_min_label_components``), never a silently split cluster.
    """
    bands = ds.map_batches(
        lambda t: minhash_batch(
            t, text_col, id_col, n_hashes, shingle_k, n_bands
        ),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = sorted(set(g.column("doc_id").to_pylist()))
        n = len(ids)
        if n < 2:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        a_out, b_out = [], []
        if n > max_bucket:
            # degenerate bucket: STAR to the min id plus a CHAIN of
            # consecutive ids plus BINARY-JUMP edges (i, i+2^k) —
            # O(n·log n) edges instead of n²/2. The chain keeps the
            # bucket connected even when the min-id doc is a band-hash
            # false positive that verification rejects (a star alone
            # would then shatter the true cluster); the jumps keep the
            # surviving diameter O(log n) so min-label propagation
            # converges within component_rounds even when the star
            # center drops out. A member only detaches if ALL its
            # star/chain/jump edges fail exact-Jaccard, i.e. it wasn't
            # a near-dup of its neighbors anyway.
            a_out = [ids[0]] * (n - 1) + ids[1:-1]
            b_out = ids[1:] + ids[2:]
            step = 2  # chain already covers stride 2^0
            while step < n:
                a_out.extend(ids[: n - step])
                b_out.extend(ids[step:])
                step <<= 1
        else:
            for i in range(n):
                for j in range(i + 1, n):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})

    from maestro_ray.ops.aggregates import bucketed_distinct

    pairs = bucketed_distinct(  # pairs recur per band; distinct them
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow"),
        ["a", "b"],
    ).materialize()

    def self_map(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "cluster_rep": t.column(id_col),
        })

    ids_ds = ds.select_columns([id_col])
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ids_ds.map_batches(self_map, batch_format="pyarrow")

    # verification: texts reach their pairs via two bucketed hash joins
    # (pairs ⋈ corpus on a, then on b) — the corpus streams through the
    # join exchange, never onto the driver. When the candidate set is
    # SMALL (the common case: LSH prunes hard), broadcast its endpoint
    # ids and FILTER the corpus before the joins — a map instead of a
    # corpus-wide exchange (measured 2x on the whole sf0.1 pipeline);
    # at 100 TB this is the difference between shuffling the corpus
    # twice and touching only the candidate docs. The broadcast is
    # guarded: past the limit, fall back to the full joins.
    from maestro_ray.ops.joins import hash_join
    from maestro_ray.ops.partition import compact_blocks

    docs = ds
    nb = 32
    if n_pairs <= assign_broadcast_limit:
        # vectorized endpoint dedup: pc.unique in C++ over the
        # concatenated a/b columns — a Python set would box up to
        # 2·limit ints on the driver (hundreds of MB transient at the
        # 2M guard) for the same result
        cols = [c for t in ray.get(pairs.to_arrow_refs())
                if t.num_rows
                for c in (t.column("a"), t.column("b"))]
        endpoints = pc.unique(pa.chunked_array(
            [chunk for col in cols for chunk in
             (col.chunks if isinstance(col, pa.ChunkedArray) else [col])]
        ))
        ep_ref = ray.put(pc.cast(endpoints, pa.int64()))

        def only_candidates(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column(id_col),
                                     value_set=ray.get(ep_ref)))

        # materialize + rebound blocks: the filter leaves one shard of
        # near-empty blocks per corpus block, and the chained lazy
        # joins re-derive the filter plan per schema probe — measured
        # 6.2 s -> 2.9 s on the sf0.1 verify stage
        docs = compact_blocks(
            ds.map_batches(only_candidates,
                           batch_format="pyarrow").materialize())
        nb = 4  # tiny sides: fewer buckets, less per-bucket overhead

    docs_a = docs.map_batches(
        lambda t: t.select([id_col, text_col]).rename_columns(["a", "__ta"]),
        batch_format="pyarrow",
    )
    docs_b = docs.map_batches(
        lambda t: t.select([id_col, text_col]).rename_columns(["b", "__tb"]),
        batch_format="pyarrow",
    )
    withtext = hash_join(hash_join(pairs, docs_a, keys="a", num_buckets=nb),
                         docs_b, keys="b", num_buckets=nb)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(["a", "b"])
        # batch-level shingling (one split+hash per side; segments come
        # back sorted unique), per-pair exact Jaccard over the hashed
        # segments — same math as ``jaccard``
        ha, sa = _batch_shingle_hashes(t.column("__ta"), shingle_k)
        hb, sb = _batch_shingle_hashes(t.column("__tb"), shingle_k)
        ea = np.append(sa[1:], len(ha))
        eb = np.append(sb[1:], len(hb))
        keep = np.empty(t.num_rows, dtype=bool)
        for i in range(t.num_rows):
            a_set = ha[sa[i]:ea[i]]
            b_set = hb[sb[i]:eb[i]]
            inter = np.intersect1d(a_set, b_set, assume_unique=True).size
            union = a_set.size + b_set.size - inter
            keep[i] = inter / max(1, union) >= threshold
        return t.filter(pa.array(keep)).select(["a", "b"])

    edges = withtext.map_batches(verify, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ids_ds.map_batches(self_map, batch_format="pyarrow")
    labels = _min_label_components(edges, max_rounds=component_rounds)

    if labels.count() <= assign_broadcast_limit:
        # small label table: collect + broadcast beats a join exchange
        rep_map: dict = {}
        for t in ray.get(labels.to_arrow_refs()):
            if t.num_rows == 0:  # empty blocks can drop the schema
                continue
            rep_map.update(
                zip(t.column("node").to_pylist(), t.column("label").to_pylist())
            )
        rep_ref = ray.put(rep_map)

        def assign(t: pa.Table) -> pa.Table:
            m = ray.get(rep_ref)
            ids = t.column(id_col).to_pylist()
            return pa.table({
                id_col: t.column(id_col),
                "cluster_rep": pa.array(
                    [m.get(i, i) for i in ids], pa.int64()
                ),
            })

        return ids_ds.map_batches(assign, batch_format="pyarrow")

    # distributed assignment: bucketed LEFT-OUTER join of the labels
    # Dataset onto the corpus ids, fill-self on miss — nothing
    # O(clustered docs) ever lands on the driver
    lab = labels.map_batches(
        lambda t: t.rename_columns([id_col, "cluster_rep"]),
        batch_format="pyarrow",
    )
    joined = hash_join(ids_ds, lab, keys=id_col, join_type="left outer")

    def fill_self(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(
            pc.cast(t.column("cluster_rep"), pa.int64()),
            pc.cast(t.column(id_col), pa.int64()),
        )
        return pa.table({id_col: t.column(id_col), "cluster_rep": rep})

    return joined.map_batches(fill_self, batch_format="pyarrow")


# ------------------------------------------------------------------ simhash


def simhash_batch(batch: pa.Table, text_col: str = "text",
                  out_col: str = "simhash") -> pa.Table:
    """64-bit SimHash fingerprint per doc (token-count weighted signs).

    Batch-vectorized (r3 VERDICT #2): one word split + one
    ``hash_array`` over every token in the batch; bit j of a doc is set
    iff more than half its tokens have bit j set (Σ±1 > 0 ⟺
    2·ones > count — weighting by multiplicity is summing over
    occurrences), folded per doc with 64 ``np.bincount`` passes. Bit-
    identical to the former per-doc unique-words loop."""
    n = batch.num_rows
    out = np.zeros(n, dtype=np.uint64)
    if n:
        flat, d, counts = _split_words(batch.column(text_col))
        if len(d):
            h = hash_array(flat)
            c2 = counts.astype(np.float64)
            for j in range(64):
                ones = np.bincount(
                    d,
                    weights=((h >> np.uint64(j)) & np.uint64(1)
                             ).astype(np.float64),
                    minlength=n)
                out |= (2.0 * ones > c2).astype(np.uint64) << np.uint64(j)
    return batch.append_column(out_col, pa.array(out, pa.uint64()))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POP_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (byte LUT — numpy 1.x
    has no bitwise_count)."""
    return _POP_LUT[np.ascontiguousarray(x).view(np.uint8)
                    .reshape(x.size, 8)].sum(axis=1).astype(np.int64)


def dedup_near_simhash(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> rd.Dataset:
    """SimHash near-dup pairs via 16-bit block LSH: a pair with hamming
    ≤ 3 must agree on at least one of the four 16-bit blocks.

    Returns a DATASET of distinct (a, b) pairs (a < b), hamming-verified
    — never a driver DataFrame. Within a block group, pairwise hamming
    runs as one vectorized XOR + byte-LUT popcount over the group's
    uint64 array, no Python pair loop. A degenerate block with more
    than ``max_bucket`` members (e.g. every empty text → simhash 0)
    emits only STAR + CHAIN candidates — 2(n−1) hamming-checked edges,
    O(n) work and output — instead of n²/2; the surviving pair set
    still connects the block's true near-dup cluster (same capping
    argument as ``dedup_near_minhash``), it just doesn't enumerate
    every within-cluster pair.
    """
    fp = ds.map_batches(
        lambda t: simhash_batch(t, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow",
    )

    def explode_blocks(t: pa.Table) -> pa.Table:
        sh = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = _ids_int64(t.column(id_col), "dedup_near_simhash", id_col)
        n = len(ids)
        keys = np.empty(4 * n, dtype=np.int64)
        for blk in range(4):
            keys[blk * n : (blk + 1) * n] = (
                (sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        return pa.table({
            "block": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
            "key": pa.array(keys, pa.int64()),
            id_col: pa.array(np.tile(ids, 4), pa.int64()),
            "simhash": pa.array(np.tile(sh, 4), pa.uint64()),
        })

    empty_pairs = pa.table({
        "a": pa.array([], pa.int64()),
        "b": pa.array([], pa.int64()),
    })

    def block_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        n = len(ids)
        if n < 2:
            return empty_pairs
        if n > max_bucket:
            # degenerate block: star to min id + consecutive-id chain
            ii = np.concatenate([
                np.zeros(n - 1, dtype=np.int64),
                np.arange(1, n - 1, dtype=np.int64),
            ])
            jj = np.concatenate([
                np.arange(1, n, dtype=np.int64),
                np.arange(2, n, dtype=np.int64),
            ])
        else:
            ii, jj = np.triu_indices(n, k=1)
        d = _popcount64(sh[ii] ^ sh[jj])
        # a == b possible only if the input repeats a doc_id; drop it
        keep = (d <= max_hamming) & (ids[ii] != ids[jj])
        return pa.table({
            "a": pa.array(ids[ii[keep]], pa.int64()),
            "b": pa.array(ids[jj[keep]], pa.int64()),
        })

    from maestro_ray.ops.aggregates import bucketed_distinct

    return bucketed_distinct(  # pairs recur per block; distinct them
        fp.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby(["block", "key"])
        .map_groups(block_pairs, batch_format="pyarrow"),
        ["a", "b"],
    )


# ------------------------------------------------------- embedding near-dup


def embedding_near_dup(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 23,
    dim: int | None = None,
) -> pd.DataFrame:
    """Near-duplicate vectors: random-hyperplane bucket LSH + exact
    within-bucket cosine. Returns verified pairs (a, b, cosine)."""
    first = None
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    planes_ref = ray.put(planes)
    bits = np.arange(n_planes, dtype=np.uint64)

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        emb = np.asarray(t.column(emb_col).to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.clip(norms, 1e-12, None)
        signs = (emb @ pl) > 0
        bucket = (signs.astype(np.uint64) << bits[None, :]).sum(axis=1)
        flat = [emb[i].tobytes() for i in range(len(emb))]
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            id_col: t.column(id_col),
            "vec": pa.array(flat, pa.binary()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_pylist()
        vecs = np.stack([
            np.frombuffer(b, dtype=np.float32) for b in g.column("vec").to_pylist()
        ])
        sims = vecs @ vecs.T
        a_o, b_o, s_o = [], [], []
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if sims[i, j] >= threshold:
                    a_o.append(ids[i])
                    b_o.append(ids[j])
                    s_o.append(round(float(sims[i, j]), 6))
        return pa.table({
            "a": pa.array(a_o, pa.int64()),
            "b": pa.array(b_o, pa.int64()),
            "cosine": pa.array(s_o, pa.float64()),
        })

    out = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty or "a" not in out.columns:  # empty Ray result loses schema
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    return (
        out.drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- n-gram Jaccard (exact)


def _shingle_strings(text: str, k: int = 3) -> list[str]:
    """DISTINCT word k-shingles as strings (SQL-replicable: words are
    \\S+ runs, shingles joined with single spaces)."""
    words = _WORD_RE.findall(text or "")
    if len(words) < k:
        return [" ".join(words)] if words else []
    return sorted({" ".join(words[i : i + k]) for i in range(len(words) - k + 1)})


def _roll31(s: str, p: int = 1_000_000_007) -> int:
    """Code-point rolling hash mod p — identical fold to DuckDB's
    list_reduce twin (see __ray_entry__ fingerprint oracle)."""
    if not s:
        return 0
    h = ord(s[0])
    for c in s[1:]:
        h = (h * 31 + ord(c)) % p
    return h


def _roll31_batch(strs: list[str], p: int = 1_000_000_007) -> np.ndarray:
    """Vectorized ``_roll31`` over many strings: front-zero-padded
    code-point matrix × precomputed 31^k-mod-p powers (leading zeros
    contribute nothing to the polynomial). Every intermediate < 2^36 —
    int64-exact, value-identical to the scalar fold. The per-char
    Python loop was the dominant cost of the n-gram join (~45 s →
    sub-second hashing for 1.5 M shingles at sf0.1)."""
    n = len(strs)
    if n == 0:
        return np.empty(0, np.int64)
    enc = [s.encode("utf-32-le") for s in strs]
    lens = np.fromiter((len(b) >> 2 for b in enc), np.int64, n)
    max_len = int(lens.max())
    if max_len == 0:
        return np.zeros(n, np.int64)
    m = np.zeros((n, max_len), np.int64)
    for i, b in enumerate(enc):
        if b:
            cp = np.frombuffer(b, np.uint32)
            m[i, max_len - len(cp):] = cp
    pw = np.ones(max_len, np.int64)
    for k in range(max_len - 2, -1, -1):
        pw[k] = (pw[k + 1] * 31) % p
    return ((m * pw[None, :]) % p).sum(axis=1) % p


def dedup_ngram_jaccard(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> rd.Dataset:
    """EXACT n-gram Jaccard similarity join, fully distributed.

    The classic inverted-index all-pairs plan: explode each doc to its
    DISTINCT shingle hashes → groupby shingle → emit co-occurring doc
    pairs → groupby (a, b) counts intersections → join per-doc shingle
    counts (bucketed hash joins — the size table is corpus-sized, never
    broadcast) → Jaccard = |∩| / (|A| + |B| − |∩|), filter ≥ threshold.
    Unlike MinHash-LSH this is exact (no bands, no verification pass)
    at the cost of shuffling one row per (shingle, doc) — use it below
    ~10^8 shingle-doc pairs; LSH above.

    Shingle identity is the SQL-replicable rolling hash (mod 1e9+7) of
    the shingle STRING, so the DuckDB oracle joins on the identical
    key — hash collisions (p ≈ 2^30) affect both sides identically.

    Returns a Dataset (a, b, jaccard) with a < b, jaccard rounded 6dp.
    """
    from maestro_ray.ops.joins import hash_join

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        all_strs: list[str] = []
        doc_of: list[int] = []
        for i, text in enumerate(t.column(text_col).to_pylist()):
            ss = _shingle_strings(text, shingle_k)
            all_strs.extend(ss)
            doc_of.extend([i] * len(ss))
        hashes = _roll31_batch(all_strs)
        # distinct on the HASH (not the string): the SQL twin's
        # DISTINCT(doc_id, sh) dedups post-hash, so an intra-doc hash
        # collision must collapse identically on both sides
        ids_out, out_h = [], []
        per_doc: dict[int, set] = {}
        for j, d in enumerate(doc_of):
            per_doc.setdefault(d, set()).add(int(hashes[j]))
        for d, hs in per_doc.items():
            ids_out.extend([ids[d]] * len(hs))
            out_h.extend(sorted(hs))
        return pa.table({
            "sh": pa.array(out_h, pa.int64()),
            id_col: pa.array(ids_out, pa.int64()),
        })

    shingles = ds.map_batches(explode, batch_format="pyarrow").materialize()

    sizes = (
        shingles.groupby(id_col).count()
        .map_batches(
            lambda t: t.rename_columns([id_col, "n"]), batch_format="pyarrow"
        )
        .materialize()  # consumed twice (na + nb join sides)
    )

    # co-occurrence pairs via a bucketed SELF-JOIN on the shingle hash —
    # exactly the SQL twin's plan, and every per-row step runs in C++
    # join/aggregate kernels (a groupby("sh").map_groups pair emitter
    # was measured 40x slower: one Python call per shingle group, and
    # almost every group has a single member). When every id fits in
    # 31 bits the (a, b) pair key is PACKED into one int64 so the
    # intersection count is a single-key groupby — the two-column sort
    # shuffle was measured 4x slower; ids ≥ 2^31 (plausible at 100-TB
    # corpus scale) fall back to the two-column groupby rather than
    # silently corrupting the packed key.
    sh_a = shingles.map_batches(
        lambda t: t.rename_columns(["sh", "a"]), batch_format="pyarrow"
    )
    sh_b = shingles.map_batches(
        lambda t: t.rename_columns(["sh", "b"]), batch_format="pyarrow"
    )
    from maestro_ray.ops.joins import hash_join as _hj

    from ray.data.aggregate import Max as _Max, Min as _Min

    bounds = shingles.aggregate(_Min(id_col), _Max(id_col))  # ONE pass
    if not bounds:  # empty corpus: Ray may return an empty/None result
        min_id = max_id = None
    else:
        # index (not .get): an aggregate-key rename must fail LOUDLY,
        # not silently route big ids down the 31-bit packed path
        min_id = bounds[f"min({id_col})"]
        max_id = bounds[f"max({id_col})"]
    packable = (
        max_id is None  # empty corpus — path choice is moot
        or (0 <= min_id and max_id < (1 << 31))
    )

    def pack_pairs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a < b
        return pa.table({
            "pk": pa.array((a[keep] << 31) | b[keep], pa.int64())
        })

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "a": pa.array(pk >> 31, pa.int64()),
            "b": pa.array(pk & ((1 << 31) - 1), pa.int64()),
            "inter": t.column("inter"),
        })

    def pair_cols(t: pa.Table) -> pa.Table:
        a = t.column("a")
        b = t.column("b")
        keep = pc.less(a, b)
        return pa.table({"a": a.filter(keep), "b": b.filter(keep)})

    # pair cardinality is O(co-occurring doc pairs) — 1.1M at sf0.1 —
    # which collapses Ray's range-sorted groupby; the bucketed exchange
    # cut this stage 8.7 s -> ~1 s (see bucketed_agg's scale notes)
    from maestro_ray.ops.aggregates import bucketed_agg

    joined_pairs = _hj(sh_a, sh_b, keys="sh")
    if packable:
        inter = bucketed_agg(
            joined_pairs.map_batches(pack_pairs, batch_format="pyarrow"),
            "pk", [(None, "count_all", "inter")],
        ).map_batches(unpack, batch_format="pyarrow")
    else:
        inter = bucketed_agg(
            joined_pairs.map_batches(pair_cols, batch_format="pyarrow"),
            ["a", "b"], [(None, "count_all", "inter")],
        )

    # Jaccard needs |A| and |B| per pair. `sizes` is one int per DOC —
    # O(docs), not O(corpus bytes) — so broadcast it while it fits
    # comfortably (≤ 2M docs ≈ 32 MB); beyond that fall back to the
    # fully distributed bucketed joins.
    def jacc_from_sizes(t: pa.Table, size_map) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        i = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        na_ = np.array([size_map[x] for x in a.tolist()], dtype=np.float64)
        nb_ = np.array([size_map[x] for x in b.tolist()], dtype=np.float64)
        union = na_ + nb_ - i
        j = i / np.maximum(union, 1)
        # filter on the UNROUNDED ratio (as the SQL twin does), round
        # only the reported value — and round HALF-AWAY-FROM-ZERO like
        # SQL round(); np.round's half-to-even differs on exact 7th-
        # decimal ties (e.g. 65/128 → .507813 vs np's .507812)
        keep = j >= threshold
        return pa.table({
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "jaccard": pa.array(np.floor(j[keep] * 1e6 + 0.5) / 1e6,
                                pa.float64()),
        })

    if sizes.count() <= 2_000_000:
        tabs = [t for t in ray.get(sizes.to_arrow_refs()) if t.num_rows]
        smap = {}
        for t in tabs:
            smap.update(zip(t.column(id_col).to_pylist(),
                            t.column("n").to_pylist()))
        smap_ref = ray.put(smap)
        return inter.map_batches(
            lambda t, _r=smap_ref: jacc_from_sizes(t, ray.get(_r)),
            batch_format="pyarrow",
        )

    na = sizes.map_batches(
        lambda t: t.rename_columns(["a", "na"]), batch_format="pyarrow"
    )
    nb = sizes.map_batches(
        lambda t: t.rename_columns(["b", "nb"]), batch_format="pyarrow"
    )
    joined = hash_join(hash_join(inter, na, keys="a"), nb, keys="b")

    def jacc(t: pa.Table) -> pa.Table:
        i = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        union = (
            t.column("na").to_numpy(zero_copy_only=False)
            + t.column("nb").to_numpy(zero_copy_only=False)
            - i
        )
        j = i / np.maximum(union, 1)
        keep = j >= threshold
        return pa.table({
            "a": t.column("a").filter(pa.array(keep)),
            "b": t.column("b").filter(pa.array(keep)),
            "jaccard": pa.array(np.floor(j[keep] * 1e6 + 0.5) / 1e6,
                                pa.float64()),
        })

    return joined.map_batches(jacc, batch_format="pyarrow")
