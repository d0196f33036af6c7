"""Partitioning, combiner pre-reduce, hot-key handling (ops U1, U2, U6).

The one big shuffle per epoch is ``groupby("p")`` where
``p = hash64(url) % P``. Two explicit skew defenses (BASELINE.json
north_rule: "partitioning / shuffle / skew handled explicitly"):

1. **Combiner pre-reduce** (always on): LWW winner-selection is
   associative, so each ``map_batches`` task reduces its batch to at
   most one row per url *before* the shuffle. A url with 10^6 churn
   events spread over B batches ships at most B rows through the
   exchange instead of 10^6 — this is the groupby-partial-aggregation
   pattern applied to merge.
2. **Salted sub-partitioning** (opt-in for pathological skew): route by
   ``hash(url ‖ salt) % P`` where ``salt = offset % n_salts`` for urls
   in a detected hot set, pre-reduce per salted group, then run the
   final (tiny) merge on the true partition key. Exactness follows from
   associativity of LWW max.
"""

from __future__ import annotations

import contextlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from maestro_ray.ops.hashing import hash_array, partition_ids

_U64 = np.uint64


def lww_reduce(
    batch: pa.Table,
    key: str = "url",
    ts_col: str = "warc_ts",
    seq_col: str = "offset",
) -> pa.Table:
    """Keep only the max-(ts, seq) row per key — vectorized.

    Sorts the batch by (key, ts, seq) ascending and keeps each key's
    last row. Associative: reducing partial reductions gives the same
    winners as reducing everything at once, so this is safe both as a
    per-batch combiner and as the final per-partition step.
    """
    if batch.num_rows == 0:
        return batch
    idx = pc.sort_indices(
        batch,
        sort_keys=[(key, "ascending"), (ts_col, "ascending"), (seq_col, "ascending")],
    )
    s = batch.take(idx)
    # Arrow-native key-boundary detection: adjacent-slice not_equal on
    # the sorted key column stays in C++ kernels end to end — the
    # previous pandas object-array round-trip materialized every key as
    # a Python str in the hottest per-batch combiner of the ingest path.
    # Null keys need explicit handling: pc.not_equal(x, null) is null,
    # which a bare bool cast would read as "no boundary" and silently
    # drop the last non-null key's winner. A boundary exists iff the
    # values differ OR exactly one side is null.
    kcol = s.column(key)
    arr = kcol.combine_chunks() if kcol.num_chunks != 1 else kcol.chunk(0)
    n = len(arr)
    last = np.ones(n, dtype=bool)
    if n > 1:
        a, b = arr.slice(1), arr.slice(0, n - 1)
        neq = pc.fill_null(pc.not_equal(a, b), False)
        one_null = pc.xor(pc.is_null(a), pc.is_null(b))
        last[:-1] = pc.or_(neq, one_null).to_numpy(zero_copy_only=False)
    return s.filter(pa.array(last))


def add_partition_column(
    batch: pa.Table,
    num_partitions: int,
    key: str = "url",
    hot_keys: set | None = None,
    n_salts: int = 8,
) -> pa.Table:
    """U1: append ``p`` (int32). Hot keys are salted across ``n_salts``
    sub-partitions derived from ``offset`` (requires a later final merge
    on the true key — see ``pipelines.ingest``)."""
    keys = batch.column(key)
    p = partition_ids(keys, num_partitions)
    if hot_keys:
        kvals = keys.to_pandas().to_numpy(dtype=object)
        hot = np.isin(kvals, list(hot_keys))
        if hot.any():
            offs = batch.column("offset").to_numpy(zero_copy_only=False).astype(np.int64)
            salt = (offs % n_salts).astype(np.uint64)
            with np.errstate(over="ignore"):
                salted = (
                    (hash_array(keys) ^ (salt * _U64(0x9E3779B97F4A7C15)))
                    % _U64(num_partitions)
                ).astype(np.int32)
            p = np.where(hot, salted, p)
    return batch.append_column("p", pa.array(p, pa.int32()))


def hot_key_counts(ds, key: str = "url", sample_fraction: float = 0.05, seed: int = 7):
    """U6: approximate per-key churn counts from a sample (small output).

    Returns a pandas DataFrame (key, n) sorted descending. Run on the
    changelog Dataset BEFORE the shuffle; keys whose sampled count
    exceeds a threshold go into the ``hot_keys`` set for salting.
    """
    import pandas as pd

    def count_batch(batch: pa.Table) -> pa.Table:
        vc = batch.column(key).to_pandas().value_counts()
        return pa.table({key: vc.index.astype(str), "n": vc.to_numpy()})

    sampled = ds if sample_fraction >= 1.0 else ds.random_sample(sample_fraction, seed=seed)
    partials = sampled.map_batches(count_batch, batch_format="pyarrow")
    agg = partials.groupby(key).sum("n")
    pdf = agg.to_pandas()
    ncol = "sum(n)" if "sum(n)" in pdf.columns else "n"
    return (
        pdf.rename(columns={ncol: "n"})
        .sort_values(["n", key], ascending=[False, True])
        .reset_index(drop=True)
    )


def detect_hot_keys(ds, key: str = "url", threshold: int = 1000,
                    sample_fraction: float = 0.05, seed: int = 7) -> set:
    """Keys whose estimated total count exceeds ``threshold``."""
    pdf = hot_key_counts(ds, key, sample_fraction, seed)
    est = pdf["n"] / max(sample_fraction, 1e-9)
    return set(pdf.loc[est > threshold, key])


def compact_blocks(ds, min_blocks: int = 8):
    """Re-bound a materialized Dataset's block count by BYTES (64 MB
    target). Iterative plans NEED this: ``hash_join`` output carries
    the union of both sides' blocks, so block count DOUBLES per
    iteration (measured 24→768 blocks over 5 rounds on a 16-row table
    — ops/graph.py), and per-iteration passes over a many-tiny-block
    Dataset pay task-launch costs per block. No-op when the count is
    already within 2× of the byte-sized target."""
    target = max(min_blocks, int(ds.size_bytes() / (64 << 20)))
    if ds.num_blocks() >= 2 * target:
        ds = ds.repartition(target).materialize()
    return ds


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count with a safe fallback — THE one copy (the
    same snippet had drifted into four call sites: exchange writer,
    merge grouping, block sizing, changelog reads; review r5)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        pass
    return default


def cut_lineage(ds):
    """Truncate a Dataset's retained logical-plan history by
    rebuilding it from its materialized object-store blocks
    (zero-copy refs — Spark ``checkpoint()`` semantics).

    Ray keeps the FULL upstream logical plan through
    ``materialize()``, and it is retained per REFERENCE: an iterative
    loop whose round output consumes the previous round's
    materialized state through MORE than one lineage path (state +
    frontier, degrees + both join probes, ...) therefore DOUBLES the
    retained plan per round. Measured (r5): the partitioned SSSP loop
    ran 0.5 s/round flat for block counts and exchange volume yet
    doubled in wall time every round (≈2^r — a 15-row path graph blew
    a 300 s timeout by round 13); rebuilding via ``from_arrow_refs``
    restores 0.5 s/round flat. ``compact_blocks`` alone does NOT fix
    it — the plan history, not the block count, is what grows.

    Tradeoff: the rebuilt Dataset cannot re-derive lost blocks from
    lineage (exactly Spark's checkpoint contract) — the right trade
    for per-round iterative state, whose upstream rounds are gone
    anyway."""
    import ray.data as rd

    return rd.from_arrow_refs(ds.materialize().to_arrow_refs())


def checkpoint_state(ds, min_blocks: int = 8):
    """THE per-round treatment for iterative Dataset loops:
    materialize + byte-sized block rebound (``compact_blocks``) +
    lineage cut (``cut_lineage``). Use on every Dataset a loop
    carries into its next round."""
    return cut_lineage(compact_blocks(ds.materialize(), min_blocks))


def sized_read_blocks(paths, columns=None,
                      wide_shuffle: bool = False) -> int:
    """THE shared block-sizing rule for parquet reads that feed
    shuffles/joins — the measured rule lifted out of per-op
    ``override_num_blocks`` constants (BASELINE.md r4 s2/s3, both
    directions):

    - *tiny tables want FEW blocks*: Ray's ~200-block read floor
      shatters a 600 KB table into 312-row blocks and a downstream
      bucketed shuffle pays seconds of pure per-block overhead
      (merge_into: 8 s → 1.0 s at 8 blocks);
    - *big shuffles want parallelism*: when the downstream exchange
      EXPANDS the payload (pair explosion, distinct exchange), floor
      at the cluster CPU count instead of the (small) input bytes
      (outlier_iqr's 594k-pair distinct exchange: 18.8 s at 8 blocks,
      ~10.4 s at the default, 7.8 s at 32).

    Sizing is by PRUNED payload bytes (column-chunk sums from the
    parquet footers) when ``columns`` is given — full-file bytes
    would shatter a narrow scan into near-empty blocks. Pass
    ``wide_shuffle=True`` when the op's exchange volume is decoupled
    from (larger than) its input bytes. ``paths`` may be a file, a
    directory, or a list of files."""
    import os

    from maestro_ray.io.changelog import _num_read_blocks

    if isinstance(paths, str):
        if os.path.isdir(paths):
            paths = [os.path.join(paths, f)
                     for f in sorted(os.listdir(paths))
                     if f.endswith(".parquet")]
        else:
            paths = [paths]
    base = _num_read_blocks(list(paths), columns)
    if not wide_shuffle:
        return base
    return max(base, cluster_cpus())


@contextlib.contextmanager
def push_based_shuffle():
    """Use Ray's push-based sort shuffle while executing a plan.

    Measured on the bench epoch (1M events, 64 partitions): pull-based
    sort was 7–9s and did not improve with CPUs; push-based was 5.4–6.6s
    and scaled; on the substring-dedup gram aggregate (1.36M keys,
    sf0.1) push-based cut the groupby 14.5s → 10.7s. (HASH_SHUFFLE
    deadlocks in local mode with map_groups — do not use it.) Wrap the
    EXECUTION (materialize / iter_batches / to_pandas), not just plan
    construction — the strategy is read when the shuffle runs."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    old = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        yield
    finally:
        ctx.shuffle_strategy = old
