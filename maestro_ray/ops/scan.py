"""Distributed ordered scan (global prefix sum).

The missing Ray Data primitive for "position of this row in the whole
ordered relation" problems — training-shard sequence packing, global
byte offsets for concatenated outputs, ordered quota assignment. A SQL
``SUM(v) OVER (ORDER BY k)`` without materializing or sorting the whole
relation through one node.

Three-pass plan (the textbook parallel scan, re-expressed over a
Dataset):

1. key min/max — O(1) rows leave each batch;
2. per-batch partial sums per equal-width KEY-RANGE bucket — the driver
   folds an exclusive running offset per bucket (O(n_buckets) state,
   never row data);
3. ONE groupby(bucket) shuffle; each group sorts locally by key and
   adds its bucket's offset to a local exclusive cumsum.

Equal-width bucketing is the partitioning assumption: near-uniform keys
(sequential ids, dense surrogate keys) spread evenly; a pathologically
clustered key space concentrates rows in few buckets — raise
``n_buckets`` (offsets stay O(n_buckets) on the driver) so the largest
bucket fits a worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def ordered_cumsum(
    ds: rd.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "cum_prev",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``value_col`` in
    ``order_col`` order (= ``SUM(v) OVER (ORDER BY k) - v``).

    ``order_col`` must be a UNIQUE non-null integer key — duplicate
    keys would make the prefix order engine-dependent, so they raise.
    Null values count as 0 (SQL SUM rule). Sums are int64 when the
    value column is an integer type, float64 otherwise.
    """
    if n_buckets < 1:
        raise ValueError(f"ordered_cumsum: n_buckets={n_buckets}")
    # one upstream execution total: passes 1-2 prune to two columns of
    # the materialized blocks (zero-copy), pass 3 shuffles the full
    # rows — which it must do regardless
    ds = ds.materialize()
    slim = ds.select_columns([order_col, value_col])

    def minmax(t: pa.Table) -> pa.Table:
        col = t.column(order_col)
        if col.null_count:
            raise ValueError(
                f"ordered_cumsum: null {order_col!r} key (the scan "
                "order would be undefined)")
        k = col.to_numpy(zero_copy_only=False)
        if not len(k):
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64())})

    mm = slim.map_batches(minmax, batch_format="pyarrow").to_pandas()
    sch = ds.schema()
    is_int = pa.types.is_integer(
        dict(zip(sch.names, sch.types))[value_col])
    dtype = np.int64 if is_int else np.float64
    if not len(mm):  # empty input: just the empty schema + out_col
        return ds.map_batches(
            lambda t: t.append_column(
                out_col, pa.array([], pa.int64() if is_int
                                  else pa.float64())),
            batch_format="pyarrow")
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return np.minimum((keys - lo) // width, n_buckets - 1)

    def bucket_sums(t: pa.Table) -> pa.Table:
        k = t.column(order_col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(t.column(value_col), 0).to_numpy(
            zero_copy_only=False).astype(dtype)
        sums = np.zeros(n_buckets, dtype=dtype)
        np.add.at(sums, bucket_of(k), v)
        nz = np.flatnonzero(sums)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "s": pa.array(sums[nz])})

    parts = slim.map_batches(bucket_sums, batch_format="pyarrow") \
        .to_pandas()
    totals = np.zeros(n_buckets, dtype=dtype)
    if len(parts):
        np.add.at(totals, parts["b"].to_numpy(),
                  parts["s"].to_numpy().astype(dtype))
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(dtype)

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(order_col).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket",
                               pa.array(bucket_of(k), pa.int64()))

    def scan_group(g: pa.Table) -> pa.Table:
        b = int(g.column("__bucket")[0].as_py())
        order = pc.sort_indices(g, sort_keys=[(order_col, "ascending")])
        g = g.take(order).drop_columns(["__bucket"])
        k = g.column(order_col).to_numpy(zero_copy_only=False)
        if len(k) > 1 and (np.diff(k) == 0).any():
            raise ValueError(
                f"ordered_cumsum: duplicate {order_col!r} key "
                f"{int(k[np.flatnonzero(np.diff(k) == 0)[0]])} — the "
                "prefix order is undefined; scan keys must be unique")
        v = pc.fill_null(g.column(value_col), 0).to_numpy(
            zero_copy_only=False).astype(dtype)
        cum = offsets[b] + np.cumsum(v) - v
        return g.append_column(out_col, pa.array(cum))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(scan_group, batch_format="pyarrow"))


def global_row_number(
    ds: rd.Dataset, order_col: str, out_col: str = "rn",
    n_buckets: int = 256,
) -> rd.Dataset:
    """``ROW_NUMBER() OVER (ORDER BY order_col)`` without a global
    sort-and-walk: the ordered scan of a constant 1 (exclusive prefix
    count + 1). Same contract as ``ordered_cumsum``: unique non-null
    integer keys, one groupby shuffle, O(n_buckets) driver state."""

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    scanned = ordered_cumsum(
        ds.map_batches(ones, batch_format="pyarrow"), order_col,
        "__one", out_col="__rn0", n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        rn = pc.add(t.column("__rn0"), pa.scalar(1, pa.int64()))
        return t.drop_columns(["__one", "__rn0"]).append_column(out_col, rn)

    return scanned.map_batches(finish, batch_format="pyarrow")


_I64_MIN = np.iinfo(np.int64).min


def ordered_cummax(
    ds: rd.Dataset,
    order_col: str,
    value_col: str,
    out_col: str = "cummax_prev",
    n_buckets: int = 256,
) -> rd.Dataset:
    """Add ``out_col`` = EXCLUSIVE prefix max of ``value_col`` (int64)
    in ``order_col`` order — SQL ``MAX(v) OVER (ORDER BY k ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)``, including its null
    semantics: null where no prior non-null value exists, null values
    never advance the max. Same contract and 3-pass bucket plan as
    ``ordered_cumsum`` (unique non-null integer ``order_col``, one
    groupby shuffle, O(n_buckets) driver state). This is the event-time
    WATERMARK primitive: with ``value_col`` = event-time µs, ``out_col``
    is the watermark each row observed on arrival (ops/watermark.py).
    """
    if n_buckets < 1:
        raise ValueError(f"ordered_cummax: n_buckets={n_buckets}")
    ds = ds.materialize()
    slim = ds.select_columns([order_col, value_col])

    def minmax(t: pa.Table) -> pa.Table:
        col = t.column(order_col)
        if col.null_count:
            raise ValueError(
                f"ordered_cummax: null {order_col!r} key (the scan "
                "order would be undefined)")
        k = col.to_numpy(zero_copy_only=False)
        if not len(k):
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64())})

    mm = slim.map_batches(minmax, batch_format="pyarrow").to_pandas()
    if not len(mm):  # empty input: empty schema + typed out_col
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow")
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return np.minimum((keys - lo) // width, n_buckets - 1)

    def bucket_maxes(t: pa.Table) -> pa.Table:
        k = t.column(order_col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(t.column(value_col), pa.int64()),
                         _I64_MIN).to_numpy(zero_copy_only=False)
        maxes = np.full(n_buckets, _I64_MIN, dtype=np.int64)
        np.maximum.at(maxes, bucket_of(k), v)
        nz = np.flatnonzero(maxes != _I64_MIN)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "m": pa.array(maxes[nz], pa.int64())})

    parts = slim.map_batches(bucket_maxes, batch_format="pyarrow") \
        .to_pandas()
    totals = np.full(n_buckets, _I64_MIN, dtype=np.int64)
    if len(parts):
        np.maximum.at(totals, parts["b"].to_numpy(),
                      parts["m"].to_numpy().astype(np.int64))
    # exclusive running max ACROSS buckets (identity = int64 min)
    offsets = np.concatenate(
        ([_I64_MIN], np.maximum.accumulate(totals)[:-1]))

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(order_col).to_numpy(zero_copy_only=False)
        return t.append_column("__bucket",
                               pa.array(bucket_of(k), pa.int64()))

    def scan_group(g: pa.Table) -> pa.Table:
        b = int(g.column("__bucket")[0].as_py())
        order = pc.sort_indices(g, sort_keys=[(order_col, "ascending")])
        g = g.take(order).drop_columns(["__bucket"])
        k = g.column(order_col).to_numpy(zero_copy_only=False)
        if len(k) > 1 and (np.diff(k) == 0).any():
            raise ValueError(
                f"ordered_cummax: duplicate {order_col!r} key "
                f"{int(k[np.flatnonzero(np.diff(k) == 0)[0]])} — the "
                "prefix order is undefined; scan keys must be unique")
        v = pc.fill_null(pc.cast(g.column(value_col), pa.int64()),
                         _I64_MIN).to_numpy(zero_copy_only=False)
        incl = np.maximum.accumulate(v)
        excl = np.concatenate(([offsets[b]],
                               np.maximum(incl[:-1], offsets[b])))
        out = pa.array(excl, pa.int64())
        # identity sentinel -> SQL null (no prior non-null value)
        mask = pa.array(excl == _I64_MIN)
        out = pc.if_else(mask, pa.scalar(None, pa.int64()), out)
        return g.append_column(out_col, out)

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(scan_group, batch_format="pyarrow"))
