"""Vectorized 64-bit hashing: keys, partitions, content checksums.

Powers (SURVEY.md §2): P9 ``key_gen``, U1 ``partition_by_key``, and the
A5 order-insensitive partition checksum that lineage records and the
convergence check are built on.

Determinism contract: every function here is deterministic across
processes and runs (no PYTHONHASHSEED dependence). Numeric columns use
a numpy splitmix64; string/binary/object columns use pandas'
``hash_array`` (SipHash-1-3 with pandas' fixed default key) — both are
pure functions of the values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_U64 = np.uint64
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    with np.errstate(over="ignore"):
        z = (x + _GOLDEN).astype(_U64)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def hash_array(arr: pa.ChunkedArray | pa.Array | np.ndarray | pd.Series) -> np.ndarray:
    """Deterministic uint64 hash per element (nulls hash to a fixed value)."""
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        t = arr.type
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            np_arr = arr.to_numpy(zero_copy_only=False)
            mask = pd.isna(np_arr)
            vals = np.nan_to_num(np_arr.astype(np.float64), nan=0.0)
            h = _splitmix64(vals.view(np.uint64) if vals.dtype == np.float64 else vals.astype(_U64))
            h[mask] = _U64(0x6E756C6C)  # 'null'
            return h
        if pa.types.is_timestamp(t):
            ints = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            mask = pd.isna(ints)
            h = _splitmix64(np.nan_to_num(ints.astype(np.float64)).astype(np.int64).view(_U64))
            h[mask] = _U64(0x6E756C6C)
            return h
        # strings / binary / everything else → pandas object hashing
        series = arr.to_pandas()
    elif isinstance(arr, pd.Series):
        series = arr
    else:
        series = pd.Series(arr)
    if series.dtype.kind in "iuf":
        vals = series.to_numpy()
        mask = pd.isna(vals)
        h = _splitmix64(np.nan_to_num(vals.astype(np.float64)).view(np.uint64))
        h[mask] = _U64(0x6E756C6C)
        return h
    vals = series.to_numpy(dtype=object)
    mask = pd.isna(vals)
    safe = np.where(mask, "", vals)
    h = pd.util.hash_array(safe, categorize=False).astype(_U64)
    h[mask] = _U64(0x6E756C6C)
    return h


def hash_columns(table: pa.Table, columns: list[str] | None = None) -> np.ndarray:
    """Combined uint64 row-hash over the named columns (default: all)."""
    cols = columns or table.column_names
    h = np.full(table.num_rows, _U64(0x5DEECE66D), dtype=_U64)
    with np.errstate(over="ignore"):
        for name in cols:
            h = _splitmix64(h * _U64(31) ^ hash_array(table.column(name)))
    return h


def checksum(table: pa.Table, columns: list[str] | None = None) -> int:
    """Order-insensitive content checksum: sum of row hashes mod 2**64.

    Order-insensitivity matters because Ray Data block order is
    nondeterministic with ``preserve_order=False`` (SURVEY.md §4.3) —
    convergence checks must not depend on it. Mergeable: the checksum of
    a concatenation is the wrapped sum of the parts' checksums.
    """
    if table.num_rows == 0:
        return 0
    with np.errstate(over="ignore"):
        return int(hash_columns(table, columns).sum(dtype=_U64))


def partition_ids(keys: pa.ChunkedArray | pa.Array, num_partitions: int) -> np.ndarray:
    """U1: stable partition assignment p = hash64(key) % P (int32)."""
    return (hash_array(keys) % _U64(num_partitions)).astype(np.int32)
