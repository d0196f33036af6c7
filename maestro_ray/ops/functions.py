"""Scalar/function library + structural ops: json_extract (P10),
explode (P11), key_gen (P9) — vectorized pyarrow kernels in
``map_batches`` (SURVEY.md §2.H).

The broader scalar vocabulary (string/date/math/null kernels) is used
inline by queries via ``pyarrow.compute`` — these are the ops that need
actual structure work.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from maestro_ray.ops.hashing import hash_array, hash_columns


def json_extract_batch(
    batch: pa.Table, col: str, field: str, out_col: str, out_type: pa.DataType = pa.int64()
) -> pa.Table:
    """P10: pull one typed field out of a JSON-string column.

    The JSON payloads here are small (events.props); parse per batch
    with the stdlib parser into a typed Arrow column.
    """
    vals = []
    for s in batch.column(col).to_pylist():
        if s is None:
            vals.append(None)
            continue
        try:
            v = json.loads(s).get(field)
        except (json.JSONDecodeError, AttributeError):
            v = None
        vals.append(v)
    return batch.append_column(out_col, pa.array(vals, out_type))


def json_extract(ds: rd.Dataset, col: str, field: str, out_col: str,
                 out_type: pa.DataType = pa.int64()) -> rd.Dataset:
    return ds.map_batches(
        lambda t: json_extract_batch(t, col, field, out_col, out_type),
        batch_format="pyarrow",
    )


def explode_list(ds: rd.Dataset, list_col: str, keep: list[str],
                 out_col: str = "value", with_pos: bool = False) -> rd.Dataset:
    """P11: one row per list element (Arrow ``list_flatten`` + parent
    index repeat — fully vectorized, no Python loop)."""

    def f(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        parents = pc.list_parent_indices(col)
        out_cols = [batch.column(k).take(parents) for k in keep]
        names = list(keep)
        if with_pos:
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
            # vectorized ragged arange: global index minus each row's start
            starts = np.repeat(np.cumsum(lens) - lens, lens)
            pos = np.arange(int(lens.sum()), dtype=np.int64) - starts
            out_cols.append(pa.array(pos, pa.int64()))
            names.append("pos")
        out_cols.append(flat)
        names.append(out_col)
        return pa.Table.from_arrays(out_cols, names=names)

    return ds.map_batches(f, batch_format="pyarrow")


def key_gen(ds: rd.Dataset, cols: list[str] | str, out_col: str = "key_hash") -> rd.Dataset:
    """P9: deterministic 64-bit surrogate key / content hash per row."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def f(batch: pa.Table) -> pa.Table:
        h = hash_columns(batch, cols)
        return batch.append_column(out_col, pa.array(h, pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def add_hash_column(batch: pa.Table, col: str, out_col: str) -> pa.Table:
    return batch.append_column(out_col, pa.array(hash_array(batch.column(col)), pa.uint64()))


def unpivot(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "measure",
    value_col: str = "val",
    value_type: pa.DataType | None = None,
) -> rd.Dataset:
    """Wide → long reshape (SQL UNPIVOT / pandas melt): one output row
    per (input row, value column), nulls preserved as null rows (the
    UNION-ALL-of-selects semantics, which DuckDB's UNPIVOT also uses
    when ``INCLUDE NULLS`` — the portable ANSI twin is the UNION ALL).

    Streaming flat map — each batch expands to len(value_cols) stacked
    slices via zero-copy column selection + one concat; no shuffle, no
    Python per-row work. All value columns are cast to ``value_type``
    (default float64) since the long column must have ONE type."""
    vt = value_type or pa.float64()

    def f(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            parts.append(pa.table({
                **{k: batch.column(k) for k in id_cols},
                name_col: pa.array([c] * batch.num_rows, pa.string()),
                value_col: pc.cast(batch.column(c), vt),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(f, batch_format="pyarrow")
