"""Slowly-changing-dimension history (SCD Type 2) from a change stream.

The LWW upsert core (ops/merge.py, U3) keeps only the CURRENT row per
key; warehouses that need "what did this row look like on date X" keep
the full version history instead: one row per version with
``valid_from`` / ``valid_to`` interval columns and an ``is_current``
flag, deletes closing the last open interval without opening a new one.

Plan shape: ONE shuffle (``groupby(key)``), then a vectorized per-group
pass — sort by ``(ts, seq)``, ``valid_to`` is the zero-copy lead of
``ts`` (next change closes this version), delete rows close their
predecessor and drop out of the output. Version chains are per-key
sequential by definition, so the group is the natural unit; hot keys
with very long histories are bounded by the key's own change count,
never the corpus. Streams at any corpus size.

``compress=True`` additionally collapses consecutive versions whose
tracked attributes are unchanged (the classic SCD2 "only on change"
rule): a no-op update extends the predecessor's validity instead of
opening a new version.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def scd2_history(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    attrs: list[str],
    seq_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "delete",
    compress: bool = False,
) -> rd.Dataset:
    """Build a Type-2 history table from a change stream.

    Output columns: ``key``, ``attrs...``, ``valid_from`` (the change's
    own ``ts``), ``valid_to`` (the NEXT change's ts for this key; null
    while the version is still open), ``is_current`` (valid_to is
    null). With ``op_col``, rows whose op equals ``delete_op`` close
    the previous version (its valid_to = the delete's ts) and emit no
    version themselves — a key whose last change is a delete has no
    current row, matching tombstone semantics in the lake.

    Pass ``seq_col`` (a unique tiebreak, e.g. the changelog offset)
    whenever ``ts`` can collide within a key — version order must be
    total for the intervals to be well-defined.
    """
    sort_keys = [(ts_col, "ascending")]
    if seq_col is not None:
        sort_keys.append((seq_col, "ascending"))
    out_cols = [key, *attrs, "valid_from", "valid_to", "is_current"]

    def per_key(g: pa.Table) -> pa.Table:
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys)).combine_chunks()
        if compress:
            s = _drop_unchanged(s, attrs, op_col, delete_op)
        ts = s.column(ts_col).combine_chunks()
        n = s.num_rows
        valid_to = pa.concat_arrays([ts.slice(1), pa.nulls(1, ts.type)])
        s = s.append_column("valid_from", ts)
        s = s.append_column("valid_to", valid_to)
        s = s.append_column("is_current", pc.is_null(valid_to))
        if op_col is not None:
            keep = pc.fill_null(
                pc.not_equal(s.column(op_col), pa.scalar(delete_op)), True)
            s = s.filter(keep)
        return s.select(out_cols)

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def _drop_unchanged(s: pa.Table, attrs: list[str], op_col: str | None,
                    delete_op: str) -> pa.Table:
    """Keep row i iff it changes state: first row, a delete, the row
    after a delete (re-insert), or any tracked attr differing from row
    i-1 (null-safe: null == null). Dropping a row extends its
    predecessor's validity — exactly the SCD2 no-op-update rule."""
    if s.num_rows <= 1:
        return s
    changed = pd.Series(False, index=range(s.num_rows))
    for a in attrs:
        col = s.column(a).to_pandas()
        prev = col.shift(1)
        # null-safe inequality: differs unless equal or both null
        neq = ~((col == prev) | (col.isna() & prev.isna()))
        changed |= neq
    if op_col is not None:
        is_del = s.column(op_col).to_pandas() == delete_op
        changed |= is_del                 # deletes always matter
        changed |= is_del.shift(1, fill_value=False)  # re-insert after delete
    changed.iloc[0] = True
    return s.filter(pa.array(changed.to_numpy()))
