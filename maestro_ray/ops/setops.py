"""Bag-semantics set operations (SQL ``INTERSECT ALL`` /
``EXCEPT ALL``) — the multiset complement to the existing set-semantics
``intersect`` / ``except_`` compositions (distinct + semi/anti join).

Plan, Ray-Data-first: per-batch distinct-tuple count partials on EACH
side (combiner — one row per distinct tuple per batch crosses the
exchange, never the raw rows), union, ONE groupby over the tuple
columns summing the two side counts, then a vectorized per-group
emit: ``min(cnt_a, cnt_b)`` copies for INTERSECT ALL,
``max(cnt_a - cnt_b, 0)`` for EXCEPT ALL (the SQL multiset rules).
Output stays a distributed Dataset — no driver materialization, so
high-cardinality tuple spaces are fine; the only scale term is the
one distinct-tuple shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _count_partial(cols: list[str], side: int):
    def f(batch: pa.Table) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
        t = t.rename_columns([*cols, "cnt"])
        n = t.num_rows
        zero = pa.array(np.zeros(n, np.int64))
        return pa.table({
            **{c: t.column(c) for c in cols},
            "cnt_a": t.column("cnt") if side == 0 else zero,
            "cnt_b": t.column("cnt") if side == 1 else zero,
        })

    return f


def _bag_setop(a: rd.Dataset, b: rd.Dataset, cols: list[str],
               op: str) -> rd.Dataset:
    u = a.map_batches(_count_partial(cols, 0), batch_format="pyarrow").union(
        b.map_batches(_count_partial(cols, 1), batch_format="pyarrow"))
    g = u.groupby(cols if len(cols) > 1 else cols[0]).sum(["cnt_a", "cnt_b"])

    def emit(t: pa.Table) -> pa.Table:
        ca = t.column("sum(cnt_a)").to_numpy(zero_copy_only=False)
        cb = t.column("sum(cnt_b)").to_numpy(zero_copy_only=False)
        k = (np.minimum(ca, cb) if op == "intersect"
             else np.maximum(ca - cb, 0))
        idx = np.repeat(np.arange(len(k), dtype=np.int64), k)
        return t.select(cols).take(pa.array(idx, pa.int64()))

    return g.map_batches(emit, batch_format="pyarrow")


def intersect_all(a: rd.Dataset, b: rd.Dataset,
                  cols: list[str]) -> rd.Dataset:
    """SQL ``INTERSECT ALL``: each tuple appears min(count_a, count_b)
    times. NULL tuples match NULL tuples (SQL set-op semantics treat
    NULLs as equal, unlike joins)."""
    return _bag_setop(a, b, cols, "intersect")


def except_all(a: rd.Dataset, b: rd.Dataset,
               cols: list[str]) -> rd.Dataset:
    """SQL ``EXCEPT ALL``: each tuple appears max(count_a − count_b, 0)
    times."""
    return _bag_setop(a, b, cols, "except")
