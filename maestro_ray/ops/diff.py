"""Keyed table reconciliation: ``diff_tables`` classifies every key as
insert / delete / update between two datasets — the DISTRIBUTED
generalization of the changefeed's per-partition diff
(pipelines/changefeed._diff_partition), for tables that are NOT
co-partitioned lakes: drift detection between a lake and a replica,
anti-entropy between two ingest runs, migration verification.

Plan: each side is projected to (key, payload...) plus a presence flag
inside the join prep (fused — no extra object-store hop), then ONE
bucketed full-outer hash join (ops/joins.hash_join, one shuffle);
classification is vectorized null-safe column comparison per batch.
Equal rows are dropped in the join tasks, so the output is O(drift),
not O(table) — at 100 TB the result of comparing two mostly-equal
replicas is tiny even though the exchange streams both.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from maestro_ray.ops.joins import hash_join

_PL, _PR = "__pl", "__pr"


def _is_distinct(a, b):
    """SQL ``a IS DISTINCT FROM b`` — null-safe inequality."""
    neq = pc.fill_null(pc.not_equal(a, b), False)
    null_mismatch = pc.xor(pc.is_null(a), pc.is_null(b))
    return pc.or_(neq, null_mismatch)


def diff_tables(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    cols: list[str],
    num_buckets: int = 32,
) -> rd.Dataset:
    """Rows that differ between ``left`` (the FROM state) and ``right``
    (the TO state): ``(key, diff_op)`` with diff_op ∈ insert (right
    only) / delete (left only) / update (present in both, any payload
    column IS DISTINCT FROM its counterpart). Keys must be unique per
    side (reconciliation semantics — LWW-merged states, primary-keyed
    replicas). Equal rows never leave the join tasks."""
    if not cols:
        raise ValueError("diff_tables: need at least one payload column")

    def prep(present_col: str):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select([key, *cols])
            return t.append_column(
                present_col,
                pa.array(np.ones(t.num_rows, dtype=bool)))
        return fn

    lp = left.map_batches(prep(_PL), batch_format="pyarrow")
    rp = right.map_batches(prep(_PR), batch_format="pyarrow")
    # an EMPTY side yields a schema-less Dataset that the join cannot
    # plan (hypothesis-found): classify the other side directly — all
    # inserts / all deletes — and type the fully-empty result off the
    # original schema

    def tag_all(op: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                key: t.column(key),
                "diff_op": pa.array([op] * t.num_rows, pa.string()),
            })
        return fn

    lps, rps = lp.schema(), rp.schema()
    if lps is None and rps is None:
        src_schema = left.schema() or right.schema()
        if src_schema is None:
            raise ValueError(
                "diff_tables: both inputs are schema-less empty "
                "Datasets; cannot type the (empty) result — pass at "
                "least one input with a schema")
        key_t = src_schema.base_schema.field(key).type
        return rd.from_arrow(pa.table({
            key: pa.array([], key_t),
            "diff_op": pa.array([], pa.string())}))
    if lps is None:
        return right.map_batches(tag_all("insert"),
                                 batch_format="pyarrow")
    if rps is None:
        return left.map_batches(tag_all("delete"),
                                batch_format="pyarrow")
    j = hash_join(lp, rp, keys=key, num_buckets=num_buckets,
                  join_type="full outer", suffix="_r")

    def classify(t: pa.Table) -> pa.Table:
        pl = pc.fill_null(t.column(_PL), False)
        # __pr exists only on the right side — hash_join never renames
        # it (suffixing applies to OVERLAPPING non-key columns only)
        pr = pc.fill_null(t.column(_PR), False)
        ins = pc.and_(pr, pc.invert(pl))
        del_ = pc.and_(pl, pc.invert(pr))
        changed = _is_distinct(t.column(cols[0]),
                               t.column(cols[0] + "_r"))
        for c in cols[1:]:
            changed = pc.or_(changed,
                             _is_distinct(t.column(c), t.column(c + "_r")))
        upd = pc.and_(pc.and_(pl, pr), changed)
        op = pc.if_else(ins, pa.scalar("insert"),
                        pc.if_else(del_, pa.scalar("delete"),
                                   pc.if_else(upd, pa.scalar("update"),
                                              pa.scalar(None, pa.string()))))
        out = pa.table({key: t.column(key), "diff_op": op})
        return out.filter(pc.is_valid(op))

    return j.map_batches(classify, batch_format="pyarrow")
