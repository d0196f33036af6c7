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


def drift_psi(
    ds_a: rd.Dataset,
    ds_b: rd.Dataset,
    col: str,
    bin_width: float,
    round_to: int | None = 6,
):
    """Population Stability Index between two samples of a numeric
    column — THE standard data-drift score between a baseline and a
    candidate distribution (model monitoring, snapshot-vs-snapshot
    drift over a CDC lake): PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b).

    Binning is ``floor(col / bin_width)`` — one IEEE divide + floor,
    identical in every engine, so bin membership is exact (never bin
    by libm log/quantiles cross-engine). Bins empty on EITHER side are
    EXCLUDED (the epsilon-free PSI variant; the SQL twin is an INNER
    JOIN of the two histograms) — documented, deterministic, and the
    right call for equal-width bins where an empty bin is structural,
    not sampled. Fractions use the FULL side totals (all non-null
    rows), not just the joined bins, matching the standard definition.

    Plan: one mergeable histogram per side (count partials over the
    integer bin — O(n_bins) driver rows each), driver-side join of two
    tiny frames. ``round_to`` absorbs libm-ln + summation-order
    drift (the power_means policy). Returns a 1-row frame
    (psi, n_bins) — provably non-empty for the oracle harness."""
    from maestro_ray.ops.aggregates import _count_merge

    def hist(ds: rd.Dataset):
        def binb(t: pa.Table) -> pa.Table:
            x = t.column(col)
            t = t.filter(pc.is_valid(x))
            b = pc.floor(pc.divide(pc.cast(t.column(col), pa.float64()),
                                   float(bin_width)))
            return pa.table({"bin": pc.cast(b, pa.int64())})

        m, cnt = _count_merge(
            ds.map_batches(binb, batch_format="pyarrow"), ["bin"])
        return m.rename(columns={cnt: "n"}), float(m[cnt].sum())

    ha, ta = hist(ds_a)
    hb, tb = hist(ds_b)
    j = ha.merge(hb, on="bin", how="inner", suffixes=("_a", "_b"))
    j = j.sort_values("bin")
    p_a = j["n_a"].to_numpy("float64") / ta
    p_b = j["n_b"].to_numpy("float64") / tb
    psi = float(((p_a - p_b) * np.log(p_a / p_b)).sum())
    if round_to is not None:
        psi = round(psi, round_to)
    import pandas as pd

    return pd.DataFrame({"psi": [psi], "n_bins": [np.int64(len(j))]})
