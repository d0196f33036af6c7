"""Declarative data-quality expectations over Datasets — the
dbt-test / Great-Expectations shape: each rule streams ONE predicate
count (or one bucketed distinct exchange) and the report is a tiny
(check, n_violations) frame, so the suite runs on a 100 TB table
without ever collecting it.

Rule dicts (each carries its own ``ds`` — multi-table suites are one
list):

- ``{"check", "type": "not_null", "ds", "column"}`` — null count.
- ``{"type": "unique"}`` — ``count(col) − count(DISTINCT col)`` over
  non-null values (the SQL convention), via one bucketed distinct.
- ``{"type": "accepted_values", "values": [...]}`` — rows whose value
  is null or outside the set.
- ``{"type": "in_range", "lo", "hi"}`` — rows null or outside
  [lo, hi].
- ``{"type": "foreign_key", "ref_ds", "ref_column"}`` — rows whose
  non-null value has no match in the reference column (anti join).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _predicate_count(ds: rd.Dataset, column: str, pred) -> int:
    """Stream a per-batch match count; ``pred`` maps a column chunk to
    a boolean array whose True rows are VIOLATIONS."""

    def partial(t: pa.Table) -> pa.Table:
        mask = pred(t.column(column))
        n = pc.sum(mask).as_py() or 0
        return pa.table({"c": pa.array([n], pa.int64())})

    got = ds.map_batches(partial, batch_format="pyarrow").sum("c")
    return int(got or 0)


def _unique_violations(ds: rd.Dataset, column: str) -> int:
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        return t.select([column]).filter(pc.is_valid(t.column(column)))

    per_value = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [column], [(None, "count_all", "c")]).materialize()
    total = int(per_value.sum("c") or 0)
    return total - per_value.count()


def _fk_violations(ds: rd.Dataset, column: str,
                   ref_ds: rd.Dataset, ref_column: str) -> int:
    from maestro_ray.ops.joins import hash_join

    def left(t: pa.Table) -> pa.Table:
        col = t.column(column)
        return pa.table({"__k": col}).filter(pc.is_valid(col))

    def right(t: pa.Table) -> pa.Table:
        col = t.column(ref_column)
        return pa.table({"__k": col}).filter(pc.is_valid(col))

    orphans = hash_join(
        ds.map_batches(left, batch_format="pyarrow"),
        ref_ds.map_batches(right, batch_format="pyarrow"),
        "__k", join_type="left anti")
    return orphans.count()


def data_quality_report(rules: list[dict]) -> pd.DataFrame:
    """Run every rule; returns (check, n_violations) sorted by check.
    Check names must be unique — duplicate names fail loudly."""
    names = [r["check"] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("data_quality_report: duplicate check names")
    out: list[tuple[str, int]] = []
    for r in rules:
        ds, col, typ = r["ds"], r["column"], r["type"]
        if typ == "not_null":
            n = _predicate_count(ds, col, pc.is_null)
        elif typ == "unique":
            n = _unique_violations(ds, col)
        elif typ == "accepted_values":
            vals = pa.array(r["values"])

            def bad_set(c, vals=vals):
                return pc.invert(pc.fill_null(
                    pc.is_in(c, value_set=vals), False))

            n = _predicate_count(ds, col, bad_set)
        elif typ == "in_range":
            lo, hi = r["lo"], r["hi"]

            def bad_range(c, lo=lo, hi=hi):
                ok = pc.and_(pc.greater_equal(c, lo),
                             pc.less_equal(c, hi))
                return pc.invert(pc.fill_null(ok, False))

            n = _predicate_count(ds, col, bad_range)
        elif typ == "foreign_key":
            n = _fk_violations(ds, col, r["ref_ds"], r["ref_column"])
        else:
            raise ValueError(f"data_quality_report: unknown rule "
                             f"type {typ!r}")
        out.append((r["check"], int(n)))
    df = pd.DataFrame(out, columns=["check", "n_violations"])
    df["n_violations"] = df["n_violations"].astype("int64")
    return df.sort_values("check").reset_index(drop=True)

