"""Table profiling: per-column row/null/distinct counts in two
distributed passes — the DESCRIBE/data-quality primitive.

Pass 1 (counts): per-batch (column, n, nulls) partials, one tiny
groupby. Pass 2 (distinct): every non-null value hashes to 64 bits
(ops/hashing — type-aware) and the per-column distinct count is the
row count of a bucketed (column, hash) distinct — ONE exchange of
(col, int64) rows for ALL columns together instead of one
count-distinct shuffle per column. Hash collisions undercount with
p ≈ n²/2⁶⁴ (the repo-wide fingerprinting convention); nulls are
excluded to match SQL's count(DISTINCT col).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from maestro_ray.ops.aggregates import bucketed_distinct
from maestro_ray.ops.hashing import hash_array


def profile_columns(ds: rd.Dataset, cols: list[str]) -> pd.DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column,
    sorted by column name."""
    if not cols:
        raise ValueError("profile_columns: need at least one column")

    def count_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": pa.array(cols, pa.string()),
            "n_rows": pa.array([t.num_rows] * len(cols), pa.int64()),
            "n_nulls": pa.array(
                [t.column(c).null_count for c in cols], pa.int64()),
        })

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby("column").sum(["n_rows", "n_nulls"])
              .to_pandas())
    if counts.empty:  # a fully-empty Dataset may run no batches at all
        counts = pd.DataFrame({"column": pd.Series(cols, dtype=object)})
        counts["n_rows"] = 0
        counts["n_nulls"] = 0
    else:
        counts.columns = ["column", "n_rows", "n_nulls"]

    def hash_partial(t: pa.Table) -> pa.Table:
        names, hs = [], []
        for c in cols:
            col = t.column(c)
            col = col.drop_null()  # SQL count(DISTINCT) ignores nulls
            if len(col) == 0:
                continue
            h = hash_array(col).view(np.int64)
            names.append(np.full(len(col), cols.index(c), np.int64))
            hs.append(h)
        if not hs:  # typed empty: the schema-loss class
            return pa.table({"ci": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        return pa.table({
            "ci": pa.array(np.concatenate(names), pa.int64()),
            "h": pa.array(np.concatenate(hs), pa.int64()),
        })

    pairs = bucketed_distinct(
        ds.map_batches(hash_partial, batch_format="pyarrow"),
        ["ci", "h"])

    def reduce_counts(t: pa.Table) -> pa.Table:
        return t.select(["ci"]).group_by(["ci"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["ci", "n_distinct"])

    dist = (pairs.map_batches(reduce_counts, batch_format="pyarrow")
            .groupby("ci").sum("n_distinct").to_pandas())
    if dist.empty:  # all-null input: empty Datasets drop their schema
        dist = pd.DataFrame({"ci": pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64")})
    dist.columns = ["ci", "n_distinct"]
    dist["column"] = [cols[i] for i in dist["ci"]]
    out = counts.merge(dist[["column", "n_distinct"]], on="column",
                       how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    return out.sort_values("column").reset_index(drop=True)
