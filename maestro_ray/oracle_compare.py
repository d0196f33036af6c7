"""THE oracle comparison — single source of truth for how an engine
result is compared against its DuckDB twin.

Shared by ``tests/oracle/test_duckdb_parity.py`` (pytest layer) and
``maestro_ray.validate`` (full-contract CLI) so the two can never
drift: same ``to_df`` coercion, same dtype-kind check (PRE-
normalization — silent numeric drift like the r1 join_asof
int64→float64 coercion must fail loudly, the way the driver's
type-sensitive value hash fails), same normalization (columns sorted
by name, dtypes canonicalized, rows sorted by every column =
order-insensitive), same value compare
(``assert_frame_equal(check_dtype=False, check_exact=True)``) and the
same empty-both-sides rule (schema of an empty Ray result may be
lost — counted as a pass when the oracle is empty too).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_df(obj) -> pd.DataFrame:
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    if isinstance(obj, pd.DataFrame):
        return obj.copy()
    return obj.to_pandas()  # ray Dataset


def kinds(df: pd.DataFrame) -> dict:
    """Pre-normalization dtype KINDS (i/u/f/M/O/b) per column."""
    return {c: df[c].dtype.kind for c in df.columns}


def normalize(obj) -> pd.DataFrame:
    df = to_df(obj)
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_unsigned_integer_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(
        list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(got_raw: pd.DataFrame, exp_raw: pd.DataFrame) -> dict:
    """CORRECTNESS-record-shaped comparison of raw engine vs raw oracle
    frames (both pre-normalization)."""
    rec: dict = {"rows_match": False, "schema_match": False,
                 "hash_match": False,
                 "spark_rows": int(len(got_raw)),
                 "oracle_rows": int(len(exp_raw)), "err": None}
    got, exp = normalize(got_raw), normalize(exp_raw)
    if len(got) == 0 and len(exp) == 0:
        rec.update(rows_match=True, schema_match=True, hash_match=True)
        return rec
    rec["rows_match"] = len(got_raw) == len(exp_raw)
    rec["schema_match"] = (
        list(got.columns) == list(exp.columns)
        and kinds(got_raw) == kinds(exp_raw)
    )
    if rec["rows_match"] and rec["schema_match"]:
        try:
            pd.testing.assert_frame_equal(
                got, exp, check_dtype=False, check_exact=True)
            rec["hash_match"] = True
        except AssertionError:
            rec["hash_match"] = False
    return rec
