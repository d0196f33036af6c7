"""SQLite source/sink — the embedded-RDBMS edge of the source matrix
(SURVEY.md §2 S10 family; io/rdbms.py is the analytical-RDBMS analog).

SQLite is the one database every edge device and app ships, so a
CDC/ingest engine meets it constantly as a LANDING source (app
exports, device snapshots, crawl frontiers). Same sqoop plan as
read_rdbms: the driver reads MIN/MAX of a numeric split column (one
tiny query), then N Ray tasks each open the file READ-ONLY
(``file:…?mode=ro`` URI — safe concurrent readers, SQLite's own
locking) and pull a half-open key range. ``rowid`` works as the split
column for tables without a natural numeric key.

Typing: SQLite is dynamically typed, so the Arrow schema comes from
``PRAGMA table_info`` declared types (INTEGER→int64, REAL/NUMERIC→
float64, TEXT→string, BLOB→binary) — the honest contract for this
source; a column whose VALUES violate its declared type fails loudly
in the Arrow conversion rather than silently coercing. Row→Arrow
conversion is per-cell Python at the connector boundary (true of any
non-Arrow DB driver); the parallelism unit is the key range, so the
cost is spread across tasks and never on the driver.

The sink stages the Dataset to partitioned parquet first (restartable,
each Ray task writes its own file), then the driver commits ONE
transaction, streaming the staged files through ``executemany`` —
never the whole Dataset in memory at once (peak = one staged file).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

import pyarrow as pa
import ray.data as rd

from maestro_ray.io.rdbms import fresh_stage, qident

_DECL_TO_ARROW = (
    ("INT", pa.int64()),
    ("CHAR", pa.string()),
    ("CLOB", pa.string()),
    ("TEXT", pa.string()),
    ("BLOB", pa.binary()),
    ("REAL", pa.float64()),
    ("FLOA", pa.float64()),
    ("DOUB", pa.float64()),
)


def _decl_type(decl: str) -> pa.DataType:
    """SQLite type-affinity rules (https://sqlite.org/datatype3.html
    §3.1), mapped to Arrow."""
    d = (decl or "").upper()
    for needle, typ in _DECL_TO_ARROW:
        if needle in d:
            return typ
    return pa.float64()  # NUMERIC affinity


def _table_schema(db_path: str, table: str) -> pa.Schema:
    import sqlite3

    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        info = con.execute(
            f"PRAGMA table_info({qident(table)})").fetchall()
    finally:
        con.close()
    if not info:
        raise ValueError(f"table {table!r} not found in {db_path}")
    # PRAGMA table_info: (cid, name, decl_type, notnull, default, pk)
    return pa.schema([(r[1], _decl_type(r[2])) for r in info])


def read_sqlite(
    db_path: str,
    table: str,
    split_col: str,
    num_partitions: int = 8,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> rd.Dataset:
    """Range-partitioned parallel import of a SQLite ``table``.

    ``split_col`` must be numeric (``rowid`` allowed); NULL split rows
    ride the first partition. ``predicate`` is trusted caller-authored
    SQL (sqoop --where); identifiers are quote-escaped."""
    import sqlite3

    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    schema = _table_schema(db_path, table)
    if columns:
        missing = [c for c in columns if c not in schema.names]
        if missing:
            raise ValueError(
                f"columns {missing} not in {table!r} "
                f"(has {schema.names})")
        schema = pa.schema([schema.field(c) for c in columns])
    qtable, qsplit = qident(table), qident(split_col)
    cols = ", ".join(qident(c) for c in (columns or schema.names))
    uri = f"file:{db_path}?mode=ro"
    con = sqlite3.connect(uri, uri=True)
    try:
        lo, hi = con.execute(
            f"SELECT min({qsplit}), max({qsplit}) FROM {qtable}"
        ).fetchone()
    finally:
        con.close()
    where_extra = f" AND ({predicate})" if predicate else ""
    if lo is None:
        bounds = [(None, None)]
    else:
        import math

        lo, hi = float(lo), float(hi)
        if math.isnan(lo) or math.isnan(hi):
            raise ValueError(
                f"split column {split_col} contains NaN — unreachable "
                "by any range; pick another split column")
        step = (hi - lo) / num_partitions or 1.0
        bounds = [
            (lo + i * step,
             (lo + (i + 1) * step) if i < num_partitions - 1 else None)
            for i in range(num_partitions)
        ]

    def fetch_range(batch: pa.Table) -> pa.Table:
        import sqlite3 as _sqlite3

        out = []
        for i in batch.column("id").to_pylist():
            b_lo, b_hi = bounds[i]
            if b_lo is None and b_hi is None:
                rng = "1"
            elif b_hi is None:
                rng = f"({qsplit} >= {b_lo} OR {qsplit} IS NULL)" \
                    if i == 0 else f"{qsplit} >= {b_lo}"
            else:
                rng = f"{qsplit} >= {b_lo} AND {qsplit} < {b_hi}"
                if i == 0:
                    rng = f"({rng} OR {qsplit} IS NULL)"
            c = _sqlite3.connect(uri, uri=True)
            try:
                rows = c.execute(
                    f"SELECT {cols} FROM {qtable} WHERE {rng}{where_extra}"
                ).fetchall()
            finally:
                c.close()
            if rows:
                arrays = [
                    pa.array([r[j] for r in rows], type=f.type)
                    for j, f in enumerate(schema)
                ]
                out.append(pa.Table.from_arrays(arrays, schema=schema))
        if not out:
            return schema.empty_table()
        return pa.concat_tables(out)

    ids = rd.range(len(bounds)).repartition(len(bounds))
    return ids.map_batches(fetch_range, batch_format="pyarrow", batch_size=1)


def _sql_decl(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    if pa.types.is_timestamp(t):
        # documented contract: micros since epoch (SQLite has no
        # native timestamp; INTEGER keeps range math exact)
        return "INTEGER"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "TEXT"
    raise ValueError(f"no SQLite mapping for Arrow type {t}")


def write_sqlite(
    ds: rd.Dataset,
    db_path: str,
    table: str,
    staging_dir: str,
    mode: str = "append",
) -> int:
    """Export a Dataset into a SQLite table: parquet staging (each Ray
    task writes its own file — restartable), then ONE driver
    transaction streaming staged files through ``executemany``
    (peak driver memory = one staged file). Returns rows written.
    ``mode``: append | overwrite | create (same as write_rdbms).
    Timestamp columns land as INTEGER microseconds (documented)."""
    import sqlite3

    import pyarrow.parquet as _pq

    if mode not in ("append", "overwrite", "create"):
        raise ValueError(f"mode={mode!r}")
    stage = fresh_stage(staging_dir)
    ds.write_parquet(stage)
    files = sorted(_glob.glob(os.path.join(stage, "*.parquet")))
    schema = _pq.ParquetFile(files[0]).schema_arrow if files else None
    if schema is None:
        shutil.rmtree(stage, ignore_errors=True)
        return 0
    qtable = qident(table)
    con = sqlite3.connect(db_path)
    try:
        con.execute("BEGIN")
        exists = con.execute(
            "SELECT count(*) FROM sqlite_master WHERE type='table' "
            "AND name = ?", [table]).fetchone()[0]
        if mode == "create" and exists:
            raise ValueError(f"table {table} already exists")
        if mode == "overwrite" and exists:
            con.execute(f"DROP TABLE {qtable}")
            exists = 0
        if not exists:
            decls = ", ".join(
                f"{qident(f.name)} {_sql_decl(f.type)}" for f in schema)
            con.execute(f"CREATE TABLE {qtable} ({decls})")
        ph = ", ".join("?" for _ in schema.names)
        ins = f"INSERT INTO {qtable} VALUES ({ph})"
        n = 0
        for f in files:
            t = _pq.read_table(f)
            cols = []
            for fld in schema:
                c = t.column(fld.name)
                if pa.types.is_timestamp(fld.type):
                    c = pa.compute.cast(
                        pa.compute.cast(c, pa.timestamp("us")), pa.int64())
                cols.append(c.to_pylist())
            rows = list(zip(*cols)) if cols else []
            con.executemany(ins, rows)
            n += t.num_rows
        con.execute("COMMIT")
        shutil.rmtree(stage, ignore_errors=True)
        return n
    except Exception:
        try:
            con.execute("ROLLBACK")
        except Exception:
            pass
        raise
    finally:
        con.close()
