"""S10: RDBMS import/export — the sqoop analog (SURVEY.md §2 S10).

Maestro's lineage bulk-moves tables between an RDBMS and the lake with
range-partitioned parallel reads (sqoop's core trick: split a numeric
key into N ranges, one JDBC reader each) [M]. The sandbox ships DuckDB,
which stands in for the RDBMS: the import plan is identical to what a
Postgres/MySQL source would use — only the connector line changes.

- ``read_rdbms``: driver reads MIN/MAX of the split column (one tiny
  query), then N Ray tasks each open the database READ-ONLY and pull
  their half-open key range — parallel, partition-pruned at the source,
  nothing corpus-sized through the driver.
- ``write_rdbms``: the sqoop-export staging pattern — the Dataset is
  written to partitioned parquet first (restartable, each task writes
  its own file), then ONE transactional ``INSERT … FROM read_parquet``
  on the driver commits it (RDBMS writes want a single transaction, not
  N racing writers).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import time
import uuid

import pyarrow as pa
import ray.data as rd


def qident(name: str) -> str:
    """SQL identifier, double-quote escaped — table/column names are
    never interpolated raw (a same-named table in another schema or an
    unusual identifier must not change statement meaning)."""
    return '"' + name.replace('"', '""') + '"'


def fresh_stage(staging_dir: str, reap_after_s: float = 3600.0) -> str:
    """New unique attempt dir under ``staging_dir``; garbage-collects
    STALE ``attempt-*`` leftovers first so a long-running export/
    replication loop cannot leak one staged copy of the data per call.

    Successful calls delete their own dir right after COMMIT, so
    leftovers are only crashed attempts (never referenced again) — but
    a CONCURRENT in-flight export sharing ``staging_dir`` also matches
    the glob, so only dirs untouched for ``reap_after_s`` seconds are
    reaped (an in-flight attempt's mtime advances with every staged
    file; a crashed one goes quiet and is collected on a later call)."""
    now = time.time()
    for d in _glob.glob(os.path.join(staging_dir, "attempt-*")):
        try:
            quiet_since = max(
                [os.path.getmtime(d)]
                + [e.stat().st_mtime for e in os.scandir(d)])
        except OSError:
            continue
        if now - quiet_since > reap_after_s:
            shutil.rmtree(d, ignore_errors=True)
    stage = os.path.join(staging_dir, f"attempt-{uuid.uuid4().hex}")
    os.makedirs(stage)
    return stage


def read_rdbms(
    db_path: str,
    table: str,
    split_col: str,
    num_partitions: int = 8,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> rd.Dataset:
    """Range-partitioned parallel import of ``table``.

    ``split_col`` must be numeric (sqoop's --split-by); rows where it
    is NULL are picked up by the first partition. ``predicate`` is an
    optional SQL WHERE fragment pushed down to every range reader —
    it is trusted caller-authored SQL (like sqoop's --where), while
    table/column names are identifier-quoted.
    """
    import duckdb

    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    cols = ", ".join(qident(c) for c in columns) if columns else "*"
    qtable, qsplit = qident(table), qident(split_col)
    con = duckdb.connect(db_path, read_only=True)
    try:
        lo, hi = con.execute(
            f"SELECT min({qsplit}), max({qsplit}) FROM {qtable}"
        ).fetchone()
        empty = con.execute(
            f"SELECT {cols} FROM {qtable} LIMIT 0"
        ).fetch_arrow_table()  # schema-carrying empty block
    finally:
        con.close()
    where_extra = f" AND ({predicate})" if predicate else ""
    if lo is None:  # empty table (or all-null split col): one reader
        bounds = [(None, None)]
    else:
        import math

        lo, hi = float(lo), float(hi)
        if math.isnan(lo) or math.isnan(hi):
            raise ValueError(
                f"split column {split_col} contains NaN — NaN rows are "
                "unreachable by any >=/< range; filter them out or pick "
                "another split column"
            )
        step = (hi - lo) / num_partitions or 1.0
        bounds = [
            (lo + i * step, (lo + (i + 1) * step) if i < num_partitions - 1
             else None)
            for i in range(num_partitions)
        ]

    def fetch_range(batch: pa.Table) -> pa.Table:
        import duckdb as _duckdb

        out = []
        for i in batch.column("id").to_pylist():
            b_lo, b_hi = bounds[i]
            if b_lo is None and b_hi is None:
                rng = "TRUE"
            elif b_hi is None:
                rng = f"({qsplit} >= {b_lo} OR {qsplit} IS NULL)" \
                    if i == 0 else f"{qsplit} >= {b_lo}"
            else:
                rng = f"{qsplit} >= {b_lo} AND {qsplit} < {b_hi}"
                if i == 0:
                    rng = f"({rng} OR {qsplit} IS NULL)"
            c = _duckdb.connect(db_path, read_only=True)
            try:
                t = c.execute(
                    f"SELECT {cols} FROM {qtable} WHERE {rng}{where_extra}"
                ).fetch_arrow_table()
            finally:
                c.close()
            if t.num_rows:
                out.append(t)
        if not out:
            return empty  # schema-carrying empty block
        return pa.concat_tables(out)

    ids = rd.range(len(bounds)).repartition(len(bounds))
    return ids.map_batches(fetch_range, batch_format="pyarrow", batch_size=1)


def write_rdbms(
    ds: rd.Dataset,
    db_path: str,
    table: str,
    staging_dir: str,
    mode: str = "append",
) -> int:
    """sqoop-export analog: stage the Dataset as partitioned parquet
    (each Ray task writes its own file — restartable), then commit with
    ONE transactional INSERT on the driver. Returns rows written.

    ``mode``: 'append' adds to an existing table, 'overwrite' replaces
    it, 'create' fails if it exists. Returns the number of rows THIS
    call inserted (counted from the staged parquet, not the table
    total). Each call stages into a fresh unique subdirectory of
    ``staging_dir`` — a retry after a pre-commit crash (or a second
    export sharing the dir) can never re-insert the dead attempt's
    files — and dead attempts are reaped on the next call, so a
    long-running export loop does not leak disk (``fresh_stage``).
    """
    import duckdb
    import pyarrow.parquet as _pq

    if mode not in ("append", "overwrite", "create"):
        raise ValueError(f"mode={mode!r}")
    stage = fresh_stage(staging_dir)
    ds.write_parquet(stage)
    glob = os.path.join(stage, "*.parquet")

    n_staged = sum(
        _pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(glob)
    )
    qtable = qident(table)
    con = duckdb.connect(db_path)
    in_txn = False
    try:
        con.execute("BEGIN")
        in_txn = True
        # table_schema filter: a same-named table in ANOTHER schema
        # must not flip the CREATE-vs-INSERT decision for this one
        exists = con.execute(
            "SELECT count(*) FROM information_schema.tables "
            "WHERE table_name = ? AND table_schema = current_schema()",
            [table]
        ).fetchone()[0]
        if mode == "create" and exists:
            raise ValueError(f"table {table} already exists")
        if mode == "overwrite":
            con.execute(f"DROP TABLE IF EXISTS {qtable}")
            exists = 0
        if not exists:
            con.execute(
                f"CREATE TABLE {qtable} AS "
                f"SELECT * FROM read_parquet('{glob}')"
            )
        else:
            con.execute(
                f"INSERT INTO {qtable} SELECT * FROM read_parquet('{glob}')"
            )
        con.execute("COMMIT")
        in_txn = False
        # rows are durable in the RDBMS — the staged copy is garbage
        shutil.rmtree(stage, ignore_errors=True)
        return int(n_staged)
    except Exception:
        if in_txn:
            try:  # never mask the real error with a rollback failure
                con.execute("ROLLBACK")
            except Exception:
                pass
        raise
    finally:
        con.close()
