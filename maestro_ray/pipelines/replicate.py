"""Incremental lake → RDBMS replication (CDC-out, exactly-once).

Maintains an RDBMS replica of the lake's LIVE state by applying the
net change feed (``pipelines/changefeed.table_changes``) epoch range by
epoch range. The replication cursor (last applied epoch) lives in a
sidecar table INSIDE the target database and is updated in the SAME
transaction as the apply — a crash anywhere leaves replica + cursor
consistent at the previous epoch, and a re-run applies the missed
range exactly once (the staged parquet pattern from ``io/rdbms``:
each attempt stages into a fresh directory, dead attempts are never
re-read).

Apply semantics per net feed row: upsert = DELETE url + INSERT row;
delete = DELETE url. The feed is net over the range, so one
transaction per catch-up call — not per epoch — is sufficient and
keeps the replica always at a committed epoch boundary.

Scale shape: the feed is one Ray task per changed partition (no
shuffle); staging is a parallel parquet write; only the single
transactional SQL statement runs on the driver, reading the staged
files directly (``read_parquet`` inside the INSERT — rows never
transit Python).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

import ray.data as rd

from maestro_ray.core.manifest import list_epochs
from maestro_ray.io.rdbms import fresh_stage


def _cursor_table(table: str) -> str:
    return f"{table}__replication_cursor"


def replication_cursor(db_path: str, table: str) -> int | None:
    """Last replicated epoch, or None before the first load."""
    import duckdb

    if not os.path.exists(db_path):
        return None
    con = duckdb.connect(db_path, read_only=True)
    try:
        tabs = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
        if _cursor_table(table) not in tabs:
            return None
        row = con.execute(
            f'SELECT epoch FROM "{_cursor_table(table)}"').fetchone()
        return int(row[0]) if row else None
    finally:
        con.close()


def replicate_to_rdbms(
    lake_dir: str,
    db_path: str,
    table: str,
    staging_dir: str,
    payload_columns: tuple[str, ...] = ("lang",),
    to_epoch: int | None = None,
) -> dict:
    """Catch the replica up to ``to_epoch`` (default: newest committed
    epoch). First call does a full load of the live state; later calls
    apply only the net change feed since the cursor. Idempotent: a
    call with nothing new applies nothing. Returns
    ``{"from_epoch", "to_epoch", "applied_rows"}``."""
    import duckdb

    epochs = list_epochs(lake_dir)
    if not epochs:
        raise ValueError(f"no committed epochs in {lake_dir}")
    if to_epoch is None:
        to_epoch = epochs[-1]
    if to_epoch not in epochs:
        raise ValueError(f"epoch {to_epoch} was never committed "
                         f"(history: {epochs[:3]}…{epochs[-3:]})")
    cursor = replication_cursor(db_path, table)
    if cursor is not None and cursor >= to_epoch:
        return {"from_epoch": cursor, "to_epoch": cursor,
                "applied_rows": 0}

    from maestro_ray.pipelines.changefeed import table_changes

    cols = ["url", "warc_ts", *payload_columns]
    # Both paths read via the change feed: from_epoch=None is genesis
    # (everything live at to_epoch is an insert), and its per-partition
    # reader null-fills payload columns missing from pre-evolution
    # files — read_lake_at(columns=...) would crash on those instead.
    feed = table_changes(lake_dir, cursor, to_epoch,
                         payload_columns=tuple(payload_columns))
    full_load = cursor is None

    stage = fresh_stage(staging_dir)
    if feed is not None:
        feed.write_parquet(stage)
    files = _glob.glob(os.path.join(stage, "*.parquet"))

    col_list = ", ".join(f'"{c}"' for c in cols)
    con = duckdb.connect(db_path)
    try:
        con.execute("BEGIN")
        con.execute(
            f'CREATE TABLE IF NOT EXISTS "{_cursor_table(table)}" '
            "(epoch BIGINT)")
        if full_load:
            src = (f"SELECT {col_list} FROM read_parquet(?)"
                   if files else None)
            con.execute(f'DROP TABLE IF EXISTS "{table}"')
            if src:
                con.execute(f'CREATE TABLE "{table}" AS {src}', [files])
            else:  # empty lake at to_epoch: empty replica, typed
                con.execute(
                    f'CREATE TABLE "{table}" '
                    '(url VARCHAR, warc_ts TIMESTAMP'
                    + "".join(f', "{c}" VARCHAR'
                              for c in payload_columns) + ")")
            applied = con.execute(
                f'SELECT count(*) FROM "{table}"').fetchone()[0]
        elif files:
            con.execute(
                f'CREATE TEMP TABLE __feed AS SELECT * '
                f'FROM read_parquet(?)', [files])
            con.execute(
                f'DELETE FROM "{table}" WHERE url IN '
                "(SELECT url FROM __feed)")
            con.execute(
                f'INSERT INTO "{table}" SELECT {col_list} FROM __feed '
                "WHERE change_op != 'delete'")
            applied = con.execute(
                "SELECT count(*) FROM __feed").fetchone()[0]
        else:
            applied = 0
        con.execute(f'DELETE FROM "{_cursor_table(table)}"')
        con.execute(
            f'INSERT INTO "{_cursor_table(table)}" VALUES (?)',
            [to_epoch])
        con.execute("COMMIT")
    except Exception:
        con.execute("ROLLBACK")
        raise
    finally:
        con.close()
    # rows are durable in the replica — the staged copy is garbage
    # (a replication daemon must not leak one feed copy per catch-up)
    shutil.rmtree(stage, ignore_errors=True)
    return {"from_epoch": cursor, "to_epoch": to_epoch,
            "applied_rows": int(applied)}
