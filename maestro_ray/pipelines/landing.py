"""Landing-zone → changelog conversion (maestro's ``upload → load``
lifecycle, SURVEY.md §3 pre-EP1).

The maestro lineage ingests pipe-delimited landing files with per-field
cleaners/validators and an error threshold [M]. Here: text files named
``*.txt`` in a landing dir, one change event per line::

    offset|op|url|warc_ts_iso|html_base64|lang

are discovered idempotently (io/readers.py:LandingZone), parsed with
the vectorized delimited decoder (quarantine channel for bad rows,
abort over the error threshold), typed to CHANGELOG_V3, and written as
``seg-<first_offset>.parquet`` — after which the normal ``ingest``
replay applies them with full exactly-once semantics.
"""

from __future__ import annotations

import base64
import binascii
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from maestro_ray.core.schema import CHANGELOG_V3
from maestro_ray.io.readers import LandingZone, parse_delimited_batch

#: the delimited wire schema (all strings; typed below)
_WIRE = pa.schema(
    [
        ("offset", pa.string()),
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.string()),
        ("html_b64", pa.string()),
        ("lang", pa.string()),
    ]
)


def _typed(batch: pa.Table) -> pa.Table:
    """Wire strings → CHANGELOG_V3 (+ carries _error_reason through)."""
    err = batch.column("_error_reason").to_pylist()
    offs = []
    for v in batch.column("offset").to_pylist():
        try:
            offs.append(int(v) if v is not None else None)
        except ValueError:
            offs.append(None)
    htmls = []
    for i, v in enumerate(batch.column("html_b64").to_pylist()):
        if v is None or v == "":
            htmls.append(None)
            continue
        try:
            htmls.append(base64.b64decode(v, validate=True))
        except (binascii.Error, ValueError):
            htmls.append(None)
            if err[i] is None:
                err[i] = "bad_base64"
    try:
        ts = batch.column("warc_ts").cast(pa.timestamp("us"))
    except pa.ArrowInvalid:
        ts_vals = []
        for i, v in enumerate(batch.column("warc_ts").to_pylist()):
            try:
                ts_vals.append(
                    pa.scalar(v, pa.string()).cast(pa.timestamp("us")).as_py()
                )
            except (pa.ArrowInvalid, ValueError):
                ts_vals.append(None)
                if err[i] is None:
                    err[i] = "bad_timestamp"
        ts = pa.array(ts_vals, pa.timestamp("us"))
    return pa.Table.from_arrays(
        [
            pa.array(offs, pa.int64()),
            batch.column("op"),
            batch.column("url"),
            ts,
            pa.array(htmls, pa.binary()),
            batch.column("lang"),
            pa.array(err, pa.string()),
        ],
        names=[*[f.name for f in CHANGELOG_V3], "_error_reason"],
    )


def convert_landing_files(
    landing_dir: str,
    log_dir: str,
    delimiter: str = "|",
    error_threshold: float = 0.05,
    pattern: str = "*.txt",
) -> list[str]:
    """Discover new landing files, convert each to one typed changelog
    segment, commit the registry. Returns the segment paths written.

    Rows failing parse/typing are quarantined to
    ``log_dir/_quarantine/<file>.parquet``; if a file's failed fraction
    exceeds ``error_threshold`` the file is REJECTED (maestro-style
    load abort) and left un-committed for inspection.
    """
    os.makedirs(log_dir, exist_ok=True)
    lz = LandingZone(landing_dir)
    written: list[str] = []
    done: list[str] = []
    for path in lz.discover(pattern):
        ds = rd.read_text(path)
        typed = ds.map_batches(
            lambda t: _typed(
                parse_delimited_batch(t, _WIRE, delimiter=delimiter)
            ),
            batch_format="pyarrow",
        )
        tbl = pa.concat_tables(
            list(typed.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
        bad_mask = pc.or_kleene(
            pc.is_valid(tbl.column("_error_reason")),
            pc.is_null(tbl.column("offset")),
        )
        bad = tbl.filter(bad_mask)
        ok = tbl.filter(pc.invert(bad_mask)).drop_columns(["_error_reason"])
        frac = bad.num_rows / max(1, tbl.num_rows)
        if bad.num_rows:
            qdir = os.path.join(log_dir, "_quarantine")
            os.makedirs(qdir, exist_ok=True)
            import pyarrow.parquet as pq

            pq.write_table(
                bad, os.path.join(qdir, os.path.basename(path) + ".parquet")
            )
        if frac > error_threshold:
            continue  # rejected: stays undiscovered-committed for retry
        if ok.num_rows == 0:
            done.append(path)
            continue
        import pyarrow.parquet as pq

        first = pc.min(ok.column("offset")).as_py()
        idx = pc.sort_indices(ok, sort_keys=[("offset", "ascending")])
        seg = os.path.join(log_dir, f"seg-{first:012d}.parquet")
        pq.write_table(ok.take(idx).cast(CHANGELOG_V3), seg)
        written.append(seg)
        done.append(path)
    lz.commit(done)
    return written
