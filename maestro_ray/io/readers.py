"""Generic sources + landing-zone intake (SURVEY.md §2 S8, S9).

Maestro's load side ingests delimited landing files discovered in an
upload area, idempotently (already-ingested files are skipped) [M].
Here: ``LandingZone`` is a pure-Python segment registry (a JSON file
next to the log dir — tiny driver-side state, no Ray needed), and the
generic readers are thin prunable wrappers over ``ray.data``.
"""

from __future__ import annotations

import glob as _glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read_csv(paths, **kw) -> rd.Dataset:
    return rd.read_csv(paths, **kw)


def read_json(paths, **kw) -> rd.Dataset:
    return rd.read_json(paths, **kw)


def read_text(paths, **kw) -> rd.Dataset:
    return rd.read_text(paths, **kw)


def read_binary(paths, include_paths: bool = True, **kw) -> rd.Dataset:
    return rd.read_binary_files(paths, include_paths=include_paths, **kw)


def parse_delimited_batch(
    batch: pa.Table,
    schema: pa.Schema,
    delimiter: str = "|",
    text_col: str = "text",
    none_sentinel: str = "",
) -> pa.Table:
    """P1: maestro-style delimited-line decode → typed columns.

    Rows with the wrong field count or uncastable fields become nulls in
    every column plus ``_error_reason`` — the quarantine channel shape
    (pair with ops.parse.validate_split)."""
    names = [f.name for f in schema]
    cols: dict[str, list] = {n: [] for n in names}
    errors: list[str | None] = []
    for line in batch.column(text_col).to_pylist():
        parts = (line or "").split(delimiter)
        if len(parts) != len(names):
            for n in names:
                cols[n].append(None)
            errors.append(f"field_count={len(parts)}!={len(names)}")
            continue
        errors.append(None)
        for n, v in zip(names, parts):
            cols[n].append(None if v == none_sentinel else v)
    arrays = []
    for f in schema:
        arr = pa.array(cols[f.name], pa.string())
        try:
            arrays.append(arr.cast(f.type))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # per-row salvage cast: bad cells -> null
            vals = []
            for v in cols[f.name]:
                try:
                    vals.append(pa.scalar(v, pa.string()).cast(f.type).as_py())
                except (pa.ArrowInvalid, ValueError, TypeError):
                    vals.append(None)
            arrays.append(pa.array(vals, f.type))
    arrays.append(pa.array(errors, pa.string()))
    return pa.Table.from_arrays(arrays, names=names + ["_error_reason"])


def parse_fixed_width_batch(
    batch: pa.Table,
    schema: pa.Schema,
    widths: list[int],
    text_col: str = "text",
    pad: str = " ",
    none_sentinel: str = "",
) -> pa.Table:
    """P1 (fixed-width variant): maestro's load path also parses
    fixed-width landing files [M]. Each line is sliced at the cumulative
    ``widths`` offsets, fields are stripped of ``pad``; a line shorter
    than the record length (or empty) quarantines with nulls in every
    column plus ``_error_reason`` — same channel shape as
    ``parse_delimited_batch``. Longer lines keep their trailing extra
    bytes ignored (fixed-width records are prefix-addressed).
    """
    if len(widths) != len(schema):
        raise ValueError(
            f"{len(widths)} widths for {len(schema)} schema fields"
        )
    names = [f.name for f in schema]
    offsets = [0]
    for w in widths:
        offsets.append(offsets[-1] + w)
    record_len = offsets[-1]
    cols: dict[str, list] = {n: [] for n in names}
    errors: list[str | None] = []
    for line in batch.column(text_col).to_pylist():
        line = line or ""
        if len(line) < record_len:
            for n in names:
                cols[n].append(None)
            errors.append(f"line_len={len(line)}<{record_len}")
            continue
        errors.append(None)
        for i, n in enumerate(names):
            v = line[offsets[i] : offsets[i + 1]].strip(pad)
            cols[n].append(None if v == none_sentinel else v)
    arrays = []
    for f in schema:
        arr = pa.array(cols[f.name], pa.string())
        try:
            arrays.append(arr.cast(f.type))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            vals = []
            for v in cols[f.name]:
                try:
                    vals.append(pa.scalar(v, pa.string()).cast(f.type).as_py())
                except (pa.ArrowInvalid, ValueError, TypeError):
                    vals.append(None)
            arrays.append(pa.array(vals, f.type))
    arrays.append(pa.array(errors, pa.string()))
    return pa.Table.from_arrays(arrays, names=names + ["_error_reason"])


def _infer_field_type(values: list[str | None]) -> pa.DataType:
    """Most specific Arrow type EVERY non-null sample casts to.

    Preference order: int64 → float64 → bool → date32 → timestamp(us)
    → string. Conservative by construction: one uncastable sample
    demotes the column (quarantine rows must not silently narrow a
    production feed's contract), and an all-null/empty sample column
    stays string — the widest landing type, evolvable later via
    ``core.schema.check_evolvable``."""
    vals = [v for v in values if v is not None]
    if not vals:
        return pa.string()
    arr = pa.array(vals, pa.string())

    def casts(t: pa.DataType) -> bool:
        try:
            arr.cast(t)
            return True
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return False

    if casts(pa.int64()):
        return pa.int64()
    if casts(pa.float64()):
        return pa.float64()
    if {v.lower() for v in vals} <= {"true", "false"}:
        return pa.bool_()
    if casts(pa.date32()):  # before timestamp: dates also cast to ts
        return pa.date32()
    if casts(pa.timestamp("us")):
        return pa.timestamp("us")
    return pa.string()


def infer_schema(
    lines: list[str],
    delimiter: str | None = "|",
    widths: list[int] | None = None,
    names: list[str] | None = None,
    header: bool = False,
    none_sentinel: str = "",
) -> pa.Schema:
    """Propose a typed contract from sample lines of a landing feed
    (maestro parity: the companion module infers schemas from raw
    samples — SURVEY.md §1.1 [M], VERDICT r2 missing #2).

    Delimited mode (``delimiter``): the field count is the MAJORITY
    count across samples; minority lines (the rows
    ``parse_delimited_batch`` would quarantine) are excluded from type
    voting. Fixed-width mode (``widths``): fields are sliced at the
    cumulative offsets; short lines are excluded. ``header`` takes
    column names from the first line; otherwise ``names`` or ``c0..cN``.

    The result round-trips: ``parse_delimited_batch(batch,
    infer_schema(sample))`` yields typed columns with no salvage
    casting on the sampled rows, and the schema is a valid
    ``check_evolvable`` target for later widening.
    """
    if widths is not None and delimiter is not None and delimiter != "|":
        raise ValueError("pass either delimiter or widths, not both")
    lines = [ln for ln in lines if ln is not None]
    if header:
        if not lines:
            raise ValueError("header=True but no sample lines")
        head, lines = lines[0], lines[1:]
    if not lines:
        raise ValueError("no sample lines to infer from")

    if widths is not None:
        offsets = [0]
        for w in widths:
            offsets.append(offsets[-1] + w)
        record_len = offsets[-1]
        rows = [
            [ln[offsets[i]: offsets[i + 1]].strip(" ") for i in range(len(widths))]
            for ln in lines
            if len(ln) >= record_len
        ]
        if not rows:
            raise ValueError("every sample line shorter than the record")
        n_fields = len(widths)
        if header:
            hdr = [head[offsets[i]: offsets[i + 1]].strip(" ")
                   for i in range(len(widths))]
        else:
            hdr = None
    else:
        from collections import Counter

        split = [ln.split(delimiter) for ln in lines]
        counts = Counter(len(s) for s in split)
        n_fields = counts.most_common(1)[0][0]
        rows = [s for s in split if len(s) == n_fields]
        hdr = head.split(delimiter) if header else None
        if hdr is not None and len(hdr) != n_fields:
            raise ValueError(
                f"header has {len(hdr)} fields, data majority {n_fields}"
            )

    if names is not None:
        if len(names) != n_fields:
            raise ValueError(f"{len(names)} names for {n_fields} fields")
        out_names = list(names)
    elif hdr is not None:
        out_names = hdr
    else:
        out_names = [f"c{i}" for i in range(n_fields)]

    fields = []
    for i, name in enumerate(out_names):
        col = [None if r[i] == none_sentinel else r[i] for r in rows]
        fields.append(pa.field(name, _infer_field_type(col)))
    return pa.schema(fields)


def infer_schema_file(
    path: str,
    n_sample: int = 100,
    **kw,
) -> pa.Schema:
    """``infer_schema`` over the first ``n_sample`` lines of a landing
    file — the onboarding helper (driver-side, no Ray)."""
    lines: list[str] = []
    with open(path, "r", errors="replace") as f:
        for ln in f:
            lines.append(ln.rstrip("\r\n"))
            if len(lines) >= n_sample:
                break
    return infer_schema(lines, **kw)


class LandingZone:
    """S9: idempotent landing-file intake.

    ``discover()`` returns files matching the pattern that have not been
    ingested yet; ``commit(files)`` records them (atomic rename of the
    registry). Re-running after a crash re-offers uncommitted files —
    pairs with the manifest watermark so double-ingest is harmless.
    """

    def __init__(self, landing_dir: str, registry_path: str | None = None):
        self.landing_dir = landing_dir
        self.registry_path = registry_path or os.path.join(
            landing_dir, "_ingested.json"
        )

    def _load(self) -> set[str]:
        if not os.path.exists(self.registry_path):
            return set()
        with open(self.registry_path) as f:
            return set(json.load(f)["files"])

    def discover(self, pattern: str = "*.parquet") -> list[str]:
        seen = self._load()
        found = sorted(
            p
            for p in _glob.glob(os.path.join(self.landing_dir, pattern))
            if os.path.basename(p) not in seen
        )
        return found

    def commit(self, files: list[str]) -> None:
        seen = self._load()
        seen.update(os.path.basename(p) for p in files)
        tmp = self.registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"files": sorted(seen)}, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.registry_path)


# ------------------------------------------------------------ WARC intake

#: headers surfaced as columns; everything else is ignored (tolerant
#: reader — unknown headers must not break intake)
_WARC_HEADERS = {
    "warc-type": "warc_type",
    "warc-target-uri": "url",
    "warc-date": "warc_date",
    "warc-record-id": "record_id",
    "content-type": "content_type",
}


def parse_warc_blob(blob: bytes) -> list[dict]:
    """Parse one WARC 1.0/1.1 file body (already decompressed) into
    record dicts — stdlib-only, tolerant: records with a malformed
    header block or truncated payload stop the scan of THIS blob
    (quarantine the shard, keep the run alive) rather than raising.
    Payload bytes are sliced zero-copy via memoryview until the final
    per-record bytes() materialization."""
    out: list[dict] = []
    mv = memoryview(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not blob[pos:pos + 5] == b"WARC/":
            break  # not a record boundary: stop scanning this shard
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        rec: dict = {v: None for v in _WARC_HEADERS.values()}
        length = None
        for line in bytes(mv[pos:hdr_end]).split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            key = k.strip().lower().decode("ascii", "replace")
            val = v.strip().decode("utf-8", "replace")
            if key == "content-length":
                try:
                    length = int(val)
                except ValueError:
                    length = None
            elif key in _WARC_HEADERS:
                rec[_WARC_HEADERS[key]] = val
        if length is None or hdr_end + 4 + length > n:
            break  # malformed/truncated: quarantine the rest
        rec["payload"] = bytes(mv[hdr_end + 4:hdr_end + 4 + length])
        rec["content_length"] = length
        out.append(rec)
        pos = hdr_end + 4 + length
    return out


def parse_warc_batch(batch: pa.Table, bytes_col: str = "bytes",
                     path_col: str = "path") -> pa.Table:
    """Batch adapter over ``parse_warc_blob`` for ``read_binary``
    output (one row per WARC shard file). Gzipped shards (.warc.gz —
    one gzip member per record OR whole-file, both are valid gzip
    streams) are detected by magic bytes and inflated with stdlib
    zlib (multi-member aware)."""
    import gzip as _gzip

    cols = {k: [] for k in ("path", "warc_type", "url", "warc_date",
                            "record_id", "content_type",
                            "content_length", "payload")}
    paths = (batch.column(path_col).to_pylist()
             if path_col in batch.column_names
             else [None] * batch.num_rows)
    for path, blob in zip(paths, batch.column(bytes_col).to_pylist()):
        if blob[:2] == b"\x1f\x8b":
            blob = _gzip.decompress(blob)  # handles multi-member
        for rec in parse_warc_blob(blob):
            cols["path"].append(path)
            for k in ("warc_type", "url", "warc_date", "record_id",
                      "content_type", "content_length", "payload"):
                cols[k].append(rec[k])
    return pa.table({
        "path": pa.array(cols["path"], pa.string()),
        "warc_type": pa.array(cols["warc_type"], pa.string()),
        "url": pa.array(cols["url"], pa.string()),
        "warc_date": pa.array(cols["warc_date"], pa.string()),
        "record_id": pa.array(cols["record_id"], pa.string()),
        "content_type": pa.array(cols["content_type"], pa.string()),
        "content_length": pa.array(cols["content_length"], pa.int64()),
        "payload": pa.array(cols["payload"], pa.binary()),
    })


def read_warc(paths, record_types: list[str] | None = None,
              **kw) -> rd.Dataset:
    """S8 webtext source: WARC shard files → one row per record
    (path, warc_type, url, warc_date, record_id, content_type,
    content_length, payload). The shard FILE is the unit of
    parallelism (the Common-Crawl layout: many ~1 GB shards), so
    intake scales with the file count; per-record work is the
    streaming ``parse_warc_batch`` map. ``record_types`` filters (e.g.
    ["response"]) before anything else touches the payload bytes."""
    ds = read_binary(paths, include_paths=True, **kw).map_batches(
        parse_warc_batch, batch_format="pyarrow")
    if record_types:
        allowed = list(record_types)
        ds = ds.map_batches(
            lambda t: t.filter(pc.is_in(t.column("warc_type"),
                                        value_set=pa.array(allowed))),
            batch_format="pyarrow")
    return ds


def read_orc(paths, columns: list[str] | None = None, **kw) -> rd.Dataset:
    """S8/S10 source (r4): ORC files → rows, via pyarrow's ORC reader
    inside the read tasks (Ray 2.49 ships no native read_orc). The
    FILE is the unit of parallelism — the right grain for the
    many-files lake layout this engine writes everywhere; ``columns``
    prunes at the decoder (ORC is columnar — unread columns cost no
    decode, same contract as read_parquet's pruning)."""

    def decode(batch: pa.Table):
        import io as _io

        import pyarrow.orc as _orc

        outs = []
        for i in range(batch.num_rows):
            f = _orc.ORCFile(_io.BytesIO(batch.column("bytes")[i].as_py()))
            outs.append(f.read(columns=columns))
        # generator: an empty input batch yields NO block (a 0-column
        # pa.table({}) would diverge from sibling blocks' ORC schema —
        # the repo's documented empty-schema pitfall)
        if outs:
            yield pa.concat_tables(outs, promote_options="default")

    return read_binary(paths, include_paths=True, **kw).map_batches(
        decode, batch_format="pyarrow")


def parse_xml_blob(blob: bytes, record_tag: str,
                   fields: list[str]) -> list[dict]:
    """Stream-parse one XML shard into record dicts — stdlib
    ``iterparse`` (bounded memory: each record element is cleared after
    extraction, the DOM never holds the whole shard), tolerant: a
    malformed document stops the scan of THIS blob after the records
    already parsed (quarantine the shard, keep the run alive), same
    stance as ``parse_warc_blob``. Each record is one ``<record_tag>``
    element; ``fields`` name its child elements (missing child → null;
    element text is the value, entity-unescaped by the parser — an
    exact round-trip of ``fixtures.write_xml``)."""
    import io as _io
    import xml.etree.ElementTree as ET

    out: list[dict] = []
    try:
        for _ev, el in ET.iterparse(_io.BytesIO(blob), events=("end",)):
            if el.tag != record_tag:
                continue
            rec = {}
            for f in fields:
                child = el.find(f)
                rec[f] = None if child is None else (child.text or "")
            out.append(rec)
            el.clear()
    except ET.ParseError:
        pass  # truncated/malformed shard: keep what parsed, stop here
    return out


def parse_xml_batch(batch: pa.Table, record_tag: str,
                    fields: dict[str, pa.DataType]):
    """Decode a (path, bytes) batch of XML shards into typed rows.
    ``fields`` maps child-element name → Arrow type (values are parsed
    from element text; non-string types via pyarrow cast — a bad
    literal fails loudly). Generator: empty batches yield no block
    (the repo's documented empty-schema pitfall)."""
    names = list(fields)
    cols: dict[str, list] = {f: [] for f in names}
    paths: list[str] = []
    for i in range(batch.num_rows):
        blob = batch.column("bytes")[i].as_py()
        path = batch.column("path")[i].as_py() \
            if "path" in batch.column_names else None
        for rec in parse_xml_blob(blob, record_tag, names):
            paths.append(path)
            for f in names:
                cols[f].append(rec[f])
    if paths:
        arrays = {"path": pa.array(paths, pa.string())}
        for f, typ in fields.items():
            a = pa.array(cols[f], pa.string())
            arrays[f] = a if pa.types.is_string(typ) else a.cast(typ)
        yield pa.table(arrays)


def read_xml(paths, record_tag: str,
             fields: dict[str, pa.DataType], **kw) -> rd.Dataset:
    """S8 source: XML shard files (sitemap/feed/record-export layout)
    → one row per ``<record_tag>`` element with typed columns. The
    shard FILE is the unit of parallelism, per-record work is the
    streaming ``iterparse`` map — intake scales with file count, no
    whole-DOM materialization."""
    return read_binary(paths, include_paths=True, **kw).map_batches(
        lambda t: parse_xml_batch(t, record_tag, fields),
        batch_format="pyarrow")
