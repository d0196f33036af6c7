"""Avro Object Container File source (SURVEY/VERDICT r3 "what's
missing" #3 — the lake-format matrix beyond Parquet/CSV/JSON/WARC).

Pure-stdlib reader for the sqoop/landing shape: files whose schema is a
flat RECORD of primitives (null/boolean/int/long/float/double/bytes/
string), each field optionally nullable via the standard
``["null", T]`` union, with ``timestamp-micros``/``timestamp-millis``
logical types mapped to Arrow timestamps. Codecs: ``null`` and
``deflate`` (zlib). Anything outside that subset fails LOUDLY with the
unsupported construct named — never a silent wrong decode.

Scale shape mirrors ``read_warc``: the FILE is the unit of parallelism
(one read task per container file), per-blob decode is a streaming
``map_batches``. Row materialization is a Python loop over the block's
varints — inherent to Avro's row-major varint layout (the same work
fastavro's cython does); keep Avro at the LANDING edge and convert to
Parquet once, like every lakehouse does.

A matching pure-stdlib writer (``write_avro``) exists for fixtures and
round-trip oracles — same subset, null codec.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.compute as pc  # noqa: F401  (parity with sibling readers)
import ray.data as rd

_MAGIC = b"Obj\x01"

_PRIM_ARROW = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
    "null": pa.null(),
}


def _arrow_type(avro_type) -> tuple[pa.DataType, str, bool]:
    """(arrow type, primitive reader key, nullable) for one field type.
    Supports primitives, ``["null", prim]`` unions (either order), and
    timestamp logical types on long/int."""
    if isinstance(avro_type, list):
        branches = [t for t in avro_type if t != "null"]
        if len(avro_type) > 2 or len(branches) != 1:
            raise ValueError(
                f"unsupported Avro union {avro_type!r}: only "
                '["null", <primitive>] is supported'
            )
        typ, key, _ = _arrow_type(branches[0])
        return typ, key, True
    if isinstance(avro_type, dict):
        logical = avro_type.get("logicalType")
        base = avro_type.get("type")
        if logical == "timestamp-micros" and base == "long":
            return pa.timestamp("us"), "long", False
        if logical == "timestamp-millis" and base == "long":
            return pa.timestamp("ms"), "long", False
        if logical is None and isinstance(base, str):
            return _arrow_type(base)
        raise ValueError(
            f"unsupported Avro type {avro_type!r} (records of "
            "primitives + nullable unions + timestamp logical types "
            "only)"
        )
    if avro_type in _PRIM_ARROW:
        return _PRIM_ARROW[avro_type], avro_type, avro_type == "null"
    raise ValueError(
        f"unsupported Avro type {avro_type!r} (records of primitives "
        "+ nullable unions + timestamp logical types only)"
    )


class _Reader:
    """Sequential binary-Avro primitive decoder over one buffer."""

    __slots__ = ("b", "pos")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def long(self) -> int:  # zigzag varint (int shares this)
        b, pos, shift, acc = self.b, self.pos, 0, 0
        while True:
            byte = b[pos]
            pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        v = self.b[self.pos : self.pos + n]
        if len(v) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return v

    def read(self, key: str):
        if key == "long" or key == "int":
            return self.long()
        if key == "string":
            return self.raw(self.long()).decode("utf-8")
        if key == "bytes":
            return self.raw(self.long())
        if key == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if key == "float":
            return struct.unpack("<f", self.raw(4))[0]
        if key == "boolean":
            return self.raw(1) != b"\x00"
        if key == "null":
            return None
        raise ValueError(f"unsupported primitive {key!r}")


def parse_avro_blob(blob: bytes) -> pa.Table:
    """One Avro container file → Arrow table (schema from the header)."""
    if blob[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(blob)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:  # metadata map: blocks of (count, k, v)*, 0-terminated
        n = r.long()
        if n == 0:
            break
        if n < 0:  # negative count variant: size follows
            n = -n
            r.long()
        for _ in range(n):
            k = r.raw(r.long()).decode("utf-8")
            meta[k] = r.raw(r.long())
    sync = r.raw(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"unsupported Avro codec {codec!r} (null/deflate only)")
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise ValueError(
            f"unsupported top-level Avro schema {schema.get('type')!r} "
            "(record only)")
    fields = []
    for f in schema["fields"]:
        typ, key, nullable = _arrow_type(f["type"])
        # union branch order matters for the index decode
        branches = (f["type"] if isinstance(f["type"], list) else None)
        fields.append((f["name"], typ, key, nullable, branches))

    cols: dict[str, list] = {name: [] for name, *_ in fields}
    while r.pos < len(blob):
        count = r.long()
        size = r.long()
        data = r.raw(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        if r.raw(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
        br = _Reader(data)
        for _ in range(count):
            for name, _typ, key, nullable, branches in fields:
                if branches is not None:
                    idx = br.long()
                    branch = branches[idx]
                    cols[name].append(
                        None if branch == "null" else br.read(key))
                else:
                    cols[name].append(br.read(key))
    arrays = []
    for name, typ, key, _n, _b in fields:
        vals = cols[name]
        if pa.types.is_timestamp(typ):
            arrays.append(pa.array(vals, pa.int64()).cast(typ))
        else:
            arrays.append(pa.array(vals, typ))
    return pa.Table.from_arrays(
        arrays, schema=pa.schema([(n, t) for n, t, *_ in fields]))


def parse_avro_batch(batch: pa.Table):
    """(path, bytes) rows → concatenated record rows with a ``path``
    provenance column. Generator: an empty input batch yields NO block
    (a path-only table would diverge from sibling blocks' record
    schema — the repo's documented empty-schema pitfall)."""
    outs = []
    for i in range(batch.num_rows):
        t = parse_avro_blob(batch.column("bytes")[i].as_py())
        outs.append(t.append_column(
            "path", pa.array([batch.column("path")[i].as_py()] * t.num_rows,
                             pa.string())))
    if outs:
        yield pa.concat_tables(outs, promote_options="default")


def read_avro(paths, **kw) -> rd.Dataset:
    """S8/S10 source: Avro container files → one row per record. The
    FILE is the unit of parallelism; decode is a streaming map."""
    from maestro_ray.io.readers import read_binary

    return read_binary(paths, include_paths=True, **kw).map_batches(
        parse_avro_batch, batch_format="pyarrow")


# ------------------------------------------------------------- writer


def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_schema_of(table: pa.Table) -> dict:
    back = {
        pa.bool_(): "boolean", pa.int32(): "int", pa.int64(): "long",
        pa.float32(): "float", pa.float64(): "double",
        pa.binary(): "bytes", pa.string(): "string",
        pa.large_string(): "string", pa.large_binary(): "bytes",
    }
    fields = []
    for f in table.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "us":
            t: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif f.type in back:
            t = back[f.type]
        else:
            raise ValueError(f"write_avro: unsupported type {f.type}")
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": "row", "fields": fields}


def write_avro(path: str, table: pa.Table, block_rows: int = 4096,
               codec: str = "null") -> int:
    """Pure-stdlib Avro container writer (null/deflate codec, every
    field nullable) — the fixture/round-trip half of ``read_avro``.
    Returns rows written; atomic (tmp + rename)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"write_avro: unsupported codec {codec!r}")
    schema = _avro_schema_of(table)
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07" * 2
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    buf.write(_zigzag(len(meta)))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        buf.write(_zigzag(len(kb)) + kb + _zigzag(len(v)) + v)
    buf.write(_zigzag(0))
    buf.write(sync)

    def enc(v, key: str) -> bytes:
        if key == "long" or key == "int":
            return _zigzag(int(v))
        if key == "string":
            vb = v.encode("utf-8")
            return _zigzag(len(vb)) + vb
        if key == "bytes":
            return _zigzag(len(v)) + bytes(v)
        if key == "double":
            return struct.pack("<d", float(v))
        if key == "float":
            return struct.pack("<f", float(v))
        if key == "boolean":
            return b"\x01" if v else b"\x00"
        raise ValueError(key)

    keys = []
    for f in schema["fields"]:
        t = f["type"][1]
        keys.append(t["type"] if isinstance(t, dict) else t)
    # timestamps serialize as exact int64 micros (no float round-trip)
    pyrows = [
        (table.column(c).cast(pa.int64())
         if pa.types.is_timestamp(table.schema.field(c).type)
         else table.column(c)).to_pylist()
        for c in table.column_names
    ]
    n = table.num_rows
    for lo in range(0, max(n, 1), block_rows):
        hi = min(lo + block_rows, n)
        if hi <= lo:
            break
        block = io.BytesIO()
        for i in range(lo, hi):
            for ci, key in enumerate(keys):
                v = pyrows[ci][i]
                if v is None:
                    block.write(_zigzag(0))  # union branch 0 = null
                    continue
                block.write(_zigzag(1) + enc(v, key))
        data = block.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate, no zlib wrap
        buf.write(_zigzag(hi - lo) + _zigzag(len(data)) + data + sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)
    return n
