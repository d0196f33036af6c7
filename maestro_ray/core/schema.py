"""Typed Arrow-schema contracts and schema evolution.

This is the engine's analog of the maestro lineage's compile-time-typed
record model (Thrift struct + ``Stage[In, Out]`` composition; SURVEY.md
§1.1 ``[M]``, §1.3): ``pyarrow.Schema`` is the contract language, and
composing two stages asserts schema compatibility *eagerly at DAG build
time* — before any Ray execution starts — so a mis-wired pipeline fails
in milliseconds, not an hour into a 100 TB run.

Evolution rules (SURVEY.md §1.4, BASELINE.json north_star "schema
evolution (column add/widen)"):

- **column add**: an input missing a column of the target schema is
  admitted; the column is filled with nulls.
- **column widen**: an input column whose type widens losslessly into
  the target type is admitted and cast up (int32→int64, float→double,
  string→large_string, timestamp[s|ms]→timestamp[us], binary→
  large_binary).
- **narrowing / type conflict / extra unknown column**: contract
  violation → ``SchemaContractError`` at admission time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

# --------------------------------------------------------------------------
# Canonical logical-table schemas (SURVEY.md §1.2, input_hint BASELINE.json)
# --------------------------------------------------------------------------

#: The lake being maintained — exactly the driver-pinned shape.
PAGES_V2 = pa.schema(
    [
        ("url", pa.string()),  # primary key; partitioning key
        ("warc_ts", pa.timestamp("us")),  # LWW version order
        ("html", pa.binary()),  # raw payload (wide — governs block sizing)
        ("text", pa.string()),  # extract_text(html), byte-identical invariant
        ("lang", pa.string()),  # added by evolution v1→v2
    ]
)

#: v1 of the lake schema (before the ``lang`` column add).
PAGES_V1 = pa.schema([f for f in PAGES_V2 if f.name != "lang"])

#: Physical lake-FILE schema: PAGES_V2 plus the persisted LWW ``op``
#: marker. Rows with ``op='delete'`` are tombstones — they must survive
#: in the partition files so an out-of-order event arriving in a LATER
#: epoch (older ``warc_ts`` than the delete) loses the LWW race instead
#: of resurrecting the row. ``read_lake`` filters them out, so the
#: logical lake readers see is still PAGES_V2. Tombstones are vacuumed
#: only by compaction once a caller-supplied event-time watermark
#: guarantees no older event can still arrive (io/lake.py).
LAKE_V2 = pa.schema([*PAGES_V2, pa.field("op", pa.string())])

#: The simulated binlog/WAL. One row per change event; totally ordered
#: per partition by ``offset``.
CHANGELOG_V3 = pa.schema(
    [
        ("offset", pa.int64()),  # monotone log position (watermark key)
        ("op", pa.string()),  # 'insert' | 'update' | 'delete'
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),  # null iff delete (tombstone)
        ("lang", pa.string()),  # present only in evolved (v2+) segments
    ]
)

#: v1 changelog: no ``lang``.
CHANGELOG_V1 = pa.schema([f for f in CHANGELOG_V3 if f.name != "lang"])

#: v2 changelog: has ``lang`` but second-resolution timestamps (the
#: widen-cast test case: timestamp[s] → timestamp[us]).
CHANGELOG_V2 = pa.schema(
    [
        (f.name, pa.timestamp("s") if f.name == "warc_ts" else f.type)
        for f in CHANGELOG_V3
    ]
)

#: Per-partition lineage record written with every manifest epoch.
LINEAGE = pa.schema(
    [
        ("partition", pa.int32()),
        ("epoch", pa.int64()),
        ("watermark_offset", pa.int64()),  # max applied contiguous offset
        ("row_count", pa.int64()),
        ("checksum", pa.uint64()),  # order-insensitive content checksum
    ]
)


# --------------------------------------------------------------------------
# Widening lattice
# --------------------------------------------------------------------------


class SchemaContractError(TypeError):
    """A stage-boundary schema contract was violated."""


def _widens_to(src: pa.DataType, dst: pa.DataType) -> bool:
    """True if ``src`` can be cast to ``dst`` without loss (widen-only)."""
    if src.equals(dst):
        return True
    if pa.types.is_null(src):
        return True  # all-null column can become anything (nullable)
    int_rank = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
    uint_rank = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
    float_rank = {pa.float16(): 0, pa.float32(): 1, pa.float64(): 2}
    for rank in (int_rank, uint_rank, float_rank):
        if src in rank and dst in rank:
            return rank[src] <= rank[dst]
    if src in int_rank and dst in float_rank:
        return True  # int→float widening (documented lossy >2^53; accepted)
    if pa.types.is_string(src) and pa.types.is_large_string(dst):
        return True
    if pa.types.is_binary(src) and pa.types.is_large_binary(dst):
        return True
    if pa.types.is_timestamp(src) and pa.types.is_timestamp(dst):
        order = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return (
            src.tz == dst.tz and order[src.unit] <= order[dst.unit]
        )  # finer unit = wider
    if pa.types.is_date32(src) and pa.types.is_date64(dst):
        return True
    if pa.types.is_list(src) and pa.types.is_list(dst):
        return _widens_to(src.value_type, dst.value_type)
    return False


def check_evolvable(src: pa.Schema, dst: pa.Schema) -> None:
    """Raise ``SchemaContractError`` unless ``src`` evolves into ``dst``.

    Admission rule of SURVEY.md §1.4: every ``src`` column must exist in
    ``dst`` with an equal-or-wider type; ``dst``-only columns are fine
    (null-filled adds).
    """
    dst_by_name = {f.name: f for f in dst}
    for f in src:
        if f.name not in dst_by_name:
            raise SchemaContractError(
                f"column {f.name!r} not in target schema "
                f"{dst_by_name.keys() - {f.name}} — unknown columns are "
                "contract violations (drop explicitly if intended)"
            )
        if not _widens_to(f.type, dst_by_name[f.name].type):
            raise SchemaContractError(
                f"column {f.name!r}: {f.type} does not widen to "
                f"{dst_by_name[f.name].type} (narrowing/conflict rejected)"
            )


def evolve_table(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast ``table`` up to ``target``: widen types, null-fill added columns.

    Raises ``SchemaContractError`` on narrowing or unknown columns. This
    is the vectorized per-batch admission step (op U4 in SURVEY.md §2.U);
    it runs inside ``map_batches`` so evolution is applied in parallel,
    never on the driver.
    """
    check_evolvable(table.schema, target)
    n = table.num_rows
    cols = []
    for f in target:
        idx = table.schema.get_field_index(f.name)
        if idx < 0:
            cols.append(pa.nulls(n, type=f.type))
        else:
            col = table.column(idx)
            if not col.type.equals(f.type):
                col = col.cast(f.type)
            cols.append(col)
    return pa.Table.from_arrays(cols, schema=target)


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Widest common schema of the inputs (column-add + widen union)."""
    out: dict[str, pa.DataType] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name not in out:
                out[f.name] = f.type
                order.append(f.name)
            else:
                cur = out[f.name]
                if _widens_to(cur, f.type):
                    out[f.name] = f.type
                elif not _widens_to(f.type, cur):
                    raise SchemaContractError(
                        f"column {f.name!r}: {cur} and {f.type} have no "
                        "widening relationship"
                    )
    return pa.schema([(name, out[name]) for name in order])


# --------------------------------------------------------------------------
# Typed stage composition (maestro's Stage[In, Out] analog — SURVEY.md §2.J)
# --------------------------------------------------------------------------


@dataclass
class Stage:
    """A typed pipeline stage: a transform plus its schema contract.

    ``fn`` is whatever ``apply`` knows how to wire onto a
    ``ray.data.Dataset`` — a batch callable (stateless task), a class
    (actor pool), or a ``Dataset -> Dataset`` builder for wide ops.
    Composition via ``>>`` checks that the upstream out-schema evolves
    into the downstream in-schema *now*, at build time.
    """

    name: str
    in_schema: pa.Schema | None
    out_schema: pa.Schema | None
    fn: object
    kind: str = "batch"  # 'batch' | 'actor' | 'dataset'
    options: dict = field(default_factory=dict)

    def __rshift__(self, other: "Stage") -> "DAG":
        return DAG([self]) >> other

    def apply(self, ds):
        if self.kind == "dataset":
            return self.fn(ds)
        opts = {"batch_format": "pyarrow", **self.options}
        if self.kind == "actor":
            opts.setdefault("concurrency", 4)
        return ds.map_batches(self.fn, **opts)


@dataclass
class DAG:
    """A linear composition of stages with eager contract checks."""

    stages: list[Stage]

    def __rshift__(self, other: Stage) -> "DAG":
        prev = self.stages[-1]
        if prev.out_schema is not None and other.in_schema is not None:
            try:
                check_evolvable(prev.out_schema, other.in_schema)
            except SchemaContractError as e:
                raise SchemaContractError(
                    f"cannot compose {prev.name!r} >> {other.name!r}: {e}"
                ) from e
        return DAG([*self.stages, other])

    def apply(self, ds):
        for st in self.stages:
            ds = st.apply(ds)
        return ds
