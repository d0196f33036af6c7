"""Changelog (binlog/WAL) source — SURVEY.md §2 op S2 + U4 admission.

Segments are parquet files named ``seg-<first_offset>.parquet`` so that
resume can skip whole files by name before touching any bytes, then
row-filter the overlap with parquet predicate pushdown. Segments may
carry any admitted schema version (v1 no-lang, v2 second-resolution
timestamps, v3 canonical); files are grouped by physical schema
driver-side (footer metadata only), each group becomes one lazy
``ray.data`` read, every batch is evolved to the head schema inside
``map_batches`` (parallel, vectorized — never on the driver), and the
groups are unioned into a single stream.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.core.schema import (
    CHANGELOG_V3,
    SchemaContractError,
    check_evolvable,
    evolve_table,
)

_SEG_RE = re.compile(r"seg-(\d+)\.parquet$")

#: target on-disk bytes per read block. Ray's default heuristic floors
#: read parallelism at ~200 blocks, which shatters small-to-medium
#: inputs into sub-MB blocks and makes the downstream sort shuffle pay
#: O(blocks²) tiny object fetches (measured 12s -> <1s on the bench
#: epoch). Sizing blocks by bytes keeps the same plan shape from MBs to
#: TBs: block count grows linearly with data, not with a fixed floor.
TARGET_READ_BLOCK_BYTES = 64 << 20


def _pruned_bytes(path: str, columns: list[str]) -> int:
    """On-disk bytes of just ``columns`` (footer metadata only)."""
    md = pq.ParquetFile(path).metadata
    names = md.schema.to_arrow_schema().names
    idxs = [i for i, n in enumerate(names) if n in columns]
    total = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        total += sum(g.column(i).total_compressed_size for i in idxs)
    return total


def _num_read_blocks(paths: list[str], columns: list[str] | None = None) -> int:
    """Byte-proportional read block count, floored at the CPU count.

    With ``columns``, blocks are sized by the PRUNED bytes actually read
    (summed column-chunk sizes from the footers) — sizing a narrow
    3-column scan by full-file bytes would shatter it into near-empty
    blocks and re-create the O(blocks²) shuffle-fetch pathology.
    """
    if columns is None:
        total = sum(os.path.getsize(p) for p in paths)
    else:
        total = sum(_pruned_bytes(p, columns) for p in paths)
    from maestro_ray.ops.partition import cluster_cpus

    return max(1, min(cluster_cpus(), len(paths) * 8),
               total // TARGET_READ_BLOCK_BYTES)


def list_segments(log_dir: str) -> list[tuple[int, str]]:
    """``(first_offset, path)`` for every segment, in offset order."""
    out = []
    for name in os.listdir(log_dir):
        m = _SEG_RE.search(name)
        if m:
            out.append((int(m.group(1)), os.path.join(log_dir, name)))
    out.sort()
    return out


def segments_after(log_dir: str, from_offset: int) -> list[tuple[int, str]]:
    """Segments that may contain offsets > ``from_offset``.

    A segment is skipped entirely when the NEXT segment's first offset is
    already <= ``from_offset`` (its whole range was committed). Duplicate
    re-deliveries inside kept files are removed by the row-level filter.
    """
    segs = list_segments(log_dir)
    keep = []
    for i, (first, path) in enumerate(segs):
        next_first = segs[i + 1][0] if i + 1 < len(segs) else None
        if next_first is not None and next_first <= from_offset + 1:
            continue  # every offset in this file is <= watermark
        keep.append((first, path))
    return keep


def segment_max_offset(path: str) -> int:
    """Max primary offset from parquet row-group stats (footer only)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("offset")
    if idx < 0:
        raise SchemaContractError(
            f"segment {path} has no 'offset' column — not a changelog segment"
        )
    stats = [
        md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)
    ]
    if all(s is not None and s.has_min_max for s in stats):
        return max(s.max for s in stats)
    # externally-produced segments may lack stats: read the column
    import pyarrow.compute as _pc

    return _pc.max(pq.read_table(path, columns=["offset"]).column("offset")).as_py()


def check_contiguity(
    segs: list[tuple[int, str]], watermark: int
) -> dict[str, int]:
    """Refuse offset gaps: a missing segment file would otherwise
    silently drop its offset range (exactly-once means exactly-once,
    not at-most-once). First offsets must chain — segment i+1 starts at
    most one past segment i's max offset, and the watermark must cover
    segment 0. Returns ``{path: max_offset}`` (footer-only reads) so
    callers never re-read footers for watermark bookkeeping."""
    max_offsets: dict[str, int] = {}
    prev_max = watermark
    for first, path in segs:
        if first > prev_max + 1:
            raise FileNotFoundError(
                f"changelog gap: offsets {prev_max + 1}..{first - 1} missing "
                f"before {os.path.basename(path)} — refusing to lose events"
            )
        max_offsets[path] = segment_max_offset(path)
        prev_max = max(prev_max, max_offsets[path])
    return max_offsets


def read_changelog(
    log_dir: str,
    from_offset: int = -1,
    head_schema: pa.Schema = CHANGELOG_V3,
    segments: list[tuple[int, str]] | None = None,
    transform=None,
    columns: list[str] | None = None,
) -> rd.Dataset | None:
    """Lazy Dataset of change events with offset > ``from_offset``,
    evolved to ``head_schema``. Returns None when nothing remains.

    ``transform`` (pa.Table -> pa.Table), when given, runs INSIDE the
    same ``map_batches`` as the evolution cast. This matters: the union
    of per-schema-version streams breaks Ray's operator fusion, so a
    transform applied after the union costs one extra full-payload trip
    through the object store per boundary — fusing it here keeps the
    wide ``html`` payload to a single materialization before the
    shuffle.

    ``columns`` prunes the scan (parquet column-chunk pushdown): only
    the named columns leave storage — the slim-exchange winner pass
    reads (offset, url, warc_ts) without touching ``html`` bytes at
    all. ``head_schema`` should then be the matching narrow schema;
    columns a segment version lacks (e.g. v1 ``lang``) are null-filled
    by evolution as usual.
    """
    segs = segments if segments is not None else segments_after(log_dir, from_offset)
    if not segs:
        return None
    # group by physical schema (footer-only read; cheap driver-side) and
    # enforce admission *here* — a bad segment fails loudly before any
    # Ray task launches (maestro-style contract check, SURVEY.md §1.4)
    groups: dict[tuple, list[str]] = {}
    for _first, path in segs:
        sch = pq.read_schema(path)
        if columns is not None:
            sch = pa.schema([f for f in sch if f.name in columns])
        try:
            check_evolvable(sch, head_schema)
        except SchemaContractError as e:
            raise SchemaContractError(
                f"segment {path} is not admissible to the changelog "
                f"contract: {e}"
            ) from e
        key = tuple((f.name, str(f.type)) for f in sch)
        groups.setdefault(key, []).append(path)

    def make_evolver(target: pa.Schema):
        def evolve_batch(batch: pa.Table) -> pa.Table:
            out = evolve_table(batch, target)
            return transform(out) if transform is not None else out

        return evolve_batch

    parts: list[rd.Dataset] = []
    flt = (pads.field("offset") > from_offset) if from_offset >= 0 else None
    for key, paths in groups.items():
        cols = [n for n, _t in key] if columns is not None else None
        ds = rd.read_parquet(
            paths, filter=flt, columns=cols,
            override_num_blocks=_num_read_blocks(paths, cols),
        )
        parts.append(
            ds.map_batches(
                make_evolver(head_schema),
                batch_format="pyarrow",
                batch_size=None,  # whole blocks: maximal combiner reduction
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def compact_changelog(
    log_dir: str,
    out_dir: str,
    seg_rows: int = 50_000,
    n_buckets: int = 32,
) -> dict:
    """Kafka-style log compaction: rewrite a changelog keeping only
    each url's LWW-winning event (max (warc_ts, offset) — exactly the
    replay merge rule), renumbered to contiguous offsets 0..k−1 in
    original-offset order. A FRESH replay of the compacted log
    converges to the same final table state as replaying the original
    (same winners, same tie-break order — pinned by
    tests/replay/test_compact_log.py), at O(distinct urls) events
    instead of O(all events) — the bootstrap / replica-seeding tool.

    NOT for resuming an existing lake: its watermark counts ORIGINAL
    offsets; renumbering exists because replay's contiguity check
    (``check_contiguity``) rightly refuses offset gaps.

    Plan, fully distributed: per-batch ``lww_reduce`` combiner →
    one hash(url)-bucket exchange → per-bucket final ``lww_reduce``
    (a url lives wholly in one bucket, and lww_reduce is associative)
    → ``global_row_number`` over the original offsets (3-pass bucketed
    prefix count, O(n_buckets) driver state) → rows route to output
    segment ``new_offset // seg_rows`` and each segment file is
    written sorted inside its own task — the winner set never lands on
    the driver. Returns {events_out, segments}."""
    import numpy as np
    import pyarrow.compute as pc

    from maestro_ray.ops.hashing import hash_array
    from maestro_ray.ops.partition import lww_reduce
    from maestro_ray.ops.scan import global_row_number

    if os.path.exists(out_dir) and os.listdir(out_dir):
        raise FileExistsError(
            f"compact_changelog: {out_dir} exists and is non-empty — "
            "each compaction writes a fresh log directory")
    os.makedirs(out_dir, exist_ok=True)
    ds = read_changelog(log_dir)
    if ds is None:
        return {"events_out": 0, "segments": 0}
    head_cols = [f.name for f in CHANGELOG_V3]

    def combine(t: pa.Table) -> pa.Table:
        return lww_reduce(t)

    def addb(t: pa.Table) -> pa.Table:
        h = hash_array(t.column("url"))
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b, pa.int64()))

    cand = ds.map_batches(combine, batch_format="pyarrow") \
        .map_batches(addb, batch_format="pyarrow")

    def bucket_reduce(g: pa.Table) -> pa.Table:
        return lww_reduce(g.drop_columns(["__b"]))

    winners = cand.groupby("__b").map_groups(bucket_reduce,
                                             batch_format="pyarrow")
    renum = global_row_number(winners, "offset", out_col="__rn")

    def to_seg(t: pa.Table) -> pa.Table:
        new_off = pc.subtract(t.column("__rn"),
                              pa.scalar(1, pa.int64()))
        seg = pc.divide(new_off, pa.scalar(int(seg_rows), pa.int64()))
        t = t.drop_columns(["offset", "__rn"]) \
            .append_column("offset", new_off) \
            .append_column("__seg", seg)
        return t.select(head_cols + ["__seg"])

    def write_seg(g: pa.Table) -> pa.Table:
        seg_id = int(g.column("__seg")[0].as_py())
        t = g.drop_columns(["__seg"])
        t = t.take(pc.sort_indices(t, sort_keys=[("offset",
                                                  "ascending")]))
        first = int(seg_id) * int(seg_rows)
        path = os.path.join(out_dir, f"seg-{first:012d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"segment": pa.array([first], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64())})

    stats = renum.map_batches(to_seg, batch_format="pyarrow") \
        .groupby("__seg").map_groups(write_seg,
                                     batch_format="pyarrow") \
        .to_pandas()
    if stats.empty:
        return {"events_out": 0, "segments": 0}
    return {"events_out": int(stats["rows"].sum()),
            "segments": int(len(stats))}
