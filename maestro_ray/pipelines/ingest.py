"""EP1 / EP2 — full-replay ingest and checkpoint resume (SURVEY.md §3).

One epoch = one micro-batch of changelog segments:

    read_changelog (schema-evolved, watermark-filtered = D5)
      → map_batches: candidates + combiner LWW pre-reduce + partition id
      → groupby("p")                                 ← the ONE big shuffle
      → map_groups: merge vs previous lake partition, write staged file
      → driver: publish manifest (atomic, idempotent) + lineage

Everything up to the shuffle is streaming with backpressure; the only
driver-side materialization is the per-partition lineage rows (O(P)).

Scale notes (100 TB / 256 nodes): ``num_partitions`` must be sized so
one partition's lake state fits a worker (P ≈ total_bytes / 1–2 GiB);
the combiner bounds per-hot-key shuffle volume at one row per url per
input block; ``salt_hot_keys=True`` adds a pre-shuffle reduce for
pathological churn (exact by LWW associativity). Merge tasks read the
previous partition file directly from shared storage — state never
transits the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from maestro_ray.core.manifest import Manifest, latest_manifest, publish_epoch
from maestro_ray.io.changelog import read_changelog, segments_after
from maestro_ray.io.lake import write_lineage
from maestro_ray.ops.merge import (
    events_to_candidates,
    make_merge_fn,
    pages_to_candidates,
)
from maestro_ray.ops.partition import (
    add_partition_column,
    detect_hot_keys,
    lww_reduce,
)


def _segment_max_offset(path: str) -> int:
    """Max primary offset from parquet row-group stats (footer only)."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("offset")
    if idx < 0:
        from maestro_ray.core.schema import SchemaContractError

        raise SchemaContractError(
            f"segment {path} has no 'offset' column — not a changelog segment"
        )
    return max(
        md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)
    )


def _run_epoch(
    ds: rd.Dataset,
    lake_dir: str,
    epoch: int,
    epoch_watermark: int,
    num_partitions: int,
    prev: Manifest | None,
    hot_keys: set | None = None,
) -> Manifest:
    prev_files = (
        {p: v["file"] for p, v in prev.partitions.items()} if prev else {}
    )
    prev_ref = ray.put(prev_files)

    def prep(batch: pa.Table) -> pa.Table:
        batch = lww_reduce(batch)  # combiner: ≤1 row per url per batch
        return add_partition_column(batch, num_partitions, hot_keys=hot_keys)

    staged = ds.map_batches(prep, batch_format="pyarrow")
    if hot_keys:
        # salted pre-reduce: collapse each hot url's salted sub-groups,
        # then re-partition on the true key for the final merge.
        def reduce_group(group: pa.Table) -> pa.Table:
            return lww_reduce(group.drop_columns(["p"]))

        def repartition_true(batch: pa.Table) -> pa.Table:
            return add_partition_column(batch, num_partitions)

        staged = (
            staged.groupby("p")
            .map_groups(reduce_group, batch_format="pyarrow")
            .map_batches(repartition_true, batch_format="pyarrow")
        )
    merge_fn = make_merge_fn(lake_dir, epoch, prev_ref, epoch_watermark)
    lineage_ds = staged.groupby("p").map_groups(merge_fn, batch_format="pyarrow")
    rows = lineage_ds.take_all()  # O(P) tiny
    counters = {
        "partitions_touched": len(rows),
        "rows_shuffled": sum(r.get("n_input", 0) for r in rows),
        "rows_final": sum(r["row_count"] for r in rows),
    }
    m = publish_epoch(lake_dir, epoch, epoch_watermark, rows, prev, counters)
    write_lineage(lake_dir, epoch, rows)
    return m


def bootstrap(
    pages, lake_dir: str, num_partitions: int = 16
) -> Manifest:
    """Epoch 0: load the base pages table as the lake's initial state."""
    if isinstance(pages, str):
        pages = rd.read_parquet(pages)
    elif isinstance(pages, pa.Table):
        pages = rd.from_arrow(pages)
    ds = pages.map_batches(pages_to_candidates, batch_format="pyarrow")
    return _run_epoch(ds, lake_dir, 0, -1, num_partitions, None)


def ingest(
    log_dir: str,
    lake_dir: str,
    *,
    num_partitions: int = 16,
    base_pages=None,
    segments_per_epoch: int | None = None,
    salt_hot_keys: bool = False,
    hot_key_threshold: int = 5000,
    max_epochs: int | None = None,
) -> Manifest | None:
    """EP1/EP2: replay the changelog into the lake; resumes from the
    newest committed manifest automatically (U7). Returns the final
    manifest (None only if there was nothing at all to do)."""
    os.makedirs(lake_dir, exist_ok=True)
    m = latest_manifest(lake_dir)
    if m is None and base_pages is not None:
        m = bootstrap(base_pages, lake_dir, num_partitions)
    watermark = m.watermark if m else -1
    epoch = (m.epoch + 1) if m else 1
    segs = segments_after(log_dir, watermark)
    if not segs:
        return m
    chunk_size = segments_per_epoch or len(segs)
    chunks = [segs[i : i + chunk_size] for i in range(0, len(segs), chunk_size)]
    if max_epochs is not None:
        chunks = chunks[:max_epochs]
    for chunk in chunks:
        epoch_watermark = max(_segment_max_offset(path) for _first, path in chunk)
        if epoch_watermark <= watermark:
            continue  # fully committed already (e.g. trailing segment rerun)
        ds = read_changelog(log_dir, from_offset=watermark, segments=chunk)
        if ds is None:
            continue
        ds = ds.map_batches(events_to_candidates, batch_format="pyarrow")
        hot: set | None = None
        if salt_hot_keys:
            hot = detect_hot_keys(ds, threshold=hot_key_threshold)
        m = _run_epoch(
            ds, lake_dir, epoch, epoch_watermark, num_partitions, m, hot or None
        )
        watermark = epoch_watermark
        epoch += 1
    return m
