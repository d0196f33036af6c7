"""Change feed (CDC-out): row-level NET changes between two committed
epochs, streamed as a Dataset.

This is the read-side dual of the ingest path: downstream incremental
consumers (index builders, the incremental views in
``pipelines/views.py``, replication targets) subscribe to "what changed
since epoch e" instead of rescanning the lake — the same capability
Delta Lake calls Change Data Feed and Iceberg calls an incremental
scan, rebuilt here on the manifest history that time travel
(``io/lake.py read_lake_at``) already retains.

Plan shape (scale notes):

- The driver diffs only MANIFESTS (tiny json): partitions whose file is
  unchanged between the two epochs are skipped without touching data.
- One Ray task per changed partition reads exactly two files — the
  partition's old and new version — and classifies rows by a
  vectorized full-outer url join (both files are co-partitioned by
  construction, so there is NO shuffle anywhere in the feed).
- Per-epoch cost is therefore O(touched-partition bytes), the same
  bound as the incremental views, and the output streams through
  ``map_batches`` with backpressure — the feed over a 100-TB lake is
  never materialized anywhere.

Semantics — NET changes over the epoch range ``(from_epoch, to_epoch]``:
- insert: url live at ``to`` but not at ``from``
- update: url live at both with a different row version
- delete: url live at ``from`` but not at ``to``
A url inserted AND deleted inside the range nets out to nothing
(standard CDF range semantics). Update detection keys on the LWW
version column ``warc_ts`` plus the requested payload columns: a
replaced row that kept an identical ``warc_ts`` and identical payload
values (only reachable through the equal-timestamp offset tie-break)
is reported as unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.core.manifest import changed_partitions, list_epochs, manifest_at
from maestro_ray.ops.hashing import hash_array

#: feed output ahead of the payload columns
_OP = "change_op"


def _payload_type(col: str) -> pa.DataType:
    """Arrow type of a payload column — from the lake schema when the
    column is known there (html is binary!), string for ad-hoc ones."""
    from maestro_ray.core.schema import LAKE_V2

    i = LAKE_V2.get_field_index(col)
    return LAKE_V2.field(i).type if i >= 0 else pa.string()


def _read_side(path: str | None, cols: list[str]) -> pa.Table:
    """One side of a partition diff: (url, warc_ts, op?, payload...).
    Pre-tombstone files lack ``op`` — every row counts as live; a file
    predating a payload column (pre-evolution) null-fills it."""
    fields = [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
              ("op", pa.string())] + [(c, _payload_type(c)) for c in cols]
    if path is None:
        return pa.schema(fields).empty_table()
    names = pq.read_schema(path).names
    have = [c for c in cols if c in names]
    want = ["url", "warc_ts"] + (["op"] if "op" in names else []) + have
    t = pq.read_table(path, columns=want)
    if "op" not in t.column_names:
        t = t.append_column("op", pa.nulls(t.num_rows, pa.string()))
    for c in cols:
        if c not in t.column_names:
            t = t.append_column(c, pa.nulls(t.num_rows, _payload_type(c)))
    return t.select(["url", "warc_ts", "op", *cols]) \
        .cast(pa.schema(fields))


def _row_version(t: pa.Table, cols: list[str]) -> np.ndarray:
    """uint64 version fingerprint per row over warc_ts + payload columns
    (vectorized; order-sensitive combine)."""
    h = hash_array(t.column("warc_ts"))
    with np.errstate(over="ignore"):
        for c in cols:
            h = h * np.uint64(0x100000001B3) ^ hash_array(t.column(c))
    return h


def _diff_partition(new: pa.Table, old: pa.Table,
                    cols: list[str]) -> pa.Table:
    """Classify one partition's rows: full-outer url join of the two
    versions (both sorted by url on disk), vectorized comparison."""
    from maestro_ray.io.lake import live_mask  # THE shared liveness rule

    new = new.append_column("__vn", pa.array(_row_version(new, cols))) \
             .append_column("__ln", live_mask(new)).drop_columns(["op"])
    old_keep = old.select(["url", "warc_ts", "op"]) \
        .append_column("__vo", pa.array(_row_version(old, cols))) \
        .append_column("__lo", live_mask(old)).drop_columns(["op"]) \
        .rename_columns(["url", "__ts_o", "__vo", "__lo"])
    j = new.join(old_keep, keys="url", join_type="full outer")
    ln = pc.fill_null(j.column("__ln"), False)
    lo = pc.fill_null(j.column("__lo"), False)
    ins = pc.and_(ln, pc.invert(lo))
    # null-safe version compare: for an old-only row __vn is null and
    # non-Kleene and_(False, null) is NULL, which used to poison the
    # op cascade and silently drop the row's DELETE (r4 review,
    # execution-confirmed — reachable once repartition_lake can remove
    # live urls from a partition)
    neq = pc.fill_null(pc.not_equal(j.column("__vn"), j.column("__vo")),
                       False)
    upd = pc.and_(pc.and_(ln, lo), neq)
    del_ = pc.and_(lo, pc.invert(ln))
    op = pc.if_else(ins, pa.scalar("insert"),
                    pc.if_else(upd, pa.scalar("update"),
                               pc.if_else(del_, pa.scalar("delete"),
                                          pa.scalar(None, pa.string()))))
    j = j.append_column(_OP, op).filter(pc.is_valid(op))
    # deletes report the tombstone's warc_ts when present (the delete
    # event's time); a vacuumed-away url falls back to its old version's
    ts = pc.if_else(pc.is_valid(j.column("warc_ts")),
                    j.column("warc_ts"), j.column("__ts_o"))
    out = pa.table({"url": j.column("url"), _OP: j.column(_OP),
                    "warc_ts": ts,
                    **{c: j.column(c) for c in cols}})
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def table_changes(
    lake_dir: str,
    from_epoch: int | None = None,
    to_epoch: int | None = None,
    payload_columns: tuple[str, ...] = ("lang",),
) -> rd.Dataset:
    """The net change feed over ``(from_epoch, to_epoch]`` as a lazy
    Dataset with columns (url, change_op, warc_ts, *payload_columns).

    ``from_epoch=None`` means genesis (everything live at ``to_epoch``
    is an insert); ``to_epoch`` defaults to the newest committed epoch.
    Raises loudly when an epoch was never committed or when vacuum
    reclaimed a file the diff needs (same contract as time travel).
    """
    cols = list(payload_columns)
    epochs = list_epochs(lake_dir)
    if not epochs:
        raise ValueError(f"no committed epochs in {lake_dir}")
    if to_epoch is None:
        to_epoch = epochs[-1]
    cur = manifest_at(lake_dir, to_epoch)  # raises with history
    # `is not None`, NOT truthiness: bootstrap publishes epoch 0, and a
    # feed from epoch 0 must diff against the base state — treating 0
    # as genesis would re-report the whole base table as inserts
    prev = manifest_at(lake_dir, from_epoch) if from_epoch is not None \
        else None
    if prev is not None and prev.epoch > cur.epoch:
        raise ValueError(
            f"from_epoch {from_epoch} is newer than to_epoch {to_epoch}")
    pairs = [
        (p,
         new["file"] if new is not None and new["rows"] > 0 else None,
         old["file"] if old is not None and old["rows"] > 0 else None)
        for p, new, old in changed_partitions(cur, prev)
    ]
    pairs = [t for t in pairs if t[1] or t[2]]
    missing = [
        rel for _p, new_rel, old_rel in pairs
        for rel in (new_rel, old_rel)
        if rel is not None and not os.path.exists(os.path.join(lake_dir, rel))
    ]
    if missing:
        raise ValueError(
            f"change feed ({from_epoch}, {to_epoch}] over {lake_dir} is "
            f"not computable: {len(missing)} partition file(s) were "
            f"vacuumed (e.g. {os.path.basename(missing[0])}); feeds only "
            "reach epochs newer than the last vacuum"
        )

    def diff_one(batch: pa.Table) -> pa.Table:
        outs = []
        for i in range(batch.num_rows):
            new_rel = batch.column("new_rel")[i].as_py()
            old_rel = batch.column("old_rel")[i].as_py()
            outs.append(_diff_partition(
                _read_side(
                    os.path.join(lake_dir, new_rel) if new_rel else None,
                    cols),
                _read_side(
                    os.path.join(lake_dir, old_rel) if old_rel else None,
                    cols),
                cols,
            ))
        if not outs:
            return _diff_partition(_read_side(None, cols),
                                   _read_side(None, cols), cols)
        return pa.concat_tables(outs)

    items = [
        {"p": p, "new_rel": new_rel, "old_rel": old_rel}
        for p, new_rel, old_rel in pairs
    ]
    if not items:  # nothing changed in the range → a typed empty feed
        return rd.from_arrow(
            _diff_partition(_read_side(None, cols),
                            _read_side(None, cols), cols))
    # one task per changed partition: each reads exactly its two files
    return rd.from_items(items).map_batches(
        diff_one, batch_size=1, batch_format="pyarrow")
