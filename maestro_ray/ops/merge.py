"""The upsert core — op U3: per-partition LWW merge with tombstones.

Replay-mode merge is shuffle-based (``groupby("p").map_groups``) — the
restart-safe, Ray-idiomatic default (SURVEY.md §7): every merge task is
a deterministic pure function of (previous lake partition file, the
epoch's change events for that partition), so Ray task retries and
whole-epoch reruns converge to identical bytes.

Candidate row model: lake rows and change events are unified into one
schema (``CANDIDATE``) where a lake row is a pseudo-event with
``offset=-1, op='insert'`` — then winner selection is a single
vectorized LWW reduce over max ``(warc_ts, offset)`` per url, delete
winners drop out as tombstones, and ``text`` is extracted (frozen
contract, ops/extract_pure.py) only for winners that came from the
changelog — lake-origin rows keep their stored bytes, preserving the
byte-identity invariant across epochs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from maestro_ray.core.schema import PAGES_V2
from maestro_ray.ops.extract_pure import extract_text
from maestro_ray.ops.hashing import checksum
from maestro_ray.ops.partition import lww_reduce

#: Unified merge-candidate schema (changelog events ∪ lake rows).
CANDIDATE = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # null for changelog rows until extraction
        ("lang", pa.string()),
    ]
)

PAGES_COLS = [f.name for f in PAGES_V2]


def events_to_candidates(batch: pa.Table) -> pa.Table:
    """CHANGELOG_V3 batch → CANDIDATE (adds null ``text``)."""
    n = batch.num_rows
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["text"] = pa.nulls(n, pa.string())
    return pa.Table.from_arrays([cols[f.name] for f in CANDIDATE], schema=CANDIDATE)


def pages_to_candidates(batch: pa.Table, offset: int = -1) -> pa.Table:
    """PAGES_V2 batch → CANDIDATE pseudo-events (``offset=-1, op='insert'``)."""
    n = batch.num_rows
    cols = {name: batch.column(name) for name in batch.column_names}
    if "lang" not in cols:
        cols["lang"] = pa.nulls(n, pa.string())
    cols["offset"] = pa.array([offset] * n, pa.int64())
    cols["op"] = pa.array(["insert"] * n, pa.string())
    return pa.Table.from_arrays([cols[f.name] for f in CANDIDATE], schema=CANDIDATE)


def _fill_text(winners: pa.Table) -> pa.Table:
    """Extract ``text`` where null (changelog-origin winners only)."""
    text = winners.column("text")
    if text.null_count == 0:
        return winners
    html = winners.column("html").to_pylist()
    vals = text.to_pylist()
    out = [
        extract_text(html[i]) if v is None else v for i, v in enumerate(vals)
    ]
    return winners.set_column(
        winners.schema.get_field_index("text"), "text", pa.array(out, pa.string())
    )


def merge_candidates(prev: pa.Table | None, events: pa.Table) -> pa.Table:
    """Pure merge: previous lake partition (PAGES_V2) + candidate events
    → new PAGES_V2 partition table, sorted by url (deterministic bytes).
    """
    cands = [events if events.schema.equals(CANDIDATE) else events_to_candidates(events)]
    if prev is not None and prev.num_rows:
        cands.append(pages_to_candidates(prev))
    allc = pa.concat_tables(cands, promote_options="default")
    winners = lww_reduce(allc)
    winners = winners.filter(pc.not_equal(winners.column("op"), pa.scalar("delete")))
    winners = _fill_text(winners)
    out = winners.select(PAGES_COLS)
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")])).cast(PAGES_V2)


def make_merge_fn(
    lake_dir: str,
    epoch: int,
    prev_files_ref,
    epoch_watermark: int,
):
    """Build the ``map_groups`` callable for one epoch's merge stage.

    Writes each partition's new file to the staging dir (deterministic
    path → task retries are idempotent) and returns a one-row lineage /
    manifest table. ``prev_files_ref`` is a ``ray.put`` handle to the
    ``{partition: relative_file}`` map from the previous manifest —
    broadcast once, not shipped per task.
    """

    def merge_group(group: pa.Table) -> pa.Table:
        import ray

        prev_files = ray.get(prev_files_ref) if prev_files_ref is not None else {}
        p = group.column("p")[0].as_py()
        events = group.drop_columns(["p"])
        prev_rel = prev_files.get(p)
        prev = (
            pq.read_table(os.path.join(lake_dir, prev_rel)) if prev_rel else None
        )
        out = merge_candidates(prev, events)
        rel = os.path.join("_staging", f"epoch-{epoch:012d}", f"p={p}.parquet")
        path = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(out, path)
        return pa.table(
            {
                "partition": pa.array([p], pa.int32()),
                "epoch": pa.array([epoch], pa.int64()),
                "watermark_offset": pa.array([epoch_watermark], pa.int64()),
                "row_count": pa.array([out.num_rows], pa.int64()),
                "checksum": pa.array([checksum(out)], pa.uint64()),
                "n_input": pa.array([group.num_rows], pa.int64()),
            }
        )

    return merge_group
