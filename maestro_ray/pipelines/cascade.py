"""Lake→lake CDC cascade: materialize the change feed as a NEW
changelog directory, so downstream consumers ingest a derived lake with
the SAME machinery (and guarantees) as the source — the
transactional-outbox / fan-out pattern, and the composability piece of
the lakehouse: source log → lake A → cascaded log → lake B → ...

``cascade_changelog`` is incremental with a durable cursor: each call
emits, for every source epoch past the cursor, the NET per-epoch diff
(pipelines/changefeed.table_changes — one task per changed partition,
O(churn)) as standard ``seg-<first_offset>.parquet`` changelog segments
(CHANGELOG_V3: offset/op/url/warc_ts/html/lang). Offsets are DENSE and
sequential across segments — the downstream reader's contiguity check
(io/changelog.check_contiguity) must hold — which requires exact
per-segment counts before naming; the plan stages per-partition files
through one churn-sized shuffle (deterministic url order inside each),
then finalizes them with their offset ranges.

Why the result converges downstream: within one epoch the net feed has
at most ONE row per url, and across epochs a url's live version's
``warc_ts`` is nondecreasing under the source's LWW rule — so the
downstream LWW merge (ts, then offset; offsets here grow with source
epoch) always lands on the source's live state. Deletes ride through as
tombstone events.

Crash safety / idempotence: staging lives under ``out_dir/_staging``
(invisible to the segment regex); segments publish tmp+rename; the
cursor (``_cascade.json``) commits LAST per epoch. A crash mid-epoch
re-runs from the same cursor to byte-identical segment files
(deterministic order + offsets ⇒ ``os.replace`` with identical bytes).
A concurrent downstream ingest may observe a PREFIX of an epoch's
segments — safe: net-diff rows are independent upserts; convergence
completes when the remaining segments land.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from maestro_ray.core.manifest import list_epochs
from maestro_ray.core.schema import CHANGELOG_V3
from maestro_ray.ops.hashing import partition_ids
from maestro_ray.pipelines.changefeed import table_changes

CURSOR = "_cascade.json"


def _load_cursor(out_dir: str) -> dict:
    path = os.path.join(out_dir, CURSOR)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"from_epoch": None, "next_offset": 0, "version": 1}


def _save_cursor(out_dir: str, state: dict) -> None:
    path = os.path.join(out_dir, CURSOR)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _to_changelog(t: pa.Table, offsets: np.ndarray) -> pa.Table:
    cols = [pa.array(offsets, pa.int64()),
            pc.cast(t.column("change_op"), pa.string())]
    for f in CHANGELOG_V3:
        if f.name in ("offset", "op"):
            continue
        if f.name in t.column_names:
            cols.append(pc.cast(t.column(f.name), f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=CHANGELOG_V3)


def cascade_changelog(lake_dir: str, out_dir: str,
                      num_partitions: int = 8) -> dict:
    """Bring ``out_dir`` (a standard changelog directory) current with
    ``lake_dir``'s committed history. Returns {epochs, segments, rows,
    next_offset}."""
    epochs = list_epochs(lake_dir)
    if not epochs:
        raise ValueError(f"no committed epochs in {lake_dir}")
    os.makedirs(out_dir, exist_ok=True)
    state = _load_cursor(out_dir)
    done_from = state["from_epoch"]
    todo = [e for e in epochs if done_from is None or e > done_from]
    if done_from is not None and done_from not in epochs:
        raise ValueError(
            f"cascade cursor at epoch {done_from} which is no longer "
            f"committed in {lake_dir} (expired?); available: {epochs}")
    n_segments = n_rows = 0
    staging_root = os.path.join(out_dir, "_staging")
    for name in os.listdir(out_dir):  # crash garbage: torn tmp publishes
        if ".parquet.tmp-" in name:
            os.remove(os.path.join(out_dir, name))

    for e in todo:
        feed = table_changes(lake_dir, done_from, e,
                             payload_columns=("html", "lang"))
        stage_dir = os.path.join(staging_root, f"epoch-{e:012d}")
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.makedirs(stage_dir, exist_ok=True)

        def route(t: pa.Table) -> pa.Table:
            p = partition_ids(t.column("url"), num_partitions)
            return t.append_column("__p", pa.array(p, pa.int64()))

        def stage(group: pa.Table) -> pa.Table:
            p = group.column("__p")[0].as_py()
            out = group.drop_columns(["__p"])
            # unique urls per net-diff epoch ⇒ url sort is a total,
            # deterministic order (re-runs produce identical bytes)
            out = out.take(pc.sort_indices(
                out, sort_keys=[("url", "ascending")]))
            pq.write_table(out, os.path.join(stage_dir, f"p={p}.parquet"))
            return pa.table({"p": pa.array([p], pa.int64()),
                             "rows": pa.array([out.num_rows], pa.int64())})

        parts = (feed.map_batches(route, batch_format="pyarrow")
                 .groupby("__p").map_groups(stage, batch_format="pyarrow")
                 .take_all())
        base = state["next_offset"]
        for row in sorted(parts, key=lambda r: r["p"]):
            if row["rows"] == 0:
                continue
            t = pq.read_table(
                os.path.join(stage_dir, f"p={row['p']}.parquet"))
            offs = np.arange(base, base + t.num_rows, dtype=np.int64)
            seg = _to_changelog(t, offs)
            path = os.path.join(out_dir, f"seg-{base:012d}.parquet")
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(seg, tmp)
            os.replace(tmp, path)
            base += t.num_rows
            n_segments += 1
            n_rows += t.num_rows
        shutil.rmtree(stage_dir, ignore_errors=True)
        done_from = e
        state = {"from_epoch": e, "next_offset": base, "version": 1}
        _save_cursor(out_dir, state)  # commit point: cursor LAST

    return {"epochs": len(todo), "segments": n_segments,
            "rows": n_rows, "next_offset": state["next_offset"]}
