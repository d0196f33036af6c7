"""Incrementally-maintained materialized JOIN view over two CDC lakes.

``maintain_join_view`` keeps ``view = live(left) ⋈_url live(right)``
synchronized with a multi-table root (pipelines/multi.py) across its
joint epochs. The plan exploits CO-PARTITIONING: both lakes route rows
by ``hash64(url) % P`` (ops/partition.partition_ids — ingest_multi
enforces one shared P), so url u of the left table can only ever meet
url u of the right table in the SAME partition id. The join is
therefore PARTITION-LOCAL — one Arrow join per partition, NO shuffle,
at any scale — and incremental maintenance is a manifest walk:

    view_e(p) = live(left_e(p)) ⋈ live(right_e(p))
    recompute p  ⟺  p's file changed in EITHER lake since the cursor

Untouched partitions carry their prior view file forward by reference
(the view manifest points at it; nothing is rewritten), so a sparse
epoch costs O(changed-partition bytes), not O(lake). Deletes fall out
naturally: a tombstoned url fails ``live_mask`` on its side and leaves
the inner join; an update rewrites exactly its partition.

Durability mirrors the lake: per-partition parquet files written
tmp+rename, then one atomic view manifest JSON per joint epoch — the
commit point. Maintenance is resumable and idempotent (cursor = newest
committed view manifest); a crash mid-epoch leaves orphan part files
that the next run simply overwrites.

Catch-up across vacuumed history re-anchors at the newest joint epoch
whose lake files are all still readable (``on_vacuumed="bootstrap"``,
same contract as pipelines/views.py) — intermediate view epochs below
the anchor stay unmaterialized; ``"error"`` raises instead.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from maestro_ray.core.manifest import Manifest, list_epochs, manifest_at
from maestro_ray.pipelines.changefeed import _read_side
from maestro_ray.pipelines.multi import committed_epochs, table_dir

JOIN_VIEWS_DIR = "_join_views"


#: supported join modes → (pyarrow join_type, right side in output?)
_HOW = {
    "inner": ("inner", True),
    "left": ("left outer", True),
    # anti = referential-integrity monitoring: left live rows with NO
    # live right counterpart (orphans), kept current per epoch
    "anti": ("left anti", False),
}


def join_view_name(left: str, right: str, how: str = "inner") -> str:
    """Filesystem identity of the view (also what reads take)."""
    mid = "join" if how == "inner" else f"{how}join"
    return f"{left}__{mid}__{right}"


def _view_dir(root: str, name: str) -> str:
    return os.path.join(root, JOIN_VIEWS_DIR, name)


def _vm_path(vdir: str, epoch: int) -> str:
    return os.path.join(vdir, f"view-{epoch:012d}.json")


def _view_epochs(vdir: str) -> list[int]:
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(n[len("view-"):-len(".json")])
        for n in os.listdir(vdir)
        if n.startswith("view-") and n.endswith(".json")
    )


def _m_at_or_before(lake: str, epoch: int) -> Manifest | None:
    """The table's effective manifest at a JOINT epoch: a table that
    staged nothing in an epoch keeps serving its newest older state."""
    older = [e for e in list_epochs(lake) if e <= epoch]
    return manifest_at(lake, older[-1]) if older else None


def _out_cols(left: str, right: str,
              left_cols: tuple, right_cols: tuple,
              how: str = "inner") -> list[str]:
    out = ["url"] + [f"{left}__{c}" for c in ("warc_ts", *left_cols)]
    if _HOW[how][1]:
        out += [f"{right}__{c}" for c in ("warc_ts", *right_cols)]
    return out


def _join_partition(
    left_path: str | None, right_path: str | None,
    left: str, right: str,
    left_cols: tuple, right_cols: tuple,
    out_path: str,
    how: str = "inner",
) -> int:
    """Join ONE co-partition's live rows and persist the result
    (tmp+rename). Pure function of its file arguments — safe as a Ray
    task or thread. Returns the row count."""
    from maestro_ray.io.lake import live_mask

    def side(path, cols, prefix):
        t = _read_side(path, list(cols))  # tolerant: null-fills, types
        t = t.filter(live_mask(t)).drop_columns(["op"])
        return t.rename_columns(
            ["url"] + [f"{prefix}__{c}" for c in ("warc_ts", *cols)])

    lt = side(left_path, left_cols, left)
    rt = side(right_path, right_cols, right)
    join_type, keep_right = _HOW[how]
    if not keep_right:
        rt = rt.select(["url"])
    j = lt.join(rt, keys="url", join_type=join_type)
    # url is unique per lake (LWW-merged) → unique in the join → a url
    # sort is a total order, making the file bytes deterministic
    j = j.select(_out_cols(left, right, left_cols, right_cols, how))
    j = j.sort_by("url")
    tmp = out_path + ".tmp"
    pq.write_table(j, tmp)
    os.replace(tmp, out_path)
    return j.num_rows


_join_task = None


def _get_join_task():
    global _join_task
    if _join_task is None:
        import ray

        _join_task = ray.remote(num_cpus=1)(_join_partition)
    return _join_task


def _run_joins(jobs: list[tuple]) -> list[int]:
    """Per-partition joins are embarrassingly parallel: Ray tasks when a
    session exists, a thread pool otherwise (the session-less CLI —
    parquet decode releases the GIL)."""
    if not jobs:
        return []
    import ray

    if ray.is_initialized() and len(jobs) > 1:
        task = _get_join_task()
        return ray.get([task.remote(*j) for j in jobs])
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
        return list(ex.map(lambda j: _join_partition(*j), jobs))


def _manifests_readable(root: str, tables: list[str], epoch: int) -> bool:
    for name in tables:
        m = _m_at_or_before(table_dir(root, name), epoch)
        if m is None:
            continue
        lake = table_dir(root, name)
        for ent in m.partitions.values():
            if ent["rows"] > 0 and not os.path.exists(
                    os.path.join(lake, ent["file"])):
                return False
    return True


def maintain_join_view(
    root: str,
    left: str,
    right: str,
    left_cols: tuple[str, ...] = ("text",),
    right_cols: tuple[str, ...] = ("lang",),
    on_vacuumed: str = "bootstrap",
    how: str = "inner",
) -> dict:
    """Catch the materialized join view of two tables in a multi-table
    root up to the newest committed JOINT epoch (module docstring has
    the plan and cost model). Returns the final view manifest dict.
    Idempotent: no new epochs → reads the cursor and returns
    immediately.

    ``how``: "inner" | "left" | "anti" — anti is live referential-
    integrity monitoring (left rows with no live right counterpart;
    right columns omitted from the output). Output columns: ``url``,
    then ``<table>__warc_ts`` + ``<table>__<col>`` per (kept) side —
    collision-free by construction.
    """
    if on_vacuumed not in ("bootstrap", "error"):
        raise ValueError(f"on_vacuumed={on_vacuumed!r}")
    if how not in _HOW:
        raise ValueError(f"how={how!r}: {sorted(_HOW)}")
    name = join_view_name(left, right, how)
    vdir = _view_dir(root, name)
    os.makedirs(vdir, exist_ok=True)
    epochs = committed_epochs(root)
    if not epochs:
        raise ValueError(f"no committed joint epochs in {root}")
    done = [e for e in _view_epochs(vdir) if e in set(epochs)]
    cursor = done[-1] if done else None
    prev_parts: dict[int, dict] = {}
    if cursor is not None:
        with open(_vm_path(vdir, cursor)) as f:
            prev_vm = json.load(f)
        # the view's identity on disk is (left, right, how) — the
        # column specs are recorded per manifest, and resuming with
        # DIFFERENT specs must fail loudly: silently serving the old
        # columns (no new epochs) or mixing schemas between recomputed
        # and carried-forward partitions are both corruption
        recorded = (prev_vm.get("left_cols"), prev_vm.get("right_cols"))
        if recorded != (list(left_cols), list(right_cols)):
            raise ValueError(
                f"join view {name!r} was maintained with "
                f"left_cols={recorded[0]}, right_cols={recorded[1]} "
                f"but this call asks for {list(left_cols)}/"
                f"{list(right_cols)}; delete {vdir} (or vacuum and "
                "re-bootstrap) to change a view's columns"
            )
        prev_parts = {int(k): v for k, v in prev_vm["parts"].items()}
    llake, rlake = table_dir(root, left), table_dir(root, right)
    prev_lm = _m_at_or_before(llake, cursor) if cursor is not None else None
    prev_rm = _m_at_or_before(rlake, cursor) if cursor is not None else None

    pending = [e for e in epochs if cursor is None or e > cursor]
    out: dict = {"epoch": cursor, "parts": prev_parts}
    last_anchor: int | None = None
    while pending:
        e = pending[0]
        lm = _m_at_or_before(llake, e)
        rm = _m_at_or_before(rlake, e)
        if (lm is not None and rm is not None
                and lm.num_partitions is not None
                and rm.num_partitions is not None
                and lm.num_partitions != rm.num_partitions):
            raise ValueError(
                f"join view {name!r}: tables are not co-partitioned "
                f"({left}: P={lm.num_partitions}, {right}: "
                f"P={rm.num_partitions}); align them with "
                "io.lake.repartition_lake before maintaining a join view"
            )
        if not _manifests_readable(root, [left, right], e):
            if on_vacuumed == "error":
                raise ValueError(
                    f"cannot maintain join view {name!r} through joint "
                    f"epoch {e}: a lake file it needs was vacuumed (pass "
                    "on_vacuumed='bootstrap' to re-anchor at the newest "
                    "readable epoch)"
                )
            anchors = [b for b in epochs
                       if _manifests_readable(root, [left, right], b)]
            if not anchors or anchors[-1] == last_anchor:
                raise ValueError(
                    f"cannot maintain join view {name!r}: no readable "
                    f"joint epoch past {e}; the root's history is not "
                    "maintainable"
                )
            b = last_anchor = anchors[-1]
            # full re-anchor: recompute every partition at epoch b
            prev_lm = prev_rm = None
            prev_parts = {}
            pending = [b] + [x for x in epochs if x > b]
            continue

        lparts = dict(lm.partitions) if lm is not None else {}
        rparts = dict(rm.partitions) if rm is not None else {}
        changed = (
            {p for p, _n, _o in _changed(lm, prev_lm)}
            | {p for p, _n, _o in _changed(rm, prev_rm)}
        )
        all_parts = sorted(set(lparts) | set(rparts))
        parts: dict[int, dict] = {}
        jobs, job_ps = [], []
        for p in all_parts:
            if p not in changed and p in prev_parts:
                parts[p] = prev_parts[p]  # carry forward by reference
                continue
            lf = lparts.get(p)
            rf = rparts.get(p)
            lp = (os.path.join(llake, lf["file"])
                  if lf is not None and lf["rows"] > 0 else None)
            rp = (os.path.join(rlake, rf["file"])
                  if rf is not None and rf["rows"] > 0 else None)
            # an empty LEFT side is empty under every mode; an empty
            # RIGHT side zeroes only the inner join (left/anti still
            # emit the left rows — _read_side(None) is a typed empty)
            if lp is None or (rp is None and how == "inner"):
                parts[p] = {"file": None, "rows": 0}
                continue
            rel = os.path.join("parts", f"part-{p:05d}-epoch-{e:012d}.parquet")
            os.makedirs(os.path.join(vdir, "parts"), exist_ok=True)
            jobs.append((lp, rp, left, right, tuple(left_cols),
                         tuple(right_cols), os.path.join(vdir, rel), how))
            job_ps.append((p, rel))
        rows = _run_joins(jobs)
        for (p, rel), n in zip(job_ps, rows):
            parts[p] = {"file": rel, "rows": int(n)}
        payload = {
            "epoch": e,
            "left": left, "right": right, "how": how,
            "left_cols": list(left_cols), "right_cols": list(right_cols),
            "parts": {str(p): v for p, v in sorted(parts.items())},
        }
        tmp = _vm_path(vdir, e) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, sort_keys=True, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _vm_path(vdir, e))  # THE commit point
        prev_parts = parts
        prev_lm, prev_rm = lm, rm
        out = {"epoch": e, "parts": parts}
        pending = [x for x in epochs if x > e]
    return out


def _changed(cur: Manifest | None, prev: Manifest | None):
    from maestro_ray.core.manifest import changed_partitions

    if cur is None:
        # a table with no state yet: everything the prev had is "gone"
        return ([(p, None, o) for p, o in prev.partitions.items()]
                if prev is not None else [])
    return changed_partitions(cur, prev)


def vacuum_join_view(
    root: str, left: str, right: str, how: str = "inner",
    keep_epochs: int = 1,
) -> dict:
    """Reclaim join-view storage: drop view manifests older than the
    newest ``keep_epochs`` and delete every part file no kept manifest
    references (carried-forward files written at OLD epochs but still
    referenced by a kept manifest survive — reference-counted, like
    the lake vacuum). History below the kept window becomes unreadable
    and reads of it fail loudly (``read_join_view`` raises on a missing
    epoch). Crash-leftover ``.tmp`` files are reaped too."""
    if keep_epochs < 1:
        raise ValueError(f"keep_epochs={keep_epochs}: need >= 1")
    name = join_view_name(left, right, how)
    vdir = _view_dir(root, name)
    epochs = _view_epochs(vdir)
    if not epochs:
        raise ValueError(f"join view {name!r} was never maintained")
    kept = epochs[-keep_epochs:]
    referenced: set[str] = set()
    for e in kept:
        with open(_vm_path(vdir, e)) as f:
            vm = json.load(f)
        referenced.update(
            v["file"] for v in vm["parts"].values()
            if v["file"] is not None)
    removed = 0
    for e in epochs[:-keep_epochs]:
        os.remove(_vm_path(vdir, e))
    pdir = os.path.join(vdir, "parts")
    if os.path.isdir(pdir):
        for fn in os.listdir(pdir):
            rel = os.path.join("parts", fn)
            if rel not in referenced:
                os.remove(os.path.join(pdir, fn))
                removed += 1
    return {"kept_epochs": kept, "removed_files": removed,
            "dropped_manifests": len(epochs) - len(kept)}


def read_join_view(
    root: str, left: str, right: str, epoch: int | None = None,
    how: str = "inner",
):
    """The persisted join view at ``epoch`` (default: newest
    maintained) as a lazy Ray Dataset. Raises if never maintained."""
    import ray.data as rd

    name = join_view_name(left, right, how)
    vdir = _view_dir(root, name)
    epochs = _view_epochs(vdir)
    if not epochs:
        raise ValueError(f"join view {name!r} was never maintained")
    if epoch is None:
        epoch = epochs[-1]
    path = _vm_path(vdir, epoch)
    if not os.path.exists(path):
        raise ValueError(
            f"join view {name!r} has no epoch {epoch}; available: {epochs}")
    with open(path) as f:
        vm = json.load(f)
    files = [os.path.join(vdir, v["file"])
             for v in vm["parts"].values()
             if v["file"] is not None and v["rows"] > 0]
    if files:
        from maestro_ray.io.changelog import _num_read_blocks

        # byte-sized read blocks: Ray's ~200-block floor shatters a
        # KB-scale view and taxes every downstream consumer (the
        # measured merge_into 8s -> 1s class)
        return rd.read_parquet(
            files, override_num_blocks=_num_read_blocks(files))
    from maestro_ray.pipelines.changefeed import _payload_type

    fields = [("url", pa.string())]
    sides = [(vm["left"], vm["left_cols"])]
    if _HOW[vm.get("how", "inner")][1]:
        sides.append((vm["right"], vm["right_cols"]))
    for side, cols in sides:
        fields.append((f"{side}__warc_ts", pa.timestamp("us")))
        fields += [(f"{side}__{c}", _payload_type(c)) for c in cols]
    return rd.from_arrow(pa.schema(fields).empty_table())


def maintain_join_group_counts(
    root: str, left: str, right: str, group_col: str,
    how: str = "inner",
) -> "pd.DataFrame":
    """CHAINED incrementality: a per-group live-row count maintained
    over the JOIN VIEW's own manifests — view over view. The join view
    already rewrites only churn-touched partitions per joint epoch, so
    this count's partition diff sees exactly those files: the whole
    chain (two lakes → join view → group counts) is O(churn) per epoch
    end to end. ``group_col`` is a join-view OUTPUT column (e.g.
    ``"<right>__lang"``). State persists per epoch under the view's
    ``_agg/`` dir; cursor/resume semantics mirror pipelines/views.py
    (the per-file counting and frame shaping are imported from there —
    one algebra, two manifest walks)."""
    import pandas as pd

    from maestro_ray.pipelines.views import _as_frame, _live_group_counts

    name = join_view_name(left, right, how)
    vdir = _view_dir(root, name)
    epochs = _view_epochs(vdir)
    if not epochs:
        raise ValueError(f"join view {name!r} was never maintained")
    # a join view's output columns are FIXED by its spec — a missing
    # group_col here is always caller error, and the lake reader's
    # pre-evolution tolerance would otherwise count every row under
    # the null group (r4 s4 review finding)
    with open(_vm_path(vdir, epochs[-1])) as f:
        head_vm = json.load(f)
    allowed = _out_cols(head_vm["left"], head_vm["right"],
                        tuple(head_vm["left_cols"]),
                        tuple(head_vm["right_cols"]),
                        head_vm.get("how", "inner"))
    if group_col not in allowed:
        raise ValueError(
            f"group_col {group_col!r} is not a column of join view "
            f"{name!r}; columns: {allowed}")
    adir = os.path.join(vdir, "_agg", group_col.replace(":", "_"))
    os.makedirs(adir, exist_ok=True)

    def agg_path(e: int) -> str:
        return os.path.join(adir, f"epoch-{e:012d}.parquet")

    done = sorted(
        int(n[len("epoch-"):-len(".parquet")])
        for n in os.listdir(adir)
        if n.startswith("epoch-") and n.endswith(".parquet")
        and int(n[len("epoch-"):-len(".parquet")]) in set(epochs)
    )
    cursor = done[-1] if done else None
    if cursor is not None:
        state = pq.read_table(agg_path(cursor)).to_pandas() \
            .set_index(group_col)["n"]
        with open(_vm_path(vdir, cursor)) as f:
            prev_parts = json.load(f)["parts"]
    else:
        state = pd.Series(dtype="int64")
        prev_parts = {}

    def files_of(parts: dict, only: set[str] | None = None) -> list[str]:
        return [os.path.join(vdir, v["file"]) for k, v in parts.items()
                if v["file"] is not None and v["rows"] > 0
                and (only is None or k in only)]

    for e in [x for x in epochs if cursor is None or x > cursor]:
        with open(_vm_path(vdir, e)) as f:
            parts = json.load(f)["parts"]
        changed = {
            k for k in set(parts) | set(prev_parts)
            if (parts.get(k) or {}).get("file")
            != (prev_parts.get(k) or {}).get("file")
        }
        delta = (_live_group_counts(files_of(parts, changed), group_col)
                 .sub(_live_group_counts(files_of(prev_parts, changed),
                                         group_col), fill_value=0))
        state = state.add(delta, fill_value=0).astype("int64")
        state = state[state != 0]
        out = _as_frame(state, group_col)
        tmp = agg_path(e) + ".tmp"
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       tmp)
        os.replace(tmp, agg_path(e))
        prev_parts = parts
    return _as_frame(state, group_col)
