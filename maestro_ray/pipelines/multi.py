"""Multi-table transactional ingest: N changelogs → N lakes, committed
ATOMICALLY per epoch under one journal record.

Why a journal above the per-table manifests: each table's lake keeps
its own manifest sequence (core/manifest.py) so every single-table
reader, view, and tool keeps working — but a cross-table transaction
needs one commit point. The layout is

    root/
      tables/<name>/            one ordinary lake per table
      _txn/txn-<epoch>.json     THE commit point for joint epoch e

and the protocol per joint epoch:

1. STAGE every table (``_stage_epoch`` — shuffle + merge + staged
   partition files; nothing visible yet).
2. Write ``txn-<e>.json`` atomically (tmp+fsync+rename). The record
   carries each table's full publish payload (lineage rows, watermark,
   counters) — it alone makes the epoch durable.
3. APPLY: ``publish_epoch`` each table from the recorded payload.

Crash matrix (tests/replay/test_multi_table.py):
- crash in 1 → staging is garbage, nothing visible; rerun reconverges
  (staged paths are deterministic, retries overwrite same bytes).
- crash in 2 before the rename → same as 1.
- crash in 3 after some tables published → the txn record exists;
  ``recover`` (run on every open) re-applies the remaining tables from
  the recorded payloads — `publish_epoch` is idempotent and tolerates
  already-renamed staged files. No interleaving exposes table A at
  epoch e with table B at e−1 to a reader that honors the journal
  (``committed_epoch`` / ``read_table``).

Scale: tables stage sequentially (each staging is itself a fully
distributed pipeline saturating the cluster); the journal record is
O(total partitions) JSON on the driver — the same order as one
manifest. Nothing here adds a shuffle.
"""

from __future__ import annotations

import json
import os

from maestro_ray.core.manifest import (
    Manifest,
    latest_manifest,
    manifest_path,
    publish_epoch,
)
from maestro_ray.io.changelog import (
    check_contiguity,
    read_changelog,
    segments_after,
)
from maestro_ray.io.lake import write_lineage
from maestro_ray.ops.merge import events_to_candidates
from maestro_ray.ops.partition import add_partition_column, lww_reduce
from maestro_ray.pipelines.ingest import _stage_epoch

TXN_DIR = "_txn"


def _txn_path(root: str, epoch: int) -> str:
    return os.path.join(root, TXN_DIR, f"txn-{epoch:012d}.json")


def table_dir(root: str, name: str) -> str:
    return os.path.join(root, "tables", name)


def _write_txn_atomic(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def committed_epochs(root: str) -> list[int]:
    """Joint epochs with a durable txn record, ascending."""
    d = os.path.join(root, TXN_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("txn-") and f.endswith(".json"):
            out.append(int(f[4:-5]))
    return sorted(out)


def committed_epoch(root: str) -> int | None:
    """The newest joint epoch whose txn is FULLY APPLIED — the
    snapshot boundary readers must honor. A txn record alone makes an
    epoch durable, but a crash can leave it half-published; this
    returns the newest epoch at which every table named by every txn
    ≤ it has its manifest and lineage on disk (run ``recover`` to
    close the gap)."""
    best: int | None = None
    for e in committed_epochs(root):
        with open(_txn_path(root, e)) as f:
            rec = json.load(f)
        applied = all(
            os.path.exists(manifest_path(table_dir(root, n), e))
            and os.path.exists(_lineage_path(table_dir(root, n), e))
            for n in rec["tables"]
        )
        if not applied:
            break  # a torn txn gates everything after it
        best = e
    return best


def read_table(root: str, name: str, epoch: int | None = None,
               columns: list[str] | None = None):
    """Journal-gated snapshot read of one table in a multi-table root:
    the table's state at joint ``epoch`` (default: newest FULLY-applied
    txn — ``committed_epoch``). Because the gate is the journal, a
    reader can never observe table A at epoch e alongside table B at
    e−1: read both tables at the same ``epoch`` and the pair is the
    atomically-committed cross-table snapshot. A table that staged
    nothing at ``epoch`` serves its newest older manifest."""
    from maestro_ray.core.manifest import list_epochs
    from maestro_ray.io.lake import read_lake_at

    applied = committed_epoch(root)
    if epoch is None:
        epoch = applied
        if epoch is None:
            raise ValueError(f"no fully-applied joint epoch in {root}")
    elif epoch not in committed_epochs(root):
        raise ValueError(
            f"joint epoch {epoch} was never committed to {root}; "
            f"available: {committed_epochs(root)}")
    elif applied is None or epoch > applied:
        # journaled but not fully applied: serving it could pair table
        # A at e with table B at e-1 — the torn snapshot this API
        # exists to prevent (r4 s4 review finding)
        raise ValueError(
            f"joint epoch {epoch} is journaled but not fully applied "
            f"(newest applied: {applied}); run recover() first")
    lake = table_dir(root, name)
    older = [e for e in list_epochs(lake) if e <= epoch]
    if not older:
        raise ValueError(
            f"table {name!r} has no state at or before joint epoch "
            f"{epoch} in {root}")
    return read_lake_at(lake, older[-1], columns=columns)


def _apply_rollback_txn(root: str, epoch: int, rec: dict) -> None:
    """Apply a ``kind="rollback"`` txn: per table, write a manifest
    whose partition map is the journaled target map (pure metadata —
    the rollback_lake semantics, transactional across tables).
    Idempotent like the ingest apply; a DIFFERENT manifest already at
    this epoch raises (the publish_epoch concurrency rule)."""
    from maestro_ray.core.manifest import (
        ConcurrentCommitError,
        write_manifest_atomic,
    )

    for name, t in sorted(rec["tables"].items()):
        lake = table_dir(root, name)
        m = Manifest(
            epoch=epoch,
            watermark=t["watermark"],
            partitions={int(p): dict(v)
                        for p, v in t["partitions"].items()},
            counters=t["counters"],
            num_partitions=t["num_partitions"],
        )
        path = manifest_path(lake, epoch)
        if os.path.exists(path):
            with open(path) as f:
                if f.read() != m.to_json():
                    raise ConcurrentCommitError(
                        f"epoch {epoch} of table {name!r} is already "
                        "committed with different content")
        else:
            write_manifest_atomic(path, m)
        write_lineage(lake, epoch, [
            {"partition": p, "epoch": epoch,
             "watermark_offset": int(v["watermark"]),
             "row_count": int(v["rows"]),
             "checksum": int(v["checksum"])}
            for p, v in sorted(m.partitions.items())
        ])


def _apply_txn(root: str, epoch: int) -> None:
    """Idempotently publish every table named in txn-<epoch> — the
    recovery half of the protocol (and the normal apply path)."""
    with open(_txn_path(root, epoch)) as f:
        rec = json.load(f)
    if rec.get("kind") == "rollback":
        _apply_rollback_txn(root, epoch, rec)
        return
    for name, t in sorted(rec["tables"].items()):
        lake = table_dir(root, name)
        prev = (
            Manifest.from_json(json.dumps(t["prev"]))
            if t["prev"] is not None else None
        )
        # no existence short-circuit: a crash BETWEEN publish_epoch and
        # write_lineage would otherwise lose the lineage forever (the
        # manifest exists, so a skip-if-applied check never retries the
        # lineage write). Both calls are idempotent — publish_epoch
        # no-ops on an identical manifest, write_lineage rewrites the
        # same deterministic rows — so always re-applying is safe.
        m = publish_epoch(
            lake, epoch, t["watermark"], t["rows"], prev, t["counters"],
            num_partitions=t["num_partitions"],
        )
        write_lineage(lake, epoch, t["rows"])
        assert m.epoch == epoch


def _lineage_path(lake: str, epoch: int) -> str:
    from maestro_ray.core.manifest import LINEAGE_DIR

    return os.path.join(lake, LINEAGE_DIR, f"epoch-{epoch:012d}.parquet")


def recover(root: str) -> int:
    """Re-apply any txn whose per-table manifests OR lineage files are
    incomplete (a crash between journal write and publish, or between
    publish_epoch and write_lineage — both writes must land for the
    txn to count as applied). Returns the count of txns touched. Safe
    to run always — apply is idempotent."""
    n = 0
    for e in committed_epochs(root):
        with open(_txn_path(root, e)) as f:
            rec = json.load(f)
        missing = [
            name for name in rec["tables"]
            if not os.path.exists(manifest_path(table_dir(root, name), e))
            or not os.path.exists(_lineage_path(table_dir(root, name), e))
        ]
        if missing:
            _apply_txn(root, e)
            n += 1
    return n


def ingest_multi(
    root: str,
    logs: dict[str, str],
    *,
    num_partitions: int = 8,
    segments_per_epoch: int | None = None,
    max_epochs: int | None = None,
) -> dict[str, Manifest | None]:
    """Tail every table's changelog in LOCKSTEP joint epochs, each
    committed atomically across tables. ``logs`` maps table name →
    changelog dir. Resumes from the journal; crashed runs recover
    first. Returns the final manifest per table."""
    if not logs:
        raise ValueError("logs must map at least one table to its log dir")
    os.makedirs(root, exist_ok=True)
    recover(root)

    state: dict[str, dict] = {}
    for name, log_dir in sorted(logs.items()):
        lake = table_dir(root, name)
        os.makedirs(lake, exist_ok=True)
        m = latest_manifest(lake)
        if m is not None and m.num_partitions not in (None, num_partitions):
            raise ValueError(
                f"table {name}: lake built with num_partitions="
                f"{m.num_partitions}, got {num_partitions}"
            )
        wm = m.watermark if m else -1
        segs = segments_after(log_dir, wm)
        seg_max = check_contiguity(segs, wm) if segs else {}
        chunk = segments_per_epoch or (len(segs) or 1)
        state[name] = {
            "log": log_dir, "lake": lake, "m": m, "wm": wm,
            "chunks": [segs[i:i + chunk] for i in range(0, len(segs), chunk)],
            "seg_max": seg_max,
        }

    done = committed_epochs(root)
    epoch = (done[-1] + 1) if done else 1
    n_rounds = max(len(s["chunks"]) for s in state.values())
    if max_epochs is not None:
        n_rounds = min(n_rounds, max_epochs)

    for i in range(n_rounds):
        staged: dict[str, dict] = {}
        for name, s in sorted(state.items()):
            if i >= len(s["chunks"]):
                continue  # this table has no new segments this round
            chunk = s["chunks"][i]
            ewm = max(s["seg_max"][path] for _first, path in chunk)
            if ewm <= s["wm"]:
                continue  # already fully committed (trailing rerun)
            ds = read_changelog(
                s["log"], from_offset=s["wm"], segments=chunk,
                transform=lambda b, _np=num_partitions: add_partition_column(
                    lww_reduce(events_to_candidates(b)), _np),
            )
            if ds is None:
                continue
            rows, counters = _stage_epoch(
                ds, s["lake"], epoch, ewm, num_partitions, s["m"],
                prepped=True,
            )
            staged[name] = {
                "rows": rows, "counters": counters, "watermark": ewm,
                "num_partitions": num_partitions,
                "prev": json.loads(s["m"].to_json()) if s["m"] else None,
            }
        if not staged:
            epoch += 1
            continue
        _write_txn_atomic(_txn_path(root, epoch),
                          {"epoch": epoch, "tables": staged})
        _apply_txn(root, epoch)
        for name in staged:
            s = state[name]
            s["m"] = latest_manifest(s["lake"])
            s["wm"] = s["m"].watermark
        epoch += 1

    return {name: s["m"] for name, s in state.items()}


def rollback_multi(root: str, to_epoch: int) -> int | None:
    """Transactional multi-table UNDO: restore EVERY table to its
    state at joint epoch ``to_epoch`` as one new atomically-committed
    joint epoch (the rollback_lake semantics, lifted through the txn
    journal — no interleaving can expose table A rolled back alongside
    table B not yet rolled back, because the journal record is the
    commit point and ``recover`` completes torn applies).

    Per table the restored state is the table's newest manifest at or
    before ``to_epoch`` (the ``read_table`` resolution rule — a table
    that staged nothing at that joint epoch rolls to its older state),
    the partition map carried BY REFERENCE (zero data movement) and
    the changelog watermark kept (consumed events stay consumed).
    Returns the new joint epoch, or None when every table already
    matches the target (no empty epoch). Vacuumed targets refuse
    loudly before anything is journaled."""
    from maestro_ray.core.manifest import list_epochs, manifest_at

    recover(root)
    applied = committed_epoch(root)
    if applied is None:
        raise ValueError(f"no fully-applied joint epoch in {root}")
    if to_epoch not in committed_epochs(root):
        raise ValueError(
            f"joint epoch {to_epoch} was never committed to {root}; "
            f"available: {committed_epochs(root)}")
    if to_epoch > applied:
        raise ValueError(
            f"rollback target {to_epoch} is newer than the newest "
            f"applied joint epoch {applied}")
    # the table set is the UNION across all txns — the newest record
    # omits tables whose changelog had nothing for that joint epoch
    names: set[str] = set()
    for e in committed_epochs(root):
        with open(_txn_path(root, e)) as f:
            names |= set(json.load(f)["tables"].keys())
    names = sorted(names)

    payload: dict = {"kind": "rollback", "tables": {}}
    all_same = True
    for name in names:
        lake = table_dir(root, name)
        older = [e for e in list_epochs(lake) if e <= to_epoch]
        if not older:
            raise ValueError(
                f"table {name!r} has no state at or before joint "
                f"epoch {to_epoch} in {root}")
        tgt = manifest_at(lake, older[-1])
        head = latest_manifest(lake)
        missing = [
            v["file"] for v in tgt.partitions.values()
            if v["rows"] > 0 and not os.path.exists(
                os.path.join(lake, v["file"]))
        ]
        if missing:
            raise ValueError(
                f"rollback of table {name!r} to epoch {tgt.epoch} is "
                f"not computable: {len(missing)} partition file(s) "
                "were vacuumed")
        if tgt.partitions != head.partitions:
            all_same = False
        payload["tables"][name] = {
            "partitions": {str(p): v
                           for p, v in sorted(tgt.partitions.items())},
            "watermark": head.watermark,
            "num_partitions": tgt.num_partitions,
            "counters": {"rolled_back_from": head.epoch,
                         "rolled_back_to": tgt.epoch},
        }
    if all_same:
        return None  # already at the target state everywhere
    new_epoch = applied + 1
    tp = _txn_path(root, new_epoch)
    if os.path.exists(tp):
        # a concurrent writer (ingest_multi mid-apply, or a previous
        # torn rollback) already journaled this joint epoch — only an
        # IDENTICAL record may be re-applied; clobbering a different
        # one would wedge recovery (review r4 s8b)
        from maestro_ray.core.manifest import ConcurrentCommitError

        with open(tp) as f:
            existing = json.load(f)
        if existing != payload:
            raise ConcurrentCommitError(
                f"joint epoch {new_epoch} of {root} is already "
                "journaled with different content — concurrent "
                "writers? recover() and retry")
    else:
        _write_txn_atomic(tp, payload)
    _apply_txn(root, new_epoch)
    return new_epoch
