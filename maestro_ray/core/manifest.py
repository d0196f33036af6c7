"""Exactly-once manifest commit protocol (ops S5, S6, U5, U7).

Design anchor: the Delta Lake transaction-log idea (PAPERS.md) reduced
to what a replayable ordered log needs — an atomic, idempotent,
driver-side pointer swap over immutable data files:

1. Merge tasks write partition files under
   ``lake/_staging/epoch-<e>/p=<k>.parquet`` (deterministic paths; task
   retries overwrite with identical bytes).
2. The driver *publishes* the epoch: renames each staged file to
   ``lake/p=<k>/epoch-<e>.parquet``, then atomically writes
   ``lake/_manifests/manifest-<e>.json`` naming the exact file set,
   per-partition watermark / row count / checksum, carried-forward
   entries for untouched partitions, and the global offset watermark.
3. Readers and the next epoch resolve state ONLY through the newest
   manifest — un-manifested files are invisible garbage.

Crash matrix (tests/props/test_exactly_once.py):
- crash before any rename → staging is garbage; rerun reconverges
- crash mid-rename → some finals exist but unreferenced; rerun's
  renames overwrite (``os.replace``) with identical bytes
- crash after manifest write → rerun sees the watermark, input filter
  drops everything (D5), commit is a no-op (idempotent re-commit)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

class ConcurrentCommitError(RuntimeError):
    """Raised when an epoch is already committed with different
    content — the lost-update half of optimistic concurrency. The
    winning manifest stays; the loser must re-read the head and retry
    on the next epoch number."""


MANIFEST_DIR = "_manifests"
LINEAGE_DIR = "_lineage"
STAGING_DIR = "_staging"
VIEWS_DIR = "_views"  # incremental materialized views (pipelines/views.py)


@dataclass
class Manifest:
    epoch: int
    watermark: int  # max applied change-log offset (-1 = base only)
    partitions: dict[int, dict] = field(default_factory=dict)
    # each: {"file": rel_path, "rows": int, "checksum": int, "watermark": int}
    counters: dict[str, int] = field(default_factory=dict)  # per-epoch metrics
    #: the lake's partition-count — part of its identity: hash routing
    #: p = hash(url) % P means a different P re-routes urls, and merging
    #: against files partitioned under the old P would duplicate urls
    num_partitions: int | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "epoch": self.epoch,
                "watermark": self.watermark,
                "num_partitions": self.num_partitions,
                "partitions": {str(k): v for k, v in sorted(self.partitions.items())},
                "counters": dict(sorted(self.counters.items())),
            },
            sort_keys=True,
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        return Manifest(
            epoch=d["epoch"],
            watermark=d["watermark"],
            partitions={int(k): v for k, v in d["partitions"].items()},
            counters=d.get("counters", {}),
            num_partitions=d.get("num_partitions"),
        )


def manifest_path(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, MANIFEST_DIR, f"manifest-{epoch:012d}.json")


def list_epochs(lake_dir: str) -> list[int]:
    """All committed epochs, ascending — every published manifest is
    retained (one small json per epoch), so the lake's full history is
    addressable until ``vacuum`` reclaims the data files."""
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    return sorted(
        int(n[len("manifest-"):-len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("manifest-") and n.endswith(".json")
    )


def manifest_at(lake_dir: str, epoch: int) -> Manifest:
    """The manifest of a specific committed epoch; raises with the
    available history when the epoch was never committed."""
    path = manifest_path(lake_dir, epoch)
    if not os.path.exists(path):
        raise ValueError(
            f"epoch {epoch} was never committed to {lake_dir}; "
            f"available epochs: {list_epochs(lake_dir)}"
        )
    with open(path) as f:
        return Manifest.from_json(f.read())


def latest_manifest(lake_dir: str) -> Manifest | None:
    # shares list_epochs' filter so a crash-leftover manifest-*.json.tmp
    # can never be picked as the lake head while being invisible to the
    # epoch history
    epochs = list_epochs(lake_dir)
    if not epochs:
        return None
    return manifest_at(lake_dir, epochs[-1])


def changed_partitions(
    cur: Manifest, prev: Manifest | None
) -> list[tuple[int, dict | None, dict | None]]:
    """(partition, new_entry, old_entry) for every partition whose file
    differs between the two manifests — the one manifest-diff walk the
    incremental consumers (pipelines/views.py, pipelines/changefeed.py)
    share. ``None`` marks a side where the partition is absent; entries
    are the raw manifest dicts (callers filter ``rows > 0``). Untouched
    partitions (identical file) never appear."""
    prev_parts = prev.partitions if prev else {}
    out: list[tuple[int, dict | None, dict | None]] = []
    for p, v in sorted(cur.partitions.items()):
        old = prev_parts.get(p)
        if old is not None and old["file"] == v["file"]:
            continue
        out.append((p, v, old))
    for p, old in sorted(prev_parts.items()):
        if p not in cur.partitions:
            out.append((p, None, old))
    return out


def publish_epoch(
    lake_dir: str,
    epoch: int,
    watermark: int,
    merged: list[dict],
    prev: Manifest | None,
    counters: dict[str, int] | None = None,
    num_partitions: int | None = None,
) -> Manifest:
    """Atomically publish epoch ``epoch``: rename staged partition files
    into place and write the manifest. Idempotent: if this epoch's
    manifest already exists with identical content, it is a no-op.

    ``merged`` rows are dicts with keys partition / row_count / checksum
    / watermark_offset (the merge stage's lineage output).
    """
    parts: dict[int, dict] = dict(prev.partitions) if prev else {}
    staging = os.path.join(lake_dir, STAGING_DIR, f"epoch-{epoch:012d}")
    for row in merged:
        p = int(row["partition"])
        rel = os.path.join(f"p={p}", f"epoch-{epoch:012d}.parquet")
        src = os.path.join(staging, f"p={p}.parquet")
        dst = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(src):  # may be gone if a previous publish renamed it
            os.replace(src, dst)
        parts[p] = {
            "file": rel,
            "rows": int(row["row_count"]),
            "checksum": int(row["checksum"]),
            "watermark": int(row["watermark_offset"]),
        }
        # change-activity high watermark (max warc_ts µs in the file):
        # lets time-window scans skip files via the manifest alone
        # (io/lake.py read_lake_since); absent on pre-r3 lakes → no skip
        if row.get("ts_max") is not None:
            parts[p]["ts_max"] = int(row["ts_max"])
    m = Manifest(
        epoch=epoch, watermark=watermark, partitions=parts,
        counters=counters or {},
        num_partitions=num_partitions
        or (prev.num_partitions if prev else None),
    )
    path = manifest_path(lake_dir, epoch)
    if os.path.exists(path):
        with open(path) as f:
            if f.read() == m.to_json():
                return m  # idempotent re-commit: no-op
        # optimistic-concurrency guard: an epoch manifest with
        # DIFFERENT content means another writer committed this epoch
        # from different inputs — silently replacing it would corrupt
        # the log (readers may have served the other lineage already).
        # Identical re-commits (crash replay, task retry) pass above.
        raise ConcurrentCommitError(
            f"epoch {epoch} of {lake_dir} is already committed with "
            f"different content — concurrent writers? Re-read the head "
            f"manifest and retry from epoch {epoch + 1}")
    write_manifest_atomic(path, m)
    # staging dir for this epoch is now garbage; best-effort cleanup
    try:
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)
    except OSError:
        pass
    return m


def write_manifest_atomic(path: str, m: Manifest) -> None:
    """The one atomic manifest-publish ritual (tmp + fsync + rename),
    shared by ``publish_epoch`` and lake branching (io/lake.py
    clone_lake)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(m.to_json())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def expire_epochs(lake_dir: str, keep_last: int) -> dict:
    """Snapshot expiration with retention (the Iceberg
    ``expire_snapshots`` analog): drop the manifests (and lineage
    records) of all but the newest ``keep_last`` epochs, then delete
    every partition file referenced by NO retained manifest.

    Time travel (``read_lake_at``) keeps working for every retained
    epoch — the live-file set is the UNION over retained manifests, not
    just the head — and fails loudly (unknown epoch) for expired ones.
    Hardlinked clones (``clone_lake``) are unaffected: deleting a path
    here unlinks only this lake's name for the shared inode.

    Incremental consumers (views/changefeed/indexes) must have caught
    up past the expiration point before it runs; their own no-progress
    guards fail loudly if the old diff side is gone. Idempotent — a
    re-run after a crash finishes the remaining deletions.

    Returns ``{"epochs_removed": n, "files_removed": n,
    "epochs_kept": [..]}``.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    epochs = list_epochs(lake_dir)
    if not epochs:
        return {"epochs_removed": 0, "files_removed": 0,
                "epochs_kept": []}
    kept, expired = epochs[-keep_last:], epochs[:-keep_last]
    live = {
        os.path.normpath(os.path.join(lake_dir, v["file"]))
        for e in kept
        for v in manifest_at(lake_dir, e).partitions.values()
    }
    # Manifests first: once a manifest is gone its epoch is
    # unaddressable, so a crash between the two phases leaves only
    # harmless unreferenced files (re-run reclaims them); the reverse
    # order could leave an addressable epoch with missing files.
    for e in expired:
        os.remove(manifest_path(lake_dir, e))
        lin = os.path.join(lake_dir, LINEAGE_DIR,
                           f"epoch-{e:012d}.parquet")
        if os.path.exists(lin):
            os.remove(lin)
    files_removed = _remove_unreferenced(lake_dir, live)
    return {"epochs_removed": len(expired),
            "files_removed": files_removed, "epochs_kept": kept}


def _remove_unreferenced(lake_dir: str, live: set[str]) -> int:
    """Delete lake parquet files outside ``live`` — the one GC walk
    shared by ``vacuum`` and ``expire_epochs``. Metadata dirs
    (manifests / lineage / views) are never touched, and non-parquet
    metadata (the multi-table ``_txn`` journal) passes the suffix
    filter; staged parquet IS reclaimed — unpublished staging is crash
    garbage by protocol."""
    removed = 0
    for root, _dirs, files in os.walk(lake_dir):
        if (MANIFEST_DIR in root or LINEAGE_DIR in root
                or VIEWS_DIR in root):  # views are metadata, not lake data
            continue
        for name in files:
            path = os.path.normpath(os.path.join(root, name))
            if path.endswith(".parquet") and path not in live:
                os.remove(path)
                removed += 1
    return removed


def vacuum(lake_dir: str, keep_manifest: Manifest) -> int:
    """Delete partition files not referenced by ``keep_manifest`` and any
    leftover staging dirs. Returns number of files removed. Safe to run
    any time after publish — readers only follow the manifest."""
    live = {
        os.path.normpath(os.path.join(lake_dir, v["file"]))
        for v in keep_manifest.partitions.values()
    }
    return _remove_unreferenced(lake_dir, live)
