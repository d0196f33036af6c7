"""Lake ROLLBACK: restore the table to an earlier committed epoch as a
NEW epoch — the undo operation for bad loads (Delta's RESTORE, Iceberg's
rollback-to-snapshot), rebuilt on the retained manifest history.

Design — pure manifest surgery, O(manifest), zero data movement:

The per-epoch manifests already address every partition version by
file, and files are shared across manifests by reference (time travel,
clones and expire_epochs all rely on that). Rolling back to epoch E is
therefore ONE new manifest whose partition map is E's map verbatim:
every reader (read_lake, changefeed, the incremental views, fsck) sees
the restored state through the ordinary head-manifest path, and the
change feed across the rollback epoch automatically emits the net
INVERSE diff per partition (the files changed back — no special-cased
"undo events" anywhere downstream).

Semantics pinned here:

- *History is preserved*: the bad epochs stay addressable by time
  travel until expired — rollback never deletes anything.
- *The changelog watermark does NOT roll back*: the events consumed
  after E were real; restoring the watermark would make the next
  ingest re-apply them (redo, the opposite of undo). Rollback is an
  explicit operator outside the replay contract — a rolled-back lake
  intentionally diverges from pure replay of its changelog (the
  byte-identity invariant applies to lakes built by replay/tail
  alone), which is the point of an undo.
- *Vacuum bound*: rollback needs E's files on disk; if expiration
  reclaimed any, it refuses loudly (same contract as time travel and
  the feed).
- *Exactly-once*: the manifest commit reuses the optimistic-concurrency
  ritual — an identical re-commit (crash replay) is a no-op, a
  different epoch body from a concurrent writer raises.
"""

from __future__ import annotations

import os

from maestro_ray.core.manifest import (
    ConcurrentCommitError,
    Manifest,
    latest_manifest,
    manifest_at,
    manifest_path,
    write_manifest_atomic,
)
from maestro_ray.io.lake import write_lineage


def _lineage_rows(m: Manifest) -> list[dict]:
    return [
        {"partition": p, "epoch": m.epoch,
         "watermark_offset": int(info["watermark"]),
         "row_count": int(info["rows"]),
         "checksum": int(info["checksum"])}
        for p, info in sorted(m.partitions.items())
    ]


def _heal_lineage(lake_dir: str, m: Manifest) -> None:
    """A crash between the manifest write and write_lineage leaves the
    epoch lineage-less FOREVER unless every later entry point re-checks
    (the r4-s2 multi-table lesson) — rollback's early returns heal it."""
    from maestro_ray.core.manifest import LINEAGE_DIR

    path = os.path.join(lake_dir, LINEAGE_DIR,
                        f"epoch-{m.epoch:012d}.parquet")
    if not os.path.exists(path):
        write_lineage(lake_dir, m.epoch, _lineage_rows(m))


def rollback_lake(lake_dir: str, to_epoch: int) -> Manifest:
    """Publish a new epoch whose state is exactly epoch ``to_epoch``'s;
    returns the new manifest (or the current head when it already
    equals the target — no empty epoch)."""
    head = latest_manifest(lake_dir)
    if head is None:
        raise ValueError(f"no committed epochs in {lake_dir}")
    tgt = manifest_at(lake_dir, to_epoch)  # raises if never committed
    if tgt.epoch > head.epoch:
        raise ValueError(
            f"rollback target {to_epoch} is newer than head {head.epoch}")
    if tgt.partitions == head.partitions:
        _heal_lineage(lake_dir, head)  # torn-rollback retry lands here
        return head  # already at the target state
    missing = [
        info["file"] for info in tgt.partitions.values()
        # rows > 0: a purged-empty partition legitimately has no file
        # (the lake_files/require_readable rule — review r4 s8b)
        if info["rows"] > 0
        and not os.path.exists(os.path.join(lake_dir, info["file"]))
    ]
    if missing:
        raise ValueError(
            f"rollback to epoch {to_epoch} of {lake_dir} is not "
            f"computable: {len(missing)} partition file(s) were "
            f"vacuumed (e.g. {os.path.basename(missing[0])}); rollback "
            "only reaches epochs newer than the last vacuum")
    new = Manifest(
        epoch=head.epoch + 1,
        watermark=head.watermark,  # pinned: consumed events stay consumed
        partitions={p: dict(info) for p, info in tgt.partitions.items()},
        counters={"rolled_back_from": head.epoch,
                  "rolled_back_to": tgt.epoch},
        num_partitions=tgt.num_partitions,
    )
    path = manifest_path(lake_dir, new.epoch)
    if os.path.exists(path):  # the publish_epoch concurrency ritual
        with open(path) as f:
            if f.read() == new.to_json():
                _heal_lineage(lake_dir, new)
                return new  # idempotent re-commit
        raise ConcurrentCommitError(
            f"epoch {new.epoch} of {lake_dir} is already committed "
            "with different content — concurrent writers? Re-read the "
            "head manifest and retry")
    write_manifest_atomic(path, new)
    write_lineage(lake_dir, new.epoch, _lineage_rows(new))
    return new
