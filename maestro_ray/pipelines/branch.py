"""Branch merge: fold a hardlinked clone's divergent changes back into
its source lake — the write-back half of the zero-copy branching story
(io/lake.py clone_lake). Experiment on a branch (reprocess, backfill,
fix), then ``merge_branch`` lands the NET result on the source as one
ordinary epoch.

Semantics (three-way, by url, LWW):
- the branch's net change feed since the fork epoch re-enters the
  source's partition merge as candidates carrying their own
  ``warc_ts`` — a url changed on BOTH sides resolves by event time,
  newest wins;
- on an exact ``warc_ts`` tie the BRANCH wins: branch candidates carry
  synthetic offsets above any remembered source offset (deletes at
  ``wm+1``, upserts at ``wm+2`` so a repartitioned branch's paired
  move rows resolve to the insert), which is also what makes the
  merge deterministic; the offsets never persist and the source's
  changelog watermark is NOT advanced (merge rows are not changelog
  events);
- branch deletes re-enter as delete candidates and tombstone the
  source row (subject to the same LWW race);
- urls untouched on the branch never appear in the feed — untouched
  source partitions carry forward by reference, so the merge costs
  O(branch churn), not O(lake).

The branch's extracted ``text`` rides the feed verbatim (no
re-extraction), preserving the byte-identity contract for branch-won
rows. The result is published through the ordinary exactly-once
manifest commit — a crash mid-merge leaves staged garbage the next
attempt overwrites.

Limitation: the feed carries the CANDIDATE payload set (html / text /
lang). A branch that EVOLVED its schema with additional payload
columns merges the shared set only — extend ``_PAYLOADS`` together
with the candidate schema when the lake schema grows.
"""

from __future__ import annotations

import pyarrow as pa

from maestro_ray.core.manifest import Manifest, latest_manifest
from maestro_ray.ops.merge import CANDIDATE

#: feed payloads that must ride the merge (the full lake payload set)
_PAYLOADS = ("html", "text", "lang")


def merge_branch(
    src_dir: str,
    branch_dir: str,
    fork_epoch: int | None,
) -> Manifest:
    """Merge ``branch_dir``'s net changes over ``(fork_epoch, head]``
    into ``src_dir`` as one new epoch; returns the published manifest.
    ``fork_epoch`` is the source epoch the branch was cloned at (pass
    ``None`` to re-apply the branch's ENTIRE live state — a full
    overwrite-where-newer). A feed with zero changes publishes no
    epoch and returns the source's current manifest."""
    import pyarrow.compute as pc

    from maestro_ray.pipelines.changefeed import table_changes
    from maestro_ray.pipelines.ingest import _run_epoch

    head = latest_manifest(src_dir)
    if head is None:
        raise ValueError(f"no committed epochs in source {src_dir}")
    if head.num_partitions is None:
        raise ValueError(
            f"source {src_dir} has no recorded num_partitions — "
            "cannot route merge candidates")
    feed = table_changes(branch_dir, from_epoch=fork_epoch,
                         payload_columns=_PAYLOADS)
    # Two synthetic offsets, both above any remembered source offset
    # (lake rows re-enter merges with offset=-1, so any >= 0 wins the
    # tie against an equal-ts source row). Upserts sit ABOVE deletes:
    # a branch that was repartitioned emits paired delete@old-partition
    # + insert@new-partition with IDENTICAL (url, warc_ts) for every
    # moved-but-unchanged url — lww_reduce must resolve that tie to
    # the insert deterministically, or live rows get tombstoned by
    # concatenation order (review finding, blocking).
    del_offset = head.watermark + 1
    ups_offset = head.watermark + 2

    def to_candidates(t: pa.Table) -> pa.Table:
        is_del = pc.equal(t.column("change_op"), pa.scalar("delete"))
        op = pc.if_else(is_del, pa.scalar("delete"),
                        pa.scalar("update"))
        off = pc.if_else(is_del, pa.scalar(del_offset, pa.int64()),
                         pa.scalar(ups_offset, pa.int64()))

        def chunked(a):
            return a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a

        cols = {
            "offset": chunked(off),
            "op": chunked(op),
            "url": t.column("url"),
            "warc_ts": t.column("warc_ts"),
            "html": t.column("html"),
            "text": t.column("text"),
            "lang": t.column("lang"),
        }
        return pa.Table.from_arrays(
            [cols[f.name] for f in CANDIDATE], schema=CANDIDATE)

    # materialize: the zero-change probe and the merge must not run
    # the partition-diff feed twice
    cands = feed.map_batches(
        to_candidates, batch_format="pyarrow").materialize()
    if cands.count() == 0:
        return head  # nothing diverged — no empty epoch
    # epoch_watermark stays at the source's: merge candidates are NOT
    # changelog events, and advancing the watermark would make the
    # next ingest() silently drop the REAL event at that offset
    # (review finding, blocking). Synthetic offsets never persist —
    # they exist only inside this merge's LWW.
    return _run_epoch(
        cands, src_dir,
        epoch=head.epoch + 1,
        epoch_watermark=head.watermark,
        num_partitions=head.num_partitions,
        prev=head,
    )
