"""Tail mode — the incremental ingest loop (SURVEY.md §2 C1/C3, §7).

Replay mode (pipelines/ingest.py) is shuffle-based and restart-safe —
the default. Tail mode is the low-latency path for a live binlog: an
ACTOR POOL holds per-partition merge state in memory across
micro-batches, so applying one new segment touches no lake files until
the next checkpoint.

This is the one place the Dataset API genuinely can't express the
semantics (a shared mutable index per partition), so it drops to raw
Ray actors deliberately:

- ``PartitionMerger`` (one actor per lake partition): in-memory
  ``{url: winner}`` high-water map (C1) + the epoch's applied-offset
  set (C3 DedupIndex — intra-epoch duplicate delivery is dropped here;
  cross-epoch idempotence still comes from manifest watermarks / D5).
- Routing runs INSIDE the read tasks (fused transform): each worker
  task evolves → candidates → combiner-LWW-reduces its batch, splits
  it by partition id, and ships sub-tables straight to the owning
  actors, blocking on their acks — event bytes never pass through the
  driver process. Routing is explicit because actor pools don't route
  by key natively (SURVEY.md §7 hard-parts).
- ``checkpoint()`` makes every actor write its partition file to the
  staging dir; the driver publishes the same atomic manifest as replay
  mode, so tail and replay epochs interleave safely and a crashed tail
  resumes from the last manifest (losing only un-checkpointed state,
  which replay of offsets > watermark reconstructs).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from maestro_ray.core.manifest import Manifest, latest_manifest, publish_epoch
from maestro_ray.io.changelog import read_changelog, segments_after
from maestro_ray.io.lake import write_lineage
from maestro_ray.ops.hashing import checksum, partition_ids
from maestro_ray.ops.merge import (
    CANDIDATE,
    _fill_text,
    events_to_candidates,
    pages_to_candidates,
)
from maestro_ray.ops.partition import lww_reduce


@ray.remote
class PartitionMerger:
    """C1: one lake partition's merge state, held across micro-batches.

    State is an ARROW TABLE, not a Python dict (VERDICT r2 #6): the
    converged base table (CANDIDATE schema, one LWW winner per url,
    html payload bytes stay in Arrow buffers) plus a list of pending
    candidate sub-batches. ``apply`` is fully vectorized — offset
    watermark/dedup filtering via numpy, then a zero-copy table append;
    the actual merge is deferred to ``lww_reduce`` (the same Arrow
    winner kernel replay mode uses), run when pending rows exceed
    ``compact_rows`` and at every checkpoint. A hot partition's state
    therefore costs one Arrow table + bounded pending batches, and no
    per-row Python runs anywhere on the apply path.
    """

    def __init__(self, lake_dir: str, partition: int, prev_file_rel: str | None,
                 watermark: int, compact_rows: int = 65536):
        import numpy as np

        self.lake_dir = lake_dir
        self.partition = partition
        self.watermark = watermark
        self.compact_rows = compact_rows
        # C3: intra-epoch dedup index — a sorted base array plus small
        # unsorted recent chunks, merged geometrically (re-sorting the
        # full union per apply would be O(S log S) on the latency-
        # critical path; this is amortized O(log) per offset)
        self.seen = np.empty(0, dtype=np.int64)
        self.seen_new: list = []
        self._seen_new_n = 0
        self.n_applied = 0
        self.dirty = False  # set by apply() on any accepted row
        self.has_file = prev_file_rel is not None
        self.pending: list[pa.Table] = []
        self.pending_rows = 0
        if prev_file_rel:
            prev = pq.read_table(os.path.join(lake_dir, prev_file_rel))
            # pages_to_candidates keeps the persisted `op`: tombstones in
            # the lake file re-enter actor state so a restart can't lose
            # remembered deletes (they'd otherwise be resurrected by
            # late out-of-order updates)
            self.base: pa.Table | None = pages_to_candidates(prev)
        else:
            self.base = None

    def _compact(self) -> None:
        """Fold pending sub-batches into the base table with one
        ``lww_reduce`` — identical winner rule to replay-mode merge
        (max (warc_ts, offset) per url; base rows carry offset=-1)."""
        if not self.pending:
            return
        tabs = ([self.base] if self.base is not None else []) + self.pending
        merged = lww_reduce(pa.concat_tables(tabs, promote_options="default"))
        import pyarrow.compute as pc

        self.base = merged.take(
            pc.sort_indices(merged, sort_keys=[("url", "ascending")])
        )
        self.pending = []
        self.pending_rows = 0

    def apply(self, batch: pa.Table) -> int:
        """Apply a CANDIDATE sub-batch routed to this partition.

        Vectorized: one numpy mask drops events at/below the watermark,
        duplicates of already-seen offsets (C3/D5), and intra-batch
        duplicate deliveries; survivors append as an Arrow table slice.
        ``warc_ts`` ordering is handled entirely inside ``lww_reduce``
        at compaction time (int64 µs — no float/timezone hazards).
        """
        import numpy as np

        offs = batch.column("offset").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        fresh = offs > self.watermark
        if self.seen.size:
            fresh &= ~np.isin(offs, self.seen)
        for arr in self.seen_new:
            fresh &= ~np.isin(offs, arr)
        # intra-batch duplicate delivery: keep the first occurrence
        _u, first_idx = np.unique(offs, return_index=True)
        keep = np.zeros(len(offs), dtype=bool)
        keep[first_idx] = True
        mask = fresh & keep
        applied = int(mask.sum())
        if applied:
            accepted = batch.filter(pa.array(mask))
            self.pending.append(accepted)
            self.pending_rows += applied
            self.seen_new.append(offs[mask])
            self._seen_new_n += applied
            if self._seen_new_n > max(1024, self.seen.size // 2):
                self.seen = np.union1d(
                    self.seen, np.concatenate(self.seen_new)
                )
                self.seen_new, self._seen_new_n = [], 0
            self.dirty = True
            self.n_applied += applied
            if self.pending_rows >= self.compact_rows:
                self._compact()
        return applied

    def checkpoint(self, epoch: int, new_watermark: int) -> dict | None:
        """Write this partition's current table to staging; return the
        lineage row, or None when nothing changed since the last
        checkpoint (the manifest then carries the old file forward).
        Idempotent per (epoch, state)."""
        import numpy as np

        self.watermark = new_watermark
        if not self.dirty:
            self.seen = np.empty(0, dtype=np.int64)
            self.seen_new, self._seen_new_n = [], 0
            return None
        # tombstones (op='delete') are persisted with the partition file
        # so later epochs / restarts keep losing late events to them
        self._compact()
        tbl = _fill_text(self.base)
        # extracted text persists in state (byte-identity across
        # checkpoints: never re-extract a winner)
        self.base = tbl
        from maestro_ray.core.schema import LAKE_V2

        out = tbl.select([f.name for f in LAKE_V2]).cast(LAKE_V2)
        rel = os.path.join(
            "_staging", f"epoch-{epoch:012d}", f"p={self.partition}.parquet"
        )
        path = os.path.join(self.lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(out, path)
        self.seen = np.empty(0, dtype=np.int64)  # watermark now covers them
        self.seen_new, self._seen_new_n = [], 0
        self.dirty = False
        self.has_file = True
        from maestro_ray.ops.merge import live_row_count, ts_max_us

        return {
            "partition": self.partition,
            "epoch": epoch,
            "watermark_offset": new_watermark,
            "row_count": out.num_rows,
            "live_rows": live_row_count(out),
            "checksum": checksum(out),
            "ts_max": ts_max_us(out),
            "n_input": self.n_applied,
        }


def tail_ingest(
    log_dir: str,
    lake_dir: str,
    *,
    num_partitions: int = 16,
    checkpoint_every: int = 2,
    max_segments: int | None = None,
    follow: bool = False,
    poll_interval: float = 0.5,
    idle_timeout: float | None = None,
) -> Manifest | None:
    """Incremental tail loop: micro-batches of segments, checkpoint
    (manifest epoch) every ``checkpoint_every`` segments. Resumes from
    the newest manifest like replay mode.

    ``follow=True`` is the CONTINUOUS daemon mode (``maestro_ray tail
    --follow``): after draining the segments present, keep polling the
    log directory every ``poll_interval`` seconds and apply new
    segments as they land — the actor pool (and its merge state) stays
    warm across polls, so a newly-appended segment costs one micro-
    batch, not a cold resume. The loop exits after ``idle_timeout``
    seconds with no new segment (``None`` = run until the process is
    killed; a killed follow loop loses only un-checkpointed state,
    which the next run replays from the manifest watermark).

    Checkpoint cadence: every ``checkpoint_every`` segments under
    sustained load (``n_since_ckpt`` accumulates ACROSS polls), plus
    one flush when the feed goes idle — durability beats strict
    cadence the moment there is nothing left to batch with.
    """
    import time as _time

    if checkpoint_every < 1:
        # the chunking loop would otherwise spin forever on a 0-length
        # chunk — fail loudly like the pre-chunking range() did
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    os.makedirs(lake_dir, exist_ok=True)
    m = latest_manifest(lake_dir)
    if m is not None and m.num_partitions not in (None, num_partitions):
        raise ValueError(
            f"lake {lake_dir} was built with num_partitions="
            f"{m.num_partitions}; tailing with {num_partitions} would "
            "re-route urls across partitions and duplicate rows"
        )
    watermark = m.watermark if m else -1
    epoch = (m.epoch + 1) if m else 1
    prev_files = {p: v["file"] for p, v in m.partitions.items()} if m else {}
    from maestro_ray.io.changelog import check_contiguity

    actors: list | None = None
    pending_watermark = watermark
    n_since_ckpt = 0
    processed = 0
    idle_since: float | None = None

    def do_checkpoint() -> Manifest:
        nonlocal m, epoch, watermark, n_since_ckpt
        rows = [
            r
            for r in ray.get(
                [a.checkpoint.remote(epoch, pending_watermark) for a in actors]
            )
            if r is not None
        ]
        m = publish_epoch(lake_dir, epoch, pending_watermark, rows, m,
                          num_partitions=num_partitions)
        if rows:
            write_lineage(lake_dir, epoch, rows)
        watermark = pending_watermark
        epoch += 1
        n_since_ckpt = 0
        return m

    # worker-routed dispatch: candidates + combiner + actor routing run
    # INSIDE the read tasks (fused transform), so event bytes go
    # storage → worker → actor without ever passing through the driver
    # process (r1 VERDICT #3: the driver loop capped tail throughput at
    # one process's NIC/CPU and was a single point of back-pressure).
    # Each route call blocks on its actors' acks, so driving the
    # Dataset to completion is the epoch barrier.
    def route(batch: pa.Table, _np=num_partitions) -> pa.Table:
        import numpy as np

        from maestro_ray.ops.merge import refuse_patches

        refuse_patches(batch, "tail mode")  # actor fold is winner-only
        batch = lww_reduce(events_to_candidates(batch))
        p = partition_ids(batch.column("url"), _np)
        refs = []
        for part in np.unique(p):
            sub = batch.filter(pa.array(p == part))
            refs.append(actors[int(part)].apply.remote(sub))
        applied = sum(ray.get(refs)) if refs else 0
        return pa.table({"applied": pa.array([applied], pa.int64())})

    def idle_wait() -> bool:
        """Idle bookkeeping for follow mode; True = keep polling.
        Un-checkpointed applies are flushed BEFORE the first sleep so a
        paused feed's data lands promptly instead of waiting for the
        next checkpoint_every boundary."""
        nonlocal idle_since
        if n_since_ckpt:
            do_checkpoint()
        now = _time.monotonic()
        if idle_since is None:
            idle_since = now
        if idle_timeout is not None and now - idle_since >= idle_timeout:
            return False
        _time.sleep(poll_interval)
        return True

    try:
        while True:
            # discovery/read filtering uses pending_watermark (applies
            # so far, checkpointed or not) so an un-checkpointed poll
            # doesn't re-read the segments it already routed; crash
            # resume still starts from the CHECKPOINTED watermark (the
            # pending one is in-memory only)
            segs = segments_after(log_dir, pending_watermark)
            if max_segments is not None:
                segs = segs[: max_segments - processed]
            seg_max = check_contiguity(segs, pending_watermark) if segs else {}
            # shared contiguity check (io/changelog.py) above: a missing
            # segment would otherwise be silently skipped and the
            # watermark advanced past it; the returned per-segment max
            # offsets feed the watermark bookkeeping without re-reading
            # footers. segments_after always re-offers the newest
            # segment (its tail rows might exceed the watermark); once
            # fully committed it carries nothing new — processing it
            # would publish an empty epoch per poll in follow mode.
            segs = [(f, p) for (f, p) in segs if seg_max[p] > pending_watermark]
            if not segs:
                if not follow:
                    break
                if not idle_wait():
                    break
                continue
            idle_since = None
            if actors is None:
                actors = [
                    PartitionMerger.remote(
                        lake_dir, p, prev_files.get(p), watermark
                    )
                    for p in range(num_partitions)
                ]
            # Segments are processed in CHUNKS — one Dataset execution
            # (≈0.3–0.5 s fixed streaming-executor cost each) per
            # checkpoint interval, not per segment. n_since_ckpt
            # accumulates ACROSS polls, so a live feed trickling one
            # segment per poll still checkpoints every checkpoint_every
            # segments (plus the idle flush above), matching the CLI
            # contract. When tailing LIVE each poll returns few
            # segments and the chunk is small — micro-batch latency
            # intact; chunking only collapses fixed costs during
            # catch-up. (Measured: the per-segment loop ran the
            # 1M-event fixture at 58–66k ev/s; the chunked loop at
            # 190k — BASELINE.md r3.)
            idx = 0
            while idx < len(segs):
                take = checkpoint_every - n_since_ckpt
                chunk = segs[idx : idx + take]
                idx += len(chunk)
                ds = read_changelog(
                    log_dir, from_offset=pending_watermark, segments=chunk,
                    transform=route,
                )
                if ds is not None:
                    ds.take_all()  # drives routing; blocks on all acks
                pending_watermark = max(
                    [pending_watermark] + [seg_max[path] for _f, path in chunk]
                )
                n_since_ckpt += len(chunk)
                if n_since_ckpt >= checkpoint_every:
                    do_checkpoint()
            processed += len(segs)
            if max_segments is not None and processed >= max_segments:
                break
            if not follow:
                break
        if n_since_ckpt:
            do_checkpoint()  # flush the final partial chunk
    finally:
        for a in actors or []:
            ray.kill(a)
    return m
