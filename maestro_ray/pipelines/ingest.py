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
import ray
import ray.data as rd

from maestro_ray.core.manifest import Manifest, latest_manifest, publish_epoch
from maestro_ray.io.changelog import read_changelog, segments_after
from maestro_ray.io.lake import write_lineage
from maestro_ray.ops.merge import (
    combine_candidates,
    events_to_candidates,
    make_merge_fn,
    pages_to_candidates,
    refuse_patches,
)
from maestro_ray.ops.partition import (
    add_partition_column,
    detect_hot_keys,
    lww_reduce,
    push_based_shuffle,
)




# shared with ops that run their own wide aggregate (ops/partition.py)
_push_based_shuffle = push_based_shuffle


def _stage_epoch(
    ds: rd.Dataset,
    lake_dir: str,
    epoch: int,
    epoch_watermark: int,
    num_partitions: int,
    prev: Manifest | None,
    hot_keys: set | None = None,
    prepped: bool = False,
    packed: bool = False,
) -> tuple[list[dict], dict]:
    """Run the epoch's distributed work (shuffle + merge + staged
    partition files) WITHOUT publishing: returns the lineage rows and
    counters a caller commits via ``publish_epoch``. The seam exists so
    a multi-table transaction (pipelines/multi.py) can stage several
    tables and commit them under one journal record."""
    prev_files = (
        {p: v["file"] for p, v in prev.partitions.items()} if prev else {}
    )
    prev_ref = ray.put(prev_files)

    def prep(batch: pa.Table) -> pa.Table:
        # patch-aware combiner: ≤ 1 full + 1-per-patched-column row
        # per url per batch (plain LWW fast path when no patches)
        batch = combine_candidates(batch)
        return add_partition_column(batch, num_partitions, hot_keys=hot_keys)

    staged = ds if prepped else ds.map_batches(prep, batch_format="pyarrow")
    if hot_keys:
        # salted pre-reduce: collapse each hot url's salted sub-groups,
        # then re-partition on the true key for the final merge.
        def reduce_group(group: pa.Table) -> pa.Table:
            return combine_candidates(group.drop_columns(["p"]))

        def repartition_true(batch: pa.Table) -> pa.Table:
            return add_partition_column(batch, num_partitions)

        staged = (
            staged.groupby("p")
            .map_groups(reduce_group, batch_format="pyarrow")
            .map_batches(repartition_true, batch_format="pyarrow")
        )
    merge_fn = make_merge_fn(lake_dir, epoch, prev_ref, epoch_watermark)
    if packed:
        from maestro_ray.ops.merge import unpack_packed_group

        inner = merge_fn

        def merge_fn(group: pa.Table, _inner=inner):  # decode-then-merge
            return _inner(unpack_packed_group(group))

    lineage_ds = staged.groupby("p").map_groups(merge_fn, batch_format="pyarrow")
    with _push_based_shuffle():
        rows = lineage_ds.take_all()  # O(P) tiny
    counters = {
        "partitions_touched": len(rows),
        "rows_shuffled": sum(r.get("n_input", 0) for r in rows),
        # rows_final = LIVE rows; row_count in the manifest is physical
        # (live + persisted tombstones)
        "rows_final": sum(r.get("live_rows", r["row_count"]) for r in rows),
        "rows_physical": sum(r["row_count"] for r in rows),
    }
    return rows, counters


def _run_epoch(
    ds: rd.Dataset,
    lake_dir: str,
    epoch: int,
    epoch_watermark: int,
    num_partitions: int,
    prev: Manifest | None,
    hot_keys: set | None = None,
    prepped: bool = False,
    packed: bool = False,
) -> Manifest:
    rows, counters = _stage_epoch(
        ds, lake_dir, epoch, epoch_watermark, num_partitions, prev,
        hot_keys, prepped, packed,
    )
    m = publish_epoch(lake_dir, epoch, epoch_watermark, rows, prev, counters,
                      num_partitions=num_partitions)
    write_lineage(lake_dir, epoch, rows)
    return m


def _run_epoch_files(
    acks_ds: rd.Dataset,
    lake_dir: str,
    ex_dir: str,
    epoch: int,
    epoch_watermark: int,
    num_partitions: int,
    prev: Manifest | None,
) -> Manifest:
    """File-exchange epoch: ``acks_ds``'s fused read stage has already
    split prepped candidates into per-partition files under ``ex_dir``
    (ops/merge.py:write_exchange); here we drive it, then run one merge
    task per partition. No object-store all-to-all — the wide payload
    moves via shared storage, which parallelizes (plasma's single-store
    memcpy was the measured scaling floor of the groupby path)."""
    import shutil as _shutil

    prev_files = (
        {p: v["file"] for p, v in prev.partitions.items()} if prev else {}
    )
    prev_ref = ray.put(prev_files)
    from maestro_ray.ops.merge import make_exchange_merge_fn

    # fold the writer acks into per-partition owning-file lists with a
    # DISTRIBUTED groupby over the tiny (p, file) rows — each merge
    # task then opens only the footers of files that contain its
    # partition (VERDICT r2 #5: every task used to probe EVERY exchange
    # file's footer, O(P × files) metadata reads at scale). Untouched
    # partitions produce no ack rows and need no merge task at all —
    # the manifest carries their previous file forward.
    def fold_acks(g: pa.Table) -> pa.Table:
        return pa.table({
            "p": g.column("p").slice(0, 1).cast(pa.int32()),
            "files": pa.array(
                [sorted(set(g.column("file").to_pylist()))],
                pa.list_(pa.string()),
            ),
        })

    owners = acks_ds.groupby("p").map_groups(fold_acks, batch_format="pyarrow")
    fn = make_exchange_merge_fn(lake_dir, ex_dir, epoch, prev_ref,
                                epoch_watermark)
    # merge-task granularity: enough tasks to saturate the cluster,
    # but SEVERAL partitions per task when partitions > CPUs — the
    # merge fn opens each exchange file once per TASK, so grouping
    # divides the per-(partition, file) parquet-open overhead that
    # made slim 2x slower than slim_sort (6M tier: 12.1 s → see
    # BASELINE.md r5). batch_size=1 restored automatically when
    # CPUs >= partitions; Ray's default batching would instead
    # coalesce everything into few serial mega-tasks.
    from maestro_ray.ops.partition import cluster_cpus

    group = max(1, num_partitions // max(1, cluster_cpus()))
    rows = owners.map_batches(
        fn, batch_format="pyarrow", batch_size=group
    ).take_all()
    counters = {
        "partitions_touched": len(rows),
        "rows_shuffled": sum(r.get("n_input", 0) for r in rows),
        "rows_final": sum(r.get("live_rows", r["row_count"]) for r in rows),
        "rows_physical": sum(r["row_count"] for r in rows),
    }
    m = publish_epoch(lake_dir, epoch, epoch_watermark, rows, prev, counters,
                      num_partitions=num_partitions)
    write_lineage(lake_dir, epoch, rows)
    _shutil.rmtree(ex_dir, ignore_errors=True)
    return m


@ray.remote
def _lww_reduce_blocks(*tabs):
    """Tree-reduce node: LWW-combine narrow candidate blocks."""
    return lww_reduce(pa.concat_tables(tabs, promote_options="default"))


def _tree_winner_offsets(ds1, fan_in: int = 8):
    """Global LWW winner offsets of a narrow candidate Dataset, via a
    shuffle-FREE tree reduction over its block refs.

    The sort shuffle's fixed cost (boundary sampling barrier + reduce
    scheduling) measured ~2.4 s at 16 CPUs on ~40 MB of narrow keys —
    pure overhead at this volume. A fan-in-8 task tree over the already
    per-block-combined refs reaches the same global winners in
    O(log_8 blocks) rounds of vectorized reduces, with no barrier and
    no driver funnel (only the final ≤1-row-per-url offsets land on the
    driver). Scale: 100 TB epoch ≈ 1.6 M blocks → 7 tree levels.
    """
    import numpy as np

    refs = list(ds1.to_arrow_refs())
    while len(refs) > 1:
        refs = [
            _lww_reduce_blocks.remote(*refs[i : i + fan_in])
            for i in range(0, len(refs), fan_in)
        ]
    winners = ray.get(refs[0]) if refs else None
    if winners is None or winners.num_rows == 0:
        return np.empty(0, np.int64)
    return np.sort(
        winners.column("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    )


def _run_epoch_slim(
    log_dir: str,
    chunk: list[tuple[int, str]],
    lake_dir: str,
    epoch: int,
    epoch_watermark: int,
    num_partitions: int,
    prev: Manifest | None,
    watermark: int,
    payload_exchange: str = "files",
) -> Manifest:
    """Slim exchange: keep the wide ``html`` payload OUT of the big
    shuffle (SURVEY.md §7 "wide binary rows", VERDICT r1 #2b).

    Pass 1 scans only (offset, url, warc_ts) — parquet column pruning,
    ~2 orders of magnitude fewer bytes than the html column — and finds
    each url's global LWW winner via a shuffle-free tree reduction
    (``_tree_winner_offsets``). Only the winner OFFSETS (8 bytes per
    surviving url) are sorted and broadcast once via ``ray.put``
    (zero-copy numpy in every task).

    Pass 2 re-scans with html, drops every non-winner row immediately
    after decode (vectorized searchsorted against the broadcast
    offsets), and exchanges ONLY winner payloads — ~1 row/url instead
    of ~1 row/url/block. At that volume the per-partition parquet file
    exchange (default) beats the sort shuffle: the sort's fixed barrier
    cost dominates 100 MB-scale exchanges, while the r1 rejection of
    the file exchange was measured on the FULL multi-GB payload.
    Correct because LWW is a max: removing non-maximal changelog
    candidates before the merge cannot change the winner; duplicate
    deliveries of a winner offset pass the filter twice as identical
    rows and collapse in ``lww_reduce``.

    Scale note: the broadcast is one int64 per url touched this epoch —
    cap epoch size (``segments_per_epoch``) so it stays ≪ worker heap
    (10^8-event epochs → ≤800 MB, stored once per node in plasma).
    """
    import numpy as np

    from maestro_ray.core.schema import CHANGELOG_V3

    narrow_head = pa.schema(
        [f for f in CHANGELOG_V3 if f.name in ("offset", "url", "warc_ts")]
    )
    ds1 = read_changelog(
        log_dir, from_offset=watermark, segments=chunk,
        head_schema=narrow_head, columns=[f.name for f in narrow_head],
        transform=lww_reduce,
    )
    offs = _tree_winner_offsets(ds1)
    offs_ref = ray.put(offs)

    def filter_winners(batch: pa.Table) -> pa.Table:
        o = ray.get(offs_ref)
        b = batch.column("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(o):
            ix = np.clip(np.searchsorted(o, b), 0, len(o) - 1)
            mask = o[ix] == b
        else:
            mask = np.zeros(len(b), dtype=bool)
        return batch.filter(pa.array(mask))

    if payload_exchange == "files":
        from maestro_ray.ops.merge import write_exchange

        ex_dir = _exchange_dir(lake_dir, epoch)

        def fused_ex(batch: pa.Table, _np=num_partitions, _ex=ex_dir) -> pa.Table:
            refuse_patches(batch, "exchange='slim'")
            prepped = add_partition_column(
                lww_reduce(events_to_candidates(filter_winners(batch))), _np
            )
            return write_exchange(prepped, _ex, _np)

        # Coalesced exchange writes (un-fuse the write into its own
        # map_batches with batch_size=131072 so row groups grow ~8x)
        # were MEASURED SLOWER here — 11.7 s vs 9.1 s best on the
        # 6M-event epoch at 16 CPUs (r3): the extra object-store hop on
        # the winners stream costs more than the tiny-row-group penalty,
        # which the per-partition exchange-file map (VERDICT r2 #5 fix)
        # already neutralized (slim was 2x slower than shuffle in r2,
        # now ~1.1x). Keeping the fused single-pass writer.
        acks = read_changelog(
            log_dir, from_offset=watermark, segments=chunk, transform=fused_ex
        )
        return _run_epoch_files(
            acks, lake_dir, ex_dir, epoch, epoch_watermark, num_partitions,
            prev,
        )

    def prep_payload(batch: pa.Table, _np=num_partitions) -> pa.Table:
        refuse_patches(batch, "exchange='slim_sort'")
        return add_partition_column(
            lww_reduce(events_to_candidates(filter_winners(batch))), _np
        )

    ds2 = read_changelog(
        log_dir, from_offset=watermark, segments=chunk, transform=prep_payload
    )
    return _run_epoch(
        ds2, lake_dir, epoch, epoch_watermark, num_partitions, prev,
        prepped=True,
    )


def _exchange_dir(lake_dir: str, epoch: int) -> str:
    from maestro_ray.core.manifest import STAGING_DIR

    d = os.path.join(lake_dir, STAGING_DIR, f"epoch-{epoch:012d}-exchange")
    import shutil as _shutil

    _shutil.rmtree(d, ignore_errors=True)  # stale partial runs
    os.makedirs(d, exist_ok=True)
    return d


def bootstrap(
    pages, lake_dir: str, num_partitions: int = 16, exchange: str = "shuffle"
) -> Manifest:
    """Epoch 0: load the base pages table as the lake's initial state."""
    if isinstance(pages, str):
        from maestro_ray.io.changelog import _num_read_blocks

        if os.path.isdir(pages):
            files = sorted(
                os.path.join(pages, f)
                for f in os.listdir(pages)
                if f.endswith(".parquet")
            )
        else:
            files = [pages]
        pages = rd.read_parquet(
            files, override_num_blocks=_num_read_blocks(files)
        )
    elif isinstance(pages, pa.Table):
        pages = rd.from_arrow(pages)
    if exchange == "files":
        os.makedirs(lake_dir, exist_ok=True)
        ex_dir = _exchange_dir(lake_dir, 0)
        from maestro_ray.ops.merge import write_exchange

        def fused_ex(batch: pa.Table) -> pa.Table:
            prepped = add_partition_column(
                lww_reduce(pages_to_candidates(batch)), num_partitions
            )
            return write_exchange(prepped, ex_dir, num_partitions)

        acks = pages.map_batches(fused_ex, batch_format="pyarrow", batch_size=None)
        return _run_epoch_files(acks, lake_dir, ex_dir, 0, -1, num_partitions, None)

    if exchange == "packed":
        from maestro_ray.ops.merge import pack_exchange

        def fused_pk(batch: pa.Table) -> pa.Table:
            return pack_exchange(
                add_partition_column(
                    lww_reduce(pages_to_candidates(batch)), num_partitions
                ),
                num_partitions,
            )

        ds = pages.map_batches(fused_pk, batch_format="pyarrow",
                               batch_size=None)
        return _run_epoch(ds, lake_dir, 0, -1, num_partitions, None,
                          prepped=True, packed=True)

    def fused(batch: pa.Table) -> pa.Table:
        return add_partition_column(
            lww_reduce(pages_to_candidates(batch)), num_partitions
        )

    ds = pages.map_batches(fused, batch_format="pyarrow", batch_size=None)
    return _run_epoch(ds, lake_dir, 0, -1, num_partitions, None, prepped=True)


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
    exchange: str = "shuffle",
) -> Manifest | None:
    """EP1/EP2: replay the changelog into the lake; resumes from the
    newest committed manifest automatically (U7). Returns the final
    manifest (None only if there was nothing at all to do).

    ``exchange``: "shuffle" (default) uses the Ray Data groupby with
    the push-based sort shuffle — measured fastest on this machine;
    "packed" compresses the payload THROUGH that shuffle (one zstd
    Arrow-IPC blob per (block, partition), encoded in the fused read
    stage, decoded in the merge task — ops/merge.py pack_exchange;
    the r3-VERDICT #1 bandwidth attack, A/B table in BASELINE.md r4);
    "slim" is the two-pass variant that keeps the wide html payload out
    of the shuffle (narrow winner pass + winners-only payload pass, see
    ``_run_epoch_slim``) — wins when payload bytes ≫ key bytes;
    "files" routes the merge exchange through per-partition parquet on
    the lake's (shared) filesystem instead of the object store — kept
    as an alternative for plasma-memory-constrained deployments (A/B on
    the 6M-event bench: shuffle 8.9-17.5s, files 36-45s; the parquet
    encode/decode cycle of the exchange loses to plasma here). Salted
    hot-key mode always uses the groupby path.
    """
    if exchange not in ("shuffle", "files", "slim", "slim_sort", "packed"):
        raise ValueError(
            f"exchange={exchange!r}: expected 'shuffle', 'slim', "
            "'slim_sort', 'packed' or 'files'"
        )
    os.makedirs(lake_dir, exist_ok=True)
    m = latest_manifest(lake_dir)
    if m is not None and m.num_partitions not in (None, num_partitions):
        raise ValueError(
            f"lake {lake_dir} was built with num_partitions="
            f"{m.num_partitions}; resuming with {num_partitions} would "
            "re-route urls across partitions and duplicate rows"
        )
    if m is None and base_pages is not None:
        m = bootstrap(base_pages, lake_dir, num_partitions, exchange=exchange)
    watermark = m.watermark if m else -1
    epoch = (m.epoch + 1) if m else 1
    segs = segments_after(log_dir, watermark)
    if not segs:
        return m
    from maestro_ray.io.changelog import check_contiguity

    seg_max = check_contiguity(segs, watermark)  # raises on offset gaps
    chunk_size = segments_per_epoch or len(segs)
    chunks = [segs[i : i + chunk_size] for i in range(0, len(segs), chunk_size)]
    if max_epochs is not None:
        chunks = chunks[:max_epochs]
    for chunk in chunks:
        epoch_watermark = max(seg_max[path] for _first, path in chunk)
        if epoch_watermark <= watermark:
            continue  # fully committed already (e.g. trailing segment rerun)
        hot: set | None = None
        if salt_hot_keys:
            probe = read_changelog(log_dir, from_offset=watermark, segments=chunk)
            if probe is None:
                continue
            hot = detect_hot_keys(probe, threshold=hot_key_threshold)
        # evolve + candidates + combiner (+ exchange write) fused into
        # the read stage: the wide html payload is materialized once
        if hot:
            ds = read_changelog(log_dir, from_offset=watermark, segments=chunk)
            if ds is None:
                continue
            ds = ds.map_batches(events_to_candidates, batch_format="pyarrow")
            m = _run_epoch(
                ds, lake_dir, epoch, epoch_watermark, num_partitions, m, hot
            )
        elif exchange in ("slim", "slim_sort"):
            m = _run_epoch_slim(
                log_dir, chunk, lake_dir, epoch, epoch_watermark,
                num_partitions, m, watermark,
                payload_exchange="files" if exchange == "slim" else "sort",
            )
        elif exchange == "packed":
            from maestro_ray.ops.merge import pack_exchange

            def fused_packed(batch: pa.Table, _np=num_partitions) -> pa.Table:
                return pack_exchange(
                    add_partition_column(
                        combine_candidates(events_to_candidates(batch)),
                        _np,
                    ),
                    _np,
                )

            ds = read_changelog(
                log_dir, from_offset=watermark, segments=chunk,
                transform=fused_packed,
            )
            if ds is None:
                continue
            m = _run_epoch(
                ds, lake_dir, epoch, epoch_watermark, num_partitions, m,
                None, prepped=True, packed=True,
            )
        elif exchange == "files":
            ex_dir = _exchange_dir(lake_dir, epoch)
            from maestro_ray.ops.merge import write_exchange

            def fused_ex(batch: pa.Table, _np=num_partitions, _ex=ex_dir) -> pa.Table:
                prepped = add_partition_column(
                    combine_candidates(events_to_candidates(batch)), _np
                )
                return write_exchange(prepped, _ex, _np)

            acks = read_changelog(
                log_dir, from_offset=watermark, segments=chunk,
                transform=fused_ex,
            )
            if acks is None:
                continue
            m = _run_epoch_files(
                acks, lake_dir, ex_dir, epoch, epoch_watermark,
                num_partitions, m,
            )
        else:
            def fused(batch: pa.Table, _np=num_partitions) -> pa.Table:
                return add_partition_column(
                    combine_candidates(events_to_candidates(batch)), _np
                )

            ds = read_changelog(
                log_dir, from_offset=watermark, segments=chunk, transform=fused
            )
            if ds is None:
                continue
            m = _run_epoch(
                ds, lake_dir, epoch, epoch_watermark, num_partitions, m,
                None, prepped=True,
            )
        watermark = epoch_watermark
        epoch += 1
    return m
