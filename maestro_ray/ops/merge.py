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

from maestro_ray.core.schema import LAKE_V2, PAGES_V2
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
LAKE_COLS = [f.name for f in LAKE_V2]


def events_to_candidates(batch: pa.Table) -> pa.Table:
    """CHANGELOG_V3 batch → CANDIDATE (adds null ``text``)."""
    n = batch.num_rows
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["text"] = pa.nulls(n, pa.string())
    return pa.Table.from_arrays([cols[f.name] for f in CANDIDATE], schema=CANDIDATE)


def pages_to_candidates(batch: pa.Table, offset: int = -1) -> pa.Table:
    """PAGES/LAKE batch → CANDIDATE pseudo-events (``offset=-1``).

    Lake files (LAKE_V2) carry a persisted ``op`` column so tombstones
    re-enter later merges as delete candidates; bare PAGES input (e.g.
    bootstrap) has no ``op`` and every row is an insert.
    """
    n = batch.num_rows
    cols = {name: batch.column(name) for name in batch.column_names}
    if "lang" not in cols:
        cols["lang"] = pa.nulls(n, pa.string())
    cols["offset"] = pa.array([offset] * n, pa.int64())
    if "op" not in cols:
        cols["op"] = pa.array(["insert"] * n, pa.string())
    return pa.Table.from_arrays([cols[f.name] for f in CANDIDATE], schema=CANDIDATE)


def _fill_text(winners: pa.Table) -> pa.Table:
    """Extract ``text`` where null (changelog-origin winners only).

    Tombstone winners (``op='delete'``) keep null text — their html is
    null and they never surface through ``read_lake``.
    """
    text = winners.column("text")
    if text.null_count == 0:
        return winners
    html = winners.column("html").to_pylist()
    ops = winners.column("op").to_pylist()
    vals = text.to_pylist()
    out = [
        extract_text(html[i])
        if v is None and ops[i] != "delete"
        else v
        for i, v in enumerate(vals)
    ]
    return winners.set_column(
        winners.schema.get_field_index("text"), "text", pa.array(out, pa.string())
    )


#: payload columns a ``patch`` event may set (non-null = set, null =
#: keep). ``text`` is derived, never patched directly — an html patch
#: nulls it so the frozen extract contract recomputes it.
PATCH_COLS = ("html", "lang")


def _is_patch(batch: pa.Table):
    return pc.fill_null(pc.equal(batch.column("op"), pa.scalar("patch")),
                        False)


def has_patches(batch: pa.Table) -> bool:
    return bool(pc.any(_is_patch(batch)).as_py())


def refuse_patches(batch: pa.Table, where: str) -> pa.Table:
    """Loud guard for paths whose winner-only pre-filters would drop
    patch events silently (slim exchanges, tail mode). Partial-update
    streams must use the shuffle / files / packed replay exchanges."""
    if has_patches(batch):
        raise NotImplementedError(
            f"{where} does not support op='patch' events (its "
            "winner-only pre-reduce would drop them); ingest this log "
            "with exchange='shuffle' (default), 'files' or 'packed'")
    return batch


def combine_candidates(batch: pa.Table) -> pa.Table:
    """Patch-aware per-batch combiner (drop-in for ``lww_reduce`` on
    candidate streams). Full events reduce to the per-url LWW winner as
    before; patch events reduce to ONE row per (url, patched column) —
    the column's latest patch, with the other patch columns nulled
    (splitting a multi-column patch into single-column patches is
    semantics-preserving because each applies independently). Only
    column-maximal patches can ever apply in the final merge, so this
    is an associative-safe combiner: ≤ 1 + len(PATCH_COLS) rows per url
    per batch cross the shuffle."""
    p_mask = _is_patch(batch)
    if not pc.any(p_mask).as_py():
        return lww_reduce(batch)
    full = lww_reduce(batch.filter(pc.invert(p_mask)))
    patches = batch.filter(p_mask)
    parts = [full]
    for col in PATCH_COLS:
        sub = patches.filter(pc.is_valid(patches.column(col)))
        if sub.num_rows == 0:
            continue
        w = lww_reduce(sub)
        for other in PATCH_COLS:  # single-column patch rows
            if other != col:
                i = w.schema.get_field_index(other)
                w = w.set_column(i, other,
                                 pa.nulls(w.num_rows, w.schema.field(i).type))
        parts.append(w)
    return pa.concat_tables(parts, promote_options="default")


def _key_int(t: pa.Table, ts_col: str = "warc_ts",
             off_col: str = "offset"):
    """(ts µs, offset) as int64 numpy arrays; null ts → INT64_MIN (can
    never win a strict 'newer' comparison)."""
    import numpy as np

    ts = pc.fill_null(pc.cast(t.column(ts_col), pa.int64()),
                      np.iinfo(np.int64).min)
    off = pc.fill_null(t.column(off_col), np.iinfo(np.int64).min)
    return (ts.to_numpy(zero_copy_only=False).astype("int64"),
            off.to_numpy(zero_copy_only=False).astype("int64"))


def _apply_patches(base: pa.Table, patches: pa.Table) -> pa.Table:
    """Closed form of the epoch's sequential (warc_ts, offset)-ordered
    fold: for each payload column, the column's LATEST patch applies
    iff its key is strictly newer than the base winner's key and the
    base is not a tombstone; the row's (warc_ts, offset) advances to
    the newest applied patch. Patches for urls with no base row are
    dropped (a patch cannot create a row), patches at/below the base
    key are stale (LWW), and patches never resurrect deletes. A patched
    html nulls ``text`` so ``_fill_text`` re-extracts it."""
    import numpy as np

    if base.num_rows == 0 or patches.num_rows == 0:
        return base
    b_ts, b_off = _key_int(base)
    cur_ts, cur_off = b_ts.copy(), b_off.copy()
    dead = pc.fill_null(pc.equal(base.column("op"), pa.scalar("delete")),
                        False).to_numpy(zero_copy_only=False)
    out = base
    urls = base.column("url")
    for col in PATCH_COLS:
        sub = patches.filter(pc.is_valid(patches.column(col)))
        if sub.num_rows == 0:
            continue
        w = lww_reduce(sub)  # the column's latest patch per url
        w_urls = w.column("url").to_pandas()
        # align patch rows to base rows by url (both unique per table)
        import pandas as pd

        pos = pd.Index(w_urls).get_indexer(urls.to_pandas())
        hit = pos >= 0
        p_ts_all, p_off_all = _key_int(w)
        p_ts = np.where(hit, p_ts_all[np.clip(pos, 0, None)],
                        np.iinfo(np.int64).min)
        p_off = np.where(hit, p_off_all[np.clip(pos, 0, None)],
                         np.iinfo(np.int64).min)
        newer = (p_ts > b_ts) | ((p_ts == b_ts) & (p_off > b_off))
        apply = hit & newer & ~dead
        if not apply.any():
            continue
        take_idx = np.where(apply, np.clip(pos, 0, None), -1)
        vals = w.column(col).combine_chunks().take(
            pa.array(np.clip(take_idx, 0, None), pa.int64()))
        mask = pa.array(apply)
        i = out.schema.get_field_index(col)
        out = out.set_column(
            i, col, pc.if_else(mask, vals, out.column(col)))
        if col == "html":  # derived text must be re-extracted
            j = out.schema.get_field_index("text")
            out = out.set_column(
                j, "text",
                pc.if_else(mask, pa.nulls(out.num_rows, pa.string()),
                           out.column("text")))
        newer_cur = (p_ts > cur_ts) | ((p_ts == cur_ts)
                                       & (p_off > cur_off))
        upd = apply & newer_cur
        cur_ts = np.where(upd, p_ts, cur_ts)
        cur_off = np.where(upd, p_off, cur_off)
    # row recency advances to the newest applied patch key
    bumped = (cur_ts != b_ts) | (cur_off != b_off)
    if bumped.any():
        m = pa.array(bumped)
        k = out.schema.get_field_index("warc_ts")
        out = out.set_column(
            k, "warc_ts",
            pc.if_else(m, pc.cast(pa.array(cur_ts, pa.int64()),
                                  pa.timestamp("us")),
                       out.column("warc_ts")))
        k = out.schema.get_field_index("offset")
        out = out.set_column(
            k, "offset",
            pc.if_else(m, pa.array(cur_off, pa.int64()),
                       out.column("offset")))
    return out


def merge_candidates(prev: pa.Table | None, events: pa.Table) -> pa.Table:
    """Pure merge: previous lake partition (LAKE_V2) + candidate events
    → new LAKE_V2 partition table, sorted by url (deterministic bytes).

    Delete winners are PERSISTED as tombstone rows (op='delete', null
    html/text): an out-of-order update in a later epoch must lose the
    LWW race against the remembered delete, not resurrect the row
    (matches oracle.replay, which keeps every url's winner forever).
    ``read_lake`` filters tombstones; compaction vacuums them once the
    event-time watermark passes.

    ``op='patch'`` events (partial updates: non-null PATCH_COLS set,
    null = keep) fold per the epoch-batched sequential semantics
    (oracle.replay_epochs; closed form in ``_apply_patches``).
    """
    cands = [events if events.schema.equals(CANDIDATE) else events_to_candidates(events)]
    if prev is not None and prev.num_rows:
        cands.append(pages_to_candidates(prev))
    allc = pa.concat_tables(cands, promote_options="default")
    p_mask = _is_patch(allc)
    if pc.any(p_mask).as_py():
        winners = lww_reduce(allc.filter(pc.invert(p_mask)))
        winners = _apply_patches(winners, allc.filter(p_mask))
    else:
        winners = lww_reduce(allc)
    winners = _fill_text(winners)
    out = winners.select(LAKE_COLS)
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")])).cast(LAKE_V2)


def live_row_count(out: pa.Table) -> int:
    """Non-tombstone row count of a LAKE_V2 table."""
    dead = pc.sum(
        pc.cast(pc.equal(out.column("op"), pa.scalar("delete")), pa.int64())
    ).as_py()
    return out.num_rows - (dead or 0)


def ts_max_us(out: pa.Table) -> int | None:
    """Max ``warc_ts`` (µs) over ALL rows incl. tombstones — the
    partition file's change-activity high watermark, recorded in the
    manifest so time-window scans (``io/lake.py read_lake_since``) can
    skip files untouched since a bound without opening them."""
    if out.num_rows == 0:
        return None
    v = pc.max(out.column("warc_ts")).cast(pa.int64()).as_py()
    return int(v) if v is not None else None


def write_exchange(
    batch: pa.Table, ex_dir: str, num_partitions: int
) -> pa.Table:
    """File-exchange writer: split a prepped batch (CANDIDATE + ``p``)
    into partition-grouped Arrow-IPC files under ``ex_dir``.

    This replaces the object-store all-to-all for the merge shuffle: on
    a single node every byte through a ``groupby`` funnels through the
    plasma store's memcpy (measured: the non-scaling floor of the bench
    epoch); on a cluster this pattern is push-based shuffle to shared
    storage. File names are keyed by the batch's min offset — blocks
    partition the log, so retries overwrite their own file with
    identical content (idempotent), and duplicated files would anyway
    be harmless because LWW winner-selection dedups identical rows.
    Returns a tiny ack table (p, rows, file) — the driver folds the
    acks into a (partition → exchange files) map so each merge task
    opens ONLY files that contain its partitions.

    Format: Arrow IPC (uncompressed), ONE record batch per contiguous
    partition GROUP sized to the merge stage's task grouping, with the
    group→p-range map in the schema metadata. IPC encode/decode is
    ~memcpy where parquet pays per-row-group encode setup — the
    parquet variant of this exchange measured 1.43× slim_sort on the
    6M tier AFTER row-group coalescing; IPC closes the rest
    (BASELINE.md r5). Readers (``make_exchange_merge_fn``) still
    accept legacy ``.parquet`` exchange files."""
    import pyarrow.compute as _pc

    if batch.num_rows == 0:
        return pa.table({"p": pa.array([], pa.int32()),
                         "rows": pa.array([], pa.int64()),
                         "file": pa.array([], pa.string())})
    min_off = _pc.min(batch.column("offset")).as_py()
    idx = _pc.sort_indices(batch, sort_keys=[("p", "ascending")])
    s = batch.take(idx)
    pvals = s.column("p").to_numpy(zero_copy_only=False)
    import numpy as np

    from maestro_ray.ops.hashing import hash_array as _ha

    bounds = np.searchsorted(pvals, np.arange(num_partitions + 1))
    # ONE file per batch (a file per (batch, partition) costs an
    # open per tiny file — measured 4x slower end-to-end).
    os.makedirs(ex_dir, exist_ok=True)
    # deterministic per-batch name: min offset disambiguates changelog
    # blocks; the FULL 64-bit first-url hash plus the row count
    # disambiguates bootstrap batches (all offset=-1, disjoint urls) —
    # a 32-bit tag alone would see birthday collisions at ~1.6M blocks
    # (100TB / 64MB), and a collision silently overwrites another
    # batch's exchange file
    tag = int(_ha(s.column("url").slice(0, 1))[0])
    path = os.path.join(
        ex_dir, f"o{min_off:012d}-{tag:016x}-r{s.num_rows}.arrow"
    )
    acks_p, acks_n = [], []
    tmp = path + ".tmp"
    # Record batches cover contiguous PARTITION GROUPS sized to the
    # merge stage's task grouping (num_partitions // CPUs, the same
    # formula _run_epoch_files uses): a merge task owning a group
    # reads exactly one batch per file. A group-size mismatch at read
    # time stays CORRECT: readers select batches via the metadata
    # p-range map and filter rows by the p column.
    from maestro_ray.ops.partition import cluster_cpus

    g = max(1, num_partitions // max(1, cluster_cpus()))
    spans = []  # (p_lo, p_hi_inclusive, row_lo, row_hi) per batch
    for p0 in range(0, num_partitions, g):
        p1 = min(p0 + g, num_partitions)
        lo, hi = bounds[p0], bounds[p1]
        if lo == hi:
            continue
        spans.append((p0, p1 - 1, int(lo), int(hi)))
        for p in range(p0, p1):
            n = bounds[p + 1] - bounds[p]
            if n:
                acks_p.append(p)
                acks_n.append(int(n))
    import json as _json

    schema = s.schema.with_metadata(
        {b"exchange_groups": _json.dumps(
            [[a, b] for a, b, _, _ in spans]).encode()})
    with pa.OSFile(tmp, "wb") as sink:
        with pa.ipc.new_file(sink, schema) as writer:
            for _, _, lo, hi in spans:
                # exactly ONE record batch per span — a multi-chunk
                # slice would write several and break the batch-index
                # ↔ span map the reader navigates by
                sub = s.slice(lo, hi - lo).combine_chunks()
                writer.write_batch(sub.to_batches()[0])
    os.replace(tmp, path)  # atomic: readers never see partial files
    fname = os.path.basename(path)
    return pa.table({"p": pa.array(acks_p, pa.int32()),
                     "rows": pa.array(acks_n, pa.int64()),
                     "file": pa.array([fname] * len(acks_p), pa.string())})


#: packed-exchange row: one zstd-compressed Arrow-IPC blob per
#: (input batch, partition) — see ``pack_exchange``
PACKED = pa.schema(
    [("p", pa.int32()), ("blob", pa.binary()), ("rows", pa.int64())]
)


def pack_exchange(
    batch: pa.Table,
    num_partitions: int,
    codec: str = "zstd",
    level: int = 1,
) -> pa.Table:
    """Compress a prepped batch (CANDIDATE + ``p``) into ONE
    Arrow-IPC blob per partition present → (p, blob, rows) rows.

    This is the r3-VERDICT #1 bandwidth attack: the merge shuffle's
    bytes are dominated by the ``html`` payload, and the single-box
    scaling ceiling is the object store's memcpy bandwidth — so encode
    the payload ONCE in the fused read stage (zstd level 1: ~GB/s,
    template-heavy web HTML compresses 5-20x) and move compressed
    blobs through the exchange; the merge task decodes. On a real
    cluster the same ratio comes off the network shuffle. The sort
    shuffle also now sorts ~blocks×P tiny rows instead of one row per
    event. LWW-safe: blobs carry candidate rows verbatim; the merge
    concatenates and reduces exactly as it would have unpacked.
    """
    import numpy as np

    if batch.num_rows == 0:
        return PACKED.empty_table()
    idx = pc.sort_indices(batch, sort_keys=[("p", "ascending")])
    s = batch.take(idx)
    pv = s.column("p").to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(pv, np.arange(num_partitions + 1))
    opts = pa.ipc.IpcWriteOptions(
        compression=pa.Codec(codec, compression_level=level)
    )
    ps, blobs, rows = [], [], []
    for p in range(num_partitions):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        if lo == hi:
            continue
        sub = s.slice(lo, hi - lo).drop_columns(["p"]).combine_chunks()
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, sub.schema, options=opts) as w:
            w.write_table(sub)
        ps.append(p)
        blobs.append(sink.getvalue().to_pybytes())
        rows.append(hi - lo)
    return pa.table({
        "p": pa.array(ps, pa.int32()),
        "blob": pa.array(blobs, pa.binary()),
        "rows": pa.array(rows, pa.int64()),
    })


def unpack_packed_group(group: pa.Table) -> pa.Table:
    """Inverse of ``pack_exchange`` for one partition's shuffled blob
    rows: decode + concat into the CANDIDATE-with-``p`` table the
    normal merge stage expects."""
    tabs = [
        pa.ipc.open_stream(b).read_all()
        for b in group.column("blob").to_pylist()
    ]
    t = (pa.concat_tables(tabs, promote_options="default")
         if tabs else CANDIDATE.empty_table())
    p = group.column("p")[0].as_py()
    return t.append_column(
        "p", pa.array([p] * t.num_rows, pa.int32()))


def make_exchange_merge_fn(
    lake_dir: str,
    ex_dir: str,
    epoch: int,
    prev_files_ref,
    epoch_watermark: int,
):
    """Merge stage over the per-partition ack fold: each input row is
    (p, files = exchange file names owning partition p, from the writer
    acks grouped distributed in ``_run_epoch_files``). A merge task
    opens ONLY its own files' footers — without the fold, every task
    re-probed EVERY exchange file's footer: O(P × files) metadata reads
    ≈ billions at the module's own 100-TB sizing (VERDICT r2 #5). A
    batch without a ``files`` column (legacy/resume path) falls back to
    the full directory listing — degraded but correct."""

    def merge_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        import ray

        prev_files = ray.get(prev_files_ref) if prev_files_ref is not None else {}
        has_lists = "files" in batch.column_names
        if not has_lists:
            all_ex = (
                sorted(
                    f for f in os.listdir(ex_dir)
                    if f.endswith((".parquet", ".arrow"))
                )
                if os.path.isdir(ex_dir)
                else []
            )
        ps = batch.column("p").to_pylist()
        # Open/read each exchange file ONCE for the whole batch of
        # partitions: with one tiny row group per (batch, partition),
        # per-partition re-opens made parquet footer+row-group setup
        # the slim exchange's dominant cost (measured 2x vs slim_sort
        # on the 6M tier; each merge row re-parsed every owning
        # file's footer). file → wanted-partitions map, one
        # read_row_groups per file, split by the p column.
        file_parts: dict[str, list[int]] = {}
        for row_i, p in enumerate(ps):
            own = batch.column("files")[row_i].as_py() if has_lists else all_ex
            for fname in own:
                file_parts.setdefault(fname, []).append(p)
        part_chunks: dict[int, list[pa.Table]] = {p: [] for p in ps}
        for fname, plist in file_parts.items():
            fpath = os.path.join(ex_dir, fname)
            if fname.endswith(".arrow"):
                # IPC exchange file: select record batches by the
                # writer's p-range metadata map. Zero-copy memory map
                # — filtering happens INSIDE the map's lifetime (the
                # filter kernels copy into owned buffers; the mapped
                # tables themselves must not outlive the close).
                import json as _json

                with pa.memory_map(fpath) as src:
                    rf = pa.ipc.open_file(src)
                    spans = _json.loads(
                        rf.schema.metadata[b"exchange_groups"])
                    tabs = [
                        pa.Table.from_batches([rf.get_batch(i)])
                        for i, (a, b) in enumerate(spans)
                        if any(a <= p <= b for p in plist)
                    ]
                    if not tabs:
                        continue
                    t = pa.concat_tables(tabs)
                    pvals = t.column("p")
                    for p in plist:
                        sel = t.filter(_pc.equal(pvals, p))
                        if sel.num_rows:
                            part_chunks[p].append(
                                sel.drop_columns(["p"]))
                continue
            else:  # legacy parquet exchange: row-group stats pruning
                pf = pq.ParquetFile(fpath)
                md = pf.metadata
                pcol = md.schema.to_arrow_schema().get_field_index("p")
                rgs = []
                for i in range(md.num_row_groups):
                    st = md.row_group(i).column(pcol).statistics
                    if any(st.min <= p <= st.max for p in plist):
                        rgs.append(i)
                if not rgs:
                    continue
                t = pf.read_row_groups(rgs)
            pvals = t.column("p")
            for p in plist:
                sel = t.filter(_pc.equal(pvals, p))
                if sel.num_rows:
                    part_chunks[p].append(sel.drop_columns(["p"]))
        outs = []
        for p in ps:
            chunks = part_chunks[p]
            events = (
                pa.concat_tables(chunks) if chunks else CANDIDATE.empty_table()
            )
            prev_rel = prev_files.get(p)
            if not chunks:
                continue  # untouched: manifest carries the old file forward
            prev = (
                pq.read_table(os.path.join(lake_dir, prev_rel))
                if prev_rel
                else None
            )
            out = merge_candidates(prev, events)
            rel = os.path.join("_staging", f"epoch-{epoch:012d}", f"p={p}.parquet")
            path = os.path.join(lake_dir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(out, path)
            outs.append(
                {
                    "partition": p,
                    "epoch": epoch,
                    "watermark_offset": epoch_watermark,
                    "row_count": out.num_rows,
                    "live_rows": live_row_count(out),
                    "checksum": checksum(out),
                    "ts_max": ts_max_us(out),
                    "n_input": events.num_rows,
                }
            )
        if not outs:
            return pa.table({
                "partition": pa.array([], pa.int32()),
                "epoch": pa.array([], pa.int64()),
                "watermark_offset": pa.array([], pa.int64()),
                "row_count": pa.array([], pa.int64()),
                "live_rows": pa.array([], pa.int64()),
                "checksum": pa.array([], pa.uint64()),
                "ts_max": pa.array([], pa.int64()),
                "n_input": pa.array([], pa.int64()),
            })
        return pa.table({
            "partition": pa.array([o["partition"] for o in outs], pa.int32()),
            "epoch": pa.array([o["epoch"] for o in outs], pa.int64()),
            "watermark_offset": pa.array(
                [o["watermark_offset"] for o in outs], pa.int64()
            ),
            "row_count": pa.array([o["row_count"] for o in outs], pa.int64()),
            "live_rows": pa.array([o["live_rows"] for o in outs], pa.int64()),
            "checksum": pa.array([o["checksum"] for o in outs], pa.uint64()),
            "ts_max": pa.array([o["ts_max"] for o in outs], pa.int64()),
            "n_input": pa.array([o["n_input"] for o in outs], pa.int64()),
        })

    return merge_part


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
                "live_rows": pa.array([live_row_count(out)], pa.int64()),
                "checksum": pa.array([checksum(out)], pa.uint64()),
                "ts_max": pa.array([ts_max_us(out)], pa.int64()),
                "n_input": pa.array([group.num_rows], pa.int64()),
            }
        )

    return merge_group
