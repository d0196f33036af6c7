"""Lake source/sink helpers (ops S1, S4, S6, S7, U8).

The lake is a directory of hash-partitioned parquet files addressed
ONLY through the newest manifest (core/manifest.py). ``read_lake``
resolves the manifest to a file list and hands it to
``ray.data.read_parquet`` — streaming, column-prunable, and safe to run
concurrently with an in-flight epoch (whose staged files are invisible
until publish).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.core.manifest import LINEAGE_DIR, Manifest, latest_manifest


def read_pages(path: str | list[str], columns: list[str] | None = None,
               predicate=None) -> rd.Dataset:
    """S1: read a pages parquet table, column-pruned + predicate pushdown."""
    return rd.read_parquet(path, columns=columns, filter=predicate)


def lake_files(lake_dir: str, manifest: Manifest | None = None) -> list[str]:
    m = manifest or latest_manifest(lake_dir)
    if m is None:
        return []
    return [
        os.path.join(lake_dir, v["file"])
        for _p, v in sorted(m.partitions.items())
        if v["rows"] > 0
    ]


def require_readable(lake_dir: str, m: Manifest, what: str) -> None:
    """Raise loudly when any of the manifest's partition files was
    vacuumed — the shared guard for every historical-epoch consumer
    (time travel, branching)."""
    missing = [f for f in lake_files(lake_dir, m) if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"{what}: {len(missing)} partition file(s) were vacuumed "
            f"(e.g. {os.path.basename(missing[0])}); only epochs newer "
            "than the last vacuum remain addressable"
        )


def live_mask(batch: pa.Table) -> pa.Array | pa.ChunkedArray:
    """THE liveness rule, defined once: a row is live unless its ``op``
    is ``delete``; null/absent ``op`` (schema-unified pre-tombstone
    rows) counts as live. Shared by ``_drop_tombstones`` and the
    incremental consumers (pipelines/views.py, pipelines/changefeed.py)
    so tombstone semantics can never silently diverge between them."""
    import pyarrow.compute as pc

    if batch.schema.get_field_index("op") < 0:
        return pa.array([True] * batch.num_rows, pa.bool_())
    op = pc.fill_null(batch.column("op"), "insert")
    return pc.not_equal(op, pa.scalar("delete", pa.string()))


def _drop_tombstones(batch: pa.Table, keep_op: bool = False) -> pa.Table:
    """Filter persisted delete markers (LAKE_V2 ``op`` column) out of a
    lake batch; drops the ``op`` column unless the caller asked for it.
    Null ``op`` (schema-unified pre-tombstone rows) counts as live."""
    i = batch.schema.get_field_index("op")
    if i < 0:
        return batch  # pre-tombstone file (e.g. external pages input)
    out = batch.filter(live_mask(batch))
    return out if keep_op else out.remove_column(i)


def read_lake(lake_dir: str, columns: list[str] | None = None,
              manifest: Manifest | None = None,
              transform=None) -> rd.Dataset | None:
    """S7: the converged lake as a lazy Dataset (None if empty).

    Lake files physically carry tombstone rows (core/schema.py LAKE_V2);
    this reader hides them, so the logical schema is PAGES_V2 (or the
    requested column subset). Pass ``columns=[..., "op"]`` to get the
    RAW rows — tombstones included, no filtering — for audits/vacuum
    verification.

    ``transform`` (optional per-batch Table→Table) is FUSED into each
    file group's read stage — never applied after the union a mixed
    lake produces, where it would cost a full-payload object-store hop
    (the fusion-across-union rule; see ``read_lake_since`` row filter).
    """
    files = lake_files(lake_dir, manifest)
    if not files:
        return None

    def _composed(fn):
        """Per-part batch fn ∘ caller transform, fused into one
        map_batches so the part's read stage chains directly into it."""
        if fn is None and transform is None:
            return None
        if fn is None:
            return transform
        if transform is None:
            return fn
        return lambda t: transform(fn(t))

    def _part(files_, fn, **read_kwargs):
        ds = rd.read_parquet(files_, **read_kwargs)
        f = _composed(fn)
        return ds.map_batches(f, batch_format="pyarrow") if f else ds

    # Files are grouped by op-presence (footer probe, O(P) driver-side):
    # a MIXED lake — pre-tombstone partitions untouched since the
    # tombstone upgrade next to newer files — would crash a single
    # read_parquet on schema unification (and, with columns=, on the
    # missing `op` field: ray does NOT null-fill requested columns).
    with_op = [f for f in files if "op" in pq.read_schema(f).names]
    _wo = set(with_op)
    sans_op = [f for f in files if f not in _wo]
    parts = []
    if columns:
        # explicit column list never selects the inferred hive col, and
        # ray's parquet datasource errors on columns= + partitioning=None
        # (UnboundLocalError in _infer_partition_columns, ray 2.49).
        if "op" in columns:  # raw audit view: no tombstone filtering
            base = [c for c in columns if c != "op"]

            def add_null_op(t: pa.Table) -> pa.Table:
                return t.append_column("op", pa.nulls(t.num_rows, pa.string()))

            if with_op:
                parts.append(_part(with_op, None, columns=list(columns)))
            if sans_op:
                parts.append(_part(sans_op, add_null_op, columns=base))
        else:
            if with_op:
                parts.append(
                    _part(with_op, _drop_tombstones,
                          columns=[*columns, "op"]))
            if sans_op:  # pre-tombstone files: every row is live
                parts.append(_part(sans_op, None, columns=list(columns)))
    else:
        # partitioning=None: the p=<k>/ dir layout must NOT be inferred
        # as a hive partition column — `p` is placement, not data.
        if with_op:
            parts.append(_part(with_op, _drop_tombstones,
                               partitioning=None))
        if sans_op:  # pre-tombstone files: every row is live, no op col
            parts.append(_part(sans_op, None, partitioning=None))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def read_lake_at(lake_dir: str, epoch: int,
                 columns: list[str] | None = None) -> rd.Dataset | None:
    """Time travel: the lake EXACTLY as of committed epoch ``epoch``.

    Free by construction — every ``publish_epoch`` retains its manifest
    (a small json) and writes fresh partition files, so any historical
    epoch stays addressable until ``vacuum`` reclaims unreferenced data
    files (standard table-format semantics: history costs only the
    un-vacuumed storage). Reads stream through the normal ``read_lake``
    path (tombstones hidden, column pruning); a vacuumed epoch fails
    loudly instead of returning a partial lake."""
    from maestro_ray.core.manifest import manifest_at

    m = manifest_at(lake_dir, epoch)  # raises with available history
    require_readable(lake_dir, m,
                     f"epoch {epoch} of {lake_dir} is no longer readable")
    return read_lake(lake_dir, columns=columns, manifest=m)


def read_lake_at_offset(lake_dir: str, offset: int,
                        columns: list[str] | None = None
                        ) -> rd.Dataset | None:
    """Time travel by CHANGELOG POSITION: the lake state after applying
    every change event with offset ≤ ``offset`` and nothing beyond —
    i.e. the newest committed epoch whose watermark ≤ offset. This is
    the replay-semantics cousin of ``read_lake_at`` (epochs are an
    implementation detail; offsets are the changelog's own coordinate
    system, what a debugging "what did row X look like before event N"
    session actually has in hand).

    Exactness caveat, stated loudly: epochs are the commit granularity,
    so an ``offset`` strictly inside an epoch's range resolves to the
    epoch BELOW it (the last state that provably contains no event past
    ``offset``). Raises if even the genesis epoch is newer."""
    from maestro_ray.core.manifest import list_epochs, manifest_at

    # watermarks are monotone across epochs: scan newest-first and stop
    # at the first hit — O(epochs past the offset), not O(history)
    best = None
    for e in reversed(list_epochs(lake_dir)):
        m = manifest_at(lake_dir, e)
        if m.watermark <= offset:
            best = m
            break
    if best is None:
        raise ValueError(
            f"no committed epoch of {lake_dir} has watermark <= "
            f"{offset} (earliest epoch is already past it)")
    require_readable(lake_dir, best,
                     f"offset {offset} (epoch {best.epoch}) of "
                     f"{lake_dir} is no longer readable")
    return read_lake(lake_dir, columns=columns, manifest=best)


def lookup_urls(lake_dir: str, urls: list[str],
                columns: list[str] | None = None,
                manifest: Manifest | None = None) -> pa.Table:
    """Keyed point lookup: the live rows for ``urls``, reading ONLY the
    partition files that can own them.

    This is the 100-TB point-read path: ``p = hash64(url) % P`` (the
    same routing the ingest shuffle uses, ops/hashing.py partition_ids)
    resolves each url to exactly one partition via the manifest — a
    k-url lookup opens ≤ min(k, P) files out of the whole lake, and
    within each file the parquet url row-group statistics prune further
    (partition files are sorted by url). Runs driver-side on a thread
    pool — a latency-path read should not need cluster scheduling; the
    per-file work is a footer plus the matching row groups.

    A lake without a recorded ``num_partitions`` (pre-routing manifest)
    degrades to scanning every file — correct, just not pruned.
    """
    from concurrent.futures import ThreadPoolExecutor

    from maestro_ray.core.schema import PAGES_V2
    from maestro_ray.ops.hashing import partition_ids

    m = manifest or latest_manifest(lake_dir)
    want = list(columns) if columns else [f.name for f in PAGES_V2]
    out_schema = pa.schema(
        [PAGES_V2.field(c) if PAGES_V2.get_field_index(c) >= 0
         else pa.field(c, pa.string()) for c in want])
    if m is None or not urls:
        return out_schema.empty_table()
    if m.num_partitions:
        by_p: dict[int, list[str]] = {}
        for u, p in zip(urls, partition_ids(pa.array(urls, pa.string()),
                                            m.num_partitions)):
            by_p.setdefault(int(p), []).append(u)
        tasks = [
            (os.path.join(lake_dir, m.partitions[p]["file"]), us)
            for p, us in sorted(by_p.items())
            if p in m.partitions and m.partitions[p]["rows"] > 0
        ]
    else:  # degraded: no routing info — every file may own any url
        tasks = [(f, list(urls)) for f in lake_files(lake_dir, m)]

    def read_one(task):
        path, us = task
        names = pq.read_schema(path).names
        cols = [c for c in want if c in names]
        need = sorted({*cols, "url"} | ({"op"} if "op" in names else set()))
        t = pq.read_table(
            path, columns=need,
            filters=[("url", "in", us)],  # row-group stats prune here
        )
        t = _drop_tombstones(t, keep_op="op" in want)
        for c in want:  # pre-evolution files: null-fill missing columns
            if c not in t.column_names:
                t = t.append_column(
                    c, pa.nulls(t.num_rows, out_schema.field(c).type))
        return t.select(want).cast(pa.schema([out_schema.field(c)
                                              for c in want]))

    if not tasks:
        return out_schema.empty_table()
    with ThreadPoolExecutor(max_workers=min(16, len(tasks))) as ex:
        parts = list(ex.map(read_one, tasks))
    t = pa.concat_tables(parts)
    if "url" in t.column_names:
        import pyarrow.compute as pc

        t = t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))
    return t


def read_lake_since(lake_dir: str, since_ts_us: int,
                    columns: list[str] | None = None,
                    manifest: Manifest | None = None) -> rd.Dataset | None:
    """Time-window scan: live rows with ``warc_ts >= since_ts_us``,
    skipping every partition file whose manifest ``ts_max`` (the file's
    change-activity high watermark, recorded at merge time) is below
    the bound — the manifest alone prunes untouched partitions without
    opening a single footer. Entries without ``ts_max`` (pre-r3 lakes)
    are conservatively read. Returns None when no file can qualify."""
    import pyarrow.compute as pc

    m = manifest or latest_manifest(lake_dir)
    if m is None:
        return None
    keep = {
        p: v for p, v in m.partitions.items()
        if v.get("ts_max") is None or v["ts_max"] >= since_ts_us
    }
    if not keep:
        return None
    sub = Manifest(epoch=m.epoch, watermark=m.watermark, partitions=keep,
                   counters=m.counters, num_partitions=m.num_partitions)
    cols = None if columns is None else (
        list(columns) if "warc_ts" in columns else [*columns, "warc_ts"])
    bound = pa.scalar(since_ts_us, pa.timestamp("us"))

    def row_filter(t: pa.Table) -> pa.Table:
        out = t.filter(pc.greater_equal(t.column("warc_ts"), bound))
        if columns is not None and "warc_ts" not in columns:
            out = out.drop_columns(["warc_ts"])
        return out

    # transform= fuses the filter into each file group's read stage —
    # applied after the union of a mixed lake it would pay a
    # full-payload object-store hop (fusion-across-union rule)
    return read_lake(lake_dir, columns=cols, manifest=sub,
                     transform=row_filter)


def clone_lake(src_dir: str, dst_dir: str,
               epoch: int | None = None,
               with_history: bool = False) -> Manifest:
    """Zero-copy branch: materialize ``src_dir``'s state at ``epoch``
    (default: newest) as an independent lake at ``dst_dir``.

    Partition files are HARDLINKED (same inode, no bytes copied — a
    100-TB branch costs metadata only; falls back to a real copy across
    filesystems), which is safe because lake files are immutable by
    design: every epoch writes fresh files and ``vacuum`` only unlinks
    names, so vacuum/compaction/ingest on either side can never corrupt
    the other. The branch starts with exactly one manifest (its base
    epoch) plus the base epoch's lineage records; further ``ingest``
    into it continues from epoch+1 and diverges freely. A vacuumed base
    epoch fails loudly, same contract as time travel.

    ``with_history=True`` additionally carries over every RETAINED
    manifest at or below the base epoch whose referenced files still
    exist (plus those files and lineage, hardlinked the same way) — a
    branch with working time travel / change feeds / rollback.
    Partially-vacuumed history epochs are silently skipped (the fsck
    ``missing_history`` warning class: their manifests were already
    unreadable on the source)."""
    import errno
    import shutil

    from maestro_ray.core.manifest import (
        LINEAGE_DIR,
        list_epochs,
        manifest_at,
        manifest_path,
        write_manifest_atomic,
    )

    if epoch is None:
        m = latest_manifest(src_dir)
        if m is None:
            raise FileNotFoundError(f"no manifest in {src_dir}")
        epoch = m.epoch
    else:
        m = manifest_at(src_dir, epoch)  # raises with available history
    require_readable(src_dir, m,
                     f"cannot branch {src_dir} at epoch {epoch}")
    if os.path.exists(manifest_path(dst_dir, epoch)):
        raise FileExistsError(f"{dst_dir} already has an epoch {epoch}")

    def link(src: str, dst: str) -> None:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError as ex:
            if ex.errno == errno.EEXIST:
                # retry of a crashed clone: the SAME inode is fine
                # (idempotent); a DIFFERENT file means dst holds another
                # lake's data — never silently overwrite it
                if os.path.samefile(src, dst):
                    return
                raise FileExistsError(
                    f"{dst} exists and is not {src}; refusing to "
                    "overwrite another lake's file"
                ) from ex
            if ex.errno == errno.EXDEV:  # cross-filesystem → real copy
                shutil.copy2(src, dst)
                return
            raise

    def clone_one(mx: Manifest) -> None:
        for v in mx.partitions.values():
            if v["rows"] > 0:
                link(os.path.join(src_dir, v["file"]),
                     os.path.join(dst_dir, v["file"]))
        lin = os.path.join(src_dir, LINEAGE_DIR,
                           f"epoch-{mx.epoch:012d}.parquet")
        if os.path.exists(lin):
            link(lin, os.path.join(dst_dir, LINEAGE_DIR,
                                   os.path.basename(lin)))
        write_manifest_atomic(manifest_path(dst_dir, mx.epoch), mx)

    if with_history:
        for e in list_epochs(src_dir):
            if e >= epoch:
                continue
            mh = manifest_at(src_dir, e)
            if all(v["rows"] == 0 or os.path.exists(
                    os.path.join(src_dir, v["file"]))
                   for v in mh.partitions.values()):
                clone_one(mh)
    clone_one(m)
    return m


def read_lake_table(lake_dir: str, manifest: Manifest | None = None) -> pa.Table:
    """Driver-side full read — FOR TESTS ONLY (small lakes)."""
    files = lake_files(lake_dir, manifest)
    if not files:
        from maestro_ray.core.schema import PAGES_V2

        return PAGES_V2.empty_table()
    # promote_options: a MIXED lake (pre-tombstone files lacking `op`)
    # must null-fill the missing column, not raise ArrowInvalid;
    # _drop_tombstones treats null op as live
    t = pa.concat_tables(
        [pq.read_table(f) for f in files], promote_options="default"
    )
    t = _drop_tombstones(t)
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def compact_partitions(
    lake_dir: str,
    target_rows_per_file: int = 1_000_000,
    row_group_size: int = 128 * 1024,
    vacuum_tombstones_ts: int | None = None,
) -> Manifest:
    """U8: rewrite each partition's file with right-sized row groups
    under a new manifest epoch. Runs as Ray tasks (one per partition);
    the driver only publishes.

    Without ``vacuum_tombstones_ts`` there is no semantic change —
    per-partition checksums are invariant (asserted against the input
    file), so readers see identical data addressed by the new manifest.

    ``vacuum_tombstones_ts`` (µs since epoch) additionally drops
    tombstone rows whose ``warc_ts`` is strictly below the bound. ONLY
    pass a bound the ingest source guarantees: no future change event
    may carry ``warc_ts`` older than it (an event-time low watermark) —
    otherwise a late out-of-order event could resurrect a vacuumed
    delete. Live rows are never touched; checksums are recomputed on
    the vacuumed table."""
    import ray

    from maestro_ray.core.manifest import STAGING_DIR, publish_epoch
    from maestro_ray.ops.hashing import checksum as _checksum

    m = latest_manifest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {lake_dir}")
    epoch = m.epoch + 1

    @ray.remote
    def compact_one(p: int, rel: str, expect_checksum: int, watermark: int) -> dict:
        import pyarrow.compute as pc

        t = pq.read_table(os.path.join(lake_dir, rel))
        got = _checksum(t)
        assert got == expect_checksum, f"partition {p} checksum drift"
        if vacuum_tombstones_ts is not None and "op" in t.column_names:
            expired = pc.and_(
                pc.equal(t.column("op"), pa.scalar("delete", pa.string())),
                pc.less(
                    t.column("warc_ts"),
                    pa.scalar(vacuum_tombstones_ts, pa.timestamp("us")),
                ),
            )
            t = t.filter(pc.invert(pc.fill_null(expired, False)))
            got = _checksum(t)
        out_rel = os.path.join(STAGING_DIR, f"epoch-{epoch:012d}", f"p={p}.parquet")
        path = os.path.join(lake_dir, out_rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(t, path, row_group_size=row_group_size)
        from maestro_ray.ops.merge import ts_max_us

        return {
            "partition": p,
            "epoch": epoch,
            "watermark_offset": watermark,
            "row_count": t.num_rows,
            "checksum": got,
            "ts_max": ts_max_us(t),
            "n_input": t.num_rows,
        }

    rows = ray.get(
        [
            compact_one.remote(p, v["file"], v["checksum"], v["watermark"])
            for p, v in m.partitions.items()
            if v["rows"] > 0
        ]
    )
    return publish_epoch(lake_dir, epoch, m.watermark, rows, m)


def write_lineage(lake_dir: str, epoch: int, rows: list[dict]) -> str:
    """S6: per-partition lineage records for one epoch (tiny, driver-side)."""
    from maestro_ray.core.schema import LINEAGE

    path = os.path.join(lake_dir, LINEAGE_DIR, f"epoch-{epoch:012d}.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = [
        pa.array([r[f.name] for r in rows], type=f.type) for f in LINEAGE
    ]
    pq.write_table(pa.Table.from_arrays(arrays, schema=LINEAGE), path)
    return path


def read_lineage(lake_dir: str) -> pa.Table | None:
    d = os.path.join(lake_dir, LINEAGE_DIR)
    if not os.path.isdir(d):
        return None
    files = sorted(os.path.join(d, n) for n in os.listdir(d) if n.endswith(".parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files]) if files else None


def repartition_lake(lake_dir: str, new_num_partitions: int) -> Manifest:
    """Online partition-count MIGRATION: rewrite the lake's current
    state (live rows AND tombstones — the LWW memory must move too)
    under ``p = hash64(url) % new_P``, committed as one new manifest
    epoch whose partition map REPLACES the old one (no carry-forward —
    old and new partition ids overlap numerically).

    This closes the operational gap behind the ingest guard ("lake was
    built with num_partitions=P"): grow P as the corpus grows, then
    resume ``ingest(..., num_partitions=new_P)``. History stays
    addressable — older manifests keep the old partitioning until
    vacuum, and time travel reads them unchanged.

    Plan: one streaming pass over the current files (Dataset read →
    route → ONE shuffle → per-new-partition sort-by-url + staged write,
    the merge stage's determinism rules), then the standard atomic
    publish. The multiset of rows is untouched, so the mergeable
    content checksum (sum of row hashes mod 2^64) over all partitions
    is INVARIANT — asserted before publish.
    """
    import ray
    import ray.data as rd

    from maestro_ray.core.manifest import publish_epoch
    from maestro_ray.core.schema import LAKE_V2
    from maestro_ray.ops.hashing import checksum as _checksum
    from maestro_ray.ops.merge import ts_max_us
    from maestro_ray.ops.partition import partition_ids

    if new_num_partitions < 1:
        raise ValueError(f"new_num_partitions={new_num_partitions}")
    m = latest_manifest(lake_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest in {lake_dir}")
    require_readable(lake_dir, m, "repartition")
    if m.num_partitions == new_num_partitions:
        return m
    epoch = m.epoch + 1
    old_total = sum(int(v["checksum"]) for v in m.partitions.values()) \
        % (2 ** 64)
    lake_cols = [f.name for f in LAKE_V2]

    def route(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # conform older files to LAKE_V2 (null op = live insert)
        cols = []
        for f in LAKE_V2:
            i = t.schema.get_field_index(f.name)
            if i >= 0:
                cols.append(pc.cast(t.column(i), f.type))
            elif f.name == "op":
                cols.append(pa.array(["insert"] * t.num_rows, pa.string()))
            else:
                cols.append(pa.nulls(t.num_rows, f.type))
        t = pa.Table.from_arrays(cols, schema=LAKE_V2)
        p = partition_ids(t.column("url"), new_num_partitions)
        return t.append_column("p", pa.array(p, pa.int32()))

    def write_part(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = group.column("p")[0].as_py()
        out = group.drop_columns(["p"])
        out = out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))
        out = out.cast(LAKE_V2)
        rel = os.path.join("_staging", f"epoch-{epoch:012d}", f"p={p}.parquet")
        path = os.path.join(lake_dir, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(out, path)
        live = out.filter(live_mask(out)).num_rows
        return pa.table({
            "partition": pa.array([p], pa.int32()),
            "row_count": pa.array([out.num_rows], pa.int64()),
            "live_rows": pa.array([live], pa.int64()),
            "checksum": pa.array([_checksum(out)], pa.uint64()),
            "watermark_offset": pa.array([m.watermark], pa.int64()),
            "ts_max": pa.array([ts_max_us(out)], pa.int64()),
        })

    files = lake_files(lake_dir, m)
    if not files:
        raise ValueError(f"{lake_dir}: manifest has no data files")
    from maestro_ray.io.changelog import _num_read_blocks

    # byte-sized read blocks: the very next operation is a sort shuffle
    # and Ray's default ~200-block floor pays O(blocks²) fetches there
    ds = rd.read_parquet(
        files, override_num_blocks=_num_read_blocks(files)
    ).map_batches(route, batch_format="pyarrow")
    rows = ds.groupby("p").map_groups(
        write_part, batch_format="pyarrow").take_all()
    new_total = sum(int(r["checksum"]) for r in rows) % (2 ** 64)
    assert new_total == old_total, (
        f"repartition content drift: checksum {old_total} -> {new_total}")
    counters = {
        "repartitioned_from": m.num_partitions or -1,
        "repartitioned_to": new_num_partitions,
        "rows_physical": sum(r["row_count"] for r in rows),
    }
    # prev=None: the new partition map REPLACES the old ids entirely
    out_m = publish_epoch(lake_dir, epoch, m.watermark, rows, None,
                          counters, num_partitions=new_num_partitions)
    write_lineage(lake_dir, epoch, [
        {**r, "epoch": epoch} for r in rows
    ])
    return out_m


def export_lake(
    lake_dir: str,
    out_dir: str,
    fmt: str = "jsonl",
    columns: list[str] | None = None,
) -> dict:
    """Export the lake's LIVE rows to a directory of csv/jsonl files —
    one file per lake partition, so the export parallelizes like the
    lake and RESUMES: a part file that already exists is skipped, a
    crashed run redoes only the missing parts (tmp+rename keeps
    partials invisible). Binary columns (html) are excluded by default
    and rejected loudly if requested — neither format round-trips raw
    bytes. Rows are url-sorted within a part for deterministic files.
    Returns {files, rows, skipped}."""
    import ray

    if fmt not in ("jsonl", "csv"):
        raise ValueError(f"fmt={fmt!r}: jsonl|csv")
    m = latest_manifest(lake_dir)
    if m is None:
        raise ValueError(f"no committed epochs in {lake_dir}")
    require_readable(lake_dir, m, "export")
    from maestro_ray.core.schema import LAKE_V2

    if columns is not None:
        bad = [c for c in columns
               if LAKE_V2.get_field_index(c) >= 0
               and pa.types.is_binary(
                   LAKE_V2.field(LAKE_V2.get_field_index(c)).type)]
        if bad:
            raise ValueError(
                f"binary column(s) {bad} cannot be exported to {fmt}; "
                "export them as parquet or drop them")
        # unknown columns fail LOUDLY (neither in the lake schema nor
        # in any live partition file) — silently dropping a typo'd
        # column is the r3 'silent column typos' class
        part_names: set[str] = set()
        for ent in m.partitions.values():
            if ent["rows"] > 0:
                part_names.update(pq.read_schema(
                    os.path.join(lake_dir, ent["file"])).names)
        unknown = [c for c in columns
                   if LAKE_V2.get_field_index(c) < 0
                   and c not in part_names]
        if unknown:
            raise ValueError(
                f"export_lake: unknown column(s) {unknown}; lake "
                f"columns: {sorted(part_names)}")
    os.makedirs(out_dir, exist_ok=True)
    ext = "jsonl" if fmt == "jsonl" else "csv"
    # resume identity: a part file may only be reused for THE SAME
    # (epoch, fmt, columns) run — resuming over an older export would
    # silently mix lake epochs (r4 s4 review finding)
    ident = {"epoch": m.epoch, "fmt": fmt,
             "columns": list(columns) if columns is not None else None}
    marker = os.path.join(out_dir, "_export_meta.json")
    if os.path.exists(marker):
        with open(marker) as f:
            prev = json.load(f)
        if prev != ident:
            raise ValueError(
                f"out_dir {out_dir} holds an export of {prev}; this "
                f"run is {ident} — use a fresh directory (or clear it)")
    else:
        if any(n.startswith("part-") for n in os.listdir(out_dir)):
            raise ValueError(
                f"out_dir {out_dir} has part files but no export "
                "marker; refusing to mix with unknown prior output")
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ident, f)
        os.replace(tmp, marker)

    def export_one(p: int, rel: str) -> dict:
        out_path = os.path.join(out_dir, f"part-{p:05d}.{ext}")
        if os.path.exists(out_path):
            return {"p": p, "rows": -1, "skipped": True}
        t = pq.read_table(os.path.join(lake_dir, rel))
        t = t.filter(live_mask(t))
        if columns is None:
            keep = [f.name for f in t.schema
                    if not pa.types.is_binary(f.type) and f.name != "op"]
        else:
            # pre-evolution files may lack a (validated) column:
            # null-fill so every part carries the SAME columns
            from maestro_ray.pipelines.changefeed import _payload_type

            keep = list(columns)
            for c in keep:
                if c not in t.column_names:
                    t = t.append_column(
                        c, pa.nulls(t.num_rows, _payload_type(c)))
        t = t.select(keep).sort_by("url" if "url" in keep else keep[0])
        tmp = out_path + ".tmp"
        if fmt == "csv":
            import pyarrow.csv as pacsv

            pacsv.write_csv(t, tmp)
        else:
            t.to_pandas().to_json(tmp, orient="records", lines=True,
                                  date_format="iso", date_unit="us")
        os.replace(tmp, out_path)
        return {"p": p, "rows": t.num_rows, "skipped": False}

    jobs = [(p, ent["file"]) for p, ent in sorted(m.partitions.items())
            if ent["rows"] > 0]
    if ray.is_initialized() and len(jobs) > 1:
        task = ray.remote(num_cpus=1)(export_one)
        results = ray.get([task.remote(p, rel) for p, rel in jobs])
    else:
        results = [export_one(p, rel) for p, rel in jobs]
    return {
        "files": sum(1 for r in results if not r["skipped"]),
        "rows": sum(r["rows"] for r in results if not r["skipped"]),
        "skipped": sum(1 for r in results if r["skipped"]),
        "epoch": m.epoch,
    }


def purge_urls(lake_dir: str, urls: list[str]) -> dict:
    """Hard-delete (GDPR / right-to-be-forgotten): remove EVERY trace of
    ``urls`` — live rows, superseded versions AND tombstones — from all
    RETAINED epochs, by rewriting the affected partition files in place
    of history and republishing every retained manifest.

    This is stronger than a CDC delete event (which adds a tombstone but
    leaves old versions time-travelable): after ``purge_urls`` no
    retained epoch's ``read_lake_at`` can see the url, and the bytes are
    gone from disk once the old files are GC'd at the end of the call.

    Scale shape: the routing hash prunes work to ≤ min(k, P) partitions
    *per distinct partitioning* in retained history (a manifest without
    ``num_partitions`` degrades to all partitions); each affected FILE —
    deduplicated across manifests, carried-forward entries share files —
    is rewritten once (Ray tasks when a session exists, threads
    otherwise). Manifest entries are patched with the new file / rows /
    checksum; ``ts_max`` is kept (an upper bound stays prune-correct).

    Crash safety / idempotence: rewritten files land first under
    DETERMINISTIC names (``<old-stem>.purge-<tag>.parquet`` where the
    tag hashes the sorted url set), then each manifest is atomically
    replaced, then old files unreferenced by any retained manifest are
    removed. A crash mid-way re-runs to the same file names
    (``os.replace`` with identical bytes) and converges; re-running a
    completed purge is a no-op (the urls are already absent).

    OUT OF SCOPE, reported in the result: derived stores (``_views``,
    search/vector/near-dup indexes, clones, exports, replicas) and the
    source changelog may still hold the urls — rebuild or purge those
    separately. Hardlinked clones pin the OLD inodes: purging the source
    does not erase a clone's copy (and vice versa).

    Returns ``{"urls": k, "files_rewritten": n, "rows_removed": n,
    "manifests_updated": n, "files_removed": n, "derived_state": [..]}``.
    """
    import ray

    from maestro_ray.core.manifest import (
        _remove_unreferenced,
        list_epochs,
        manifest_at,
        manifest_path,
        write_manifest_atomic,
    )
    from maestro_ray.ops.hashing import checksum as _checksum
    from maestro_ray.ops.hashing import partition_ids

    urls = sorted(set(urls))
    epochs = list_epochs(lake_dir)
    if not epochs:
        raise ValueError(f"no committed epochs in {lake_dir}")
    if not urls:
        return {"urls": 0, "files_rewritten": 0, "rows_removed": 0,
                "manifests_updated": 0, "files_removed": 0,
                "derived_state": []}
    manifests = {e: manifest_at(lake_dir, e) for e in epochs}
    url_arr = pa.array(urls, pa.string())
    # purge tag: deterministic per url-set so a crashed run re-lands on
    # the same destination names (idempotent os.replace)
    tag = f"{_checksum(pa.table({'url': url_arr})):016x}"

    # affected partitions PER MANIFEST (num_partitions may differ across
    # retained history — repartition_lake changes it)
    route_cache: dict[int, set[int]] = {}

    def affected(m: Manifest) -> set[int]:
        if not m.num_partitions:
            return set(m.partitions)  # degraded: no routing info
        if m.num_partitions not in route_cache:
            route_cache[m.num_partitions] = {
                int(p) for p in partition_ids(url_arr, m.num_partitions)}
        return route_cache[m.num_partitions]

    # distinct candidate files across all retained manifests
    rels: set[str] = set()
    for m in manifests.values():
        hit = affected(m)
        for p, ent in m.partitions.items():
            if p in hit and ent["rows"] > 0:
                rels.add(ent["file"])
    missing = [r for r in sorted(rels)
               if not os.path.exists(os.path.join(lake_dir, r))]
    # vacuumed history files: their epochs already fail loudly at read
    # time (missing_history in fsck) — nothing to erase there
    rels -= set(missing)

    def rewrite_one(rel: str) -> dict:
        import pyarrow.compute as pc

        t = pq.read_table(os.path.join(lake_dir, rel))
        drop = pc.is_in(t.column("url"), value_set=url_arr)
        n_drop = int(pc.sum(drop).as_py() or 0)
        if n_drop == 0:
            return {"rel": rel, "new_rel": None, "removed": 0}
        out = t.filter(pc.invert(drop))
        new_rel = rel[:-len(".parquet")] + f".purge-{tag}.parquet"
        path = os.path.join(lake_dir, new_rel)
        tmp = path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        return {"rel": rel, "new_rel": new_rel, "removed": n_drop,
                "rows": out.num_rows, "checksum": _checksum(out)}

    jobs = sorted(rels)
    if ray.is_initialized() and len(jobs) > 1:
        task = ray.remote(num_cpus=1)(rewrite_one)
        results = ray.get([task.remote(r) for r in jobs])
    else:
        results = [rewrite_one(r) for r in jobs]
    rewritten = {r["rel"]: r for r in results if r["new_rel"]}

    # patch every retained manifest that references a rewritten file
    manifests_updated = 0
    for e in epochs:
        m = manifests[e]
        touched = False
        for p, ent in m.partitions.items():
            rw = rewritten.get(ent["file"])
            if rw is None:
                continue
            ent["file"] = rw["new_rel"]
            ent["rows"] = int(rw["rows"])
            ent["checksum"] = int(rw["checksum"])
            touched = True
        if touched:
            write_manifest_atomic(manifest_path(lake_dir, e), m)
            manifests_updated += 1

    # GC: the old pre-purge files are now unreferenced — this is the
    # actual erasure step
    live = {
        os.path.normpath(os.path.join(lake_dir, v["file"]))
        for m in manifests.values()
        for v in m.partitions.values()
    }
    files_removed = _remove_unreferenced(lake_dir, live)

    derived = sorted(
        d for d in os.listdir(lake_dir)
        if d.startswith("_")
        and d not in ("_manifests", "_lineage", "_staging")
        and os.path.isdir(os.path.join(lake_dir, d))
    )
    return {
        "urls": len(urls),
        "files_rewritten": len(rewritten),
        "rows_removed": int(sum(r["removed"] for r in results)),
        "manifests_updated": manifests_updated,
        "files_removed": files_removed,
        "derived_state": derived,
    }


def fsck_lake(lake_dir: str, deep: bool = False) -> dict:
    """Lake integrity audit (the fsck / Iceberg-verify analog) — cheap
    enough to run after every publish, exhaustive with ``deep``:

    - every file referenced by any RETAINED manifest exists and its
      parquet row count matches the manifest entry;
    - ``deep=True`` additionally recomputes each referenced file's
      order-insensitive content checksum against the manifest (full
      read — parallel Ray tasks when a session exists) and verifies
      the lake's two structural invariants per HEAD partition file:
      at most one row per url (the LWW merge contract) and
      hash(url) % P routing (catches mis-routed rows after a botched
      repartition);
    - watermarks must be monotone over the epoch history;
    - stray parquet files no retained manifest references, leftover
      staging dirs, and orphaned ``*.tmp`` files are reported as
      warnings (vacuum/expire candidates or crash garbage — harmless
      by protocol, listed for the operator);
    - a file referenced ONLY by non-head manifests that is gone is a
      ``missing_history`` warning, not corruption: plain ``vacuum``
      legitimately reclaims history files while their manifests remain
      addressable (time travel to those epochs fails loudly at read
      time — already the documented contract). Missing HEAD files are
      always errors.

    Returns a report dict; ``ok`` is True when nothing REFERENCED is
    missing or corrupt (warnings don't fail the check)."""
    from concurrent.futures import ThreadPoolExecutor

    from maestro_ray.core.manifest import (
        LINEAGE_DIR,
        MANIFEST_DIR,
        STAGING_DIR,
        VIEWS_DIR,
        list_epochs,
        manifest_at,
    )
    from maestro_ray.ops.hashing import checksum as _checksum

    epochs = list_epochs(lake_dir)
    report: dict = {
        "epochs": epochs, "missing": [], "row_mismatch": [],
        "checksum_mismatch": [], "watermark_regression": [],
        "stray_files": [], "staging_leftovers": [], "tmp_files": [],
    }
    if not epochs:
        report["ok"] = True
        return report

    manifests = [manifest_at(lake_dir, e) for e in epochs]
    for prev, cur in zip(manifests, manifests[1:]):
        if cur.watermark < prev.watermark:
            report["watermark_regression"].append(
                {"epoch": cur.epoch, "watermark": cur.watermark,
                 "prev_epoch": prev.epoch,
                 "prev_watermark": prev.watermark})

    # (rel, rows, checksum) for every referenced file, newest wins the
    # metadata row (identical by construction — files are immutable)
    refs: dict[str, dict] = {}
    for m in manifests:
        for v in m.partitions.values():
            if v["rows"] > 0:
                refs[v["file"]] = v
    head = manifests[-1]
    head_parts = {v["file"]: p for p, v in head.partitions.items()
                  if v["rows"] > 0}
    head_P = head.num_partitions
    report["duplicate_urls"] = []
    report["misrouted"] = []
    report["missing_history"] = []

    def check_one(rel: str) -> list[dict]:
        path = os.path.join(lake_dir, rel)
        if not os.path.exists(path):
            # vacuum legitimately reclaims history files while their
            # manifests remain; only a missing HEAD file is corruption
            kind = "missing" if rel in head_parts else "missing_history"
            return [{"kind": kind, "file": rel}]
        meta_rows = pq.read_metadata(path).num_rows
        want = refs[rel]
        if meta_rows != want["rows"]:
            return [{"kind": "row_mismatch", "file": rel,
                     "manifest_rows": want["rows"],
                     "parquet_rows": meta_rows}]
        if not deep:
            return []
        out = []
        t = pq.read_table(path)
        got = _checksum(t)
        if got != want["checksum"]:
            out.append({"kind": "checksum_mismatch", "file": rel,
                        "manifest_checksum": want["checksum"],
                        "file_checksum": got})
        if rel in head_parts:
            # structural invariants hold on HEAD files (history files
            # under an old partition map are exempt by design)
            import pyarrow.compute as pc

            from maestro_ray.ops.hashing import partition_ids

            urls = t.column("url")
            n_urls = len(urls)
            n_distinct = len(pc.unique(urls.combine_chunks()))
            if n_distinct != n_urls:
                out.append({"kind": "duplicate_urls", "file": rel,
                            "rows": n_urls, "distinct": n_distinct})
            if head_P:
                pid = partition_ids(urls, head_P)
                bad = int((pid != head_parts[rel]).sum())
                if bad:
                    out.append({"kind": "misrouted", "file": rel,
                                "rows": bad,
                                "expected_partition": head_parts[rel]})
        return out

    import ray

    rels = sorted(refs)
    if deep and ray.is_initialized() and len(rels) > 1:
        task = ray.remote(num_cpus=1)(check_one)
        findings = ray.get([task.remote(r) for r in rels])
    else:
        with ThreadPoolExecutor(max_workers=min(8, max(1, len(rels)))) \
                as ex:
            findings = list(ex.map(check_one, rels))
    for fs in findings:
        for f in fs:
            report[f.pop("kind")].append(f)

    live = {os.path.normpath(os.path.join(lake_dir, r)) for r in refs}
    for root, _dirs, files in os.walk(lake_dir):
        in_meta = any(d in root for d in
                      (MANIFEST_DIR, LINEAGE_DIR, VIEWS_DIR))
        in_staging = STAGING_DIR in root
        for name in files:
            path = os.path.normpath(os.path.join(root, name))
            rel = os.path.relpath(path, lake_dir)
            if name.endswith(".tmp"):
                report["tmp_files"].append(rel)
            elif in_staging and name.endswith(".parquet"):
                report["staging_leftovers"].append(rel)
            elif (not in_meta and name.endswith(".parquet")
                    and path not in live):
                report["stray_files"].append(rel)

    report["ok"] = not (report["missing"] or report["row_mismatch"]
                        or report["checksum_mismatch"]
                        or report["watermark_regression"]
                        or report["duplicate_urls"]
                        or report["misrouted"])
    return report


def freshness_report(lake_dir: str) -> "pd.DataFrame":
    """Per-partition staleness report from the manifest history alone
    (no data files opened — O(manifests) driver work): for every
    partition of the head manifest, the epoch that last REWROTE it
    (parsed from the immutable ``epoch-NNN.parquet`` file name), its
    rows/watermark, the recorded change-activity high watermark
    (``ts_max``, µs — absent on pre-r3 files → null), and
    ``epochs_stale`` = head epoch − last-rewrite epoch. The operational
    "which partitions has ingest not touched lately" view that
    monitoring a 100-TB lake needs without scanning it."""
    import re as _re

    import pandas as pd

    m = latest_manifest(lake_dir)
    if m is None:
        raise ValueError(f"no committed epochs in {lake_dir}")
    rows = []
    # match purge-rewritten names too (epoch-N.purge-<tag>.parquet)
    pat = _re.compile(r"epoch-(\d+)")
    for p, info in sorted(m.partitions.items()):
        g = pat.search(info["file"])
        last = int(g.group(1)) if g else None
        rows.append({
            "partition": p,
            "file": info["file"],
            "rows": int(info["rows"]),
            "last_epoch": last,
            "epochs_stale": (m.epoch - last) if last is not None
            else None,
            "watermark_offset": int(info["watermark"]),
            "ts_max_us": int(info["ts_max"])
            if info.get("ts_max") is not None else None,
        })
    out = pd.DataFrame(rows)
    return out.astype({"partition": "int64", "rows": "int64",
                       "watermark_offset": "int64"})
