"""Z-ORDER (Morton) multi-dimensional clustering + zone-map pruning —
the Delta/Iceberg ``OPTIMIZE ZORDER BY`` layout primitive, Ray-Data
native.

Why it matters at 100 TB: a single-column sort gives file-level
min/max pruning on ONE predicate column only; interleaving the bits of
k quantized columns into one sort key gives every file a small
hyper-rectangle in k-space, so a scan with predicates on ANY subset of
the clustered columns can skip most files from footer-level zone maps
alone. The expensive step is ONE range-partitioned sort (Ray's
push-based sort shuffle); pruning afterwards is metadata-only.

Pinned key semantics (SQL-twinnable, exact):

- Each clustered column is quantized as ``v % 2**bits`` (non-negative
  integers required — a loud guard, not a silent clamp: magnitude
  truncation is a LAYOUT choice the caller must own).
- Bit ``j`` of column ``i`` lands at position ``j * ncols + i`` of the
  key (column 0 owns the even bits in the 2-column case), so the key
  equals the classic parallel-prefix spread
  ``spread(c0) | spread(c1) << 1`` and stays below ``2**(bits*ncols)``
  — keep ``bits * ncols <= 63`` so the key is an exact int64 in SQL.

``cluster_write`` sorts by the key and writes ``files-NNNNN.parquet``
shards plus a ``_zones.json`` zone map (per-file min/max of every
clustered column). ``read_clustered`` prunes shards whose zone does
not intersect the requested box BEFORE the parquet read — the file
list itself shrinks, which is the whole point (FS-level proof in
tests/unit/test_zorder.py).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_MASKS_2D = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread2(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 to even bit positions."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    for sh, m in _MASKS_2D:
        v = (v | (v << np.uint64(sh))) & np.uint64(m)
    return v


def morton_code(cols: list[np.ndarray], bits: int = 21) -> np.ndarray:
    """Interleave ``bits`` low bits of each column (int64 ndarrays,
    non-negative) into one int64 Morton key. Column i's bit j lands at
    ``j * len(cols) + i``. Fully vectorized; the 2-column case uses the
    5-op parallel-prefix spread, k>2 a per-bit fold (``bits`` ops/col).
    """
    n = len(cols)
    if not 1 <= n <= 6:
        raise ValueError(f"morton_code: need 1..6 columns, got {n}")
    if bits * n > 63:
        raise ValueError(f"morton_code: bits*ncols = {bits * n} > 63 "
                         "overflows the exact int64 key")
    qs = []
    for i, c in enumerate(cols):
        c = np.asarray(c)
        if c.size and int(c.min()) < 0:
            raise ValueError(
                f"morton_code: column {i} has negative values — "
                "quantize/offset to non-negative first")
        qs.append(c.astype(np.uint64) & np.uint64((1 << bits) - 1))
    if n == 2 and bits <= 32:
        key = _spread2(qs[0]) | (_spread2(qs[1]) << np.uint64(1))
    else:
        key = np.zeros(qs[0].shape, np.uint64)
        for i, q in enumerate(qs):
            for j in range(bits):
                key |= ((q >> np.uint64(j)) & np.uint64(1)) \
                    << np.uint64(j * n + i)
    return key.view(np.int64)


def add_morton_column(ds: rd.Dataset, cols: list[str], bits: int = 21,
                      out_col: str = "zkey") -> rd.Dataset:
    """Append the Morton key of ``cols`` (integer, non-negative,
    null-free — loud guard) as ``out_col``."""

    def addk(t: pa.Table) -> pa.Table:
        arrs = []
        for c in cols:
            a = t.column(c)
            if a.null_count:
                raise ValueError(f"add_morton_column: nulls in {c!r}")
            arrs.append(pc.cast(a, pa.int64()).to_numpy(
                zero_copy_only=False))
        key = morton_code(arrs, bits)
        return t.append_column(out_col, pa.array(key, pa.int64()))

    return ds.map_batches(addk, batch_format="pyarrow")


def cluster_write(ds: rd.Dataset, cols: list[str], out_dir: str,
                  bits: int = 21, num_files: int | None = None) -> dict:
    """Z-order-cluster ``ds`` by ``cols`` into ``out_dir``: one Morton
    key pass, ONE push-based range sort, byte-sized shard files, and a
    ``_zones.json`` zone map (per-file min/max per clustered column).
    Returns the zone map. The key column is dropped from the files —
    it is a layout artifact, not data."""
    from maestro_ray.ops.partition import push_based_shuffle

    os.makedirs(out_dir, exist_ok=True)
    stale = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    if stale:
        # a stale shard not in the new zone map would be silently
        # ignored by reads but poison the zone scan below — refuse
        raise FileExistsError(
            f"cluster_write: {out_dir} already holds {len(stale)} "
            "parquet files; write into a fresh directory")
    keyed = add_morton_column(ds, cols, bits)
    with push_based_shuffle():
        srt = keyed.sort("zkey").drop_columns(["zkey"])
        if num_files is not None:
            srt = srt.repartition(num_files)
        srt.write_parquet(out_dir)
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out_dir)
                   if f.endswith(".parquet"))
    if not files:
        # empty input: Ray writes no files, but the layout must stay
        # readable — persist one typed empty shard so reads keep the
        # schema (the repo's empty-Dataset pitfall, r4 review finding)
        empty = pa.table({f.name: pa.array([], f.type)
                          for f in ds.schema().base_schema})
        path = os.path.join(out_dir, "files-empty.parquet")
        pq.write_table(empty, path)
        files = ["files-empty.parquet"]
    zones = []
    for f in files:
        path = os.path.join(out_dir, f)
        md = pq.ParquetFile(path).metadata
        name_to_idx = {md.schema.column(i).name: i
                       for i in range(md.num_columns)}
        zone: dict = {"file": f, "rows": md.num_rows}
        for c in cols:
            lo = hi = None
            ci = name_to_idx[c]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None  # stats disabled: fall back to data
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if md.num_rows and (lo is None or hi is None):
                # metadata-only failed (writer without stats): one read
                a = pq.read_table(path, columns=[c]).column(c)
                lo, hi = pc.min(a).as_py(), pc.max(a).as_py()
            zone[c] = ([int(lo), int(hi)] if md.num_rows
                       else [None, None])
        zones.append(zone)
    meta = {"cols": cols, "bits": bits, "zones": zones}
    tmp = os.path.join(out_dir, "_zones.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(out_dir, "_zones.json"))
    return meta


def read_clustered(out_dir: str, box: dict[str, tuple[int, int]],
                   columns: list[str] | None = None) -> rd.Dataset:
    """Zone-map-pruned read: open ONLY the shard files whose per-column
    [min, max] intersects every ``box`` bound (inclusive), then apply
    the exact residual filter per batch. ``box`` columns must be a
    subset of the clustered columns (others can't prune — pass them as
    a normal downstream filter)."""
    with open(os.path.join(out_dir, "_zones.json")) as fh:
        meta = json.load(fh)
    bad = set(box) - set(meta["cols"])
    if bad:
        raise ValueError(f"read_clustered: {sorted(bad)} not in the "
                         f"clustered columns {meta['cols']}")
    keep = []
    for z in meta["zones"]:
        if z["rows"] == 0:
            continue
        ok = all(z[c][0] <= hi and z[c][1] >= lo
                 for c, (lo, hi) in box.items())
        if ok:
            keep.append(os.path.join(out_dir, z["file"]))
    if not keep:
        # typed-empty read: preserve schema from any one shard
        first = os.path.join(out_dir, meta["zones"][0]["file"])
        ds = rd.read_parquet([first], columns=columns)
        return ds.map_batches(lambda t: t.slice(0, 0),
                              batch_format="pyarrow")

    def residual(t: pa.Table) -> pa.Table:
        m = None
        for c, (lo, hi) in box.items():
            a = t.column(c)
            cond = pc.and_(pc.greater_equal(a, pa.scalar(lo)),
                           pc.less_equal(a, pa.scalar(hi)))
            m = cond if m is None else pc.and_(m, cond)
        return t.filter(m)

    ds = rd.read_parquet(keep, columns=columns)
    return ds.map_batches(residual, batch_format="pyarrow")


def pruned_file_count(out_dir: str,
                      box: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files that survive pruning, total files) — the FS-level proof
    hook for tests and capacity planning."""
    with open(os.path.join(out_dir, "_zones.json")) as fh:
        meta = json.load(fh)
    total = len(meta["zones"])
    kept = 0
    for z in meta["zones"]:
        if z["rows"] and all(z[c][0] <= hi and z[c][1] >= lo
                             for c, (lo, hi) in box.items()):
            kept += 1
    return kept, total
