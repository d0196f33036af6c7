"""Grid-bucketed spatial join: all (left, right) pairs within a
radius on integer planar coordinates — the geo/radius-match shape
expressed scale-first.

The naive plan is a cross join (|L|·|R| pairs); this one snaps both
sides to a square grid of ``radius``-sized cells, replicates each
RIGHT row into its 3×3 cell neighborhood, and hash-joins on the cell
id — every true pair co-locates in the LEFT row's own cell exactly
once (the right row covers that cell via replication), so no dedup
pass is needed and the exchange is O(|L| + 9·|R|) rows instead of
O(|L|·|R|). Distance filtering is one vectorized integer expression
per joined batch; with integer coordinates and an integer radius the
result is exact (no float geometry).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

#: cell ids pack (cx, cy) into one int64: cx · 2^31 + cy. Coordinates
#: must satisfy |c| // radius < 2^30 — checked loudly per batch.
_CELL_SHIFT = np.int64(1) << np.int64(31)
_MAX_CELL = (1 << 30) - 1


def _cell_ids(x: np.ndarray, y: np.ndarray, radius: int,
              dx: int = 0, dy: int = 0) -> np.ndarray:
    cx = np.floor_divide(x, radius) + dx
    cy = np.floor_divide(y, radius) + dy
    if len(cx) and (np.abs(cx).max() > _MAX_CELL
                    or np.abs(cy).max() > _MAX_CELL):
        raise ValueError(
            "radius_join: coordinate / radius ratio exceeds the 2^30 "
            "cell-id range — rescale coordinates or enlarge radius")
    return cx * _CELL_SHIFT + cy


def radius_join(
    left: rd.Dataset,
    right: rd.Dataset,
    radius: int,
    left_cols: tuple[str, str, str] = ("l_id", "x", "y"),
    right_cols: tuple[str, str, str] = ("r_id", "x", "y"),
    num_buckets: int = 32,
) -> rd.Dataset:
    """All pairs with (lx−rx)² + (ly−ry)² ≤ radius² over integer
    coordinates. ``left_cols`` / ``right_cols`` name (id, x, y) on
    each side. Returns a lazy Dataset (left id, right id, dist2)
    — dist2 the exact squared integer distance. Null ids or
    coordinates are dropped (inner-join convention)."""
    from maestro_ray.ops.joins import hash_join

    if radius <= 0:
        raise ValueError(f"radius_join: radius must be positive "
                         f"({radius})")
    lid, lx, ly = left_cols
    rid, rx, ry = right_cols
    r2 = int(radius) * int(radius)

    def prep_left(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(lid)),
                             pc.is_valid(t.column(lx))),
                     pc.is_valid(t.column(ly)))
        t = t.filter(ok)
        x = t.column(lx).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(ly).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "__cell": pa.array(_cell_ids(x, y, radius), pa.int64()),
            lid: t.column(lid),
            "__lx": pa.array(x, pa.int64()),
            "__ly": pa.array(y, pa.int64()),
        })

    def prep_right(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.and_(pc.is_valid(t.column(rid)),
                             pc.is_valid(t.column(rx))),
                     pc.is_valid(t.column(ry)))
        t = t.filter(ok)
        x = t.column(rx).to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column(ry).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(rid)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                parts.append(pa.table({
                    "__cell": pa.array(
                        _cell_ids(x, y, radius, dx, dy), pa.int64()),
                    rid: ids,
                    "__rx": pa.array(x, pa.int64()),
                    "__ry": pa.array(y, pa.int64()),
                }))
        return pa.concat_tables(parts)

    lprep = left.map_batches(prep_left, batch_format="pyarrow")
    rprep = right.map_batches(prep_right, batch_format="pyarrow")
    joined = hash_join(lprep, rprep, "__cell",
                       num_buckets=num_buckets)

    def dist_filter(t: pa.Table) -> pa.Table:
        ax = t.column("__lx").to_numpy(zero_copy_only=False)
        ay = t.column("__ly").to_numpy(zero_copy_only=False)
        bx = t.column("__rx").to_numpy(zero_copy_only=False)
        by = t.column("__ry").to_numpy(zero_copy_only=False)
        d2 = (ax - bx) ** 2 + (ay - by) ** 2
        keep = d2 <= r2
        t = t.append_column("dist2", pa.array(d2, pa.int64()))
        return t.filter(pa.array(keep)).select([lid, rid, "dist2"])

    return joined.map_batches(dist_filter, batch_format="pyarrow")
