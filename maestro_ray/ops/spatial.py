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
    max_pairs: int = 200_000_000,
) -> rd.Dataset:
    """All pairs with (lx−rx)² + (ly−ry)² ≤ radius² over integer
    coordinates. ``left_cols`` / ``right_cols`` name (id, x, y) on
    each side. Returns a lazy Dataset (left id, right id, dist2)
    — dist2 the exact squared integer distance. Null ids or
    coordinates are dropped (inner-join convention).

    ``max_pairs`` guards the candidate volume Σ_cell |L_c|·|R_c⁹|
    (the join's EXACT pre-filter row count, computed from two tiny
    per-cell counts before any pair materializes): pair volume grows
    with the square of point density, and the r5 10×-density soak
    measured the unguarded join spilling >70 GB to disk before dying
    with OutOfDiskError — fail loudly up front instead. Remedies the
    error names: shrink the radius, dedup/pre-aggregate coincident
    points, or raise the guard on a box with the disk for it."""
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

    if max_pairs is not None:
        from maestro_ray.ops.aggregates import bucketed_agg
        from maestro_ray.ops.partition import compact_blocks

        # materialize BOTH prep sides once: the guard's counting pass
        # and the real join would otherwise each re-execute the
        # caller's upstream pipeline (review r5 — the
        # materialize-before-reuse lesson)
        lprep = compact_blocks(lprep.materialize())
        rprep = compact_blocks(rprep.materialize())

        def cells_only(t: pa.Table) -> pa.Table:
            return t.select(["__cell"])

        lc = bucketed_agg(
            lprep.map_batches(cells_only, batch_format="pyarrow"),
            "__cell", [(None, "count_all", "__nl")],
            n_buckets=num_buckets)
        rc = bucketed_agg(
            rprep.map_batches(cells_only, batch_format="pyarrow"),
            "__cell", [(None, "count_all", "__nr")],
            n_buckets=num_buckets)

        def prod_partial(t: pa.Table) -> pa.Table:
            nl = t.column("__nl").to_numpy(zero_copy_only=False)
            nr = t.column("__nr").to_numpy(zero_copy_only=False)
            return pa.table({"s": pa.array(
                [int(np.sum(nl.astype(np.int64) * nr))], pa.int64())})

        parts = hash_join(lc, rc, "__cell", num_buckets=num_buckets) \
            .map_batches(prod_partial, batch_format="pyarrow") \
            .to_pandas()
        est = int(parts["s"].sum()) if len(parts) else 0
        if est > max_pairs:
            raise ValueError(
                f"radius_join: candidate pair volume {est:,} > "
                f"max_pairs={max_pairs:,} — pair count grows with "
                "density² (the r5 10×-density soak spilled >70 GB "
                "and died OutOfDisk unguarded); shrink radius, "
                "pre-aggregate coincident points, or raise max_pairs "
                "explicitly")

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


def dbscan(
    points: rd.Dataset,
    eps: int,
    min_pts: int,
    cols: tuple[str, str, str] = ("id", "x", "y"),
    num_buckets: int = 32,
    max_pairs: int = 200_000_000,
) -> rd.Dataset:
    """Distributed DBSCAN over integer 2-D points — deterministic
    variant: cluster label = MIN core id in the density-connected
    component, border points attach to the MIN cluster among their
    core neighbors (standard DBSCAN leaves that tie arbitrary; pinning
    it makes the result engine-independent and SQL-twinnable).

    Returns (id, role, cluster): role ∈ core/border/noise, cluster
    null for noise. Definitions are the textbook ones with the
    neighbor count INCLUDING the point itself (``|N_eps(p)| >=
    min_pts``).

    Plan — every stage a bounded exchange, nothing on the driver:
    ``radius_join`` (grid cells + halo, O(|P| + 9|P|) exchange, never
    the cross join) → one bucketed neighbor count → core-core edges by
    two inner hash joins against the core id table →
    ``connected_components`` (contraction + guarded finish) → border
    attachment via one join + bucketed min → two left joins to
    classify. The points Dataset is materialized + compacted once and
    reused by all legs (the pagerank lesson). Ids must be integer
    (connected_components' contract)."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.graph import connected_components
    from maestro_ray.ops.joins import hash_join
    from maestro_ray.ops.partition import compact_blocks

    if min_pts < 1:
        raise ValueError(f"dbscan: min_pts must be >= 1 ({min_pts})")
    pid, px, py = cols
    pts = compact_blocks(points.materialize())
    left = pts.map_batches(
        lambda t, _m={pid: "__pa", px: "x", py: "y"}: t.select(
            [pid, px, py]).rename_columns(["__pa", "x", "y"]),
        batch_format="pyarrow")
    right = pts.map_batches(
        lambda t: t.select([pid, px, py]).rename_columns(
            ["__pb", "x", "y"]),
        batch_format="pyarrow")
    pairs = compact_blocks(radius_join(
        left, right, eps, left_cols=("__pa", "x", "y"),
        right_cols=("__pb", "x", "y"),
        num_buckets=num_buckets, max_pairs=max_pairs).materialize())

    deg = bucketed_agg(pairs, "__pa", [(None, "count_all", "__n")],
                       n_buckets=num_buckets)
    core = compact_blocks(deg.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("__n"), min_pts)).select(["__pa"]),
        batch_format="pyarrow").materialize())
    if core.count() == 0:
        # no density anywhere: all points are noise (typed directly —
        # the empty-Dataset schema-loss class)
        id_type = points.schema().base_schema.field(pid).type

        def all_noise(t: pa.Table) -> pa.Table:
            return pa.table({
                pid: t.column(pid),
                "role": pa.array(["noise"] * t.num_rows, pa.string()),
                "cluster": pa.nulls(t.num_rows, pa.int64()),
            })

        return pts.map_batches(all_noise, batch_format="pyarrow")

    # core-core edges (self-pairs drop inside connected_components)
    ce = hash_join(
        hash_join(pairs, core, keys="__pa", num_buckets=num_buckets),
        core.map_batches(lambda t: t.rename_columns(["__pb"]),
                         batch_format="pyarrow"),
        keys="__pb", num_buckets=num_buckets)
    comp = connected_components(ce, src="__pa", dst="__pb")
    # isolated cores (only their self-pair) are absent from comp —
    # identity labels via one left join
    lab = hash_join(
        core, comp.map_batches(
            lambda t: t.rename_columns(["__pa", "__lbl"]),
            batch_format="pyarrow"),
        keys="__pa", num_buckets=num_buckets, join_type="left outer")

    def fill_ident(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("__pa"), pa.int64())
        lbl = pc.if_else(pc.is_valid(t.column("__lbl")),
                         t.column("__lbl"), a)
        return pa.table({"__pa": a, "cluster": lbl})

    lab = compact_blocks(
        lab.map_batches(fill_ident, batch_format="pyarrow")
        .materialize())

    # min core-neighbor cluster per point (cores included; used only
    # for non-core rows at classification)
    near_core = hash_join(
        pairs, lab.map_batches(
            lambda t: t.rename_columns(["__pb", "__bc"]),
            batch_format="pyarrow"),
        keys="__pb", num_buckets=num_buckets)
    mcl = bucketed_agg(near_core, "__pa", [("__bc", "min", "__mc")],
                       n_buckets=num_buckets)

    base = pts.map_batches(
        lambda t: t.select([pid]), batch_format="pyarrow")
    j1 = hash_join(
        base.map_batches(lambda t: t.rename_columns(["__pa"]),
                         batch_format="pyarrow"),
        lab.map_batches(lambda t: t.rename_columns(["__pa", "__cc"]),
                        batch_format="pyarrow"),
        keys="__pa", num_buckets=num_buckets, join_type="left outer")
    j2 = hash_join(j1, mcl, keys="__pa", num_buckets=num_buckets,
                   join_type="left outer")

    def classify(t: pa.Table) -> pa.Table:
        is_core = pc.is_valid(t.column("__cc"))
        is_border = pc.and_(pc.invert(is_core),
                            pc.is_valid(t.column("__mc")))
        role = pc.if_else(is_core, pa.scalar("core"),
                          pc.if_else(is_border, pa.scalar("border"),
                                     pa.scalar("noise")))
        cluster = pc.if_else(
            is_core, t.column("__cc"),
            pc.if_else(is_border, t.column("__mc"),
                       pa.nulls(t.num_rows, pa.int64())))
        return pa.table({pid: t.column("__pa"), "role": role,
                         "cluster": pc.cast(cluster, pa.int64())})

    return j2.map_batches(classify, batch_format="pyarrow")
