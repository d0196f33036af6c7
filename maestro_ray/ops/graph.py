"""Distributed connected components over an edge Dataset.

Algorithm: iterative EDGE CONTRACTION with a guarded local finish —
the shape that is both scale-honest and cheap on small graphs:

1. *Init*: every node's label = min(itself, its neighbors) — one
   groupby-min shuffle; the edge set is relabeled into LABEL space
   (self-edges dropped, duplicates folded).
2. *Contract rounds* (only while the contracted edge set is still
   large): one min-label round over the CONTRACTED graph produces a
   label→label mapping; node labels and contracted edges are relabeled
   through it. Every round composes a star contraction with the
   relabel, so the surviving edge count and the component diameter
   shrink geometrically — O(log diameter) rounds, and each round's
   shuffles run over the (shrinking) contracted edge set, never the
   original graph again.
3. *Local finish*: once the contracted edge set fits
   ``local_edge_threshold`` (default 2M — the repo's standard
   driver-materialization guard, same as dedup's size-map bound), a
   driver union-find resolves the remainder exactly and the final
   label→root mapping is broadcast (``ray.put``) into one vectorized
   lookup pass over the node labels. Small graphs therefore pay ZERO
   extra distributed rounds; 100-TB graphs contract distributed until
   the guard admits the tail.

Labels only ever decrease, so contraction cannot oscillate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from maestro_ray.ops.partition import checkpoint_state as _ckpt
from maestro_ray.ops.partition import compact_blocks as _compact


def _driver_union_find(a: np.ndarray, b: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Union-find over int64 edge arrays on the driver (bounded by the
    caller's guard). Returns (sorted node keys that were UNIONED AWAY
    from their own root, their roots) — identity for absent keys.
    Shared by the raw-edge fast path and the contracted local finish
    (review r3: two copies drifted)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    ks = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    vs = np.fromiter((find(int(k)) for k in ks), dtype=np.int64,
                     count=len(ks))
    order = np.argsort(ks)
    return ks[order], vs[order]


def _lookup_sorted(keys: np.ndarray, vals: np.ndarray,
                   probe: np.ndarray) -> np.ndarray:
    """Vectorized dict-free map: probe → vals[keys == probe], identity
    on misses. ``keys`` must be sorted."""
    pos = np.searchsorted(keys, probe)
    pos = np.clip(pos, 0, len(keys) - 1) if len(keys) else pos
    out = probe.copy()
    if len(keys):
        hit = keys[pos] == probe
        out[hit] = vals[pos[hit]]
    return out


def connected_components(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 50,
    local_edge_threshold: int = 2_000_000,
) -> rd.Dataset:
    """(node, label) for every node that appears in any edge, where
    ``label`` is the MINIMUM node id of its connected component.

    Endpoints must be integer-typed (label arithmetic is vectorized
    int64; hash node ids first if they are strings — ``ops/hashing``)
    and non-null endpoints only (null endpoints are dropped: an edge to
    nothing connects nothing). Nodes absent from the edge set are their
    own components by definition — callers fill the identity side
    themselves, keeping this result proportional to the CONNECTED
    subgraph.

    Raises ``RuntimeError`` after ``max_rounds`` contraction rounds
    (geometric shrink makes 50 astronomically safe)."""
    from maestro_ray.ops.joins import hash_join

    for c in (src, dst):
        if not pa.types.is_integer(edges.schema().base_schema
                                   .field(c).type):
            raise ValueError(
                "connected_components: integer node ids required — "
                "hash string ids first (ops/hashing.hash_array; its "
                "uint64 output is accepted directly)")

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst]).rename_columns(["a", "b"])
        t = t.filter(pc.and_(pc.is_valid(t.column("a")),
                             pc.is_valid(t.column("b"))))
        # normalize to int64: uint64 (hash_array output) by BIT VIEW —
        # a plain cast wraps silently on numpy and raises on Arrow for
        # values >= 2^63 (review r3, execution-confirmed). The label is
        # then the minimum of the SIGNED view: a deterministic
        # component representative, which is the actual contract.
        cols = {}
        for c in ("a", "b"):
            col = t.column(c).combine_chunks()
            if pa.types.is_unsigned_integer(col.type) and \
                    col.type.bit_width == 64:
                v = col.to_numpy(zero_copy_only=False).view(np.int64)
                cols[c] = pa.array(v, pa.int64())
            else:
                cols[c] = col.cast(pa.int64())
        return pa.table(cols)

    e = edges.map_batches(clean, batch_format="pyarrow").materialize()

    n_raw = e.count()
    if n_raw == 0:
        # all edges null/empty: the connected subgraph is empty (an
        # empty Ray result would lose its schema — build it directly)
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))
    if n_raw <= local_edge_threshold:
        # raw edge set already fits the driver guard: skip the
        # distributed init/relabel joins entirely — union-find the raw
        # pairs (output is O(nodes) <= 2x the guard, bounded)
        pairs = e.to_pandas()
        a = pairs["a"].to_numpy()
        b = pairs["b"].to_numpy()
        ks, vs = _driver_union_find(a, b)
        nodes = np.unique(np.concatenate([a, b]))
        lab = _lookup_sorted(ks, vs, nodes)
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array(lab, pa.int64()),
        }))

    def init_msgs(t: pa.Table) -> pa.Table:
        m = pc.min_element_wise(t.column("a"), t.column("b"))
        return pa.table({
            "node": pa.concat_arrays([t.column("a").combine_chunks(),
                                      t.column("b").combine_chunks()]),
            "label": pa.concat_arrays([m.combine_chunks()] * 2),
        })

    labels = (
        e.map_batches(init_msgs, batch_format="pyarrow")
        .groupby("node").min("label")
        .map_batches(lambda t: t.rename_columns(["node", "label"]),
                     batch_format="pyarrow")
        .materialize()
    )

    def relabel_edges(ed: rd.Dataset, lbl: rd.Dataset) -> rd.Dataset:
        la = lbl.map_batches(lambda t: t.rename_columns(["a", "la"]),
                             batch_format="pyarrow")
        lb = lbl.map_batches(lambda t: t.rename_columns(["b", "lb"]),
                             batch_format="pyarrow")
        j = hash_join(hash_join(ed, la, keys="a"), lb, keys="b")

        def contract(t: pa.Table) -> pa.Table:
            x = t.column("la")
            y = t.column("lb")
            keep = pc.not_equal(x, y)
            return pa.table({"a": pc.min_element_wise(x, y),
                             "b": pc.max_element_wise(x, y)}) \
                .filter(keep)

        # _ckpt: lbl probes both join sides — the plan-history
        # diamond (ops/partition.cut_lineage)
        return _ckpt(
            j.map_batches(contract, batch_format="pyarrow")
            .groupby(["a", "b"]).count()
            .map_batches(lambda t: t.select(["a", "b"]),
                         batch_format="pyarrow"))

    cedges = relabel_edges(e, labels)

    for _ in range(max_rounds):
        n_e = cedges.count()
        if n_e == 0:
            return labels
        if n_e <= local_edge_threshold:
            pairs = cedges.to_pandas()
            ks, vs = _driver_union_find(pairs["a"].to_numpy(),
                                        pairs["b"].to_numpy())
            mref = ray.put((ks, vs))

            def finish(t: pa.Table) -> pa.Table:
                ks_s, vs_s = ray.get(mref)
                lab = t.column("label").to_numpy(zero_copy_only=False)
                return pa.table({
                    "node": t.column("node"),
                    "label": pa.array(_lookup_sorted(ks_s, vs_s, lab),
                                      pa.int64()),
                })

            return labels.map_batches(finish, batch_format="pyarrow")

        # distributed contraction round over the (shrinking) edge set
        m = (
            cedges.map_batches(init_msgs, batch_format="pyarrow")
            .groupby("node").min("label")
            .map_batches(lambda t: t.rename_columns(["label", "l2"]),
                         batch_format="pyarrow")
            .materialize()
        )
        # close the pointer forest by doubling: m <- m∘m until no row's
        # pointer moves. Convergence is an exact changed-row COUNT (a
        # value sum over labels from uint64 bit-views could wrap int64
        # and alias two distinct mappings). Each composition is ONE
        # join over the mapping table and doubles resolved path length,
        # so chains collapse in log(diameter) compositions instead of
        # diameter contraction rounds.
        def _changed_rows(mm: rd.Dataset) -> int:
            s = mm.map_batches(
                lambda t: pa.table({"c": pa.array(
                    [pc.sum(pc.cast(t.column("__chg"), pa.int64())).as_py()
                     or 0], pa.int64())}),
                batch_format="pyarrow").to_pandas()
            return int(s["c"].sum())

        for _ in range(max_rounds):
            hop = m.map_batches(
                lambda t: t.rename_columns(["l2", "l3"]),
                batch_format="pyarrow")
            # _ckpt, not _compact: m feeds BOTH join sides (hop +
            # probe) — the diamond that doubles retained plan history
            # per round (see ops/partition.cut_lineage)
            stepped = _ckpt(hash_join(m, hop, keys="l2",
                                      join_type="left outer").map_batches(
                lambda t: pa.table({
                    "label": t.column("label"),
                    "l2": pc.if_else(pc.is_valid(t.column("l3")),
                                     t.column("l3"), t.column("l2")),
                    "__chg": pc.fill_null(
                        pc.not_equal(t.column("l3"), t.column("l2")),
                        False),
                }), batch_format="pyarrow"))
            changed = _changed_rows(stepped)
            m = stepped.map_batches(
                lambda t: t.drop_columns(["__chg"]),
                batch_format="pyarrow")
            if changed == 0:
                break
        relabeled = hash_join(labels, m, keys="label",
                              join_type="left outer")

        def apply_m(t: pa.Table) -> pa.Table:
            new = pc.if_else(pc.is_valid(t.column("l2")),
                             t.column("l2"), t.column("label"))
            return pa.table({"node": t.column("node"), "label": new})

        labels = _ckpt(relabeled.map_batches(
            apply_m, batch_format="pyarrow"))
        cedges = relabel_edges(
            cedges,
            m.map_batches(lambda t: t.rename_columns(["node", "label"]),
                          batch_format="pyarrow"))
    raise RuntimeError(
        f"connected_components: no convergence in {max_rounds} "
        "contraction rounds — degenerate input? raise max_rounds")


def pagerank(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    damping: float = 0.85,
    iterations: int = 20,
    max_broadcast_nodes: int = 5_000_000,
    state: str = "auto",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """PageRank over a directed edge list: the standard power
    iteration r' = (1−d)/N + d·(Σ_{u→v} r_u/deg_u + dangling/N), fixed
    ``iterations`` rounds (deterministic stopping — the repo rule for
    float-iterative ops). Returns (node, rank) for every node that
    appears in any edge; ranks sum to 1.

    Two plans, dispatched by ``state`` (default "auto" = by node
    count vs ``max_broadcast_nodes``):

    - *broadcast* (small state): the EDGES stream every round (one
      map_batches; contributions pre-reduced per batch to sparse
      (dst, partial) via bincount → one small driver fold); the
      O(nodes) rank/degree state is broadcast once per round via
      ``ray.put`` (sorted arrays, ~16 B/node — 5M nodes ≈ 80 MB).
      Zero per-round shuffles; dangling mass is one array reduction.
    - *partitioned* (web-graph scale, ``_pagerank_partitioned``):
      rank/degree state is a hash-bucketed Dataset joined to the edge
      set per round — no O(nodes) driver state at any point; the
      100-TB path.

    Per-node float sums fold per batch then per groupby — the last ulp
    depends on partitioning (inherent to distributed float addition);
    tests compare both paths against a numpy reference at 1e-9."""
    import ray

    if not 0 < damping < 1:
        raise ValueError(f"damping={damping}")
    if iterations < 1:
        raise ValueError(f"iterations={iterations}")

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst]).rename_columns(["a", "b"])
        t = t.filter(pc.and_(pc.is_valid(t.column("a")),
                             pc.is_valid(t.column("b"))))
        cols = [pc.cast(t.column(c), pa.int64()) for c in ("a", "b")]
        return pa.table({"a": cols[0], "b": cols[1]})

    # materialize once: the cleaned edge set is re-scanned EVERY round
    # (a lazy plan would re-run the caller's whole upstream pipeline —
    # e.g. a groupby — per iteration), and compact to bytes-sized
    # blocks so 20 scans don't pay tiny-block overhead 20 times
    from maestro_ray.ops.partition import compact_blocks

    e = compact_blocks(
        edges.map_batches(clean, batch_format="pyarrow").materialize())
    n_edges = e.count()
    if n_edges == 0:
        # all edges empty/null: an empty Ray collection loses its
        # schema in to_pandas (repo-documented class) — return directly
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="float64")})
    mode, nodes_ds = _resolve_state_mode(
        state, "pagerank", n_edges, max_broadcast_nodes, e, num_buckets)
    if mode == "partitioned":
        if nodes_ds is None:
            nodes_ds = _distinct_nodes(e, ["a", "b"], num_buckets)
        out = _pagerank_partitioned(
            e, nodes_ds, damping, iterations, num_buckets).to_pandas()
        out["node"] = out["node"].astype("int64")
        return out.sort_values("node").reset_index(drop=True)

    # node universe + out-degree: two tiny grouped folds, O(nodes)
    def deg_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["a"]).aggregate([([], "count_all")])
        return g.rename_columns(["node", "deg"])

    deg = e.map_batches(deg_partial, batch_format="pyarrow") \
        .to_pandas().groupby("node")["deg"].sum()

    def dst_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("b").combine_chunks())
        return pa.table({"node": u})

    dsts = e.map_batches(dst_partial, batch_format="pyarrow") \
        .to_pandas()["node"].unique()
    nodes = np.union1d(deg.index.to_numpy(), dsts)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "rank": pd.Series(dtype="float64")})
    degs = np.zeros(n, dtype=np.float64)
    degs[np.searchsorted(nodes, deg.index.to_numpy())] = \
        deg.to_numpy(dtype=np.float64)
    dangling = degs == 0.0
    ranks = np.full(n, 1.0 / n)
    nodes_ref = ray.put(nodes)

    for _ in range(iterations):
        state_ref = ray.put(ranks / np.maximum(degs, 1.0))

        def contrib(t: pa.Table) -> pa.Table:
            ns = ray.get(nodes_ref)
            share = ray.get(state_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            vals = share[np.searchsorted(ns, a)]
            pos = np.searchsorted(ns, b)
            acc = np.bincount(pos, weights=vals, minlength=len(ns))
            nz = np.flatnonzero(acc)
            return pa.table({"dst": pa.array(ns[nz], pa.int64()),
                             "c": pa.array(acc[nz], pa.float64())})

        parts = e.map_batches(contrib, batch_format="pyarrow") \
            .to_pandas().groupby("dst", sort=True)["c"].sum()
        inflow = np.zeros(n, dtype=np.float64)
        inflow[np.searchsorted(nodes, parts.index.to_numpy())] = \
            parts.to_numpy()
        d_mass = float(ranks[dangling].sum())
        ranks = (1.0 - damping) / n + damping * (inflow + d_mass / n)

    return pd.DataFrame({"node": nodes.astype(np.int64), "rank": ranks})


def bfs_levels(
    edges: rd.Dataset,
    seeds,
    max_depth: int = 10,
    directed: bool = True,
    src: str = "a",
    dst: str = "b",
    max_broadcast_nodes: int = 5_000_000,
    state: str = "auto",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Multi-source BFS: exact minimum hop distance (<= ``max_depth``)
    from the seed set to every reachable node that appears in the edge
    list. Seeds not present in any edge are ignored.

    Two plans, dispatched by ``state`` — the ``pagerank`` scale
    shape: *broadcast* — the EDGE list streams once per level (one
    column-pruned map_batches whose per-batch output is only the
    frontier's unique out-neighbors), while the O(nodes)
    visited/distance state lives on the driver (~16 B/node); each
    level broadcasts the (shrinking) frontier via ``ray.put``.
    *partitioned* (``_bfs_partitioned``, web-graph scale) — the
    visited table is a hash-bucketed Dataset, each level one
    frontier⋈edges join + one bucketed distinct + one state-update
    join; no O(nodes) driver state. Levels run sequentially by
    definition (BFS is a depth-synchronous fixpoint). Distances are
    exact integers — bit-reproducible across partitionings AND across
    the two plans. Returns (node, dist), seeds at dist 0, sorted by
    node."""
    import ray

    if max_depth < 0:
        raise ValueError(f"max_depth={max_depth}")

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst]).rename_columns(["a", "b"])
        t = t.filter(pc.and_(pc.is_valid(t.column("a")),
                             pc.is_valid(t.column("b"))))
        a = pc.cast(t.column("a"), pa.int64())
        b = pc.cast(t.column("b"), pa.int64())
        if directed:
            return pa.table({"a": a, "b": b})
        # symmetrize once so every level is a single forward scan
        ac, bc = a.combine_chunks(), b.combine_chunks()
        return pa.table({"a": pa.concat_arrays([ac, bc]),
                         "b": pa.concat_arrays([bc, ac])})

    e = _compact(edges.map_batches(clean, batch_format="pyarrow")
                 .materialize())
    n_edges = e.count()
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    mode, nodes_ds = _resolve_state_mode(
        state, "bfs_levels", n_edges, max_broadcast_nodes, e,
        num_buckets)
    if mode == "partitioned":
        return _bfs_partitioned(e, seed_arr, max_depth, num_buckets,
                                nodes_ds=nodes_ds)

    def node_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([t.column("a").combine_chunks(),
                                        t.column("b").combine_chunks()]))
        return pa.table({"node": u})

    nodes = np.unique(e.map_batches(node_partial, batch_format="pyarrow")
                      .to_pandas()["node"].to_numpy())
    dist = np.full(len(nodes), -1, dtype=np.int64)
    pos = np.searchsorted(nodes, seed_arr)
    in_univ = (pos < len(nodes))
    in_univ[in_univ] &= nodes[pos[in_univ]] == seed_arr[in_univ]
    dist[pos[in_univ]] = 0
    frontier = nodes[dist == 0]

    for d in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        f_ref = ray.put(frontier)

        def neighbors(t: pa.Table) -> pa.Table:
            f = ray.get(f_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            p = np.searchsorted(f, a)
            hit = (p < len(f))
            hit[hit] = f[p[hit]] == a[hit]
            if not hit.any():
                return pa.table({"n": pa.array([], pa.int64())})
            b = t.column("b").to_numpy(zero_copy_only=False)[hit]
            return pa.table({"n": pa.array(np.unique(b), pa.int64())})

        reached = e.map_batches(neighbors, batch_format="pyarrow") \
            .to_pandas()["n"].to_numpy()
        if len(reached) == 0:
            break
        idx = np.searchsorted(nodes, np.unique(reached))
        new_mask = dist[idx] == -1
        dist[idx[new_mask]] = d
        frontier = nodes[idx[new_mask]]

    found = dist >= 0
    return pd.DataFrame({"node": nodes[found].astype(np.int64),
                         "dist": dist[found]}) \
        .sort_values("node").reset_index(drop=True)


def triangle_count(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Exact triangle count over an undirected edge Dataset — the
    standard vertex-ordered wedge plan, fully distributed:

    1. *Canonicalize*: per batch, (u, v) = (min, max) of the endpoint
       pair, self-loops and null endpoints dropped; one
       ``bucketed_distinct`` exchange dedups the edge set (multi-edges
       must count once).
    2. *Wedges*: E ⋈ E on the shared MIDDLE vertex (u1 < v1 = u2 < v2
       by construction, so every wedge (a, b, c) has a < b < c and each
       triangle is generated exactly once).
    3. *Close*: one bucketed ``hash_join`` of the wedge set against E
       on (a, c); the inner-join row count IS the triangle count (edges
       are distinct, so no multiplicity correction is needed).

    The edge set is materialized + block-compacted ONCE and reused by
    both joins (it feeds three plan legs — re-deriving it would re-run
    the caller's upstream pipeline per leg, the pagerank lesson). Skew
    note: wedge volume is Σ deg(b)² over middle vertices — a hot vertex
    inflates one join bucket; cap or pre-split hot keys upstream
    (``ops.partition.hot_key_detect``) if the degree distribution is
    power-law."""
    from maestro_ray.ops.joins import hash_join

    e = _canonical_edges(edges, src, dst, num_buckets)
    wedges = hash_join(
        e.map_batches(_rename_cols({"u": "a", "v": "b"}),
                      batch_format="pyarrow"),
        e.map_batches(_rename_cols({"u": "b", "v": "c"}),
                      batch_format="pyarrow"),
        keys="b", num_buckets=num_buckets)
    closing = e.map_batches(_rename_cols({"u": "a", "v": "c"}),
                            batch_format="pyarrow")
    n = hash_join(
        wedges, closing, keys=["a", "c"], num_buckets=num_buckets
    ).count()
    return pd.DataFrame({"triangles": pd.Series([n], dtype="int64")})


def _rename_cols(m: dict):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([m.get(c, c) for c in t.column_names])

    return fn


def _canonical_edges(edges: rd.Dataset, src: str, dst: str,
                     num_buckets: int,
                     cast_int64: bool = True) -> rd.Dataset:
    """Distinct canonical undirected edge set (u < v): self-loops and
    null endpoints dropped per batch, ONE bucketed-distinct exchange,
    then materialized + block-compacted — shared by every plan that
    reuses the edge set across joins (triangle_count,
    common_neighbors); re-deriving it per plan leg would re-run the
    caller's upstream pipeline (the pagerank lesson).
    ``cast_int64=False`` keeps the endpoint type as-is (string node
    ids order lexicographically — min/max_element_wise support them)."""
    from maestro_ray.ops.aggregates import bucketed_distinct

    def canon(t: pa.Table) -> pa.Table:
        a, b = t.column(src), t.column(dst)
        if cast_int64:
            a, b = pc.cast(a, pa.int64()), pc.cast(b, pa.int64())
        ok = pc.and_kleene(
            pc.and_kleene(pc.is_valid(a), pc.is_valid(b)),
            pc.not_equal(a, b),
        )
        pair = pa.table(
            {
                "u": pc.min_element_wise(a, b),
                "v": pc.max_element_wise(a, b),
            }
        )
        return pair.filter(pc.fill_null(ok, False))

    e = bucketed_distinct(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["u", "v"],
        n_buckets=num_buckets,
    ).materialize()
    return _compact(e)


def common_neighbors(
    edges: rd.Dataset,
    k: int,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
    score: str = "count",
) -> pd.DataFrame:
    """Link prediction by common-neighbor count: for every NON-adjacent
    vertex pair reachable by a 2-path, the number of shared neighbors;
    top ``k`` by (count desc, a, c) — a deterministic total order, so
    the LIMIT boundary is engine-independent.

    Plan: canonical distinct edge set (shared ``_canonical_edges``) →
    BIDIRECTIONAL adjacency (each undirected edge as two directed rows
    — unlike the triangle plan, a wedge's MIDDLE vertex may rank above
    its endpoints, so the a < b < c trick would undercount) → wedge
    join on the middle with ``a < c`` keeping each unordered pair once
    → one ``bucketed_agg`` pair count → existing edges removed with a
    left-outer join on (a, c) + null-marker filter → global top-k via
    the combiner plan. The pair universe stays distributed until the
    LIMIT."""
    from maestro_ray.ops.aggregates import bucketed_agg, topk
    from maestro_ray.ops.joins import hash_join

    e = _canonical_edges(edges, src, dst, num_buckets)
    wedges = hash_join(
        e.map_batches(_bidir("a"), batch_format="pyarrow"),
        e.map_batches(_bidir("c"), batch_format="pyarrow"),
        keys="m", num_buckets=num_buckets)

    def ordered_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("a"), t.column("c")))
        return t.select(["a", "c"])

    counts = bucketed_agg(
        wedges.map_batches(ordered_pairs, batch_format="pyarrow"),
        ["a", "c"], [(None, "count_all", "n_common")],
        n_buckets=num_buckets)
    marked = e.map_batches(
        lambda t: _rename_cols({"u": "a", "v": "c"})(t).append_column(
            "__e", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow")
    joined = hash_join(counts, marked, keys=["a", "c"],
                       num_buckets=num_buckets, join_type="left outer")

    def non_edges(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("__e")))
        return t.select(["a", "c", "n_common"])

    cand = joined.map_batches(non_edges, batch_format="pyarrow")
    if score == "count":
        out = topk(cand, "n_common", k, descending=True,
                   tie_break=["a", "c"])
        out["n_common"] = out["n_common"].astype("int64")
        return out[["a", "c", "n_common"]].reset_index(drop=True)
    if score != "jaccard":
        raise ValueError(f"score={score!r}: count|jaccard")
    # Jaccard link prediction: |N(a)∩N(c)| / |N(a)∪N(c)| =
    # n_common / (deg_a + deg_c - n_common). Degrees come from ONE
    # bucketed count over the bidirectional adjacency; both joins stay
    # bucketed (the candidate-pair universe never lands on the driver).
    # All inputs are exact ints and the score is a single IEEE
    # division, so the value — and the top-k order — is engine-exact.
    deg = bucketed_agg(e.map_batches(_bidir("x"), batch_format="pyarrow"),
                       ["m"], [(None, "count_all", "deg")],
                       n_buckets=num_buckets)
    j1 = hash_join(cand,
                   deg.map_batches(_rename_cols({"m": "a", "deg": "deg_a"}),
                                   batch_format="pyarrow"),
                   keys="a", num_buckets=num_buckets)
    j2 = hash_join(j1,
                   deg.map_batches(_rename_cols({"m": "c", "deg": "deg_c"}),
                                   batch_format="pyarrow"),
                   keys="c", num_buckets=num_buckets)

    def with_jaccard(t: pa.Table) -> pa.Table:
        n = t.column("n_common").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        dc = t.column("deg_c").to_numpy(zero_copy_only=False)
        jac = n.astype(np.float64) / (da + dc - n)
        return t.append_column("jaccard", pa.array(jac, pa.float64()))

    scored = j2.map_batches(with_jaccard, batch_format="pyarrow")
    out = topk(scored, "jaccard", k, descending=True,
               tie_break=["a", "c"])
    out["n_common"] = out["n_common"].astype("int64")
    return out[["a", "c", "n_common", "jaccard"]].reset_index(drop=True)


def _bidir(out_name: str):
    """(u,v) canonical edges → both directed rows (m=middle, out=other)."""
    def fn(t: pa.Table) -> pa.Table:
        m = pa.concat_arrays([t.column("u").combine_chunks(),
                              t.column("v").combine_chunks()])
        x = pa.concat_arrays([t.column("v").combine_chunks(),
                              t.column("u").combine_chunks()])
        return pa.table({"m": m, out_name: x})

    return fn


def kcore(
    edges: rd.Dataset,
    k: int,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
    max_rounds: int = 200,
) -> pd.DataFrame:
    """Nodes of the k-core — the maximal subgraph where every node has
    degree ≥ k — by distributed iterative peeling: each round computes
    degrees over the surviving edge set (one ``bucketed_agg``), keeps
    nodes with degree ≥ k, and retains only edges whose BOTH endpoints
    survive (two bucketed inner ``hash_join``s against the O(survivors)
    node table — the node set never lands on the driver). Converged
    when the edge count stops shrinking (peeling is monotone, so equal
    count ⟺ no node below k remains). Each round's edge set is
    materialized + block-compacted — the iterative-join block-doubling
    rule (ops/partition.compact_blocks). Rounds are bounded by the
    peeling depth, worst case O(nodes) on a path — ``max_rounds``
    fails loudly rather than looping silently. Returns the surviving
    nodes with their within-core degree, sorted by node."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    e = _canonical_edges(edges, src, dst, num_buckets)
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = bucketed_agg(
            e.map_batches(_bidir("x"), batch_format="pyarrow"),
            "m", [(None, "count_all", "__deg")],
            n_buckets=num_buckets)
        keep = deg.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("__deg"),
                                 pa.scalar(k, pa.int64()))).select(["m"]),
            batch_format="pyarrow").materialize()
        if keep.count() == 0:
            # everything peeled — an empty materialized Dataset loses
            # its schema and would crash the joins (repo-documented)
            n_edges = 0
            break
        e2 = hash_join(
            hash_join(e, keep.map_batches(_rename_cols({"m": "u"}),
                                          batch_format="pyarrow"),
                      keys="u", num_buckets=num_buckets),
            keep.map_batches(_rename_cols({"m": "v"}),
                             batch_format="pyarrow"),
            keys="v", num_buckets=num_buckets)
        # _ckpt: e feeds degrees AND both join probes per round — the
        # plan-history diamond (ops/partition.cut_lineage)
        e2 = _ckpt(e2)
        n2 = e2.count()
        if n2 == n_edges:
            break
        e, n_edges = e2, n2
    else:
        raise RuntimeError(f"kcore: no fixpoint after {max_rounds} rounds")
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "degree": pd.Series(dtype="int64")})
    deg = bucketed_agg(
        e.map_batches(_bidir("x"), batch_format="pyarrow"),
        "m", [(None, "count_all", "degree")],
        n_buckets=num_buckets).to_pandas()
    deg = deg.rename(columns={"m": "node"})
    deg["node"] = deg["node"].astype("int64")
    deg["degree"] = deg["degree"].astype("int64")
    return deg.sort_values("node").reset_index(drop=True)


def sssp(
    edges: rd.Dataset,
    source: int,
    src: str = "a",
    dst: str = "b",
    weight: str = "w",
    directed: bool = True,
    max_rounds: int = 64,
    max_broadcast_nodes: int = 5_000_000,
    state: str = "auto",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Single-source shortest paths over non-negative edge weights —
    frontier Bellman–Ford (delta-free): each round relaxes only edges
    leaving nodes whose distance improved last round, so with
    non-negative weights it converges in at most (longest
    shortest-path hop count) rounds and each round is ONE pruned edge
    scan.

    Two plans, dispatched by ``state`` (default "auto" = by node
    count vs ``max_broadcast_nodes``): *broadcast* — the edge list
    streams once per round (per-batch output = per-destination MIN
    candidate only, a sorted reduceat — O(unique dst) rows cross the
    wire); the O(nodes) distance state lives on the driver; the
    (shrinking) frontier (node, dist) pair is broadcast via
    ``ray.put``. *partitioned* (``_sssp_partitioned``, web-graph
    scale) — the distance table is a hash-bucketed Dataset, each round
    one frontier⋈edges join + one bucketed min + one state-update
    join; no O(nodes) driver state. Deterministic across
    partitionings AND across the two plans: every candidate is the
    single expression dist[a] + w and min is order-independent.
    Negative weights fail loudly (cycle divergence). Returns
    (node, dist) for reachable nodes, source at 0.0, sorted by
    node."""
    import ray

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst, weight]).rename_columns(["a", "b", "w"])
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t.column("a")),
                    pc.is_valid(t.column("b"))),
            pc.is_valid(t.column("w"))))
        a = pc.cast(t.column("a"), pa.int64())
        b = pc.cast(t.column("b"), pa.int64())
        w = pc.cast(t.column("w"), pa.float64())
        neg = pc.min(w)
        if neg.is_valid and neg.as_py() < 0:
            raise ValueError("sssp: negative edge weight")
        if directed:
            return pa.table({"a": a, "b": b, "w": w})
        ac, bc, wc = (a.combine_chunks(), b.combine_chunks(),
                      w.combine_chunks())
        return pa.table({"a": pa.concat_arrays([ac, bc]),
                         "b": pa.concat_arrays([bc, ac]),
                         "w": pa.concat_arrays([wc, wc])})

    e = _compact(edges.map_batches(clean, batch_format="pyarrow")
                 .materialize())
    n_edges = e.count()
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="float64")})
    mode, nodes_ds = _resolve_state_mode(
        state, "sssp", n_edges, max_broadcast_nodes, e, num_buckets)
    if mode == "partitioned":
        # reuse the distinct-node Dataset the dispatch already built
        # (review r5: recomputing it cost a full extra exchange in
        # exactly the web-scale regime this path exists for)
        return _sssp_partitioned(e, source, num_buckets, max_rounds,
                                 nodes_ds=nodes_ds)

    def node_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([t.column("a").combine_chunks(),
                                        t.column("b").combine_chunks()]))
        return pa.table({"node": u})

    nodes = np.unique(e.map_batches(node_partial, batch_format="pyarrow")
                      .to_pandas()["node"].to_numpy())
    dist = np.full(len(nodes), np.inf, dtype=np.float64)
    spos = np.searchsorted(nodes, np.int64(source))
    if spos >= len(nodes) or nodes[spos] != source:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="float64")})
    dist[spos] = 0.0
    f_nodes = nodes[spos:spos + 1]
    f_dist = dist[spos:spos + 1]

    for _ in range(max_rounds):
        if len(f_nodes) == 0:
            break
        f_ref = ray.put((f_nodes, f_dist))

        def relax(t: pa.Table) -> pa.Table:
            fn, fd = ray.get(f_ref)
            a = t.column("a").to_numpy(zero_copy_only=False)
            p = np.searchsorted(fn, a)
            hit = (p < len(fn))
            hit[hit] = fn[p[hit]] == a[hit]
            if not hit.any():
                return pa.table({"n": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.float64())})
            b = t.column("b").to_numpy(zero_copy_only=False)[hit]
            w = t.column("w").to_numpy(zero_copy_only=False)[hit]
            cand = fd[p[hit]] + w
            order = np.argsort(b, kind="stable")
            bs, cs = b[order], cand[order]
            starts = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
            return pa.table({
                "n": pa.array(bs[starts], pa.int64()),
                "d": pa.array(np.minimum.reduceat(cs, starts),
                              pa.float64())})

        cand = e.map_batches(relax, batch_format="pyarrow").to_pandas()
        if cand.empty:
            break
        # combine per-batch minima, then keep true improvements
        m = cand.groupby("n")["d"].min()
        idx = np.searchsorted(nodes, m.index.to_numpy(np.int64))
        better = m.to_numpy(np.float64) < dist[idx]
        if not better.any():
            break
        dist[idx[better]] = m.to_numpy(np.float64)[better]
        f_nodes = nodes[idx[better]]
        f_dist = dist[idx[better]]
    else:
        raise RuntimeError(
            f"sssp: no convergence within max_rounds={max_rounds} — "
            "raise max_rounds (deep graph) or check for weight "
            "underflow churn")

    found = np.isfinite(dist)
    return pd.DataFrame({"node": nodes[found].astype(np.int64),
                         "dist": dist[found]}) \
        .sort_values("node").reset_index(drop=True)


def hits(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    iterations: int = 20,
    max_broadcast_nodes: int = 5_000_000,
    state: str = "auto",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """HITS hubs-and-authorities over a directed edge list — the link-
    analysis complement of ``pagerank`` (a good hub points at good
    authorities; a good authority is pointed at by good hubs):

        auth'(v) = Σ_{u→v} hub(u);   hub'(u) = Σ_{u→v} auth'(v)

    with L2 normalization after each half-step, fixed ``iterations``
    rounds (deterministic stopping — the repo rule for float-iterative
    ops). Returns (node, hub, authority) for every node in any edge.

    Two plans, dispatched by ``state`` — exactly the pagerank scale
    shape: *broadcast* — edges stream twice per round (forward scatter
    for authorities, reverse for hubs), each pass pre-reduces per
    batch to sparse (node, partial) via bincount; the O(nodes) score
    state broadcasts via ``ray.put``. *partitioned*
    (``_hits_partitioned``, web-graph scale) — score state as a
    hash-bucketed Dataset, two ``_hits_half`` join+fold scatters per
    round; no O(nodes) driver state. Last-ulp output depends on
    partitioning (distributed float sums); tests compare both paths
    against a numpy reference at 1e-9."""
    import ray

    if iterations < 1:
        raise ValueError(f"iterations={iterations}")

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst]).rename_columns(["a", "b"])
        t = t.filter(pc.and_(pc.is_valid(t.column("a")),
                             pc.is_valid(t.column("b"))))
        cols = [pc.cast(t.column(c), pa.int64()) for c in ("a", "b")]
        return pa.table({"a": cols[0], "b": cols[1]})

    from maestro_ray.ops.partition import compact_blocks

    e = compact_blocks(
        edges.map_batches(clean, batch_format="pyarrow").materialize())
    n_edges = e.count()
    if n_edges == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "hub": pd.Series(dtype="float64"),
                             "authority": pd.Series(dtype="float64")})
    mode, nodes_ds = _resolve_state_mode(
        state, "hits", n_edges, max_broadcast_nodes, e, num_buckets)
    if mode == "partitioned":
        if nodes_ds is None:
            nodes_ds = _distinct_nodes(e, ["a", "b"], num_buckets)
        out = _hits_partitioned(
            e, nodes_ds, iterations, num_buckets).to_pandas()
        out = out.rename(columns={"auth": "authority"})
        out["node"] = out["node"].astype("int64")
        return out[["node", "hub", "authority"]] \
            .sort_values("node").reset_index(drop=True)

    def node_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array([t.column("a").combine_chunks(),
                                        t.column("b").combine_chunks()]))
        return pa.table({"node": u})

    nodes = np.unique(e.map_batches(node_partial, batch_format="pyarrow")
                      .to_pandas()["node"].to_numpy())
    n = len(nodes)
    nodes_ref = ray.put(nodes)
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))

    def scatter(state_ref, from_col: str, to_col: str):
        def f(t: pa.Table) -> pa.Table:
            ns = ray.get(nodes_ref)
            s = ray.get(state_ref)
            a = t.column(from_col).to_numpy(zero_copy_only=False)
            b = t.column(to_col).to_numpy(zero_copy_only=False)
            vals = s[np.searchsorted(ns, a)]
            pos = np.searchsorted(ns, b)
            acc = np.bincount(pos, weights=vals, minlength=len(ns))
            nz = np.flatnonzero(acc)
            return pa.table({"dst": pa.array(ns[nz], pa.int64()),
                             "c": pa.array(acc[nz], pa.float64())})
        return f

    def fold(parts: pd.Series) -> np.ndarray:
        out = np.zeros(n, dtype=np.float64)
        out[np.searchsorted(nodes, parts.index.to_numpy())] = \
            parts.to_numpy()
        norm = np.sqrt(float(np.sum(out * out)))
        return out / norm if norm > 0 else out

    for _ in range(iterations):
        p = e.map_batches(scatter(ray.put(hub), "a", "b"),
                          batch_format="pyarrow") \
            .to_pandas().groupby("dst", sort=True)["c"].sum()
        auth = fold(p)
        p = e.map_batches(scatter(ray.put(auth), "b", "a"),
                          batch_format="pyarrow") \
            .to_pandas().groupby("dst", sort=True)["c"].sum()
        hub = fold(p)

    return pd.DataFrame({"node": nodes.astype(np.int64),
                         "hub": hub, "authority": auth})


# ------------------------------------------------------- partitioned
# vertex state (the >max_broadcast_nodes path for pagerank / sssp /
# hits / bfs_levels).
#
# The broadcast plans above keep O(nodes) rank/distance/score state on
# the driver and ship it per round via ray.put — the right shape while
# it fits (zero per-round shuffles). Above ``max_broadcast_nodes`` the
# public ops now SWITCH (state="auto") to these plans instead of
# raising: vertex state lives as a hash-bucketed Dataset and each
# round is bounded exchanges — ONE hash_join of the edge set against
# the state (or frontier), ONE bucketed_agg fold of the per-batch
# pre-reduced messages, ONE state-update join — the label_propagation
# shape (same file). State is materialized + block-compacted every
# round (the iterative-join block-doubling rule, ops/partition).
# Nothing is O(nodes) on the driver except the final DataFrame
# delivery the public API promises; the ``_*_partitioned`` helpers
# themselves return Datasets, so a 100-TB caller can consume the
# result distributed (write_parquet / further map_batches) without
# ever collecting it.


def _distinct_nodes(e: rd.Dataset, cols, num_buckets: int) -> rd.Dataset:
    """Distinct (node) Dataset over the given endpoint columns — one
    bucketed-distinct exchange, per-batch pc.unique pre-reduce so only
    per-block uniques cross the wire; materialized + compacted (it is
    reused as the state seed)."""
    from maestro_ray.ops.aggregates import bucketed_distinct

    def part(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.chunked_array(
            [t.column(c).combine_chunks() for c in cols]))
        return pa.table({"node": u})

    return _compact(bucketed_distinct(
        e.map_batches(part, batch_format="pyarrow"), ["node"],
        n_buckets=num_buckets).materialize())


def _fold_scalar(ds: rd.Dataset, batch_fn) -> float:
    """Global Σ of a per-batch float statistic: one tiny partial per
    block, O(blocks) driver rows — never the dataset itself."""
    parts = ds.map_batches(
        lambda t: pa.table(
            {"s": pa.array([batch_fn(t)], pa.float64())}),
        batch_format="pyarrow").to_pandas()
    return float(parts["s"].sum())


def _resolve_state_mode(state: str, op: str, n_edges: int,
                        max_broadcast_nodes: int, e: rd.Dataset,
                        num_buckets: int):
    """Dispatch rule shared by the four vertex-state ops. Returns
    (mode, nodes_ds) where nodes_ds is the distinct-node Dataset when
    it was needed for the decision (reused by the partitioned plan)
    else None. The cheap tier: nodes <= 2*edges, so small edge sets
    prove the broadcast bound without any exchange; only above that
    does ONE distributed distinct count run."""
    if state not in ("auto", "broadcast", "partitioned"):
        raise ValueError(
            f"{op}: state={state!r}: auto|broadcast|partitioned")
    if state != "auto":
        return state, None
    if 2 * n_edges <= max_broadcast_nodes:
        return "broadcast", None
    nodes_ds = _distinct_nodes(e, ["a", "b"], num_buckets)
    if nodes_ds.count() <= max_broadcast_nodes:
        return "broadcast", nodes_ds
    return "partitioned", nodes_ds


def _pagerank_partitioned(e: rd.Dataset, nodes_ds: rd.Dataset,
                          damping: float, iterations: int,
                          num_buckets: int) -> rd.Dataset:
    """pagerank with (node, deg, rank) as a hash-bucketed Dataset.
    Per round: dangling mass via one O(blocks) partial fold; shares
    join the edge set on src; per-batch (dst, Σshare) pre-reduce; one
    bucketed sum; one left state-update join. Same fixed-iterations
    semantics and formula as the broadcast plan (float association
    differs at the last ulp — the distributed-float rule; tests
    compare the two paths at 1e-9)."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    n = nodes_ds.count()
    deg = bucketed_agg(e, "a", [(None, "count_all", "deg")],
                       n_buckets=num_buckets).map_batches(
        _rename_cols({"a": "node"}), batch_format="pyarrow")
    init = hash_join(nodes_ds, deg, keys="node",
                     num_buckets=num_buckets, join_type="left outer")
    inv_n = 1.0 / n

    def seed(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.fill_null(t.column("deg"), 0), pa.int64())
        return pa.table({
            "node": pc.cast(t.column("node"), pa.int64()),
            "deg": d,
            "rank": pa.array(np.full(t.num_rows, inv_n), pa.float64()),
        })

    state = _compact(init.map_batches(seed, batch_format="pyarrow")
                     .materialize())

    def share(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("deg"),
                                pa.scalar(0, pa.int64())))
        s = pc.divide(t.column("rank"),
                      pc.cast(t.column("deg"), pa.float64()))
        return pa.table({"a": t.column("node"), "__share": s})

    def pre(t: pa.Table) -> pa.Table:
        g = t.select(["b", "__share"]).group_by(["b"]) \
            .aggregate([("__share", "sum")])
        return pa.table({"node": g.column("b"),
                         "__in": g.column("__share_sum")})

    for _ in range(iterations):
        d_mass = _fold_scalar(state, lambda t: float(np.sum(
            t.column("rank").to_numpy(zero_copy_only=False)[
                t.column("deg").to_numpy(zero_copy_only=False) == 0])))
        msgs = hash_join(
            e, state.map_batches(share, batch_format="pyarrow"),
            keys="a", num_buckets=num_buckets)
        # an edge implies deg(src) >= 1, so msgs (and inflow) are
        # non-empty whenever e is — the empty-side schema-loss class
        # cannot fire here
        inflow = bucketed_agg(
            msgs.map_batches(pre, batch_format="pyarrow"),
            "node", [("__in", "sum", "__in")], n_buckets=num_buckets)
        upd = hash_join(state, inflow, keys="node",
                        num_buckets=num_buckets, join_type="left outer")
        base = (1.0 - damping) / n + damping * d_mass / n

        def apply(t: pa.Table, base=base) -> pa.Table:
            i = pc.fill_null(t.column("__in"), 0.0)
            r = pc.add(pa.scalar(base, pa.float64()),
                       pc.multiply(pa.scalar(damping, pa.float64()), i))
            return pa.table({"node": t.column("node"),
                             "deg": t.column("deg"), "rank": r})

        # _ckpt: state feeds the share emit AND the update join —
        # the plan-history diamond (ops/partition.cut_lineage)
        state = _ckpt(upd.map_batches(apply, batch_format="pyarrow"))

    return state.map_batches(lambda t: t.select(["node", "rank"]),
                             batch_format="pyarrow")


def _sssp_partitioned(e: rd.Dataset, source: int, num_buckets: int,
                      max_rounds: int,
                      nodes_ds: rd.Dataset | None = None) -> pd.DataFrame:
    """Frontier Bellman–Ford with the distance table as a bucketed
    Dataset. Per round: frontier (node, dist) joins the edge set on
    src; per-batch per-dst MIN pre-reduce; one bucketed min; one left
    state-update join whose improved rows ARE the next frontier.
    Distances stay exact (min of exact sums — order-independent), so
    this path is bit-identical to the broadcast plan."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    source_i = int(source)
    if nodes_ds is None:
        nodes_ds = _distinct_nodes(e, ["a", "b"], num_buckets)
    present = nodes_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("node"),
                                    pa.scalar(source_i, pa.int64()))),
        batch_format="pyarrow").count()
    if present == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="float64")})

    def seed(t: pa.Table) -> pa.Table:
        node = pc.cast(t.column("node"), pa.int64())
        d = pc.if_else(pc.equal(node, pa.scalar(source_i, pa.int64())),
                       pa.scalar(0.0, pa.float64()),
                       pa.scalar(np.inf, pa.float64()))
        return pa.table({"node": node, "dist": d})

    state = _compact(nodes_ds.map_batches(
        seed, batch_format="pyarrow").materialize())
    frontier = rd.from_arrow(pa.table({
        "a": pa.array([source_i], pa.int64()),
        "__fd": pa.array([0.0], pa.float64())}))

    def pre(t: pa.Table) -> pa.Table:
        nd = pc.add(t.column("__fd"), t.column("w"))
        g = pa.table({"b": t.column("b"), "__nd": nd}) \
            .group_by(["b"]).aggregate([("__nd", "min")])
        return pa.table({"node": g.column("b"),
                         "__nd": g.column("__nd_min")})

    def apply(t: pa.Table) -> pa.Table:
        nd = pc.fill_null(t.column("__nd"),
                          pa.scalar(np.inf, pa.float64()))
        better = pc.less(nd, t.column("dist"))
        return pa.table({
            "node": t.column("node"),
            "dist": pc.if_else(better, nd, t.column("dist")),
            "__imp": better})

    def to_front(t: pa.Table) -> pa.Table:
        f = t.filter(t.column("__imp"))
        return pa.table({"a": f.column("node"),
                         "__fd": f.column("dist")})

    for _ in range(max_rounds):
        msgs = hash_join(e, frontier, keys="a",
                         num_buckets=num_buckets)
        cand = _compact(bucketed_agg(
            msgs.map_batches(pre, batch_format="pyarrow"),
            "node", [("__nd", "min", "__nd")],
            n_buckets=num_buckets).materialize())
        if cand.count() == 0:
            break  # frontier had no outgoing edges
        upd = hash_join(state, cand, keys="node",
                        num_buckets=num_buckets,
                        join_type="left outer")
        # _ckpt: ns feeds state AND the next frontier — the
        # plan-history diamond (ops/partition.cut_lineage); measured
        # 2x wall time PER ROUND without the cut (a 15-row path graph
        # blew a 300 s timeout by round 13)
        ns = _ckpt(upd.map_batches(apply, batch_format="pyarrow"))
        frontier = ns.map_batches(
            to_front, batch_format="pyarrow").materialize()
        state = ns.map_batches(
            lambda t: t.select(["node", "dist"]),
            batch_format="pyarrow")
        if frontier.count() == 0:
            break
    else:
        raise RuntimeError(
            f"sssp: no convergence within max_rounds={max_rounds} — "
            "raise max_rounds (deep graph) or check for weight "
            "underflow churn")

    out = state.map_batches(
        lambda t: t.filter(pc.is_finite(t.column("dist"))),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def _hits_half(e: rd.Dataset, state: rd.Dataset, from_col: str,
               to_col: str, src_score: str, dst_score: str,
               num_buckets: int) -> rd.Dataset:
    """One HITS half-step over partitioned state: scatter src_score
    along from→to edges, bucketed sum per target, L2-normalize
    (global norm via one O(blocks) partial fold), write dst_score."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    def emit(t: pa.Table, fc=from_col, sc=src_score) -> pa.Table:
        return pa.table({fc: t.column("node"), "__v": t.column(sc)})

    def pre(t: pa.Table, tc=to_col) -> pa.Table:
        g = pa.table({"node": t.column(tc), "__v": t.column("__v")}) \
            .group_by(["node"]).aggregate([("__v", "sum")])
        return pa.table({"node": g.column("node"),
                         "__s": g.column("__v_sum")})

    msgs = hash_join(
        e, state.map_batches(emit, batch_format="pyarrow"),
        keys=from_col, num_buckets=num_buckets)
    sums = bucketed_agg(
        msgs.map_batches(pre, batch_format="pyarrow"),
        "node", [("__s", "sum", "__s")], n_buckets=num_buckets)
    upd = hash_join(state, sums, keys="node",
                    num_buckets=num_buckets, join_type="left outer")

    def put(t: pa.Table, ds_col=dst_score) -> pa.Table:
        cols = {"node": t.column("node")}
        for c in ("hub", "auth"):
            cols[c] = pc.fill_null(t.column("__s"), 0.0) \
                if c == ds_col else t.column(c)
        return pa.table(cols)

    # _ckpt: state feeds the emit AND the update join every
    # half-step — the plan-history diamond (ops/partition.cut_lineage)
    tmp = _ckpt(upd.map_batches(put, batch_format="pyarrow"))
    norm = np.sqrt(_fold_scalar(tmp, lambda t, c=dst_score: float(
        np.sum(np.square(t.column(c).to_numpy(
            zero_copy_only=False))))))
    if norm <= 0:
        return tmp

    def scale(t: pa.Table, ds_col=dst_score, nm=norm) -> pa.Table:
        cols = {"node": t.column("node")}
        for c in ("hub", "auth"):
            cols[c] = pc.divide(t.column(c),
                                pa.scalar(nm, pa.float64())) \
                if c == ds_col else t.column(c)
        return pa.table(cols)

    return _ckpt(tmp.map_batches(scale, batch_format="pyarrow"))


def _hits_partitioned(e: rd.Dataset, nodes_ds: rd.Dataset,
                      iterations: int,
                      num_buckets: int) -> rd.Dataset:
    """HITS with (node, hub, auth) as a bucketed Dataset — two
    ``_hits_half`` scatters per round (forward for authorities,
    reverse for hubs), same fixed-iterations semantics as the
    broadcast plan."""
    n = nodes_ds.count()
    v0 = 1.0 / np.sqrt(n)

    def seed(t: pa.Table) -> pa.Table:
        v = pa.array(np.full(t.num_rows, v0), pa.float64())
        return pa.table({"node": pc.cast(t.column("node"), pa.int64()),
                         "hub": v, "auth": v})

    state = _compact(nodes_ds.map_batches(
        seed, batch_format="pyarrow").materialize())
    for _ in range(iterations):
        state = _hits_half(e, state, "a", "b", "hub", "auth",
                           num_buckets)
        state = _hits_half(e, state, "b", "a", "auth", "hub",
                           num_buckets)
    return state


def _bfs_partitioned(e: rd.Dataset, seed_arr: np.ndarray,
                     max_depth: int, num_buckets: int,
                     nodes_ds: rd.Dataset | None = None) -> pd.DataFrame:
    """Multi-source BFS with the visited/distance table as a bucketed
    Dataset (e already symmetrized by the caller for undirected).
    Per level: frontier joins the edge set on src; per-batch unique
    pre-reduce; one bucketed distinct; one left state-update join —
    newly-reached rows are the next frontier. Integer distances —
    bit-identical to the broadcast plan."""
    from maestro_ray.ops.aggregates import bucketed_distinct
    from maestro_ray.ops.joins import hash_join

    if nodes_ds is None:
        nodes_ds = _distinct_nodes(e, ["a", "b"], num_buckets)
    seed_list = [int(s) for s in seed_arr]

    def seed(t: pa.Table) -> pa.Table:
        node = pc.cast(t.column("node"), pa.int64())
        hit = pc.is_in(node, value_set=pa.array(seed_list, pa.int64()))
        d = pc.if_else(hit, pa.scalar(0, pa.int64()),
                       pa.scalar(-1, pa.int64()))
        return pa.table({"node": node, "dist": d})

    state = _compact(nodes_ds.map_batches(
        seed, batch_format="pyarrow").materialize())
    frontier = state.map_batches(
        lambda t: pa.table({"a": t.filter(pc.equal(
            t.column("dist"), pa.scalar(0, pa.int64())))
            .column("node")}),
        batch_format="pyarrow").materialize()

    def pre(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pc.unique(t.column("b").combine_chunks())})

    for d in range(1, max_depth + 1):
        if frontier.count() == 0:
            break
        msgs = hash_join(e, frontier, keys="a",
                         num_buckets=num_buckets)
        cand = _compact(bucketed_distinct(
            msgs.map_batches(pre, batch_format="pyarrow"), ["node"],
            n_buckets=num_buckets).materialize())
        if cand.count() == 0:
            break
        marked = cand.map_batches(
            lambda t: t.append_column("__r", pa.array(
                np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")
        upd = hash_join(state, marked, keys="node",
                        num_buckets=num_buckets,
                        join_type="left outer")

        def apply(t: pa.Table, lvl=d) -> pa.Table:
            new = pc.and_(pc.equal(t.column("dist"),
                                   pa.scalar(-1, pa.int64())),
                          pc.is_valid(t.column("__r")))
            dist = pc.if_else(new, pa.scalar(lvl, pa.int64()),
                              t.column("dist"))
            return pa.table({"node": t.column("node"), "dist": dist,
                             "__new": new})

        # _ckpt: ns feeds state AND the next frontier — the
        # plan-history diamond (ops/partition.cut_lineage)
        ns = _ckpt(upd.map_batches(apply, batch_format="pyarrow"))
        frontier = ns.map_batches(
            lambda t: pa.table({"a": t.filter(t.column("__new"))
                                .column("node")}),
            batch_format="pyarrow").materialize()
        state = ns.map_batches(
            lambda t: t.select(["node", "dist"]),
            batch_format="pyarrow")

    out = state.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("dist"), pa.scalar(0, pa.int64()))),
        batch_format="pyarrow").to_pandas()
    if out.empty:
        # no seed in the graph: empty result loses its schema in
        # to_pandas (repo-documented class) — rebuild it typed
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    return out.sort_values("node").reset_index(drop=True)


def degree_assortativity(
    edges: rd.Dataset,
    src: str,
    dst: str,
) -> pd.DataFrame:
    """Degree assortativity over a DIRECTED edge set: Pearson
    correlation between the source's out-degree and the target's
    in-degree across distinct edges — do hubs link to hubs (r > 0) or
    to leaves (r < 0)?

    Plan, all-distributed: distinct edges via ONE bucketed exchange
    (``bucketed_agg`` — exact at any key cardinality), degree tables
    from the SAME distinct-edge set via two more bucketed counts, two
    bucketed ``hash_join``s tag each edge with (out_deg, in_deg), then
    ONE mergeable-moment pass (n, Σx, Σy, Σx², Σy², Σxy — exact
    integer sums in float64 while < 2^53) and driver algebra:
    r = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²)·√(n·Σyy − Σy²)).
    A SQL twin computing the SAME expression from the same exact
    integer aggregates (CAST to DOUBLE at the same points) is
    bit-exact. Returns one row (n_edges, r); r is null when either
    degree is constant (zero variance)."""
    from maestro_ray.ops.aggregates import _bivariate_moments, \
        bucketed_agg
    from maestro_ray.ops.joins import hash_join

    e = bucketed_agg(edges, [src, dst], [(None, "count_all", "_c")]) \
        .map_batches(lambda t: t.select([src, dst]),
                     batch_format="pyarrow").materialize()
    e = _compact(e)
    outd = bucketed_agg(e, src, [(None, "count_all", "out_deg")])
    ind = bucketed_agg(e, dst, [(None, "count_all", "in_deg")])
    tagged = hash_join(hash_join(e, outd, keys=src), ind, keys=dst)

    # single global group: constant key column fused into the stream
    tagged = tagged.map_batches(
        lambda t: t.append_column("g", pa.array(
            np.zeros(t.num_rows, dtype=np.int64), pa.int64())),
        batch_format="pyarrow")
    m = _bivariate_moments(tagged, ["g"], "out_deg", "in_deg")
    if m.empty:
        return pd.DataFrame({"n_edges": pd.Series([0], dtype="int64"),
                             "r": pd.Series([np.nan], dtype="float64")})
    row = m.iloc[0]
    n = float(row["n"])
    num = n * row["sxy"] - row["sx"] * row["sy"]
    dx = n * row["sxx"] - row["sx"] * row["sx"]
    dy = n * row["syy"] - row["sy"] * row["sy"]
    r = num / (np.sqrt(dx) * np.sqrt(dy)) if dx > 0 and dy > 0 \
        else np.nan
    return pd.DataFrame({"n_edges": pd.Series([int(n)], dtype="int64"),
                         "r": pd.Series([r], dtype="float64")})


def local_clustering(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Per-node LOCAL clustering coefficient over an undirected graph:
    cc(v) = 2·T(v) / (d(v)·(d(v)−1)) with T(v) the number of triangles
    incident to v and d(v) its degree in the distinct canonical edge
    set. Nodes with d < 2 are omitted (cc undefined — mirror the same
    ``degree >= 2`` rule in any SQL twin).

    Plan — fully distributed, the triangle_count wedge machinery with
    a corner explode instead of a global count:

    1. canonical distinct edges (u < v), endpoint type preserved
       (string hosts ride as-is), materialized once and reused by all
       three plan legs;
    2. wedges a<b<c via one bucketed hash_join on the middle vertex,
       closed against E on (a, c) — each triangle appears exactly once;
    3. every closed triangle emits its 3 corners; one bucketed count
       per node = T(v); degree from the bidirected edge list the same
       way; one left hash_join (deg → tri) fills triangle-free nodes
       with 0.

    cc is a per-row division of exact integers — bit-exact
    cross-engine, no rounding (the chi2/confusion_report contract).
    Skew: wedge volume is Σ deg(b)²; cap or pre-split hot vertices
    upstream for power-law graphs (the triangle_count note)."""
    from maestro_ray.ops.joins import hash_join

    e = _canonical_edges(edges, src, dst, num_buckets, cast_int64=False)
    node_type = edges.schema().base_schema.field(src).type
    if e.count() == 0:
        # no surviving edges: empty result, schema kept (the
        # empty-Dataset schema-loss class — build the table directly)
        return rd.from_arrow(pa.table({
            "node": pa.array([], node_type),
            "degree": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64()),
            "cc": pa.array([], pa.float64()),
        }))
    wedges = hash_join(
        e.map_batches(_rename_cols({"u": "a", "v": "b"}),
                      batch_format="pyarrow"),
        e.map_batches(_rename_cols({"u": "b", "v": "c"}),
                      batch_format="pyarrow"),
        keys="b", num_buckets=num_buckets)
    tri = hash_join(
        wedges,
        e.map_batches(_rename_cols({"u": "a", "v": "c"}),
                      batch_format="pyarrow"),
        keys=["a", "c"], num_buckets=num_buckets)

    def corners(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [t.select([c]).rename_columns(["node"])
             for c in ("a", "b", "c")])

    from maestro_ray.ops.aggregates import bucketed_agg

    tri_n = bucketed_agg(
        tri.map_batches(corners, batch_format="pyarrow"),
        "node", [(None, "count_all", "triangles")],
        n_buckets=num_buckets).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t.column("u").combine_chunks(),
             t.column("v").combine_chunks()])})

    deg = bucketed_agg(
        e.map_batches(endpoints, batch_format="pyarrow"),
        "node", [(None, "count_all", "degree")],
        n_buckets=num_buckets)
    if tri_n.count() == 0:
        # a triangle-free graph: the empty side would lose its schema
        # through the join probe — null-fill triangles directly
        joined = deg.map_batches(
            lambda t: t.append_column(
                "triangles", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        joined = hash_join(deg, tri_n, keys="node",
                           num_buckets=num_buckets,
                           join_type="left outer")

    def finish(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("degree"), pa.int64())
        tr = pc.cast(pc.fill_null(t.column("triangles"), 0), pa.int64())
        cc = pc.divide(
            pc.cast(pc.multiply(tr, pa.scalar(2, pa.int64())),
                    pa.float64()),
            pc.cast(pc.multiply(d, pc.subtract(
                d, pa.scalar(1, pa.int64()))), pa.float64()))
        out = pa.table({"node": t.column("node"), "degree": d,
                        "triangles": tr, "cc": cc})
        return out.filter(pc.greater_equal(d, 2))

    return joined.map_batches(finish, batch_format="pyarrow")


def label_propagation(
    edges: rd.Dataset,
    seeds: pd.DataFrame,
    rounds: int = 5,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
) -> rd.Dataset:
    """Semi-supervised label propagation over an undirected graph:
    ``seeds`` (columns node, label) are clamped; every other node
    takes, each synchronous round, the MAJORITY label among its
    currently-labeled neighbors (ties → smallest label — the
    deterministic variant, like dbscan's). Returns (node, label) for
    every node in the edge set; nodes unreached after ``rounds``
    rounds keep a null label.

    Plan: canonical distinct edges bidirected once; per round ONE
    hash_join (edge source ← labels) + ONE bucketed (node, label)
    count + per-node argmax — all bounded exchanges. State is
    materialized + block-compacted per round (the join-loop
    block-doubling lesson). Seed labels must be non-null; string or
    int labels both ride."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    if rounds < 1:
        raise ValueError(f"label_propagation: rounds={rounds}")
    if seeds.isnull().any().any():
        raise ValueError("label_propagation: null seed node/label")
    e = _canonical_edges(edges, src, dst, num_buckets,
                         cast_int64=False)
    bidir = _compact(e.map_batches(_bidir("o"), batch_format="pyarrow")
                     .materialize())
    seed_t = pa.table({
        "node": pa.array(seeds["node"].tolist()),
        "label": pa.array(seeds["label"].tolist()),
    })
    label_type = seed_t.column("label").type

    def init_state(t: pa.Table) -> pa.Table:
        nodes = pa.table({"node": pa.concat_arrays(
            [t.column("u").combine_chunks(),
             t.column("v").combine_chunks()])})
        return nodes

    nodes = bucketed_agg(
        e.map_batches(init_state, batch_format="pyarrow"),
        "node", [(None, "count_all", "__c")],
        n_buckets=num_buckets).map_batches(
        lambda t: t.drop_columns(["__c"]), batch_format="pyarrow")

    def attach_seed(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("node"), seed_t.column("node"))
        lab = seed_t.column("label").take(pc.fill_null(idx, 0))
        lab = pc.if_else(pc.is_valid(idx), lab,
                         pa.nulls(t.num_rows, label_type))
        return pa.table({"node": t.column("node"), "label": lab,
                         "is_seed": pc.is_valid(idx)})

    state = _compact(nodes.map_batches(
        attach_seed, batch_format="pyarrow").materialize())

    for _ in range(rounds):
        # messages: every labeled node sends its label to each neighbor
        msgs = hash_join(
            bidir.map_batches(lambda t: t.rename_columns(
                ["node", "__o"]), batch_format="pyarrow"),
            state.map_batches(
                lambda t: t.filter(pc.is_valid(t.column("label")))
                .select(["node", "label"]), batch_format="pyarrow"),
            keys="node", num_buckets=num_buckets)
        votes = bucketed_agg(
            msgs.map_batches(lambda t: t.select(["__o", "label"]),
                             batch_format="pyarrow"),
            ["__o", "label"], [(None, "count_all", "__n")],
            n_buckets=num_buckets)

        def route(t: pa.Table) -> pa.Table:
            from maestro_ray.ops.hashing import hash_array

            b = (hash_array(t.column("__o"))
                 % np.uint64(num_buckets)).astype(np.int64)
            return t.append_column("__vb", pa.array(b, pa.int64()))

        def pick_bucket(g: pa.Table) -> pa.Table:
            # per-node majority, ties → smallest label — vectorized
            # adjacent-change pick over the WHOLE bucket (one Python
            # call per bucket, never per node — the bucketed_agg rule)
            g = g.drop_columns(["__vb"])
            s = g.take(pc.sort_indices(
                g, sort_keys=[("__o", "ascending"),
                              ("__n", "descending"),
                              ("label", "ascending")]))
            o = s.column("__o").combine_chunks()
            first = np.ones(len(o), dtype=bool)
            if len(o) > 1:
                first[1:] = pc.not_equal(
                    o.slice(1), o.slice(0, len(o) - 1)) \
                    .to_numpy(zero_copy_only=False)
            out = s.filter(pa.array(first))
            return out.select(["__o", "label"]) \
                .rename_columns(["node", "__new"])

        cand = _compact(votes.map_batches(route, batch_format="pyarrow")
                        .groupby("__vb")
                        .map_groups(pick_bucket, batch_format="pyarrow")
                        .materialize())
        if cand.count() == 0:
            # no seed matched any node: every round is a no-op, and an
            # empty cand would lose its schema through the join probe
            # (the empty-Dataset class — review r4 s8b,
            # execution-confirmed)
            break
        joined = hash_join(state, cand, keys="node",
                           num_buckets=num_buckets,
                           join_type="left outer")

        def update(t: pa.Table) -> pa.Table:
            keep = pc.or_(t.column("is_seed"),
                          pc.invert(pc.is_valid(t.column("__new"))))
            lab = pc.if_else(keep, t.column("label"), t.column("__new"))
            return pa.table({"node": t.column("node"), "label": lab,
                             "is_seed": t.column("is_seed")})

        # _ckpt: state feeds msgs AND the update join — the
        # plan-history diamond (ops/partition.cut_lineage)
        state = _ckpt(joined.map_batches(
            update, batch_format="pyarrow"))

    return state.map_batches(lambda t: t.select(["node", "label"]),
                             batch_format="pyarrow")


def dag_layers(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
    max_rounds: int = 10_000,
) -> pd.DataFrame:
    """Topological LAYERING of a DAG: layer(v) = length of the longest
    directed path ending at v (sources = layer 0) — the parallel-
    schedule depth / dependency-wave view of a DAG, and an implicit
    cycle detector.

    Plan — distributed Kahn peeling, the ``kcore`` shape: each round
    computes in-degrees over the SURVIVING edge set (one bucketed
    count), peels the zero-in-degree frontier (surviving nodes minus
    current dst set — one left anti join), assigns them the round
    index, and drops their out-edges (one join). Loop state is
    ``checkpoint_state``-cut per round (the r5 plan-history-diamond
    rule: the edge set feeds the degree count AND the join probe).
    Layers are exact ints — bit-reproducible across partitionings.
    A round with edges left but no peelable node means a CYCLE —
    fails loudly naming the surviving edge count. Null endpoints are
    dropped; self-loops fail as cycles (correct). Returns
    (node, layer) sorted by node."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.joins import hash_join

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([src, dst]).rename_columns(["a", "b"])
        t = t.filter(pc.and_(pc.is_valid(t.column("a")),
                             pc.is_valid(t.column("b"))))
        return pa.table({"a": pc.cast(t.column("a"), pa.int64()),
                         "b": pc.cast(t.column("b"), pa.int64())})

    e = _compact(edges.map_batches(clean, batch_format="pyarrow")
                 .materialize())
    if e.count() == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "layer": pd.Series(dtype="int64")})
    nodes = _distinct_nodes(e, ["a", "b"], num_buckets)
    out_parts: list[pd.DataFrame] = []
    layer = 0
    for _ in range(max_rounds):
        n_edges = e.count()
        if n_edges == 0:
            # every remaining node has no incident surviving edge:
            # they all peel at the current layer
            rest = nodes.to_pandas()
            if len(rest):
                rest = rest.rename(columns={"node": "node"})
                rest["layer"] = np.int64(layer)
                out_parts.append(rest[["node", "layer"]])
            break
        # dst set marks nodes with incoming edges; survivors minus
        # that set is the peelable frontier
        dsts = bucketed_agg(
            e.map_batches(lambda t: t.select(["b"]).rename_columns(
                ["node"]), batch_format="pyarrow"),
            "node", [(None, "count_all", "__in")],
            n_buckets=num_buckets)
        marked = hash_join(nodes, dsts, keys="node",
                           num_buckets=num_buckets,
                           join_type="left outer")
        frontier = _ckpt(marked.map_batches(
            lambda t: t.filter(pc.is_null(t.column("__in")))
            .select(["node"]), batch_format="pyarrow"))
        n_f = frontier.count()
        if n_f == 0:
            raise ValueError(
                f"dag_layers: no peelable node with {n_edges} edges "
                "remaining — the graph has a CYCLE")
        fp = frontier.to_pandas()
        fp["layer"] = np.int64(layer)
        out_parts.append(fp[["node", "layer"]])
        # survivors = nodes minus frontier; edges from frontier drop
        tagged = frontier.map_batches(
            lambda t: t.append_column("__f", pa.array(
                np.ones(t.num_rows, dtype=np.int8))),
            batch_format="pyarrow")
        nodes = _ckpt(hash_join(nodes, tagged, keys="node",
                                num_buckets=num_buckets,
                                join_type="left outer").map_batches(
            lambda t: t.filter(pc.is_null(t.column("__f")))
            .select(["node"]), batch_format="pyarrow"))
        e = _ckpt(hash_join(
            e, tagged.map_batches(_rename_cols({"node": "a"}),
                                  batch_format="pyarrow"),
            keys="a", num_buckets=num_buckets,
            join_type="left outer").map_batches(
            lambda t: t.filter(pc.is_null(t.column("__f")))
            .select(["a", "b"]), batch_format="pyarrow"))
        layer += 1
    else:
        raise RuntimeError(
            f"dag_layers: no fixpoint after {max_rounds} rounds")
    out = pd.concat(out_parts, ignore_index=True) if out_parts else \
        pd.DataFrame({"node": pd.Series(dtype="int64"),
                      "layer": pd.Series(dtype="int64")})
    out["node"] = out["node"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def reciprocity(
    edges: rd.Dataset,
    src: str = "a",
    dst: str = "b",
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Directed-graph reciprocity: the fraction of distinct directed
    non-self edges whose reverse edge also exists — mutual-linking
    strength of a web/link graph (1 = fully bidirectional, 0 = pure
    hierarchy).

    Plan: ONE bucketed-distinct exchange over the cleaned directed
    edge set (nulls and self-loops dropped), then one bucketed
    hash_join of the distinct set against its own reversal — the
    inner-join row count IS the mutual-edge count (distinctness makes
    multiplicity 1). Exact ints, one division — bit-exact vs the
    self-join twin, no rounding. Endpoint type preserved (string
    hosts ride as-is). Returns one row (n_edges, n_mutual,
    reciprocity)."""
    from maestro_ray.ops.aggregates import bucketed_distinct
    from maestro_ray.ops.joins import hash_join

    def clean(t: pa.Table) -> pa.Table:
        a, b = t.column(src), t.column(dst)
        ok = pc.and_kleene(
            pc.and_kleene(pc.is_valid(a), pc.is_valid(b)),
            pc.not_equal(a, b))
        return pa.table({"u": a, "v": b}).filter(pc.fill_null(ok, False))

    e = _compact(bucketed_distinct(
        edges.map_batches(clean, batch_format="pyarrow"), ["u", "v"],
        n_buckets=num_buckets).materialize())
    n_edges = e.count()
    if n_edges == 0:
        return pd.DataFrame({
            "n_edges": pd.Series([0], dtype="int64"),
            "n_mutual": pd.Series([0], dtype="int64"),
            "reciprocity": pd.Series([np.nan], dtype="float64")})
    rev = e.map_batches(
        lambda t: pa.table({"u": t.column("v"), "v": t.column("u")}),
        batch_format="pyarrow")
    n_mutual = hash_join(e, rev, keys=["u", "v"],
                         num_buckets=num_buckets).count()
    return pd.DataFrame({
        "n_edges": pd.Series([n_edges], dtype="int64"),
        "n_mutual": pd.Series([n_mutual], dtype="int64"),
        "reciprocity": pd.Series([n_mutual / n_edges],
                                 dtype="float64")})
