"""Event-analytics pipelines over a (user, ts, event_type) stream:
ordered funnel progression and cohort retention — the two queries every
product-analytics workload runs on an events table.

Both are one-shuffle plans: funnel is a per-user group scan (sorted
searchsorted cascade, no Python over rows), retention is two mergeable
grouped aggregations glued by a bucketed hash_join (first-touch table
back onto the stream) — the event stream is never collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def funnel(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> rd.Dataset:
    """Ordered funnel: per ``key``, how far through ``steps`` the
    entity progressed, each step STRICTLY after the previous one
    (min ts of step i+1 with ts > reached ts of step i — the standard
    product-analytics cascade). Output one row per key that reached
    step 1: (key, funnel_depth, ts_1..ts_k nullable timestamps).

    One shuffle (groupby key); inside a group each step is one
    boolean mask + one min over the masked ts array — vectorized, no
    per-event Python. Ties at the same timestamp do NOT advance the
    funnel (strict >), which makes the result deterministic without a
    tiebreak."""
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")

    def per_key(g: pa.Table) -> pa.Table:
        ts = (g.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        et = g.column(type_col).to_pylist()
        et = np.asarray(et, dtype=object)
        reached: list[float | None] = []
        cur = -np.inf
        for s in steps:
            m = (et == s) & (ts > cur)
            if not m.any():
                break
            cur = int(ts[m].min())
            reached.append(cur)
        if not reached:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "funnel_depth": pa.array([], pa.int64()),
                **{f"ts_{i+1}": pa.array([], pa.timestamp("us"))
                   for i in range(len(steps))},
            })
        vals = reached + [None] * (len(steps) - len(reached))
        return pa.table({
            key: g.column(key).slice(0, 1),
            "funnel_depth": pa.array([len(reached)], pa.int64()),
            **{f"ts_{i+1}": pa.array([v], pa.int64()).cast(
                pa.timestamp("us")) for i, v in enumerate(vals)},
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def cohort_retention(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    period: str = "1w",
) -> rd.Dataset:
    """Cohort retention: bucket each entity by its FIRST-event period
    (the cohort), then count distinct active entities per (cohort,
    period_index) — period_index = whole periods since the cohort
    bucket (0 = the cohort period itself). Output: (cohort,
    period_index, n_active).

    Plan: first-touch table via ONE mergeable grouped-min (per-batch
    partial mins, small groupby); it rejoins the stream through the
    bucketed ``hash_join`` (never a driver dict — the user universe is
    unbounded); the distinct-count is a per-batch (cohort, idx, key)
    dedup partial before the final count — the standard two-level
    distinct plan. Period buckets are epoch-floored (``1w`` = 7-day
    buckets anchored at the unix epoch, NOT ISO weeks — the twin must
    bucket the same way)."""
    from maestro_ray.ops.joins import hash_join

    stride_us = np.int64(pd.Timedelta(period).value // 1000)
    if stride_us <= 0:
        raise ValueError(f"cohort_retention: bad period {period!r}")

    def bucket(t: pa.Table, out: str) -> pa.Table:
        ts = (t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        b = ts - ts % stride_us
        return t.append_column(out, pa.array(b, pa.int64()))

    def first_partial(t: pa.Table) -> pa.Table:
        t = bucket(t, "b")
        g = t.select([key, "b"]).group_by(key).aggregate([("b", "min")])
        return g.rename_columns([key, "cohort_us"])

    first = (ds.map_batches(first_partial, batch_format="pyarrow")
             .groupby(key).min("cohort_us")
             .map_batches(lambda t: t.rename_columns([key, "cohort_us"]),
                          batch_format="pyarrow"))

    events = ds.map_batches(
        lambda t: bucket(t.select([key, ts_col]), "b").select([key, "b"]),
        batch_format="pyarrow")
    joined = hash_join(events, first, keys=key)

    def pair_partial(t: pa.Table) -> pa.Table:
        idx = pc.divide(pc.subtract(t.column("b"),
                                    t.column("cohort_us")),
                        pa.scalar(int(stride_us), pa.int64()))
        t = pa.table({
            "cohort_us": t.column("cohort_us"),
            "period_index": idx,
            key: t.column(key),
        })
        return t.group_by(["cohort_us", "period_index", key]).aggregate([])

    pairs = joined.map_batches(pair_partial, batch_format="pyarrow")

    def count_distinct(g: pa.Table) -> pa.Table:
        return pa.table({
            "cohort": g.column("cohort_us").slice(0, 1).cast(
                pa.timestamp("us")),
            "period_index": g.column("period_index").slice(0, 1),
            "n_active": pa.array(
                [pc.count_distinct(g.column(key)).as_py()], pa.int64()),
        })

    return pairs.groupby(["cohort_us", "period_index"]).map_groups(
        count_distinct, batch_format="pyarrow")


def ohlc(
    ds: rd.Dataset,
    key: str,
    ts_col: str,
    value_col: str,
    bucket: str,
    seq_col: str | None = None,
) -> rd.Dataset:
    """Per-key OHLC downsampling: open/high/low/close of ``value_col``
    per ``bucket`` (pandas offset alias, epoch-floored — the same
    bucket rule as tumbling_window/cohort: pin it in any SQL twin, NOT
    calendar weeks). Open/close are the first/last values in (ts, seq)
    order — pass ``seq_col`` when timestamps can collide. One shuffle
    (groupby key), vectorized per-group bucketing: sort once, slice
    boundaries via run detection, O(n) per group. Null values are
    dropped first (SQL aggregate rule)."""
    ns = int(pd.Timedelta(bucket).value)
    us = ns // 1000
    sort_keys = [(ts_col, "ascending")] + (
        [(seq_col, "ascending")] if seq_col else [])

    def per_key(g: pa.Table) -> pa.Table:
        g = g.filter(pc.is_valid(g.column(value_col)))
        if g.num_rows == 0:
            return pa.table({
                key: pa.array([], g.schema.field(key).type),
                "bucket_ts": pa.array([], pa.timestamp("us")),
                "open": pa.array([], pa.float64()),
                "high": pa.array([], pa.float64()),
                "low": pa.array([], pa.float64()),
                "close": pa.array([], pa.float64()),
                "n": pa.array([], pa.int64()),
            })
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        ts = s.column(ts_col).to_numpy(zero_copy_only=False)
        tus = ts.astype("datetime64[us]").astype(np.int64)
        b = tus - (tus % us)
        v = s.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        return pa.table({
            key: s.column(key).take(pa.array(starts, pa.int64())),
            "bucket_ts": pa.array(
                b[starts].astype("datetime64[us]"), pa.timestamp("us")),
            "open": pa.array(v[starts], pa.float64()),
            "high": pa.array(np.maximum.reduceat(v, starts), pa.float64()),
            "low": pa.array(np.minimum.reduceat(v, starts), pa.float64()),
            "close": pa.array(v[ends - 1], pa.float64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def markov_transitions(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    state_col: str,
) -> "pd.DataFrame":
    """First-order Markov transition matrix over per-key event
    sequences: for every observed (cur_state → next_state) pair, its
    count and conditional probability P(next | cur).

    Plan: one groupby(key) shuffle; inside each group a sort + two
    zero-copy shifted slices emit the (cur, next) pairs; a distributed
    count reduces them to the |states|² matrix, which is tiny by
    construction — the final probability normalization runs on the
    driver over that matrix only (never over events). Probabilities
    are int/int divisions, bit-exact across engines."""
    import pandas as pd

    sort_keys = [(c, "ascending") for c in order_cols]

    def per_key(g: pa.Table) -> pa.Table:
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        v = s.column(state_col).combine_chunks()
        n = s.num_rows
        return pa.table({
            "cur_state": v.slice(0, n - 1),
            "next_state": v.slice(1),
        })

    pairs = ds.groupby(key).map_groups(per_key, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["cur_state", "next_state"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["cur_state", "next_state", "n"])

    counts = (pairs.map_batches(partial, batch_format="pyarrow")
              .groupby(["cur_state", "next_state"]).sum("n")
              .to_pandas())
    if counts.empty:  # empty Datasets drop their schema in to_pandas
        return pd.DataFrame({"cur_state": pd.Series(dtype=object),
                             "next_state": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "p": pd.Series(dtype="float64")})
    counts.columns = ["cur_state", "next_state", "n"]
    counts["n"] = counts["n"].astype("int64")
    totals = counts.groupby("cur_state")["n"].transform("sum")
    counts["p"] = counts["n"] / totals  # exact: int / int
    return counts.sort_values(["cur_state", "next_state"]) \
        .reset_index(drop=True)


def sequence_gaps(
    ds: rd.Dataset,
    key: str,
    id_col: str,
) -> rd.Dataset:
    """Gaps-and-islands over per-key integer id sequences: one row per
    INTERIOR gap — (key, gap_start, gap_end) where gap_start..gap_end
    are the missing ids between two consecutive present ids. The CDC
    shape of this is offset-gap detection in a partitioned changelog.
    One groupby(key) shuffle; per group a sort + one vectorized diff.
    Exact integers end-to-end."""

    def per_key(g: pa.Table) -> pa.Table:
        from maestro_ray.ops.dedup import _ids_int64

        # null-guarded: astype(int64) folds nulls onto INT64_MIN and
        # would emit a garbage quintillion-wide gap (the SQL twin's
        # lead() simply skips the null) — same guard as near-dedup
        ids = np.sort(_ids_int64(g.column(id_col), "sequence_gaps",
                                 id_col))
        nxt = ids[1:]
        cur = ids[:-1]
        m = nxt > cur + 1
        k = g.column(key).combine_chunks()
        return pa.table({
            key: k.take(pa.array(np.zeros(int(m.sum()), np.int64))),
            "gap_start": pa.array(cur[m] + 1, pa.int64()),
            "gap_end": pa.array(nxt[m] - 1, pa.int64()),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def last_touch_attribution(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    type_col: str,
    id_col: str,
    touch_type: str = "view",
    conv_type: str = "purchase",
) -> rd.Dataset:
    """Last-touch attribution: for every conversion event, the id of
    the most recent STRICTLY-preceding touch event in the same key's
    timeline (null when the conversion had no prior touch) — SQL's
    ``last_value(touch IGNORE NULLS) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` gated to conversions. One groupby(key)
    shuffle; per group a sort + one cumulative-max index fold — no
    Python loop. Exact integers and nulls."""
    sort_keys = [(c, "ascending") for c in order_cols]

    def per_key(g: pa.Table) -> pa.Table:
        from maestro_ray.ops.dedup import _ids_int64

        s = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        n = s.num_rows
        types = s.column(type_col).to_numpy(zero_copy_only=False)
        # null-guarded: a null id would silently become INT64_MIN in
        # conv/touch ids where the SQL twin propagates NULL
        ids = _ids_int64(s.column(id_col), "last_touch_attribution",
                         id_col)
        is_touch = types == touch_type
        pos = np.where(is_touch, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(pos)
        prev_last = np.concatenate(([np.int64(-1)], last[:-1]))
        conv = np.flatnonzero(types == conv_type)
        take = prev_last[conv]
        touch = ids[np.maximum(take, 0)]
        k = s.column(key).combine_chunks()
        return pa.table({
            key: k.take(pa.array(conv, pa.int64())),
            "conv_event_id": pa.array(ids[conv], pa.int64()),
            "touch_event_id": pa.array(
                np.where(take >= 0, touch, 0), pa.int64(),
                mask=(take < 0)),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def _pairs_within_runs(items: np.ndarray, run_sizes: np.ndarray
                       ) -> tuple[np.ndarray, np.ndarray]:
    """All ordered-unique pairs (i<j by position) WITHIN each
    contiguous run of ``items`` — fully vectorized (no per-run Python
    loop): each element at in-run position p pairs leftward with the
    (k-1-p) elements after it; the right side is gathered by a global
    index built from a cumsum ramp. Pair count is sum k(k-1)/2."""
    if len(items) == 0:
        return (np.array([], dtype=items.dtype),
                np.array([], dtype=items.dtype))
    starts = np.concatenate(([0], np.cumsum(run_sizes)[:-1]))
    pos = np.arange(len(items)) - np.repeat(starts, run_sizes)
    reps = np.repeat(run_sizes, run_sizes) - 1 - pos  # pairs per elem
    lefts = np.repeat(items, reps)
    base = np.repeat(np.arange(len(items)), reps)
    ramp_start = np.repeat(np.cumsum(reps) - reps, reps)
    within = np.arange(int(reps.sum())) - ramp_start
    rights = items[base + 1 + within]
    return lefts, rights


def cooccurrence_pairs(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    n_buckets: int = 32,
) -> rd.Dataset:
    """Market-basket pair co-occurrence: for every unordered item pair
    {p1 < p2}, the number of baskets containing BOTH (support).

    Plan — three bucket exchanges, nothing basket- or corpus-sized on
    the driver: (1) distinct (basket, item) via ``bucketed_agg`` (a
    basket listing an item twice counts once — the SQL DISTINCT
    spelling); (2) route by hash(basket), per-bucket sort by (basket,
    item) and vectorized within-run pair generation
    (``_pairs_within_runs`` — no per-basket Python loop; item order
    inside a run is ascending, so p1 < p2 holds by construction);
    (3) ``bucketed_agg`` count per (p1, p2), filtered to
    ``min_support``. Returns a lazy Dataset (p1, p2, support) — at
    web scale the pair space is large, so the caller bounds it
    (min_support / top-k), never to_pandas unguarded."""
    distinct = _distinct_basket_items(ds, basket_col, item_col,
                                      n_buckets)
    return _pair_counts(distinct, basket_col, item_col, min_support,
                        n_buckets)


def _distinct_basket_items(ds, basket_col, item_col, n_buckets):
    """Lazy distinct (basket, item) relation (nulls dropped)."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(basket_col)),
                     pc.is_valid(t.column(item_col)))
        return t.select([basket_col, item_col]).filter(ok)

    return bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [basket_col, item_col], [(None, "count_all", "__c")],
        n_buckets=n_buckets)


def _pair_counts(distinct, basket_col, item_col, min_support,
                 n_buckets) -> rd.Dataset:
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.hashing import hash_array

    def route(t: pa.Table) -> pa.Table:
        h = hash_array(t.column(basket_col))
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__pb", pa.array(b, pa.int64()))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        s = g.take(pc.sort_indices(
            g, sort_keys=[(basket_col, "ascending"),
                          (item_col, "ascending")]))
        ids = s.column(basket_col).to_numpy(zero_copy_only=False)
        items = s.column(item_col).to_numpy(zero_copy_only=False)
        # run lengths of equal basket ids (sorted => runs contiguous);
        # != works for numeric and object (string) ids alike
        if len(ids) == 0:
            sizes = np.array([], dtype=np.int64)
        else:
            change = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            bounds = np.concatenate(([0], change, [len(ids)]))
            sizes = np.diff(bounds)
        lefts, rights = _pairs_within_runs(items, sizes)
        item_t = s.schema.field(item_col).type
        return pa.table({"p1": pa.array(lefts, item_t),
                         "p2": pa.array(rights, item_t)})

    pairs = distinct.map_batches(route, batch_format="pyarrow") \
        .groupby("__pb").map_groups(bucket_pairs, batch_format="pyarrow")
    support = bucketed_agg(
        pairs, ["p1", "p2"], [(None, "count_all", "support")],
        n_buckets=n_buckets)
    if min_support > 1:
        support = support.filter(
            expr=f"support >= {int(min_support)}")
    return support


def jaccard_sets(
    ds: rd.Dataset,
    set_col: str,
    member_col: str,
    round_to: int | None = 6,
) -> pd.DataFrame:
    """Jaccard similarity between every pair of SETS, where set s =
    {distinct members m with a (s, m) row}: |A∩B| / |A∪B|. The
    audience-overlap / co-visitation shape (sets = event types or
    domains, members = users).

    Intersections ride ``cooccurrence_pairs`` with members as the
    baskets (a member in both sets contributes 1 to their pair);
    set sizes are one tiny grouped count over the same distinct
    (member, set) relation. Driver sees only O(set pairs + sets)
    rows — assumes set CARDINALITY is reporting-sized (members are
    never collected). All counts exact ints; jaccard rounds 6dp
    (float-division policy). Returns (s1, s2, inter, union_, jaccard)
    for pairs with inter >= 1."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(set_col)),
                     pc.is_valid(t.column(member_col)))
        return t.select([set_col, member_col]).filter(ok)

    cleaned = ds.map_batches(clean, batch_format="pyarrow")
    inter = cooccurrence_pairs(
        cleaned, basket_col=member_col, item_col=set_col).to_pandas()
    sizes = bucketed_agg(
        cleaned, [member_col, set_col], [(None, "count_all", "__c")]
    ).map_batches(
        lambda t: t.select([set_col]), batch_format="pyarrow")
    sizes = bucketed_agg(
        sizes, [set_col], [(None, "count_all", "size")]).to_pandas()
    if inter.empty or sizes.empty:
        return pd.DataFrame({
            "s1": pd.Series([], dtype="object"),
            "s2": pd.Series([], dtype="object"),
            "inter": pd.Series([], dtype="int64"),
            "union_": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64")})
    sz = dict(zip(sizes[set_col], sizes["size"]))
    out = inter.rename(columns={"p1": "s1", "p2": "s2",
                                "support": "inter"})
    out["inter"] = out["inter"].astype("int64")
    out["union_"] = (out["s1"].map(sz) + out["s2"].map(sz)
                     - out["inter"]).astype("int64")
    jac = (out["inter"] / out["union_"]).to_numpy()
    if round_to is not None:  # SQL tie rule (half away from zero)
        from maestro_ray.ops.aggregates import sql_round
        jac = sql_round(jac, round_to)
    out["jaccard"] = jac
    return out.sort_values(["s1", "s2"]).reset_index(drop=True)


def association_rules(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    round_to: int | None = 6,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Directed association rules ante → cons for every item pair
    meeting ``min_support``: confidence = supp(ante, cons)/supp(ante),
    lift = confidence / (supp(cons)/n_baskets) — the classic
    support/confidence/lift triple.

    The distinct (basket, item) relation is materialized ONCE (it
    feeds three consumers: the pair counts, the per-item supports,
    and the basket count — a lazy plan would recompute the upstream
    read per consumer) and block-compacted. The driver sees only
    O(qualifying rules + items referenced by them); all counts are
    exact ints, ratios follow the 6dp float-division policy. Returns
    (ante, cons, support, confidence, lift) sorted by (ante, cons)."""
    from maestro_ray.ops.aggregates import bucketed_agg
    from maestro_ray.ops.partition import compact_blocks

    distinct = compact_blocks(
        _distinct_basket_items(ds, basket_col, item_col, n_buckets)
        .materialize())
    pairs = _pair_counts(distinct, basket_col, item_col, min_support,
                         n_buckets).to_pandas()
    empty = pd.DataFrame({
        "ante": pd.Series([], dtype="object"),
        "cons": pd.Series([], dtype="object"),
        "support": pd.Series([], dtype="int64"),
        "confidence": pd.Series([], dtype="float64"),
        "lift": pd.Series([], dtype="float64")})
    if pairs.empty:
        return empty
    supports = bucketed_agg(
        distinct, [item_col], [(None, "count_all", "sp")],
        n_buckets=n_buckets).to_pandas()
    n_baskets = bucketed_agg(
        distinct, [basket_col], [(None, "count_all", "__c")],
        n_buckets=n_buckets).count()
    sp = dict(zip(supports[item_col], supports["sp"].astype("int64")))
    both = pd.concat([
        pairs.rename(columns={"p1": "ante", "p2": "cons"}),
        pairs.rename(columns={"p2": "ante", "p1": "cons"}),
    ], ignore_index=True)
    both["support"] = both["support"].astype("int64")
    sa = both["ante"].map(sp).astype("int64")
    sc = both["cons"].map(sp).astype("int64")
    conf = both["support"] / sa
    lift = both["support"] * float(n_baskets) / (sa * sc)
    if round_to is not None:  # SQL half-away-from-zero, not half-even
        from maestro_ray.ops.aggregates import sql_round
        conf = sql_round(conf.to_numpy(), round_to)
        lift = sql_round(lift.to_numpy(), round_to)
    both["confidence"], both["lift"] = conf, lift
    return both[["ante", "cons", "support", "confidence", "lift"]] \
        .sort_values(["ante", "cons"]).reset_index(drop=True)


def top_paths(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    type_col: str,
    max_steps: int = 3,
    k: int = 20,
    sep: str = ">",
) -> pd.DataFrame:
    """Top-k most frequent JOURNEY PREFIXES: per key, the first
    ``max_steps`` event types in ``order_cols`` order joined by
    ``sep``; paths ranked by how many keys follow them (count desc,
    then path asc — a total, engine-independent order).

    One groupby shuffle builds per-key paths (vectorized slice+join
    inside the group task), one bucketed count collapses the path
    space distributed, and the global top-k is the repo's combiner
    plan (``ops/aggregates.topk``) — the path universe never lands on
    the driver. Null event types render as '' (SQL: coalesce)."""
    from maestro_ray.ops.aggregates import bucketed_agg, topk

    if max_steps < 1:
        raise ValueError(f"top_paths: max_steps={max_steps}")

    def per_key(g: pa.Table) -> pa.Table:
        s = g.take(pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols]))
        col = s.column(type_col)
        # a group block can arrive with a NULL-TYPED column (all-null
        # slice; repo-documented class) — fill_null can't make a ""
        # scalar of type null
        et = ([""] * s.num_rows if pa.types.is_null(col.type)
              else pc.fill_null(col, "").to_pylist())
        return pa.table({
            "path": pa.array([sep.join(et[:max_steps])], pa.string())})

    paths = ds.groupby(key).map_groups(per_key, batch_format="pyarrow")
    counts = bucketed_agg(paths, ["path"],
                          [(None, "count_all", "n_keys")])
    out = topk(counts, "n_keys", k, descending=True,
               tie_break=["path"])
    if out.empty:  # schema-lost empty collection (repo-documented)
        return pd.DataFrame({"path": pd.Series([], dtype="object"),
                             "n_keys": pd.Series([], dtype="int64")})
    out["n_keys"] = out["n_keys"].astype("int64")
    return out[["path", "n_keys"]].reset_index(drop=True)


def histogram2d(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    x_width: float,
    y_width: float,
) -> pd.DataFrame:
    """2-D histogram (heatmap counts): rows bucketed by
    (floor(x/x_width), floor(y/y_width)), one count per non-empty
    cell. The joint-distribution / co-occurrence-density shape the 1-D
    ``histogram`` cannot express. Per-batch floor-divide is one Arrow
    kernel; the cell count rides ``bucketed_agg``, so the cell space
    stays distributed until the O(cells) driver collect. Rows with a
    null in either column are excluded. Returns (x_bin, y_bin, n)
    with bin = lower cell edge, sorted."""
    from maestro_ray.ops.aggregates import bucketed_agg

    if x_width <= 0 or y_width <= 0:
        raise ValueError(
            f"histogram2d: widths must be positive "
            f"({x_width}, {y_width})")

    def cells(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(x_col)),
                     pc.is_valid(t.column(y_col)))
        t = t.filter(ok)
        x = t.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "x_bin": pa.array(np.floor(x / x_width) * x_width,
                              pa.float64()),
            "y_bin": pa.array(np.floor(y / y_width) * y_width,
                              pa.float64())})

    out = bucketed_agg(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["x_bin", "y_bin"], [(None, "count_all", "n")]).to_pandas()
    if out.empty:
        return pd.DataFrame({"x_bin": pd.Series([], dtype="float64"),
                             "y_bin": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["x_bin", "y_bin"]).reset_index(drop=True)


def cusum(
    ds: rd.Dataset,
    key: str,
    order_cols: list[str],
    value_col: str,
    drift: int,
    threshold: int,
    out: str = "cusum",
) -> rd.Dataset:
    """One-sided CUSUM change detection per ``key``: S_i = max(0,
    S_{i-1} + (x_i − drift)), alarm when S crosses ``threshold`` — the
    classic sequential drift monitor.

    Cross-engine exactness contract (the moving_corr rule): with an
    INTEGER value column the recursion folds exactly, and we evaluate
    it NON-recursively via the prefix-sum identity ``S_i = P_i −
    min(0, min_{j≤i} P_j)`` (P = running sum of x − drift) — pure
    cumsum + running min, vectorized per group, mathematically equal
    to the recursion on exact integers. The SQL twin spells the same
    identity with two UNBOUNDED-PRECEDING window frames (no recursive
    CTE needed). Null values are rejected loudly — a gap in a
    monitored series needs an explicit upstream policy (fill or
    filter), silently skipping would shift every subsequent S."""
    sort_keys = [(c, "ascending") for c in order_cols]

    def per_key(g: pa.Table) -> pa.Table:
        if g.column(value_col).null_count:
            raise ValueError(
                f"cusum: null {value_col!r} values — fill or filter "
                "upstream (a silent skip would shift every later S)")
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        v = s.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = np.cumsum(v - np.int64(drift))
        m = np.minimum(np.minimum.accumulate(p), 0)
        cus = p - m
        s = s.append_column(out, pa.array(cus, pa.int64()))
        return s.append_column(
            "alarm", pa.array(cus > np.int64(threshold)))

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def _pareto_mask_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D maxima (Pareto frontier) of (x, y):
    a point is dominated iff another point is ≥ in both coordinates and
    > in at least one. O(n log n): sort by (x desc, y desc), then a
    point is dominated iff the max y among STRICTLY larger x reaches
    its y, or a same-x point has strictly larger y. Duplicate points
    never dominate each other (both kept when on the frontier)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    o = np.lexsort((-y, -x))
    xs, ys = x[o], y[o]
    new_run = np.concatenate(([True], xs[1:] != xs[:-1]))
    run_id = np.cumsum(new_run) - 1
    run_max_y = ys[new_run][run_id]  # first of run = max y at that x
    prefmax = np.maximum.accumulate(ys)
    run_first = np.flatnonzero(new_run)
    prev_last = run_first - 1  # last index of the previous run
    m1_per_run = np.where(prev_last >= 0, prefmax[np.maximum(prev_last, 0)],
                          -np.inf)
    m1 = m1_per_run[run_id]
    dominated = (m1 >= ys) | (run_max_y > ys)
    mask = np.empty(n, dtype=bool)
    mask[o] = ~dominated
    return mask


def skyline_2d(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    max_frontier: int = 1_000_000,
) -> pd.DataFrame:
    """2-D skyline (Pareto maxima) of two numeric columns — the
    classic multi-criteria shortlist. Distributed shape: each batch
    keeps only its LOCAL frontier (dominance is transitive, so a
    locally dominated point is globally dominated — sound pruning),
    then one final frontier pass over the collected local frontiers on
    the driver, behind the repo's standard loud ``max_frontier`` guard
    (worst case — e.g. perfectly anti-correlated coordinates — the
    frontier IS the dataset, and no algorithm can shrink it). Null AND
    NaN coordinates are dropped: one NaN poisons the running max in
    the mask (every later point escapes domination — review r4 s6 #4),
    and a point with an undefined coordinate has no place in a
    dominance order. Returns (x, y) sorted."""
    def local(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(x_col)),
                     pc.is_valid(t.column(y_col)))
        t = t.filter(ok)
        x = t.column(x_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = t.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        finite = np.isfinite(x) & np.isfinite(y)
        x, y = x[finite], y[finite]
        t = t.filter(pa.array(finite))
        keep = _pareto_mask_2d(x, y)
        return pa.table({"x": pa.array(x[keep], pa.float64()),
                         "y": pa.array(y[keep], pa.float64())})

    cand = ds.map_batches(local, batch_format="pyarrow").materialize()
    n = cand.count()
    if n > max_frontier:
        raise RuntimeError(
            f"skyline_2d: {n} local-frontier candidates exceed the "
            f"driver bound {max_frontier} — the frontier itself is "
            "dataset-sized; pre-aggregate or bucket the coordinates")
    df = cand.to_pandas()
    if df.empty:
        return pd.DataFrame({"x": pd.Series(dtype="float64"),
                             "y": pd.Series(dtype="float64")})
    keep = _pareto_mask_2d(df["x"].to_numpy(), df["y"].to_numpy())
    out = df[keep]
    return out.sort_values(["x", "y"]).reset_index(drop=True)


def seasonal_decompose(
    ds: rd.Dataset,
    bucket_col: str,
    period: int = 24,
    window: int = 25,
    max_points: int = 2_000_000,
) -> pd.DataFrame:
    """Classical additive seasonal decomposition of a COUNT series:
    rows are bucketed on the integer ``bucket_col`` (e.g. epoch-hour),
    v = rows per bucket; trend = centered ``window``-row moving average
    (NULL where the row frame is short — edges), seasonal = per-phase
    (bucket % period) mean of the detrended series, resid = v - trend
    - seasonal.

    Exactness: v and the frame sum are exact ints, so trend is ONE
    IEEE division; the per-phase seasonal numerator is kept RATIONAL —
    Σ(window·v − frame_sum) is an exact integer — so seasonal is also
    one division, and resid is a fixed left-to-right float chain the
    SQL twin spells identically. Bit-exact, no rounding.

    Plan: ONE ``bucketed_agg`` count over buckets (rows never on the
    driver), then an O(time-buckets) driver pass behind the standard
    loud ``max_points`` bound — the series length is bounded by the
    time range, not the data volume."""
    from maestro_ray.ops.aggregates import bucketed_agg

    if window % 2 == 0 or window < 3:
        raise ValueError(f"window={window}: odd >= 3 required")
    per = bucketed_agg(ds, [bucket_col],
                       [(None, "count_all", "v")]).materialize()
    n_buckets = per.count()
    if n_buckets > max_points:
        raise RuntimeError(
            f"seasonal_decompose: {n_buckets} time buckets exceed the "
            f"driver bound {max_points}; widen the bucket")
    df = per.to_pandas()
    if df.empty:
        return pd.DataFrame({
            "bucket": pd.Series([], dtype="int64"),
            "v": pd.Series([], dtype="int64"),
            "phase": pd.Series([], dtype="int64"),
            "trend": pd.Series([], dtype="float64"),
            "seasonal": pd.Series([], dtype="float64"),
            "resid": pd.Series([], dtype="float64"),
        })
    df = df.dropna(subset=[bucket_col])
    df = df.sort_values(bucket_col, kind="stable").reset_index(drop=True)
    b = df[bucket_col].to_numpy(dtype=np.int64)
    v = df["v"].to_numpy(dtype=np.int64)
    n, half = len(v), window // 2
    csum = np.concatenate(([0], np.cumsum(v)))
    sw = np.full(n, -1, dtype=np.int64)  # frame sum; -1 = short frame
    if n >= window:
        sw[half:n - half] = csum[window:] - csum[:-window]
    valid = sw >= 0
    phase = b % period
    # per-phase rational numerator Σ(window·v − sw): exact int
    num = np.zeros(period, dtype=np.int64)
    cnt = np.zeros(period, dtype=np.int64)
    np.add.at(num, phase[valid], window * v[valid] - sw[valid])
    np.add.at(cnt, phase[valid], 1)
    has_season = cnt > 0
    seasonal_by_phase = np.full(period, np.nan)
    seasonal_by_phase[has_season] = (
        num[has_season].astype(np.float64) / (cnt[has_season] * window))
    trend = np.where(valid, sw.astype(np.float64) / window, np.nan)
    seasonal = seasonal_by_phase[phase]
    # fixed order (v - trend) - seasonal, mirrored by the SQL twin
    resid = v - trend - seasonal
    return pd.DataFrame({
        "bucket": b, "v": v, "phase": phase,
        "trend": trend, "seasonal": seasonal, "resid": resid,
    })


def merge_intervals(
    ds: rd.Dataset,
    key: str,
    start_col: str,
    end_col: str,
) -> rd.Dataset:
    """Gaps-and-islands interval merge per ``key``: overlapping or
    touching intervals (next.start ≤ running max end) coalesce into
    islands; returns one row per island (key, island, start, end, n)
    with 1-based island ids in start order. The calendar/maintenance-
    window/session-coverage shape.

    Per group (one grouped shuffle): sort by (start, end), a new island
    opens iff start > cummax of all PRIOR ends — pure vectorized
    cumulative max + cumsum, then ``np.*.reduceat`` per island. Exact
    on integer bounds (timestamps); null bounds are rejected loudly
    (an open interval needs an explicit upstream policy)."""
    sort_keys = [(start_col, "ascending"), (end_col, "ascending")]

    def per_key(g: pa.Table) -> pa.Table:
        if (g.column(start_col).null_count
                or g.column(end_col).null_count):
            raise ValueError(
                "merge_intervals: null interval bounds — fill or filter "
                "upstream")
        s_t = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        s = s_t.column(start_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e = s_t.column(end_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cmax = np.maximum.accumulate(e)
        prev_max = np.concatenate(([np.iinfo(np.int64).min], cmax[:-1]))
        brk = s > prev_max
        brk[0] = True
        island = np.cumsum(brk)
        starts_idx = np.flatnonzero(brk)
        island_start = s[starts_idx]
        island_end = np.maximum.reduceat(e, starts_idx)
        counts = np.diff(np.concatenate((starts_idx, [len(s)])))
        kv = s_t.column(key)[0]
        return pa.table({
            key: pa.array([kv.as_py()] * len(starts_idx),
                          s_t.schema.field(key).type),
            "island": pa.array(island[starts_idx], pa.int64()),
            "start_ts": pa.array(island_start, pa.int64()),
            "end_ts": pa.array(island_end, pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def peak_concurrency(
    ds: rd.Dataset,
    key: str,
    start_col: str,
    end_col: str,
) -> rd.Dataset:
    """Peak concurrent intervals per ``key`` — the max-parallel-sessions
    / room-occupancy shape: sweep the interval endpoints, +1 at each
    start, −1 at each end, peak = max running sum.

    Half-open [s, e) semantics pinned cross-engine: at an equal
    timestamp the END fires BEFORE the start (sort by (t, delta) with
    delta ∈ {−1, +1}), so back-to-back intervals never double-count.
    One grouped shuffle; per group the sweep is one argsort + cumsum
    over 2·n int64 points. Exact integers; null bounds rejected loudly
    (the merge_intervals policy). Returns (key, peak, n_intervals)."""

    def per_key(g: pa.Table) -> pa.Table:
        if (g.column(start_col).null_count
                or g.column(end_col).null_count):
            raise ValueError(
                "peak_concurrency: null interval bounds — fill or "
                "filter upstream")
        s = g.column(start_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        e = g.column(end_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = np.concatenate((s, e))
        d = np.concatenate((np.ones(len(s), np.int64),
                            -np.ones(len(e), np.int64)))
        order = np.lexsort((d, t))  # ends (-1) before starts (+1)
        peak = int(np.cumsum(d[order]).max()) if len(t) else 0
        kv = g.column(key)[0]
        return pa.table({
            key: pa.array([kv.as_py()], g.schema.field(key).type),
            "peak": pa.array([peak], pa.int64()),
            "n_intervals": pa.array([len(s)], pa.int64()),
        })

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def mutual_information(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int = 100_000,
) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns —
    the dependence strength companion to the chi² key: I(X;Y) =
    Σ p(x,y)·ln(p(x,y)·n / (n_x·n_y)).

    Every input to the formula is an EXACT integer count from one
    bucketed (x, y) cell aggregate; marginals fold from the cells on
    the driver (O(cells), guarded by ``max_cells``). Rows with a null
    in either column are excluded (the SQL inner-count convention).
    The cell sum accumulates in float — callers compare rounded (the
    cross-engine reduction policy). Returns one row (mi, n)."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(x_col)),
                     pc.is_valid(t.column(y_col)))
        return t.select([x_col, y_col]).filter(ok)

    cells = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [x_col, y_col], [(None, "count_all", "n")]).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"mutual_information: {len(cells)} cells exceeds "
            f"max_cells={max_cells} — bucket the columns upstream")
    if cells.empty:
        return pd.DataFrame({"mi": pd.Series([0.0], dtype="float64"),
                             "n": pd.Series([0], dtype="int64")})
    n = int(cells["n"].sum())
    nx = cells.groupby(x_col)["n"].transform("sum").to_numpy(np.float64)
    ny = cells.groupby(y_col)["n"].transform("sum").to_numpy(np.float64)
    nxy = cells["n"].to_numpy(np.float64)
    mi = float(np.sum((nxy / n) * np.log(nxy * n / (nx * ny))))
    return pd.DataFrame({"mi": pd.Series([round(mi, 6)], dtype="float64"),
                         "n": pd.Series([n], dtype="int64")})


def item_similarity_cosine(
    ds: rd.Dataset,
    basket_col: str,
    item_col: str,
    k: int = 20,
    min_support: int = 2,
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Item-item collaborative-filtering similarity: cosine over the
    binary basket-membership vectors — cos(a, b) = support(a, b) /
    sqrt(deg(a)·deg(b)) with deg = distinct baskets containing the
    item. The 'customers who bought X also bought Y' recommender core.

    Plan: the shared distinct (basket, item) relation feeds BOTH the
    pair-support exchange (``cooccurrence_pairs`` internals) and a
    bucketed per-item degree count; degrees re-attach to the pair
    table via two bucketed hash joins (item space can be corpus-sized
    — never driver-collected); cosine is one vectorized per-row
    expression (exact-int inputs → a fixed IEEE expression tree,
    bit-reproducible vs the SQL twin). Returns the global top-``k``
    pairs by (cosine desc, p1, p2)."""
    from maestro_ray.ops.joins import hash_join

    distinct = _distinct_basket_items(ds, basket_col, item_col,
                                      n_buckets)
    empty = pd.DataFrame({
        "p1": pd.Series([], dtype="int64"),
        "p2": pd.Series([], dtype="int64"),
        "support": pd.Series([], dtype="int64"),
        "cosine": pd.Series([], dtype="float64")})
    from maestro_ray.ops.partition import compact_blocks

    distinct = compact_blocks(distinct.materialize())
    pairs = compact_blocks(_pair_counts(
        distinct, basket_col, item_col, min_support,
        n_buckets).materialize())
    if pairs.count() == 0:
        # empty filtered Datasets lose their schema → hash_join would
        # crash; the typed empty frame is the answer anyway
        return empty
    from maestro_ray.ops.aggregates import bucketed_agg
    deg = bucketed_agg(distinct, [item_col],
                       [(None, "count_all", "deg")],
                       n_buckets=n_buckets)

    def as_side(t: pa.Table, name: str) -> pa.Table:
        return pa.table({name: t.column(item_col),
                         f"deg_{name}": t.column("deg")})

    deg1 = deg.map_batches(lambda t: as_side(t, "p1"),
                           batch_format="pyarrow")
    deg2 = deg.map_batches(lambda t: as_side(t, "p2"),
                           batch_format="pyarrow")
    joined = hash_join(hash_join(pairs, deg1, "p1",
                                 num_buckets=n_buckets),
                       deg2, "p2", num_buckets=n_buckets)

    def score(t: pa.Table) -> pa.Table:
        sup = t.column("support").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d1 = t.column("deg_p1").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d2 = t.column("deg_p2").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cos = sup / np.sqrt((d1 * d2).astype(np.float64))
        return pa.table({
            "p1": t.column("p1"), "p2": t.column("p2"),
            "support": t.column("support"),
            "cosine": pa.array(cos, pa.float64()),
        })

    from maestro_ray.ops.aggregates import topk
    out = topk(joined.map_batches(score, batch_format="pyarrow"),
               "cosine", k, descending=True, tie_break=["p1", "p2"])
    if out.empty:
        return empty
    out["support"] = out["support"].astype("int64")
    return out.reset_index(drop=True)


def kaplan_meier(
    ds: rd.Dataset,
    duration_col: str,
    observed_col: str,
    max_times: int = 100_000,
) -> pd.DataFrame:
    """Kaplan–Meier survival curve over (duration, observed) rows:
    S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with dᵢ = events at tᵢ and nᵢ =
    subjects still at risk (duration ≥ tᵢ — censored subjects AT tᵢ
    count, the deaths-before-censors convention).

    One bucketed (duration, observed) count exchange; the curve folds
    on the driver over O(distinct durations) rows (guarded by
    ``max_times`` — bucket durations upstream at scale). dᵢ and nᵢ
    are exact integers; the survival product is a left-to-right
    cumprod over ascending event times — the same frame order as the
    SQL ``product() OVER`` twin, compared rounded. Null durations /
    flags are excluded. Returns (t, n_risk, n_event, survival) at
    event times only (censor-only times contribute factor 1)."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(duration_col)),
                     pc.is_valid(t.column(observed_col)))
        return t.select([duration_col, observed_col]).filter(ok)

    cells = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [duration_col, observed_col],
        [(None, "count_all", "c")]).to_pandas()
    if len(cells) > max_times:
        raise ValueError(
            f"kaplan_meier: {len(cells)} distinct (duration, observed) "
            f"cells exceeds max_times={max_times} — bucket durations "
            "upstream")
    if cells.empty:
        return pd.DataFrame({
            "t": pd.Series([], dtype="int64"),
            "n_risk": pd.Series([], dtype="int64"),
            "n_event": pd.Series([], dtype="int64"),
            "survival": pd.Series([], dtype="float64")})
    obs = cells[observed_col].astype(bool)
    g = (cells.assign(ev=cells["c"].where(obs, 0))
         .groupby(duration_col)
         .agg(n_event=("ev", "sum"), c_all=("c", "sum"))
         .reset_index())
    g["n_event"] = g["n_event"].astype("int64")
    g = g.sort_values(duration_col).reset_index(drop=True)
    total = int(g["c_all"].sum())
    left = total - g["c_all"].cumsum().shift(fill_value=0)
    g["n_risk"] = left.astype("int64")
    g = g[g["n_event"] > 0].reset_index(drop=True)
    surv = np.cumprod(1.0 - g["n_event"].to_numpy(np.float64)
                      / g["n_risk"].to_numpy(np.float64))
    return pd.DataFrame({
        "t": g[duration_col].astype("int64"),
        "n_risk": g["n_risk"],
        "n_event": g["n_event"],
        "survival": pd.Series(np.round(surv, 6), dtype="float64")})


def _two_sample_cells(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    g1: str,
    g2: str,
    max_distinct: int,
    caller: str,
) -> pd.DataFrame:
    """Shared two-sample rank backbone: one bucketed per-distinct-value
    aggregate producing (value, c1, c2) counts for the two cohorts,
    sorted by value on the driver (O(distinct values), guarded). Both
    the KS statistic and the Mann–Whitney U are pure functions of this
    tiny table — the full value stream never leaves the cluster."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def prep(t: pa.Table) -> pa.Table:
        g = t.column(group_col)
        v = t.column(value_col)
        keep = pc.and_(
            pc.is_valid(v),
            pc.or_(pc.equal(g, g1), pc.equal(g, g2)))
        t = pa.table({"v": v, "g": g}).filter(keep)
        is1 = pc.equal(t.column("g"), g1)
        vv = t.column("v")
        if pa.types.is_floating(vv.type):
            # Arrow hash-aggregation keys are BITWISE: −0.0 and +0.0
            # would land in different cells while SQL GROUP BY (and
            # rank math) treats them equal — normalize (x + 0.0)
            vv = pc.add(vv, 0.0)
        return pa.table({
            "v": vv,
            "i1": pc.cast(is1, pa.int64()),
            "i2": pc.cast(pc.invert(is1), pa.int64()),
        })

    cells = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["v"], [("i1", "sum", "c1"), ("i2", "sum", "c2")]).to_pandas()
    if len(cells) > max_distinct:
        raise ValueError(
            f"{caller}: {len(cells)} distinct values exceeds "
            f"max_distinct={max_distinct} — bucket the value column "
            "upstream or use quantile_sketch-based comparisons")
    if cells.empty:
        return pd.DataFrame({
            "v": pd.Series([], dtype="float64"),
            "c1": pd.Series([], dtype="int64"),
            "c2": pd.Series([], dtype="int64")})
    cells["c1"] = cells["c1"].astype("int64")
    cells["c2"] = cells["c2"].astype("int64")
    return cells.sort_values("v").reset_index(drop=True)


def ks_two_sample(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    g1: str,
    g2: str,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = sup |F1(v) − F2(v)|
    between the ``g1`` and ``g2`` cohorts of ``value_col``.

    Exact and bit-reproducible vs SQL: the ECDFs are evaluated only at
    distinct observed values, from exact integer cumulative counts;
    each candidate is the single expression |r1/n1 − r2/n2| (two exact
    divisions, one subtraction) and the max over candidates is
    order-independent — no float accumulation, no rounding. Nulls and
    other cohorts are excluded upstream. Returns one row (d, n1, n2)."""
    cells = _two_sample_cells(ds, group_col, value_col, g1, g2,
                              max_distinct, "ks_two_sample")
    n1 = int(cells["c1"].sum())
    n2 = int(cells["c2"].sum())
    if n1 == 0 or n2 == 0:
        raise ValueError(
            f"ks_two_sample: empty cohort (n1={n1}, n2={n2})")
    r1 = cells["c1"].cumsum().to_numpy(np.float64)
    r2 = cells["c2"].cumsum().to_numpy(np.float64)
    d = float(np.max(np.abs(r1 / n1 - r2 / n2)))
    return pd.DataFrame({
        "d": pd.Series([d], dtype="float64"),
        "n1": pd.Series([n1], dtype="int64"),
        "n2": pd.Series([n2], dtype="int64")})


def mann_whitney_u(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    g1: str,
    g2: str,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Mann–Whitney U (rank-sum) test with the normal approximation
    and tie correction — the nonparametric ab_test companion.

    Exactness strategy: with per-distinct-value counts c1, c2 and
    t = c1 + c2, the tied-average rank of value v is
    cum_before + (t + 1)/2, so 2·R1 = Σ c1·(2·cum_before + t + 1) is
    an INTEGER — summed exactly (no float accumulation). U1 then
    equals R1 − n1(n1+1)/2 (the wins-plus-half-ties count for the g1
    sample; a multiple of 0.5, exactly representable). The tie term
    T = Σ(t³ − t) is an exact integer
    (HUGEINT in the SQL twin). z is one fixed IEEE expression of those
    integers, identical across engines:

        z = (u1 − n1·n2/2) / sqrt(n1·n2/12 · ((n+1) − T/(n(n−1))))

    Returns one row (u1, z, n1, n2); z = 0 when the variance is 0
    (all values tied)."""
    cells = _two_sample_cells(ds, group_col, value_col, g1, g2,
                              max_distinct, "mann_whitney_u")
    n1 = int(cells["c1"].sum())
    n2 = int(cells["c2"].sum())
    if n1 == 0 or n2 == 0:
        raise ValueError(
            f"mann_whitney_u: empty cohort (n1={n1}, n2={n2})")
    n = n1 + n2
    c1 = cells["c1"].to_numpy(np.int64)
    t = (cells["c1"] + cells["c2"]).to_numpy(np.int64)
    cum_before = np.concatenate(([0], np.cumsum(t)[:-1]))
    r1x2 = int(np.sum(c1 * (2 * cum_before + t + 1)))
    tie_term = int(np.sum(t * t * t - t))  # Python-int exact fold
    u1 = r1x2 / 2.0 - n1 * (n1 + 1) / 2.0
    var = n1 * n2 / 12.0 * ((n + 1)
                            - float(tie_term) / float(n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / np.sqrt(var) if var > 0 else 0.0
    return pd.DataFrame({
        "u1": pd.Series([u1], dtype="float64"),
        "z": pd.Series([float(z)], dtype="float64"),
        "n1": pd.Series([n1], dtype="int64"),
        "n2": pd.Series([n2], dtype="int64")})


def cramers_v(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    max_cells: int = 100_000,
) -> pd.DataFrame:
    """Cramér's V association strength between two categorical
    columns — the normalized-to-[0,1] companion of the chi² key:
    V = sqrt(χ² / (n · (min(r, c) − 1))).

    Observed counts come from one bucketed (x, y) cell aggregate
    (exact integers); expected counts and per-cell contributions are
    the chi² algebra on the driver (O(cells), guarded). χ² is a SUM
    over cells — order-dependent in float — so chi2 and v follow the
    6dp cross-engine rounding policy (unlike the per-cell chi² key,
    which needs none). Null rows excluded. One row (chi2, v, dof, n)."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t.column(x_col)),
                     pc.is_valid(t.column(y_col)))
        return t.select([x_col, y_col]).filter(ok)

    cells = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [x_col, y_col], [(None, "count_all", "o")]).to_pandas()
    if len(cells) > max_cells:
        raise ValueError(
            f"cramers_v: {len(cells)} cells exceeds "
            f"max_cells={max_cells} — bucket the columns upstream")
    if cells.empty:
        return pd.DataFrame({
            "chi2": pd.Series([0.0], dtype="float64"),
            "v": pd.Series([0.0], dtype="float64"),
            "dof": pd.Series([0], dtype="int64"),
            "n": pd.Series([0], dtype="int64")})
    n = int(cells["o"].sum())
    rt = cells.groupby(x_col)["o"].transform("sum").to_numpy(np.float64)
    ct = cells.groupby(y_col)["o"].transform("sum").to_numpy(np.float64)
    o = cells["o"].to_numpy(np.float64)
    e = rt * ct / n
    # zero cells (absent from the observed list) contribute (0−e)²/e
    # = e each; Σe over ALL r×c cells is exactly n, so their total is
    # n − Σe(observed) — no materialization of the full grid needed
    chi2 = float(np.sum((o - e) * (o - e) / e) + (n - float(np.sum(e))))
    r = cells[x_col].nunique()
    c = cells[y_col].nunique()
    dof = (r - 1) * (c - 1)
    mind = min(r, c) - 1
    v = float(np.sqrt(chi2 / (n * mind))) if mind > 0 else 0.0
    return pd.DataFrame({
        "chi2": pd.Series([round(chi2, 6)], dtype="float64"),
        "v": pd.Series([round(v, 6)], dtype="float64"),
        "dof": pd.Series([dof], dtype="int64"),
        "n": pd.Series([n], dtype="int64")})


_DAY_US = 86_400_000_000


def active_users(
    ds: rd.Dataset,
    user_col: str,
    ts_col: str,
    window: int = 7,
) -> pd.DataFrame:
    """DAU / trailing-WAU / stickiness per day — the product-analytics
    headline triple: dau(d) = distinct users active on d, wau(d) =
    distinct users active in [d − window + 1, d], stickiness = dau/wau.

    Plan, all distributed until the tiny per-day tables: ONE bucketed
    distinct over (user, day) pairs; dau is a count over those pairs;
    wau comes from a ×window vectorized day-expansion of the SAME
    distinct pairs (each (u, d) covers windows ending d..d+window−1)
    re-deduped with a second bucketed distinct — churn-proportional,
    never COUNT(DISTINCT) over a quadratic window join. Exact
    integers; stickiness is one exact division. Rows = days with
    activity (inner join), sorted by day."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        keep = pc.and_(pc.is_valid(ts), pc.is_valid(t.column(user_col)))
        return pa.table({
            user_col: t.column(user_col),
            # pin us resolution: ns inputs (from_pandas) would break
            # the int64-microsecond day arithmetic below
            "day": pc.cast(pc.floor_temporal(ts, unit="day"),
                           pa.timestamp("us")),
        }).filter(keep)

    pairs = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        [user_col, "day"], [(None, "count_all", "_c")])
    pairs = pairs.map_batches(
        lambda t: t.select([user_col, "day"]), batch_format="pyarrow")
    pairs = pairs.materialize()  # feeds BOTH dau and the expansion
    dau = bucketed_agg(pairs, ["day"],
                       [(None, "count_all", "dau")]).to_pandas()

    def expand(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("day"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        w = (np.repeat(us, window)
             + np.tile(np.arange(window, dtype=np.int64) * _DAY_US,
                       len(us)))
        return pa.table({
            user_col: pa.array(np.repeat(u, window),
                               t.schema.field(user_col).type),
            "wday": pc.cast(pa.array(w, pa.int64()),
                            pa.timestamp("us")),
        })

    wpairs = bucketed_agg(
        pairs.map_batches(expand, batch_format="pyarrow"),
        [user_col, "wday"], [(None, "count_all", "_c")])
    wau = bucketed_agg(
        wpairs.map_batches(lambda t: t.select([user_col, "wday"]),
                           batch_format="pyarrow"),
        ["wday"], [(None, "count_all", "wau")]).to_pandas()
    if dau.empty:
        return pd.DataFrame({
            "day": pd.Series([], dtype="datetime64[us]"),
            "dau": pd.Series([], dtype="int64"),
            "wau": pd.Series([], dtype="int64"),
            "stickiness": pd.Series([], dtype="float64")})
    out = dau.merge(wau, left_on="day", right_on="wday", how="inner")
    out["dau"] = out["dau"].astype("int64")
    out["wau"] = out["wau"].astype("int64")
    out["stickiness"] = (out["dau"].to_numpy(np.float64)
                         / out["wau"].to_numpy(np.float64))
    return out[["day", "dau", "wau", "stickiness"]] \
        .sort_values("day").reset_index(drop=True)


def lagged_corr(
    ds: rd.Dataset,
    ts_col: str,
    type_col: str,
    t1: str,
    t2: str,
    max_lag: int = 7,
    max_days: int = 200_000,
) -> pd.DataFrame:
    """Cross-correlation of two event-type daily-count series at lags
    0..max_lag: corr(x(d), y(d + lag)) over the zero-filled calendar
    grid [min day, max day] — the lead/lag-discovery query ("do clicks
    predict purchases k days later?").

    One masked grouped pass builds the per-day count pair (exact
    integers, guarded driver table of O(days)); every per-lag moment
    (Σx, Σy, Σxy, Σx², Σy²) folds in exact Python ints, and corr is
    the single IEEE expression num / sqrt(varx · vary) with each exact
    integer converted to double once — bit-identical across engines,
    no rounding (the moving_corr exactness argument). corr = 0 when a
    variance vanishes. Returns (lag, n, corr) for each lag."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def prep(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        ty = t.column(type_col)
        keep = pc.and_(pc.is_valid(ts),
                       pc.or_(pc.equal(ty, t1), pc.equal(ty, t2)))
        f = pa.table({"day": pc.cast(pc.floor_temporal(ts, unit="day"),
                                     pa.timestamp("us")),
                      "ty": ty}).filter(keep)
        is1 = pc.equal(f.column("ty"), t1)
        return pa.table({
            "day": f.column("day"),
            "i1": pc.cast(is1, pa.int64()),
            "i2": pc.cast(pc.invert(is1), pa.int64()),
        })

    g = bucketed_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["day"], [("i1", "sum", "c1"), ("i2", "sum", "c2")]).to_pandas()
    if len(g) > max_days:
        raise ValueError(
            f"lagged_corr: {len(g)} distinct days exceeds "
            f"max_days={max_days}")
    if g.empty:
        return pd.DataFrame({
            "lag": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "corr": pd.Series([], dtype="float64")})
    us = g["day"].astype("int64").to_numpy()
    dmin, dmax = int(us.min()), int(us.max())
    n_days = (dmax - dmin) // _DAY_US + 1
    x = np.zeros(n_days, dtype=np.int64)
    y = np.zeros(n_days, dtype=np.int64)
    idx = (us - dmin) // _DAY_US
    x[idx] = g["c1"].to_numpy(np.int64)
    y[idx] = g["c2"].to_numpy(np.int64)
    rows = []
    for lag in range(max_lag + 1):
        n = n_days - lag
        if n <= 1:
            rows.append((lag, max(n, 0), 0.0))
            continue
        a = [int(v) for v in x[:n]]
        b = [int(v) for v in y[lag:]]
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sx2 = sum(p * p for p in a)
        sy2 = sum(q * q for q in b)
        num = n * sxy - sx * sy
        va = n * sx2 - sx * sx
        vb = n * sy2 - sy * sy
        corr = (float(num) / np.sqrt(float(va) * float(vb))
                if va > 0 and vb > 0 else 0.0)
        rows.append((lag, n, float(corr)))
    return pd.DataFrame({
        "lag": pd.Series([r[0] for r in rows], dtype="int64"),
        "n": pd.Series([r[1] for r in rows], dtype="int64"),
        "corr": pd.Series([r[2] for r in rows], dtype="float64")})



def cliffs_delta(
    ds: rd.Dataset,
    group_col: str,
    value_col: str,
    g1: str,
    g2: str,
    max_distinct: int = 2_000_000,
) -> pd.DataFrame:
    """Cliff's delta ordinal effect size between the ``g1`` and ``g2``
    cohorts: δ = (#{x>y} − #{x<y}) / (n1·n2) over all cross pairs —
    the magnitude companion to ``mann_whitney_u``'s significance (same
    backbone, same scale story).

    Exact: from the shared per-distinct-value (c1, c2) cells,
    #{x>y} = Σ_v c1(v)·cum2(<v) and #{x<y} = Σ_v c1(v)·(n2−cum2(≤v))
    fold as exact int64 (every partial is ≤ n1·n2, which a loud guard
    bounds below 2^53 — that ALSO keeps the final division's operands
    exactly representable, so δ is bit-exact vs the window-SQL twin
    with no rounding; cohort pairs past 2^53 ≈ 9e15 would need a
    rational output instead). The value stream never leaves the
    cluster (O(distinct) driver rows behind the loud bound). Returns
    one row (n1, n2, n_gt, n_lt, delta)."""
    cells = _two_sample_cells(ds, group_col, value_col, g1, g2,
                              max_distinct, "cliffs_delta")
    n1 = int(cells["c1"].sum())
    n2 = int(cells["c2"].sum())
    if n1 == 0 or n2 == 0:
        raise ValueError(f"cliffs_delta: empty cohort (n1={n1}, "
                         f"n2={n2})")
    if n1 * n2 >= (1 << 53):  # Python ints — checked before any numpy
        raise ValueError(
            f"cliffs_delta: n1*n2 = {n1 * n2:,} pairs >= 2^53 — the "
            "int64 pair-count fold and the exact float division both "
            "need the bound; subsample the cohorts")
    c1 = cells["c1"].to_numpy(np.int64)
    c2 = cells["c2"].to_numpy(np.int64)
    cum2_incl = np.cumsum(c2)
    cum2_before = cum2_incl - c2
    n_gt = int(np.sum(c1 * cum2_before))
    n_lt = int(np.sum(c1 * (n2 - cum2_incl)))
    delta = (n_gt - n_lt) / (n1 * n2)
    return pd.DataFrame({
        "n1": pd.Series([n1], dtype="int64"),
        "n2": pd.Series([n2], dtype="int64"),
        "n_gt": pd.Series([n_gt], dtype="int64"),
        "n_lt": pd.Series([n_lt], dtype="int64"),
        "delta": pd.Series([delta], dtype="float64"),
    })


def hill_tail(
    ds: rd.Dataset,
    value_col: str,
    k: int = 200,
) -> pd.DataFrame:
    """Hill estimator of the Pareto tail index over the top order
    statistics: α̂ = k / Σ_{i=1..k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎) with x₍₁₎ ≥ …
    descending — the standard heavy-tail diagnostic for web-scale
    degree / frequency / size distributions (finite mean iff α > 1,
    finite variance iff α > 2).

    Plan: the existing local-combiner exact top-(k+1) (one bounded
    exchange, O(k) driver rows); values must be positive (the ratio's
    log), non-positive values in the top-k fail loudly. The Σ ln fold
    is order-sensitive float → alpha reported at 6dp (the anova
    policy); ties at the threshold are fine (their ln ratio is 0
    either way). Returns one row (k, x_k1, alpha)."""
    from maestro_ray.ops.aggregates import topk

    if k < 1:
        raise ValueError(f"hill_tail: k={k}")
    top = topk(ds, value_col, k + 1, descending=True, tie_break=[])
    x = top[value_col].to_numpy(dtype=np.float64)
    if len(x) < k + 1:
        raise ValueError(
            f"hill_tail: need at least k+1={k + 1} rows, got {len(x)}")
    if np.isnan(x[: k + 1]).any():
        raise ValueError(
            "hill_tail: NaN inside the top-(k+1) window (NaN sorts "
            "last — the corpus has fewer than k+1 finite values); "
            "filter or lower k")
    if x[k] <= 0:
        raise ValueError(
            "hill_tail: non-positive values inside the top-k — the "
            "tail index needs a positive threshold; filter or shift")
    s = float(np.sum(np.log(x[:k] / x[k])))
    if s <= 0:
        raise ValueError(
            "hill_tail: degenerate top-k (all values equal) — no "
            "tail to estimate; raise k")
    return pd.DataFrame({
        "k": pd.Series([k], dtype="int64"),
        "x_k1": pd.Series([float(x[k])], dtype="float64"),
        "alpha": pd.Series([round(k / s, 6)], dtype="float64"),
    })


def state_durations(
    ds: rd.Dataset,
    key: str,
    state_col: str,
    order_cols: list[str],
    ts_col: str,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Time-in-state: for each entity, total dwell time per state —
    each event opens its state until the entity's NEXT event (the last
    event of an entity contributes nothing; its closing edge is
    unobserved). The per-state-occupancy companion to ``sessionize`` /
    ``sequence_gaps``.

    Plan: one grouped shuffle; per entity a vectorized sort + shifted
    timestamp difference (no Python row loop), then ONE bucketed
    (state) sum over the per-entity partials. Durations are exact
    int64 microseconds (timestamp subtraction) — bit-exact vs a
    lead()-window SQL twin, no rounding. Rows with a null state or
    timestamp are excluded up front (mirror in the twin: exclusion
    changes which event is 'next'). Returns (state, total_us,
    n_intervals) sorted by state."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        cols = [key, state_col, ts_col] + [
            c for c in order_cols if c not in (key, state_col, ts_col)]
        t = t.select(cols)
        return t.filter(pc.and_(pc.is_valid(t.column(state_col)),
                                pc.is_valid(t.column(ts_col))))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        us = g[ts_col].astype("int64").to_numpy()
        if len(us) < 2:
            return pd.DataFrame({"state": pd.Series(dtype="object"),
                                 "dur": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        dur = us[1:] - us[:-1]
        st = g[state_col].to_numpy()[:-1]
        out = pd.DataFrame({"state": st, "dur": dur})
        agg = out.groupby("state", sort=False).agg(
            dur=("dur", "sum"), n=("dur", "size")).reset_index()
        agg["dur"] = agg["dur"].astype("int64")
        agg["n"] = agg["n"].astype("int64")
        return agg

    partials = ds.map_batches(clean, batch_format="pyarrow") \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    agg = bucketed_agg(partials, "state",
                       [("dur", "sum", "total_us"),
                        ("n", "sum", "n_intervals")],
                       n_buckets=num_buckets).to_pandas()
    if agg.empty:
        return pd.DataFrame({"state": pd.Series(dtype="object"),
                             "total_us": pd.Series(dtype="int64"),
                             "n_intervals": pd.Series(dtype="int64")})
    agg["total_us"] = agg["total_us"].astype("int64")
    agg["n_intervals"] = agg["n_intervals"].astype("int64")
    return agg.sort_values("state").reset_index(drop=True)


def cohen_kappa(
    ds: rd.Dataset,
    rater_a: str,
    rater_b: str,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Cohen's κ inter-rater agreement between two categorical
    columns over the same rows: κ = (p_o − p_e)/(1 − p_e) with
    observed agreement p_o from the diagonal of the confusion counts
    and chance agreement p_e from the marginals — the
    chi2_independence family's agreement-strength companion.

    Exactness: one bucketed (a, b) cell count; p_o = diag/n is one
    exact-int division; p_e = Σ_c rowsum_c·colsum_c / n² folds
    EXACT integer products (Python ints, guarded < 2^53 before the
    one division); κ is then a fixed IEEE expression of two exact
    doubles — bit-exact cross-engine, NO rounding. Rows with a null
    on either side are excluded. Returns one row
    (n, p_o, p_e, kappa); κ null when p_e = 1 (degenerate single
    category)."""
    from maestro_ray.ops.aggregates import bucketed_agg

    def clean(t: pa.Table) -> pa.Table:
        t = t.select([rater_a, rater_b])
        return t.filter(pc.and_(pc.is_valid(t.column(rater_a)),
                                pc.is_valid(t.column(rater_b))))

    cells = bucketed_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        [rater_a, rater_b], [(None, "count_all", "__n")],
        n_buckets=num_buckets).to_pandas()
    if cells.empty:
        return pd.DataFrame({"n": pd.Series([0], dtype="int64"),
                             "p_o": pd.Series([np.nan]),
                             "p_e": pd.Series([np.nan]),
                             "kappa": pd.Series([np.nan])})
    n = int(cells["__n"].sum())
    diag = int(cells.loc[cells[rater_a] == cells[rater_b],
                         "__n"].sum())
    rows = cells.groupby(rater_a)["__n"].sum()
    colsums = cells.groupby(rater_b)["__n"].sum()
    # exact integer Σ row_c · col_c over categories present on BOTH
    # sides (absent categories contribute 0)
    se = sum(int(rows.get(c, 0)) * int(colsums.get(c, 0))
             for c in set(rows.index) | set(colsums.index))
    if se >= (1 << 53) or n * n >= (1 << 53):
        raise ValueError(
            f"cohen_kappa: marginal product sum {se:,} or n² past "
            "2^53 — the exact-division contract needs the bound")
    p_o = diag / n
    p_e = se / (n * n)
    kappa = (p_o - p_e) / (1.0 - p_e) if p_e != 1.0 else None
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "p_o": pd.Series([p_o], dtype="float64"),
        "p_e": pd.Series([p_e], dtype="float64"),
        "kappa": pd.Series([kappa], dtype="float64"),
    })
