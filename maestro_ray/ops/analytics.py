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
