"""Incremental materialized views over the CDC lake.

``maintain_group_counts`` keeps a per-group LIVE-row count (tombstones
excluded) synchronized with the lake, one small parquet per epoch under
``<lake>/_views/<group_col>/``. The delta for epoch *e* is a PARTITION
DIFF: every ``publish_epoch`` writes fresh files for exactly the
partitions it touched, so

    view(e) = view(e-1) + Σ_p∈changed [counts(file_e(p)) − counts(file_{e-1}(p))]

is correct BY CONSTRUCTION — no winner-selection logic is re-derived
here, so the view can never diverge from the merge's LWW/tombstone
semantics. Per-epoch cost is O(touched-partition bytes) over TWO narrow
columns (group + op), not O(changelog) and not O(whole lake): sparse
update epochs cost what they touched; compaction epochs (rewrites with
unchanged content) fold to a zero delta. The O(delta-rows) alternative
— emitting retraction pairs from inside the merge tasks — is the
documented extension point if per-epoch touched bytes ever dominate.

Maintenance is resumable and idempotent: the newest persisted view
epoch is the cursor; re-running catches up only the missing epochs. A
vacuum that outran maintenance fails loudly (the old side of the diff
is gone) instead of silently corrupting the view.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from maestro_ray.core.manifest import (
    VIEWS_DIR,
    Manifest,
    changed_partitions,
    list_epochs,
    manifest_at,
)


def _view_path(lake_dir: str, group_col: str, epoch: int) -> str:
    return os.path.join(lake_dir, VIEWS_DIR, group_col,
                        f"epoch-{epoch:012d}.parquet")


#: virtual-group prefix: ``hash64:<col>`` groups by the deterministic
#: 64-bit content hash of <col> instead of a stored column — the key
#: for incremental DEDUP views (fingerprint → live copies) without
#: changing the lake schema.
HASH_GROUP_PREFIX = "hash64:"


#: virtual-measure prefix: ``len:<col>`` sums utf8 lengths of <col>
#: instead of a stored numeric column — "live text bytes per group"
#: without changing the lake schema.
LEN_MEASURE_PREFIX = "len:"


#: virtual-group prefix: ``bucket:<col>:<width>`` groups by
#: floor(col / width) of an integer column — the key for incremental
#: EVENT-TIME WINDOW views (tumbling windows over e.g. ``warc_ts_us``
#: with a width in µs) with no watermark machinery needed: a late or
#: out-of-order event lands in whatever partition file its url routes
#: to, and the partition-diff algebra moves its window bucket's count
#: exactly like any other group. Floor (not truncate) division, so
#: pre-epoch negative timestamps bucket consistently.
BUCKET_GROUP_PREFIX = "bucket:"


def _spec_src(spec: str) -> str:
    """The stored column a group spec reads (identity for plain
    columns; strips the ``hash64:`` / ``bucket:<col>:<width>``
    virtual-group wrappers)."""
    if spec.startswith(HASH_GROUP_PREFIX):
        return spec[len(HASH_GROUP_PREFIX):]
    if spec.startswith(BUCKET_GROUP_PREFIX):
        return _parse_bucket_spec(spec)[0]
    return spec


def _parse_bucket_spec(spec: str) -> tuple[str, int]:
    body = spec[len(BUCKET_GROUP_PREFIX):]
    col, _, width_s = body.rpartition(":")
    if not col or not width_s.isdigit() or int(width_s) < 1:
        raise ValueError(
            f"bad bucket group spec {spec!r}: want "
            f"'bucket:<col>:<positive int width>'")
    return col, int(width_s)


def _group_key_table(t: pa.Table, group_col) -> pa.Table:
    """The grouping key column(s) for one live-filtered file table.
    ``group_col`` may be a single spec or a tuple of specs; each spec is
    a stored column name or ``hash64:<col>`` (int64 bit view of the
    deterministic content hash — see ``HASH_GROUP_PREFIX``)."""
    from maestro_ray.ops.hashing import hash_array

    specs = group_col if isinstance(group_col, tuple) else (group_col,)
    cols = {}
    for spec in specs:
        hashed = spec.startswith(HASH_GROUP_PREFIX)
        bucketed = spec.startswith(BUCKET_GROUP_PREFIX)
        src = _spec_src(spec)
        raw = (t.column(src) if src in t.column_names
               else pa.nulls(t.num_rows, pa.string()))
        if hashed:
            # int64 BIT VIEW of the uint64 hash: the view rides pandas
            # indexes and parquet columns, where raw uint64 values
            # above 2^63 would overflow the int64 conversion
            cols[spec] = pa.array(hash_array(raw).view(np.int64),
                                  pa.int64())
        elif bucketed:
            _, width = _parse_bucket_spec(spec)
            if src not in t.column_names:  # pre-evolution file
                ints = pa.nulls(t.num_rows, pa.int64())
            else:
                # raises loudly on a non-castable (e.g. string) column
                ints = pc.cast(raw, pa.int64())
            vals = ints.combine_chunks() if isinstance(
                ints, pa.ChunkedArray) else ints
            nulls = pc.is_null(vals)
            # numpy floor_divide (Arrow's divide truncates toward zero)
            buck = np.floor_divide(
                pc.fill_null(vals, 0).to_numpy(zero_copy_only=False),
                width)
            cols[spec] = pa.array(buck, pa.int64(),
                                  mask=nulls.to_numpy(
                                      zero_copy_only=False))
        else:
            cols[spec] = raw
    return pa.table(cols)


def _file_group_counts(path: str, group_col,
                       measure: str | None = None) -> dict:
    """One file's per-group live aggregate (narrow read: group + op
    [+ measure] only; tombstones excluded via the shared liveness rule,
    null group kept as its own bucket; a file predating the group
    column — pre-evolution — counts its rows in the null bucket too).

    ``measure=None`` counts live rows; ``"<col>"`` sums a stored int
    column; ``"len:<col>"`` sums utf8 lengths (nulls add 0). Any
    GROUP-ADDITIVE integer measure keeps the partition-diff algebra
    exact — the view is a signed sum of per-file aggregates.

    A ``hash64:<col>`` group counts per deterministic content hash of
    <col> (ops/hashing.hash_array — nulls hash to the fixed null
    constant), so the view key is uint64."""
    from maestro_ray.io.lake import live_mask

    specs = group_col if isinstance(group_col, tuple) else (group_col,)
    srcs = [_spec_src(s) for s in specs]
    mcol = None
    if measure is not None:
        mcol = (measure[len(LEN_MEASURE_PREFIX):]
                if measure.startswith(LEN_MEASURE_PREFIX) else measure)
    names = pq.read_schema(path).names
    cols = [c for c in dict.fromkeys(srcs) if c in names] \
        + (["op"] if "op" in names else []) \
        + ([mcol] if mcol is not None and mcol in names
           and mcol not in (*srcs, "op") else [])
    t = pq.read_table(path, columns=cols)
    t = t.filter(live_mask(t))
    if measure is None:
        mvals = None
    elif measure.startswith(LEN_MEASURE_PREFIX):
        raw = (t.column(mcol) if mcol in t.column_names
               # pre-evolution file: measure column absent → zeros
               else pa.nulls(t.num_rows, pa.string()))
        # BYTES, as documented — binary_length after a zero-copy cast
        # (utf8_length would count characters, 3× off on CJK text)
        raw = pc.binary_length(pc.cast(pc.cast(raw, pa.string()),
                                       pa.binary()))
        mvals = pc.cast(pc.fill_null(raw, 0), pa.int64())
    else:
        raw = (t.column(mcol) if mcol in t.column_names
               else pa.nulls(t.num_rows, pa.int64()))
        mvals = pc.cast(pc.fill_null(raw, 0), pa.int64())
    kt = _group_key_table(t, group_col)  # null-fills missing sources
    if mvals is None:
        g = kt.group_by(list(specs)).aggregate([([], "count_all")])
    else:
        kt = kt.append_column("__m", mvals)
        g = kt.group_by(list(specs)).aggregate([("__m", "sum")])
    vals = g.column(len(specs)).to_pylist()
    if len(specs) == 1:
        return dict(zip(g.column(0).to_pylist(), vals))
    keys = zip(*[g.column(s).to_pylist() for s in specs])
    return dict(zip(keys, vals))


_counts_task = None


def _get_counts_task():
    """Cached remote wrapper: built (and exported to the cluster) ONCE
    per session instead of re-pickled on every maintenance call; lazy
    so importing this module never touches ray.remote."""
    global _counts_task
    if _counts_task is None:
        import ray

        _counts_task = ray.remote(num_cpus=1)(_file_group_counts)
    return _counts_task


def _empty_state(group_col) -> pd.Series:
    """Typed empty view state — MultiIndexed for composite keys so
    signed add/sub alignment works from the first epoch."""
    s = pd.Series(dtype="int64")
    if isinstance(group_col, tuple):
        s.index = pd.MultiIndex.from_arrays(
            [[] for _ in group_col], names=list(group_col))
    return s


def _with_key_index(s: pd.Series, group_col) -> pd.Series:
    if isinstance(group_col, tuple):
        if len(s):
            s.index = pd.MultiIndex.from_tuples(
                list(s.index), names=list(group_col))
        else:
            return _empty_state(group_col)
    return s


def _live_group_counts(paths: list[str], group_col,
                       measure: str | None = None) -> pd.Series:
    """Per-group live-row counts over lake files. The per-file counting
    is embarrassingly parallel and only its TINY (group → n) results
    reach the driver: Ray tasks when a session exists (the queries()
    path), a thread pool otherwise (the session-less CLI — parquet
    decode releases the GIL). At true scale the extension point in the
    module docstring — merge tasks emitting count deltas with their
    lineage — removes even this re-read."""
    if not paths:
        return _empty_state(group_col)
    import ray

    if ray.is_initialized() and len(paths) > 1:
        task = _get_counts_task()
        counts = ray.get(
            [task.remote(p, group_col, measure) for p in paths])
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(paths))) as ex:
            counts = list(ex.map(
                lambda p: _file_group_counts(p, group_col, measure),
                paths))
    total: dict = {}
    for c in counts:
        for k, n in c.items():
            total[k] = total.get(k, 0) + n
    return _with_key_index(pd.Series(total, dtype="int64"), group_col)


def _changed_files(
    cur: Manifest, prev: Manifest | None
) -> tuple[list[str], list[str]]:
    """(new_files, old_files) — the two sides of the epoch's diff, from
    the shared manifest walk (core/manifest.py changed_partitions)."""
    new_files, old_files = [], []
    for _p, new, old in changed_partitions(cur, prev):
        if new is not None and new["rows"] > 0:
            new_files.append(new["file"])
        if old is not None and old["rows"] > 0:
            old_files.append(old["file"])
    return new_files, old_files


def read_view(lake_dir: str, group_col: str,
              epoch: int | None = None) -> pd.DataFrame | None:
    """The persisted view at ``epoch`` (default: newest maintained).
    Columns: (group_col, n); None if the view was never maintained."""
    vdir = os.path.join(lake_dir, VIEWS_DIR, group_col)
    if epoch is None:
        epochs = _view_epochs(vdir)
        if not epochs:
            return None
        epoch = epochs[-1]
    path = _view_path(lake_dir, group_col, epoch)
    if not os.path.exists(path):
        return None
    return pq.read_table(path).to_pandas()


def _view_epochs(vdir: str) -> list[int]:
    if not os.path.isdir(vdir):
        return []
    return sorted(
        int(n[len("epoch-"):-len(".parquet")])
        for n in os.listdir(vdir)
        if n.startswith("epoch-") and n.endswith(".parquet")
    )


def _as_frame(view: pd.Series, group_col) -> pd.DataFrame:
    keys = list(group_col) if isinstance(group_col, tuple) \
        else [group_col]
    if isinstance(group_col, tuple):
        view = _with_key_index(view, group_col)
    out = view.reset_index()
    out.columns = [*keys, "n"]
    # sort_values (not sort_index): a null group sorts as missing
    # instead of raising on None-vs-str comparison
    return out.sort_values(keys).reset_index(drop=True)


def _persist(view: pd.Series, lake_dir: str, view_id: str, group_col: str,
             epoch: int) -> None:
    vdir = os.path.join(lake_dir, VIEWS_DIR, view_id)
    os.makedirs(vdir, exist_ok=True)
    out = _as_frame(view, group_col)
    tmp = _view_path(lake_dir, view_id, epoch) + ".tmp"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
    os.replace(tmp, _view_path(lake_dir, view_id, epoch))


def _newest_readable(lake_dir: str, epochs: list[int]) -> tuple[int, Manifest]:
    """Newest epoch whose FULL file set survives on disk — the only
    sound re-bootstrap anchor after a vacuum (vacuum always keeps the
    head manifest's files)."""
    from maestro_ray.io.lake import lake_files

    for e in reversed(epochs):
        m = manifest_at(lake_dir, e)
        if all(os.path.exists(f) for f in lake_files(lake_dir, m)):
            return e, m
    raise ValueError(f"no fully-readable epoch in {lake_dir}")


def maintain_group_counts(
    lake_dir: str, group_col: str = "lang", on_vacuumed: str = "bootstrap"
) -> pd.DataFrame:
    """Catch the materialized per-group live-row count up to the lake's
    newest committed epoch (see module docstring for the plan and cost
    model). Returns the final view as (group_col, n), sorted by group.
    Idempotent: a second call with no new epochs reads the cursor and
    returns immediately.

    When a needed diff side was vacuumed before maintenance ran, the
    default (``on_vacuumed="bootstrap"``) re-anchors with ONE full count
    at the newest fully-readable epoch and diffs forward from there —
    history views below the anchor stay unmaterialized;
    ``on_vacuumed="error"`` raises instead."""
    return _maintain(lake_dir, group_col, group_col, None, on_vacuumed)


def sum_view_name(group_col: str, measure: str) -> str:
    """Filesystem identity of a grouped-SUM view (also what
    ``read_view`` takes to read it back)."""
    return f"{group_col}__sum__{measure.replace(':', '_')}"


def maintain_group_sums(
    lake_dir: str, group_col: str, measure: str,
    on_vacuumed: str = "bootstrap",
) -> pd.DataFrame:
    """Incrementally-maintained per-group live SUM over the lake —
    same partition-diff plan, cursor, and vacuum re-anchor as
    ``maintain_group_counts``, for any group-additive integer measure:
    a stored numeric column (``measure="warc_ts_us"``) or the virtual
    ``"len:<col>"`` (live utf8 BYTES of <col> per group, e.g. corpus
    text volume per language). Correct by the same algebra: sums add
    and subtract across the epoch's changed partition files.

    Semantics note: the view stores NON-ZERO sums — a group whose live
    measure sums to exactly 0 is absent (indistinguishable, by sum
    alone, from a group with no live rows; both maintenance paths
    apply the same rule, so the view is self-consistent). Track the
    count view alongside if zero-sum-but-live groups matter."""
    return _maintain(lake_dir, group_col,
                     sum_view_name(group_col, measure), measure,
                     on_vacuumed)


def distinct_view_name(group_col: str, of_col: str) -> str:
    """Filesystem identity of a grouped DISTINCT-count view."""
    return f"{group_col}__distinct__{of_col.replace(':', '_')}"


def maintain_group_distinct(
    lake_dir: str, group_col: str, of_col: str,
    on_vacuumed: str = "bootstrap", to_epoch: int | None = None,
) -> pd.DataFrame:
    """Incrementally-maintained per-group count of DISTINCT live
    ``of_col`` values (e.g. unique corpus content per language).

    Distinct counts don't add across files, so the partition-diff
    algebra runs one level down: the persisted state is the live-copy
    count per COMPOSITE key (group, hash64(of_col)) — exact under the
    same signed add/sub as every other view — and the distinct count
    is simply the number of surviving (non-zero) pairs per group. An
    update that moves a value between groups decrements one pair and
    increments another; a delete that removes the last copy drops the
    pair. State is O(live distinct pairs), the same order as the dedup
    view. Same cursor/resume/vacuum-re-anchor contract as
    ``maintain_group_counts``.

    ``to_epoch`` reads the HISTORY view at that epoch after catching
    maintenance up to head (per-epoch states are persisted)."""
    composite = (group_col, HASH_GROUP_PREFIX + of_col)
    vid = distinct_view_name(group_col, of_col)
    head_pairs = _maintain(lake_dir, composite, vid, None, on_vacuumed)
    if to_epoch is None:
        pairs = head_pairs
    else:
        pairs = read_view(lake_dir, vid, to_epoch)
        if pairs is None:
            raise ValueError(
                f"distinct view {vid!r} has no persisted epoch "
                f"{to_epoch} (a vacuum re-anchor may have skipped it)")
    out = (pairs.groupby(group_col, dropna=False).size()
           .reset_index(name="n_distinct"))
    return out.sort_values(group_col).reset_index(drop=True)


def topk_view(
    lake_dir: str, group_col: str, of_col: str, k: int = 10,
    on_vacuumed: str = "bootstrap",
) -> pd.DataFrame:
    """Top-k values per group BY LIVE COPY COUNT, served from the same
    incrementally-maintained composite (group, hash64(of_col)) state
    the distinct view uses — maintenance is shared (one cursor, one
    partition-diff walk), the top-k is a read-time reduce over the
    persisted pair counts. Returns (group, fingerprint, n, rank);
    ties break by fingerprint for determinism."""
    composite = (group_col, HASH_GROUP_PREFIX + of_col)
    vid = distinct_view_name(group_col, of_col)
    pairs = _maintain(lake_dir, composite, vid, None, on_vacuumed)
    fp = HASH_GROUP_PREFIX + of_col
    out = pairs.sort_values([group_col, "n", fp],
                            ascending=[True, False, True])
    out = out.groupby(group_col, dropna=False).head(k).copy()
    out["rank"] = out.groupby(group_col, dropna=False).cumcount() + 1
    out = out.rename(columns={fp: "fingerprint"})
    return out.reset_index(drop=True)


def _maintain(
    lake_dir: str, group_col, view_id: str, measure: str | None,
    on_vacuumed: str,
) -> pd.DataFrame:
    if on_vacuumed not in ("bootstrap", "error"):
        raise ValueError(f"on_vacuumed={on_vacuumed!r}")
    key_cols = list(group_col) if isinstance(group_col, tuple) \
        else [group_col]
    epochs = list_epochs(lake_dir)
    if not epochs:
        return _as_frame(_empty_state(group_col), group_col)
    vdir = os.path.join(lake_dir, VIEWS_DIR, view_id)
    done = [e for e in _view_epochs(vdir) if e in set(epochs)]
    cursor = done[-1] if done else None
    view = (read_view(lake_dir, view_id, cursor)
            .set_index(key_cols)["n"] if cursor is not None
            else _empty_state(group_col))
    prev_m = manifest_at(lake_dir, cursor) if cursor is not None else None
    pending = [x for x in epochs if cursor is None or x > cursor]
    last_anchor: int | None = None
    while pending:
        e = pending[0]
        m = manifest_at(lake_dir, e)
        new_files, old_files = _changed_files(m, prev_m)
        missing = [
            rel for rel in new_files + old_files
            if not os.path.exists(os.path.join(lake_dir, rel))
        ]
        if missing:
            if on_vacuumed == "error":
                raise ValueError(
                    f"cannot maintain view {view_id!r} through epoch "
                    f"{e}: {missing[0]} was vacuumed before maintenance "
                    "ran (pass on_vacuumed='bootstrap' to re-anchor at "
                    "the newest readable epoch)"
                )
            from maestro_ray.io.lake import lake_files

            b, mb = _newest_readable(lake_dir, epochs)
            if b == last_anchor:
                # no progress: an epoch AFTER the best re-anchor point
                # also lost files (e.g. vacuum kept a non-head manifest)
                # — loop forever without this guard, so fail loudly
                raise ValueError(
                    f"cannot maintain view {view_id!r}: epoch {e} "
                    f"references vacuumed files ({missing[0]}) and the "
                    f"newest fully-readable epoch {b} does not get past "
                    "it; the lake's history is not maintainable"
                )
            last_anchor = b
            view = _live_group_counts(lake_files(lake_dir, mb), group_col,
                                      measure)
            # same compaction rule as the incremental step — the anchor
            # and the next diff'd epoch must agree on zero-valued groups
            view = view[view != 0]
            _persist(view, lake_dir, view_id, group_col, b)
            prev_m = mb
            pending = [x for x in epochs if x > b]
            continue
        delta = (
            _live_group_counts(
                [os.path.join(lake_dir, f) for f in new_files], group_col,
                measure)
            .sub(_live_group_counts(
                [os.path.join(lake_dir, f) for f in old_files], group_col,
                measure),
                 fill_value=0)
        )
        view = view.add(delta, fill_value=0).astype("int64")
        view = view[view != 0]
        _persist(view, lake_dir, view_id, group_col, e)
        prev_m = m
        pending = pending[1:]
    # return the in-memory state — never a newest-on-disk file that
    # could be a stale epoch outside this lake's history
    return _as_frame(view, group_col)


def maintain_dedup_view(
    lake_dir: str, text_col: str = "text", on_vacuumed: str = "bootstrap"
) -> pd.DataFrame:
    """Incrementally-maintained CORPUS-DUPLICATION view over the CDC
    lake: live-copy count per 64-bit content fingerprint of
    ``text_col``, kept in sync per epoch by the same partition-diff
    plan as ``maintain_group_counts`` (the ``hash64:`` virtual group) —
    O(touched bytes) per epoch, resumable cursor, vacuum re-anchor.

    This is the cdc_ingest × webtext integration piece: as the lake
    upserts/deletes pages, the duplication profile of the corpus stays
    current WITHOUT rescanning it — a tombstoned page's fingerprint
    count decrements, an updated page moves between fingerprints.
    Returns (fingerprint, n) for every live fingerprint; duplicates are
    the n ≥ 2 rows (``dedup_view_duplicates``)."""
    out = maintain_group_counts(lake_dir, HASH_GROUP_PREFIX + text_col,
                                on_vacuumed=on_vacuumed)
    return out.rename(columns={HASH_GROUP_PREFIX + text_col:
                               "fingerprint"})


def dedup_view_duplicates(view: pd.DataFrame) -> pd.DataFrame:
    """The duplicated slice of a dedup view: fingerprints with ≥2 live
    copies plus the total count of redundant rows."""
    dup = view[view["n"] >= 2].reset_index(drop=True)
    dup = dup.copy()
    dup["redundant"] = dup["n"] - 1
    return dup


def quantile_view_name(group_col: str, measure_col: str,
                       bin_width: int) -> str:
    """Filesystem identity of a grouped quantile-sketch view."""
    return f"{group_col}__qsketch__{measure_col}_{bin_width}"


def maintain_quantile_sketch_view(
    lake_dir: str, group_col: str, measure_col: str, bin_width: int,
    on_vacuumed: str = "bootstrap",
) -> pd.DataFrame:
    """Incrementally-maintained per-group QUANTILE SKETCH over the
    lake: state = live-row count per (group, floor(measure/bin_width))
    — a sparse bincount sketch, which is SIGNED-ADDITIVE, so the same
    partition-diff algebra that maintains sums maintains it exactly
    (deletes decrement bins, updates move rows between bins). Any
    quantile is answered at read time to within ``bin_width`` from
    O(live bins) state — the retractable analog of the batch
    ``quantile_sketch``. Returns the pair frame (group, bin, n)."""
    composite = (group_col,
                 f"{BUCKET_GROUP_PREFIX}{measure_col}:{bin_width}")
    vid = quantile_view_name(group_col, measure_col, bin_width)
    return _maintain(lake_dir, composite, vid, None, on_vacuumed)


def quantile_from_sketch(pairs: pd.DataFrame, group_col: str,
                         q: float, bin_width: int) -> pd.DataFrame:
    """Per-group lower q-quantile estimate from a sketch-view pair
    frame: the LOWER EDGE of the bin holding the ceil(q·n)-th order
    statistic over non-null measures — the true quantile_disc value
    lies in [estimate, estimate + bin_width). The rank is computed as
    an INTEGER (ceil with a relative epsilon), never compared against
    the raw float product, whose IEEE round-up would overshoot by one
    order statistic (e.g. 0.55·20 == 11.000000000000002). A group
    whose live measures are ALL null gets a NULL estimate (matching
    SQL's quantile-over-nulls), not a missing row."""
    if not 0 < q <= 1:
        raise ValueError(f"q={q}: need 0 < q <= 1")
    bin_col = [c for c in pairs.columns
               if c.startswith(BUCKET_GROUP_PREFIX)][0]
    all_groups = pd.Series(
        sorted(pairs[group_col].dropna().unique().tolist())
        + ([None] if pairs[group_col].isna().any() else []),
        dtype="object")
    p = pairs.dropna(subset=[bin_col]).sort_values([group_col, bin_col])
    if p.empty:
        return pd.DataFrame({
            group_col: all_groups,
            "estimate": pd.Series([pd.NA] * len(all_groups),
                                  dtype="Int64")})
    cw = p.groupby(group_col, dropna=False)["n"].cumsum()
    tw = p.groupby(group_col, dropna=False)["n"].transform("sum")
    target = np.ceil(q * tw - 1e-9 * tw)  # integer rank, FP-robust
    hit = p[cw >= target]
    out = hit.groupby(group_col, dropna=False, as_index=False)[bin_col] \
        .first()
    out["estimate"] = (out[bin_col] * bin_width).astype("Int64")
    out = out[[group_col, "estimate"]]
    covered = set(out[group_col].fillna("\0N"))
    missing = [g for g in all_groups
               if (g if g is not None else "\0N") not in covered]
    if missing:  # all-null-measure groups: NULL estimate, present row
        out = pd.concat([out, pd.DataFrame({
            group_col: missing,
            "estimate": pd.Series([pd.NA] * len(missing),
                                  dtype="Int64")})], ignore_index=True)
    return out.sort_values(group_col, na_position="last") \
        .reset_index(drop=True)


def minmax_view_name(group_col: str, measure_col: str) -> str:
    """Filesystem identity of a grouped MIN/MAX view."""
    return f"{group_col}__minmax__{measure_col}"


def maintain_group_minmax(
    lake_dir: str, group_col: str, measure_col: str,
    on_vacuumed: str = "bootstrap",
) -> pd.DataFrame:
    """Incrementally-maintained RETRACTABLE per-group MIN/MAX over an
    integer measure column.

    Plain min/max accumulators cannot retract: when a delete removes
    the current extreme, the runner-up is unrecoverable from the
    aggregate alone. Here the persisted state is the live-row count
    per (group, value) — the width-1 instance of the quantile-sketch
    state, which is SIGNED-ADDITIVE and therefore maintained exactly
    by the same partition-diff walk as every other view (deletes
    decrement a pair to zero and it leaves the state). min/max are a
    read-time reduce over surviving pairs, so a delete of the extreme
    retracts to the runner-up with NO corpus rescan. State is O(live
    distinct (group, value) pairs). Same cursor/resume/vacuum
    contract as ``maintain_group_counts``.

    Returns (group, vmin, vmax); a group whose live measures are all
    NULL keeps its row with NULL extremes (SQL min/max-over-nulls)."""
    composite = (group_col, f"{BUCKET_GROUP_PREFIX}{measure_col}:1")
    vid = minmax_view_name(group_col, measure_col)
    pairs = _maintain(lake_dir, composite, vid, None, on_vacuumed)
    bin_col = [c for c in pairs.columns
               if c.startswith(BUCKET_GROUP_PREFIX)][0]
    all_groups = pd.Series(
        sorted(pairs[group_col].dropna().unique().tolist())
        + ([None] if pairs[group_col].isna().any() else []),
        dtype="object")
    p = pairs.dropna(subset=[bin_col])
    if p.empty:
        out = pd.DataFrame({group_col: all_groups})
        out["vmin"] = pd.Series([pd.NA] * len(out), dtype="Int64")
        out["vmax"] = pd.Series([pd.NA] * len(out), dtype="Int64")
        return out.sort_values(group_col, na_position="last") \
            .reset_index(drop=True)
    agg = p.groupby(group_col, dropna=False)[bin_col] \
        .agg(vmin="min", vmax="max").reset_index()
    agg["vmin"] = agg["vmin"].astype("Int64")
    agg["vmax"] = agg["vmax"].astype("Int64")
    covered = set(agg[group_col].fillna("\0N"))
    missing = [g for g in all_groups
               if (g if g is not None else "\0N") not in covered]
    if missing:  # all-null-measure groups: NULL extremes, present row
        out_missing = pd.DataFrame({group_col: missing})
        out_missing["vmin"] = pd.Series([pd.NA] * len(missing),
                                        dtype="Int64")
        out_missing["vmax"] = pd.Series([pd.NA] * len(missing),
                                        dtype="Int64")
        agg = pd.concat([agg, out_missing], ignore_index=True)
    return agg.sort_values(group_col, na_position="last") \
        .reset_index(drop=True)
