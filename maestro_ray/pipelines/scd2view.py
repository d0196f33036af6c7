"""Incremental SCD Type-2 history view over the CDC lake.

``maintain_scd2`` keeps a full slowly-changing-dimension history table
(one row per url VERSION: attrs + ``valid_from`` / ``valid_to`` /
``is_current``) synchronized with the lake, epoch by epoch, at
EPOCH-GRAIN: each committed epoch's net change per url opens one
version (insert/update) and/or closes the previous one
(update/delete). Intra-epoch churn collapses exactly as the lake's own
LWW merge collapses it.

Why not the shardstore skeleton: SCD2 state is NOT recomputable from
the lake's live head (closed versions are history the head no longer
carries), so drop-then-insert is unsound here. Instead the state
evolves: per epoch, each CHANGED partition (the manifest diff — same
walk as views/changefeed) rewrites its partition file by applying the
net feed to the previous state:

- every feed url closes the partition's open version at the feed row's
  ``warc_ts`` (the delete's tombstone time for deletes),
- insert/update rows then open a fresh version at that same ts.

Cost is O(churn)/epoch — untouched partitions carry forward by
reference. The state is hash(url)%P-partitioned EXACTLY like the lake,
so every apply is partition-local: no shuffle, ever.

Durability = the repo's meta-last contract: partition files are
epoch-stamped (``p=<k>/epoch-<e>.parquet``, tmp+rename), the cursor in
``_scd2_meta.json`` commits LAST after each epoch. A crash between
partition writes and the meta commit leaves torn ``epoch-e`` files
that the newest-≤-cursor resolution ignores; the re-run re-derives
them deterministically and overwrites. History epochs the view needs
must still be addressable: a vacuum/expiration that outran maintenance
raises loudly (history cannot be re-anchored from head state — unlike
the count views, there is no sound bootstrap after genesis).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from maestro_ray.core.manifest import (
    changed_partitions,
    list_epochs,
    manifest_at,
)
from maestro_ray.pipelines.changefeed import (
    _OP,
    _diff_partition,
    _payload_type,
    _read_side,
)

META = "_scd2_meta.json"


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, META)


def _read_meta(out_dir: str) -> dict | None:
    p = _meta_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _commit_meta(out_dir: str, meta: dict) -> None:
    # the shared atomic-commit ritual (one definition repo-wide)
    from maestro_ray.pipelines.shardstore import (
        _commit_meta as _shared_commit,
    )

    _shared_commit(out_dir, META, meta)


def _part_dir(out_dir: str, p: int) -> str:
    return os.path.join(out_dir, f"p={p}")


def _state_schema(attrs: list[str]) -> pa.Schema:
    return pa.schema(
        [("url", pa.string())]
        + [(c, _payload_type(c)) for c in attrs]
        + [("valid_from", pa.timestamp("us")),
           ("valid_to", pa.timestamp("us")),
           ("is_current", pa.bool_())]
    )


def _newest_state(pdir: str, max_epoch: int | None) -> str | None:
    """Newest committed partition state: epoch-*.parquet with epoch ≤
    ``max_epoch`` (files above the cursor are torn applies — ignored,
    then overwritten by the deterministic re-run)."""
    if not os.path.isdir(pdir):
        return None
    best = None
    for n in os.listdir(pdir):
        if not (n.startswith("epoch-") and n.endswith(".parquet")):
            continue
        e = int(n[len("epoch-"):-len(".parquet")])
        if max_epoch is not None and e > max_epoch:
            continue
        if best is None or e > best:
            best = e
    if best is None:
        return None
    return os.path.join(pdir, f"epoch-{best:012d}.parquet")


def _apply_partition(lake_dir: str, out_dir: str, p: int,
                     new_rel: str | None, old_rel: str | None,
                     attrs: list[str], prev_epoch: int | None,
                     epoch: int) -> int:
    """Apply one partition's net epoch diff to its SCD2 state; writes
    the epoch-stamped file (deterministic bytes — retries overwrite).
    Returns the partition's version-row count."""
    schema = _state_schema(attrs)
    feed = _diff_partition(
        _read_side(os.path.join(lake_dir, new_rel) if new_rel else None,
                   attrs),
        _read_side(os.path.join(lake_dir, old_rel) if old_rel else None,
                   attrs),
        attrs,
    )
    # prev_epoch=None means NO committed state exists (genesis or a
    # crash before the first meta commit) — any state files on disk are
    # torn applies and must be ignored, or the first epoch's feed gets
    # applied on top of itself (re-closing/re-opening every version:
    # execution-confirmed history corruption in review)
    prev_path = (None if prev_epoch is None
                 else _newest_state(_part_dir(out_dir, p), prev_epoch))
    state = (pq.read_table(prev_path).to_pandas()
             if prev_path is not None
             else schema.empty_table().to_pandas())
    fp = feed.to_pandas()

    if not fp.empty:
        # the net diff emits at most one row per url — required for the
        # close/open pairing below to be well-defined
        if fp["url"].duplicated().any():
            raise RuntimeError(
                f"partition {p}: net feed has duplicate urls at epoch "
                f"{epoch} — diff invariant broken")
        ts_by_url = pd.Series(fp["warc_ts"].values, index=fp["url"])
        open_urls = set(state.loc[state["is_current"], "url"])
        closing = state["is_current"] & state["url"].isin(ts_by_url.index)
        state.loc[closing, "valid_to"] = \
            state.loc[closing, "url"].map(ts_by_url)
        state.loc[closing, "is_current"] = False
        # a delete must close an existing open version — anything else
        # means the view diverged from the lake (fail loudly, never
        # absorb silently)
        dead = fp.loc[fp[_OP] == "delete", "url"]
        orphans = [u for u in dead if u not in open_urls]
        if orphans:
            raise RuntimeError(
                f"partition {p}: delete for url with no open SCD2 "
                f"version (e.g. {orphans[0]!r}) at epoch {epoch} — "
                "view state diverged from the lake")
        opening = fp[fp[_OP] != "delete"]
        new_rows = pd.DataFrame({
            "url": opening["url"],
            **{c: opening[c] for c in attrs},
            "valid_from": opening["warc_ts"],
            "valid_to": pd.Series(pd.NaT, index=opening.index,
                                  dtype="datetime64[us]"),
            "is_current": True,
        })
        state = pd.concat([state, new_rows], ignore_index=True)

    state = state.sort_values(["url", "valid_from"],
                              kind="stable").reset_index(drop=True)
    out = pa.Table.from_pandas(state, schema=schema,
                               preserve_index=False)
    pdir = _part_dir(out_dir, p)
    os.makedirs(pdir, exist_ok=True)
    dst = os.path.join(pdir, f"epoch-{epoch:012d}.parquet")
    pq.write_table(out, dst + ".tmp")
    os.replace(dst + ".tmp", dst)
    return out.num_rows


_apply_task = None


def _get_apply_task():
    global _apply_task
    if _apply_task is None:
        import ray

        _apply_task = ray.remote(num_cpus=1)(_apply_partition)
    return _apply_task


def maintain_scd2(lake_dir: str, out_dir: str,
                  attrs: tuple[str, ...] = ("lang",)) -> dict:
    """Catch the SCD2 history view up to the lake's newest committed
    epoch. One Ray task per (epoch, changed partition); the cursor
    commits after each epoch. Idempotent and resumable. Returns
    ``{"cursor": e, "rows": total version rows}``."""
    import ray

    epochs = list_epochs(lake_dir)
    if not epochs:
        raise ValueError(f"no committed epochs in {lake_dir}")
    os.makedirs(out_dir, exist_ok=True)
    meta = _read_meta(out_dir)
    if meta is not None and tuple(meta["attrs"]) != tuple(attrs):
        raise ValueError(
            f"SCD2 view at {out_dir} tracks attrs {meta['attrs']}, "
            f"asked for {list(attrs)} — one view per attr set")
    cursor = meta["cursor"] if meta is not None else None
    if cursor is not None and cursor not in epochs:
        raise ValueError(
            f"SCD2 cursor epoch {cursor} is no longer committed in "
            f"{lake_dir} (expired?); the view cannot resume")
    pending = [e for e in epochs if cursor is None or e > cursor]
    alist = list(attrs)
    for e in pending:
        cur_m = manifest_at(lake_dir, e)
        prev_m = manifest_at(lake_dir, cursor) if cursor is not None \
            else None
        pairs = [
            (p,
             new["file"] if new is not None and new["rows"] > 0 else None,
             old["file"] if old is not None and old["rows"] > 0 else None)
            for p, new, old in changed_partitions(cur_m, prev_m)
        ]
        pairs = [t for t in pairs if t[0] is not None and (t[1] or t[2])]
        missing = [rel for _p, nr, orr in pairs for rel in (nr, orr)
                   if rel is not None
                   and not os.path.exists(os.path.join(lake_dir, rel))]
        if missing:
            raise ValueError(
                f"cannot maintain SCD2 through epoch {e}: "
                f"{missing[0]} was vacuumed before maintenance ran — "
                "history views must be maintained before expiration")
        if ray.is_initialized() and len(pairs) > 1:
            task = _get_apply_task()
            ray.get([
                task.remote(lake_dir, out_dir, p, nr, orr, alist,
                            cursor, e)
                for p, nr, orr in pairs
            ])
        else:
            for p, nr, orr in pairs:
                _apply_partition(lake_dir, out_dir, p, nr, orr, alist,
                                 cursor, e)
        _commit_meta(out_dir, {"cursor": e, "attrs": alist})
        # GC superseded state files for the partitions just rewritten
        for p, _nr, _orr in pairs:
            pdir = _part_dir(out_dir, p)
            keep = f"epoch-{e:012d}.parquet"
            for n in os.listdir(pdir):
                if (n.startswith("epoch-") and n.endswith(".parquet")
                        and n != keep):
                    os.remove(os.path.join(pdir, n))
        cursor = e
    rows = 0
    meta = _read_meta(out_dir)
    for f in _state_files(out_dir, meta["cursor"]):
        rows += pq.read_metadata(f).num_rows
    return {"cursor": meta["cursor"], "rows": rows}


def _state_files(out_dir: str, cursor: int) -> list[str]:
    files = []
    for n in sorted(os.listdir(out_dir)):
        if not n.startswith("p="):
            continue
        f = _newest_state(os.path.join(out_dir, n), cursor)
        if f is not None:
            files.append(f)
    return files


def read_scd2(out_dir: str) -> rd.Dataset:
    """The maintained history table as a lazy Dataset (url, attrs...,
    valid_from, valid_to, is_current)."""
    meta = _read_meta(out_dir)
    if meta is None:
        raise ValueError(f"no SCD2 view at {out_dir}")
    files = _state_files(out_dir, meta["cursor"])
    if not files:
        return rd.from_arrow(_state_schema(meta["attrs"]).empty_table())
    # partitioning=None: p=<k>/ is placement, not data (io/lake.py rule)
    return rd.read_parquet(files, partitioning=None)


def scd2_snapshot(out_dir: str, ts) -> rd.Dataset:
    """EVENT-TIME time travel through the history table: the version of
    every url live at instant ``ts`` (a datetime or µs int) — rows with
    ``valid_from <= ts < valid_to`` (open versions have null valid_to).
    A read-time filter over the maintained state: finer-grained than
    epoch time travel (``read_lake_at``), which can only address commit
    points."""
    import pyarrow.compute as pc

    if not hasattr(ts, "year"):  # µs int convenience
        import datetime as _dt

        ts = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=int(ts))
    ds = read_scd2(out_dir)

    def live_at(t: pa.Table) -> pa.Table:
        scalar = pa.scalar(ts, pa.timestamp("us"))
        lo = pc.less_equal(t.column("valid_from"), scalar)
        hi = pc.fill_null(pc.greater(t.column("valid_to"), scalar), True)
        return t.filter(pc.and_(lo, hi))

    return ds.map_batches(live_at, batch_format="pyarrow")
