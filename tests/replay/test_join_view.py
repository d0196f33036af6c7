"""Incremental materialized JOIN view (pipelines/joinview.py):
partition-local co-partitioned joins, epoch-by-epoch equivalence with a
full recompute, delete/update propagation, resumability, guards."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import live_mask
from maestro_ray.pipelines.joinview import (
    _m_at_or_before,
    join_view_name,
    maintain_join_view,
    read_join_view,
)
from maestro_ray.pipelines.multi import (
    committed_epochs,
    ingest_multi,
    table_dir,
)

P_A = ChangelogParams(n_urls=40, n_events=300, seg_rows=60, seed=11)
P_B = ChangelogParams(n_urls=30, n_events=240, seg_rows=60, seed=22)


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    base = tmp_path_factory.mktemp("jv")
    logs = {}
    for name, p in (("a", P_A), ("b", P_B)):
        d = str(base / f"log_{name}")
        write_changelog(d, p)
        logs[name] = d
    r = str(base / "root")
    ingest_multi(r, logs, num_partitions=4, segments_per_epoch=1)
    return r


def _oracle_join(root, epoch) -> pd.DataFrame:
    """Ground truth straight off the lake files: live rows of each
    table at the joint epoch, pandas inner merge on url."""
    frames = {}
    for name, cols in (("a", ["text"]), ("b", ["lang"])):
        lake = table_dir(root, name)
        m = _m_at_or_before(lake, epoch)
        parts = []
        if m is not None:
            for ent in m.partitions.values():
                if ent["rows"] == 0:
                    continue
                t = pq.read_table(os.path.join(lake, ent["file"]))
                t = t.filter(live_mask(t))
                parts.append(t.select(["url", "warc_ts", *cols]).to_pandas())
        df = (pd.concat(parts, ignore_index=True) if parts
              else pd.DataFrame(columns=["url", "warc_ts", *cols]))
        frames[name] = df.rename(
            columns={c: f"{name}__{c}" for c in ("warc_ts", *cols)})
    out = frames["a"].merge(frames["b"], on="url", how="inner")
    return out.sort_values("url").reset_index(drop=True)


def _view_df(root, epoch=None) -> pd.DataFrame:
    ds = read_join_view(root, "a", "b", epoch=epoch)
    df = ds.to_pandas()
    if df.empty:  # empty Datasets can drop column order
        return df
    return (df.sort_values("url").reset_index(drop=True)
            [["url", "a__warc_ts", "a__text", "b__warc_ts", "b__lang"]])


def test_view_matches_oracle_at_every_epoch(ray_session, root):
    maintain_join_view(root, "a", "b",
                       left_cols=("text",), right_cols=("lang",))
    epochs = committed_epochs(root)
    assert len(epochs) >= 3  # the fixture must exercise several epochs
    for e in epochs:
        got = _view_df(root, e)
        exp = _oracle_join(root, e)
        assert len(got) > 0, f"epoch {e}: join unexpectedly empty"
        pd.testing.assert_frame_equal(
            got, exp[got.columns.tolist()], check_dtype=False)


def test_incremental_equals_full_rebuild(ray_session, root, tmp_path):
    # the incrementally-maintained head view must be byte-identical in
    # content to a from-scratch rebuild (fresh view dir, one pass)
    maintain_join_view(root, "a", "b")
    head = _view_df(root)
    vdir = os.path.join(root, "_join_views", join_view_name("a", "b"))
    backup = str(tmp_path / "vbak")
    shutil.copytree(vdir, backup)
    shutil.rmtree(vdir)
    maintain_join_view(root, "a", "b")
    rebuilt = _view_df(root)
    pd.testing.assert_frame_equal(head, rebuilt)
    shutil.rmtree(vdir)
    shutil.copytree(backup, vdir)


def test_sparse_epoch_carries_files_forward(ray_session, tmp_path):
    """Partitions untouched by an epoch must NOT be rewritten — their
    manifest entries reference the older epoch's file (O(churn), not
    O(lake), per epoch)."""
    base = str(tmp_path)
    many = [_ev(i, "insert", f"u{i}", 1_000_000 + i, b"x%d" % i)
            for i in range(16)]
    segs_a = [many, [_ev(16, "update", "u0", 9_000_000, b"x0v2")]]
    segs_b = [[_ev(i, "insert", f"u{i}", 1_500_000 + i, b"y%d" % i)
               for i in range(16)]]
    logs = {}
    for name, segs in (("a", segs_a), ("b", segs_b)):
        d = os.path.join(base, f"log_{name}")
        _write_segments(d, segs)
        logs[name] = d
    root = os.path.join(base, "root")
    ingest_multi(root, logs, num_partitions=4, segments_per_epoch=1)
    maintain_join_view(root, "a", "b")
    e2 = committed_epochs(root)[-1]
    vdir = os.path.join(root, "_join_views", join_view_name("a", "b"))
    with open(os.path.join(vdir, f"view-{e2:012d}.json")) as f:
        vm = json.load(f)
    tags = [f"epoch-{e2:012d}" in ent["file"]
            for ent in vm["parts"].values() if ent["file"] is not None]
    assert any(tags)       # u0's partition was rewritten
    assert not all(tags)   # the untouched partitions carried forward
    # and the carried-forward view is still exactly right
    pd.testing.assert_frame_equal(
        _view_df(root, e2),
        _oracle_join(root, e2)[["url", "a__warc_ts", "a__text",
                                "b__warc_ts", "b__lang"]],
        check_dtype=False)


def _write_segments(log_dir, segments):
    """Hand-built changelog: segments is a list of event-dict lists
    (CHANGELOG_V3 fields), one parquet segment each."""
    from maestro_ray.fixtures import _events_to_table

    os.makedirs(log_dir, exist_ok=True)
    for seg in segments:
        t = _events_to_table(seg, version=3)
        first = seg[0]["offset"]
        pq.write_table(t, os.path.join(log_dir, f"seg-{first:012d}.parquet"))


def _ev(off, op, url, ts_us, body=None):
    html = None if op == "delete" else (
        b"<html><body><p>" + body + b"</p></body></html>")
    return {"offset": off, "op": op, "url": url, "warc_ts": ts_us,
            "html": html, "lang": None if op == "delete" else "en"}


def test_delete_leaves_the_join(ray_session, tmp_path):
    """A url live in both tables, then tombstoned in one: it must drop
    out of the view at exactly that epoch."""
    base = str(tmp_path)
    segs_a = [
        [_ev(0, "insert", "u1", 1_000_000, b"a-one"),
         _ev(1, "insert", "u2", 1_000_001, b"a-two")],
        [_ev(2, "delete", "u1", 2_000_000)],
    ]
    segs_b = [
        [_ev(0, "insert", "u1", 1_500_000, b"b-one"),
         _ev(1, "insert", "u2", 1_500_001, b"b-two")],
        [_ev(2, "update", "u2", 2_500_000, b"b-two-v2")],
    ]
    logs = {}
    for name, segs in (("a", segs_a), ("b", segs_b)):
        d = os.path.join(base, f"log_{name}")
        _write_segments(d, segs)
        logs[name] = d
    root = os.path.join(base, "root")
    ingest_multi(root, logs, num_partitions=2, segments_per_epoch=1)
    maintain_join_view(root, "a", "b")
    e1, e2 = committed_epochs(root)[:2]
    v1 = _view_df(root, e1)
    v2 = _view_df(root, e2)
    assert set(v1["url"]) == {"u1", "u2"}
    assert set(v2["url"]) == {"u2"}  # u1's delete left the join
    # the surviving row carries the UPDATED right-side version (the
    # b-table text extracted from the v2 html)
    pd.testing.assert_frame_equal(
        v2, _oracle_join(root, e2)[v2.columns.tolist()], check_dtype=False)


def test_idempotent_and_resumable(ray_session, root):
    first = maintain_join_view(root, "a", "b")
    again = maintain_join_view(root, "a", "b")  # no new epochs
    assert first["epoch"] == again["epoch"]
    assert {int(k) for k in first["parts"]} == \
           {int(k) for k in again["parts"]}


def test_partition_count_mismatch_fails_loudly(ray_session, tmp_path,
                                               monkeypatch):
    import maestro_ray.pipelines.joinview as jv

    root = str(tmp_path / "root")
    logs = {}
    for name, p in (("a", ChangelogParams(n_urls=10, n_events=40,
                                          seg_rows=40, seed=1)),
                    ("b", ChangelogParams(n_urls=10, n_events=40,
                                          seg_rows=40, seed=2))):
        d = str(tmp_path / f"log_{name}")
        write_changelog(d, p)
        logs[name] = d
    ingest_multi(root, logs, num_partitions=2)
    # forge a mismatched partition count on one side
    orig = jv._m_at_or_before

    def forged(lake, epoch):
        m = orig(lake, epoch)
        if m is not None and lake.endswith("/b"):
            m.num_partitions = 4
        return m

    monkeypatch.setattr(jv, "_m_at_or_before", forged)
    with pytest.raises(ValueError, match="co-partitioned"):
        maintain_join_view(root, "a", "b")


def _oracle_anti(root, epoch):
    """Ground truth: live left rows with no live right url."""
    frames = {}
    for name, cols in (("a", ["text"]), ("b", [])):
        lake = table_dir(root, name)
        m = _m_at_or_before(lake, epoch)
        parts = []
        if m is not None:
            for ent in m.partitions.values():
                if ent["rows"] == 0:
                    continue
                t = pq.read_table(os.path.join(lake, ent["file"]))
                t = t.filter(live_mask(t))
                parts.append(t.select(["url", "warc_ts", *cols]).to_pandas())
        frames[name] = (pd.concat(parts, ignore_index=True) if parts
                        else pd.DataFrame(columns=["url", "warc_ts", *cols]))
    a = frames["a"].rename(columns={"warc_ts": "a__warc_ts",
                                    "text": "a__text"})
    orphans = a[~a["url"].isin(set(frames["b"]["url"]))]
    return orphans.sort_values("url").reset_index(drop=True)


def test_anti_join_view_tracks_orphans(ray_session, root):
    """how='anti' = live referential-integrity monitoring: left rows
    with no live right counterpart, exact at every joint epoch."""
    maintain_join_view(root, "a", "b", left_cols=("text",), how="anti")
    checked = 0
    for e in committed_epochs(root):
        got = read_join_view(root, "a", "b", epoch=e, how="anti") \
            .to_pandas()
        exp = _oracle_anti(root, e)
        assert len(got) == len(exp)
        if len(got):
            got = got.sort_values("url").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["url", "a__warc_ts", "a__text"]],
                exp[["url", "a__warc_ts", "a__text"]], check_dtype=False)
            checked += 1
    assert checked > 0  # P_A has 40 urls vs P_B's 30 — orphans exist


def test_left_join_view_keeps_unmatched_left(ray_session, root):
    maintain_join_view(root, "a", "b", left_cols=("text",),
                       right_cols=("lang",), how="left")
    e = committed_epochs(root)[-1]
    got = read_join_view(root, "a", "b", epoch=e, how="left").to_pandas()
    inner = _oracle_join(root, e)
    anti = _oracle_anti(root, e)
    assert len(got) == len(inner) + len(anti)
    unmatched = got[got["b__warc_ts"].isna()]
    assert set(unmatched["url"]) == set(anti["url"])


def test_vacuum_join_view(ray_session, tmp_path):
    base = str(tmp_path)
    many = [_ev(i, "insert", f"u{i}", 1_000_000 + i, b"x%d" % i)
            for i in range(16)]
    segs_a = [many, [_ev(16, "update", "u0", 9_000_000, b"x0v2")],
              [_ev(17, "update", "u1", 9_100_000, b"x1v2")]]
    segs_b = [[_ev(i, "insert", f"u{i}", 1_500_000 + i, b"y%d" % i)
               for i in range(16)]]
    logs = {}
    for name, segs in (("a", segs_a), ("b", segs_b)):
        d = os.path.join(base, f"log_{name}")
        _write_segments(d, segs)
        logs[name] = d
    root = os.path.join(base, "root")
    ingest_multi(root, logs, num_partitions=4, segments_per_epoch=1)
    maintain_join_view(root, "a", "b")
    from maestro_ray.pipelines.joinview import vacuum_join_view

    head_before = _view_df(root)
    epochs = committed_epochs(root)
    vdir = os.path.join(root, "_join_views", join_view_name("a", "b"))
    # leave a crash-leftover tmp to reap
    open(os.path.join(vdir, "parts", "part-junk.parquet.tmp"), "w").close()
    out = vacuum_join_view(root, "a", "b", keep_epochs=1)
    assert out["removed_files"] > 0
    assert out["dropped_manifests"] == len(epochs) - 1
    # the head survives byte-identically, incl. carried-forward files
    pd.testing.assert_frame_equal(head_before, _view_df(root))
    # vacuumed history fails loudly
    with pytest.raises(ValueError, match="no epoch"):
        read_join_view(root, "a", "b", epoch=epochs[0])
    # maintenance still resumes cleanly after the vacuum (idempotent)
    maintain_join_view(root, "a", "b")
    pd.testing.assert_frame_equal(head_before, _view_df(root))


def test_changed_column_specs_fail_loudly(ray_session, root):
    """The view identity on disk is (left, right, how); resuming with
    different column specs must refuse — silently serving old columns
    or mixing schemas across carried-forward partitions is corruption
    (r4 s4 review finding)."""
    maintain_join_view(root, "a", "b",
                       left_cols=("text",), right_cols=("lang",))
    with pytest.raises(ValueError, match="left_cols"):
        maintain_join_view(root, "a", "b",
                           left_cols=("text",),
                           right_cols=("lang", "text"))


def test_chained_group_counts_over_join_view(ray_session, root):
    """View over view: a per-group count maintained from the JOIN
    VIEW's manifests — the whole chain (lakes → join → counts) is
    O(churn) per epoch. Pinned vs recompute at every persisted epoch,
    plus cursor-hit idempotence."""
    from maestro_ray.pipelines.joinview import (
        _view_dir,
        _view_epochs,
        maintain_join_group_counts,
    )

    maintain_join_view(root, "a", "b",
                       left_cols=("text",), right_cols=("lang",))
    head = maintain_join_group_counts(root, "a", "b", "b__lang")
    vdir = _view_dir(root, join_view_name("a", "b"))
    epochs = _view_epochs(vdir)
    assert len(epochs) >= 3
    for e in epochs:
        persisted = pq.read_table(os.path.join(
            vdir, "_agg", "b__lang", f"epoch-{e:012d}.parquet")
        ).to_pandas().sort_values("b__lang").reset_index(drop=True)
        exp = (read_join_view(root, "a", "b", epoch=e).to_pandas()
               .groupby("b__lang", dropna=False).size()
               .reset_index(name="n")
               .sort_values("b__lang").reset_index(drop=True))
        pd.testing.assert_frame_equal(persisted, exp, check_dtype=False)
    again = maintain_join_group_counts(root, "a", "b", "b__lang")
    pd.testing.assert_frame_equal(head, again)


def test_join_group_counts_bad_column_fails(ray_session, root):
    from maestro_ray.pipelines.joinview import maintain_join_group_counts

    maintain_join_view(root, "a", "b",
                       left_cols=("text",), right_cols=("lang",))
    with pytest.raises(ValueError, match="not a column"):
        maintain_join_group_counts(root, "a", "b", "b__langg")
