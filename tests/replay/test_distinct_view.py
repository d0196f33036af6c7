"""Incremental grouped DISTINCT-count view (pipelines/views.py
maintain_group_distinct): per-group count of distinct live values,
maintained by the partition-diff algebra at (group, hash64(value))
granularity — exact through inserts, updates that MOVE a value between
groups, deletes, and re-inserts."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import list_epochs, manifest_at
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import live_mask
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.views import maintain_group_distinct


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    base = tmp_path_factory.mktemp("dv")
    log = str(base / "log")
    write_changelog(log, ChangelogParams(
        n_urls=60, n_events=400, seg_rows=80, seed=33))
    lake = str(base / "lake")
    ingest(log, lake, num_partitions=4, segments_per_epoch=1)
    return lake


def _recompute(lake_dir, epoch, group_col="lang", of_col="text"):
    """Ground truth straight off the lake files at ``epoch``: count of
    distinct live of_col values per group."""
    m = manifest_at(lake_dir, epoch)
    frames = []
    for ent in m.partitions.values():
        if ent["rows"] == 0:
            continue
        t = pq.read_table(os.path.join(lake_dir, ent["file"]))
        t = t.filter(live_mask(t))
        frames.append(t.select([group_col, of_col]).to_pandas())
    if not frames:
        return pd.DataFrame({group_col: [], "n_distinct": []})
    df = pd.concat(frames, ignore_index=True)
    out = (df.groupby(group_col, dropna=False)[of_col]
           .nunique(dropna=False).reset_index(name="n_distinct"))
    return out.sort_values(group_col).reset_index(drop=True)


def test_distinct_view_matches_recompute_at_every_epoch(ray_session, lake):
    for e in list_epochs(lake):
        got = maintain_group_distinct(lake, "lang", "text", to_epoch=e)
        exp = _recompute(lake, e)
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp, check_dtype=False)


def test_distinct_view_head_and_resume(ray_session, lake):
    head = maintain_group_distinct(lake, "lang", "text")
    again = maintain_group_distinct(lake, "lang", "text")  # cursor hit
    pd.testing.assert_frame_equal(head, again)
    pd.testing.assert_frame_equal(
        head.reset_index(drop=True),
        _recompute(lake, list_epochs(lake)[-1]), check_dtype=False)


def test_value_moving_between_groups(ray_session, tmp_path):
    """An update that changes a row's GROUP must decrement the old
    group's distinct set and increment the new one's — the composite
    (group, hash) key is what makes this exact."""
    from tests.replay.test_join_view import _ev, _write_segments

    log = str(tmp_path / "log")
    # epoch 1: two urls, same text body, langs en/fr via the fixture's
    # deterministic lang assignment is not controllable -> instead use
    # TEXT as the group and URL as the distinct value.
    segs = [
        [_ev(0, "insert", "u1", 1_000_000, b"same"),
         _ev(1, "insert", "u2", 1_000_001, b"same"),
         _ev(2, "insert", "u3", 1_000_002, b"other")],
        # epoch 2: u2's content moves to the "other" body; u3 deleted
        [_ev(3, "update", "u2", 2_000_000, b"other"),
         _ev(4, "delete", "u3", 2_000_001)],
    ]
    _write_segments(log, segs)
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    e1, e2 = list_epochs(lake)[:2]
    v1 = maintain_group_distinct(lake, "text", "url", to_epoch=e1)
    v2 = maintain_group_distinct(lake, "text", "url")
    pd.testing.assert_frame_equal(
        v1.reset_index(drop=True),
        _recompute(lake, e1, group_col="text", of_col="url"),
        check_dtype=False)
    pd.testing.assert_frame_equal(
        v2.reset_index(drop=True),
        _recompute(lake, e2, group_col="text", of_col="url"),
        check_dtype=False)
    # and the move is visible: each body has at least one distinct url
    assert set(v2["n_distinct"]) <= {1, 2}


def test_topk_view_matches_recompute(ray_session, lake):
    from maestro_ray.pipelines.views import topk_view

    got = topk_view(lake, "lang", "text", k=3)
    # ground truth: live copy counts per (lang, text) at head
    from maestro_ray.core.manifest import latest_manifest
    from maestro_ray.ops.hashing import hash_array
    import numpy as np
    import pyarrow as pa

    m = latest_manifest(lake)
    frames = []
    for ent in m.partitions.values():
        if ent["rows"] == 0:
            continue
        t = pq.read_table(os.path.join(lake, ent["file"]))
        t = t.filter(live_mask(t))
        frames.append(t.select(["lang", "text"]).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    df["fingerprint"] = hash_array(
        pa.array(df["text"].tolist(), pa.string())).view(np.int64)
    exp = (df.groupby(["lang", "fingerprint"], dropna=False)
           .size().reset_index(name="n"))
    exp = exp.sort_values(["lang", "n", "fingerprint"],
                          ascending=[True, False, True])
    exp = exp.groupby("lang", dropna=False).head(3).copy()
    exp["rank"] = exp.groupby("lang", dropna=False).cumcount() + 1
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True)[got.columns.tolist()],
        check_dtype=False)
    # the shared-state claim: the distinct view and the topk view use
    # ONE persisted cursor (no second maintenance walk)
    from maestro_ray.pipelines.views import distinct_view_name

    vdir = os.path.join(lake, "_views", distinct_view_name("lang", "text"))
    assert os.path.isdir(vdir)
