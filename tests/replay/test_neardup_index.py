"""Incremental near-dup band index over the CDC lake
(pipelines/neardup.py): incremental ≡ rebuild at every epoch, planted
near-dup appearing/disappearing through CDC, crash idempotence."""

import json
import os

import pandas as pd
import pytest

from maestro_ray.core.manifest import list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines import neardup as nd


def _rebuild_df(lake, tmp_dir):
    nd.bootstrap_neardup_index(lake, tmp_dir, n_shards=4)
    return nd.read_neardup_index(tmp_dir)


def test_incremental_equals_rebuild_per_epoch(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        n_urls=40, n_events=240, seg_rows=60, seed=88))
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    booted = False
    step = 0
    while True:
        m = ingest(log, lake, num_partitions=4, segments_per_epoch=1,
                   max_epochs=1)
        head = list_epochs(lake)[-1]
        if not booted:
            nd.bootstrap_neardup_index(lake, idx, n_shards=4)
            booted = True
        else:
            nd.update_neardup_index(lake, idx)
        got = nd.read_neardup_index(idx)
        exp = _rebuild_df(lake, str(tmp_path / f"fresh{step}"))
        pd.testing.assert_frame_equal(got, exp)
        step += 1
        if m is not None and m.watermark >= 239:
            break
    assert step >= 3  # several epochs actually exercised


def test_planted_near_dup_through_cdc(ray_session, tmp_path):
    """An update that makes two pages near-identical must surface the
    candidate pair; deleting one must remove it."""
    from tests.replay.test_join_view import _ev, _write_segments

    body = (b"the quick brown fox jumps over the lazy dog again and "
            b"again in the long winding corpus of synthetic text")
    segs = [
        [_ev(0, "insert", "u1", 1_000_000, body),
         _ev(1, "insert", "u2", 1_000_001, b"entirely different words "
             b"about streaming engines and arrow batches everywhere"),
         _ev(2, "insert", "u3", 1_000_002, b"third unrelated page "
             b"content with nothing shared at all here")],
        # epoch 2: u2 becomes a near-copy of u1
        [_ev(3, "update", "u2", 2_000_000, body + b" tail")],
        # epoch 3: u1 deleted — the pair must disappear
        [_ev(4, "delete", "u1", 3_000_000)],
    ]
    log = str(tmp_path / "log")
    _write_segments(log, segs)
    lake = str(tmp_path / "lake")
    idx = str(tmp_path / "idx")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1,
           max_epochs=1)
    nd.bootstrap_neardup_index(lake, idx, n_shards=4)
    c0 = nd.neardup_candidates(idx).to_pandas()
    assert not ((c0.get("a") == "u1") & (c0.get("b") == "u2")).any() \
        if len(c0) else True

    ingest(log, lake, num_partitions=2, segments_per_epoch=1,
           max_epochs=1)
    nd.update_neardup_index(lake, idx)
    c1 = nd.neardup_candidates(idx).to_pandas()
    assert ((c1["a"] == "u1") & (c1["b"] == "u2")).any()

    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    nd.update_neardup_index(lake, idx)
    c2 = nd.neardup_candidates(idx).to_pandas()
    if len(c2):
        assert not ((c2["a"] == "u1") | (c2["b"] == "u1")).any()
    # and the index itself matches a rebuild
    pd.testing.assert_frame_equal(
        nd.read_neardup_index(idx),
        _rebuild_df(lake, str(tmp_path / "fresh")))


def test_crash_before_meta_recovers(ray_session, tmp_path, monkeypatch):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(
        n_urls=20, n_events=120, seg_rows=60, seed=99))
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1,
           max_epochs=1)
    idx = str(tmp_path / "idx")
    nd.bootstrap_neardup_index(lake, idx, n_shards=4)
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)

    real_replace = os.replace

    def crashing(src, dst):
        if dst.endswith(nd.META):
            raise RuntimeError("crash before meta")
        return real_replace(src, dst)

    monkeypatch.setattr(nd.os, "replace", crashing)
    with pytest.raises(RuntimeError):
        nd.update_neardup_index(lake, idx)
    monkeypatch.setattr(nd.os, "replace", real_replace)
    with open(os.path.join(idx, nd.META)) as f:
        assert json.load(f)["epoch"] != list_epochs(lake)[-1]
    nd.update_neardup_index(lake, idx)
    pd.testing.assert_frame_equal(
        nd.read_neardup_index(idx),
        _rebuild_df(lake, str(tmp_path / "fresh")))


def test_rebootstrap_invalidate_first_and_empty_live_lake(
        ray_session, tmp_path):
    """Re-bootstrap clears stale shards (no orphans when n_shards
    shrinks; a crash can't pair old meta with new shards), and a lake
    whose live set is EMPTY bootstraps to typed empty shards."""
    from tests.replay.test_join_view import _ev, _write_segments

    log = str(tmp_path / "log")
    _write_segments(log, [
        [_ev(0, "insert", "u1", 1_000_000, b"alpha beta gamma"),
         _ev(1, "insert", "u2", 1_000_001, b"delta epsilon zeta")],
        [_ev(2, "delete", "u1", 2_000_000),
         _ev(3, "delete", "u2", 2_000_001)],
    ])
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=2, segments_per_epoch=1,
           max_epochs=1)
    idx = str(tmp_path / "idx")
    nd.bootstrap_neardup_index(lake, idx, n_shards=8)
    assert len([f for f in os.listdir(idx)
                if f.endswith(".parquet")]) == 8
    # re-bootstrap with FEWER shards: no orphan high-numbered files
    nd.bootstrap_neardup_index(lake, idx, n_shards=4)
    shard_files = sorted(f for f in os.listdir(idx)
                         if f.endswith(".parquet"))
    assert len(shard_files) == 4
    assert nd.read_neardup_index(idx)["url"].nunique() == 2

    # advance to the delete-all epoch; the live set is empty
    ingest(log, lake, num_partitions=2, segments_per_epoch=1)
    idx2 = str(tmp_path / "idx2")
    nd.bootstrap_neardup_index(lake, idx2, n_shards=4)
    assert len(nd.read_neardup_index(idx2)) == 0
    # and maintenance from the populated cursor converges to empty too
    nd.update_neardup_index(lake, idx)
    assert len(nd.read_neardup_index(idx)) == 0
