"""Snapshot expiration (core/manifest.py expire_epochs): retained
epochs stay time-travelable with identical content, expired epochs
become unaddressable, unreferenced files + lineage are reclaimed, and
hardlinked clones survive the source's expiration."""

import json
import os

import pytest

from maestro_ray.core.manifest import (
    LINEAGE_DIR,
    expire_epochs,
    list_epochs,
    manifest_path,
)
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import clone_lake, read_lake_at
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=50,
                         evolution=False)


def _build(root):
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def _snapshot(lake_dir, epoch):
    return (read_lake_at(lake_dir, epoch, columns=["url", "warc_ts"])
            .to_pandas().sort_values("url").reset_index(drop=True))


def _parquet_count(lake_dir):
    return sum(
        1 for root, _d, files in os.walk(lake_dir)
        for f in files
        if f.endswith(".parquet") and "_views" not in root
        and LINEAGE_DIR not in root  # lineage is counted separately
    )


def test_expire_keeps_window_reclaims_rest(ray_session, tmp_path):
    lake_dir = _build(tmp_path)
    epochs = list_epochs(lake_dir)
    assert len(epochs) == 4
    before = {e: _snapshot(lake_dir, e) for e in epochs[-2:]}
    n_files_before = _parquet_count(lake_dir)

    out = expire_epochs(lake_dir, keep_last=2)
    assert out["epochs_removed"] == 2
    assert out["epochs_kept"] == epochs[-2:]
    assert out["files_removed"] > 0
    assert _parquet_count(lake_dir) == n_files_before - out["files_removed"]

    # retained epochs: byte-identical state, still addressable
    assert list_epochs(lake_dir) == epochs[-2:]
    for e in epochs[-2:]:
        assert _snapshot(lake_dir, e).equals(before[e]), f"epoch {e}"

    # expired epochs: unaddressable, loudly
    with pytest.raises(ValueError, match="available epochs"):
        read_lake_at(lake_dir, epochs[0])

    # lineage of expired epochs is gone, retained lineage survives
    lin = os.path.join(lake_dir, LINEAGE_DIR)
    names = set(os.listdir(lin))
    assert f"epoch-{epochs[0]:012d}.parquet" not in names
    assert f"epoch-{epochs[-1]:012d}.parquet" in names

    # idempotent: a second run is a no-op
    again = expire_epochs(lake_dir, keep_last=2)
    assert again["epochs_removed"] == 0
    assert again["files_removed"] == 0


def test_expire_noop_when_history_fits(ray_session, tmp_path):
    lake_dir = _build(tmp_path)
    epochs = list_epochs(lake_dir)
    out = expire_epochs(lake_dir, keep_last=len(epochs) + 5)
    assert out["epochs_removed"] == 0 and out["files_removed"] == 0
    assert list_epochs(lake_dir) == epochs


def test_expire_rejects_zero_retention(ray_session, tmp_path):
    lake_dir = _build(tmp_path)
    with pytest.raises(ValueError, match="keep_last"):
        expire_epochs(lake_dir, keep_last=0)


def test_clone_survives_source_expiration(ray_session, tmp_path):
    """A hardlinked branch pins the shared inodes: expiring the SOURCE
    unlinks only the source's names, so the clone's full state remains
    readable and identical."""
    lake_dir = _build(tmp_path)
    first = list_epochs(lake_dir)[0]
    clone_dir = str(tmp_path / "branch")
    clone_lake(lake_dir, clone_dir, epoch=first)
    want = _snapshot(clone_dir, first)

    expire_epochs(lake_dir, keep_last=1)
    with pytest.raises(ValueError, match="available epochs"):
        read_lake_at(lake_dir, first)
    assert _snapshot(clone_dir, first).equals(want)


def test_crash_between_phases_recovers(ray_session, tmp_path):
    """Manifests are removed before files: simulate the crash point by
    hand-deleting an expired epoch's manifest, then run expire — the
    now-unreferenced files are still reclaimed."""
    lake_dir = _build(tmp_path)
    epochs = list_epochs(lake_dir)
    os.remove(manifest_path(lake_dir, epochs[0]))
    out = expire_epochs(lake_dir, keep_last=2)
    # epochs[0]'s manifest was already gone → only epochs[1] counted,
    # but BOTH epochs' unreferenced files are swept
    assert out["epochs_removed"] == 1
    assert out["files_removed"] > 0
    assert list_epochs(lake_dir) == epochs[-2:]


def test_cli_vacuum_keep_last(ray_session, tmp_path, capsys, monkeypatch):
    from maestro_ray.__main__ import main

    # the CLI owns its Ray session and tears it down on exit; keep the
    # suite's shared session alive (the CLI's documented escape hatch)
    monkeypatch.setenv("MAESTRO_KEEP_RAY", "1")
    lake_dir = _build(tmp_path)
    epochs = list_epochs(lake_dir)
    rc = main(["vacuum", "--lake-dir", lake_dir, "--keep-last", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_removed"] == len(epochs) - 2
    assert list_epochs(lake_dir) == epochs[-2:]
