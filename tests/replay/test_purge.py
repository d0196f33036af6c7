"""Hard-delete / right-to-be-forgotten (io/lake.py purge_urls): purged
urls vanish from EVERY retained epoch (live rows, old versions and
tombstones), the bytes leave the disk, everything else is untouched,
fsck stays green, and the op is idempotent."""

import json
import os

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import list_epochs, manifest_at
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import (
    clone_lake,
    fsck_lake,
    lookup_urls,
    purge_urls,
    read_lake_at,
)
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=40, n_events=400, seg_rows=50,
                         evolution=False)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("purge")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def _snapshot(lake_dir, epoch):
    return (read_lake_at(lake_dir, epoch, columns=["url", "warc_ts"])
            .to_pandas().sort_values("url").reset_index(drop=True))


def _all_lake_urls(lake_dir, epoch):
    """Every url PHYSICALLY present in epoch's files — incl. tombstones
    and superseded versions (read_lake_at hides both)."""
    m = manifest_at(lake_dir, epoch)
    urls: set[str] = set()
    for ent in m.partitions.values():
        if ent["rows"] > 0:
            path = os.path.join(lake_dir, ent["file"])
            urls.update(pq.read_table(path, columns=["url"])
                        .column("url").to_pylist())
    return urls


def _bytes_contain(lake_dir, needle: bytes) -> bool:
    for root, _d, files in os.walk(lake_dir):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "rb") as fh:
                    if needle in fh.read():
                        return True
    return False


def test_purge_erases_full_history(lake, tmp_path):
    lake_dir = lake
    epochs = list_epochs(lake_dir)
    head = epochs[-1]
    # victims: one live head url + one url with a tombstone anywhere
    live = set(_snapshot(lake_dir, head)["url"])
    physical = _all_lake_urls(lake_dir, head)
    dead = sorted(physical - live)
    victims = [sorted(live)[0]] + (dead[:1])
    keep_example = sorted(live)[1]

    before = {e: _snapshot(lake_dir, e) for e in epochs}
    rep = purge_urls(lake_dir, victims)
    assert rep["rows_removed"] > 0 and rep["files_rewritten"] > 0
    assert rep["manifests_updated"] > 0

    # every retained epoch: victims gone (physically), survivors exact
    for e in epochs:
        phys = _all_lake_urls(lake_dir, e)
        assert not (phys & set(victims)), f"epoch {e} still holds victims"
        want = before[e][~before[e]["url"].isin(victims)]
        got = _snapshot(lake_dir, e)
        assert got.equals(want.reset_index(drop=True)), f"epoch {e}"

    # point lookup: victims invisible, survivors still served
    assert lookup_urls(lake_dir, victims).num_rows == 0
    assert lookup_urls(lake_dir, [keep_example]).num_rows == 1

    # the BYTES are gone from every lake parquet file
    assert not _bytes_contain(lake_dir, victims[0].encode())

    # structural integrity intact (rows, checksums, routing, uniqueness)
    fs = fsck_lake(lake_dir, deep=True)
    assert fs["ok"], fs

    # idempotent: a second purge of the same urls is a no-op
    again = purge_urls(lake_dir, victims)
    assert again["files_rewritten"] == 0 and again["rows_removed"] == 0


def test_purge_unknown_url_noop(lake):
    rep = purge_urls(lake, ["https://never.example/nope"])
    assert rep["files_rewritten"] == 0 and rep["rows_removed"] == 0
    assert fsck_lake(lake)["ok"]


def test_purge_empty_list_noop(lake):
    rep = purge_urls(lake, [])
    assert rep == {"urls": 0, "files_rewritten": 0, "rows_removed": 0,
                   "manifests_updated": 0, "files_removed": 0,
                   "derived_state": []}


def test_clone_pins_old_inodes(ray_session, tmp_path):
    """A hardlinked branch keeps its copy: purge on the SOURCE must not
    reach through the shared inode (documented out-of-scope)."""
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    head = list_epochs(lake_dir)[-1]
    victim = sorted(_snapshot(lake_dir, head)["url"])[0]
    clone_dir = str(tmp_path / "branch")
    clone_lake(lake_dir, clone_dir)

    purge_urls(lake_dir, [victim])
    assert lookup_urls(lake_dir, [victim]).num_rows == 0
    # the clone still holds (and can itself purge) the url
    assert lookup_urls(clone_dir, [victim]).num_rows == 1
    rep = purge_urls(clone_dir, [victim])
    assert rep["rows_removed"] > 0
    assert lookup_urls(clone_dir, [victim]).num_rows == 0


def test_cli_purge(ray_session, tmp_path, capsys, monkeypatch):
    from maestro_ray.__main__ import main

    monkeypatch.setenv("MAESTRO_KEEP_RAY", "1")
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    head = list_epochs(lake_dir)[-1]
    victim = sorted(_snapshot(lake_dir, head)["url"])[0]

    rc = main(["purge", "--lake-dir", lake_dir, "--urls", victim])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows_removed"] > 0
    assert lookup_urls(lake_dir, [victim]).num_rows == 0
