"""Lake integrity audit (io/lake.py fsck_lake): a healthy lake is
clean; every corruption class is detected; crash garbage and vacuum
candidates surface as warnings without failing the check."""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import expire_epochs, list_epochs, manifest_at
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import fsck_lake
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=50,
                         evolution=False)


@pytest.fixture()
def lake(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None
    return lake_dir


def _head_file(lake_dir):
    m = manifest_at(lake_dir, list_epochs(lake_dir)[-1])
    v = next(v for v in sorted(m.partitions.values(),
                               key=lambda v: v["file"]) if v["rows"] > 0)
    return os.path.join(lake_dir, v["file"]), v


def test_healthy_lake_is_clean(lake):
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep
    for k in ("missing", "row_mismatch", "checksum_mismatch",
              "watermark_regression", "stray_files", "tmp_files",
              "staging_leftovers", "duplicate_urls", "misrouted"):
        assert rep[k] == [], k
    # surviving after expiration too
    expire_epochs(lake, keep_last=2)
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"] and rep["stray_files"] == []


def test_missing_and_row_mismatch_detected(lake):
    path, v = _head_file(lake)
    t = pq.read_table(path)
    # row-count drift: duplicate the file's first row
    pq.write_table(
        __import__("pyarrow").concat_tables([t, t.slice(0, 1)]), path)
    rep = fsck_lake(lake)
    assert not rep["ok"]
    assert any(f["file"] == v["file"] for f in rep["row_mismatch"])

    os.remove(path)
    rep = fsck_lake(lake)
    assert not rep["ok"]
    assert any(f["file"] == v["file"] for f in rep["missing"])


def test_checksum_corruption_needs_deep(lake):
    path, v = _head_file(lake)
    t = pq.read_table(path)
    # same row count, different content: overwrite lang everywhere
    import pyarrow as pa

    i = t.column_names.index("lang")
    t = t.set_column(i, "lang", pa.array(["xx"] * t.num_rows))
    pq.write_table(t, path)
    assert fsck_lake(lake, deep=False)["ok"]  # rows still match
    rep = fsck_lake(lake, deep=True)
    assert not rep["ok"]
    assert any(f["file"] == v["file"] for f in rep["checksum_mismatch"])


def test_garbage_reported_as_warnings_not_errors(lake):
    path, _v = _head_file(lake)
    shutil.copy(path, os.path.join(os.path.dirname(path),
                                   "epoch-999999999999.parquet"))
    os.makedirs(os.path.join(lake, "_staging", "epoch-000000000099"),
                exist_ok=True)
    shutil.copy(path, os.path.join(lake, "_staging",
                                   "epoch-000000000099", "p=0.parquet"))
    with open(os.path.join(lake, "_manifests",
                           "manifest-000000000099.json.tmp"), "w") as f:
        f.write("{torn")
    rep = fsck_lake(lake)
    assert rep["ok"]  # warnings only
    assert len(rep["stray_files"]) == 1
    assert len(rep["staging_leftovers"]) == 1
    assert len(rep["tmp_files"]) == 1


def test_cli_exit_code(lake, capsys, monkeypatch):
    import json

    from maestro_ray.__main__ import main

    monkeypatch.setenv("MAESTRO_KEEP_RAY", "1")
    assert main(["fsck", "--lake-dir", lake]) == 0
    path, _v = _head_file(lake)
    os.remove(path)
    assert main(["fsck", "--lake-dir", lake]) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["missing"]


def test_deep_detects_duplicate_and_misrouted_urls(lake):
    """The two structural invariants of the LWW lake: one row per url
    per head file, and hash(url)%P routing."""
    import pyarrow as pa

    path, _v = _head_file(lake)
    t = pq.read_table(path)
    assert t.num_rows >= 2
    # same row count, but every url collapsed onto one that routes to
    # a DIFFERENT partition — breaks uniqueness AND routing
    import itertools

    from maestro_ray.core.manifest import latest_manifest
    from maestro_ray.ops.hashing import partition_ids

    P = latest_manifest(lake).num_partitions
    assert P
    own = int(os.path.basename(os.path.dirname(path))[len("p="):])
    foreign = next(
        u for u in (f"https://foreign.example/{k}" for k in
                    itertools.count())
        if int(partition_ids(pa.array([u]), P)[0]) != own)
    i = t.column_names.index("url")
    t = t.set_column(i, "url", pa.array([foreign] * t.num_rows))
    pq.write_table(t, path)
    rep = fsck_lake(lake, deep=True)
    assert not rep["ok"]
    assert rep["duplicate_urls"], rep
    assert rep["misrouted"], rep


def test_plain_vacuum_is_not_corruption(lake):
    """Plain vacuum reclaims history files while their manifests stay
    addressable — fsck must report missing_history warnings, NOT fail
    (review finding: healthy lake flagged corrupt, CLI exit 1)."""
    from maestro_ray.core.manifest import latest_manifest, vacuum

    n = vacuum(lake, latest_manifest(lake))
    assert n > 0
    rep = fsck_lake(lake, deep=True)
    assert rep["ok"], rep
    assert rep["missing"] == []
    assert rep["missing_history"], "vacuumed history should be listed"
