"""Exactly-once property tests (SURVEY.md §5 layer 4): crash injection
at every step of the commit protocol must reconverge on rerun.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import MANIFEST_DIR, latest_manifest, vacuum
from maestro_ray.fixtures import ChangelogParams, gen_pages, write_changelog
from maestro_ray.io.lake import lake_files, read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.ops.hashing import checksum
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=500, seg_rows=100)


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    root = tmp_path_factory.mktemp("eo")
    log = str(root / "log")
    events = write_changelog(log, PARAMS)
    pages = gen_pages(PARAMS.n_urls, seed=42)
    pages_path = str(root / "pages.parquet")
    pq.write_table(pages, pages_path)
    return {"log": log, "pages_path": pages_path,
            "expected": replay_to_table(pages, events)}


def _check(lake, expected):
    got = read_lake_table(lake)
    assert got.num_rows == expected.num_rows
    for col in expected.column_names:
        assert got.column(col).equals(expected.column(col)), col


def test_crash_before_publish_reconverges(ray_session, fx, tmp_path):
    """Staged files exist but no manifest for the epoch → rerun converges."""
    lake = str(tmp_path / "lake")
    ingest(fx["log"], lake, base_pages=fx["pages_path"], num_partitions=4,
           segments_per_epoch=2, max_epochs=1)
    m = latest_manifest(lake)
    # simulate: next epoch's merge ran but driver died before publish —
    # plant garbage staging output that a rerun must overwrite/ignore
    staging = os.path.join(lake, "_staging", f"epoch-{m.epoch + 1:012d}")
    os.makedirs(staging, exist_ok=True)
    with open(os.path.join(staging, "p=0.parquet"), "w") as f:
        f.write("corrupt garbage from a dead run")
    m2 = ingest(fx["log"], lake, num_partitions=4, segments_per_epoch=2)
    assert m2.watermark == PARAMS.n_events - 1
    _check(lake, fx["expected"])


def test_crash_mid_rename_reconverges(ray_session, fx, tmp_path):
    """Files renamed into place but manifest missing → rerun overwrites
    with identical bytes and republishes."""
    lake = str(tmp_path / "lake")
    m_full = ingest(fx["log"], lake, base_pages=fx["pages_path"],
                    num_partitions=4, segments_per_epoch=2)
    final_epoch = m_full.epoch
    # simulate crash-after-rename-before-manifest: delete the final
    # manifest but keep the renamed data files
    os.remove(os.path.join(lake, MANIFEST_DIR, f"manifest-{final_epoch:012d}.json"))
    m = latest_manifest(lake)
    assert m.epoch < final_epoch
    m2 = ingest(fx["log"], lake, num_partitions=4, segments_per_epoch=2)
    assert m2.watermark == PARAMS.n_events - 1
    _check(lake, fx["expected"])


def test_manifest_checksums_match_files(ray_session, fx, tmp_path):
    """U5 convergence check: recomputed per-partition checksums equal the
    manifest-recorded ones."""
    lake = str(tmp_path / "lake")
    m = ingest(fx["log"], lake, base_pages=fx["pages_path"], num_partitions=4)
    for p, info in m.partitions.items():
        t = pq.read_table(os.path.join(lake, info["file"]))
        assert t.num_rows == info["rows"]
        assert checksum(t) == info["checksum"], f"partition {p}"


def test_vacuum_keeps_live_files_only(ray_session, fx, tmp_path):
    lake = str(tmp_path / "lake")
    m = ingest(fx["log"], lake, base_pages=fx["pages_path"], num_partitions=4,
               segments_per_epoch=2)
    n_parquet_before = sum(
        1 for root, _d, fs in os.walk(lake) for f in fs if f.endswith(".parquet")
        and MANIFEST_DIR not in root and "_lineage" not in root
    )
    removed = vacuum(lake, m)
    assert removed > 0  # superseded epoch files existed
    live = set(lake_files(lake, m))
    assert all(os.path.exists(f) for f in live)
    _check(lake, fx["expected"])
    assert n_parquet_before - removed == len(
        [v for v in m.partitions.values() if v["rows"] > 0]
    ) + sum(1 for v in m.partitions.values() if v["rows"] == 0)


def test_double_apply_same_epoch_idempotent(ray_session, fx, tmp_path):
    """Applying a fully-committed epoch again is a pure no-op (D5 +
    idempotent publish)."""
    lake = str(tmp_path / "lake")
    m1 = ingest(fx["log"], lake, base_pages=fx["pages_path"], num_partitions=4)
    before = {p: v["checksum"] for p, v in m1.partitions.items()}
    m2 = ingest(fx["log"], lake, num_partitions=4)
    assert {p: v["checksum"] for p, v in m2.partitions.items()} == before
    assert m2.epoch == m1.epoch
