"""Zero-copy lake branching (io/lake.py clone_lake): the branch equals
the source at its base epoch, diverges independently under further
ingest, survives a source-side vacuum (hardlinked inodes), and fails
loudly on a vacuumed base epoch."""

import os

import pytest

from maestro_ray.core.manifest import latest_manifest, list_epochs, manifest_at, vacuum
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import clone_lake, read_lake_at, read_lake_table
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=50,
                         evolution=False)


@pytest.fixture()
def lake(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def test_clone_equals_source_at_epoch(lake, tmp_path):
    epochs = list_epochs(lake)
    mid = epochs[len(epochs) // 2]
    dst = str(tmp_path / "branch")
    m = clone_lake(lake, dst, mid)
    assert m.epoch == mid and list_epochs(dst) == [mid]
    src_t = read_lake_at(lake, mid).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    dst_t = read_lake_table(dst).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert dst_t.equals(src_t)


def test_clone_evolves_without_touching_source(lake, tmp_path):
    """Branch at a mid epoch, replay the log's tail into the BRANCH
    (its watermark filter skips the already-applied prefix): the branch
    evolves through its own epochs, the source stays bit-for-bit
    untouched, and — replay determinism across branches — the branch
    reconverges to the source's head state."""
    epochs = list_epochs(lake)
    mid = epochs[len(epochs) // 2]
    dst = str(tmp_path / "branch")
    clone_lake(lake, dst, mid)
    src_before = {p: (v["file"], v["checksum"])
                  for p, v in latest_manifest(lake).partitions.items()}
    log = os.path.join(os.path.dirname(lake), "log")
    # different epoch cadence than the source's segments_per_epoch=2
    m2 = ingest(log, dst, num_partitions=4, segments_per_epoch=3)
    assert m2.epoch > mid and list_epochs(dst) != epochs
    src_after = {p: (v["file"], v["checksum"])
                 for p, v in latest_manifest(lake).partitions.items()}
    assert src_after == src_before  # source untouched
    got = read_lake_table(dst).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    exp = read_lake_table(lake).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)  # branch replay reconverges to the head


def test_clone_survives_source_vacuum(lake, tmp_path):
    epochs = list_epochs(lake)
    old = epochs[0]
    dst = str(tmp_path / "branch")
    clone_lake(lake, dst, old)
    expected = read_lake_at(lake, old).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    n = vacuum(lake, latest_manifest(lake))
    assert n > 0  # epoch-`old` files are gone from the SOURCE namespace
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake_at(lake, old)
    got = read_lake_table(dst).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(expected)  # hardlinked inodes outlive the unlink


def test_clone_of_vacuumed_epoch_fails_loudly(lake, tmp_path):
    old = list_epochs(lake)[0]
    vacuum(lake, latest_manifest(lake))
    with pytest.raises(ValueError, match="vacuumed"):
        clone_lake(lake, str(tmp_path / "branch"), old)


def test_clone_refuses_existing_epoch(lake, tmp_path):
    dst = str(tmp_path / "branch")
    clone_lake(lake, dst)
    with pytest.raises(FileExistsError):
        clone_lake(lake, dst)


def test_clone_retry_after_crash_is_idempotent(lake, tmp_path):
    """A clone that crashed after linking but before publishing its
    manifest must be re-runnable: same-inode collisions are skipped."""
    dst = str(tmp_path / "branch")
    m = clone_lake(lake, dst)
    os.remove(os.path.join(dst, "_manifests",
                           f"manifest-{m.epoch:012d}.json"))
    m2 = clone_lake(lake, dst)  # links already exist (same inodes)
    assert m2.to_json() == m.to_json()
    assert read_lake_table(dst).num_rows == read_lake_table(lake).num_rows


def test_clone_never_overwrites_foreign_files(lake, tmp_path):
    """A dst path already holding a DIFFERENT file (another lake's
    data) must fail loudly, not be silently overwritten."""
    dst = str(tmp_path / "branch")
    m = latest_manifest(lake)
    rel = next(v["file"] for v in m.partitions.values() if v["rows"] > 0)
    foreign = os.path.join(dst, rel)
    os.makedirs(os.path.dirname(foreign), exist_ok=True)
    with open(foreign, "wb") as f:
        f.write(b"someone else's bytes")
    with pytest.raises(FileExistsError, match="refusing"):
        clone_lake(lake, dst)
    with open(foreign, "rb") as f:
        assert f.read() == b"someone else's bytes"  # untouched


def test_clone_time_travels_from_its_base(lake, tmp_path):
    """The branch's base epoch is itself time-travel addressable and
    its manifest equals the source's at that epoch."""
    epochs = list_epochs(lake)
    mid = epochs[len(epochs) // 2]
    dst = str(tmp_path / "branch")
    clone_lake(lake, dst, mid)
    assert manifest_at(dst, mid).to_json() == \
        manifest_at(lake, mid).to_json()


def test_clone_with_history_carries_retained_epochs(lake, tmp_path):
    """with_history=True: every retained source epoch is addressable
    on the branch (manifests byte-equal), partition files share inodes,
    and a partially-vacuumed history epoch is skipped silently."""
    from maestro_ray.io.lake import read_lake_at

    epochs = list_epochs(lake)
    dst = str(tmp_path / "hbranch")
    clone_lake(lake, dst, with_history=True)
    assert list_epochs(dst) == epochs
    for e in epochs:
        assert manifest_at(dst, e).to_json() == \
            manifest_at(lake, e).to_json()
        got = read_lake_at(dst, e).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        want = read_lake_at(lake, e).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert got.equals(want), f"epoch {e}"
    # inode sharing (zero-copy): spot-check one head file
    m = latest_manifest(lake)
    rel = next(v["file"] for v in m.partitions.values() if v["rows"] > 0)
    assert os.path.samefile(os.path.join(lake, rel),
                            os.path.join(dst, rel))


def test_clone_with_history_skips_vacuumed_epochs(lake, tmp_path):
    """Delete one old partition file on a throwaway full-history branch
    and re-branch from IT: the damaged epoch is skipped, newer intact
    epochs survive."""
    mid_src = str(tmp_path / "mid")
    clone_lake(lake, mid_src, with_history=True)
    epochs = list_epochs(mid_src)
    victim = manifest_at(mid_src, epochs[0])
    rel = next(v["file"] for v in victim.partitions.values()
               if v["rows"] > 0)
    os.unlink(os.path.join(mid_src, rel))
    dst = str(tmp_path / "skipbranch")
    clone_lake(mid_src, dst, with_history=True)
    got = list_epochs(dst)
    assert epochs[0] not in got
    assert got[-1] == epochs[-1]
