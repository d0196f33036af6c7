"""Replay/golden-state tests (SURVEY.md §5 layer 3): the distributed
engine must reproduce the pure-Python oracle's final table row-by-row,
``text`` byte-identical, under evolution, skew, duplicates, tombstones.
"""

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, gen_pages, write_changelog
from maestro_ray.io.lake import read_lake_table, read_lineage
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=80, n_events=800, seg_rows=120)


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("replay")
    log = str(root / "log")
    events = write_changelog(log, PARAMS)
    pages = gen_pages(PARAMS.n_urls, seed=42)
    pages_path = str(root / "pages.parquet")
    pq.write_table(pages, pages_path)
    expected = replay_to_table(pages, events)
    return {"log": log, "pages": pages, "pages_path": pages_path,
            "expected": expected, "root": root}


def _assert_lake_equals(lake_dir, expected):
    got = read_lake_table(lake_dir)
    assert got.num_rows == expected.num_rows
    assert got.schema.equals(expected.schema)
    for col in expected.column_names:
        assert got.column(col).equals(expected.column(col)), f"column {col} differs"


@pytest.mark.parametrize("exchange", ["files", "shuffle", "slim", "slim_sort", "packed"])
def test_full_replay_matches_oracle(ray_session, fixture_dirs, tmp_path, exchange):
    lake = str(tmp_path / f"lake_{exchange}")
    m = ingest(fixture_dirs["log"], lake,
               base_pages=fixture_dirs["pages_path"], num_partitions=8,
               exchange=exchange)
    assert m is not None and m.watermark == PARAMS.n_events - 1
    _assert_lake_equals(lake, fixture_dirs["expected"])
    # lineage written for every epoch, checksums recorded
    lin = read_lineage(lake)
    assert lin is not None and lin.num_rows >= 1
    assert m.counters["rows_final"] == fixture_dirs["expected"].num_rows


def test_epoch_split_reconverges(ray_session, fixture_dirs, tmp_path):
    lake = str(tmp_path / "lake")
    m = ingest(fixture_dirs["log"], lake,
               base_pages=fixture_dirs["pages_path"], num_partitions=8,
               segments_per_epoch=2)
    assert m.watermark == PARAMS.n_events - 1
    _assert_lake_equals(lake, fixture_dirs["expected"])


def test_resume_from_checkpoint(ray_session, fixture_dirs, tmp_path):
    lake = str(tmp_path / "lake")
    # run only the bootstrap + first epoch, then "crash"
    m1 = ingest(fixture_dirs["log"], lake,
                base_pages=fixture_dirs["pages_path"], num_partitions=8,
                segments_per_epoch=2, max_epochs=1)
    assert m1.watermark < PARAMS.n_events - 1
    # resume: no base_pages needed — state comes from the manifest
    m2 = ingest(fixture_dirs["log"], lake, num_partitions=8,
                segments_per_epoch=2)
    assert m2.watermark == PARAMS.n_events - 1
    _assert_lake_equals(lake, fixture_dirs["expected"])


def test_rerun_is_noop(ray_session, fixture_dirs, tmp_path):
    lake = str(tmp_path / "lake")
    m1 = ingest(fixture_dirs["log"], lake,
                base_pages=fixture_dirs["pages_path"], num_partitions=8)
    m2 = ingest(fixture_dirs["log"], lake, num_partitions=8)
    assert m2.epoch == m1.epoch and m2.watermark == m1.watermark
    _assert_lake_equals(lake, fixture_dirs["expected"])


def test_salted_equals_unsalted(ray_session, fixture_dirs, tmp_path):
    lake = str(tmp_path / "lake")
    m = ingest(fixture_dirs["log"], lake,
               base_pages=fixture_dirs["pages_path"], num_partitions=8,
               salt_hot_keys=True, hot_key_threshold=5)
    assert m.watermark == PARAMS.n_events - 1
    _assert_lake_equals(lake, fixture_dirs["expected"])


def test_no_evolution_variant(ray_session, tmp_path):
    """All-v3 segments, no base pages: engine == oracle from empty lake."""
    p = ChangelogParams(n_urls=40, n_events=300, seg_rows=75, evolution=False)
    log = str(tmp_path / "log")
    events = write_changelog(log, p)
    lake = str(tmp_path / "lake")
    ingest(log, lake, num_partitions=4)
    _assert_lake_equals(lake, replay_to_table(None, events))
    m = latest_manifest(lake)
    assert m.watermark == p.n_events - 1
