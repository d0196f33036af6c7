"""Tail-mode (actor-pool incremental) tests: same final state as the
oracle and as replay mode; resume from checkpoint."""

import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, gen_pages, write_changelog
from maestro_ray.io.lake import compact_partitions, read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import bootstrap
from maestro_ray.pipelines.tail import tail_ingest

PARAMS = ChangelogParams(n_urls=60, n_events=600, seg_rows=100)


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    root = tmp_path_factory.mktemp("tail")
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


def test_tail_matches_oracle(ray_session, fx, tmp_path):
    lake = str(tmp_path / "lake")
    bootstrap(fx["pages_path"], lake, num_partitions=4)
    m = tail_ingest(fx["log"], lake, num_partitions=4, checkpoint_every=2)
    assert m.watermark == PARAMS.n_events - 1
    _check(lake, fx["expected"])


def test_tail_resume_from_checkpoint(ray_session, fx, tmp_path):
    lake = str(tmp_path / "lake")
    bootstrap(fx["pages_path"], lake, num_partitions=4)
    # process only 3 segments then stop ("crash" loses in-memory state)
    m1 = tail_ingest(fx["log"], lake, num_partitions=4, checkpoint_every=2,
                     max_segments=3)
    assert m1.watermark < PARAMS.n_events - 1
    m2 = tail_ingest(fx["log"], lake, num_partitions=4, checkpoint_every=2)
    assert m2.watermark == PARAMS.n_events - 1
    _check(lake, fx["expected"])


def test_compaction_checksum_invariant(ray_session, fx, tmp_path):
    lake = str(tmp_path / "lake")
    bootstrap(fx["pages_path"], lake, num_partitions=4)
    tail_ingest(fx["log"], lake, num_partitions=4, checkpoint_every=3)
    before = latest_manifest(lake)
    m2 = compact_partitions(lake)
    assert m2.epoch == before.epoch + 1
    assert {p: v["checksum"] for p, v in m2.partitions.items() if v["rows"]} == {
        p: v["checksum"] for p, v in before.partitions.items() if v["rows"]
    }
    _check(lake, fx["expected"])
