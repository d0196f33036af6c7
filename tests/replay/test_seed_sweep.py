"""Randomized-seed replay sweep with harsher disorder than the default
fixtures: 20% out-of-order, 10% duplicate delivery, 15% deletes, steep
zipf skew. Full byte-identity against the sequential oracle."""

import pyarrow.parquet as pq
import pytest

from maestro_ray.fixtures import ChangelogParams, gen_pages, write_changelog
from maestro_ray.io.lake import read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import ingest


@pytest.mark.parametrize("seed,exchange", [
    (7, "shuffle"), (2024, "shuffle"), (7, "slim"), (2024, "slim_sort"),
])
def test_harsh_replay_seed(ray_session, tmp_path, seed, exchange):
    p = ChangelogParams(seed=seed, n_urls=70, n_events=900, seg_rows=150,
                        p_delete=0.15, p_ooo=0.2, p_dup=0.1, zipf_a=1.5)
    log = str(tmp_path / "log")
    events = write_changelog(log, p)
    pages = gen_pages(70, seed=seed)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    lake = str(tmp_path / "lake")
    ingest(log, lake, base_pages=pages_path, num_partitions=8,
           segments_per_epoch=2, exchange=exchange)
    got = read_lake_table(lake)
    exp = replay_to_table(pages, events)
    assert got.num_rows == exp.num_rows
    for col in exp.column_names:
        assert got.column(col).equals(exp.column(col)), (seed, exchange, col)


def test_slim_resume_from_checkpoint(ray_session, tmp_path):
    """Slim exchange under interrupt/resume: the winner-offset broadcast
    is per-epoch state, so resuming from the manifest watermark must
    reconverge byte-identically."""
    p = ChangelogParams(seed=11, n_urls=60, n_events=600, seg_rows=100,
                        p_delete=0.15, p_ooo=0.2)
    log = str(tmp_path / "log")
    events = write_changelog(log, p)
    lake = str(tmp_path / "lake")
    m1 = ingest(log, lake, num_partitions=8, segments_per_epoch=2,
                max_epochs=1, exchange="slim")
    assert m1.watermark < p.n_events - 1
    m2 = ingest(log, lake, num_partitions=8, segments_per_epoch=2,
                exchange="slim")
    assert m2.watermark == p.n_events - 1
    got = read_lake_table(lake)
    exp = replay_to_table(None, events)
    assert got.num_rows == exp.num_rows
    for col in exp.column_names:
        assert got.column(col).equals(exp.column(col)), col
