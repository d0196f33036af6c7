"""repartition_lake (io/lake.py): content invariance incl. tombstones,
checksum invariance, resumed ingest under the new P, history intact."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from maestro_ray.core.manifest import latest_manifest
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import (
    lake_files,
    read_lake_at,
    read_lake_table,
    repartition_lake,
)
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=80, seed=33)


def _all_rows(lake):
    """Full physical content INCLUDING tombstones, order-normalized."""
    import pyarrow.compute as pc

    t = pa.concat_tables([pq.read_table(f) for f in lake_files(lake)],
                         promote_options="default")
    return t.take(pc.sort_indices(t, sort_keys=[("url", "ascending")]))


def test_repartition_preserves_content_and_resumes(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)

    lake = str(tmp_path / "lake")
    # ingest only the first part of the log at P=4
    m = ingest(log, lake, num_partitions=4, segments_per_epoch=2,
               max_epochs=2)
    assert m.num_partitions == 4
    before_live = read_lake_table(lake)
    before_all = _all_rows(lake)
    before_epoch = m.epoch

    m2 = repartition_lake(lake, 9)
    assert m2.num_partitions == 9 and m2.epoch == before_epoch + 1
    assert m2.watermark == m.watermark
    assert set(m2.partitions) <= set(range(9))
    # content identical, tombstones included
    assert _all_rows(lake).equals(before_all)
    assert read_lake_table(lake).equals(before_live)
    # history below the migration reads the OLD partitioning unchanged
    assert read_lake_at(lake, before_epoch, columns=["url", "warc_ts"]) \
        .count() == before_live.num_rows

    # old P is now rejected, new P resumes and converges
    with pytest.raises(ValueError, match="num_partitions"):
        ingest(log, lake, num_partitions=4)
    final = ingest(log, lake, num_partitions=9, segments_per_epoch=2)
    assert final.watermark == PARAMS.n_events - 1

    solo = str(tmp_path / "solo")
    ingest(log, solo, num_partitions=9, segments_per_epoch=2)
    got = read_lake_table(lake)
    want = read_lake_table(solo)
    assert got.num_rows == want.num_rows
    for c in want.column_names:
        assert got.column(c).equals(want.column(c)), c


def test_repartition_noop_and_guards(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, ChangelogParams(n_urls=20, n_events=80,
                                         seg_rows=40, seed=4))
    lake = str(tmp_path / "lake")
    m = ingest(log, lake, num_partitions=3)
    assert repartition_lake(lake, 3) is not None  # no-op, same manifest
    assert latest_manifest(lake).epoch == m.epoch
    with pytest.raises(ValueError):
        repartition_lake(lake, 0)
    with pytest.raises(FileNotFoundError):
        repartition_lake(str(tmp_path / "nope"), 2)
