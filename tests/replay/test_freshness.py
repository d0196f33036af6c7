"""freshness_report: manifest-only staleness view — last-rewrite
epochs, stale counts, and agreement with the head manifest."""

import pytest

from maestro_ray.core.manifest import latest_manifest, list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import freshness_report
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=40, n_events=320, seg_rows=40,
                         evolution=False)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fresh")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    return lake_dir


def test_report_matches_manifest(lake):
    rep = freshness_report(lake).set_index("partition")
    m = latest_manifest(lake)
    assert sorted(rep.index) == sorted(m.partitions)
    for p, info in m.partitions.items():
        assert rep.loc[p, "file"] == info["file"]
        assert rep.loc[p, "rows"] == info["rows"]
        assert rep.loc[p, "watermark_offset"] == info["watermark"]
        # the file name encodes the last rewrite epoch
        assert f'epoch-{rep.loc[p, "last_epoch"]:012d}' in info["file"]
        assert rep.loc[p, "epochs_stale"] == \
            m.epoch - rep.loc[p, "last_epoch"]


def test_stale_partition_detected(lake):
    # every epoch in this fixture touches every partition (dense urls),
    # so staleness should be 0 everywhere at head — then a rollback
    # epoch (manifest-only) makes EVERY partition stale by construction
    from maestro_ray.pipelines.rollback import rollback_lake

    rep0 = freshness_report(lake)
    assert (rep0["epochs_stale"] == 0).all()
    epochs = list_epochs(lake)
    rollback_lake(lake, epochs[-2])
    rep1 = freshness_report(lake)
    assert (rep1["epochs_stale"] >= 1).all()
    assert (rep1["last_epoch"] <= epochs[-2]).all()


def test_empty_lake_raises(tmp_path):
    with pytest.raises(ValueError, match="no committed"):
        freshness_report(str(tmp_path / "nolake"))


def test_purge_style_filenames_still_parse(lake):
    """epoch-N.purge-<tag>.parquet names must keep their last_epoch
    (review r4 s8b — the old regex required .parquet right after the
    digits and nulled the staleness signal for purged partitions)."""
    from maestro_ray.core.manifest import (
        Manifest,
        latest_manifest,
        manifest_path,
        write_manifest_atomic,
    )

    m = latest_manifest(lake)
    parts = {p: dict(v) for p, v in m.partitions.items()}
    first = min(parts)
    parts[first]["file"] = \
        "p=0/epoch-000000000002.purge-abc123.parquet"
    doctored = Manifest(epoch=m.epoch + 1, watermark=m.watermark,
                        partitions=parts, counters={},
                        num_partitions=m.num_partitions)
    write_manifest_atomic(manifest_path(lake, doctored.epoch),
                          doctored)
    rep = freshness_report(lake).set_index("partition")
    assert rep.loc[first, "last_epoch"] == 2
    assert rep.loc[first, "epochs_stale"] == doctored.epoch - 2
