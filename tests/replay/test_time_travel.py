"""Time-travel reads: every committed epoch stays addressable and
byte-matches the pure-replay oracle at that epoch's watermark, until
vacuum reclaims the files — after which the read fails loudly."""

import pytest

from maestro_ray.core.manifest import (
    latest_manifest,
    list_epochs,
    manifest_at,
    vacuum,
)
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.lake import read_lake_at, read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=50, n_events=400, seg_rows=50,
                         evolution=False)


@pytest.fixture(scope="module")
def lake(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("tt")
    log = str(root / "log")
    events = write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    # 2 segments/epoch over 8 segments → 4 committed epochs
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return {"dir": lake_dir, "events": events}


def _sorted_by_url(ds):
    t = ds.to_pandas().sort_values("url").reset_index(drop=True)
    return t


def test_every_epoch_matches_replay_prefix(lake):
    epochs = list_epochs(lake["dir"])
    assert len(epochs) >= 3
    for e in epochs:
        wm = manifest_at(lake["dir"], e).watermark
        exp = replay_to_table(
            None, [ev for ev in lake["events"] if ev["offset"] <= wm]
        ).to_pandas()
        got = _sorted_by_url(
            read_lake_at(lake["dir"], e, columns=["url", "warc_ts", "lang"]))
        assert list(got["url"]) == list(exp["url"]), f"epoch {e}"
        assert list(got["warc_ts"]) == list(exp["warc_ts"]), f"epoch {e}"


def test_latest_epoch_equals_plain_read(lake):
    e = list_epochs(lake["dir"])[-1]
    tt = _sorted_by_url(read_lake_at(lake["dir"], e))
    now = read_lake_table(lake["dir"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert tt.equals(now)


def test_unknown_epoch_lists_history(lake):
    with pytest.raises(ValueError, match="available epochs"):
        read_lake_at(lake["dir"], 999)


def test_offset_travel_resolves_to_covering_epoch(lake):
    """read_lake_at_offset: an exact epoch watermark resolves to that
    epoch; an offset INSIDE an epoch's range resolves to the epoch
    below; pre-genesis offsets raise."""
    from maestro_ray.io.lake import read_lake_at_offset

    d = lake["dir"]
    epochs = list_epochs(d)
    wms = [manifest_at(d, e).watermark for e in epochs]

    # exact watermark → that epoch's state
    for e, wm in zip(epochs, wms):
        got = _sorted_by_url(read_lake_at_offset(d, wm))
        want = _sorted_by_url(read_lake_at(d, e))
        assert got.equals(want), f"offset {wm}"

    # mid-epoch offset → the epoch BELOW (documented granularity)
    mid = wms[0] + 1
    assert mid < wms[1]
    got = _sorted_by_url(read_lake_at_offset(d, mid))
    assert got.equals(_sorted_by_url(read_lake_at(d, epochs[0])))

    # far-future offset → newest epoch
    got = _sorted_by_url(read_lake_at_offset(d, 10**12))
    assert got.equals(_sorted_by_url(read_lake_at(d, epochs[-1])))

    with pytest.raises(ValueError, match="watermark"):
        read_lake_at_offset(d, -5)


def test_vacuum_invalidates_history_loudly(lake):
    # vacuum keeps only the latest manifest's files; epoch 1 rewrote
    # every partition in later epochs, so its files are reclaimed
    first = list_epochs(lake["dir"])[0]
    n = vacuum(lake["dir"], latest_manifest(lake["dir"]))
    assert n > 0
    with pytest.raises(ValueError, match="vacuumed"):
        read_lake_at(lake["dir"], first)
    # the latest epoch is untouched
    last = list_epochs(lake["dir"])[-1]
    assert read_lake_at(lake["dir"], last) is not None
