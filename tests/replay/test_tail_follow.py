"""Continuous tail (--follow): segments appended MID-RUN must land in
the lake, and the final state must equal a one-shot replay of the same
log (VERDICT r2 missing #4)."""

import os
import shutil
import threading
import time

import pyarrow.parquet as pq

from maestro_ray.fixtures import ChangelogParams, gen_pages, write_changelog
from maestro_ray.io.changelog import list_segments
from maestro_ray.io.lake import read_lake_table
from maestro_ray.oracle import replay_to_table
from maestro_ray.pipelines.ingest import bootstrap
from maestro_ray.pipelines.tail import tail_ingest

PARAMS = ChangelogParams(n_urls=50, n_events=600, seg_rows=100)


def test_follow_picks_up_segments_appended_mid_run(ray_session, tmp_path):
    staging = str(tmp_path / "staging_log")
    live = str(tmp_path / "live_log")
    os.makedirs(live)
    events = write_changelog(staging, PARAMS)
    pages = gen_pages(PARAMS.n_urls, seed=42)
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    expected = replay_to_table(pages, events)
    segs = list_segments(staging)
    assert len(segs) >= 4

    lake = str(tmp_path / "lake")
    bootstrap(pages_path, lake, num_partitions=4)

    # appender: move segments into the live dir while the follow loop
    # runs — first two immediately, the rest spaced out
    def appender():
        for i, (_first, path) in enumerate(segs):
            if i >= 2:
                time.sleep(0.4)
            tmp = os.path.join(live, os.path.basename(path) + ".tmp")
            shutil.copy(path, tmp)
            os.replace(tmp, os.path.join(live, os.path.basename(path)))

    t = threading.Thread(target=appender)
    t.start()
    m = tail_ingest(
        live, lake, num_partitions=4, checkpoint_every=2,
        follow=True, poll_interval=0.1, idle_timeout=3.0,
    )
    t.join()
    assert m is not None
    assert m.watermark == PARAMS.n_events - 1
    got = read_lake_table(lake)
    assert got.num_rows == expected.num_rows
    for col in expected.column_names:
        assert got.column(col).equals(expected.column(col)), col


def test_catchup_honors_checkpoint_every(ray_session, tmp_path):
    """A catch-up over N pre-existing segments must publish
    ceil(N / checkpoint_every) epochs — not one per segment/poll."""
    from maestro_ray.core.manifest import latest_manifest

    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)  # 6 segments (600 events / 100)
    n_segs = len(list_segments(log))
    lake = str(tmp_path / "lake")
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(gen_pages(PARAMS.n_urls, seed=42), pages_path)
    bootstrap(pages_path, lake, num_partitions=4)
    e0 = latest_manifest(lake).epoch
    m = tail_ingest(log, lake, num_partitions=4, checkpoint_every=3,
                    follow=True, poll_interval=0.05, idle_timeout=0.5)
    expect_epochs = -(-n_segs // 3)  # ceil
    assert m.epoch == e0 + expect_epochs, (m.epoch, e0, n_segs)


def test_follow_idle_timeout_returns_promptly(ray_session, tmp_path):
    """No segments at all: follow mode must return after idle_timeout
    without publishing any epoch."""
    live = str(tmp_path / "log")
    os.makedirs(live)
    lake = str(tmp_path / "lake")
    t0 = time.monotonic()
    m = tail_ingest(
        live, lake, num_partitions=2,
        follow=True, poll_interval=0.05, idle_timeout=0.5,
    )
    assert time.monotonic() - t0 < 5.0
    assert m is None  # nothing ingested, no manifest published
