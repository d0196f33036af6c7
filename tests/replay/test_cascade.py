"""Lake→lake CDC cascade (pipelines/cascade.py): the materialized
downstream changelog re-ingests into a lake whose live state — html
bytes and recomputed text included — equals the source's; incremental
calls equal one-shot byte-for-byte; crash mid-run converges."""

import json
import os

import pytest

import maestro_ray.pipelines.cascade as cascade_mod
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.io.changelog import list_segments
from maestro_ray.io.lake import read_lake_table
from maestro_ray.pipelines.cascade import cascade_changelog
from maestro_ray.pipelines.ingest import ingest

PARAMS = ChangelogParams(n_urls=40, n_events=360, seg_rows=45,
                         evolution=False)


def _live_df(lake_dir):
    t = read_lake_table(lake_dir)
    df = t.select(["url", "warc_ts", "html", "text", "lang"]).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def _file_bytes(log_dir):
    return {
        os.path.basename(p): open(p, "rb").read()
        for _o, p in list_segments(log_dir)
    }


@pytest.fixture(scope="module")
def src(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cascade")
    log = str(root / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(root / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2)
    assert m is not None and m.epoch >= 3
    return lake_dir


def test_cascade_roundtrip_state_identical(src, tmp_path):
    out_log = str(tmp_path / "outlog")
    rep = cascade_changelog(src, out_log, num_partitions=4)
    assert rep["rows"] > 0 and rep["segments"] > 0

    lake2 = str(tmp_path / "lake2")
    ingest(out_log, lake2, num_partitions=4, segments_per_epoch=10_000)
    a, b = _live_df(src), _live_df(lake2)
    # full-state equality including html payload bytes and the text
    # recomputed downstream through the frozen extract contract
    assert a.equals(b), (len(a), len(b))

    # idempotent: nothing new → no segments, cursor unchanged
    again = cascade_changelog(src, out_log, num_partitions=4)
    assert again == {"epochs": 0, "segments": 0, "rows": 0,
                     "next_offset": rep["next_offset"]}


def test_incremental_equals_oneshot(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    out_a = str(tmp_path / "a")
    # incremental: cascade after EVERY source epoch
    for cap in (1, 2, 3, 4):
        ingest(log, lake_dir, num_partitions=4, segments_per_epoch=2,
               max_epochs=cap)
        cascade_changelog(lake_dir, out_a, num_partitions=4)
    out_b = str(tmp_path / "b")  # one-shot at the end
    cascade_changelog(lake_dir, out_b, num_partitions=4)
    assert _file_bytes(out_a) == _file_bytes(out_b)


def test_crash_mid_run_converges(src, tmp_path, monkeypatch):
    out_log = str(tmp_path / "outlog")
    real_save = cascade_mod._save_cursor
    calls = {"n": 0}

    def flaky(out_dir, state):
        calls["n"] += 1
        if calls["n"] == 2:  # crash AFTER epoch 2's segments, before
            raise RuntimeError("injected crash")  # its cursor commit
        real_save(out_dir, state)

    monkeypatch.setattr(cascade_mod, "_save_cursor", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        cascade_changelog(src, out_log, num_partitions=4)
    monkeypatch.setattr(cascade_mod, "_save_cursor", real_save)

    cascade_changelog(src, out_log, num_partitions=4)
    want = str(tmp_path / "clean")
    cascade_changelog(src, want, num_partitions=4)
    assert _file_bytes(out_log) == _file_bytes(want)
    with open(os.path.join(out_log, cascade_mod.CURSOR)) as f:
        a = json.load(f)
    with open(os.path.join(want, cascade_mod.CURSOR)) as f:
        assert a == json.load(f)


def test_expired_cursor_rejected(src, tmp_path):
    out_log = str(tmp_path / "outlog")
    os.makedirs(out_log)
    cascade_mod._save_cursor(out_log, {"from_epoch": 999,
                                       "next_offset": 5, "version": 1})
    with pytest.raises(ValueError, match="no longer committed"):
        cascade_changelog(src, out_log)
