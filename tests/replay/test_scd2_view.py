"""Incremental SCD2 history view (pipelines/scd2view.py): the
epoch-by-epoch maintained history must equal the batch scd2_history op
over the concatenated per-epoch change feeds, resume idempotently,
survive a crash between partition writes and the meta commit, and fail
loudly when expiration outran maintenance."""

import pandas as pd
import pytest

import ray.data as rd

from maestro_ray.core.manifest import expire_epochs, list_epochs
from maestro_ray.fixtures import ChangelogParams, write_changelog
from maestro_ray.ops.scd import scd2_history
from maestro_ray.pipelines.changefeed import table_changes
from maestro_ray.pipelines.ingest import ingest
from maestro_ray.pipelines.scd2view import maintain_scd2, read_scd2

PARAMS = ChangelogParams(n_urls=60, n_events=500, seg_rows=50,
                         evolution=False)


@pytest.fixture()
def lake(ray_session, tmp_path):
    log = str(tmp_path / "log")
    write_changelog(log, PARAMS)
    lake_dir = str(tmp_path / "lake")
    m = ingest(log, lake_dir, num_partitions=4, segments_per_epoch=3)
    assert m is not None and m.epoch >= 3
    return lake_dir


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["url", "valid_from", "valid_to"],
                         na_position="last") \
        .reset_index(drop=True)
    return out[["url", "lang", "valid_from", "valid_to", "is_current"]]


def _batch_oracle(lake_dir) -> pd.DataFrame:
    """scd2_history over the concatenated per-epoch net feeds — the
    epoch-grain reference the incremental view must equal."""
    feeds, prev = [], None
    for e in list_epochs(lake_dir):
        f = table_changes(lake_dir, from_epoch=prev, to_epoch=e,
                          payload_columns=("lang",)).to_pandas()
        f["epoch"] = e
        feeds.append(f)
        prev = e
    allf = pd.concat(feeds, ignore_index=True)
    out = scd2_history(
        rd.from_pandas(allf), "url", "warc_ts", ["lang"],
        seq_col="epoch", op_col="change_op").to_pandas()
    return _norm(out)


def test_incremental_equals_batch_oracle(lake, tmp_path):
    out_dir = str(tmp_path / "scd2")
    res = maintain_scd2(lake, out_dir)
    got = _norm(read_scd2(out_dir).to_pandas())
    want = _batch_oracle(lake)
    pd.testing.assert_frame_equal(got, want)
    assert res["rows"] == len(want)
    # history invariants: per url, versions chain (valid_to of one is
    # valid_from of the next unless closed by delete) and at most one
    # open version
    open_per_url = got[got["is_current"]].groupby("url").size()
    assert (open_per_url <= 1).all()


def test_resume_is_idempotent_then_incremental(lake, tmp_path):
    out_dir = str(tmp_path / "scd2")
    first = maintain_scd2(lake, out_dir)
    again = maintain_scd2(lake, out_dir)
    assert first == again
    # more epochs → catch-up equals a from-scratch rebuild
    log2 = str(tmp_path / "log2")
    write_changelog(log2, ChangelogParams(
        n_urls=60, n_events=700, seg_rows=50, evolution=False))
    ingest(log2, lake, num_partitions=4, segments_per_epoch=4)
    maintain_scd2(lake, out_dir)
    fresh = str(tmp_path / "scd2_fresh")
    maintain_scd2(lake, fresh)
    pd.testing.assert_frame_equal(
        _norm(read_scd2(out_dir).to_pandas()),
        _norm(read_scd2(fresh).to_pandas()))
    # and both equal the batch oracle over the grown history
    pd.testing.assert_frame_equal(
        _norm(read_scd2(out_dir).to_pandas()), _batch_oracle(lake))


def test_crash_before_meta_commit_recovers(lake, tmp_path, monkeypatch):
    out_dir = str(tmp_path / "scd2")
    import maestro_ray.pipelines.scd2view as sv

    real = sv._commit_meta
    calls = {"n": 0}

    def bomb(out, meta):
        calls["n"] += 1
        if calls["n"] == 2:  # die after the 2nd epoch's partitions
            raise RuntimeError("simulated crash before meta commit")
        real(out, meta)

    monkeypatch.setattr(sv, "_commit_meta", bomb)
    with pytest.raises(RuntimeError, match="simulated crash"):
        maintain_scd2(lake, out_dir)
    monkeypatch.setattr(sv, "_commit_meta", real)
    # torn epoch files exist above the cursor; the re-run ignores and
    # overwrites them, converging to the oracle
    maintain_scd2(lake, out_dir)
    pd.testing.assert_frame_equal(
        _norm(read_scd2(out_dir).to_pandas()), _batch_oracle(lake))


def test_expiration_outrunning_maintenance_fails_loudly(lake, tmp_path):
    """An existing view whose cursor epoch was expired cannot diff
    forward — it must refuse, not silently rebuild and lose history.
    (A FRESH view over an expired lake is a legitimate bootstrap from
    the surviving head — only resume is at stake here.)"""
    out_dir = str(tmp_path / "scd2")
    maintain_scd2(lake, out_dir)
    # grow history, then expire past the view's cursor
    log2 = str(tmp_path / "log2")
    write_changelog(log2, ChangelogParams(
        n_urls=60, n_events=700, seg_rows=50, evolution=False))
    ingest(log2, lake, num_partitions=4, segments_per_epoch=4)
    expire_epochs(lake, keep_last=1)
    with pytest.raises(ValueError, match="cursor"):
        maintain_scd2(lake, out_dir)


def test_attr_set_is_view_identity(lake, tmp_path):
    out_dir = str(tmp_path / "scd2")
    maintain_scd2(lake, out_dir, attrs=("lang",))
    with pytest.raises(ValueError, match="attr"):
        maintain_scd2(lake, out_dir, attrs=("lang", "text"))


def test_snapshot_as_of_event_time(lake, tmp_path):
    """scd2_snapshot(ts) must equal the batch oracle's interval filter
    at several probe instants, including exact version boundaries
    (valid_from inclusive, valid_to exclusive)."""
    from maestro_ray.pipelines.scd2view import scd2_snapshot

    out_dir = str(tmp_path / "scd2")
    maintain_scd2(lake, out_dir)
    hist = _batch_oracle(lake)
    probes = sorted(hist["valid_from"].unique())
    picks = [probes[0], probes[len(probes) // 2], probes[-1]]
    for ts in picks:
        got = scd2_snapshot(out_dir, ts).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        want = hist[(hist["valid_from"] <= ts)
                    & (hist["valid_to"].isna() | (hist["valid_to"] > ts))] \
            .sort_values("url").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["url", "lang"]], want[["url", "lang"]]), ts
        # at most one version per url can be live at an instant
        assert got["url"].is_unique


def test_genesis_crash_recovers(lake, tmp_path, monkeypatch):
    """Crash BEFORE the first meta commit: the torn epoch files must be
    ignored on re-run (prev state is 'none', not the torn file) — or
    the first feed gets applied on top of itself (review finding,
    execution-confirmed corruption: 119 rows vs the 94-row oracle)."""
    out_dir = str(tmp_path / "scd2")
    import maestro_ray.pipelines.scd2view as sv

    real = sv._commit_meta

    def bomb(out, meta):
        raise RuntimeError("simulated genesis crash")

    monkeypatch.setattr(sv, "_commit_meta", bomb)
    with pytest.raises(RuntimeError, match="genesis crash"):
        maintain_scd2(lake, out_dir)
    monkeypatch.setattr(sv, "_commit_meta", real)
    maintain_scd2(lake, out_dir)
    pd.testing.assert_frame_equal(
        _norm(read_scd2(out_dir).to_pandas()), _batch_oracle(lake))
